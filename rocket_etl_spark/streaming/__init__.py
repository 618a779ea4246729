from rocket_etl_spark.streaming.replay import (
    EVENTS_DDL,
    REPO_FILES_SCHEMA,
    align_batch,
    create_repo_files_table,
    prepare_events,
    replay_batch,
    replay_stream,
)

__all__ = [
    "EVENTS_DDL",
    "REPO_FILES_SCHEMA",
    "align_batch",
    "create_repo_files_table",
    "prepare_events",
    "replay_batch",
    "replay_stream",
]
