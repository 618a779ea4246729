"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming surface (windows, watermark dedupe, foreachBatch
MERGE) covers the engine's replay path; this module is the escape hatch
for operators that need ARBITRARY per-key state across micro-batches —
the streaming analog of the reference's stateful ``custom_processing``.

``running_key_stats`` is the engine's built-in instance: per-key event
count / seq high-water / delete tally, maintained in state and emitted
once per key per micro-batch.  It doubles as streaming-side lineage at
key granularity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_OUTPUT_DDL = (
    "repo string, events_seen bigint, deletes_seen bigint, max_event_seq bigint"
)
_STATE_DDL = "events_seen bigint, deletes_seen bigint, max_event_seq bigint"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        seen, dels, mx = state.get
    else:
        seen, dels, mx = 0, 0, -1
    for pdf in pdfs:
        seen += len(pdf)
        dels += int((pdf["op"] == "delete").sum())
        mx = max(mx, int(pdf["event_seq"].max()))
    state.update((seen, dels, mx))
    yield pd.DataFrame(
        [{"repo": key[0], "events_seen": seen, "deletes_seen": dels, "max_event_seq": mx}]
    )


def running_key_stats(stream: DataFrame, key: str = "repo") -> DataFrame:
    """Per-key running stats over a streaming DataFrame of change events.

    State lives in the streaming state store (checkpointed, partitioned by
    key — scales horizontally like any keyed state).  Output mode: one row
    per key per micro-batch with the post-batch totals ("update" mode).
    """
    return (
        stream.groupBy(key)
        .applyInPandasWithState(
            _update,
            outputStructType=STATS_OUTPUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_running_key_stats(
    spark: Any,
    events_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    events_ddl: str,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain ``events_dir`` through the stateful operator, appending each
    micro-batch's updated rows to ``output_dir`` (parquet)."""
    reader = spark.readStream.schema(events_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_dir)
    q = (
        running_key_stats(stream)
        .writeStream.foreachBatch(
            lambda df, _eid: df.write.mode("append").parquet(output_dir)
        )
        .outputMode("update")  # must match the operator's output mode
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
