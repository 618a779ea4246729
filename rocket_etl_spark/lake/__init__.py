from rocket_etl_spark.lake.branch import (
    audit_branch,
    branch_table,
    create_branch,
    drop_branch,
    list_branches,
    publish_branch,
    read_branch,
)
from rocket_etl_spark.lake.lookup import lookup
from rocket_etl_spark.lake.merge import CommitResult, merge_batch
from rocket_etl_spark.lake.metadata import (
    as_of,
    create_tag,
    drop_tag,
    files,
    history,
    list_tags,
    resolve_tag,
    snapshots,
)
from rocket_etl_spark.lake.table import LakeTable
from rocket_etl_spark.lake.wap import (
    abort_staged,
    audit_staged,
    publish_staged,
    read_staged,
    stage_merge,
)

__all__ = [
    "LakeTable", "merge_batch", "CommitResult", "lookup",
    "stage_merge", "read_staged", "audit_staged", "publish_staged",
    "abort_staged",
    "snapshots", "files", "history", "as_of",
    "create_tag", "resolve_tag", "list_tags", "drop_tag",
    "create_branch", "branch_table", "read_branch", "publish_branch",
    "drop_branch", "list_branches", "audit_branch",
]
