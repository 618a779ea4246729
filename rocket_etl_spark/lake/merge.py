"""Keyed, idempotent, epoch-fenced MERGE — the engine's heart.

Reproduces the reference's ``upsert`` loader semantics (update-or-insert
by primary key, replay-idempotent; upstream ``pipeline/loaders.py`` [U])
as a single declarative Spark plan, with WAL-ordered LWW and delete
support, equivalent to:

    MERGE INTO table t USING batch s
      ON  t.<keys> = s.<keys>
      WHEN MATCHED AND s.op = 'delete' AND s.<seq> > t.<seq> THEN DELETE
      WHEN MATCHED AND s.<seq> > t.<seq>                    THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op <> 'delete'                 THEN INSERT *

Execution shape (scale rationale inline):

1. stage the transformed batch to parquet once (single materialization —
   reused for stats, dedupe, and the join; avoids recomputing the source);
2. LWW-dedupe by key via ``max_by`` aggregation (map-side partial combine
   → hot keys reduce before the shuffle);
3. plan: collect the ≤ num_buckets *touched* bucket ids (tiny driver
   coordination, the moral equivalent of Iceberg manifest pruning);
4. full-outer join current rows *of touched buckets only* with the
   deduped batch — both sides hash-partition on the key, and because the
   batch side is post-dedupe (one row per key) the join cannot skew;
5. write winners bucket-partitioned; MERGE stats come from
   ``DataFrame.observe`` so no second pass over the join;
6. CAS-commit a snapshot = parent's untouched buckets + new files.

The MERGE is order-insensitive across and within batches: the LWW guard
``s.seq > t.seq`` means late/duplicate delivery converges to the same
final state — idempotency does not depend on the watermark.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

from rocket_etl_spark.lake.table import LakeTable, bucket_of
from rocket_etl_spark.operators.lww import lww_dedupe
from rocket_etl_spark.schema.registry import TableSchema


@dataclass
class CommitResult:
    snapshot_id: int
    epoch_id: int | None
    skipped: bool
    rows_in: int = 0
    rows_upserted: int = 0
    rows_deleted: int = 0
    event_seq_min: int | None = None
    event_seq_max: int | None = None
    touched_buckets: int = 0
    wall_ms: int = 0


def merge_batch(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int | None = None,
    new_schema: TableSchema | None = None,
    stage_dir: str | Path | None = None,
) -> CommitResult:
    """MERGE ``batch`` into ``table``; returns commit stats.

    ``batch`` must carry the table's columns (under ``new_schema`` if an
    evolution accompanies this commit) plus ``op`` ('upsert'|'delete').
    ``epoch_id`` enables the exactly-once fence: an already-committed
    epoch is a no-op.
    """
    t0 = time.monotonic()
    spark = table.spark
    snap = table.current_snapshot()

    if epoch_id is not None and epoch_id in table.committed_epochs():
        return CommitResult(snap["snapshot_id"], epoch_id, skipped=True)

    schema = new_schema or TableSchema.from_json(
        snap["schemas"][str(snap["current_schema_version"])]
    )
    keys = snap["key_cols"]
    order_col = snap["order_col"]
    nb = int(snap["num_buckets"])

    expect = set(schema.names()) | {"op"}
    if set(batch.columns) != expect:
        raise ValueError(f"batch columns {sorted(batch.columns)} != expected {sorted(expect)}")

    # 1. stage once
    commit_tag = f"{snap['snapshot_id'] + 1:08d}-{uuid.uuid4().hex[:8]}"
    staging = Path(stage_dir) if stage_dir else table.path / "_staging"
    stage_path = staging / f"batch-{commit_tag}"
    batch.write.parquet(str(stage_path))
    staged = spark.read.schema(batch.schema).parquet(str(stage_path))

    stats_row = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(order_col).alias("lo"),
        F.max(order_col).alias("hi"),
    ).collect()[0]
    rows_in = stats_row["n"]

    # 2. LWW dedupe (agg form: map-side combine, skew-proof)
    deduped = lww_dedupe(staged, keys=keys, order_col=order_col)
    deduped = deduped.withColumn("_bucket", bucket_of(keys, nb))

    # 3. plan touched buckets (≤ nb small values)
    touched = [r["_bucket"] for r in deduped.select("_bucket").distinct().collect()]

    out_files: dict[int, list[dict]] = {}
    obs_map = {"rows_upserted": 0, "rows_deleted": 0}
    if touched:
        # tombstones included: a newer delete must outrank a stale upsert
        current = table.read(buckets=touched, include_tombstones=True)
        if new_schema is not None:
            cur_schema = TableSchema.from_json(snap["schemas"][str(snap["current_schema_version"])])
            from rocket_etl_spark.schema.registry import project_to

            current = project_to(current, cur_schema, schema, passthrough=("_deleted",))

        vals = [c for c in schema.names() if c not in keys]
        t_side = current.select(
            *keys,
            F.struct(
                *[F.col(c) for c in vals],
                F.coalesce(F.col("_deleted"), F.lit(False)).alias("_deleted"),
            ).alias("_t"),
        )
        s_side = deduped.select(
            *keys,
            F.struct(
                *[F.col(c) for c in vals],
                (F.col("op") == "delete").alias("_deleted"),
            ).alias("_s"),
        )
        joined = t_side.join(s_side, on=list(keys), how="full_outer")

        s_seq = F.col(f"_s.{order_col}")
        t_seq = F.col(f"_t.{order_col}")
        s_del = F.col("_s._deleted")
        t_del = F.col("_t._deleted")
        s_wins = F.col("_s").isNotNull() & (F.col("_t").isNull() | (s_seq > t_seq))
        action = (
            F.when(~s_wins, F.lit("keep"))
            .when(s_del & (F.col("_t").isNull() | t_del), F.lit("tombstone"))
            .when(s_del, F.lit("delete"))
            .when(F.col("_t").isNull() | t_del, F.lit("insert"))
            .otherwise(F.lit("update"))
        )
        obs = Observation(f"merge-{commit_tag}")
        merged = (
            joined.withColumn("_action", action)
            .observe(
                obs,
                F.sum(F.when(F.col("_action").isin("insert", "update"), 1).otherwise(0)).alias(
                    "rows_upserted"
                ),
                F.sum(F.when(F.col("_action") == "delete", 1).otherwise(0)).alias("rows_deleted"),
            )
            .withColumn("_w", F.when(s_wins, F.col("_s")).otherwise(F.col("_t")))
            .select(*keys, F.col("_w.*"))
            .withColumn("_bucket", bucket_of(keys, nb))
        )

        out_dir_rel = f"data/commit-{commit_tag}"
        out_dir = table.path / out_dir_rel
        # one shuffle partition per touched bucket keeps file counts tight
        (
            merged.repartition(max(len(touched), 1), "_bucket")
            .write.partitionBy("_bucket")
            .parquet(str(out_dir))
        )
        obs_map = obs.get

        for bdir in sorted(out_dir.glob("_bucket=*")):
            b = int(bdir.name.split("=")[1])
            files = [
                f"{out_dir_rel}/{bdir.name}/{p.name}"
                for p in sorted(bdir.iterdir())
                if p.name.endswith(".parquet")
            ]
            out_files[b] = [{"path": p, "sv": schema.version} for p in files]

    # 6. assemble + CAS-commit the snapshot
    new_buckets = dict(snap["buckets"])
    for b in touched:
        new_buckets[str(b)] = out_files.get(b, [])
    schemas = dict(snap["schemas"])
    schemas[str(schema.version)] = schema.to_json()
    new_snap = {
        "snapshot_id": snap["snapshot_id"] + 1,
        "parent_id": snap["snapshot_id"],
        "epoch_id": epoch_id,
        "key_cols": keys,
        "order_col": order_col,
        "num_buckets": nb,
        "current_schema_version": schema.version,
        "schemas": schemas,
        "buckets": new_buckets,
        "stats": {"rows_in": rows_in},
    }
    while not table._try_write_snapshot(new_snap):
        # lost the CAS: someone committed this id — re-check the fence
        latest = table.current_snapshot()
        if epoch_id is not None and epoch_id in table.committed_epochs():
            return CommitResult(latest["snapshot_id"], epoch_id, skipped=True)
        new_snap["snapshot_id"] = latest["snapshot_id"] + 1
        new_snap["parent_id"] = latest["snapshot_id"]

    return CommitResult(
        snapshot_id=new_snap["snapshot_id"],
        epoch_id=epoch_id,
        skipped=False,
        rows_in=rows_in,
        rows_upserted=int(obs_map.get("rows_upserted") or 0),
        rows_deleted=int(obs_map.get("rows_deleted") or 0),
        event_seq_min=stats_row["lo"],
        event_seq_max=stats_row["hi"],
        touched_buckets=len(touched),
        wall_ms=int((time.monotonic() - t0) * 1000),
    )
