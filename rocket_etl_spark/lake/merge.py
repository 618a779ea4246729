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

1. plan: the touched-bucket set is a pure function of the batch KEYS, so
   it is collected from a column-pruned scan of the source (reads only
   the key columns from parquet) — the moral equivalent of Iceberg
   manifest pruning, and it means the full batch is consumed exactly
   once, by step 3: no persist/cache, no restage, minimal GC pressure;
2. input stats (rows_in, seq min/max) ride the SAME planning pass (one
   aggregation over keys+order, ≤ num_buckets rows to the driver);
3. one pipeline: scan → vectorized transform → LWW dedupe by key via
   ``max_by`` aggregation (map-side partial combine → hot keys reduce
   before the shuffle) → full-outer join with current rows *of touched
   buckets only* → bucket-partitioned write.  The batch join side is
   post-dedupe (one row per key), so the join cannot skew;
4. MERGE stats (insert/update/delete counts) are written as a physical
   ``_action`` column and read back by a pruned single-column scan of the
   new files (DataFrame.observe is unusable here: observed metrics never
   resolve inside a streaming foreachBatch);
5. CAS-commit a snapshot = parent's untouched buckets + new files.

The MERGE is order-insensitive across and within batches: the LWW guard
``s.seq > t.seq`` means late/duplicate delivery converges to the same
final state — idempotency does not depend on the watermark.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

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

    commit_tag = f"{snap['snapshot_id'] + 1:08d}-{uuid.uuid4().hex[:8]}"

    # 1+2. plan touched buckets AND input stats in ONE column-pruned pass
    # over (keys, order) only — bucket id is key-deterministic, so dedupe
    # cannot change the touched set.  ≤ num_buckets rows reach the driver.
    # (Deliberately no DataFrame.observe anywhere: observed metrics never
    # resolve inside a streaming foreachBatch — Observation.get blocks.)
    plan_rows = (
        batch.groupBy(bucket_of(keys, nb).alias("_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(order_col).alias("lo"),
            F.max(order_col).alias("hi"),
        )
        .collect()
    )
    touched = [r["_bucket"] for r in plan_rows]
    rows_in = int(sum(r["n"] for r in plan_rows))
    seq_lo = min((r["lo"] for r in plan_rows), default=None)
    seq_hi = max((r["hi"] for r in plan_rows), default=None)

    deduped = lww_dedupe(batch, keys=keys, order_col=order_col)

    out_files: dict[int, list[dict]] = {}
    stat_map: dict[str, int] = {}
    if touched:
        # tombstones included: a newer delete must outrank a stale upsert
        current = table.read(buckets=touched, include_tombstones=True)
        if new_schema is not None:
            cur_schema = TableSchema.from_json(snap["schemas"][str(snap["current_schema_version"])])
            from rocket_etl_spark.schema.registry import project_to

            current = project_to(current, cur_schema, schema, passthrough=("_deleted",))

        vals = [c for c in schema.names() if c not in keys]
        # the LWW order rides the struct under a dedicated _ord field so it
        # works whether order_col is a value column or one of the keys
        t_side = current.select(
            *keys,
            F.struct(
                *[F.col(c) for c in vals],
                F.col(order_col).alias("_ord"),
                F.coalesce(F.col("_deleted"), F.lit(False)).alias("_deleted"),
            ).alias("_t"),
        )
        s_side = deduped.select(
            *keys,
            F.struct(
                *[F.col(c) for c in vals],
                F.col(order_col).alias("_ord"),
                (F.col("op") == "delete").alias("_deleted"),
            ).alias("_s"),
        )
        joined = t_side.join(s_side, on=list(keys), how="full_outer")

        s_seq = F.col("_s._ord")
        t_seq = F.col("_t._ord")
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
        # _action is written into the data files (tiny, dictionary-encoded)
        # and read back by a pruned single-column scan for the MERGE stats —
        # explicit-schema reads make it invisible to table queries, exactly
        # like the _deleted tombstone flag.
        merged = (
            joined.withColumn("_action", action)
            .withColumn("_w", F.when(s_wins, F.col("_s")).otherwise(F.col("_t")))
            .select(
                *keys,
                *[F.col(f"_w.{c}").alias(c) for c in vals],
                F.col("_w._deleted").alias("_deleted"),
                "_action",
            )
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
        for bdir in sorted(out_dir.glob("_bucket=*")):
            b = int(bdir.name.split("=")[1])
            files = [
                f"{out_dir_rel}/{bdir.name}/{p.name}"
                for p in sorted(bdir.iterdir())
                if p.name.endswith(".parquet")
            ]
            out_files[b] = [{"path": p, "sv": schema.version} for p in files]

        all_new = [str(table.path / fe["path"]) for fl in out_files.values() for fe in fl]
        if all_new:
            for r in (
                spark.read.schema("_action string")
                .parquet(*all_new)
                .groupBy("_action")
                .count()
                .collect()
            ):
                stat_map[r["_action"]] = int(r["count"])

    # 5. assemble + CAS-commit the snapshot
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
        # cumulative fence set: survives snapshot expiry, O(1) lookups
        "committed_epochs": sorted(
            table.committed_epochs() | ({epoch_id} if epoch_id is not None else set())
        ),
        "stats": {"rows_in": rows_in},
    }
    while not table._try_write_snapshot(new_snap):
        # lost the CAS: someone committed this id — re-check the fence
        latest = table.current_snapshot()
        if epoch_id is not None and epoch_id in table.committed_epochs():
            return CommitResult(latest["snapshot_id"], epoch_id, skipped=True)
        new_snap["snapshot_id"] = latest["snapshot_id"] + 1
        new_snap["parent_id"] = latest["snapshot_id"]
        new_snap["committed_epochs"] = sorted(
            table.committed_epochs() | ({epoch_id} if epoch_id is not None else set())
        )

    return CommitResult(
        snapshot_id=new_snap["snapshot_id"],
        epoch_id=epoch_id,
        skipped=False,
        rows_in=rows_in,
        rows_upserted=stat_map.get("insert", 0) + stat_map.get("update", 0),
        rows_deleted=stat_map.get("delete", 0),
        event_seq_min=seq_lo,
        event_seq_max=seq_hi,
        touched_buckets=len(touched),
        wall_ms=int((time.monotonic() - t0) * 1000),
    )
