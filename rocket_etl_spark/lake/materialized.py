"""Incrementally-maintained materialized aggregates over the change feed.

The CDC engine's downstream consumers (dashboards, per-repo stats, data
catalogs) want ``GROUP BY`` rollups of the lake table that stay fresh as
epochs land — without re-aggregating 100 TB per refresh.  This module
maintains such a rollup *incrementally* from ``LakeTable.changes()``
(the CDC-out surface), the same contract as an Iceberg/Delta
changelog-driven materialized view or a Materialize/DBSP delta query.

Two maintenance strategies, chosen per refresh from the observed change
set (never by guesswork):

* **Additive** — when every change in the window is an ``insert`` (an
  append-only regime: fact streams, log ingest) and every aggregate is
  mergeable from its own output (count/sum/min/max), the refresh
  combines per-group partials of the *changes alone* with the current
  MV rows.  Cost is O(changed rows) — the 100 TB base table is never
  read.
* **Dirty-group recompute** — otherwise (updates/deletes/MOR upserts in
  the window, or non-mergeable aggregates like avg/count_distinct):
  recompute exactly the groups the change set touched from the current
  table state, and delete MV rows whose group vanished.  Correct for
  ANY aggregate without pre-image rows (the changelog does not carry
  old values — VERDICT r4; this is the same reason Delta's CDF-less
  MVs recompute dirty partitions).  When a group column is a mutable
  non-key attribute, an update can move a row BETWEEN groups and the
  changelog names only the new one — the dirty set is therefore the
  changed keys' groups in the new snapshot ∪ the same keys' groups in
  the previous snapshot (time travel), never just the change rows'
  own group values.  Cost is one column-pruned scan of the source
  (group + agg columns only; the dirty-key semi join is broadcast in
  the common regime, so the source never shuffles) plus a shuffle of
  the dirty groups' rows only.

Exactly-once refresh: the MV is itself a :class:`LakeTable` keyed on the
group columns, and each refresh MERGEs with ``epoch_id = <source
snapshot id>`` under a dedicated app fence — a crash between the MV
commit and the spec-pointer update replays as a fenced no-op, then the
pointer catches up.  Refreshes therefore compose with every lake
guarantee (CAS commit, time travel of the MV itself, its own changelog).

Contract: group columns must be non-null (they are the MV table's key
columns — the lake key contract).  ``avg`` is maintained correctly via
recompute; callers wanting O(changes) freshness for means should
materialize ``sum`` + ``count`` and divide at read time.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rocket_etl_spark.lake.merge import merge_batch
from rocket_etl_spark.lake.table import LakeTable
from rocket_etl_spark.schema.registry import TableSchema

_MV_APP_ID = "mv_refresh"
_SRC_SNAP_COL = "_src_snapshot"
# aggregates whose MV column alone is a mergeable partial: new = old ⊕ delta
_ADDITIVE_FNS = {"count", "sum", "min", "max"}
_SUPPORTED_FNS = _ADDITIVE_FNS | {"avg", "count_distinct"}
# past this many dirty groups, drop the broadcast hint and let AQE pick
# the semi-join strategy (same bounded-hint rule as the MERGE planner)
_DIRTY_BROADCAST_CAP = 1_000_000


def _agg_expr(fn: str, col: str | None, name: str):
    if fn == "count":
        e = F.count(F.lit(1)) if col in (None, "*") else F.count(col)
    elif fn == "sum":
        e = F.sum(col)
    elif fn == "min":
        e = F.min(col)
    elif fn == "max":
        e = F.max(col)
    elif fn == "avg":
        e = F.avg(col)
    elif fn == "count_distinct":
        e = F.countDistinct(col)
    else:
        raise ValueError(f"unsupported aggregate {fn!r}")
    return e.alias(name)


def _combine_expr(fn: str, name: str):
    """Merge an existing MV value with an insert-only delta partial.

    count is never null; sum/min/max must stay null when BOTH sides are
    null (an all-null group), matching what a full recompute produces.
    ``least``/``greatest`` already skip nulls.
    """
    old, new = F.col(f"_mv.{name}"), F.col(f"_d.{name}")
    if fn == "count":
        return (F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))).alias(name)
    if fn == "sum":
        return (
            F.when(old.isNull() & new.isNull(), F.lit(None))
            .otherwise(F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0)))
            .alias(name)
        )
    if fn == "min":
        return F.least(old, new).alias(name)
    if fn == "max":
        return F.greatest(old, new).alias(name)
    raise AssertionError(f"{fn} is not additive")  # guarded by caller


@dataclass
class RefreshResult:
    mode: str  # 'noop' | 'additive' | 'recompute'
    from_snapshot: int
    to_snapshot: int
    groups_refreshed: int
    groups_deleted: int


class MaterializedAggregate:
    """A persisted ``GROUP BY`` rollup of a :class:`LakeTable`, refreshed
    incrementally from the table's change feed.

    ``aggs`` is a list of ``(out_name, fn, col)`` with ``fn`` one of
    count/sum/min/max/avg/count_distinct (``col='*'`` for count).
    """

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = Path(path)
        with open(self.path / "mv.json") as f:
            self.spec = json.load(f)
        self.table = LakeTable.load(spark, self.path)

    # ------------------------------------------------------------- creation
    @staticmethod
    def create(
        spark: SparkSession,
        path: str | Path,
        source: LakeTable,
        group_cols: list[str],
        aggs: list[tuple[str, str, str | None]],
        num_buckets: int = 8,
    ) -> "MaterializedAggregate":
        path = Path(path)
        if not group_cols:
            raise ValueError("at least one group column is required")
        names = [a[0] for a in aggs]
        if len(set(names) | set(group_cols)) != len(names) + len(group_cols):
            raise ValueError("aggregate output names must be unique and "
                             "distinct from group columns")
        reserved = {"op", _SRC_SNAP_COL} & (set(names) | set(group_cols))
        if reserved:
            raise ValueError(f"reserved column names: {sorted(reserved)}")
        for _, fn, _ in aggs:
            if fn not in _SUPPORTED_FNS:
                raise ValueError(f"unsupported aggregate {fn!r}")

        src_snap = source.current_snapshot()["snapshot_id"]
        full = source.read(snapshot_id=src_snap).groupBy(*group_cols).agg(
            *[_agg_expr(fn, col, name) for name, fn, col in aggs]
        )
        # derive the MV schema from the COMPUTED types (sum(int)→bigint,
        # avg→double …) so create and refresh can never disagree
        ddl = [(f.name, f.dataType.simpleString()) for f in full.schema.fields]
        ddl.append((_SRC_SNAP_COL, "bigint"))
        mv = LakeTable.create(
            spark, path, TableSchema.from_ddl(ddl),
            key_cols=tuple(group_cols), order_col=_SRC_SNAP_COL,
            num_buckets=num_buckets,
        )
        merge_batch(
            mv,
            full.withColumn(_SRC_SNAP_COL, F.lit(src_snap))
                .withColumn("op", F.lit("upsert")),
            epoch_id=src_snap, app_id=_MV_APP_ID,
        )
        spec = {
            "source_path": str(source.path),
            "group_cols": list(group_cols),
            "aggs": [[name, fn, col] for name, fn, col in aggs],
            "last_snapshot": src_snap,
        }
        _write_spec(path, spec)
        return MaterializedAggregate(spark, path)

    @staticmethod
    def load(spark: SparkSession, path: str | Path) -> "MaterializedAggregate":
        return MaterializedAggregate(spark, path)

    # ----------------------------------------------------------------- read
    def read(self) -> DataFrame:
        return self.table.read().drop(_SRC_SNAP_COL)

    # -------------------------------------------------------------- refresh
    def _plan_refresh(self, source: LakeTable) -> dict:
        """Build the refresh's DataFrames without committing anything.

        Returns ``{"mode": "noop", "advance": bool, ...}`` when there is
        nothing to compute, else the lazy production DataFrames:
        ``refreshed`` (the upsert aggregate), ``gone_rows`` (the delete
        batch, recompute mode only, else None) and the change-set
        ``stats`` row.  :meth:`refresh` commits these; the plan audit
        (tools/dump_plans.py) ``explain``\\ s them — so the audited plan
        IS the production plan, never a reconstruction.  In recompute
        mode ``refreshed`` comes back cache()-marked and the caller owns
        ``unpersist()``.
        """
        group_cols = self.spec["group_cols"]
        aggs = [(n, f_, c) for n, f_, c in self.spec["aggs"]]
        last = self.spec["last_snapshot"]
        to_snap = source.current_snapshot()["snapshot_id"]
        base = {"from_snapshot": last, "to_snapshot": to_snap}
        if to_snap <= last:
            return {"mode": "noop", "advance": False, **base}

        ch = source.changes(last, to_snap)
        # one pass over the (small) change set: volume, regime, dirty size
        stats = ch.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("change_type") != "insert").alias("non_insert"),
            F.countDistinct(F.struct(*group_cols)).alias("dirty"),
        ).first()
        if stats["n"] == 0:
            # metadata-only snapshots (compaction, wipes of empty ranges)
            return {"mode": "noop", "advance": True, **base}

        additive = stats["non_insert"] == 0 and all(
            fn in _ADDITIVE_FNS for _, fn, _ in aggs
        )
        key_cols = list(source.key_cols())
        if additive or set(group_cols) <= set(key_cols):
            # inserts can't move a row OUT of a group (a pre-existing key
            # would be an update), and key-derived groups are immutable per
            # row — the change rows' own group values name every dirty
            # group
            dirty = ch.select(*group_cols).distinct()
        else:
            # a group-by column that is a mutable attribute (not part of
            # the key) can CHANGE on update: the changelog row carries
            # only the NEW group, so the group the row LEFT would silently
            # go stale.  The changelog has no pre-image rows — but the
            # lake has time travel: dirty = the changed KEYS' groups in
            # the new snapshot ∪ the same keys' groups in the previous
            # one.  Both reads are column-pruned (key + group cols) and
            # key-semi-joined, the same cost class as the recompute scan.
            keys = ch.select(*key_cols).distinct()
            if stats["n"] <= _DIRTY_BROADCAST_CAP:
                keys = F.broadcast(keys)
            dirty = (
                source.read(snapshot_id=to_snap)
                .join(keys, on=key_cols, how="left_semi")
                .select(*group_cols)
                .unionByName(
                    source.read(snapshot_id=last)
                    .join(keys, on=key_cols, how="left_semi")
                    .select(*group_cols)
                )
                .distinct()
            )
        if stats["n"] <= _DIRTY_BROADCAST_CAP:
            # dirty groups ≤ change rows: the change-volume bound gates the
            # hint even when the dirty set itself was derived via snapshots
            dirty = F.broadcast(dirty)
        if additive:
            delta = ch.groupBy(*group_cols).agg(
                *[_agg_expr(fn, col, name) for name, fn, col in aggs]
            )
            current = self.table.read().drop(_SRC_SNAP_COL).join(
                dirty, on=group_cols, how="left_semi"
            )
            joined = delta.alias("_d").join(
                current.alias("_mv"), on=group_cols, how="left"
            )
            refreshed = joined.select(
                *group_cols,
                *[_combine_expr(fn, name) for name, fn, _ in aggs],
            )
            gone_rows = None
            mode = "additive"
        else:
            # cache: the tiny (≤ dirty groups) agg result is referenced by
            # the anti-join AND the MERGE — without it each reference
            # re-scans the source table
            refreshed = (
                source.read(snapshot_id=to_snap)
                .join(dirty, on=group_cols, how="left_semi")
                .groupBy(*group_cols)
                .agg(*[_agg_expr(fn, col, name) for name, fn, col in aggs])
            ).cache()
            # groups whose last live row was deleted in the window
            gone = dirty.join(
                refreshed.select(*group_cols), on=group_cols, how="left_anti"
            )
            mv_schema = self.table.current_schema()
            agg_types = {f.name: f.dtype for f in mv_schema.fields}
            gone_rows = gone.select(
                *group_cols,
                *[
                    F.lit(None).cast(agg_types[name]).alias(name)
                    for name, _, _ in aggs
                ],
                F.lit(to_snap).alias(_SRC_SNAP_COL),
                F.lit("delete").alias("op"),
            )
            mode = "recompute"

        return {
            "mode": mode, "refreshed": refreshed, "gone_rows": gone_rows,
            "stats": stats, **base,
        }

    def refresh(self, source: LakeTable | None = None) -> RefreshResult:
        source = source if source is not None else LakeTable.load(
            self.spark, self.spec["source_path"]
        )
        plan = self._plan_refresh(source)
        last, to_snap = plan["from_snapshot"], plan["to_snapshot"]
        if plan["mode"] == "noop":
            if plan["advance"]:
                self.spec["last_snapshot"] = to_snap
                _write_spec(self.path, self.spec)
            return RefreshResult("noop", last, to_snap, 0, 0)

        mode, refreshed = plan["mode"], plan["refreshed"]
        batch = refreshed.withColumn(_SRC_SNAP_COL, F.lit(to_snap)).withColumn(
            "op", F.lit("upsert")
        )
        if plan["gone_rows"] is not None:
            batch = batch.unionByName(plan["gone_rows"])

        try:
            res = merge_batch(self.table, batch, epoch_id=to_snap, app_id=_MV_APP_ID)
        finally:
            if mode == "recompute":
                refreshed.unpersist()
        if mode == "additive":
            n_refreshed, n_deleted = int(plan["stats"]["dirty"]), 0
        else:
            # counts ride the MERGE's own stats (its planning aggregation
            # already counted the batch): every gone-group row is a delete
            # of an existing MV row, so rows_deleted IS the gone count —
            # this replaces two extra count() jobs per refresh (r6)
            n_deleted = res.rows_deleted
            n_refreshed = res.rows_in - n_deleted
        self.spec["last_snapshot"] = to_snap
        _write_spec(self.path, self.spec)
        return RefreshResult(
            mode, last, to_snap,
            groups_refreshed=n_refreshed,
            groups_deleted=n_deleted,
        )


def _write_spec(path: Path, spec: dict) -> None:
    """Atomic replace: readers of mv.json never observe a torn write."""
    tmp = path / f".mv-{uuid.uuid4().hex}.json"
    with open(tmp, "w") as f:
        json.dump(spec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path / "mv.json")
