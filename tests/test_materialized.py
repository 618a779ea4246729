"""Incremental materialized aggregates: every refresh strategy must land
on exactly the state a full GROUP BY over the current table produces."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.materialized import MaterializedAggregate
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch

AGGS = [
    ("n_files", "count", "*"),
    ("sum_seq", "sum", "last_event_seq"),
    ("max_seq", "max", "last_event_seq"),
    ("min_path", "min", "path"),
]


def _full(table, aggs=AGGS, group=("repo",)):
    from rocket_etl_spark.lake.materialized import _agg_expr

    return table.read().groupBy(*group).agg(
        *[_agg_expr(fn, col, name) for name, fn, col in aggs]
    )


def _assert_frames_equal(got, want, float_cols=()):
    gcols = sorted(got.columns)
    assert gcols == sorted(want.columns)
    g = [r.asDict() for r in got.select(*gcols).collect()]
    w = [r.asDict() for r in want.select(*gcols).collect()]
    key = lambda d: tuple(str(d[c]) for c in gcols)  # noqa: E731
    g.sort(key=key)
    w.sort(key=key)
    assert len(g) == len(w)
    for a, b in zip(g, w):
        for c in gcols:
            if c in float_cols:
                assert a[c] == pytest.approx(b[c], rel=1e-9)
            else:
                assert a[c] == b[c]


def test_initial_build_equals_full_groupby(spark, tmp_path):
    ev = change_events(spark, 2_000, seed=71, delete_frac=0.1)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev, epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)
    _assert_frames_equal(mv.read(), _full(table))
    # no new snapshot → noop, pointer unchanged
    r = mv.refresh(table)
    assert r.mode == "noop" and r.groups_refreshed == 0


def test_recompute_refresh_with_updates_and_deletes(spark, tmp_path):
    ev = change_events(spark, 6_000, seed=72, delete_frac=0.15)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev.filter("event_seq < 3000"), epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)

    # second epoch re-touches existing keys (updates + deletes) → recompute
    replay_batch(table, ev.filter("event_seq >= 3000"), epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "recompute"
    _assert_frames_equal(mv.read(), _full(table))


def test_vanished_group_is_deleted(spark, tmp_path):
    ev = change_events(spark, 2_000, seed=73, delete_frac=0.0, n_repos=20)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev, epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)
    victim = table.read().select("repo").first()["repo"]

    # delete EVERY live row of one repo → its MV group must vanish
    dels = (
        table.read()
        .filter(F.col("repo") == victim)
        .select(
            F.col("last_event_seq") + 1_000_000,
            F.lit("delete").alias("op"),
            "repo", "path", "lang", "content",
        )
        .toDF("event_seq", "op", "repo", "path", "lang", "content")
        .withColumn("event_ts", F.lit(0).cast("long"))
        .withColumn("commit", F.lit("cdel"))
    )
    replay_batch(table, dels, epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "recompute" and r.groups_deleted == 1
    assert mv.read().filter(F.col("repo") == victim).count() == 0
    _assert_frames_equal(mv.read(), _full(table))


def test_additive_fast_path_on_insert_only_epoch(spark, tmp_path):
    ev = change_events(spark, 3_000, seed=74, delete_frac=0.0)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev.withColumn("path", F.concat(F.lit("a/"), "path")), epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)

    # disjoint key space ('b/' prefix) → change feed is pure inserts
    replay_batch(table, ev.withColumn("path", F.concat(F.lit("b/"), "path")), epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "additive" and r.groups_deleted == 0
    _assert_frames_equal(mv.read(), _full(table))


def test_avg_forces_recompute_and_is_correct(spark, tmp_path):
    aggs = [("n", "count", "*"), ("avg_seq", "avg", "last_event_seq")]
    ev = change_events(spark, 3_000, seed=75, delete_frac=0.0)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev.withColumn("path", F.concat(F.lit("a/"), "path")), epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], aggs)

    # insert-only epoch, but avg is not mergeable from its own output
    replay_batch(table, ev.withColumn("path", F.concat(F.lit("b/"), "path")), epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "recompute"
    _assert_frames_equal(mv.read(), _full(table, aggs), float_cols={"avg_seq"})


def test_crash_between_commit_and_pointer_is_exactly_once(spark, tmp_path):
    """A refresh that committed its MERGE but died before advancing
    mv.json must not double-apply on retry (the additive path would
    double every count) — the MV table's epoch fence absorbs it."""
    ev = change_events(spark, 3_000, seed=76, delete_frac=0.0)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev.withColumn("path", F.concat(F.lit("a/"), "path")), epoch_id=0)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)
    spec_before = json.dumps(mv.spec)

    replay_batch(table, ev.withColumn("path", F.concat(F.lit("b/"), "path")), epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "additive"
    want = [r.asDict() for r in mv.read().orderBy("repo").collect()]

    # simulate the crash: MERGE landed, pointer write lost
    with open(mv.path / "mv.json", "w") as f:
        f.write(spec_before)
    mv2 = MaterializedAggregate.load(spark, mv.path)
    assert mv2.spec["last_snapshot"] < mv.spec["last_snapshot"]
    mv2.refresh(table)  # fenced no-op inside; pointer catches up
    assert mv2.spec["last_snapshot"] == mv.spec["last_snapshot"]
    got = [r.asDict() for r in mv2.read().orderBy("repo").collect()]
    assert got == want
    _assert_frames_equal(mv2.read(), _full(table))


def test_multi_column_group_and_reload(spark, tmp_path):
    ev = change_events(spark, 4_000, seed=77, delete_frac=0.1)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev.filter("event_seq < 2000"), epoch_id=0)
    mv = MaterializedAggregate.create(
        spark, tmp_path / "mv", table, ["repo", "lang"], AGGS
    )
    replay_batch(table, ev.filter("event_seq >= 2000"), epoch_id=1)
    # reload from disk — spec round-trips
    mv = MaterializedAggregate.load(spark, tmp_path / "mv")
    mv.refresh()
    _assert_frames_equal(mv.read(), _full(table, group=("repo", "lang")))


def test_update_moving_row_between_groups_refreshes_both(spark, tmp_path):
    """A group column that is a mutable attribute (lang — NOT part of the
    (repo, path) key) can change on update: the changelog row names only
    the NEW group, so the group the row LEFT must be found via the
    previous snapshot or its aggregate silently goes stale (caught by the
    cdc_mv_incremental oracle, r5)."""
    ev = change_events(spark, 2_000, seed=79, delete_frac=0.0)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, ev, epoch_id=0)
    mv = MaterializedAggregate.create(
        spark, tmp_path / "mv", table, ["repo", "lang"], AGGS
    )

    # rewrite EVERY live row of one lang into another lang → the old
    # (repo, old_lang) groups must vanish, the new ones must absorb them
    langs = [r["lang"] for r in table.read().select("lang").distinct().collect()]
    src_lang, dst_lang = sorted(langs)[:2]
    moved = (
        table.read()
        .filter(F.col("lang") == src_lang)
        .select(
            (F.col("last_event_seq") + 1_000_000).alias("event_seq"),
            F.lit("upsert").alias("op"),
            "repo", "path",
            F.lit(dst_lang).alias("lang"),
            "content",
        )
        .withColumn("event_ts", F.lit(0).cast("long"))
        .withColumn("commit", F.lit("cmove"))
    )
    assert moved.count() > 0
    replay_batch(table, moved, epoch_id=1)
    r = mv.refresh(table)
    assert r.mode == "recompute" and r.groups_deleted > 0
    assert mv.read().filter(F.col("lang") == src_lang).count() == 0
    _assert_frames_equal(mv.read(), _full(table, group=("repo", "lang")))


def test_spec_validation(spark, tmp_path):
    ev = change_events(spark, 100, seed=78)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=2)
    replay_batch(table, ev, epoch_id=0)
    with pytest.raises(ValueError, match="unsupported"):
        MaterializedAggregate.create(
            spark, tmp_path / "m1", table, ["repo"], [("x", "median", "last_event_seq")]
        )
    with pytest.raises(ValueError, match="reserved"):
        MaterializedAggregate.create(
            spark, tmp_path / "m2", table, ["repo"], [("op", "count", "*")]
        )
    with pytest.raises(ValueError, match="unique"):
        MaterializedAggregate.create(
            spark, tmp_path / "m3", table, ["repo"],
            [("repo", "count", "*")],
        )


def test_stream_keeps_mv_continuously_fresh(spark, tmp_path):
    """replay_stream(refresh_mvs=[mv]) maintains the rollup inside the
    stream: after every committed micro-batch the MV equals a full GROUP
    BY over the table at that moment (checked at the end for the final
    state; the per-epoch path is the same fenced refresh()), and re-running
    the drained stream refreshes nothing (fence no-op on both sides)."""
    from test_replay_stream import _write_batches

    from rocket_etl_spark.streaming.replay import replay_stream

    _write_batches(spark, tmp_path / "events", n_batches=3, per_batch=800, seed=91)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)

    results = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        max_files_per_trigger=1, refresh_mvs=[mv],
    )
    assert len([r for r in results if not r.skipped]) == 3
    _assert_frames_equal(mv.read(), _full(table))

    # drained re-run: no table commits, no MV movement
    mv_snap = mv.table.current_snapshot()["snapshot_id"]
    replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        max_files_per_trigger=1, refresh_mvs=[mv],
    )
    assert mv.table.current_snapshot()["snapshot_id"] == mv_snap
    _assert_frames_equal(mv.read(), _full(table))


def test_stream_mv_refresh_every_n(spark, tmp_path):
    """refresh_every=2 refreshes on every second committed epoch; the
    final stream state may therefore lag by at most refresh_every-1
    epochs — one trailing refresh() lands it exactly."""
    from test_replay_stream import _write_batches

    from rocket_etl_spark.streaming.replay import replay_stream

    _write_batches(spark, tmp_path / "events", n_batches=3, per_batch=600, seed=92)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    mv = MaterializedAggregate.create(spark, tmp_path / "mv", table, ["repo"], AGGS)
    replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        max_files_per_trigger=1, refresh_mvs=[mv], refresh_every=2,
    )
    mv.refresh(table)  # catch-up for the trailing odd epoch
    _assert_frames_equal(mv.read(), _full(table))
