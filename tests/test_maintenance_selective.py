"""Selective compaction: rewrite cost ∝ fragmentation, not table size."""

from __future__ import annotations

import pandas as pd

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.maintenance import compact, table_stats
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch


def test_selective_compact_touches_only_fragmented_buckets(spark, tmp_path):
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=8)
    # three epochs fragment the touched buckets (merge adds files per epoch)
    for i in range(3):
        ev = change_events(spark, 2_000, seed=40 + i, delete_frac=0.1)
        replay_batch(table, ev, epoch_id=i)

    before = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    snap0 = table.current_snapshot()
    single = {b for b, fl in snap0["buckets"].items() if len(fl) == 1}
    frag = {b for b, fl in snap0["buckets"].items() if len(fl) >= 2}
    assert frag  # the scenario actually fragments something

    stats = compact(table)  # defaults: selective, no tombstone purge
    assert stats["buckets_rewritten"] == len(frag)

    snap1 = table.current_snapshot()
    # untouched buckets keep their EXACT file lists; fragmented → 1 file
    for b in single:
        assert snap1["buckets"][b] == snap0["buckets"][b]
    for b in frag:
        assert len(snap1["buckets"][b]) == 1

    after = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after, check_dtype=False)

    # second selective pass: nothing fragmented → snapshot untouched
    stats2 = compact(table)
    assert stats2["buckets_rewritten"] == 0
    assert table.current_snapshot()["snapshot_id"] == snap1["snapshot_id"]


def test_table_stats_metadata_only(spark, tmp_path):
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 3_000, seed=5, delete_frac=0.1)
    replay_batch(table, ev, epoch_id=0)

    st = table_stats(table)
    live = table.read().count()
    tomb = table.read(include_tombstones=True).count()
    assert st["total_rows"] == tomb  # footer counts include tombstones
    assert st["total_rows"] >= live
    assert st["populated_buckets"] <= st["num_buckets"] == 4
    assert st["total_files"] == sum(
        len(fl) for fl in table.current_snapshot()["buckets"].values()
    )


def test_expire_dry_run_reports_without_deleting(spark, tmp_path):
    from rocket_etl_spark.generate import change_events
    from rocket_etl_spark.lake.maintenance import expire_snapshots
    from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch

    events = change_events(spark, 2_000, seed=91)
    t = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    for i in range(2):
        replay_batch(
            t,
            events.filter(
                (events.event_seq >= i * 1_000) & (events.event_seq < (i + 1) * 1_000)
            ),
            epoch_id=i,
        )
    n_files = sum(1 for _ in (t.path / "data").rglob("*.parquet"))
    n_snaps = len(t._snapshot_files())
    rep = expire_snapshots(t, keep_last=1, orphan_min_age_s=0.0, dry_run=True)
    assert rep["dry_run"] and rep["files_removed"] > 0 and rep["sample"]
    # nothing actually deleted
    assert sum(1 for _ in (t.path / "data").rglob("*.parquet")) == n_files
    assert len(t._snapshot_files()) == n_snaps
    real = expire_snapshots(t, keep_last=1, orphan_min_age_s=0.0)
    assert real["files_removed"] == rep["files_removed"]
    assert real["snapshots_removed"] == rep["snapshots_removed"]
