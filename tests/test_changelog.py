"""Changelog (CDC-out) reads: changes between snapshots match lineage."""

from __future__ import annotations

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.maintenance import compact
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch


def test_changes_match_commit_stats(spark, tmp_path):
    ev = change_events(spark, 3_000, seed=29, delete_frac=0.15)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    results = []
    for i in range(3):
        b = ev.filter((ev.event_seq >= i * 1_000) & (ev.event_seq < (i + 1) * 1_000))
        results.append(replay_batch(table, b, epoch_id=i))

    for i, res in enumerate(results):
        ch = table.changes(res.snapshot_id - 1, res.snapshot_id)
        counts = {r["change_type"]: r["count"] for r in ch.groupBy("change_type").count().collect()}
        assert counts.get("insert", 0) + counts.get("update", 0) == res.rows_upserted
        assert counts.get("delete", 0) == res.rows_deleted

    # full range = sum of per-epoch changes; keep/stale rows never leak
    all_ch = table.changes(0)
    assert all_ch.count() == sum(r.rows_upserted + r.rows_deleted for r in results)
    assert set(all_ch.columns) >= {"repo", "path", "content_sha256", "change_type"}

    # compaction snapshots contribute no changes
    compact(table, tombstone_watermark=3_001)
    sid = table.current_snapshot()["snapshot_id"]
    assert table.changes(sid - 1, sid).count() == 0

    # a delete row carries the key with change_type='delete'
    deletes = all_ch.filter("change_type = 'delete'")
    if deletes.count() > 0:
        r = deletes.first()
        assert r["repo"] and r["path"]
