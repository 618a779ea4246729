"""Compaction interleaved with live ingestion must not change results."""

from __future__ import annotations

import pandas as pd

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.maintenance import compact
from rocket_etl_spark.oracle import replay_oracle
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch, replay_stream


def test_compact_between_batches_converges(spark, tmp_path):
    ev = change_events(spark, 4_000, seed=19, delete_frac=0.15)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    pdfs = []
    for i in range(4):
        b = ev.filter((ev.event_seq >= i * 1_000) & (ev.event_seq < (i + 1) * 1_000))
        pdfs.append(b.toPandas())
        res = replay_batch(table, b, epoch_id=i)
        # compact mid-stream using the replay low watermark: nothing below
        # this epoch's min seq can be re-delivered by an in-order source
        compact(table, tombstone_watermark=res.event_seq_min)
    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle(pdfs)
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


def test_compact_retries_when_merge_wins_the_cas(spark, tmp_path, monkeypatch):
    """A concurrent MERGE stealing compaction's target snapshot id must not
    abort the compaction: it retries from the new tip and BOTH commit,
    with the final state identical to the oracle over all events."""
    from rocket_etl_spark.lake.table import LakeTable

    ev = change_events(spark, 2_000, seed=29, delete_frac=0.1)
    b1 = ev.filter(ev.event_seq < 1_000)
    b2 = ev.filter(ev.event_seq >= 1_000)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, b1, epoch_id=0)

    real = LakeTable._try_write_snapshot
    state = {"raced": False}

    def racy(self, snap):
        # just before the compaction's first CAS, a merge commits and wins
        if not state["raced"] and snap.get("stats", {}).get("compacted"):
            state["raced"] = True
            replay_batch(table, b2, epoch_id=1)
        return real(self, snap)

    monkeypatch.setattr(LakeTable, "_try_write_snapshot", racy)
    res = compact(table, min_files=1)
    assert state["raced"], "the race never fired"
    snap = table.current_snapshot()
    assert snap["stats"].get("compacted")            # compaction committed last
    assert res["snapshot_id"] == snap["snapshot_id"]
    assert table.committed_epochs() == {0, 1}        # the merge also committed
    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle([b1.toPandas(), b2.toPandas()])
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


def test_stream_with_compact_every(spark, tmp_path):
    import pathlib
    import shutil
    import tempfile

    ev = change_events(spark, 3_000, seed=23, delete_frac=0.15)
    (tmp_path / "events").mkdir()
    pdfs = []
    for i in range(3):
        b = ev.filter((ev.event_seq >= i * 1_000) & (ev.event_seq < (i + 1) * 1_000))
        pdfs.append(b.toPandas())
        t = tempfile.mkdtemp()
        b.coalesce(1).write.parquet(t + "/o")
        part = next(pathlib.Path(t + "/o").glob("part-*.parquet"))
        shutil.move(str(part), str(tmp_path / "events" / f"b{i}.parquet"))

    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        max_files_per_trigger=1, compact_every=2,
    )
    snap = table.current_snapshot()
    assert snap["stats"].get("compacted") or snap["parent_id"] is not None  # compaction ran
    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle(pdfs)
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
    # epochs remain fenced after interleaved compaction snapshots
    assert table.committed_epochs() == {0, 1, 2}
