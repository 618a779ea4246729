"""M3: Structured Streaming replay — exactly-once, resume, lineage."""

from __future__ import annotations

import pandas as pd

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.oracle import replay_oracle
from rocket_etl_spark.streaming.replay import (
    create_repo_files_table,
    read_lineage,
    replay_stream,
)


def _write_one(b, dest, name):
    """Write a batch as ONE flat parquet file (file stream sources list
    plain files in the monitored dir, not nested directories)."""
    import shutil
    import tempfile
    from pathlib import Path

    tmp = tempfile.mkdtemp()
    b.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
    part = next(Path(f"{tmp}/out").glob("part-*.parquet"))
    Path(dest).mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), str(Path(dest) / f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def _write_batches(spark, dest, n_batches=4, per_batch=1_500, seed=21):
    events = change_events(spark, n_batches * per_batch, seed=seed, delete_frac=0.1)
    pdfs = []
    for i in range(n_batches):
        b = events.filter(
            (events.event_seq >= i * per_batch) & (events.event_seq < (i + 1) * per_batch)
        )
        _write_one(b, dest, f"batch-{i}")
        pdfs.append(b.toPandas())
    return pdfs


def test_stream_replay_matches_oracle_with_lineage(spark, tmp_path):
    pdfs = _write_batches(spark, tmp_path / "events")
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=8)
    results = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt", max_files_per_trigger=1
    )
    assert len(results) >= 1 and all(not r.skipped for r in results)

    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle(pdfs)
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)

    lin = read_lineage(spark, table).toPandas()
    assert lin["rows_in"].sum() == sum(len(p) for p in pdfs)
    assert lin["event_seq_min"].min() == 0
    assert lin["event_seq_max"].max() == sum(len(p) for p in pdfs) - 1
    assert (lin["wall_ms"] >= 0).all()


def test_stream_resume_from_checkpoint(spark, tmp_path):
    """New files after a completed run are picked up; replays are fenced."""
    pdfs = _write_batches(spark, tmp_path / "events", n_batches=2, seed=5)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_stream(spark, table, tmp_path / "events", tmp_path / "ckpt")
    snap_mid = table.current_snapshot()["snapshot_id"]

    # rerun with nothing new: checkpoint says all files consumed → no commits
    replay_stream(spark, table, tmp_path / "events", tmp_path / "ckpt")
    assert table.current_snapshot()["snapshot_id"] == snap_mid

    # two more batches arrive; the SAME checkpoint resumes past the old ones
    events2 = change_events(spark, 6_000, seed=5, delete_frac=0.1)
    for i in (2, 3):
        b = events2.filter(
            (events2.event_seq >= i * 1_500) & (events2.event_seq < (i + 1) * 1_500)
        )
        _write_one(b, tmp_path / "events", f"batch-{i}")
        pdfs.append(b.toPandas())
    replay_stream(spark, table, tmp_path / "events", tmp_path / "ckpt")

    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle(pdfs)
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


def test_stream_crash_replay_is_fenced(spark, tmp_path):
    """Fence scoping (Delta txnAppId/txnVersion semantics): a DIFFERENT
    checkpoint is a different stream whose epochs restart at 0, so its
    commits must NOT be skipped against the first stream's numbering —
    they re-apply and the LWW guard converges to the identical state.
    The SAME fence scope (same app_id) replaying the same epochs IS
    skipped — the actual crash-retry case."""
    _write_batches(spark, tmp_path / "events", n_batches=2, seed=13)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    r1 = replay_stream(spark, table, tmp_path / "events", tmp_path / "ckpt1")
    s1 = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    # a NEW checkpoint is a NEW stream: same epoch ids, fresh fence scope —
    # commits apply (not silently skipped) and LWW converges to same state
    r2 = replay_stream(spark, table, tmp_path / "events", tmp_path / "ckpt2")
    s2 = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert [r.epoch_id for r in r2] == [r.epoch_id for r in r1]
    assert not any(r.skipped for r in r2)  # different scope → not fenced
    pd.testing.assert_frame_equal(s1, s2, check_dtype=False)
    # the crash-retry case: same fence scope, same epochs → skipped
    r3 = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt3", app_id="pinned"
    )
    r4 = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt4", app_id="pinned"
    )
    assert not any(r.skipped for r in r3)
    assert all(r.skipped for r in r4)
    pd.testing.assert_frame_equal(
        s1,
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_bucket_lineage_consistency(spark, tmp_path):
    """Per-partition lineage rows (one per touched bucket per epoch) sum
    exactly to the epoch-level lineage and nest within its event range."""
    from rocket_etl_spark.streaming.replay import read_bucket_lineage

    _write_batches(spark, tmp_path / "events", n_batches=3, per_batch=1_000, seed=9)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=8)
    replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt", max_files_per_trigger=1
    )
    lin = read_lineage(spark, table).toPandas()
    bl = read_bucket_lineage(spark, table).toPandas()

    cols = ["rows_in", "rows_upserted", "rows_deleted"]
    agg = bl.groupby("epoch_id")[cols].sum().sort_index()
    per_epoch = lin.set_index("epoch_id")[cols].sort_index()
    pd.testing.assert_frame_equal(agg, per_epoch, check_dtype=False)

    assert bl["bucket"].between(0, 7).all()
    tb = lin.set_index("epoch_id")["touched_buckets"].sort_index()
    n_buckets = (
        bl.groupby("epoch_id")["bucket"].nunique().reindex(tb.index, fill_value=0)
    )
    assert (n_buckets == tb).all()

    joined = bl.merge(lin, on="epoch_id", suffixes=("_b", ""))
    assert (joined["event_seq_min_b"] >= joined["event_seq_min"]).all()
    assert (joined["event_seq_max_b"] <= joined["event_seq_max"]).all()


def test_action_counts_spark_fallback_matches_pyarrow(spark, tmp_path):
    """The large-commit Spark path of the per-bucket action counter agrees
    with the default driver-side pyarrow path (which fed bucket_stats)."""
    from rocket_etl_spark.generate import change_events
    from rocket_etl_spark.lake.merge import _action_counts
    from rocket_etl_spark.streaming.replay import replay_batch

    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 3_000, seed=7, delete_frac=0.1)
    res = replay_batch(table, ev, epoch_id=0)

    snap = table.current_snapshot()
    added = {int(b): fl for b, fl in snap["added_files"].items()}
    first = next(iter(added.values()))[0]["path"]  # data/commit-X/_bucket=N/f
    out_dir = table.path / "/".join(first.split("/")[:2])
    via_spark = _action_counts(spark, out_dir, added, max_driver_files=0)

    by_bucket = {bs["bucket"]: bs for bs in res.bucket_stats}
    assert set(via_spark) == set(by_bucket)
    for b, counts in via_spark.items():
        up = counts.get("insert", 0) + counts.get("update", 0)
        assert up == by_bucket[b]["rows_upserted"]
        assert counts.get("delete", 0) == by_bucket[b]["rows_deleted"]


def test_stream_audit_quarantines_poisoned_batch(spark, tmp_path):
    """audit_rules: each micro-batch is staged, audited, and published
    only if clean; a poisoned batch aborts invisibly, its raw events land
    in the quarantine sink, its epoch stays unfenced, and the final state
    equals a replay of the clean batches only."""
    import pytest

    from rocket_etl_spark.generate import change_events
    from rocket_etl_spark.plans.validate import matches
    from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_stream

    import pyspark.sql.functions as F

    events = change_events(spark, 3_600, seed=31, delete_frac=0.1)
    per = 1_200
    slices = [
        events.filter((events.event_seq >= i * per) & (events.event_seq < (i + 1) * per))
        for i in range(3)
    ]
    poisoned = slices[1].withColumn("lang", F.lit("??poison??"))
    for i, b in enumerate([slices[0], poisoned, slices[2]]):
        _write_one(b, tmp_path / "events", f"batch-{i}")

    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    rules = [matches("lang", "^[a-z0-9+#-]{1,12}$", name="lang_shape")]
    with pytest.raises(ValueError, match="quarantine"):
        replay_stream(
            spark, table, tmp_path / "events", tmp_path / "ckpt0", audit_rules=rules
        )
    results = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        max_files_per_trigger=1, audit_rules=rules,
        quarantine_dir=tmp_path / "quarantine",
    )
    assert len(results) == 3
    rejected = [r for r in results if r.skipped]
    assert len(rejected) == 1

    # final state == LWW replay of the two CLEAN batches only
    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle([slices[0].toPandas(), slices[2].toPandas()])
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)

    # quarantine holds exactly the poisoned batch's raw events, stamped
    q = spark.read.parquet(str(tmp_path / "quarantine"))
    assert q.count() == per
    assert set(q.select("lang").distinct().toPandas()["lang"]) == {"??poison??"}
    (qe,) = q.select("_epoch_id").distinct().toPandas()["_epoch_id"].tolist()
    assert qe == rejected[0].epoch_id
    # the rejected epoch is unfenced: replaying the REPAIRED batch lands it
    assert not table.is_epoch_committed(int(qe), app_id=_stream_app_id(tmp_path / "ckpt"))
    from rocket_etl_spark.streaming.replay import replay_batch

    replay_batch(table, slices[1], epoch_id=int(qe),
                 app_id=_stream_app_id(tmp_path / "ckpt"))
    eng2 = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora2 = replay_oracle([s.toPandas() for s in slices])
    pd.testing.assert_frame_equal(eng2[ora2.columns], ora2, check_dtype=False)


def _stream_app_id(checkpoint_dir):
    import hashlib
    from pathlib import Path

    return "stream-" + hashlib.sha256(
        str(Path(checkpoint_dir).resolve()).encode()
    ).hexdigest()[:12]
