"""Rollback (lake/maintenance.py::rollback): metadata-only restore of a
prior snapshot as the new tip, with fence reversion so the undone epochs
are re-deliverable — the recovery tool for a bad epoch that slipped past
the audit."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.maintenance import expire_snapshots, rollback
from rocket_etl_spark.lake.metadata import create_tag, resolve_tag, snapshots
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch


def _state(table) -> pd.DataFrame:
    return (
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )


def test_rollback_restores_state_and_reverts_fences(spark, tmp_path):
    t = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(t, change_events(spark, 2_000, seed=1), epoch_id=0)
    replay_batch(t, change_events(spark, 1_000, seed=2), epoch_id=1)
    good = _state(t)
    good_tip = t.current_snapshot()["snapshot_id"]
    # a bad epoch lands (poisoned lang), then is noticed too late
    bad = change_events(spark, 500, seed=3).withColumn("lang", F.lit("??BAD??"))
    replay_batch(t, bad, epoch_id=2)
    assert t.is_epoch_committed(2)

    res = rollback(t, good_tip)
    assert res["rolled_back"] and res["restored"] == good_tip
    assert res["undone_snapshots"] == 1
    # state is byte-identical to the good tip, via a NEW snapshot
    pd.testing.assert_frame_equal(_state(t), good)
    assert t.current_snapshot()["snapshot_id"] == good_tip + 2
    # fences reverted: epoch 2 is re-deliverable, epochs 0/1 still fenced
    assert not t.is_epoch_committed(2)
    assert t.is_epoch_committed(0) and t.is_epoch_committed(1)
    fixed = change_events(spark, 500, seed=3)
    assert not replay_batch(t, fixed, epoch_id=2).skipped
    assert t.is_epoch_committed(2)
    # and the re-delivery is now fenced like any committed epoch
    assert replay_batch(t, fixed, epoch_id=2).skipped


def test_rollback_guards_and_metadata(spark, tmp_path):
    t = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(t, change_events(spark, 1_000, seed=1), epoch_id=0)
    tip = t.current_snapshot()["snapshot_id"]
    # rolling back to the tip is a no-op, not an error
    assert rollback(t, tip)["rolled_back"] is False
    # a non-existent / non-ancestor target raises
    with pytest.raises(ValueError):
        rollback(t, tip + 7)
    replay_batch(t, change_events(spark, 500, seed=2), epoch_id=1)
    rollback(t, tip)
    ops = {r["snapshot_id"]: r["operation"] for r in snapshots(t).collect()}
    assert ops[t.current_snapshot()["snapshot_id"]] == "rollback"
    # changelog convention: the rollback commit itself contributes nothing
    assert t.changes(from_snapshot=tip + 1).count() == 0


def test_rollback_pairs_with_tags_and_survives_expiry(spark, tmp_path):
    t = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(t, change_events(spark, 1_500, seed=1), epoch_id=0)
    create_tag(t, "lkg")
    good = _state(t)
    replay_batch(t, change_events(spark, 700, seed=2), epoch_id=1)
    replay_batch(t, change_events(spark, 700, seed=3), epoch_id=2)
    # expire FIRST: the pin sits past an expiry hole in the chain —
    # rollback must still accept it (the chain is linear; retained +
    # older-than-tip IS an ancestor)
    expire_snapshots(t, keep_last=1, orphan_min_age_s=0.0)
    rollback(t, resolve_tag(t, "lkg"))
    pd.testing.assert_frame_equal(_state(t), good)
    # and expiring again after the rollback keeps the re-referenced files
    expire_snapshots(t, keep_last=1, orphan_min_age_s=0.0)
    pd.testing.assert_frame_equal(_state(t), good)
