"""M4: schema evolution — add / rename / widen across replayed batches."""

from __future__ import annotations

import pandas as pd

from rocket_etl_spark.generate import change_events, with_evolution
from rocket_etl_spark.oracle import replay_oracle
from rocket_etl_spark.schema.registry import TableSchema
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch


def _state(table):
    return table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)


def test_add_rename_widen_sequence(spark, tmp_path):
    events = change_events(spark, 6_000, seed=17, delete_frac=0.05)
    b1 = events.filter(events.event_seq < 2_000)                      # v1 base
    b2 = with_evolution(
        events.filter((events.event_seq >= 2_000) & (events.event_seq < 4_000)), 2
    )                                                                 # v2: +size_bytes int
    b3 = with_evolution(events.filter(events.event_seq >= 4_000), 4)  # v3+v4: rename+long

    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    replay_batch(table, b1, epoch_id=0)
    v_after_1 = table.current_snapshot()["current_schema_version"]

    replay_batch(table, b2, epoch_id=1)
    sch2 = table.current_schema()
    assert "size_bytes" in sch2.names() and sch2.version > v_after_1
    assert sch2.field_by_name("size_bytes").dtype == "int"

    replay_batch(table, b3, epoch_id=2)
    sch3 = table.current_schema()
    assert "language" in sch3.names() and "lang" not in sch3.names()
    assert sch3.field_by_name("size_bytes").dtype == "bigint"
    # rename preserved the field id (Iceberg semantics)
    assert sch3.field_by_name("language").id == sch2.field_by_name("lang").id

    eng = _state(table)
    ora = replay_oracle([b1.toPandas(), b2.toPandas(), b3.toPandas()])
    assert list(eng.columns) == list(ora.columns)
    # rows last written under v1 have null size_bytes; v2+ rows have it
    assert eng[eng.last_event_seq < 2_000]["size_bytes"].isna().all()
    assert eng[eng.last_event_seq >= 2_000]["size_bytes"].notna().all()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_old_files_readable_after_evolution(spark, tmp_path):
    """Files written under v1 are projected (null-backfill + rename) at read."""
    events = change_events(spark, 2_000, seed=23)
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=32)
    replay_batch(table, events.filter(events.event_seq < 1_000), epoch_id=0)
    # a small v3 batch touches only a few of the 32 buckets → v1 files survive
    replay_batch(
        table,
        with_evolution(
            events.filter((events.event_seq >= 1_000) & (events.event_seq < 1_020)), 3
        ),
        epoch_id=1,
    )

    snap = table.current_snapshot()
    svs = {fe["sv"] for files in snap["buckets"].values() for fe in files}
    assert len(svs) >= 2  # mixed write-time schemas coexist in one snapshot
    df = table.read()
    assert "language" in df.columns
    assert df.filter("language IS NULL").count() == 0  # rename, not drop+add


def test_registry_rules():
    s1 = TableSchema.from_ddl([("a", "int"), ("b", "string")])
    s2 = s1.add_column("c", "double")
    s3 = s2.rename_column("a", "a2")
    s4 = s3.widen_column("a2", "bigint")
    assert [f.name for f in s4.fields] == ["a2", "b", "c"]
    assert s4.field_by_name("a2").id == 1 and s4.field_by_name("a2").dtype == "bigint"
    assert s4.version == 4
    import pytest

    with pytest.raises(ValueError):
        s4.widen_column("b", "int")  # string→int is not a widen
    with pytest.raises(ValueError):
        s4.add_column("b", "string")  # duplicate name
