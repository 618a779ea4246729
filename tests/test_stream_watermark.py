"""T2/T4: watermarked source dedupe ahead of the MERGE (at-least-once
sources), plus json source + file-sink JobSpec modes."""

from __future__ import annotations

import pandas as pd

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.oracle import replay_oracle
from rocket_etl_spark.plans.jobspec import DestSpec, JobSpec, SourceSpec, run_job
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_stream


def test_source_dedupe_watermark_absorbs_duplicate_rows(spark, tmp_path):
    """The same event rows delivered twice within one file batch are dropped
    by dropDuplicatesWithinWatermark before the MERGE; final state matches
    the oracle over the UNIQUE events."""
    import pathlib
    import shutil
    import tempfile

    ev = change_events(spark, 2_000, seed=33, delete_frac=0.1)
    doubled = ev.unionByName(ev)  # at-least-once: every event delivered twice
    out = tempfile.mkdtemp()
    doubled.coalesce(1).write.parquet(out + "/b")
    part = next(pathlib.Path(out + "/b").glob("part-*.parquet"))
    (tmp_path / "events").mkdir()
    shutil.move(str(part), str(tmp_path / "events" / "b0.parquet"))

    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    results = replay_stream(
        spark, table, tmp_path / "events", tmp_path / "ckpt",
        source_dedupe_watermark="10 minutes",
    )
    assert sum(r.rows_in for r in results) == 2_000  # dupes dropped pre-merge

    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle([ev.toPandas()])
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)


def test_json_source_and_file_sink(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    ).coalesce(1).write.json(str(tmp_path / "in"))

    spec = JobSpec(
        name="tocsv",
        source=SourceSpec(format="json", path=str(tmp_path / "in"),
                          schema_ddl="id bigint, v string"),
        dest=DestSpec(mode="file", path=str(tmp_path / "out"), file_format="csv"),
    )
    run_job(spark, spec)
    back = spark.read.option("header", True).schema("id bigint, v string").csv(
        str(tmp_path / "out")
    )
    assert sorted(r["v"] for r in back.collect()) == ["a", "b"]
