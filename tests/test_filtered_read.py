"""Zone-map pruning for declarative filtered reads (lake/lookup.py
``filtered_read`` + jobspec lake sources) — round-5 verdict item #4:
users write ``filter``, not ``range_scan``; a simple range/equality
predicate on a zone-mapped column must prune files automatically, with
the residual predicate keeping the answer identical.
"""

import pyspark.sql.functions as F

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.lake.lookup import _parse_prunable_conjuncts, filtered_read
from rocket_etl_spark.lake.maintenance import compact
from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch


def _clustered_table(spark, tmp_path):
    table = create_repo_files_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 6000, seed=31, delete_frac=0.05)
    replay_batch(table, ev, epoch_id=0)
    # clustered compaction: each file covers a disjoint (repo, path) slice,
    # the layout zone-map range pruning exists to exploit (explicit
    # buckets: the selective default skips 1-file buckets)
    compact(
        table, buckets=[0, 1, 2, 3], sort_cols=["repo", "path"],
        target_file_rows=400,
    )
    return table


def test_parser_is_conservative():
    from rocket_etl_spark.streaming.replay import REPO_FILES_SCHEMA

    s = REPO_FILES_SCHEMA
    assert _parse_prunable_conjuncts("repo >= 'r-01' AND repo <= 'r-02'", s) == {
        "repo": ("r-01", "r-02")
    }
    assert _parse_prunable_conjuncts("repo BETWEEN 'a' AND 'b'", s) == {
        "repo": ("a", "b")
    }
    assert _parse_prunable_conjuncts("lang = 'py'", s) == {"lang": ("py", "py")}
    # int bound on a bigint column
    assert _parse_prunable_conjuncts("last_event_seq > 100", s) == {
        "last_event_seq": (100, None)
    }
    # anything non-conjunctive or non-literal contributes nothing
    assert _parse_prunable_conjuncts("repo = 'a' OR repo = 'b'", s) == {}
    assert _parse_prunable_conjuncts("(repo = 'a')", s) == {}
    assert _parse_prunable_conjuncts("length(repo) > 3", s) == {}
    assert _parse_prunable_conjuncts("repo IN ('a', 'b')", s) == {}
    # numeric literal against a string column: skipped
    assert _parse_prunable_conjuncts("repo >= 5", s) == {}


def test_filtered_read_prunes_and_matches(spark, tmp_path):
    table = _clustered_table(spark, tmp_path)
    lo = table.read().select(F.min("repo")).first()[0]
    pred = f"repo <= '{lo}'"
    pruned, stats = filtered_read(table, pred, return_stats=True)
    assert stats["files_scanned"] < stats["files_total"], stats
    assert stats["pruned_on"] == ["repo"]
    expect = table.read().filter(pred)
    got = {tuple(r) for r in pruned.select("repo", "path", "last_event_seq").collect()}
    want = {tuple(r) for r in expect.select("repo", "path", "last_event_seq").collect()}
    assert got == want and want


def test_jobspec_lake_source_prunes(spark, tmp_path):
    from rocket_etl_spark.plans.jobspec import (
        DestSpec, JobSpec, SourceSpec, TransformSpec, extract, run_job,
    )

    table = _clustered_table(spark, tmp_path)
    lo = table.read().select(F.min("repo")).first()[0]
    spec = JobSpec(
        name="lake-read",
        source=SourceSpec(format="lake", path=str(tmp_path / "t")),
        transform=TransformSpec(filter=f"repo <= '{lo}'"),
        dest=DestSpec(mode="file", path=str(tmp_path / "out"), file_format="parquet"),
    )
    # the extract's scan covers fewer files than the table holds — assert
    # via the physical plan's input file count
    df = extract(spark, spec)
    scanned_files = {r[0] for r in df.select(F.input_file_name()).distinct().collect()}
    snap = table.current_snapshot()
    total_files = sum(len(fl) for fl in snap["buckets"].values())
    assert len(scanned_files) < total_files, (len(scanned_files), total_files)
    # equivalence end-to-end: the job's output equals the unpruned
    # read+filter
    run_job(spark, spec)
    out = spark.read.parquet(str(tmp_path / "out"))
    want = table.read().filter(f"repo <= '{lo}'")
    assert out.count() == want.count() > 0

    # a transform that touches the filtered column disables pruning on it
    # (correctness guard), but the job still runs and matches
    spec2 = JobSpec(
        name="lake-read-renamed",
        source=SourceSpec(format="lake", path=str(tmp_path / "t")),
        transform=TransformSpec(
            renames={"repo": "repository"}, filter=f"repository <= '{lo}'"
        ),
        dest=DestSpec(mode="file", path=str(tmp_path / "out2"), file_format="parquet"),
    )
    run_job(spark, spec2)
    out2 = spark.read.parquet(str(tmp_path / "out2"))
    assert out2.count() == want.count()
