"""The north rule's deployment contract: the engine runs as a
``spark-submit --py-files rocket_etl_spark.zip`` package end-to-end."""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_zip_is_importable_standalone(tmp_path):
    """--py-files semantics = the zip lands on sys.path; the package must
    import and expose its surface from the archive alone."""
    sys.path.insert(0, str(REPO))
    from tools.package import build

    z = build(tmp_path / "rocket_etl_spark.zip")
    code = (
        "import sys; sys.path.insert(0, {z!r});"
        "import rocket_etl_spark.lake.merge, rocket_etl_spark.streaming.replay,"
        "rocket_etl_spark.operators.dedup, rocket_etl_spark.plans.jobspec;"
        "print('zip-import-ok')"
    ).format(z=str(z))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        cwd=str(tmp_path),  # away from the repo: only the zip can satisfy imports
    )
    assert out.returncode == 0 and "zip-import-ok" in out.stdout, out.stderr[-2000:]


import pytest


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_spark_submit_replay_job_end_to_end(spark, tmp_path, mode):
    """Real spark-submit with the zip: create table, drain a change-event
    dir, verify committed rows — the exact cluster invocation shape.
    Parametrized over both MERGE write strategies (--mode cow/mor)."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not pathlib.Path(spark_submit).exists():
        import pytest

        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, str(REPO))
    from rocket_etl_spark.generate import change_events
    from tools.package import build

    ev = change_events(spark, 2_000, seed=77, delete_frac=0.1)
    (tmp_path / "events").mkdir()
    t = tempfile.mkdtemp()
    ev.coalesce(1).write.parquet(t + "/o")
    part = next(pathlib.Path(t + "/o").glob("part-*.parquet"))
    shutil.move(str(part), str(tmp_path / "events" / "b0.parquet"))
    expected_keys = ev.select("repo", "path").distinct().count()

    z = build(tmp_path / "rocket_etl_spark.zip")
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(z),
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            str(REPO / "jobs" / "replay_job.py"),
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--create", "--buckets", "4", "--stats",
            "--mode", mode,
        ],
        capture_output=True, text=True, timeout=420,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        cwd=str(tmp_path),  # imports must come from the zip, not the repo cwd
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "epoch=0" in out.stdout and "skipped=False" in out.stdout
    assert "'total_files':" in out.stdout  # --stats metadata summary printed

    from rocket_etl_spark.lake.table import LakeTable

    table = LakeTable.load(spark, tmp_path / "table")
    live = table.read()
    assert live.count() > 0
    # every live key is a real key; deletes were applied (fewer than all)
    assert live.select("repo", "path").distinct().count() == live.count() <= expected_keys


def test_spark_submit_audited_replay(spark, tmp_path):
    """--audit-rules (write-audit-publish per micro-batch) through the
    real spark-submit CLI: a clean batch passes the audit and publishes."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not pathlib.Path(spark_submit).exists():
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, str(REPO))
    from rocket_etl_spark.generate import change_events
    from tools.package import build

    ev = change_events(spark, 1_500, seed=78, delete_frac=0.1)
    (tmp_path / "events").mkdir()
    t = tempfile.mkdtemp()
    ev.coalesce(1).write.parquet(t + "/o")
    part = next(pathlib.Path(t + "/o").glob("part-*.parquet"))
    shutil.move(str(part), str(tmp_path / "events" / "b0.parquet"))

    rules = tmp_path / "rules.json"
    rules.write_text(
        '[{"rule": "matches", "col": "lang", "pattern": "^[a-z0-9+#-]{1,12}$",'
        ' "name": "lang_shape"},'
        ' {"rule": "check", "name": "seq_nonneg", "sql_predicate": "last_event_seq >= 0"}]'
    )
    z = build(tmp_path / "rocket_etl_spark.zip")
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(z),
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            str(REPO / "jobs" / "replay_job.py"),
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--create", "--buckets", "4",
            "--audit-rules", str(rules),
            "--quarantine", str(tmp_path / "quarantine"),
        ],
        capture_output=True, text=True, timeout=420,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "epoch=0" in out.stdout and "skipped=False" in out.stdout

    from rocket_etl_spark.lake.table import LakeTable

    table = LakeTable.load(spark, tmp_path / "table")
    assert table.read().count() > 0          # audit passed -> published
    assert not (tmp_path / "quarantine").exists()  # nothing rejected


def test_spark_submit_branch_and_evolve(spark, tmp_path):
    """--evolve-buckets + --branch/--publish-branch through the real
    spark-submit CLI: the backfill stages on the branch, publishes at the
    end, and the final main table carries the rows under the evolved
    bucket spec."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not pathlib.Path(spark_submit).exists():
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, str(REPO))
    from rocket_etl_spark.generate import change_events
    from tools.package import build

    ev = change_events(spark, 1_500, seed=79, delete_frac=0.1)
    (tmp_path / "events").mkdir()
    t = tempfile.mkdtemp()
    ev.coalesce(1).write.parquet(t + "/o")
    part = next(pathlib.Path(t + "/o").glob("part-*.parquet"))
    shutil.move(str(part), str(tmp_path / "events" / "b0.parquet"))

    z = build(tmp_path / "rocket_etl_spark.zip")
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(z),
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            str(REPO / "jobs" / "replay_job.py"),
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--create", "--buckets", "4",
            "--evolve-buckets", "8",
            "--branch", "backfill", "--publish-branch",
        ],
        capture_output=True, text=True, timeout=420,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "epoch=0" in out.stdout and "'published': True" in out.stdout

    from rocket_etl_spark.lake.table import LakeTable

    table = LakeTable.load(spark, tmp_path / "table")
    snap = table.current_snapshot()
    assert snap["num_buckets"] == 8            # evolution applied
    assert "published_branch" in snap["stats"]  # tip IS the branch publish
    assert table.read().count() > 0
    assert not list(pathlib.Path(table.snap_dir).glob("branch*"))  # cleaned
