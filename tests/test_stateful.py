"""applyInPandasWithState: per-key state accumulates across micro-batches
and survives a checkpointed restart."""

from __future__ import annotations

import pathlib
import shutil
import tempfile

import pyspark.sql.functions as F

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.streaming.replay import EVENTS_DDL
from rocket_etl_spark.streaming.stateful import run_running_key_stats


def _write_flat(b, dest, name):
    tmp = tempfile.mkdtemp()
    b.coalesce(1).write.parquet(tmp + "/o")
    part = next(pathlib.Path(tmp + "/o").glob("part-*.parquet"))
    pathlib.Path(dest).mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), f"{dest}/{name}.parquet")


def test_state_accumulates_and_survives_restart(spark, tmp_path):
    ev = change_events(spark, 3_000, seed=12, delete_frac=0.1)
    _write_flat(ev.filter(ev.event_seq < 1_000), tmp_path / "events", "b0")
    _write_flat(
        ev.filter((ev.event_seq >= 1_000) & (ev.event_seq < 2_000)), tmp_path / "events", "b1"
    )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_running_key_stats(spark, str(tmp_path / "events"), ckpt, out, EVENTS_DDL)

    got = spark.read.parquet(out)
    # totals after the final micro-batch == plain batch aggregation over 2k events
    last = got.groupBy("repo").agg(F.max("events_seen").alias("events_seen"),
                                   F.max("max_event_seq").alias("max_event_seq"))
    expect = (
        ev.filter(ev.event_seq < 2_000)
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n"), F.max("event_seq").alias("mx"))
    )
    j = last.join(expect, "repo").toPandas()
    assert (j.events_seen == j.n).all()
    assert (j.max_event_seq == j.mx).all()

    # "restart": a third file arrives; same checkpoint resumes the STATE
    _write_flat(ev.filter(ev.event_seq >= 2_000), tmp_path / "events", "b2")
    run_running_key_stats(spark, str(tmp_path / "events"), ckpt, out, EVENTS_DDL)
    got2 = spark.read.parquet(out).groupBy("repo").agg(F.max("events_seen").alias("seen"))
    total = ev.groupBy("repo").agg(F.count(F.lit(1)).alias("n"))
    j2 = got2.join(total, "repo").toPandas()
    assert (j2.seen == j2.n).all()  # counts include pre-restart batches
