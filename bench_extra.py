"""Auxiliary benchmarks for OPTIMIZATION_r06.md (bench.py is frozen for
measurement, so round-6 evidence lives here).  Each subcommand prints one
JSON line.

  python bench_extra.py manifests   # snapshot-write bytes vs file count
  python bench_extra.py pack        # UDTF exchange: arrow vs pickle A/B
  python bench_extra.py decontam    # id-broadcast gate: split vs fused A/B

Uses $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from rocket_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    shm = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    s = build_session(
        app_name="rocket-etl-bench-extra", master=f"local[{CPUS}]",
        extra_conf={"spark.local.dir": shm} if shm else None,
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def manifests() -> dict:
    """VERDICT r5 #1 'done' evidence: per-commit snapshot-write bytes stay
    flat while the table's live file count grows ~10x (merge-on-read
    trickle — every epoch appends delta files).  Also reports the bytes a
    commit writes as manifests (the O(touched) part)."""
    from rocket_etl_spark.generate import change_events
    from rocket_etl_spark.streaming.replay import create_repo_files_table, replay_batch

    spark = _spark()
    lake = tempfile.mkdtemp(prefix="bx-man-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, lake, True)
    table = create_repo_files_table(spark, f"{lake}/t", num_buckets=2 * CPUS)
    ev = change_events(spark, 400_000, seed=21, delete_frac=0.05)
    replay_batch(table, ev, epoch_id=0)

    def snap_bytes(sid):
        return (table.snap_dir / f"snapshot-{sid:08d}.json").stat().st_size

    points = []
    seen_mans = {p.name for p in table.man_dir.glob("man-*.json")}
    for ep in range(1, 25):
        batch = change_events(spark, 4_000, seed=100 + ep, delete_frac=0.05)
        res = replay_batch(table, batch, epoch_id=ep, mode="mor")
        snap = table.current_snapshot()
        nfiles = sum(len(fl) for fl in snap["buckets"].values())
        mans_now = {p.name for p in table.man_dir.glob("man-*.json")}
        new_man_bytes = sum(
            (table.man_dir / n).stat().st_size for n in mans_now - seen_mans
        )
        seen_mans = mans_now
        points.append(
            {
                "epoch": ep,
                "live_files": nfiles,
                "snapshot_bytes": snap_bytes(res.snapshot_id),
                "new_manifest_bytes": new_man_bytes,
            }
        )
    first, last = points[0], points[-1]
    out = {
        "metric": "manifest_snapshot_scaling",
        "file_growth": round(last["live_files"] / first["live_files"], 2),
        "snapshot_bytes_growth": round(
            last["snapshot_bytes"] / first["snapshot_bytes"], 3
        ),
        "points": points[::4] + [last],
    }
    spark.stop()
    return out


def pack() -> dict:
    """corpus_pack UDTF exchange A/B (VERDICT r5 #2): arrow vs pickled
    rows at sf0.1 and a 10x-duplicated corpus, interleaved, 3 reps."""
    from rocket_etl_spark.operators.packing import make_pack_udtf

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()
    d10 = None
    for i in range(10):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        d10 = d if d10 is None else d10.unionByName(d)
    d10 = d10.cache()
    d10.count()

    def run(df, arrow: bool):
        spark.conf.set(
            "spark.sql.execution.pythonUDTF.arrow.enabled",
            "true" if arrow else "false",
        )
        fn, view = f"p_{uuid.uuid4().hex[:8]}", f"v_{uuid.uuid4().hex[:8]}"
        spark.udtf.register(fn, make_pack_udtf(4000))
        df.createOrReplaceTempView(view)
        try:
            out = spark.sql(
                f"SELECT * FROM {fn}(TABLE({view}) PARTITION BY lang ORDER BY doc_id)"
            )
            t0 = time.monotonic()
            _force(out)
            return time.monotonic() - t0
        finally:
            spark.catalog.dropTempView(view)

    run(docs, False)  # warm
    res: dict[str, list] = {}
    for _ in range(3):
        for arrow in (True, False):
            for scale, df in (("1x", docs), ("10x", d10)):
                res.setdefault(f"{'arrow' if arrow else 'pickle'}_{scale}", []).append(
                    round(run(df, arrow), 3)
                )
    out = {
        "metric": "pack_udtf_exchange_ab",
        "median_sec": {k: statistics.median(v) for k, v in res.items()},
        "samples": res,
    }
    spark.stop()
    return out


def decontam() -> dict:
    """corpus_decontaminate gate A/B (VERDICT r5 #3): the r5 bounded-
    collect split vs the r4 fused broadcast(flagged) plan, 1x and 10x."""
    from rocket_etl_spark.operators.decontam import contaminated_ids

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()
    d10 = None
    for i in range(10):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        d10 = d if d10 is None else d10.unionByName(d)
    d10 = d10.cache()
    d10.count()

    def run(corpus, fused: bool):
        bench = corpus.filter(F.col("doc_id") % 17 == 0)
        flagged = contaminated_ids(corpus, bench, n=5)
        t0 = time.monotonic()
        if fused:
            out = corpus.join(F.broadcast(flagged), "doc_id", "left_anti")
        else:  # the production path's split probe
            head = flagged.limit(500_001).collect()
            local = spark.createDataFrame(head, schema=flagged.schema)
            out = corpus.join(F.broadcast(local), "doc_id", "left_anti")
        _force(out)
        return time.monotonic() - t0

    run(docs, True)  # warm
    res: dict[str, list] = {}
    for _ in range(3):
        for fused in (True, False):
            for scale, df in (("1x", docs), ("10x", d10)):
                res.setdefault(f"{'fused' if fused else 'split'}_{scale}", []).append(
                    round(run(df, fused), 3)
                )
    out = {
        "metric": "decontam_gate_ab",
        "median_sec": {k: statistics.median(v) for k, v in res.items()},
        "samples": res,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "manifests"
    print(json.dumps({"manifests": manifests, "pack": pack, "decontam": decontam}[cmd]()))
