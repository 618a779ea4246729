"""Benchmark harness: headline queries + CDC replay at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "extra": {...}}

The CDC replay (the engine's north-star metric) reports events/sec in
``extra``.  Query timings force full plan execution via a noop sink —
no driver-side collection bias.  Run tools/scaling_bench.py for the
N-vs-4N-core scaling-efficiency evidence (written to BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from rocket_etl_spark.generate import change_events  # noqa: E402
from rocket_etl_spark.session import build_session  # noqa: E402
from rocket_etl_spark.streaming.replay import (  # noqa: E402
    create_repo_files_table,
    replay_batch,
    replay_stream,
)

HEADLINE = [
    "join_inner",
    "join_range",
    "agg_basic",
    "agg_rollup",
    "window_lww",
    "window_running",
    "sort_limit",
    "derived_col",
    "json_extract",
    "hash_sha256",
    "stream_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding",
    "knn_cosine",
    "knn_ivf",
    "text_quality",
    # r4 additions (prior keys unchanged for round-over-round comparison):
    # the fused one-scan text pass that replaced 4 per-doc board rows, and
    # the two training-mix samplers
    "text_analysis",
    "corpus_sample_frac",
    "corpus_sample_quota",
    "corpus_pack",
    "corpus_decontaminate",
]


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _burn_cpu(n: int) -> int:
    import hashlib

    d = b"seed"
    for _ in range(n):
        d = hashlib.sha256(d).digest()
    return d[0]


def _stream_mem(nbytes: int) -> float:
    import numpy as np

    a = np.ones(nbytes // 8)
    s = 0.0
    for _ in range(4):
        s += float(a.sum())
    return s


def host_calibration() -> dict:
    """Non-JVM host probes, embedded in every bench JSON so a future
    reader can separate HOST drift from CODE drift without archaeology
    (round-2 verdict: byte-identical queries regressed 1.2-1.8x purely
    from host state; the diagnosis needed a same-session calibration).

    * cpu_eff_8_to_32: cache-resident sha256 burn in 8 vs 32 processes —
      the machine's raw compute-scaling ceiling (1.0 = perfect 4x).
    * mem_eff_8_to_32: streaming numpy sums over 64 MB/proc (2 GB peak at
      32 procs — deliberately bounded; far beyond L3, so it measures DRAM
      bandwidth) — on this VM data-touching work has been measured flat
      past ~8 cores, which this number makes explicit.
    """
    import multiprocessing as mp
    import statistics

    def rate(fn, arg, procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.monotonic()
            p.map(fn, [arg] * procs)
            return procs / (time.monotonic() - t0)

    out: dict = {}
    for name, fn, arg in (
        ("cpu", _burn_cpu, 1_500_000),
        ("mem", _stream_mem, 64 * 1024 * 1024),
    ):
        effs = []
        for _ in range(2):
            r8 = rate(fn, arg, 8)
            r32 = rate(fn, arg, 32)
            effs.append(r32 / (4 * r8))
        out[f"{name}_eff_8_to_32"] = round(statistics.median(effs), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    # RAM-backed shuffle dirs: the bench measures the engine, not /tmp's disk
    shm = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    spark = build_session(
        app_name="rocket-etl-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": shm} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # ---- headline operator queries -----------------------------------------
    qs = entry_mod.queries()
    # perf measures the PRODUCTION hash path (xxhash64); the harness's
    # queries() entry runs the md5 twin, which exists only so the DuckDB
    # oracle can replay the sketch bit-for-bit (same algorithm & plan shape)
    from rocket_etl_spark.operators.dedup import embedding_neardup_pairs, minhash_lsh_pairs

    overrides = {
        "dedup_minhash": lambda s, d: minhash_lsh_pairs(
            s.read.parquet(f"{d}/documents.parquet"), threshold=0.4, hash_fn="xxhash64"
        ),
        # the harness row pins method='block' (ANSI-SQL-replayable); the
        # bench measures the production default (banded hyperplane LSH)
        "dedup_embedding": lambda s, d: embedding_neardup_pairs(
            s.read.parquet(f"{d}/embeddings.parquet"), threshold=0.3
        ),
    }
    # warm-up: the first plan otherwise absorbs session/codegen startup
    _force(qs["join_inner"](spark, sf_dir))
    for name in HEADLINE:
        fn = overrides.get(name, qs[name])
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    # ---- CDC replay: the engine's headline number --------------------------
    # median of 3 trials (fresh table each): this VM shows 2x+ tenancy
    # swings between identical runs (BENCH/BASELINE.md), so a single draw
    # is a lottery ticket, not a measurement
    n_events = max(int(20_000_000 * sf), 100_000)
    ev = change_events(spark, n_events, n_repos=500, paths_per_repo=2000, delete_frac=0.05)
    # stage input to parquet so the measured replay reads real files; RAM-backed
    # when available so the number reflects the engine, not /tmp's disk
    stage_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    in_dir = tempfile.mkdtemp(prefix="bench-events-", dir=stage_root)
    lake_dir = tempfile.mkdtemp(prefix="bench-lake-", dir=stage_root)
    # crash-safe tmpfs reclaim: an aborted bench must not strand ~GBs on
    # /dev/shm (leaked dirs eventually stop every later JVM from starting)
    import atexit
    import shutil as _sh

    atexit.register(_sh.rmtree, in_dir, True)
    atexit.register(_sh.rmtree, lake_dir, True)
    ev.write.mode("overwrite").parquet(in_dir)
    events = spark.read.parquet(in_dir)
    ev2 = change_events(
        spark, n_events // 4, seed=43, n_repos=500, paths_per_repo=2000, delete_frac=0.05
    )
    # warm-up: one small replay into a throwaway table first — the first
    # replay otherwise pays whole-stage-codegen JIT + cold page cache and
    # skews the trial set (observed: first trial 2-5x the later ones)
    warm = create_repo_files_table(spark, f"{lake_dir}/warm", num_buckets=2 * cpus)
    replay_batch(warm, ev2, epoch_id=0)

    replay_trials: list[float] = []
    incr_trials: list[float] = []
    for trial in range(3):
        table = create_repo_files_table(
            spark, f"{lake_dir}/t{trial}", num_buckets=2 * cpus
        )
        t0 = time.monotonic()
        replay_batch(table, events, epoch_id=0)
        replay_trials.append(time.monotonic() - t0)
        # incremental epoch: merge into the now-populated table
        t0 = time.monotonic()
        replay_batch(table, ev2, epoch_id=1)
        incr_trials.append(time.monotonic() - t0)
    replay_sec = sorted(replay_trials)[1]
    timings["cdc_replay"] = round(replay_sec, 3)
    timings["cdc_replay_incremental"] = round(sorted(incr_trials)[1], 3)

    # streaming-mode replay: the SAME events through the real file-source
    # tail (two checkpointed micro-batch epochs via foreachBatch) — the
    # north metric's actual transport, measured with its checkpoint and
    # epoch-fence overhead included
    import glob as _glob

    n_files = len(_glob.glob(f"{in_dir}/part-*.parquet"))
    stable = create_repo_files_table(spark, f"{lake_dir}/stream", num_buckets=2 * cpus)
    t0 = time.monotonic()
    replay_stream(
        spark, stable, in_dir, f"{lake_dir}/stream-ckpt",
        max_files_per_trigger=max(1, (n_files + 1) // 2),
    )
    stream_sec = time.monotonic() - t0
    timings["cdc_replay_stream"] = round(stream_sec, 3)

    # ---- trickle-CDC A/B: copy-on-write vs merge-on-read --------------------
    # The regime the MOR mode exists for: many SMALL epochs landing on an
    # already-populated table.  COW pays a decide scan + matched-file
    # rewrite per epoch (bloom/zone pruning softens it); MOR appends one
    # delta per touched bucket and never reads the table.  Both run the
    # same 16 epochs on equally-populated tables (the replay trials'
    # leftovers), then MOR's deferred costs are measured explicitly: the
    # reconciling read and the compaction fold.
    from rocket_etl_spark.lake.maintenance import compact
    from rocket_etl_spark.lake.table import LakeTable

    # 8 epochs keeps the A/B meaningful while bounding bench wall-clock:
    # the per-epoch COW decide cost dominates and is constant per epoch,
    # so the ratio is insensitive to the epoch count (16-epoch runs
    # recorded in BENCH/BASELINE.md round-5 measured the same shape)
    n_epochs, per = 8, max(2_000, n_events // 200)
    trickle = change_events(
        spark, n_epochs * per, seed=44, n_repos=500, paths_per_repo=2000, delete_frac=0.05
    )
    trickle_dir = tempfile.mkdtemp(prefix="bench-trickle-", dir=stage_root)
    atexit.register(_sh.rmtree, trickle_dir, True)
    trickle.write.mode("overwrite").parquet(trickle_dir)
    tr = spark.read.parquet(trickle_dir)
    slices = [
        tr.filter((tr.event_seq >= i * per) & (tr.event_seq < (i + 1) * per))
        for i in range(n_epochs)
    ]
    trickle_sec: dict[str, float] = {}
    for mode, tname in (("cow", "t0"), ("mor", "t1")):
        table = LakeTable.load(spark, f"{lake_dir}/{tname}")
        t0 = time.monotonic()
        for i, b in enumerate(slices):
            replay_batch(table, b, epoch_id=10 + i, mode=mode)
        trickle_sec[mode] = time.monotonic() - t0
    timings["cdc_trickle_cow"] = round(trickle_sec["cow"], 3)
    timings["cdc_trickle_mor"] = round(trickle_sec["mor"], 3)
    mor_table = LakeTable.load(spark, f"{lake_dir}/t1")
    t0 = time.monotonic()
    _force(mor_table.read())  # reconciling read: the mode's deferred cost
    mor_read_sec = time.monotonic() - t0
    t0 = time.monotonic()
    compact(mor_table)  # fold deltas back to base
    mor_compact_sec = time.monotonic() - t0

    # ---- incremental MV refresh vs full re-aggregation ----------------------
    # The freshness operator: a per-repo rollup maintained from the change
    # feed.  Baseline = MV create (full scan + aggregate + write — what a
    # naive refresh pays every time).  Then one insert-only trickle epoch
    # (additive path: O(changed rows), the base table never read) and one
    # update/delete epoch (dirty-group recompute: column-pruned semi-joined
    # scan of the touched groups only).
    import pyspark.sql.functions as _F

    from rocket_etl_spark.lake.materialized import MaterializedAggregate

    cow_table = LakeTable.load(spark, f"{lake_dir}/t0")
    t0 = time.monotonic()
    mv = MaterializedAggregate.create(
        spark, f"{lake_dir}/mv", cow_table, ["repo"],
        [
            ("n_files", "count", "*"),
            ("sum_seq", "sum", "last_event_seq"),
            ("max_seq", "max", "last_event_seq"),
        ],
    )
    mv_full_sec = time.monotonic() - t0
    ins = change_events(
        spark, per, seed=45, n_repos=500, paths_per_repo=2000, delete_frac=0.0
    ).withColumn("path", _F.concat(_F.lit("mvnew/"), _F.col("path")))
    replay_batch(cow_table, ins, epoch_id=40)
    t0 = time.monotonic()
    r_add = mv.refresh(cow_table)
    mv_add_sec = time.monotonic() - t0
    upd = change_events(
        spark, per, seed=46, n_repos=500, paths_per_repo=2000, delete_frac=0.05
    )
    replay_batch(cow_table, upd, epoch_id=41)
    t0 = time.monotonic()
    r_rec = mv.refresh(cow_table)
    mv_rec_sec = time.monotonic() - t0
    timings["mv_refresh_additive"] = round(mv_add_sec, 3)
    timings["mv_refresh_recompute"] = round(mv_rec_sec, 3)

    # ---- metadata-pruned point lookup vs full-filter read -------------------
    # The serving path over the fragmented (trickle-CDC) table the runs
    # above just produced: a bounded key probe through bucket + zone-map +
    # bloom pruning (lake/lookup.py) vs the naive filter over a full
    # table read.  Same answer (oracle row cdc_point_lookup); the bench
    # records the file-scan ratio and both wall times.
    from rocket_etl_spark.lake.lookup import lookup as _lookup

    probe_keys = [
        (r["repo"], r["path"])
        for r in cow_table.read()
        .select("repo", "path")
        .orderBy("repo", "path")
        .limit(8)
        .collect()
    ]
    t0 = time.monotonic()
    lk_df, lk_stats = _lookup(cow_table, probe_keys, return_stats=True)
    _force(lk_df)
    timings["lookup_pruned"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    cond = _F.struct("repo", "path").isin(
        [_F.struct(_F.lit(a), _F.lit(b)) for a, b in probe_keys]
    )
    _force(cow_table.read().filter(cond))
    timings["lookup_full_filter"] = round(time.monotonic() - t0, 3)

    # ---- bucket-spec evolution vs rebucket rewrite --------------------------
    # Growing the hash width on a populated table: `rebucket` is the
    # O(table) full rewrite; `evolve_buckets` is the O(1) metadata commit
    # (Iceberg partition-spec evolution) — at 100 TB only the latter
    # exists.  Then one incremental epoch merges across the MIXED
    # current+legacy layout, the per-epoch cost evolution actually adds
    # (compare with cdc_replay_incremental: same batch size, one layout).
    from rocket_etl_spark.lake.maintenance import evolve_buckets, rebucket

    evo_table = LakeTable.load(spark, f"{lake_dir}/t2")
    t0 = time.monotonic()
    rebucket(evo_table, 4 * cpus)
    timings["rebucket_rewrite"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    evolve_buckets(evo_table, 8 * cpus)
    timings["evolve_spec"] = round(time.monotonic() - t0, 3)
    ev3 = change_events(
        spark, n_events // 4, seed=47, n_repos=500, paths_per_repo=2000,
        delete_frac=0.05,
    )
    t0 = time.monotonic()
    replay_batch(evo_table, ev3, epoch_id=2)
    timings["cdc_post_evolve_merge"] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "replay_events": n_events,
                    "replay_events_per_sec": round(n_events / replay_sec),
                    "stream_events_per_sec": round(n_events / stream_sec),
                    "cores": cpus,
                    "replay_trials_sec": [round(t, 3) for t in replay_trials],
                    "incremental_trials_sec": [round(t, 3) for t in incr_trials],
                    "trickle_epochs": n_epochs,
                    "trickle_events_per_epoch": per,
                    "trickle_cow_events_per_sec": round(n_epochs * per / trickle_sec["cow"]),
                    "trickle_mor_events_per_sec": round(n_epochs * per / trickle_sec["mor"]),
                    "trickle_mor_speedup": round(trickle_sec["cow"] / trickle_sec["mor"], 2),
                    "mor_reconciling_read_sec": round(mor_read_sec, 3),
                    "mor_compact_sec": round(mor_compact_sec, 3),
                    "lookup_files_scanned": lk_stats.get("files_scanned"),
                    "lookup_files_total": lk_stats.get("files_total"),
                    "mv_full_agg_sec": round(mv_full_sec, 3),
                    "mv_refresh_modes": [r_add.mode, r_rec.mode],
                    "mv_additive_speedup_vs_full": round(mv_full_sec / mv_add_sec, 2),
                    "mv_recompute_speedup_vs_full": round(mv_full_sec / mv_rec_sec, 2),
                    "evolve_vs_rebucket_speedup": round(
                        timings["rebucket_rewrite"] / max(timings["evolve_spec"], 1e-3), 1
                    ),
                    "host_calibration": host_calibration(),
                },
            }
        )
    )
    spark.stop()
    import shutil

    shutil.rmtree(in_dir, ignore_errors=True)   # don't leave GBs on tmpfs
    shutil.rmtree(lake_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
