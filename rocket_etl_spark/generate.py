"""Deterministic, fully-distributed synthetic change-event generation.

The engine's native input (BASELINE.json:15) is a WAL/binlog-style stream
of ``(repo, path, commit, lang, content)`` events.  This module builds it
with ``spark.range(n)`` + column expressions only — every value is a pure
seeded function of ``event_seq``, so generation is reproducible, never
materializes on the driver, and scales linearly to any row count
(10^10 events is just ``spark.range(10**10)`` across a cluster).

Skew: the repo draw is a power-law (``floor(R * u**skew)``) so a handful
of repos dominate — exercising the hot-key salting path the north rule
demands.  Key collisions (LWW conflicts) arise from a bounded per-repo
path space.  No wall clock, no ``random``: timestamps derive from
``event_seq``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# canonical languages + dirty aliases the normalize_lang UDF must fix
_LANGS = [
    "python", "py", "Python", "java", "scala", "c", "cpp", "C++", "c++",
    "go", "golang", "rust", "js", "javascript", "ts", "TypeScript", "sql",
]
_EXTS = [
    "py", "py", "py", "java", "scala", "c", "cpp", "cpp", "cpp",
    "go", "go", "rs", "js", "js", "ts", "ts", "sql",
]

BASE_EPOCH_S = 1_600_000_000  # fixed base; event_ts = base + event_seq (seconds)


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Non-negative deterministic 63-bit hash of (seed, tag, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))


def change_events(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    skew: float = 3.0,
    delete_frac: float = 0.05,
    shuffle_bound: int = 0,
    num_partitions: int | None = None,
    max_content_blocks: int = 40,
) -> DataFrame:
    """Build ``n_events`` change events.

    Columns: ``event_seq event_ts op repo path commit lang content``.
    ``event_seq`` is the unique, strictly-increasing WAL position — the
    LWW order (never the ``commit`` string; commits are opaque hashes).
    ``skew`` > 1 concentrates events on low repo indices (power law).
    ``shuffle_bound`` > 0 adds a ``delivery_order`` column that permutes
    rows within a window of that size, for out-of-order-arrival tests.
    """
    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "event_seq")

    u = (_h(seed, "repo", F.col("event_seq")) % 1_000_000) / 1_000_000.0
    repo_idx = F.floor(F.lit(n_repos) * F.pow(u, F.lit(skew))).cast("long")
    path_h = _h(seed, "path", F.col("event_seq"))
    path_idx = path_h % paths_per_repo
    lang_idx = (_h(seed, "lang", repo_idx, path_idx) % len(_LANGS)).cast("int")

    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), lang_idx + 1)
    ext = F.element_at(F.array(*[F.lit(x) for x in _EXTS]), lang_idx + 1)

    df = df.select(
        "event_seq",
        F.timestamp_seconds(F.lit(BASE_EPOCH_S) + F.col("event_seq")).alias("event_ts"),
        F.when(
            (_h(seed, "op", F.col("event_seq")) % 1_000_000) < int(delete_frac * 1_000_000),
            F.lit("delete"),
        ).otherwise(F.lit("upsert")).alias("op"),
        F.concat(F.lit("org"), (repo_idx % 10).cast("string"),
                 F.lit("/repo"), repo_idx.cast("string")).alias("repo"),
        F.concat(F.lit("src/dir"), ((path_idx % 17)).cast("string"),
                 F.lit("/file"), path_idx.cast("string"), F.lit("."), ext).alias("path"),
        F.sha1(F.concat_ws("|", F.lit(seed), repo_idx.cast("string"),
                           path_idx.cast("string"), F.col("event_seq").cast("string"))
               ).alias("commit"),
        lang.alias("lang"),
        # deterministic pseudo-code, 70–~2600 chars: header line + repeated hash body
        F.concat(
            F.lit("def fn_"), path_idx.cast("string"), F.lit("():  # "),
            lang, F.lit("\n"),
            F.repeat(
                F.concat(F.sha2(F.concat_ws("#", F.lit(seed), F.col("event_seq").cast("string")), 256),
                         F.lit("\n")),
                (F.lit(1) + (_h(seed, "len", F.col("event_seq")) % max_content_blocks)).cast("int"),
            ),
        ).alias("content"),
    )
    if shuffle_bound > 0:
        df = df.withColumn(
            "delivery_order",
            F.col("event_seq") + (_h(seed, "shuf", F.col("event_seq")) % (2 * shuffle_bound))
            - shuffle_bound,
        )
    return df


def with_evolution(df: DataFrame, version: int) -> DataFrame:
    """Apply schema-evolution variants (FIXTURES.md A3) to an event batch.

    v1: base schema.  v2: + ``size_bytes:int`` (= length(content)).
    v3: ``lang`` renamed ``language``.  v4: ``size_bytes`` widened to long.
    """
    if version <= 1:
        return df
    df = df.withColumn("size_bytes", F.length("content").cast("int" if version < 4 else "long"))
    if version >= 3:
        df = df.withColumnRenamed("lang", "language")
    return df
