"""Explicit skew handling: hot-key detection + salted repartition.

The north rule demands skew handled explicitly (BASELINE.json:14), on top
of AQE's runtime skew-join splitting.  Two layers in this engine:

* the replay path is skew-proof by construction — LWW dedupe is a hash
  aggregation with map-side combine, and the MERGE join consumes
  post-dedupe (one row per key) input (see lake/merge.py);
* for operators that lack partial aggregation (window functions, grouped
  ``applyInPandas``), these helpers detect hot keys from a bounded sample
  and scatter them across salted sub-keys (see also
  ``operators.lww.lww_dedupe_salted`` for the two-phase reduce).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    *,
    sample_fraction: float = 0.01,
    min_sampled_rows: int = 50,
    hot_share: float = 0.05,
    max_keys: int = 100,
) -> list[tuple]:
    """Keys whose sampled frequency exceeds ``hot_share`` of the sample.

    One pass over a bounded sample (never the full data), ≤ ``max_keys``
    rows to the driver — cheap enough to run per batch at any scale.
    """
    sampled = df.select(*keys).sample(fraction=sample_fraction, seed=7)
    counts = sampled.groupBy(*keys).count()
    total = sampled.count()
    if total == 0:
        return []
    floor = max(int(total * hot_share), min_sampled_rows)
    rows = counts.filter(F.col("count") >= floor).orderBy(F.desc("count")).limit(max_keys)
    return [tuple(r[k] for k in keys) for r in rows.collect()]


def with_salt(
    df: DataFrame,
    keys: Sequence[str],
    hot_keys: list[tuple],
    salt_buckets: int = 16,
    salt_col: str = "_salt",
    entropy_col: str | None = None,
) -> DataFrame:
    """Add a salt column: 0 for cold keys, uniform 0..salt_buckets-1 for hot
    keys (derived from ``entropy_col`` if given — deterministic — else from
    a per-row hash of all columns).  Group/partition by (*keys, salt) to
    spread a hot key over ``salt_buckets`` reducers, then reduce again on
    the bare keys (two-phase)."""
    if not hot_keys:
        return df.withColumn(salt_col, F.lit(0))
    is_hot = F.struct(*[F.col(k) for k in keys]).isin(
        [F.struct(*[F.lit(v) for v in hk]) for hk in hot_keys]
    )
    entropy = F.col(entropy_col) if entropy_col else F.concat_ws("\x00", *df.columns)
    salt = (F.abs(F.xxhash64(entropy)) % salt_buckets).cast("int")
    return df.withColumn(salt_col, F.when(is_hot, salt).otherwise(F.lit(0)))
