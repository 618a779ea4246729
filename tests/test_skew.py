"""M5: skew — correctness and partition-balance under Zipf-hot repos."""

from __future__ import annotations

import pyspark.sql.functions as F

from rocket_etl_spark.generate import change_events
from rocket_etl_spark.operators.lww import (
    lww_dedupe,
    lww_dedupe_salted,
    lww_dedupe_slim,
    lww_dedupe_window,
)


def test_skewed_input_all_variants_agree(spark):
    # skew=6 → top repo takes a huge share of events
    ev = change_events(spark, 20_000, seed=31, n_repos=50, skew=6.0)
    top = ev.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["count"] > 20_000 * 0.3  # genuinely hot

    a = lww_dedupe(ev)
    b = lww_dedupe_window(ev)
    c = lww_dedupe_salted(ev, salt_buckets=8)
    d = lww_dedupe_slim(ev)
    pa = a.orderBy("repo", "path").toPandas()
    pb = b.orderBy("repo", "path").toPandas()[pa.columns]
    pc = c.orderBy("repo", "path").toPandas()[pa.columns]
    pd_ = d.orderBy("repo", "path").toPandas()[pa.columns]
    import pandas as pd

    pd.testing.assert_frame_equal(pa, pb)
    pd.testing.assert_frame_equal(pa, pc)
    pd.testing.assert_frame_equal(pa, pd_)


def test_slim_dedupe_duplicates_and_null_keys(spark):
    """The slim form must match the agg form even on the cases where a
    naive winner-set join diverges: duplicate (key, order) deliveries
    (exactly one survivor) and null keys (a group, not a dropped row)."""
    import pandas as pd

    rows = [
        ("r1", "a", 3, "v3"), ("r1", "a", 1, "v1"), ("r1", "a", 3, "v3"),  # dup winner
        ("r2", "b", 5, "x5"), ("r2", "b", 4, "x4"),
        (None, "c", 7, "n7"), (None, "c", 6, "n6"),                        # null key
        ("r3", None, 9, "m9"), ("r3", None, 8, "m8"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, event_seq long, content string")
    a = lww_dedupe(df).orderBy("repo", "path").toPandas()
    s = lww_dedupe_slim(df).orderBy("repo", "path").toPandas()[a.columns]
    pd.testing.assert_frame_equal(a, s)
    assert len(s) == 4


def test_salted_phase1_bounds_partition_size(spark):
    """The salted first phase spreads a single pathological key: no reducer
    sees more than ~1/salt_buckets of that key's rows (+ slack)."""
    n = 8_000
    one_key = (
        spark.range(n)
        .select(
            F.col("id").alias("event_seq"),
            F.lit("org0/hot").alias("repo"),
            F.lit("src/one.py").alias("path"),
            F.lit("x").alias("content"),
        )
    )
    salted = one_key.withColumn("_salt", F.abs(F.xxhash64(F.col("event_seq"))) % 16)
    counts = salted.groupBy("repo", "path", "_salt").count().toPandas()
    assert len(counts) == 16
    assert counts["count"].max() < (n / 16) * 1.5
