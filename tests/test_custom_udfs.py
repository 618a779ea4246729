"""Grouped-map custom processing + iterator pandas UDF surfaces (§2.10)."""

from __future__ import annotations

import pyspark.sql.functions as F

from rocket_etl_spark.functions.hashing import sha256_content, sha256_content_iter, sha256_expr
from rocket_etl_spark.operators.custom import apply_per_group, group_profile


def test_group_profile_matches_sql_aggregates(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select("user_id", "value")
    prof = group_profile(ev, keys=["user_id"], value_col="value").toPandas()
    base = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 2).alias("mean_val"))
        .toPandas()
    )
    m = prof.merge(base, on="user_id", suffixes=("", "_sql"))
    assert (m.n == m.n_sql).all()
    assert (abs(m.mean_val - m.mean_val_sql) < 0.02).all()
    # median is inside the group's range
    rng = ev.groupBy("user_id").agg(F.min("value").alias("lo"), F.max("value").alias("hi")).toPandas()
    m2 = prof.merge(rng, on="user_id")
    assert ((m2.median_val >= m2.lo.round(2) - 0.01) & (m2.median_val <= m2.hi.round(2) + 0.01)).all()


def test_group_profile_string_key(spark):
    # key DDL is derived from the input schema — a string key (e.g. repo)
    # must work, not just bigint user ids
    df = spark.createDataFrame(
        [("r1", 1.0), ("r1", 3.0), ("r2", 10.0)], "repo string, value double"
    )
    out = group_profile(df, keys=["repo"], value_col="value").toPandas()
    got = {r.repo: (r.n, r.mean_val, r.median_val) for r in out.itertuples()}
    assert got == {"r1": (2, 2.0, 1.0), "r2": (1, 10.0, 10.0)}


def test_apply_per_group_arbitrary_fn(spark):
    import pandas as pd

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k bigint, v string")

    def concat_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": pdf.k.iloc[0], "joined": "|".join(sorted(pdf.v))}])

    out = apply_per_group(df, ["k"], concat_group, "k bigint, joined string").toPandas()
    assert dict(zip(out.k, out.joined)) == {1: "a|b", 2: "c"}


def test_iterator_udf_equals_series_udf_and_expr(spark):
    df = spark.createDataFrame([("x",), (None,), ("ünïcødé",)], "content string")
    got = df.select(
        sha256_content("content").alias("series"),
        sha256_content_iter("content").alias("iter"),
        sha256_expr("content").alias("expr"),
    ).collect()
    for r in got:
        assert r["series"] == r["iter"] == r["expr"]
