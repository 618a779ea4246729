"""Deterministic corpus sampling (training-mix assembly)."""

from __future__ import annotations

import pyspark.sql.functions as F

from rocket_etl_spark.operators.sampling import (
    hash_fraction_sample,
    stratified_quota_sample,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_fraction_sample_deterministic_incremental_and_unbiased(spark):
    d = spark.read.parquet(DOCS)
    s1 = hash_fraction_sample(d, 0.5, id_col="doc_id").select("doc_id").toPandas()
    s2 = hash_fraction_sample(d, 0.5, id_col="doc_id").select("doc_id").toPandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)  # deterministic
    n = d.count()
    assert 0.35 * n < len(s1) < 0.65 * n  # concentrates to the fraction
    # prefix property: the 0.25 sample is a subset of the 0.5 sample
    s_small = hash_fraction_sample(d, 0.25, id_col="doc_id").select("doc_id").toPandas()
    assert set(s_small.doc_id) <= set(s1.doc_id)
    # a different seed draws a genuinely different mix
    s_seed = hash_fraction_sample(d, 0.5, id_col="doc_id", seed=7).select("doc_id").toPandas()
    assert set(s_seed.doc_id) != set(s1.doc_id)


def test_fraction_sample_per_stratum_mix(spark):
    d = spark.read.parquet(DOCS)
    mix = hash_fraction_sample(
        d, {"en": 1.0, "de": 0.0}, strata_col="lang"
    ).groupBy("lang").count().toPandas().set_index("lang")
    full = d.groupBy("lang").count().toPandas().set_index("lang")
    assert mix.loc["en", "count"] == full.loc["en", "count"]  # frac 1.0 keeps all
    assert "de" not in mix.index                              # frac 0.0 drops all
    assert "fr" not in mix.index                              # unlisted -> dropped


def test_quota_sample_exact_counts_and_prefix_consistency(spark):
    d = spark.read.parquet(DOCS)
    q10 = stratified_quota_sample(d, 10, strata_col="lang").toPandas()
    counts = q10.groupby("lang").size()
    full = d.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, c in counts.items():
        assert c == min(10, full[lang])  # exact, capped by stratum size
    assert list(q10.columns) == d.columns  # helper column dropped
    # prefix consistency: quota-5 sample ⊂ quota-10 sample, per stratum
    q5 = stratified_quota_sample(d, 5, strata_col="lang").toPandas()
    assert set(map(tuple, q5[["lang", "doc_id"]].values)) <= set(
        map(tuple, q10[["lang", "doc_id"]].values)
    )
    # dict quotas
    qd = stratified_quota_sample(
        d, {"en": 3, "de": 1}, strata_col="lang"
    ).groupBy("lang").count().toPandas().set_index("lang")
    assert qd.loc["en", "count"] == 3 and qd.loc["de", "count"] == 1
    assert "fr" not in qd.index


def test_samplers_match_pure_python_reference(spark):
    """Both samplers equal an independent pure-python replica of the
    md5-60bit coordinate — pinning the exact hash/threshold/rank math the
    DuckDB oracle also relies on."""
    import hashlib

    from rocket_etl_spark.operators.sampling import stratified_quota_sample

    def h(doc_id, seed=42):
        return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)

    d = spark.read.parquet(DOCS)
    src = d.select("doc_id", "lang").toPandas()

    got = sorted(
        hash_fraction_sample(d, 0.3, id_col="doc_id").select("doc_id").toPandas().doc_id
    )
    want = sorted(i for i in src.doc_id if h(i) < int(0.3 * (1 << 60)))
    assert got == want

    got_q = stratified_quota_sample(d, 7, strata_col="lang").toPandas()
    for lang, grp in src.groupby("lang"):
        want_ids = sorted(grp.doc_id, key=lambda i: (h(i), i))[:7]
        assert sorted(got_q[got_q.lang == lang].doc_id) == sorted(want_ids)


def test_fraction_sample_is_scan_stage_filter(spark):
    """The corpus-scale contract: NO exchange anywhere in the plan — the
    sample must be a predicate inside the scan stage."""
    d = spark.read.parquet(DOCS)
    plan = hash_fraction_sample(
        d, {"en": 0.5, "de": 0.25}, strata_col="lang"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_quota_sample_giant_stratum_guard(spark):
    import pytest

    from rocket_etl_spark.operators.sampling import stratified_quota_sample

    df = spark.range(100).selectExpr(
        "id AS doc_id", "CASE WHEN id < 90 THEN 'big' ELSE 'small' END AS lang"
    )
    # guard off by default: no job, no error
    assert stratified_quota_sample(df, 5, strata_col="lang").count() == 10
    # guard on: the 90-row stratum trips a 50-row bound, naming it and
    # pointing at the shuffle-free sampler
    with pytest.raises(ValueError, match="'big'=90.*hash_fraction_sample"):
        stratified_quota_sample(df, 5, strata_col="lang", max_stratum_rows=50)
    # a bound nothing exceeds passes through
    assert (
        stratified_quota_sample(df, 5, strata_col="lang", max_stratum_rows=500).count()
        == 10
    )
