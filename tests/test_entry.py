"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_runs_with_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "last_event_type", "last_value", "props_sha256"]
    # deterministic: same query twice → same result
    a = df.toPandas()
    b = entry_mod.entry(spark).toPandas()
    assert a.equals(b)


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is oracle-checked since round 2 (the sketch queries run
    # over the cross-engine md5-60bit hash, replayed in generated SQL)
    assert set(qs) == set(oracles)
    assert len(qs) >= 40


def test_sampled_queries_run(spark):
    """Cheap plan+execution smoke on a few representative queries; the full
    DuckDB comparison lives in tools/check_oracle.py (run per-round)."""
    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    for name in ["join_inner", "window_lww", "agg_rollup", "dedup_exact", "knn_cosine"]:
        df = qs[name](spark, sf)
        assert df.count() >= 0
