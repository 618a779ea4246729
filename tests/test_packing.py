"""Sequence packing (the UDTF surface — SURVEY §2.10)."""

from __future__ import annotations

from rocket_etl_spark.operators.packing import greedy_pack, pack_sequences

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_greedy_pack_reference():
    bins = greedy_pack([(1, 3), (2, 3), (3, 5), (4, 10), (5, 1)], budget=7)
    assert bins == [([1, 2], 6), ([3], 5), ([4], 10), ([5], 1)]
    assert greedy_pack([], 7) == []


def test_pack_sequences_matches_pure_greedy_and_invariants(spark):
    d = spark.read.parquet(DOCS)
    out = pack_sequences(d, budget=4000).toPandas()
    src = d.select("lang", "doc_id", "n_chars").toPandas()

    # every doc appears exactly once, in its own language's bins
    packed_ids = [int(i) for ids in out.doc_ids for i in ids.split(",")]
    assert sorted(packed_ids) == sorted(src.doc_id)

    for _, r in out.iterrows():
        # budget respected unless the bin is a single oversize doc
        assert r.total_tokens <= 4000 or r.n_docs == 1
        assert r.n_docs == len(r.doc_ids.split(","))

    # per-language equality with the sequential reference fold
    for lang, grp in src.sort_values("doc_id").groupby("lang"):
        want = greedy_pack(zip(grp.doc_id, grp.n_chars), budget=4000)
        got = out[out.part == lang].sort_values("bin_id")
        assert [
            ([int(i) for i in ids.split(",")], int(t))
            for ids, t in zip(got.doc_ids, got.total_tokens)
        ] == [(ids, t) for ids, t in want]

    # deterministic across runs
    again = pack_sequences(d, budget=4000).toPandas()
    a = out.sort_values(["part", "bin_id"]).reset_index(drop=True)
    b = again.sort_values(["part", "bin_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_greedy_pack_properties():
    """Hypothesis invariants on the pure fold: partition of the input in
    order, budget respected except oversize singletons, totals exact,
    and maximality (a bin never closes while the next doc still fits)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=50), max_size=40),
        st.integers(min_value=1, max_value=60),
    )
    def check(weights, budget):
        items = list(enumerate(weights))
        bins = greedy_pack(items, budget)
        flat = [i for ids, _ in bins for i in ids]
        assert flat == [i for i, _ in items]  # partition, order preserved
        for k, (ids, tot) in enumerate(bins):
            assert tot == sum(weights[i] for i in ids)
            assert tot <= budget or len(ids) == 1
            if k + 1 < len(bins):  # maximality: next bin's head didn't fit
                nxt = weights[bins[k + 1][0][0]]
                assert tot + nxt > budget

    check()


def test_pack_sequences_oversize_doc_gets_own_bin(spark):
    rows = [("en", 1, 100), ("en", 2, 9000), ("en", 3, 100), ("x", 9, 50)]
    df = spark.createDataFrame(rows, "lang string, doc_id bigint, n_chars bigint")
    out = pack_sequences(df, budget=4000).toPandas().sort_values(["part", "bin_id"])
    en = out[out.part == "en"]
    assert list(en.doc_ids) == ["1", "2", "3"]  # oversize doc isolated
    assert list(en.total_tokens) == [100, 9000, 100]
    assert list(out[out.part == "x"].doc_ids) == ["9"]


def test_pack_sequences_leaves_no_catalog_residue(spark):
    """Repeated calls in a long-lived session must not grow the temp-view
    catalog or the function registry (stable per-config UDTF name;
    per-call input view dropped after analysis)."""
    rows = [("en", i, 100) for i in range(20)]
    df = spark.createDataFrame(rows, "lang string, doc_id bigint, n_chars bigint")
    pack_sequences(df, budget=400).collect()
    views0 = {v.name for v in spark.catalog.listTables()}
    fns0 = {f.name for f in spark.catalog.listFunctions() if f.name.startswith("pack_seq_")}
    for _ in range(3):
        pack_sequences(df, budget=400).collect()
    views1 = {v.name for v in spark.catalog.listTables()}
    fns1 = {f.name for f in spark.catalog.listFunctions() if f.name.startswith("pack_seq_")}
    assert views1 == views0  # no pack_in_* views accumulate
    assert not any(v.startswith("pack_in_") for v in views1)
    # stable per-config registration: repeats add nothing (other configs
    # used elsewhere in the session may already hold their own name)
    assert fns1 == fns0
