"""Benchmark decontamination (n-gram collision with an eval set)."""

from __future__ import annotations

from rocket_etl_spark.operators.decontam import contaminated_ids, decontaminate


def _dfs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence about spark engines"),
            (3, "we saw the quick brown fox jumps over rocks today"),  # shares 5-gram with bench
            (4, "quick brown dogs sleep"),                             # <5 shared tokens: clean
            (5, "spark engines shuffle data"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "did the quick brown fox jumps over something")],
        "doc_id bigint, text string",
    )
    return corpus, bench


def test_decontaminate_drops_colliding_docs_only(spark):
    corpus, bench = _dfs(spark)
    flagged = sorted(
        r.doc_id for r in contaminated_ids(corpus, bench, n=5).collect()
    )
    # docs 1 and 3 share "the quick brown fox jumps" / "quick brown fox
    # jumps over" with the benchmark; 2/4/5 share no 5-gram
    assert flagged == [1, 3]
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench, n=5).collect())
    assert kept == [2, 4, 5]
    # all corpus columns survive the anti-join
    assert decontaminate(corpus, bench, n=5).columns == corpus.columns


def test_decontaminate_min_shared_threshold(spark):
    corpus, bench = _dfs(spark)
    # docs 1 and 3 each share exactly 2 distinct 5-grams with the bench
    # ("the quick brown fox jumps", "quick brown fox jumps over"):
    # the threshold keeps them at min_shared=3 and drops them at 2
    assert sorted(
        r.doc_id for r in contaminated_ids(corpus, bench, n=5, min_shared=2).collect()
    ) == [1, 3]
    assert (
        contaminated_ids(corpus, bench, n=5, min_shared=3).count() == 0
    )


def test_short_docs_produce_no_grams_and_never_crash(spark):
    """Regression (round-4): a doc with fewer than n tokens made
    shingle_frame emit a DESCENDING index sequence whose element_at
    crashed the job under ANSI mode.  Short docs must contribute zero
    n-grams through every consumer."""
    from rocket_etl_spark.operators.dedup import minhash_lsh_pairs, shingle_frame

    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, "a b"), (3, ""), (4, "a b c d e f g")],
        "doc_id bigint, text string",
    )
    sh = {r.doc_id: r._sh for r in shingle_frame(df, "text", "doc_id", 5).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == []
    assert len(sh[4]) == 3  # 7 tokens -> 3 five-grams
    # end-to-end consumers survive short docs too
    assert minhash_lsh_pairs(df, n=5, threshold=0.1).count() == 0
    assert contaminated_ids(df, df.filter("doc_id = 2"), n=5).count() == 0


def test_decontaminate_no_corpus_shuffle(spark):
    """The asymmetric-scale contract: with the benchmark broadcast, the
    corpus side must reach both joins without any Exchange except the
    flagged-ids distinct (grams and payloads never shuffle)."""
    corpus, bench = _dfs(spark)
    plan = decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # shingle_frame's deliberate round-robin barrier is the only
    # non-broadcast, non-distinct exchange family allowed
    import re

    exchanges = re.findall(r"(?<!Broadcast)Exchange (\w+)", plan)
    assert all(e in ("RoundRobinPartitioning", "hashpartitioning") for e in exchanges)

def test_decontaminate_broadcast_gate_fallback(spark):
    """The flagged-id broadcast is bounded: a cap smaller than the flagged
    set must route to the un-hinted fallback join (AQE decides) and still
    return the identical survivor set; cap=0 disables the fast path."""
    corpus, bench = _dfs(spark)
    expect = [2, 4, 5]
    # fast path (default cap): collected ids, broadcast local relation
    fast = sorted(r.doc_id for r in decontaminate(corpus, bench, n=5).collect())
    # fallback: 2 flagged ids > cap of 1
    slow = sorted(
        r.doc_id
        for r in decontaminate(corpus, bench, n=5, broadcast_ids_max=1).collect()
    )
    off = sorted(
        r.doc_id
        for r in decontaminate(corpus, bench, n=5, broadcast_ids_max=0).collect()
    )
    assert fast == slow == off == expect
    # fallback plan carries no forced broadcast of the flagged side: the
    # ONLY hint left is the bench-gram broadcast inside contaminated_ids
    # (the final anti-join is left to the planner)
    plan = (
        decontaminate(corpus, bench, n=5, broadcast_ids_max=1)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert plan.count("ResolvedHint") == 1


def test_decontaminate_broadcast_regime_corpus_never_shuffles(spark):
    """In the gated broadcast regime the final anti-join build side is a
    pre-collected LocalRelation — the corpus payload reaches it with no
    Exchange at all (scan → broadcast anti-join, one stage)."""
    corpus, bench = _dfs(spark)
    df = decontaminate(corpus, bench, n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # final join is a broadcast anti-join against the local id relation
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    import re

    # the contaminated-id computation already ran (bounded collect); the
    # remaining plan must contain NO non-broadcast exchange of the corpus
    exchanges = re.findall(r"(?<!Broadcast)Exchange (\w+)", plan)
    assert exchanges == []
