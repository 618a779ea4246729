"""Dedup cascade + similarity search + multimodal plumbing tests.

The sketch ops (minhash/simhash/LSH) have no SQL oracle; their gate is
exact recomputation: candidates must be verified near-dups and known
near-dups must be found.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rocket_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rocket_etl_spark.operators.multimodal import (
    decode_image_batches,
    sample_frames,
    with_media_metadata,
)
from rocket_etl_spark.operators.similarity import cosine_topk, lsh_ann_topk

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree"
)


def _docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),                                # exact dup of 1
        (3, BASE.replace("lazy", "sleepy"), "en"),      # near dup of 1
        (4, "completely different text about spark shuffles and parquet files", "en"),
        (5, "der schnelle braune fuchs springt über den faulen hund", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_exact_dedup_keeps_one_per_text(spark):
    out = exact_dedup(_docs(spark), order_col="doc_id").toPandas()
    assert len(out) == 4  # 1&2 collapse
    assert 1 in set(out.doc_id) and 2 not in set(out.doc_id)


def test_minhash_lsh_finds_known_neardups(spark):
    pairs = minhash_lsh_pairs(_docs(spark), threshold=0.3).toPandas()
    found = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in found          # identical docs always collide
    assert (1, 3) in found or (2, 3) in found  # one-token edit
    assert (1, 4) not in found      # unrelated never verified
    # candidates are verified: jaccard values equal the exact operator's
    exact = ngram_jaccard_pairs(_docs(spark), threshold=0.0, block_col="lang").toPandas()
    exact_map = {(r.id_a, r.id_b): r.jaccard_sim for r in exact.itertuples(index=False)}
    for r in pairs.itertuples(index=False):
        assert abs(exact_map[(r.id_a, r.id_b)] - r.jaccard_sim) < 1e-9


def test_simhash_hamming_orders_by_similarity(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=64, block_bits=1).toPandas()
    h = {(r.id_a, r.id_b): r.hamming for r in pairs.itertuples(index=False)}
    assert h[(1, 2)] == 0                      # identical → same fingerprint
    assert h[(1, 3)] < h.get((1, 4), 64)       # near dup closer than unrelated


def test_lsh_ann_subset_of_bruteforce_space(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(emb, query_id=0, k=50).toPandas()
    approx = lsh_ann_topk(emb, query_id=0, k=10, planes=8, probe_hamming=2).toPandas()
    assert len(approx) > 0
    # every ANN sim must equal the brute-force sim for that id (correct math)
    exact_map = dict(zip(exact.vec_id, exact.cos_sim))
    full = cosine_topk(emb, query_id=0, k=600).toPandas()
    full_map = dict(zip(full.vec_id, full.cos_sim))
    for r in approx.itertuples(index=False):
        assert abs(full_map[r.vec_id] - r.cos_sim) < 1e-9
    # recall sanity: ANN's best hit is a genuinely similar vector
    assert approx.cos_sim.max() >= exact.cos_sim.iloc[-1]


def test_zero_norm_vector_never_crashes_or_pairs(spark):
    """ANSI mode throws on /0 — one all-zero embedding must not abort a
    corpus-scale job (regression: caught live before try_divide)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.0], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    from rocket_etl_spark.operators.dedup import embedding_neardup_pairs

    out = embedding_neardup_pairs(df, threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    topk = cosine_topk(df, query_id=1, k=5).collect()
    assert {r.vec_id: r.cos_sim for r in topk}[3] is None


def test_multimodal_metadata_decode_and_frames(spark):
    rows = [
        (1, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"x" * 2000),
        (2, bytes([0x89, 0x50, 0x4E, 0x47]) + b"y" * 5000),
        (3, b"RIFFabcd" + b"z" * 100),
        (4, b"????" + b"w" * 10),
    ]
    df = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    meta = with_media_metadata(df).toPandas().set_index("asset_id")
    assert meta.loc[1, "media_type"] == "jpeg"
    assert meta.loc[2, "media_type"] == "png"
    assert meta.loc[3, "media_type"] == "wav"
    assert meta.loc[4, "media_type"] == "unknown"
    assert meta.loc[2, "n_bytes"] == 5004

    feats = decode_image_batches(with_media_metadata(df), fake=True).toPandas()
    assert len(feats) == 4
    assert set(feats.columns) == {"asset_id", "media_type", "n_bytes", "width", "height", "mean_luma"}
    assert (feats.width > 0).all() and (feats.mean_luma.between(0, 1)).all()

    import pytest

    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_image_batches(df, fake=False).collect()

    frames = sample_frames(df, every_n_bytes=1024, max_frames=4).toPandas()
    per = frames.groupby("asset_id").size()
    assert per[2] == 4  # 5004 bytes capped at max_frames
    assert per[4] == 1  # tiny payload → one frame
    assert (frames.byte_offset == frames.frame_no * 1024).all()


def test_exact_dedup_at_scale_shape(spark):
    """dedup plan: one shuffle (hash agg), no cross join, no collect."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan