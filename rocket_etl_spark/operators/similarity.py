"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``   — brute-force exact top-k: one broadcast of the query
  vector, one pass, TakeOrderedAndProject.  The correctness baseline.
* ``lsh_ann_topk``  — random-hyperplane LSH bucketing: sign-bit signature
  via deterministic ±1 hyperplanes, candidates share the query's bucket
  (multi-probe over hamming-1 neighbors), exact cosine re-rank inside.
  The scale path: probes touch a vanishing fraction of the corpus.
* ``ivf_ann_topk``  — IVF (inverted-file) search: a sampled-k-means
  coarse quantizer partitions the corpus into lists; queries probe only
  their ``nprobe`` nearest lists.  The other standard ANN shape (FAISS
  IVFFlat), complementary to LSH: data-adapted lists vs oblivious
  hashes.

All vector math is JVM higher-order functions (zip_with/aggregate); the
hyperplanes are seeded literals, so results are deterministic and the
brute-force oracle can measure recall in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rocket_etl_spark.operators.dedup import cosine


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k most-cosine-similar rows to the row with ``query_id``
    (query excluded).  The single-row query side is broadcast."""
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("_q")
    )
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    return (
        base.join(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(id_col, F.round(cosine(F.col("_v"), F.col("_q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic ±1 hyperplane from a seeded blake2 stream."""
    out = []
    for i in range(dim):
        h = hashlib.blake2b(f"{seed}:{plane}:{i}".encode(), digest_size=1).digest()[0]
        out.append(1.0 if h & 1 else -1.0)
    return out


def _pad_row(v, dim: int) -> "np.ndarray":
    """Zero-pad/truncate to the declared dim; NULL behaves like the zero
    vector (deterministic all-zero bits / list-0 assignment) instead of
    crashing the Python worker."""
    if v is None:
        return np.zeros(dim)
    a = np.asarray(v[:dim], dtype=np.float64)
    return a if len(a) == dim else np.pad(a, (0, dim - len(a)))


def lsh_signature(vec: Column, dim: int, planes: int = 12, seed: int = 42) -> Column:
    """Sign-bit signature: bit p = 1 iff dot(vec, hyperplane_p) > 0.

    Arrow-batched numpy: all ``planes`` dot products are ONE BLAS matmul
    per batch — ``(batch, dim) @ (dim, planes)`` — then a power-of-two
    matvec packs the sign bits LSB-first (bit p ← plane p, the same
    packing the expression form used, so the DuckDB bit-replay oracle is
    unchanged).  Residual cross-engine caveat, accepted: BLAS may sum the
    dot product pairwise while SQL folds sequentially, so a dot that
    cancels to within float64 rounding of zero (|dot| ≲ 1e-13·|v| against
    a ±1 hyperplane — probability ~0 on real embeddings) could flip a
    sign bit vs the oracle; every float comparison in the suite shares
    this knife edge and the exact-cosine re-rank downstream is unaffected
    by a single candidate-set bit.  The earlier nested
    zip_with/aggregate expression tree
    (planes × dim literals) was evaluated interpreted and per-element by
    Catalyst — the exact pattern the banded form's rewrite replaced at a
    measured ~30x."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    H = np.array([_hyperplane(dim, p, seed) for p in range(planes)]).T  # (dim, P)
    pw = 2 ** np.arange(planes, dtype=np.int64)  # bit p = plane p (LSB-first)

    @pandas_udf(LongType())
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        V = np.stack(vs.map(lambda v: _pad_row(v, dim)).to_numpy())
        return pd.Series((V @ H > 0).astype(np.int64) @ pw)

    return sig(vec)


def lsh_band_signatures(
    vec: Column, dim: int, bands: int = 8, planes_per_band: int = 8, seed: int = 42
) -> Column:
    """Array of ``bands`` independent sign-bit signatures (banded
    hyperplane LSH, the cosine analog of MinHash banding): two vectors
    are candidates iff ANY band signature matches, so recall at high
    cosine is ``1-(1-p^r)^b`` with per-plane agreement
    ``p = 1 - θ/π`` — e.g. cos ≥ 0.95, 8×8 → ~0.99 recall — while a
    band bucket holds ~n/2^r rows: candidate volume is O(n·b·bucket),
    never O(block²).

    Arrow-batched numpy: all ``bands·planes_per_band`` dot products are
    ONE BLAS matmul per batch — ``(batch, dim) @ (dim, planes)`` — then a
    reshape-matmul packs sign bits into per-band integer keys.  (An
    earlier pure-expression form rode a 4096-literal nested higher-order
    expression; Catalyst evaluates those interpreted, per element — the
    matmul measured ~30x faster on the same data, which is exactly the
    "vectorized pandas UDF over per-row exprs" rule from the survey.)
    Deterministic: the ±1 hyperplanes come from the same seeded blake2
    stream as ``lsh_signature``'s."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    planes = bands * planes_per_band
    H = np.array([_hyperplane(dim, p, seed) for p in range(planes)]).T  # (dim, P)
    # first plane of a band is the most significant bit of its key
    pw = 2 ** np.arange(planes_per_band - 1, -1, -1, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def band_sigs(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack(vs.map(lambda v: _pad_row(v, dim)).to_numpy())
        bits = (V @ H > 0).astype(np.int64)                       # (n, P)
        sigs = bits.reshape(len(V), bands, planes_per_band) @ pw  # (n, bands)
        return pd.Series(list(sigs))

    return band_sigs(vec)


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 64,
    sample_rows: int = 20_000,
    iters: int = 8,
    seed: int = 42,
    approx_rows: int | None = None,
) -> "np.ndarray":
    """L2-normalized k-means centroids from a BOUNDED random sample —
    the IVF coarse quantizer.  The sample (≤ ``sample_rows`` vectors) is
    the only data that ever reaches the driver; Lloyd iterations run in
    numpy over it.  At corpus scale this is the standard IVF recipe
    (FAISS trains its quantizer on a sample too): index quality needs a
    representative sample, not the corpus.

    ``approx_rows``: pass any row-count estimate (snapshot stats, a prior
    count, an upper bound) to skip the sizing ``count()`` job — the
    fraction only needs to be roughly right, the ``limit`` caps the
    collect either way."""
    n = df.count() if approx_rows is None else approx_rows
    frac = min(1.0, (sample_rows * 1.25) / max(n, 1))
    rows = (
        df.select(vec_col).sample(False, frac, seed).limit(sample_rows).collect()
    )
    vecs = [r[0] for r in rows if r[0] is not None]
    if not vecs:
        raise ValueError("cannot train an IVF quantizer on an empty/all-NULL corpus")
    X = np.array(vecs, dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = X[assign == j]
            if len(m):
                C[j] = m.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_assign(
    centroids: "np.ndarray",
    vec_col: str = "embedding",
) -> Column:
    """Inverted-list id per vector: argmax cosine against the (tiny,
    closure-shipped) centroid matrix — one Arrow-batched matmul."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C = centroids  # (k, dim), rows unit-norm
    dim = C.shape[1]

    @pandas_udf(IntegerType())
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack(vs.map(lambda v: _pad_row(v, dim)).to_numpy())
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(V @ C.T, axis=1).astype(np.int32))

    return assign(F.col(vec_col))


def precompute_ivf_assignment(
    df: DataFrame,
    centroids: "np.ndarray | None" = None,
    vec_col: str = "embedding",
    list_col: str = "_ivf_list",
    n_centroids: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, "np.ndarray"]:
    """The once-per-corpus half of IVF deployment: train (or accept) the
    quantizer and return ``(df + list_col, centroids)``.  Write the
    result bucketed/partitioned by ``list_col`` and pass the SAME
    centroid matrix to every ``ivf_ann_topk(..., centroids=...)`` call —
    each query then re-plans to a partition-pruned scan of its ``nprobe``
    lists and runs zero training jobs."""
    C = centroids if centroids is not None else kmeans_centroids(
        df, vec_col, n_centroids, seed=seed
    )
    return df.withColumn(list_col, ivf_assign(C, vec_col)), C


def ivf_ann_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search — the OTHER
    standard ANN shape next to ``lsh_ann_topk``: a k-means coarse
    quantizer partitions the corpus into inverted lists; a query scans
    only its ``nprobe`` nearest lists, exact-cosine re-ranked.

    Scale shape: the quantizer trains on a bounded sample (driver-side
    numpy — the only collect); list assignment is one Arrow matmul pass;
    the probe reads ~``nprobe/n_centroids`` of the corpus.  Pass
    ``centroids=`` (from ``kmeans_centroids`` / a prior
    ``precompute_ivf_assignment``) to skip training entirely — the
    production shape: train once per corpus, bucket the table by the
    assignment column, and every query is a partition-pruned scan with
    zero training jobs.  Training is seed-deterministic, so passed-in and
    per-call-trained centroids give identical results for the same
    (corpus, seed).

    Not ANSI-SQL-replayable (k-means is iterative and data-dependent),
    so its harness entry is rows-only; the pytest gate instead checks
    every returned cosine against the brute-force value and recall
    against exact top-k."""
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None or qrow[0] is None:
        raise ValueError(f"query_id {query_id!r} not found (or has a NULL {vec_col!r})")
    C = centroids if centroids is not None else kmeans_centroids(
        df, vec_col, n_centroids, seed=seed
    )
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_list", ivf_assign(C, "_v"))

    q = np.asarray(qrow[0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = [int(i) for i in np.argsort(-(C @ qn))[:nprobe]]

    qdf = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("_q")
    )
    cand = base.filter(F.col("_list").isin(probe) & (F.col(id_col) != query_id))
    return (
        cand.join(F.broadcast(qdf))
        .select(id_col, F.round(cosine(F.col("_v"), F.col("_q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_ann_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = rows whose LSH bucket is within
    ``probe_hamming`` bit-flips of the query's bucket; exact cosine
    re-rank on candidates only.  Probing 1+planes buckets of 2^planes
    bounds work at ~(1+planes)/2^planes of the corpus per query."""
    base = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_sig", lsh_signature(F.col("_v"), dim, planes, seed))

    q = base.filter(F.col(id_col) == query_id).select(
        F.col("_v").alias("_q"), F.col("_sig").alias("_qsig")
    )
    joined = base.join(F.broadcast(q)).filter(F.col(id_col) != query_id)
    cand = joined.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.col("_qsig"))) <= probe_hamming
    )
    return (
        cand.select(id_col, F.round(cosine(F.col("_v"), F.col("_q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
