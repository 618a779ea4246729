"""Deterministic corpus sampling for training-data mixes.

The last step of an LLM data pipeline: after dedup/quality filtering,
assemble the training mix — "50% of the English docs, 25% of everything
else", or "exactly 10k docs per language".  Both samplers are
deterministic functions of (id, seed), so the mix is reproducible,
incremental (a re-run over a grown corpus keeps every previously
selected doc whose hash still clears the bar), and replayable in ANSI
SQL for the DuckDB oracle via the cross-engine ``md5_60bit`` hash
(operators/dedup.py).

Scale shapes, deliberately different:

* ``hash_fraction_sample`` — keep iff ``hash(id:seed) < frac·2^60``.
  A pure map-side FILTER: no shuffle, no window, no state; at 100 TB it
  is a predicate inside the scan stage (whole-stage codegen), and the
  sampled fraction concentrates to ``frac`` by Chernoff.  This is THE
  corpus-scale path.
* ``stratified_quota_sample`` — exactly ``quota`` rows per stratum via
  ``row_number()`` over the hash within each stratum.  Exact counts
  need a per-stratum total order, so this shuffles by stratum and
  sorts; use it when strata are bounded (languages, sources — each
  stratum sorts in parallel, but ONE giant stratum serializes into one
  task's sort).  For "a fraction of a huge stratum" use the filter
  form; the hash ordering makes the two CONSISTENT: the quota-q sample
  is a prefix-superset of any smaller quota, and approximately the
  fraction sample at frac = q/|stratum|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from rocket_etl_spark.operators.dedup import md5_60bit

_HASH_SPACE = 1 << 60


def sample_hash(id_col: str | Column, seed: int = 42) -> Column:
    """The sampling coordinate: uniform-ish 60-bit hash of ``id:seed``.
    Changing the seed draws an independent mix from the same corpus."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_60bit(F.concat(c.cast("string"), F.lit(f":{seed}")))


def hash_fraction_sample(
    df: DataFrame,
    fractions: float | dict[str, float],
    strata_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Shuffle-free deterministic sample: keep a row iff its hash clears
    the (per-stratum) fraction threshold.

    ``fractions``: one float for the whole corpus, or {stratum value →
    fraction} with ``strata_col`` (unlisted strata → dropped, i.e.
    fraction 0.0 — quotas state the mix explicitly)."""
    h = sample_hash(id_col, seed)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions require strata_col")
        # one CASE expression, sorted key order for plan determinism
        expr = F.lit(0).cast("bigint")
        for val, frac in sorted(fractions.items(), reverse=True):
            expr = F.when(
                F.col(strata_col).eqNullSafe(F.lit(val)),
                F.lit(int(frac * _HASH_SPACE)).cast("bigint"),
            ).otherwise(expr)
        return df.filter(h < expr)
    return df.filter(h < F.lit(int(fractions * _HASH_SPACE)).cast("bigint"))


def stratified_quota_sample(
    df: DataFrame,
    quotas: int | dict[str, int],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    max_stratum_rows: int | None = None,
) -> DataFrame:
    """EXACTLY ``quota`` rows per stratum (fewer if the stratum is
    smaller), chosen as the quota lowest sampling hashes — deterministic
    and prefix-consistent across quota sizes.  One shuffle (by stratum)
    + per-stratum sort; strata sort in parallel.

    A single GIANT stratum serializes into one task (WindowGroupLimit
    bounds its input to ~quota rows per upstream partition, but the
    per-stratum merge is still one task).  Pass ``max_stratum_rows`` to
    pre-flight that sharp edge: one cheap map-side-combined count per
    stratum, raising with the offending strata if any exceeds the bound
    — the fix is ``hash_fraction_sample``, whose per-stratum filter
    never shuffles at all."""
    if max_stratum_rows is not None:
        big = (
            df.groupBy(strata_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_stratum_rows)
            .collect()
        )
        if big:
            detail = ", ".join(f"{r[0]!r}={r['_n']}" for r in big)
            raise ValueError(
                f"stratified_quota_sample: strata exceed max_stratum_rows="
                f"{max_stratum_rows} ({detail}); an exact quota over a "
                "stratum this large funnels into one task's sort — use "
                "hash_fraction_sample (shuffle-free) with frac ≈ "
                "quota/|stratum| instead"
            )
    # NULLS LAST on both keys: Spark windows default to NULLS FIRST while
    # DuckDB (and the SQL oracle) default to NULLS LAST — a NULL id must
    # never displace a real doc from the quota prefix in one engine only
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(id_col, seed).asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    ranked = df.withColumn("_sample_rank", F.row_number().over(w))
    if isinstance(quotas, dict):
        q = F.lit(0)
        for val, n in sorted(quotas.items(), reverse=True):
            q = F.when(F.col(strata_col).eqNullSafe(F.lit(val)), F.lit(int(n))).otherwise(q)
    else:
        q = F.lit(int(quotas))
    return ranked.filter(F.col("_sample_rank") <= q).drop("_sample_rank")
