"""Text analysis for large-scale training-data pipelines.

Everything is pure JVM expressions (whole-stage codegen) — no Python in
the hot path.  Each op also exists as an ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` so the driver's DuckDB check covers it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_WS = r"\s+"


def token_count(text: str | Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, _WS)))


def tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), _WS)


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs, each
# absorbing one leading space (the GPT-2 pre-tokenizer shape, minus the
# RE2-incompatible lookahead so the DuckDB oracle runs the SAME pattern)
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(text: str | Column) -> Column:
    """Subword-style token count: non-overlapping matches of the BPE-ish
    pre-tokenizer pattern — the usual cheap proxy for "how many tokens
    will the tokenizer emit" when budgeting a training corpus (true BPE
    merges only split these runs further, never across them)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_SPLIT_RE))


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scores: token count, char counts, alpha/space
    ratios, mean token length — the usual cheap pre-training filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    spaces = F.length(F.regexp_replace(t, "[^ ]", ""))
    ntok = token_count(t)
    return df.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_frac"),
        F.round(spaces / F.greatest(n_chars, F.lit(1)), 4).alias("space_frac"),
        F.round((n_chars - spaces) / F.greatest(ntok, F.lit(1)), 4).alias("mean_tok_len"),
    )


# tiny per-language stopword markers for the n-gram-free heuristic
_LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to)\b"),
    ("de", r"\b(der|die|das|und)\b"),
    ("fr", r"\b(le|la|les|et)\b"),
    ("es", r"\b(el|los|las|y)\b"),
]


def lang_id(text: str | Column) -> Column:
    """Stopword-marker language guess; 'und' (undetermined) when none hit.

    First marker that matches wins (markers are ordered) — determinism
    over accuracy; a production pipeline would swap in fastText via a
    pandas UDF with the same column contract.
    """
    c = F.col(text) if isinstance(text, str) else text
    expr = F.lit("und")
    for code, pat in reversed(_LANG_MARKERS):
        expr = F.when(c.rlike(pat), F.lit(code)).otherwise(expr)
    return expr


def fingerprint(text: str | Column) -> Column:
    """Document fingerprint: md5 of the lowercased alphanumeric skeleton —
    robust to whitespace/punctuation-only edits."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
