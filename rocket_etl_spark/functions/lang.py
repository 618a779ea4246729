"""Language normalization (BASELINE.json:6 names this UDF explicitly).

Canonicalizes dirty language labels (``py`` → ``python``, ``C++`` →
``cpp``, ``golang`` → ``go`` …).  Replaces the reference's per-row
``@pre_load`` string-cleanup hooks (upstream payload schemas [U]) with a
vectorized map.

Like hashing, both surfaces exist: a pure-expression version (JVM,
preferred) and an Arrow pandas UDF (the north-star's named vectorized
UDF; also handles arbitrary future alias tables without replanning).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

ALIASES: dict[str, str] = {
    "py": "python",
    "python": "python",
    "java": "java",
    "scala": "scala",
    "c": "c",
    "cpp": "cpp",
    "c++": "cpp",
    "cxx": "cpp",
    "go": "go",
    "golang": "go",
    "rust": "rust",
    "rs": "rust",
    "js": "javascript",
    "javascript": "javascript",
    "ts": "typescript",
    "typescript": "typescript",
    "sql": "sql",
}


def normalize_lang_expr(col: str | Column) -> Column:
    """JVM-side normalization: lower/trim then alias map via chained CASE."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.trim(c))
    # build a map literal once; element_at returns null for misses → coalesce to lowercased input
    kv: list[Column] = []
    for k, v in ALIASES.items():
        kv.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*kv), low), low)


@pandas_udf(StringType())
def normalize_lang(lang: pd.Series) -> pd.Series:
    """Arrow-batched normalization; None-safe."""
    low = lang.str.strip().str.lower()
    return low.map(lambda s: None if s is None else ALIASES.get(s, s))
