"""Content hashing — the per-row invariant vs the reference.

The reference framework computed input checksums for its run-status log
(upstream wprdc_etl ``pipeline/connectors.py`` [U], see SURVEY.md §0 for
the citation convention); the engine's correctness gate is per-row
``content`` sha256 equality after replay (BASELINE.json:2,15).

Two implementations with identical output:

* ``sha256_expr`` — ``F.sha2(col, 256)``: JVM-side, whole-stage-codegen,
  the hot-path default.
* ``sha256_content`` — an Arrow-vectorized pandas UDF (hashlib), kept as
  the explicitly-demanded vectorized-UDF surface (BASELINE.json:6) and as
  a cross-check of the JVM implementation in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator  # noqa: F401 (used in UDF type hints)

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def sha256_expr(col: str | Column) -> Column:
    """JVM-side sha256 hex digest (preferred in query plans)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


@pandas_udf(StringType())
def sha256_content(content: pd.Series) -> pd.Series:
    """Arrow-batched sha256 hex digest; None-safe."""
    return content.map(
        lambda s: None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest()
    )


def _sha256_iter(batches: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
    # iterator form (detected via the type hints): per-worker setup is paid
    # once per partition, not per Arrow batch — the right shape when the
    # UDF carries heavy init
    digest = hashlib.sha256  # stand-in for expensive setup (models, tables)
    for s in batches:
        yield s.map(lambda x: None if x is None else digest(x.encode("utf-8")).hexdigest())


sha256_content_iter = pandas_udf(_sha256_iter, StringType())
