"""Sequence packing: assemble documents into fixed-budget training rows.

The step after dedup/quality/sampling in an LLM data pipeline: training
wants fixed-length sequences, so documents are packed into bins of at
most ``budget`` weight (tokens, chars — any additive column).  Greedy
sequential packing in id order: a bin closes when the next doc would
overflow it.  Deterministic (same input → same bins), and a doc larger
than the budget gets a bin of its own.

This is the engine's **UDTF surface** (SURVEY §2.10): packing is
per-partition SEQUENTIAL state — each row's bin depends on every prior
row's — which neither ``explode`` nor a window over a fixed frame can
express (bin boundaries are a recursive fold, not a cumulative-sum
bucketing).  A Spark 4 Python UDTF with a ``TABLE(...) PARTITION BY ...
ORDER BY ...`` argument is exactly this contract: one handler instance
per partition, rows delivered in order, ``terminate()`` flushing the
last open bin.

Scale shape: partitions pack in PARALLEL (one task each); within a
partition the fold is inherently sequential, so bound partition sizes by
packing per (part, shard) — e.g. ``F.pmod(F.xxhash64("doc_id"), 256)``
as a second partition column — which is the standard practice (packing
quality needs only local density, not a global order).  Handler memory
is O(current bin): closed bins are emitted immediately, never buffered.

Oracle: the same greedy fold is replayed in DuckDB as a recursive CTE
(see ``__spark_entry__.oracle_sql['corpus_pack']``), so the harness row
is fully value-checked despite being non-window SQL.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


def greedy_pack(
    items: Iterable[tuple[object, int]], budget: int
) -> list[tuple[list[object], int]]:
    """Pure-python reference: [(ids, total_weight)] bins, greedy in input
    order.  The UDTF and the DuckDB oracle must both equal this."""
    bins: list[tuple[list[object], int]] = []
    ids: list[object] = []
    tot = 0
    for i, w in items:
        w = int(w)
        # non-EMPTY (not non-zero-total) gate: a zero-weight head must not
        # disable the overflow check — hypothesis found [w=0, w>budget]
        # packing an oversize doc into the zero-weight bin while the
        # recursive-CTE oracle (run + w > budget on any non-first row)
        # closes it; both engines now agree
        if ids and tot + w > budget:
            bins.append((ids, tot))
            ids, tot = [], 0
        ids.append(i)
        tot += w
    if ids:
        bins.append((ids, tot))
    return bins


PACK_SCHEMA = "part: string, bin_id: bigint, doc_ids: string, n_docs: int, total_tokens: bigint"


def make_pack_udtf(
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
):
    """UDTF handler class for greedy packing (budget/columns baked in via
    closure — UDTF handlers take no constructor args).  ``doc_ids`` is a
    comma-joined string so the row is hashable/replayable across engines
    (same convention as ``agg_collect``)."""

    @udtf(returnType=PACK_SCHEMA)
    class Pack:
        def __init__(self):
            self.part = None
            self.bin_id = 0
            self.ids: list = []
            self.tot = 0

        def _close(self):
            if self.ids:
                yield (
                    None if self.part is None else str(self.part),
                    self.bin_id,
                    ",".join(map(str, self.ids)),
                    len(self.ids),
                    self.tot,
                )

        def eval(self, row):
            w = int(row[weight_col])
            self.part = row[part_col]
            if self.ids and self.tot + w > budget:
                yield from self._close()
                self.bin_id += 1
                self.ids, self.tot = [], 0
            self.ids.append(row[id_col])
            self.tot += w

        def terminate(self):
            yield from self._close()

    return Pack


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Pack ``df`` into ≤``budget``-weight bins per ``part_col`` value,
    greedy in ``id_col`` order.  Returns (part, bin_id, doc_ids, n_docs,
    total_tokens) — one row per bin.

    Long-lived-session hygiene: the UDTF name is STABLE per
    (budget, cols) — re-registering replaces, so streaming/bench loops
    don't grow the function registry — and the input temp view is
    dropped as soon as the plan is analyzed (``spark.sql`` resolves the
    view eagerly; the returned DataFrame keeps the resolved relation).
    The row exchange to the Python worker uses PICKLED rows, set
    explicitly: an interleaved A/B at sf0.1 and 10x (OPTIMIZATION_r06)
    measured the Arrow-batched UDTF exchange 2.3-3.6x SLOWER here —
    ``eval`` is called per row either way (useArrow only changes
    serialization), the input columns are slim (a string, two ints), and
    Arrow's per-batch columnar conversion is pure overhead at that row
    shape.  Arrow would only pay if wide text columns crossed the
    boundary, which this packing input never ships."""
    import hashlib

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "false")
    cfg = hashlib.md5(
        f"{budget}|{part_col}|{id_col}|{weight_col}".encode()
    ).hexdigest()[:12]
    fn = f"pack_seq_{cfg}"
    view = f"pack_in_{uuid.uuid4().hex[:12]}"  # per-call: concurrent-safe
    spark.udtf.register(fn, make_pack_udtf(budget, part_col, id_col, weight_col))
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT * FROM {fn}(TABLE({view}) PARTITION BY {part_col} ORDER BY {id_col})"
        )
    finally:
        spark.catalog.dropTempView(view)
