"""Grouped custom processing — the reference's per-job ``custom_processing``
callbacks (upstream ``engine/etl_util.py`` [U]) re-expressed as Arrow
grouped-map transforms (SURVEY.md §2.10).

``apply_per_group`` is the general surface: arbitrary pandas logic per key
group, Arrow-batched, executed where the group lives (one shuffle on the
keys, no driver involvement).  ``group_profile`` is the engine's built-in
example: a per-group summary used for per-repo corpus profiling.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def apply_per_group(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema_ddl: str,
) -> DataFrame:
    """Apply ``fn`` (pandas in → pandas out) to each key group.

    The scale contract: groups must fit in one executor's memory — use it
    for per-repo / per-user logic, never for whole-corpus state.  Skewed
    group sizes are the caller's problem (block or pre-aggregate first).
    """
    return df.groupBy(*keys).applyInPandas(fn, schema_ddl)


def group_profile(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Per-group profile via grouped-map pandas: count, mean (2dp), and the
    value at the group's median position — median-by-sort is awkward in
    pure SQL aggregates but trivial in pandas, which is exactly when
    grouped-map is the right tool."""
    import math

    # key types come from the INPUT schema — a hardcoded bigint would make
    # string-keyed groups (e.g. repo) fail Arrow conversion
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"{k} {in_types[k]}" for k in keys)
    schema = f"{key_ddl}, n bigint, mean_val double, median_val double"

    def r2(x: float) -> float:
        # floor-based 2dp rounding: bit-identical across engines (python
        # round() is banker's, SQL round() is half-away — they disagree)
        return math.floor(x * 100 + 0.5) / 100

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].sort_values().reset_index(drop=True)
        row = {k: pdf[k].iloc[0] for k in keys}
        row["n"] = len(pdf)
        row["mean_val"] = r2(float(vals.mean()))
        row["median_val"] = r2(float(vals.iloc[(len(vals) - 1) // 2]))
        return pd.DataFrame([row])

    return apply_per_group(df, keys, profile, schema)
