"""Declarative row validation with quarantine — the marshmallow surface.

The reference validates every row through a marshmallow ``Schema``:
``schema.load(row)`` raises ``ValidationError`` and the row is rejected
and logged (upstream ``engine/wprdc_etl/pipeline/schema.py`` [U],
SURVEY.md §1.2/§3.1 step 5).  Type *coercion* already maps to
``TransformSpec.casts`` (jobspec.py); this module maps the *validator*
half: ``allow_none=False``, ``validate.OneOf``, ``validate.Range``,
``validate.Regexp``, and custom per-field validators.

Spark-first design — one annotate pass, zero Python:

* Every row-level rule compiles to a JVM boolean ``Column`` (TRUE =
  pass).  ``annotate`` evaluates ALL rules in one projection and
  collects the names of failed rules into a ``_violations`` array —
  a single whole-stage-codegen'd pass over the scan, no exchange,
  no UDF.  At 100 TB this is a free rider on the ingest scan.
* Value-level rules (range / set / regex / expr) PASS on NULL input:
  nullability is ``not_null``'s job, exactly as marshmallow separates
  ``allow_none`` from field validators.  One missing value therefore
  yields one violation, not one per rule.
* Set-level rules are separate, honestly-priced passes:
  ``unique_key`` costs one shuffle on the key (a windowed count — the
  minimum price of a table-level uniqueness claim; every copy of a
  duplicated key is flagged), ``ref_exists`` is a left join against
  the distinct dimension keys (broadcast when the dim is small —
  AQE decides; pass ``hint="broadcast"`` to force).
* ``split`` derives (valid, quarantined) as two filters over the same
  annotated plan.  Callers consuming both sides at scale should either
  persist the annotated frame or write it once partitioned by validity;
  for the batch-ingest path (quarantine a small reject stream, load the
  rest) the two-filter shape is the right default — the reject filter
  is highly selective and both reuse one scan's pushed filters.

Severity: rejects-to-quarantine mirrors the reference's log-and-skip;
``on_violation="fail"`` mirrors a strict schema that aborts the job.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

VIOLATIONS_COL = "_violations"


@dataclass(frozen=True)
class Rule:
    """A named validation rule.

    ``predicate`` (row-level): boolean Column, TRUE = row passes.
    ``kind``: "row" | "unique" | "ref" — set-level kinds carry their
    spec in ``cols`` / ``ref`` instead of a predicate.
    """

    name: str
    kind: str = "row"
    predicate: Column | None = None
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_cols: tuple[str, ...] = ()
    hint: str | None = None


def not_null(col: str, name: str | None = None) -> Rule:
    """marshmallow ``allow_none=False`` — the ONE rule NULL fails."""
    return Rule(name or f"not_null_{col}", predicate=F.col(col).isNotNull())


def in_set(col: str, values: Iterable, name: str | None = None) -> Rule:
    """marshmallow ``validate.OneOf`` (NULL passes; see module doc)."""
    pred = F.col(col).isin(list(values))
    return Rule(name or f"in_set_{col}", predicate=F.coalesce(pred, F.lit(True)))


def in_range(col: str, lo=None, hi=None, name: str | None = None) -> Rule:
    """marshmallow ``validate.Range`` (inclusive bounds; NULL passes)."""
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    return Rule(name or f"in_range_{col}", predicate=F.coalesce(pred, F.lit(True)))


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    """marshmallow ``validate.Regexp`` — unanchored search, like
    ``re.search`` (anchor explicitly with ^...$ for full-match);
    NULL passes."""
    pred = F.col(col).rlike(pattern)
    return Rule(name or f"matches_{col}", predicate=F.coalesce(pred, F.lit(True)))


def check(name: str, sql_predicate: str) -> Rule:
    """Custom validator: any SQL boolean expression (may span columns).
    NULL result passes — wrap with explicit IS NULL handling to opt out."""
    return Rule(name, predicate=F.coalesce(F.expr(sql_predicate), F.lit(True)))


def unique_key(*cols: str, name: str | None = None) -> Rule:
    """Table-level uniqueness: EVERY row of a key that appears more than
    once is flagged.  Costs one shuffle on the key columns."""
    return Rule(name or "unique_" + "_".join(cols), kind="unique", cols=tuple(cols))


def ref_exists(cols: Iterable[str], ref: DataFrame, ref_cols: Iterable[str] | None = None,
               name: str | None = None, hint: str | None = None) -> Rule:
    """Referential integrity: the row's key must exist in ``ref``.
    Joined against ``ref``'s DISTINCT keys (so dup dim keys never fan
    out); ``hint="broadcast"`` forces a broadcast of the dim side."""
    cols = tuple(cols)
    return Rule(name or "ref_" + "_".join(cols), kind="ref", cols=cols,
                ref=ref, ref_cols=tuple(ref_cols) if ref_cols else cols, hint=hint)


def rules_from_json(spec) -> list[Rule]:
    """Build row-level rules from a JSON spec — the CLI surface for
    spark-submit jobs (jobs/replay_job.py ``--audit-rules``).

    ``spec``: a list of dicts, a JSON string, or a path to a .json file.
    Each dict: ``{"rule": "matches"|"in_set"|"in_range"|"not_null"|
    "check", ...kwargs}`` mirroring the constructor of the same name,
    e.g. ``{"rule": "matches", "col": "lang", "pattern": "^[a-z]+$",
    "name": "lang_shape"}``.  Set-level rules (unique_key / ref_exists)
    need live DataFrames and are deliberately NOT expressible here."""
    import json
    import os

    if isinstance(spec, str):
        spec = json.loads(
            open(spec).read() if os.path.exists(spec) else spec
        )
    builders = {
        "not_null": not_null, "in_set": in_set, "in_range": in_range,
        "matches": matches, "check": check,
    }
    out: list[Rule] = []
    for i, d in enumerate(spec):
        d = dict(d)
        kind = d.pop("rule", None)
        if kind not in builders:
            raise ValueError(
                f"rules_from_json[{i}]: unknown rule {kind!r} "
                f"(expected one of {sorted(builders)})"
            )
        out.append(builders[kind](**d))
    return out


def annotate(df: DataFrame, rules: Iterable[Rule],
             violations_col: str = VIOLATIONS_COL) -> DataFrame:
    """One pass: append ``violations_col`` = array of failed rule names
    (empty array = valid row).  Row rules fold into a single projection;
    each set-level rule adds its own (priced-as-documented) pass."""
    rules = list(rules)
    seen: set[str] = set()
    for r in rules:
        if r.name in seen:
            raise ValueError(f"duplicate rule name {r.name!r}")
        seen.add(r.name)

    flags: list[Column] = []
    for r in rules:
        if r.kind == "row":
            flags.append(F.when(r.predicate, F.lit(None).cast("string"))
                          .otherwise(F.lit(r.name)))
        elif r.kind == "unique":
            from pyspark.sql import Window
            n = F.count(F.lit(1)).over(Window.partitionBy(*r.cols))
            flags.append(F.when(n > 1, F.lit(r.name)).cast("string"))
        elif r.kind == "ref":
            hit = f"__ref_hit_{r.name}"
            dim = r.ref.select(*[F.col(rc).alias(c) for c, rc in zip(r.cols, r.ref_cols)]) \
                       .distinct().withColumn(hit, F.lit(True))
            if r.hint == "broadcast":
                dim = F.broadcast(dim)
            df = df.join(dim, on=list(r.cols), how="left")
            # A key with any NULL component is not checkable → passes
            # (NULL-tolerance contract); a complete key missing from the
            # dim → violation.
            keyed = F.lit(True)
            for c in r.cols:
                keyed = keyed & F.col(c).isNotNull()
            flags.append(F.when(keyed & F.col(hit).isNull(), F.lit(r.name))
                          .cast("string"))
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")

    out = df.withColumn(violations_col, F.array_compact(F.array(*flags)))
    drop = [c for c in out.columns if c.startswith("__ref_hit_")]
    return out.drop(*drop) if drop else out


def split(df: DataFrame, rules: Iterable[Rule],
          violations_col: str = VIOLATIONS_COL) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): valid rows with the marker column removed,
    quarantined rows carrying their failed-rule names."""
    ann = annotate(df, rules, violations_col)
    valid = ann.filter(F.size(violations_col) == 0).drop(violations_col)
    quarantined = ann.filter(F.size(violations_col) > 0)
    return valid, quarantined
