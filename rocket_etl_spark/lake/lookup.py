"""Metadata-pruned point lookups: key → row without scanning the table.

The serving-path read a CDC-maintained table owes its consumers: given
a bounded set of keys ("this repo/path", "these 500 entities"), return
their current rows touching only the files that can possibly hold them.
Three metadata layers narrow the scan, each free at lookup time:

1. **Bucket pruning** — keys hash to buckets (``pmod(xxhash64(keys),
   N)``), so only the touched buckets' file lists are considered.  The
   bucket ids are computed by a one-row-per-key Spark job over the SAME
   ``bucket_of`` expression the writer uses — no Python reimplementation
   of xxhash64 to drift out of sync.
2. **Zone maps** — per-file key MIN/MAX from parquet footer statistics
   (``kr`` entries, lake/merge.py): a file whose range excludes every
   probe key is skipped.
3. **Key blooms** — the 1 KB per-file blooms small commits attach: no
   false negatives, so a bloom miss is a proof of absence.

These are the same pruners the MERGE's decide scan trusts for
correctness (`_prune_decide_files` — a false negative there would be a
wrong merge), so the lookup inherits their no-false-negative guarantee:
every file that may contain a probe key is read; files without metadata
are always read.  On the trickle-CDC file layout (many small bloomed
files between compactions) a point lookup reads O(files holding the
key) instead of O(files in bucket) — the measured 2x+ decide-scan
pruning (BENCH/BASELINE.md round 4) applied to reads.

Merge-on-read safety: pruning never drops a file that may hold a probe
key, so the per-key reconciliation input (``LakeTable.read``'s
base+delta collapse) stays complete for every requested key — files the
pruner skips provably contain no row of any probed key.

At cluster scale this is the pattern Iceberg serves point reads with
(manifest-entry column bounds + optional bloom filters); here the
metadata lives in the snapshot JSON, bounded at ~1 KB per small file.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rocket_etl_spark.lake.merge import _bloom_safe_keys, _prune_decide_files
from rocket_etl_spark.lake.table import LakeTable, bucket_of
from rocket_etl_spark.schema.registry import TableSchema

# a "point" lookup is bounded by contract: beyond this, use a join
LOOKUP_MAX_KEYS = int(os.environ.get("SPARK_GRAFT_LOOKUP_MAX_KEYS", 100_000))


def lookup(
    table: LakeTable,
    key_values: Sequence,
    snapshot_id: int | None = None,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, dict]:
    """Current rows for the given key tuples (scalars OK for single-col
    keys).  Deleted keys return no row; unknown keys return no row.
    ``snapshot_id`` time-travels the lookup.  With ``return_stats``,
    also returns ``{"buckets_touched", "files_scanned", "files_total"}``
    for the touched buckets (pruning observability)."""
    snap = (
        table.snapshot(snapshot_id) if snapshot_id is not None
        else table.current_snapshot()
    )
    keys = snap["key_cols"]
    rows = [
        tuple(kv) if isinstance(kv, (tuple, list)) else (kv,)
        for kv in key_values
    ]
    if not rows:
        raise ValueError("lookup needs at least one key")
    if len(rows) > LOOKUP_MAX_KEYS:
        raise ValueError(
            f"{len(rows)} probe keys exceeds LOOKUP_MAX_KEYS="
            f"{LOOKUP_MAX_KEYS}; join against table.read() instead"
        )
    if any(len(r) != len(keys) for r in rows):
        raise ValueError(f"each key must have {len(keys)} parts ({keys})")

    schema = TableSchema.from_json(
        snap["schemas"][str(snap["current_schema_version"])]
    )
    full = schema.to_struct()
    by_name = {f.name: f for f in full.fields}
    key_struct = type(full)([by_name[k] for k in keys])  # field order == key order
    keys_df = table.spark.createDataFrame(rows, key_struct)

    # bucket ids via the writer's own expression — one tiny job, ≤ rows;
    # each RETIRED bucket layout (spec evolution) is probed with the
    # keys' buckets under THAT spec, so pruning survives evolution
    legacy = [
        l for l in (snap.get("legacy") or []) if any(l["buckets"].values())
    ]
    probe_cols = [bucket_of(keys, int(snap["num_buckets"])).alias("_b")] + [
        bucket_of(keys, int(l["num_buckets"])).alias(f"_b{l['spec_id']}")
        for l in legacy
    ]
    probe = keys_df.select("*", *probe_cols).collect()
    touched = sorted({r["_b"] for r in probe})
    leg_touched = {
        int(l["spec_id"]): sorted(
            b
            for b in {r[f"_b{l['spec_id']}"] for r in probe}
            if l["buckets"].get(str(b))
        )
        for l in legacy
    }
    key_rows = [tuple(r[k] for k in keys) for r in probe]
    entries = [
        fe for b in touched for fe in snap["buckets"].get(str(b), [])
    ] + [
        fe
        for l in legacy
        for b in leg_touched.get(int(l["spec_id"]), [])
        for fe in l["buckets"].get(str(b), [])
    ]

    file_subset = None
    stats = {"buckets_touched": len(touched)}
    from rocket_etl_spark.lake.merge import (
        BLOOM_PROBE_MAX_KEYS,
        RANGE_PROBE_MAX_KEYS,
    )

    pr = (
        _prune_decide_files(
            entries, key_rows, keys, schema,
            blooms=len(key_rows) <= BLOOM_PROBE_MAX_KEYS,
            ranges=len(key_rows) <= RANGE_PROBE_MAX_KEYS,
        )
        if _bloom_safe_keys(schema, keys)
        else None
    )
    if pr is not None:
        file_subset, scanned, total = pr
        stats |= {"files_scanned": scanned, "files_total": total}
    else:
        total = len(entries)
        stats |= {"files_scanned": total, "files_total": total}

    df = table.read(
        buckets=touched, file_subset=file_subset, snap=snap,
        legacy_buckets=leg_touched,
    )
    # null-SAFE key equality, matching the merge engine (which treats a
    # null key part as a real key group via eqNullSafe throughout): a
    # probe tuple containing NULL finds its row instead of silently
    # returning nothing (advisor finding, r5)
    probe_df = keys_df
    for k in keys:
        probe_df = probe_df.withColumnRenamed(k, f"_p_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_p_{k}"))
        cond = c if cond is None else cond & c
    out = df.join(F.broadcast(probe_df), cond, "left_semi")
    return (out, stats) if return_stats else out


_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"
_LIT = r"(?:'(?:[^']*)'|-?\d+(?:\.\d+)?)"
_CONJUNCT_RE = re.compile(
    rf"^\s*({_IDENT})\s*(>=|<=|==|=|>|<)\s*({_LIT})\s*$"
)
_BETWEEN_RE = re.compile(
    rf"^\s*({_IDENT})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})\s*$", re.IGNORECASE
)


def _parse_prunable_conjuncts(predicate: str, schema) -> dict[str, tuple]:
    """Best-effort extraction of zone-map-prunable bounds from a SQL
    predicate: top-level conjunctions of ``col <op> literal`` /
    ``col BETWEEN a AND b`` over zone-map-supported columns.

    STRICTLY conservative: anything this parser does not understand — a
    disjunction, parentheses, NOT, a function call, an unsupported dtype,
    a literal that does not fit the column's type — contributes NO bound
    (the file is read; the residual predicate still applies exactly), so
    a parse miss can only cost speed, never rows.  Returns
    ``{col: (lo, hi)}`` with either bound possibly None."""
    from rocket_etl_spark.lake.merge import _range_canon, _range_safe_cols

    if re.search(r"\(|\bOR\b|\bNOT\b|\bIN\b", predicate, re.IGNORECASE):
        return {}
    safe = set(_range_safe_cols(schema))
    out: dict[str, tuple] = {}

    def lit_val(raw: str, dt: str):
        if raw.startswith("'"):
            return raw[1:-1] if dt in ("string", "varchar", "char", "date") else None
        if dt in ("string", "varchar", "char", "date", "binary", "boolean"):
            return None
        if "." in raw:
            return None  # float literal vs int zone map: skip, stay safe
        return int(raw)

    # split on top-level AND; BETWEEN is rewritten to two conjuncts first
    pred = re.sub(
        rf"({_IDENT})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})",
        r"\1 >= \2 AND \1 <= \3",
        predicate,
        flags=re.IGNORECASE,
    )
    for part in re.split(r"\bAND\b", pred, flags=re.IGNORECASE):
        m = _CONJUNCT_RE.match(part)
        if not m:
            continue
        col, op, raw = m.group(1), m.group(2), m.group(3)
        if col not in safe:
            continue
        dt = schema.field_by_name(col).dtype.lower().split("(")[0].strip()
        v = lit_val(raw, dt)
        if v is None:
            continue
        cv = _range_canon(v, dt)
        lo, hi = out.get(col, (None, None))
        if op in (">", ">="):  # strict > keeps the inclusive bound: superset, safe
            lo = cv if lo is None else max(lo, cv)
        elif op in ("<", "<="):
            hi = cv if hi is None else min(hi, cv)
        else:  # = / ==
            lo = cv if lo is None else max(lo, cv)
            hi = cv if hi is None else min(hi, cv)
        out[col] = (lo, hi)
    return out


def filtered_read(
    table: LakeTable,
    predicate: str,
    snapshot_id: int | None = None,
    return_stats: bool = False,
    skip_cols: set | frozenset = frozenset(),
    residual: bool = True,
) -> DataFrame | tuple[DataFrame, dict]:
    """``table.read().filter(predicate)`` with automatic zone-map file
    pruning — the declarative-read surface the ``range_scan`` machinery
    deserves: real users write a SQL ``filter``, not a pruning API.

    The predicate's prunable conjuncts (``col <op> literal``, BETWEEN —
    see ``_parse_prunable_conjuncts``) skip every file whose per-column
    min/max provably excludes them; the FULL predicate then re-applies
    as a residual on the surviving files, so the answer is always
    identical to the unpruned read (pruning has no false negatives by
    construction; a parse miss just reads more files).

    ``skip_cols``: columns that may NOT contribute bounds (a caller whose
    downstream transform renames/derives over them — jobspec.extract).
    ``residual=False`` returns the pruned read WITHOUT applying the
    predicate — only for callers that apply it themselves downstream."""
    snap = (
        table.snapshot(snapshot_id) if snapshot_id is not None
        else table.current_snapshot()
    )
    schema = TableSchema.from_json(
        snap["schemas"][str(snap["current_schema_version"])]
    )
    bounds = _parse_prunable_conjuncts(predicate, schema)
    for c in set(bounds) & set(skip_cols):
        del bounds[c]
    subset: set[str] | None = None
    total = scanned = 0
    all_file_lists = list(snap["buckets"].values()) + [
        fl
        for l in (snap.get("legacy") or [])
        for fl in l["buckets"].values()
    ]
    if bounds:
        subset = set()
        for files in all_file_lists:
            for fe in files:
                total += 1
                skip = False
                for c, (clo, chi) in bounds.items():
                    kr = (fe.get("kr") or {}).get(c)
                    if kr is not None and (
                        (chi is not None and kr[0] > chi)
                        or (clo is not None and kr[1] < clo)
                    ):
                        skip = True
                        break
                if not skip:
                    subset.add(fe["path"])
                    scanned += 1
        if scanned == total:
            subset = None  # nothing pruned — skip subset bookkeeping
    else:
        total = sum(len(fl) for fl in all_file_lists)
        scanned = total
    df = table.read(file_subset=subset, snap=snap)
    if residual:
        df = df.filter(predicate)
    if not return_stats:
        return df
    return df, {
        "files_scanned": scanned if subset is not None else total,
        "files_total": total,
        "pruned_on": sorted(bounds),
    }


def range_scan(
    table: LakeTable,
    col: str,
    lo=None,
    hi=None,
    snapshot_id: int | None = None,
    return_stats: bool = False,
    also: dict | None = None,
) -> DataFrame | tuple[DataFrame, dict]:
    """Rows with ``lo <= col <= hi`` (either bound optional), reading only
    the files whose zone map can overlap the range.

    Buckets are hash-distributed, so every bucket participates — the
    pruning is at FILE granularity via the per-file key MIN/MAX (``kr``)
    zone maps.  On a freshly-trickled table each small file spans few
    keys, so selective ranges skip most files; after a CLUSTERED
    compaction (``compact(sort_cols=[...], target_file_rows=...)``) each
    bucket is disjoint sorted slices and a range touches ~1 slice per
    bucket — the layout this scan is designed to exploit, the same
    composition as Iceberg's sort-order rewrite + manifest column
    bounds.  A file with no zone map for ``col`` is always read (no
    false negatives); the residual predicate re-applies exactly, so
    pruning can never change the answer.

    ``col`` may be ANY zone-map-supported column (string / int family /
    date / boolean / binary) — since late r5 every commit records
    footer min/max for all such columns, Iceberg column-bounds style,
    with long string bounds truncated safely — so a lang or commit
    predicate prunes files too, not just the merge keys.  The residual
    filter also pushes into the parquet scan as a normal min/max
    row-group filter — file pruning here saves the OPEN of excluded
    files, which dominates on a high-file-count trickle layout.

    ``also={col2: (lo2, hi2), ...}`` ANDs further range predicates: a
    file is skipped when ANY predicate's zone map proves disjointness,
    and every predicate re-applies as a residual filter.  With a
    Z-ORDER layout (``compact(..., zorder=True)``) this is the payoff
    query shape — each z-column's bounds are balanced-tight, so a
    conjunctive box query multiplies the per-column skip rates.
    """
    snap = (
        table.snapshot(snapshot_id) if snapshot_id is not None
        else table.current_snapshot()
    )
    if lo is None and hi is None:
        raise ValueError("range_scan needs at least one bound")
    schema = TableSchema.from_json(
        snap["schemas"][str(snap["current_schema_version"])]
    )
    from rocket_etl_spark.lake.merge import _range_canon, _range_safe_cols

    preds = {col: (lo, hi), **(also or {})}
    canon: dict[str, tuple] = {}
    for c, (plo, phi) in preds.items():
        if c not in _range_safe_cols(schema):
            raise ValueError(
                f"range_scan needs a zone-map-supported column; {c!r} not in "
                f"{_range_safe_cols(schema)}"
            )
        dt = schema.field_by_name(c).dtype.lower().split("(")[0].strip()
        canon[c] = (
            _range_canon(plo, dt) if plo is not None else None,
            _range_canon(phi, dt) if phi is not None else None,
        )

    subset: set[str] = set()
    total = scanned = 0
    prunable = True
    all_file_lists = list(snap["buckets"].values()) + [
        fl
        for l in (snap.get("legacy") or [])
        for fl in l["buckets"].values()
    ]
    for files in all_file_lists:
        for fe in files:
            total += 1
            skip = False
            for c, (clo, chi) in canon.items():
                kr = (fe.get("kr") or {}).get(c)
                # skip iff ANY zone map PROVES disjointness with its range
                if kr is not None and (
                    (chi is not None and kr[0] > chi)
                    or (clo is not None and kr[1] < clo)
                ):
                    skip = True
                    break
            if skip:
                continue
            subset.add(fe["path"])
            scanned += 1
    if scanned == total:
        subset_arg = None  # nothing pruned — skip the subset bookkeeping
        prunable = False
    else:
        subset_arg = subset
    df = table.read(file_subset=subset_arg, snap=snap)
    pred = F.lit(True)
    for c, (plo, phi) in preds.items():
        if plo is not None:
            pred = pred & (F.col(c) >= F.lit(plo))
        if phi is not None:
            pred = pred & (F.col(c) <= F.lit(phi))
    out = df.filter(pred)
    if not return_stats:
        return out
    return out, {
        "files_scanned": scanned,
        "files_total": total,
        "pruned": prunable,
    }
