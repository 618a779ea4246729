"""Naive single-threaded replay oracle (test-only).

A faithful pandas model of the reference's sequential upsert loop
(upstream: rows replayed in order into a keyed Postgres upsert,
``pipeline/loaders.py`` [U]): sort every event by ``event_seq``, apply
one at a time to a dict keyed by (repo, path).  The engine's massively
parallel replay must converge to exactly this final state — per-row
content sha256 equality (BASELINE.json:2,15).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from rocket_etl_spark.functions.lang import ALIASES


def _norm_lang(s):
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return None
    low = str(s).strip().lower()
    return ALIASES.get(low, low)


def replay_oracle(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """Sequentially replay event batches; return the final table state.

    Batches may carry evolved schemas (added ``size_bytes``, ``lang``
    renamed ``language``); the result uses the final observed names with
    null backfill for rows last written under an older version.
    """
    state: dict[tuple, dict] = {}
    lang_name = "lang"
    extra_cols: list[str] = []

    events = []
    for b in batches:
        for rec in b.to_dict("records"):
            events.append(rec)
    events.sort(key=lambda r: r["event_seq"])

    for rec in events:
        cur_lang_name = "language" if "language" in rec else "lang"
        if cur_lang_name == "language":
            lang_name = "language"
        for c in rec:
            if c not in {"event_seq", "event_ts", "op", "repo", "path", "commit",
                         "lang", "language", "content", "delivery_order"} and c not in extra_cols:
                extra_cols.append(c)
        key = (rec["repo"], rec["path"])
        op = rec.get("op") or "upsert"
        prev = state.get(key)
        if prev is not None and rec["event_seq"] <= prev["last_event_seq"]:
            continue  # stale (should not happen with unique increasing seq)
        if op == "delete":
            state.pop(key, None)
            continue
        row = {
            "repo": rec["repo"],
            "path": rec["path"],
            "_lang": _norm_lang(rec.get("language", rec.get("lang"))),
            "content": rec["content"],
            "content_sha256": hashlib.sha256(rec["content"].encode()).hexdigest()
            if rec.get("content") is not None
            else None,
            "last_commit": rec["commit"],
            "last_event_seq": rec["event_seq"],
        }
        for c in extra_cols:
            row[c] = rec.get(c)
        state[key] = row

    cols = ["repo", "path", lang_name, "content", "content_sha256",
            "last_commit", "last_event_seq", *extra_cols]
    rows = []
    for r in state.values():
        out = dict(r)
        out[lang_name] = out.pop("_lang")
        for c in extra_cols:
            out.setdefault(c, None)
        rows.append({c: out.get(c) for c in cols})
    df = pd.DataFrame(rows, columns=cols)
    return df.sort_values(["repo", "path"]).reset_index(drop=True)
