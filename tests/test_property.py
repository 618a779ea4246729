"""Property tests (hypothesis): engine == oracle under arbitrary event
orderings, batch boundaries, and key/op mixes."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rocket_etl_spark.oracle import replay_oracle
from rocket_etl_spark.streaming.replay import EVENTS_DDL, create_repo_files_table, replay_batch

_KEYS = [("r0", "a.py"), ("r0", "b.py"), ("r1", "a.py"), ("r1", "c.go"), ("r2", "z.rs")]


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for seq in range(n):
        k = draw(st.integers(0, len(_KEYS) - 1))
        op = draw(st.sampled_from(["upsert", "upsert", "upsert", "delete"]))
        repo, path = _KEYS[k]
        rows.append(
            {
                "event_seq": seq,
                "event_ts": pd.Timestamp("2020-01-01") + pd.Timedelta(seconds=seq),
                "op": op,
                "repo": repo,
                "path": path,
                "commit": hashlib.sha1(f"{seq}".encode()).hexdigest(),
                "lang": draw(st.sampled_from(["py", "Python", "C++", "go"])),
                "content": f"content-{repo}-{path}-v{seq}",
            }
        )
    # arbitrary arrival order + arbitrary batch boundaries
    perm = draw(st.permutations(range(n)))
    n_cuts = draw(st.integers(0, min(3, n - 1)))
    cuts = sorted(draw(st.sets(st.integers(1, n - 1), min_size=n_cuts, max_size=n_cuts))) if n > 1 else []
    shuffled = [rows[i] for i in perm]
    bounds = [0, *cuts, n]
    return [shuffled[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1) if bounds[i] < bounds[i + 1]]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=event_log())
def test_any_order_any_batching_matches_oracle(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("prop")
    table = create_repo_files_table(spark, tmp / "t", num_buckets=4)
    pdfs = []
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows)
        pdfs.append(pdf)
        df = spark.createDataFrame(pdf, EVENTS_DDL)
        replay_batch(table, df, epoch_id=i)
    eng = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ora = replay_oracle(pdfs)
    if len(ora) == 0:
        assert len(eng) == 0
        return
    pd.testing.assert_frame_equal(eng[ora.columns], ora, check_dtype=False)
