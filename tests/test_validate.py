"""Validation / quarantine (plans/validate.py) — the marshmallow-validator
surface: rule semantics, NULL tolerance, set-level rules, the JobSpec
integration, and the no-exchange plan contract for row-level rules."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from rocket_etl_spark.plans.validate import (
    VIOLATIONS_COL, annotate, check, in_range, in_set, matches, not_null,
    ref_exists, split, unique_key,
)


@pytest.fixture()
def people(spark):
    rows = [
        # id, name,  age,  dept
        (1, "ada", 36, "eng"),
        (2, "bob", -5, "eng"),          # age out of range
        (3, None, 20, "ops"),           # name null
        (4, "eve", None, "bad-dept"),   # dept not in set; age NULL passes range
        (5, "Mallory!", 150, "eng"),    # name regex + age range
        (6, "dan", 30, None),           # dept NULL passes in_set
        (6, "dan", 30, None),           # duplicate id with row 6
    ]
    return spark.createDataFrame(rows, "id int, name string, age int, dept string")


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [
        not_null("name"),
        in_range("age", 0, 120),
        in_set("dept", ["eng", "ops"]),
        matches("name", "^[a-z]+$"),
    ]


def _vmap(df):
    return {tuple(r[:-1]): sorted(r[-1]) for r in
            df.select("id", "name", VIOLATIONS_COL).collect()}


def test_row_rules_and_null_tolerance(people):
    ann = annotate(people, _rules())
    got = {r["id"]: sorted(r[VIOLATIONS_COL])
           for r in ann.select("id", VIOLATIONS_COL).dropDuplicates(["id"]).collect()}
    assert got[1] == []
    assert got[2] == ["in_range_age"]
    # NULL name: only not_null flags it — the regex rule passes NULL
    assert got[3] == ["not_null_name"]
    # NULL age passes range; dept fails the set
    assert got[4] == ["in_set_dept"]
    assert got[5] == ["in_range_age", "matches_name"]
    # NULL dept passes in_set
    assert got[6] == []


def test_split(people):
    valid, quarantined = split(people, _rules())
    assert VIOLATIONS_COL not in valid.columns
    assert sorted(r["id"] for r in valid.select("id").collect()) == [1, 6, 6]
    assert quarantined.count() == 4


def test_unique_key_flags_every_copy(people):
    ann = annotate(people, [unique_key("id")])
    flagged = [r["id"] for r in
               ann.filter(F.size(VIOLATIONS_COL) > 0).select("id").collect()]
    assert flagged == [6, 6]


def test_ref_exists(spark, people):
    dims = spark.createDataFrame([("eng",), ("ops",)], "dept_name string")
    ann = annotate(people, [ref_exists(["dept"], dims, ["dept_name"],
                                       hint="broadcast")])
    bad = {r["id"] for r in
           ann.filter(F.size(VIOLATIONS_COL) > 0).select("id").collect()}
    # dept NULL (id 6) passes — only the present-but-missing key fails
    assert bad == {4}
    assert ann.count() == people.count()  # distinct dim: no fan-out


def test_check_custom_cross_column(spark):
    df = spark.createDataFrame([(1, 2), (5, 3), (None, 1)], "lo int, hi int")
    ann = annotate(df, [check("ordered", "lo <= hi")])
    got = [sorted(r[VIOLATIONS_COL]) for r in ann.orderBy("hi").collect()]
    assert got == [[], [], ["ordered"]]  # NULL passes


def test_duplicate_rule_name_rejected(people):
    with pytest.raises(ValueError, match="duplicate rule name"):
        annotate(people, [not_null("name"), not_null("name")])


def test_row_rules_add_no_exchange(people):
    explained = annotate(people, _rules())._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_jobspec_quarantine_and_fail(spark, tmp_path):
    from rocket_etl_spark.plans.jobspec import (
        DestSpec, JobSpec, SourceSpec, ValidationError, ValidationSpec,
        extract, transform, apply_validation,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "c", -1)],
        "k int, name string, v int",
    ).write.parquet(str(src))
    qdir = tmp_path / "rejects"
    spec = JobSpec(
        name="val-job",
        source=SourceSpec(format="parquet", path=str(src)),
        validate=ValidationSpec(
            rules=(not_null("name"), in_range("v", 0)),
            on_violation="quarantine",
            quarantine_path=str(qdir),
        ),
        dest=DestSpec(mode="file", path=str(tmp_path / "out")),
    )
    out = apply_validation(transform(extract(spark, spec), spec), spec)
    assert [r["k"] for r in out.select("k").collect()] == [1]
    rej = spark.read.parquet(str(qdir))
    assert rej.count() == 2 and VIOLATIONS_COL in rej.columns

    strict = JobSpec(
        name="strict", source=spec.source,
        validate=ValidationSpec(rules=(not_null("name"),), on_violation="fail"),
    )
    with pytest.raises(ValidationError, match="1 row"):
        apply_validation(transform(extract(spark, strict), strict), strict)


def test_rules_from_json_surface(spark):
    """CLI rule specs (inline JSON, list-of-dicts, file path handled by the
    same code) build the same rules the Python surface does; unknown rule
    names fail loudly."""
    import pyspark.sql.functions as F
    import pytest

    from rocket_etl_spark.plans.validate import annotate, rules_from_json

    spec = (
        '[{"rule": "matches", "col": "b", "pattern": "^x", "name": "b_shape"},'
        ' {"rule": "in_range", "col": "a", "lo": 0, "hi": 10},'
        ' {"rule": "not_null", "col": "b"}]'
    )
    df = spark.createDataFrame(
        [(5, "xok"), (20, None), (-1, "ybad")], "a int, b string"
    )
    ann = annotate(df, rules_from_json(spec))
    got = {
        r["a"]: sorted(r["_violations"])
        for r in ann.select("a", "_violations").collect()
    }
    assert got[5] == []
    assert got[20] == ["in_range_a", "not_null_b"]  # NULL b passes b_shape
    assert got[-1] == ["b_shape", "in_range_a"]
    with pytest.raises(ValueError, match="unknown rule"):
        rules_from_json('[{"rule": "frobnicate", "col": "a"}]')
