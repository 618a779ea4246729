"""Unit tests: vectorized UDFs vs their JVM-expression twins and hashlib."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from rocket_etl_spark.functions.hashing import sha256_content, sha256_expr
from rocket_etl_spark.functions.lang import ALIASES, normalize_lang, normalize_lang_expr


def test_sha256_udf_matches_expr_and_hashlib(spark):
    df = spark.createDataFrame(
        [("hello",), ("",), ("ünïcødé ✓",), (None,), ("x" * 10_000,)], "content string"
    )
    got = df.select(
        sha256_content("content").alias("udf"), sha256_expr("content").alias("expr"), "content"
    ).collect()
    for r in got:
        assert r["udf"] == r["expr"]
        if r["content"] is not None:
            assert r["udf"] == hashlib.sha256(r["content"].encode()).hexdigest()
        else:
            assert r["udf"] is None


def test_normalize_lang_udf_matches_expr(spark):
    vals = [(v,) for v in [*ALIASES.keys(), "Py", " C++ ", "GOLANG", "unknown-lang", None, ""]]
    df = spark.createDataFrame(vals, "lang string")
    got = df.select(
        normalize_lang(F.col("lang")).alias("udf"), normalize_lang_expr("lang").alias("expr")
    ).collect()
    for r in got:
        assert r["udf"] == r["expr"]


def test_normalize_lang_canonicalizes(spark):
    df = spark.createDataFrame(
        [("py",), ("C++",), ("golang",), ("TypeScript",), ("COBOL",)], "lang string"
    )
    out = [r[0] for r in df.select(normalize_lang_expr("lang")).collect()]
    assert out == ["python", "cpp", "go", "typescript", "cobol"]
