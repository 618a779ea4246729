"""Source readers — the engine's analog of the reference's connectors +
extractors (upstream ``pipeline/connectors.py`` / ``pipeline/extractors.py``
[U], SURVEY.md §2.1).

Key inversion vs the reference: extractors yielded one Python dict per
row; here every format maps to a distributed ``spark.read`` with a
DECLARED schema (never inference — the reference declared marshmallow
schemas per job, SURVEY.md §1.1).

Network connectors (HTTP/SFTP — S2/S3) are driver-side fetch-to-dir
steps (``sources/remote.py``): the full fetch → checksum → read pipeline
runs against ``file://`` URLs in tests, with only the socket itself
transport-gated (no network in this sandbox, SURVEY.md §0).  Excel (S5)
needs driver pandas and is gated behind an import-try.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_source(spark: SparkSession, src) -> DataFrame:
    """Read a SourceSpec; text formats require a declared schema."""
    fmt = src.format.lower()
    if fmt == "parquet":
        return spark.read.options(**src.options).parquet(src.path)
    if fmt == "csv":
        if not src.schema_ddl:
            raise ValueError("csv sources require a declared schema (no inference)")
        return (
            spark.read.schema(src.schema_ddl)
            .option("header", True)
            .option("encoding", src.encoding)
            .options(**src.options)
            .csv(src.path)
        )
    if fmt == "json":
        if not src.schema_ddl:
            raise ValueError("json sources require a declared schema (no inference)")
        return (
            spark.read.schema(src.schema_ddl)
            .option("encoding", src.encoding)
            .options(**src.options)
            .json(src.path)
        )
    if fmt == "excel":
        try:
            import pandas as pd  # noqa: F401

            pdf = pd.read_excel(src.path, **src.options)  # needs openpyxl/xlrd
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(f"excel support needs a reader lib: {e}") from e
        return spark.createDataFrame(pdf)
    if fmt == "lake":
        # a lake table as a job source (downstream jobs over CDC-maintained
        # tables); jobspec.extract routes filtered reads through zone-map
        # file pruning before this plain form is reached
        from rocket_etl_spark.lake.table import LakeTable

        return LakeTable.load(spark, src.path).read()
    if fmt in ("http", "sftp", "remote"):
        # driver-side staging (reference HTTPConnector/SFTPConnector shape):
        # fetch src.path (a URL) into a local dir, then read it under the
        # format declared in options['inner_format'] with the same schema.
        import dataclasses
        import tempfile

        from rocket_etl_spark.sources.remote import fetch_to_dir

        opts = dict(src.options)
        inner_format = opts.pop("inner_format", "parquet")
        stage_dir = opts.pop("stage_dir", None) or tempfile.mkdtemp(prefix="rocket_fetch_")
        fetched = fetch_to_dir(src.path, stage_dir)
        staged = dataclasses.replace(
            src, format=inner_format, path=fetched["path"], options=opts
        )
        return read_source(spark, staged)
    raise ValueError(f"unknown source format {src.format!r}")


def source_checksum(path: str | Path) -> str:
    """sha256 of a local source file — the reference logged an input
    checksum per run for its status DB (upstream connectors.py [U]);
    the engine records it in lineage-adjacent metadata."""
    h = hashlib.sha256()
    p = Path(path)
    files = sorted(p.rglob("*")) if p.is_dir() else [p]
    for f in files:
        if f.is_file():
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
    return h.hexdigest()
