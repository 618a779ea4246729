"""rocket_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference ETL
framework (scottwedge/rocket-etl, a fork of WPRDC/rocket-etl): per-row
extract/transform/load jobs with keyed datastore upserts become a
change-event replay pipeline —

    binlog/WAL-style change stream of (repo, path, commit, lang, content)
      → vectorized transforms (sha256 content hashing, lang normalization)
      → (repo, path)-keyed last-writer-wins dedupe (event_seq order)
      → idempotent, epoch-fenced MERGE into a bucketed lake table
      → per-epoch + per-partition (hash-bucket) lineage rows + metrics

Everything is pyspark.sql DataFrame ops and Arrow-vectorized pandas UDFs;
no per-row Python, no RDDs.  Designed for a 1000-executor cluster at
10^10-event scale: bucketed copy-on-write storage so a MERGE only
rewrites touched buckets, map-side-combining LWW aggregation so hot keys
reduce before the shuffle, explicit salting for skewed repos, and
AQE-friendly declarative plans throughout.
"""

__version__ = "0.1.0"
