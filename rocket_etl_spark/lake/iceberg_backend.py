"""Real-Iceberg backend: the same MERGE contract against a catalog table.

No Iceberg runtime jar exists in this sandbox (SURVEY.md §0), so this
module is import-gated and exercised only for its SQL generation; on a
cluster with ``iceberg-spark-runtime`` and a configured catalog it is the
drop-in replacement for the local snapshot-log backend — same semantics
the local backend reproduces (atomic snapshot CAS, epoch fencing via a
committed-epochs table, bucketed layout).

Usage sketch (cluster):

    spark = build_session(extra_conf={
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "glue",   # or hive/rest/hadoop
    })
    be = IcebergBackend(spark, "lake.cdc.repo_files")
    be.create(REPO_FILES_SCHEMA, key_cols=("repo", "path"),
              order_col="last_event_seq", num_buckets=64)
    be.merge(prepared_batch, epoch_id=epoch)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from rocket_etl_spark.schema.registry import TableSchema


def epoch_fence_sql(table: str, epoch_id: int) -> tuple[str, str]:
    """The two bounded fence probes replacing a full epochs-table collect.

    * high-watermark probe: ``max(epoch_id)`` — Iceberg answers this from
      manifest column stats (no data files read); any epoch above it is
      trivially uncommitted, which is the common case for an in-order
      streaming source.
    * point probe (only when ``epoch_id <= hwm``): an equality predicate
      Iceberg prunes to the files whose min/max stats straddle the value,
      LIMIT 1 — at most one row ever reaches the driver.

    Together the per-merge fence cost is O(1) rows to the driver instead
    of O(total epochs): at 10^5 streaming epochs the previous
    collect-the-table design was an unbounded driver collect + full scan
    per micro-batch (the local backend's ``{hwm, above}`` fence,
    lake/table.py, is the same idea held in the snapshot itself)."""
    return (
        f"SELECT max(epoch_id) AS hwm FROM {table}_epochs",
        f"SELECT 1 AS hit FROM {table}_epochs WHERE epoch_id = {int(epoch_id)} LIMIT 1",
    )


def merge_sql(
    table: str,
    view: str,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> str:
    """The MERGE INTO statement realizing the engine's LWW contract —
    identical arms to lake/merge.py's DataFrame plan."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in value_cols)
    ins_cols = ", ".join([*key_cols, *value_cols])
    ins_vals = ", ".join(f"s.{c}" for c in [*key_cols, *value_cols])
    return (
        f"MERGE INTO {table} t USING {view} s ON {on} "
        f"WHEN MATCHED AND s.op = 'delete' AND s.{order_col} > t.{order_col} THEN DELETE "
        f"WHEN MATCHED AND s.op <> 'delete' AND s.{order_col} > t.{order_col} "
        f"THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


KEYS_PROP = "rocket_etl.key_cols"
ORDER_PROP = "rocket_etl.order_col"


def create_table_sql(
    table: str,
    cols_ddl: str,
    key_cols: Sequence[str],
    order_col: str,
    num_buckets: int = 64,
) -> str:
    """CREATE TABLE statement with the MERGE metadata persisted as table
    properties — the attach-to-existing path (``IcebergBackend`` built
    against a table created by an earlier job/process) reads key/order
    back from these instead of requiring ``create()`` in-process."""
    return (
        f"CREATE TABLE {table} ({cols_ddl}) USING iceberg "
        f"PARTITIONED BY (bucket({num_buckets}, {key_cols[0]})) "
        f"TBLPROPERTIES ('{KEYS_PROP}'='{','.join(key_cols)}', "
        f"'{ORDER_PROP}'='{order_col}')"
    )


class IcebergBackend:
    """Same contract as (LakeTable, merge_batch) over a real Iceberg catalog.

    Epoch fencing: Iceberg's atomic snapshot commit covers the MERGE; the
    fence itself lives in a one-column ``<table>_epochs`` Iceberg table
    appended in the same Spark job — a replayed epoch is detected before
    the MERGE runs.  (Iceberg's WAP/branch commits could carry both in one
    snapshot; kept simple here.)

    NOTE: physical deletes (no tombstones) — convergence under arbitrary
    cross-epoch reordering relies on the source replaying in WAL order per
    key, which Structured Streaming file/Kafka sources guarantee per
    partition.  The local backend is stricter (tombstones).
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key_cols: Sequence[str] | None = None,
        order_col: str | None = None,
    ):
        """Attach to ``table``.  MERGE metadata (key columns, ordering
        column) comes from, in precedence order: the ctor args, a prior
        ``create()`` in this process, or the table's persisted
        ``rocket_etl.*`` TBLPROPERTIES (the normal production case:
        attaching to a table some earlier job created)."""
        self.spark = spark
        self.table = table
        self._keys: list[str] | None = list(key_cols) if key_cols else None
        self._order: str | None = order_col
        self._probe()

    def _probe(self) -> None:
        try:
            self.spark.conf.get("spark.sql.catalog." + self.table.split(".")[0])
        except Exception as e:  # pragma: no cover - needs a real catalog
            raise NotImplementedError(
                f"no Iceberg catalog configured for {self.table!r}; this backend "
                "requires iceberg-spark-runtime on the cluster (absent in this "
                "sandbox — use the local lake backend)"
            ) from e

    def _resolve_meta(self) -> None:
        """Load key/order from the table's TBLPROPERTIES when neither the
        ctor nor a prior in-process ``create()`` supplied them."""
        if self._keys is not None and self._order is not None:
            return
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        props = {r["key"]: r["value"] for r in rows}
        if KEYS_PROP not in props or ORDER_PROP not in props:
            raise ValueError(
                f"{self.table} carries no {KEYS_PROP}/{ORDER_PROP} table "
                "properties (created outside this engine?) — pass "
                "key_cols=/order_col= to IcebergBackend(...)"
            )
        if self._keys is None:
            self._keys = props[KEYS_PROP].split(",")
        if self._order is None:
            self._order = props[ORDER_PROP]

    # pragma: no cover start - cluster-only paths
    def create(self, schema: TableSchema, key_cols, order_col, num_buckets=64) -> None:
        cols = ", ".join(f"{f.name} {f.dtype}" for f in schema.fields)
        self.spark.sql(create_table_sql(self.table, cols, key_cols, order_col, num_buckets))
        self.spark.sql(f"CREATE TABLE {self.table}_epochs (epoch_id BIGINT) USING iceberg")
        self._keys, self._order = list(key_cols), order_col

    def is_epoch_committed(self, epoch_id: int) -> bool:
        """Bounded fence check — see ``epoch_fence_sql``.  Never collects
        the epochs table (O(1) rows to the driver per merge)."""
        hwm_sql, point_sql = epoch_fence_sql(self.table, epoch_id)
        row = self.spark.sql(hwm_sql).first()
        if row is None or row["hwm"] is None or epoch_id > row["hwm"]:
            return False
        return self.spark.sql(point_sql).first() is not None

    def merge(self, batch: DataFrame, epoch_id: int | None = None):
        self._resolve_meta()
        if epoch_id is not None and self.is_epoch_committed(epoch_id):
            return None
        view = f"_merge_src_{abs(hash((self.table, epoch_id))) % 10**8}"
        batch.createOrReplaceTempView(view)
        value_cols = [c for c in batch.columns if c not in (*self._keys, "op")]
        self.spark.sql(merge_sql(self.table, view, self._keys, self._order, value_cols))
        if epoch_id is not None:
            self.spark.sql(f"INSERT INTO {self.table}_epochs VALUES ({epoch_id})")
    # pragma: no cover end
