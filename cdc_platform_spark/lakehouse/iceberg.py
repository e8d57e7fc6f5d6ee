"""Iceberg backend for the TableFormat seam (ref sinks/iceberg.py:16-277).

Maps every contract operation to the Iceberg SQL surface a real Spark
deployment exposes (`VERSION AS OF`, the `.snapshots` metadata table,
`CALL <catalog>.system.rollback_to_snapshot / expire_snapshots /
rewrite_data_files`).  The reference performs the same operations
through PyIceberg (auto-create + upsert, sinks/iceberg.py:151-197;
expiry/compaction, lakehouse/maintenance.py:106-244).

This container has no Iceberg connector jar or catalog, so construction
is gated: ``IcebergTable`` raises with a clear message unless the Spark
session has an Iceberg catalog configured.  The class still documents
the exact calls, so swapping backends outside the container is a
one-line ``open_table("iceberg://...")`` change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_platform_spark.lakehouse.format import TableFormat


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


# Runtime jar coordinates. The artifact name tracks the SPARK minor the
# cluster runs — Iceberg 1.10 publishes runtimes for Spark 3.4/3.5/4.0
# (iceberg-spark-runtime-<spark>_<scala>); pin the newest PUBLISHED one
# and bump when the matching artifact for a newer Spark minor lands
# (there is no 4.1 artifact at 1.10.0). A 3.5 cluster uses
# iceberg-spark-runtime-3.5_2.12 with the same session config.
ICEBERG_RUNTIME_COORDS = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_session_config(
    catalog: str = "lake",
    warehouse: str = "s3://BUCKET/warehouse",
    catalog_type: str = "rest",
    uri: str | None = None,
) -> dict[str, str]:
    """The exact session config that flips ``open_table("iceberg://...")``
    live on a real cluster — apply each key via
    ``SparkSession.builder.config`` (or spark-defaults.conf) before the
    session starts, then ``open_table(spark, f"iceberg://{catalog}.db.tbl")``
    dispatches to :class:`IcebergTable` and every ``TableFormat`` contract
    test in tests/test_lakehouse.py runs unchanged against the catalog.

    ``catalog_type``: ``rest`` (uri required), ``glue``, ``hive``
    (uri = metastore thrift), or ``hadoop`` (warehouse = filesystem path,
    no uri) — the standard SparkCatalog types.
    """
    cfg = {
        "spark.jars.packages": ICEBERG_RUNTIME_COORDS,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
    if uri is not None:
        cfg[f"spark.sql.catalog.{catalog}.uri"] = uri
    return cfg


class IcebergTable(TableFormat):
    """TableFormat over an Iceberg catalog table ``catalog.namespace.table``."""

    def __init__(self, spark: SparkSession, identifier: str) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg backend requires the iceberg-spark-runtime jar and a "
                "configured catalog (spark.sql.catalog.<name>=org.apache.iceberg."
                "spark.SparkCatalog); not available in this environment — use the "
                "parquet-backed VersionedTable instead"
            )
        self.spark = spark
        self.identifier = identifier
        self.catalog = identifier.split(".", 1)[0]

    def _table_exists(self) -> bool:
        return bool(self.spark.catalog.tableExists(self.identifier))

    # --- write ---------------------------------------------------------
    def append(self, df: DataFrame, partition_by: str | None = None) -> str:
        writer = df.writeTo(self.identifier)
        if partition_by is not None:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(F.col(partition_by))
        # existence check must NOT read the .snapshots metadata table — that
        # raises for a not-yet-created table, which is exactly the auto-create
        # case (ref sinks/iceberg.py:151-197 create-on-first-write)
        if self._table_exists():
            writer.append()
        else:
            writer.create()
        return str(self.current_snapshot_id())

    def overwrite(self, df: DataFrame) -> str:
        df.writeTo(self.identifier).createOrReplace()
        return str(self.current_snapshot_id())

    # --- read ----------------------------------------------------------
    def read(self, snapshot_id: str | None = None) -> DataFrame:
        reader = self.spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.table(self.identifier)

    def read_where(self, column: str, op: str, value, snapshot_id: str | None = None) -> DataFrame:
        # Iceberg does manifest min/max pruning natively; a plain filter is
        # the whole implementation (the VersionedTable stats pruning emulates
        # exactly this).  Column/literal API, not repr-into-SQL: Python repr
        # is not SQL (quotes, datetimes) and invites expression injection.
        from pyspark.sql import functions as F

        col = F.col(column)
        residual = {
            "=": col == F.lit(value),
            ">": col > F.lit(value),
            ">=": col >= F.lit(value),
            "<": col < F.lit(value),
            "<=": col <= F.lit(value),
        }[op]
        return self.read(snapshot_id).filter(residual)

    # --- metadata ------------------------------------------------------
    def snapshots(self) -> list[dict]:
        return [r.asDict() for r in self.snapshots_df().collect()]

    def snapshots_df(self) -> DataFrame:
        return self.spark.read.table(f"{self.identifier}.snapshots")

    def current_snapshot_id(self) -> str | None:
        # The .history metadata table tracks which snapshot is CURRENT: after
        # rollback_to_snapshot, .snapshots still lists the newer (now
        # non-current) snapshots, so ordering .snapshots by committed_at
        # would return the wrong id and break the TableFormat contract.
        rows = (
            self.spark.read.table(f"{self.identifier}.history")
            .orderBy("made_current_at", ascending=False)
            .limit(1)
            .collect()
        )
        return str(rows[0]["snapshot_id"]) if rows else None

    # --- maintenance ---------------------------------------------------
    def rollback(self, snapshot_id: str) -> None:
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot('{self.identifier}', {snapshot_id})"
        )

    def expire_snapshots(self, older_than_ms: int) -> int:
        # The procedure's output row is file counts (deleted_data_files_count,
        # ...), NOT an expired-snapshot count — the TableFormat contract
        # promises the latter, so measure the snapshot set around the call.
        before = self.spark.read.table(f"{self.identifier}.snapshots").count()
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots(table => '{self.identifier}', "
            f"older_than => TIMESTAMP_MILLIS({older_than_ms}))"
        ).collect()
        after = self.spark.read.table(f"{self.identifier}.snapshots").count()
        return int(before - after)

    def compact(self, max_files: int = 4) -> str | None:
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files(table => '{self.identifier}')"
        )
        return self.current_snapshot_id()
