"""Pluggable table-format seam for the lakehouse surface (ref K3/L1-L6).

The reference sinks to Iceberg through PyIceberg (reference
sinks/iceberg.py:16-277); this engine reproduces the table semantics on
a parquet+JSON snapshot store so everything is testable in-container.
``TableFormat`` pins the contract both share, so a deployment can swap
the backend without touching sinks, maintenance jobs, or the CLI:

- :class:`cdc_platform_spark.lakehouse.table.VersionedTable` — the
  parquet backend (default; fully implemented and tested here).
- :class:`cdc_platform_spark.lakehouse.iceberg.IcebergTable` — the
  same contract expressed as Iceberg catalog operations; requires a
  Spark runtime with the Iceberg connector (not in this container, so
  construction is gated with a clear error).

``open_table`` is the single construction point: URIs like
``iceberg://<catalog>.<namespace>.<table>`` select the Iceberg backend,
anything else is a parquet-backed table root.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class TableFormat(ABC):
    """The lakehouse table contract every backend provides.

    Write paths commit atomically and return a snapshot id; read paths
    accept an optional snapshot id for time travel; maintenance mirrors
    Iceberg's built-ins (expire_snapshots / rewrite_data_files).
    """

    # --- write ---------------------------------------------------------
    @abstractmethod
    def append(self, df: DataFrame, partition_by: str | None = None) -> str: ...

    @abstractmethod
    def overwrite(self, df: DataFrame) -> str: ...

    # --- read ----------------------------------------------------------
    @abstractmethod
    def read(self, snapshot_id: str | None = None) -> DataFrame: ...

    @abstractmethod
    def read_where(
        self, column: str, op: str, value, snapshot_id: str | None = None
    ) -> DataFrame: ...

    # --- metadata ------------------------------------------------------
    @abstractmethod
    def snapshots(self) -> list[dict]: ...

    @abstractmethod
    def current_snapshot_id(self) -> str | None: ...

    @abstractmethod
    def snapshots_df(self) -> DataFrame: ...

    # --- maintenance ---------------------------------------------------
    @abstractmethod
    def rollback(self, snapshot_id: str) -> None: ...

    @abstractmethod
    def expire_snapshots(self, older_than_ms: int) -> int: ...

    @abstractmethod
    def compact(self, max_files: int = 4) -> str | None: ...


def open_table(spark: SparkSession, uri: str) -> TableFormat:
    """Open (or create) a lakehouse table behind the right backend.

    ``iceberg://catalog.namespace.table`` -> IcebergTable (needs the
    Iceberg connector on the Spark classpath); any other string is a
    filesystem root for the parquet-backed VersionedTable.
    """
    if uri.startswith("iceberg://"):
        from cdc_platform_spark.lakehouse.iceberg import IcebergTable

        return IcebergTable(spark, uri.removeprefix("iceberg://"))
    from cdc_platform_spark.lakehouse.table import VersionedTable

    return VersionedTable(spark, uri)
