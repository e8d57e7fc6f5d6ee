from cdc_platform_spark.lakehouse.table import VersionedTable  # noqa: F401
