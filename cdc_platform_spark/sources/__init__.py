from cdc_platform_spark.sources.registry import TABLES, load_table, load_tables, register_views  # noqa: F401
