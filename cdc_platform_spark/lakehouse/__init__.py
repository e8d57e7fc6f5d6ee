from cdc_platform_spark.lakehouse.format import TableFormat, open_table  # noqa: F401
from cdc_platform_spark.lakehouse.table import VersionedTable  # noqa: F401
