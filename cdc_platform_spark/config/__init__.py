from cdc_platform_spark.config.loader import load_pipeline_config, load_platform_config  # noqa: F401
from cdc_platform_spark.config.models import (  # noqa: F401
    PipelineConfig,
    PlatformConfig,
    SinkConfig,
    SourceConfig,
)
