from cdc_platform_spark.plans.compiler import compile_pipeline  # noqa: F401
from cdc_platform_spark.plans.explain import explain_text, plan_contains  # noqa: F401
