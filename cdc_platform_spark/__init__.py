"""cdc_platform_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference CDC streaming platform
(Baselyne-Systems/cdc-platform, surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark engine:

- CDC envelope streams modeled as (Structured Streaming) DataFrames
  instead of asyncio per-partition queues (reference
  pipeline/runner.py:128-162).
- Materialization (append / latest-per-key upsert / DLQ quarantine)
  expressed declaratively and executed by Catalyst/Tungsten instead of
  hand-built sink buffers (reference sinks/iceberg.py:124-197).
- A full relational query surface (scan/filter/join/agg/window/setop)
  over the materialized tables — the reference has no SQL executor at
  all; here it is Spark SQL, verified query-by-query against a DuckDB
  oracle.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) built on the same engine.

Everything here is public-API Spark; no proprietary dependencies.
"""

__version__ = "0.1.0"

from cdc_platform_spark.session import get_spark  # noqa: F401
