"""Operator/query registry.

Every operator the engine implements registers itself here as an
``EngineQuery``: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same
result with the same column names.  The driver's correctness gate runs
both and hash-compares; `__spark_entry__.py` simply re-exports this
registry.

Determinism rules (FIXTURES.md §5):
- exact arithmetic (DECIMAL/INTEGER) internally; DOUBLE only produced
  by a final deterministic cast from an exact value,
- every result carries a total ORDER BY when LIMIT is involved,
- approx operators (HLL etc.) are registered without an oracle (the
  driver then applies its weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class EngineQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL producing the same named columns, or None
    category: str
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str, *, oracle: str | None, category: str, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = EngineQuery(name=name, builder=fn, oracle=oracle, category=category, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, EngineQuery]:
    """Import every operator module (side effect: fills REGISTRY)."""
    from cdc_platform_spark.operators import (  # noqa: F401
        cdc,
        curation,
        dedup,
        multimodal,
        relational,
        relational_ext,
        similarity,
        streaming_queries,
        text,
        tpch_like,
        windows,
    )

    return REGISTRY
