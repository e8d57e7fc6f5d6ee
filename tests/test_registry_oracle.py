"""Tier-1 regression: every registered query hash-matches its DuckDB oracle
at sf0.001 (the fast smoke scale; the driver runs the same gate at sf0.01).

This is the engine's equivalent of the reference's golden-output operator
tests (SURVEY.md §5 tier 1, e.g. tests/unit/test_wal_decoder.py in the
reference): deterministic input -> exact expected output.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from check_correctness import compare  # noqa: E402

from cdc_platform_spark.operators import load_all  # noqa: E402

from .conftest import SF_SMOKE  # noqa: E402

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


# --- representation gate -----------------------------------------------------
# The driver's canonicalizer lexsorts and string-renders every result cell.
# Three failure classes have cost a round each (q72 r03; text_vocab_richness,
# sim_label_centroids, sim_quantize_int8 r04):
#   1. DuckDB HUGEINT aggregates -> pandas float64 -> `3549.0` vs Spark `3549`
#   2. array/struct/map-typed output columns -> unhashable list cells
#   3. DECIMAL results rendering differently across engines
# These gates fail the build on any of them before the driver ever sees it.

_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT")
_FORBIDDEN_DUCK_PREFIXES = ("STRUCT", "MAP", "LIST", "UNION", "DECIMAL")


def _assert_flat_spark_schema(name, schema):
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: output column {f.name} is {f.dataType.simpleString()} — "
            "the driver hasher cannot canonicalize nested cells; serialize "
            "with array_join/to_json before returning"
        )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_result_types_are_driver_safe(duck, name):
    rel = duck.sql(REGISTRY[name].oracle)
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        assert (
            t not in _FORBIDDEN_DUCK_TYPES
            and "[]" not in t  # DuckDB renders list types as e.g. INTEGER[]
            and not t.startswith(_FORBIDDEN_DUCK_PREFIXES)
        ), (
            f"{name}: oracle column {col} has DuckDB type {t} — pandas renders "
            "it as float/object and the driver hash diverges from Spark; CAST "
            "the expression (e.g. CAST(SUM(..) AS BIGINT), array_to_string)"
        )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_SMOKE)
    _assert_flat_spark_schema(name, df.schema)
    spark_pdf = df.toPandas()
    oracle_pdf = duck.sql(q.oracle).df()
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_SMOKE)
    _assert_flat_spark_schema(name, df.schema)
    assert df.count() >= 0
    assert df.schema.fields


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    names = {f.name for f in df.schema.fields}
    assert {"l_returnflag", "sum_qty", "count_order"} <= names
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
