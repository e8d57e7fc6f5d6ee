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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, SF_SMOKE).toPandas()
    oracle_pdf = duck.sql(q.oracle).df()
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_SMOKE)
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
