"""Driver-mimic correctness harness: Spark vs DuckDB oracle.

Runs every registered query's Spark builder and (when present) its
DuckDB oracle SQL on the same parquet fixtures, then compares
row-count, column-name set, and exact values (order-insensitive).
Stricter than any plausible driver hash: values must match exactly
after canonicalization (datetimes -> ns ints, exact float equality).

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame for order-insensitive exact compare."""
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]").astype("int64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            s = s.astype(str)
        elif s.dtype == object:
            s = s.map(lambda v: str(v) if v is not None else None)
        out[c] = s.reset_index(drop=True)
    res = pd.DataFrame(out)
    if len(res):
        res = res.sort_values(by=list(res.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return res


def representation_problems(side: str, df: pd.DataFrame) -> list[str]:
    """Driver-canonicalizer contract: cells must be hashable/sortable scalars.

    The driver's hasher lexsorts every column; a list/dict/ndarray cell
    crashes it (r04 `sim_quantize_int8`), so flag them here before the
    driver does. Checks every row — these frames are already materialized.
    """
    problems = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            bad = s.map(lambda v: isinstance(v, (list, dict, set, tuple, np.ndarray))).to_numpy()
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c} ({side}): unhashable cell at row {i} "
                    f"({type(s.iloc[i]).__name__}) — serialize arrays (array_join/array_to_string)"
                )
    return problems


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    problems += representation_problems("spark", spark_pdf)
    problems += representation_problems("oracle", oracle_pdf)
    if problems:
        return problems
    # Numeric-class drift: the driver renders int64 `3549` but float64 `3549.0`,
    # so equal values still hash-mismatch when one engine returns an integer
    # column and the other a float (DuckDB HUGEINT sums -> float64; r04
    # `text_vocab_richness`/`sim_label_centroids`). Flag it even though the
    # exact-value compare below would pass.
    for c in spark_pdf.columns:
        a_int = pd.api.types.is_integer_dtype(spark_pdf[c])
        b_int = pd.api.types.is_integer_dtype(oracle_pdf[c])
        a_num = a_int or pd.api.types.is_float_dtype(spark_pdf[c])
        b_num = b_int or pd.api.types.is_float_dtype(oracle_pdf[c])
        if a_num and b_num and a_int != b_int:
            problems.append(
                f"col {c}: numeric-class drift spark={spark_pdf[c].dtype} "
                f"oracle={oracle_pdf[c].dtype} — driver renders these differently "
                f"(CAST the aggregate to BIGINT / DOUBLE on both engines)"
            )
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype("float64").to_numpy()
            bvf = bv.astype("float64").to_numpy()
            eq = (avf == bvf) | (np.isnan(avf) & np.isnan(bvf))
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} mismatches; first at row {idx}: spark={avf[idx]!r} oracle={bvf[idx]!r} "
                    f"maxabsdiff={np.nanmax(np.abs(avf - bvf)):.3e}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax((~eq).to_numpy()))
                problems.append(f"col {c}: {bad} mismatches; first at row {idx}: spark={av[idx]!r} oracle={bv[idx]!r}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cdc_platform_spark.operators import load_all
    from cdc_platform_spark.session import get_spark
    from cdc_platform_spark.sources.registry import TABLES

    registry = load_all()
    names = args.names or sorted(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    failures = 0
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            spark_pdf = q.builder(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"ok    {name}: rows={len(spark_pdf)} (no oracle, rows-only) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            oracle_pdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        t_oracle = time.time() - t0
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: rows={len(spark_pdf)} [{t_spark:.1f}s spark / {t_oracle:.1f}s duck]")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"PASS  {name}: rows={len(spark_pdf)} [{t_spark:.1f}s spark / {t_oracle:.1f}s duck]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
