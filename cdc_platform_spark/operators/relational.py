"""Relational query surface (SURVEY.md §2B Q01-Q25).

The reference platform has no SQL executor at all — its query surface
is full scans / snapshot scans / limits (reference
lakehouse/time_travel.py:25-31, cli.py:294-325) plus the latest-per-key
materialization implied by upsert sinks.  This module supplies the full
relational surface on Spark, declared query-by-query with a DuckDB
oracle for the driver's hash-match gate.

Scale notes (100 TB design point):
- Only FIXED-SIZE dimensions (region, nation, supplier) carry explicit
  ``broadcast()`` hints. Tables that scale with the data volume
  (customer, part, derived per-key aggregates) are left to AQE's
  statistics-based planning: at test scale they auto-broadcast under
  the threshold; at 100 TB they correctly become shuffle joins.
- Fact-fact joins shuffle on their keys and rely on AQE for skew.
- Every aggregation is expressed so map-side partial aggregation
  applies (plain groupBy/agg over built-in functions).
- Filters/projections stay declarative so they reach the parquet scan
  (PushedFilters / ReadSchema in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import (
    MONEY,
    fp_hundredths,
    ORACLE_REVENUE,
    davg,
    dsum,
    money,
    oracle_davg,
    oracle_dsum,
    revenue,
    revenue_fp4,
    sum_scaled_long,
)
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table


def _t(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Q01 scan / projection / limit
# ---------------------------------------------------------------------------
@register(
    "q01_scan_project",
    category="scan",
    doc="Column-pruned scan with deterministic ORDER BY + LIMIT (ref lakehouse/time_travel.py:29-31).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        LIMIT 200
    """,
)
def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Q02 filters
# ---------------------------------------------------------------------------
@register(
    "q02_filter_predicates",
    category="filter",
    doc="Conjunctive/disjunctive predicates + IN-list (ref table include-lists, sources/debezium/config.py:53).",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderstatus IN ('O', 'P') AND o_totalprice > 100000.0)
           OR (o_orderstatus = 'F' AND o_totalprice < 50000.0)
        ORDER BY o_orderkey
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    return (
        o.filter(
            (F.col("o_orderstatus").isin("O", "P") & (F.col("o_totalprice") > 100000.0))
            | ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000.0))
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q03_null_semantics",
    category="filter",
    doc="IS NULL / COALESCE / NULLIF handling (ref pgoutput 'n'/'u' -> None, sources/wal/decoder.py:216-221).",
    oracle="""
        SELECT COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
               COUNT(*) AS n,
               CAST(COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 END) AS BIGINT) AS n_null
        FROM orders
        GROUP BY status_norm
        ORDER BY status_norm
    """,
)
def q03_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    masked = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(F.coalesce(masked, F.lit("PENDING")).alias("status_norm"), masked.alias("m"))
        .groupBy("status_norm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("m").isNull(), 1)).alias("n_null"),
        )
        .orderBy("status_norm")
    )


# ---------------------------------------------------------------------------
# Q04-Q09 joins
# ---------------------------------------------------------------------------
@register(
    "q04_join_inner_broadcast",
    category="join",
    doc="Equi inner join, dimension side broadcast (keyed lookup analogue of ref decoder relation cache J3).",
    oracle="""
        SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey
    """,
)
def q04_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q05_join_multiway",
    category="join",
    doc="5-way star join, revenue per (region, nation) — TPC-H Q5 shape; dims broadcast, fact join shuffles.",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        ORDER BY r.r_name, n.n_name
    """,
)
def q05_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    n = _t(spark, "nation", sf_dir)
    r = _t(spark, "region", sf_dir)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # exact revenue sum on the primitive-fp path (r14: same value
            # as SUM(revenue())::DOUBLE, see functions.sum_scaled_long)
            sum_scaled_long(revenue_fp4(), 10000, "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "q06_join_left_outer",
    category="join",
    doc="LEFT join null-extension: per-customer order counts including zero-order customers.",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
        ORDER BY c.c_custkey
    """,
)
def q06_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(fp_hundredths("o_totalprice").cast("decimal(18,0)")) / 100, F.lit(0)
            ).cast("double").alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q06_join_full_outer",
    category="join",
    doc="FULL OUTER join with nulls on both sides (BUILDING-segment customers vs high-value order counts).",
    oracle="""
        WITH big AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 150000.0 GROUP BY o_custkey
        ),
        seg AS (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING')
        SELECT COALESCE(seg.c_custkey, big.o_custkey) AS custkey,
               CAST(CASE WHEN seg.c_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_segment,
               CAST(COALESCE(big.n_big, 0) AS BIGINT) AS n_big
        FROM seg FULL OUTER JOIN big ON seg.c_custkey = big.o_custkey
        ORDER BY custkey
    """,
)
def q06_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    big = (
        o.filter(F.col("o_totalprice") > 150000.0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    return (
        seg.join(big, seg.c_custkey == big.o_custkey, "full_outer")
        .select(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
            F.when(F.col("c_custkey").isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long").alias("in_segment"),
            F.coalesce(F.col("n_big"), F.lit(0)).cast("long").alias("n_big"),
        )
        .orderBy("custkey")
    )


@register(
    "q07_join_semi",
    category="join",
    doc="LEFT SEMI (EXISTS): customers holding at least one open order.",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        ORDER BY c_custkey
    """,
)
def q07_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q07_join_anti",
    category="join",
    doc="LEFT ANTI (NOT EXISTS): customers with no open order.",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        ORDER BY c_custkey
    """,
)
def q07_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q08_join_range",
    category="join",
    doc="Equi join with residual range predicate (quantity within +/-2 of part size).",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size, l.l_quantity
        FROM lineitem l JOIN part p
          ON l.l_partkey = p.p_partkey
         AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
        ORDER BY l.l_orderkey, l.l_linenumber, p.p_partkey, l.l_quantity
    """,
)
def q08_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    p = _t(spark, "part", sf_dir)
    return (
        l.join(
            p,
            (l.l_partkey == p.p_partkey)
            & (l.l_quantity >= p.p_size - 2)
            & (l.l_quantity <= p.p_size + 2),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")
        # (l_orderkey, l_linenumber) is NOT unique in the fixtures (dedup
        # bait); tied rows differ in payload, so the full column set keys
        # the deterministic order (FIXTURES.md §5 contract)
        .orderBy("l_orderkey", "l_linenumber", "p_partkey", "l_quantity")
    )


@register(
    "q09_asof_join",
    category="join",
    doc=(
        "AS-OF join: for each purchase, the latest prior click by the same user "
        "(ref W2 latest-per-key, sinks/iceberg.py:187-197). Spark has no native ASOF; "
        "expressed as last-ignorenulls over an ordered union — one shuffle on user_id."
    ),
    oracle="""
        WITH p AS (SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts_ns
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts_ns
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id AS purchase_id, p.user_id,
               c.event_id AS last_click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_ns > c.ts_ns
        ORDER BY purchase_id
    """,
)
def q09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir).filter(F.col("event_type").isin("purchase", "click"))
    # equal-ts ordering: purchases sort BEFORE clicks at the same ts_ns, so
    # an equal-ts click never lands in the purchase's preceding frame — the
    # oracle's ASOF condition is STRICT (p.ts_ns > c.ts_ns)
    type_rank = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ns"), type_rank, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        e.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", "last_click_id")
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# Q10-Q13 aggregation
# ---------------------------------------------------------------------------
@register(
    "q10_agg_pricing_summary",
    category="aggregate",
    doc=(
        "TPC-H Q1-shaped hash aggregate (grouped SUM/AVG/COUNT) — the grouped-MIN/MAX "
        "watermark math of the reference generalized (pipeline/runner.py:366-369). "
        "Exact decimal internally; doubles only via deterministic final casts."
    ),
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {oracle_dsum('l_quantity')} AS sum_qty,
               {oracle_dsum('l_extendedprice')} AS sum_base_price,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST({ORACLE_REVENUE} AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               {oracle_davg('l_quantity')} AS avg_qty,
               {oracle_davg('l_extendedprice')} AS avg_price,
               {oracle_davg('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q10_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-decimal revenue/charge, computed in integer hundredths: the
    # direct decimal(18,2) x decimal(18,2) products force the non-compact
    # (BigDecimal) per-row path (precision 37/38), which cost q10 ~20%
    # between r02 and r04.  price*(1-d) == price_fp*(100-d_fp)/10^4 and
    # charge == rev_fp4*(100+t_fp)/10^6 exactly, with the per-row products
    # in plain LONG arithmetic (max ~2e15 per row, no overflow), the fp
    # conversion itself primitive (functions.fp_hundredths — no per-row
    # BigDecimal), and the SUM accumulators on the compact-decimal fast
    # path via the hi/lo split (functions.sum_scaled_long — exact, 2.2x
    # cheaper than the decimal(38,0) accumulator this used through r13).
    # Measured r14 (sf0.1, single-row-group scan task): 1.58 -> 0.89 s
    # with NO added exchange — a round-robin spread() was also tried and
    # lost once the per-row work went primitive (1.08 s).
    l = _t(spark, "lineitem", sf_dir)
    rev_fp4 = revenue_fp4()
    charge_fp6 = rev_fp4 * (F.lit(100).cast("long") + fp_hundredths("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            sum_scaled_long(rev_fp4, 10000, "sum_disc_price"),
            sum_scaled_long(charge_fp6, 1000000, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q11_distinct",
    category="aggregate",
    doc="COUNT(DISTINCT) + multi-distinct per group (ref idempotency dedup J4).",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q12_approx_distinct",
    category="aggregate",
    doc="approx_count_distinct (HLL++). Excluded from hash gate (FIXTURES.md §5) — rows-only check.",
    oracle=None,
)
def q12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
        .orderBy("l_returnflag")
    )


@register(
    "q13_rollup",
    category="aggregate",
    doc="ROLLUP (region, order-year) with grouping() disambiguation of subtotal rows.",
    oracle=f"""
        SELECT r.r_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS revenue,
               CAST(GROUPING(r.r_name) * 2 + GROUPING(EXTRACT(year FROM o.o_orderdate)) AS BIGINT) AS gid
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, EXTRACT(year FROM o.o_orderdate))
        ORDER BY gid, r_name NULLS FIRST, o_year NULLS FIRST
    """,
)
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    n = _t(spark, "nation", sf_dir)
    r = _t(spark, "region", sf_dir)
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", F.year("o_orderdate").cast("long").alias("o_year"), revenue_fp4().alias("rev4"))
    )
    return (
        joined.rollup("r_name", "o_year")
        .agg(
            sum_scaled_long(F.col("rev4"), 10000, "revenue"),
            (F.grouping("r_name") * 2 + F.grouping("o_year")).cast("long").alias("gid"),
        )
        .orderBy(F.col("gid"), F.col("r_name").asc_nulls_first(), F.col("o_year").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Q14-Q17 window functions / top-k
# ---------------------------------------------------------------------------
@register(
    "q14_window_ranking",
    category="window",
    doc="row_number / rank / dense_rank per nation by balance (ref W2 latest-per-key generalized).",
    oracle="""
        SELECT c_custkey, c_nationkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
               CAST(RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
        FROM customer
        ORDER BY c_nationkey, rn
    """,
)
def q14_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    w_rn = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_rk = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w_rn).cast("long").alias("rn"),
            F.rank().over(w_rk).cast("long").alias("rnk"),
            F.dense_rank().over(w_rk).cast("long").alias("drnk"),
        )
        .orderBy("c_nationkey", "rn")
    )


@register(
    "q15_window_analytic",
    category="window",
    doc="lag/lead + running sum per customer ordered by (orderdate, orderkey) — ref A1 running-min analogue.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               LAG(o_totalprice)  OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q15_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.sum(money("o_totalprice")).over(wsum).cast("double").alias("running_spend"),
        )
        # same sort as the oracle (o_orderdate before o_orderkey): the two
        # engines must emit rows in the SAME order, not merely the same set
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "q16_window_frames",
    category="window",
    doc="Explicit frames: 3-row moving average (ROWS) and quantity-band count (RANGE) — ref A3 batching windows.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_extendedprice
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                    / COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_extendedprice
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mavg3,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_band_n
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, mavg3, qty_band_n
    """,
)
def q16_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    # lineitem (l_orderkey, l_linenumber) is NOT unique in the fixtures; the
    # extra l_extendedprice order key makes tied positions value-identical so
    # the ROWS frame sum is deterministic on both engines.
    wrows = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-2, Window.currentRow)
    )
    # RANGE frames are VALUE-defined: every row with the same (returnflag,
    # quantity) shares one frame, so the band count lives on the tiny
    # distinct-value grid (3 flags x 50 quantities), not the fact table. A
    # naive Window.partitionBy("l_returnflag") caps parallelism at 3 tasks
    # over the whole table; this computes a map-side partial count, windows
    # the 150-row grid, and broadcast-joins the result back.
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(-2, Window.currentRow)
    band = (
        l.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("qn"))
        .withColumn("qty_band_n", F.sum("qn").over(wq).cast("long"))
        .drop("qn")
    )
    from cdc_platform_spark.functions import sorted_view

    return sorted_view(
        l.join(F.broadcast(band), ["l_returnflag", "l_quantity"])
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.sum(money("l_extendedprice")).over(wrows).cast("double") / F.count(F.lit(1)).over(wrows))
            .cast("double")
            .alias("mavg3"),
            "qty_band_n",
        ),
        # (l_orderkey, l_linenumber) is not unique; the derived columns
        # break the remaining ties so row ORDER is engine-independent
        "l_orderkey", "l_linenumber", "mavg3", "qty_band_n",
    )


@register(
    "q17_topk_global",
    category="sort",
    doc="Global multi-column ORDER BY + LIMIT (TakeOrderedAndProject — no full sort at scale).",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
    """,
)
def q17_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, "orders", sf_dir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q17_topk_per_group",
    category="sort",
    doc="Per-group top-k via ranking window filter (top-3 orders per customer).",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
)
def q17_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    from cdc_platform_spark.functions import sorted_view

    return sorted_view(
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3),
        "o_custkey", "rn",
    )


# ---------------------------------------------------------------------------
# Q18 set operations
# ---------------------------------------------------------------------------
@register(
    "q18_setops",
    category="setop",
    doc="INTERSECT / EXCEPT / UNION over projected key sets (ref F1 fan-out is union-shaped).",
    oracle="""
        WITH open_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
             done_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        SELECT 'both' AS tag, k FROM (SELECT k FROM open_c INTERSECT SELECT k FROM done_c)
        UNION ALL
        SELECT 'open_only' AS tag, k FROM (SELECT k FROM open_c EXCEPT SELECT k FROM done_c)
        UNION ALL
        SELECT 'either' AS tag, k FROM (SELECT k FROM open_c UNION SELECT k FROM done_c)
        ORDER BY tag, k
    """,
)
def q18_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    done_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    both = open_c.intersect(done_c).select(F.lit("both").alias("tag"), "k")
    only = open_c.exceptAll(done_c).select(F.lit("open_only").alias("tag"), "k")
    either = open_c.union(done_c).distinct().select(F.lit("either").alias("tag"), "k")
    return both.unionAll(only).unionAll(either).orderBy("tag", "k")


# ---------------------------------------------------------------------------
# Q19-Q25 scalar function families
# ---------------------------------------------------------------------------
@register(
    "q19_string_funcs",
    category="functions",
    doc="String function family (ref topic naming streaming/topics.py:21-28, pubsub naming replace).",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               SUBSTR(p_name, 1, 5) AS name_pfx,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               CONCAT(p_brand, '|', p_type) AS brand_type,
               REPLACE(p_type, ' ', '-') AS type_dashed,
               CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a,
               REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS type_word,
               TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim
        FROM part
        ORDER BY p_partkey
    """,
)
def q19_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, "part", sf_dir)
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 5).alias("name_pfx"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace("p_type", " ", "-").alias("type_dashed"),
            F.when(F.col("p_name").like("%a%"), 1).otherwise(0).cast("long").alias("has_a"),
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
            F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q20_datetime_funcs",
    category="functions",
    doc="Date/time family — epoch-integer outputs for cross-engine hash stability (ref decoder epoch math).",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(year  FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
               CAST(EXTRACT(day   FROM o_orderdate) AS BIGINT) AS o_day,
               CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_epoch,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
        FROM orders
        ORDER BY o_orderkey
    """,
)
def q20_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
            F.unix_timestamp(F.date_trunc("day", F.col("o_orderdate"))).cast("long").alias("day_epoch"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q21_math_funcs",
    category="functions",
    doc="Math family incl. pmod — ref virtual-partition md5 % 16 (sources/pubsub/source.py:169-174).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS discount_amt,
               ABS(l_quantity - 25.0) AS qty_dev,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
               POW(2.0, l_linenumber) AS pow2
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, discount_amt, qty_dev
    """,
)
def q21_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.round(money("l_extendedprice") * money("l_discount"), 2).cast("double").alias("discount_amt"),
            F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
            F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2"),
        )
        # non-unique (l_orderkey, l_linenumber): derived columns break ties
        .orderBy("l_orderkey", "l_linenumber", "discount_amt", "qty_dev")
    )


@register(
    "q22_hash_funcs",
    category="functions",
    doc="Cryptographic hash family (ref md5 partition hash, sources/pubsub/source.py:173).",
    oracle="""
        SELECT c_custkey,
               MD5(CONCAT(c_name, '|', CAST(c_custkey AS VARCHAR))) AS key_md5,
               SHA256(c_name) AS name_sha256,
               CAST(CAST(CONCAT('0x', SUBSTR(MD5(c_name), 1, 15)) AS BIGINT) % 16 AS BIGINT) AS vpart
        FROM customer
        ORDER BY c_custkey
    """,
)
def q22_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.operators.dedup import md5_60bit

    c = _t(spark, "customer", sf_dir)
    return (
        c.select(
            "c_custkey",
            F.md5(F.concat(F.col("c_name"), F.lit("|"), F.col("c_custkey").cast("string"))).alias("key_md5"),
            F.sha2(F.col("c_name"), 256).alias("name_sha256"),
            F.pmod(md5_60bit(F.col("c_name")), F.lit(16)).cast("long").alias("vpart"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q23_array_funcs",
    category="functions",
    doc="Array family over tokenized documents (ref batching buffers are array-shaped).",
    oracle="""
        SELECT doc_id,
               CAST(LENGTH(STR_SPLIT(text, ' ')) AS BIGINT) AS n_words,
               CAST(LENGTH(LIST_DISTINCT(STR_SPLIT(text, ' '))) AS BIGINT) AS n_distinct,
               CAST(CASE WHEN LIST_CONTAINS(STR_SPLIT(text, ' '), 'spark') THEN 1 ELSE 0 END AS BIGINT) AS has_spark,
               ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STR_SPLIT(text, ' ')))[1:3], ',') AS first3
        FROM documents
        ORDER BY doc_id
    """,
)
def q23_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(words).cast("long").alias("n_words"),
            F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
            F.when(F.array_contains(words, "spark"), 1).otherwise(0).cast("long").alias("has_spark"),
            F.array_join(F.slice(F.sort_array(F.array_distinct(words)), 1, 3), ",").alias("first3"),
        )
        .orderBy("doc_id")
    )


@register(
    "q23_explode_wordcount",
    category="functions",
    doc="explode + re-aggregate: corpus top-20 word count (flatMap-shaped, map-side combine applies).",
    oracle="""
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT UNNEST(STR_SPLIT(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
    """,
)
def q23_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, "documents", sf_dir)
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


@register(
    "q24_map_funcs",
    category="functions",
    doc="Map family over the JSON props envelope (ref dict envelopes, sources/base.py:21-22).",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
               ARRAY_TO_STRING(json_keys(props), ',') AS prop_keys
        FROM events
        ORDER BY event_id
    """,
)
def q24_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        e.select(
            "event_id",
            F.element_at(m, "k").alias("k_val"),
            F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        )
        .orderBy("event_id")
    )


@register(
    "q25_json_funcs",
    category="functions",
    doc="JSON family: extract + struct->JSON roundtrip of a CDC-style envelope (ref sources/wal/reader.py:207-220).",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
               to_json(struct_pack(event_id := event_id, event_type := event_type)) AS envelope
        FROM events
        ORDER BY event_id
    """,
)
def q25_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir)
    return (
        e.select(
            "event_id",
            F.get_json_object(F.col("props"), "$.k").alias("k_str"),
            F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias("envelope"),
        )
        .orderBy("event_id")
    )
