"""TPC-H-shaped composite queries (Q2/Q4/Q7/Q9/Q14/Q15/Q18/Q19/Q22 analogues).

The reference never joins two user tables (SURVEY.md §2A "Not present"), but
its declared query surface (§2B) requires the full relational composite
repertoire.  These queries complete the classic decision-support shapes the
earlier composites (q51 Q3, q52 Q10, q53 Q8-market-share) started, adapted
to the driver's star schema (no partsupp table: lineitem prices play the
supply-cost role).

Scale notes (100 TB): every query here is a selective-fact scan feeding
shuffle joins/aggs; dimension joins (nation/region/supplier at fixed or
slowly-growing cardinality) are broadcast, fact-fact joins (Q18's
having-join-back) reuse the same hash key so AQE coalesces the exchange.
Determinism rules per FIXTURES.md §5 (exact decimal internally, final cast
to double, total ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import (
    MONEY,
    materialize,
    ORACLE_REVENUE,
    money,
    revenue,
    revenue_fp4,
    sum_scaled_long,
    sum_scaled_long_exact,
)
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table


def _t(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "q59_min_cost_supplier",
    category="composite",
    doc=(
        "TPC-H Q2-shaped: for each small part (p_size <= 3), the supplier(s) "
        "achieving the minimum observed price — correlated-MIN subquery "
        "decorrelated to an aggregate + join-back on the equality of exact decimals."
    ),
    oracle="""
        SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, n.n_name,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS min_price
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size <= 3
          AND CAST(l.l_extendedprice AS DECIMAL(18,2)) = (
              SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
              FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
          )
        GROUP BY ALL
        ORDER BY p_partkey, s_suppkey
    """,
)
def q59_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, "part", sf_dir).filter(F.col("p_size") <= 3)
    l = _t(spark, "lineitem", sf_dir)
    s = _t(spark, "supplier", sf_dir)
    n = _t(spark, "nation", sf_dir)
    min_price = l.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min(money("l_extendedprice")).alias("min_price_dec")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(min_price, (F.col("l_partkey") == F.col("mk")) & (money("l_extendedprice") == F.col("min_price_dec")))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name", "n_name",
            F.col("min_price_dec").cast("double").alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q60_order_priority_check",
    category="composite",
    doc=(
        "TPC-H Q4-shaped: orders in 1996 with at least one line shipped after "
        "the order date, counted per priority — EXISTS with a non-equi "
        "correlated condition, planned as a left-semi hash join."
    ),
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def q60_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, "lineitem", sf_dir)
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q61_volume_shipping",
    category="composite",
    doc=(
        "TPC-H Q7-shaped: shipped revenue between (supplier nation, customer "
        "nation) pairs per year — a 5-way join with two independent dimension "
        "arms resolved by broadcast, fact shuffle only on the join keys."
    ),
    oracle=f"""
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q61_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    s = _t(spark, "supplier", sf_dir)
    n = _t(spark, "nation", sf_dir).filter(F.col("n_nationkey") < 3)
    nc = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    ns = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("ck"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("sk"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(sum_scaled_long(revenue_fp4(), 10000, "volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q62_promo_revenue",
    category="composite",
    doc=(
        "TPC-H Q14-shaped: monthly share of revenue from PROMO-type parts — "
        "conditional aggregation over a fact-dim join; the part join key is "
        "the only shuffle, the CASE folds into the aggregate map side."
    ),
    oracle=f"""
        SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS s_year,
               CAST(EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS s_month,
               CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {ORACLE_REVENUE}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS total_revenue,
               CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {ORACLE_REVENUE}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100
                   / CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS promo_pct
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY s_year, s_month
        ORDER BY s_year, s_month
    """,
)
def q62_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    p = _t(spark, "part", sf_dir)
    promo = F.when(F.col("p_type") == "PROMO", revenue_fp4()).otherwise(F.lit(0).cast("long"))
    out = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("s_year"),
            F.month("l_shipdate").cast("long").alias("s_month"),
        )
        .agg(
            sum_scaled_long(promo, 10000, "promo_revenue"),
            sum_scaled_long(revenue_fp4(), 10000, "total_revenue"),
        )
    )
    return (
        out.withColumn("promo_pct", F.col("promo_revenue") * 100 / F.col("total_revenue"))
        .orderBy("s_year", "s_month")
    )


@register(
    "q63_large_orders",
    category="composite",
    doc=(
        "TPC-H Q18-shaped: orders whose total quantity exceeds 300 with their "
        "customers — groupBy-HAVING on the fact, then join BACK to the same "
        "fact's parents; both joins hash on o_orderkey so AQE reuses the "
        "exchange."
    ),
    oracle="""
        WITH big AS (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(big.sum_qty AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders o   ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o_orderkey
    """,
)
def q63_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q64_disjunctive_predicates",
    category="composite",
    doc=(
        "TPC-H Q19-shaped: revenue under an OR-of-ANDs brand/size/quantity "
        "predicate — Catalyst extracts the common l_partkey=p_partkey "
        "conjunct so the join stays an equi hash join with a residual filter."
    ),
    oracle=f"""
        SELECT CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q64_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    p = _t(spark, "part", sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(sum_scaled_long(revenue_fp4(), 10000, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q65_top_supplier",
    category="composite",
    doc=(
        "TPC-H Q15-shaped: supplier(s) with the maximum shipped revenue in "
        "1996H1 — aggregate, then filter at the global MAX computed as a "
        "1-row aggregate broadcast back onto the per-supplier totals (the "
        "q69/q78 scalar pattern). Supplier cardinality grows with SF, so an "
        "unpartitioned window here would funnel every supplier row through "
        "one task; the broadcast-scalar join keeps the filter fully parallel. "
        "The per-supplier aggregate is localCheckpoint-shared so the fact "
        "scan runs once, matching the single-pass claim."
    ),
    oracle=f"""
        WITH rev AS (
            SELECT l.l_suppkey, SUM({ORACLE_REVENUE}) AS total_rev
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1996-07-01'
            GROUP BY l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s_suppkey
    """,
)
def q65_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    s = _t(spark, "supplier", sf_dir)
    rev = (
        l.groupBy("l_suppkey")
        .agg(sum_scaled_long_exact(revenue_fp4(), 10000).alias("total_rev_dec"))
        .transform(materialize)
    )
    mx = rev.agg(F.max("total_rev_dec").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_dec") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q66_dormant_customers",
    category="composite",
    doc=(
        "TPC-H Q22-shaped: well-funded customers with zero orders, per nation "
        "— uncorrelated scalar AVG subquery (broadcast as a 1-row join) + "
        "left-anti join against the fact."
    ),
    oracle="""
        SELECT c.c_nationkey, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                FROM customer c2 WHERE c2.c_acctbal > 0
              )
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
)
def q66_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(money("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q67_product_profit",
    category="composite",
    doc=(
        "TPC-H Q9-shaped: revenue from 'widget' parts by supplier nation and "
        "order year — LIKE-filtered dim pushdown, two broadcast arms, one "
        "fact shuffle."
    ),
    oracle=f"""
        SELECT n.n_name AS nation, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM({ORACLE_REVENUE}) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
)
def q67_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    p = _t(spark, "part", sf_dir).filter(F.col("p_name").like("%widget%"))
    s = _t(spark, "supplier", sf_dir)
    n = _t(spark, "nation", sf_dir)
    o = _t(spark, "orders", sf_dir)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(sum_scaled_long(revenue_fp4(), 10000, "profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q68_cube_grouping_id",
    category="aggregate",
    doc=(
        "CUBE with GROUPING() disambiguation: order counts/revenue over all "
        "subsets of (o_orderstatus, o_orderpriority) — the grouping-sets "
        "expansion happens map-side as a single shuffle (Expand operator)."
    ),
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, status, priority
    """,
)
def q68_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid", "n_orders", "total_price",
        )
        .orderBy("gid", "status", "priority")
    )


@register(
    "q74_shipmode_priority",
    category="composite",
    doc=(
        "TPC-H Q12-shaped: per line status within a two-year ship window, how "
        "many lines belong to critical- vs normal-priority orders — the "
        "order-lineitem join with conditional counts (fixtures carry no "
        "l_shipmode, so l_linestatus plays the mode dimension)."
    ),
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus
    """,
)
def q74_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = _t(spark, "orders", sf_dir)
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q75_customer_distribution",
    category="composite",
    doc=(
        "TPC-H Q13-shaped: distribution of customers by order count including "
        "zero-order customers — LEFT JOIN + COUNT(col) (null-skipping), then a "
        "second aggregation over the first's result (the double-grouping shape)."
    ),
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q75_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q76_small_quantity_revenue",
    category="composite",
    doc=(
        "TPC-H Q17-shaped: yearly revenue lost to small-quantity orders of one "
        "brand — the correlated per-part AVG subquery decorrelated to a "
        "grouped aggregate + join-back. The threshold compare is exact integer "
        "cross-multiplication (5*q*cnt < sum_q in centiunits), no float AVG."
    ),
    oracle="""
        WITH ql AS (
            SELECT l_partkey, l_extendedprice,
                   CAST(ROUND(l_quantity * 100) AS BIGINT) AS q100
            FROM lineitem
        ),
        stats AS (
            SELECT l_partkey, SUM(q100) AS sum_q, COUNT(*) AS cnt
            FROM ql GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM ql l
        JOIN stats s ON s.l_partkey = l.l_partkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND 5 * l.q100 * s.cnt < s.sum_q
    """,
)
def q76_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir).select(
        "l_partkey",
        "l_extendedprice",
        F.round(F.col("l_quantity") * 100).cast("long").alias("q100"),
    )
    stats = l.groupBy("l_partkey").agg(
        F.sum("q100").alias("sum_q"), F.count(F.lit(1)).alias("cnt")
    )
    p = _t(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        l.join(stats, "l_partkey")
        .join(p, l.l_partkey == F.col("p_partkey"))
        .filter(F.lit(5) * F.col("q100") * F.col("cnt") < F.col("sum_q"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q77_blamed_supplier",
    category="composite",
    doc=(
        "TPC-H Q21-shaped: per supplier, the number of finished multi-supplier "
        "orders where this supplier holds the max-(quantity, suppkey) line — "
        "the correlated EXISTS (another supplier participated) + NOT EXISTS "
        "(nobody outranks me) double-anti-join plan shape, expressed as "
        "left-semi + left-anti joins on the fact (fixtures carry no "
        "commit/receipt dates, so line quantity plays the lateness role)."
    ),
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                  AND (l3.l_quantity > l1.l_quantity
                       OR (l3.l_quantity = l1.l_quantity AND l3.l_suppkey > l1.l_suppkey))
              )
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, s.s_suppkey
    """,
)
def q77_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, "supplier", sf_dir)
    li = _t(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_quantity")
    o = _t(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = li.join(o, li.l_orderkey == o.o_orderkey).drop("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
        F.col("l_quantity").alias("r_quantity"),
    )
    # EXISTS: another supplier contributed to the same order
    semi = l1.join(
        l2,
        (l1.l_orderkey == l2.r_orderkey) & (l1.l_suppkey != l2.r_suppkey),
        "left_semi",
    )
    # NOT EXISTS: nobody outranks me on (quantity, suppkey) in that order
    anti = semi.join(
        l2,
        (semi.l_orderkey == l2.r_orderkey)
        & (semi.l_suppkey != l2.r_suppkey)
        & (
            (l2.r_quantity > semi.l_quantity)
            | ((l2.r_quantity == semi.l_quantity) & (l2.r_suppkey > semi.l_suppkey))
        ),
        "left_anti",
    )
    return (
        anti.join(s, anti.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct(F.col("l_orderkey")).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
    )


@register(
    "q78_important_parts",
    category="composite",
    doc=(
        "TPC-H Q11-shaped: revenue per part supplied out of one nation, "
        "keeping parts whose share exceeds TWICE THE MEAN share — the "
        "scalar-aggregate-threshold shape with a self-normalizing cutoff "
        "(TPC-H scales Q11's fraction by SF by hand; value*n_parts > "
        "2*total is scale-free and stays selective at any corpus size). "
        "The global (total, count) is a 1-row broadcast; the comparison is "
        "exact cross-multiplied decimals. At scale: one shuffle on "
        "l_partkey for the per-part aggregate; nation is hinted broadcast "
        "(fixed 25 rows) but the supplier arm is left to AQE — it grows "
        "linearly with SF, so a forced hint would abort at the 100 TB point."
    ),
    oracle=f"""
        WITH rev AS (
            SELECT l.l_partkey,
                   SUM({ORACLE_REVENUE}) AS value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        ),
        total AS (SELECT SUM(value) AS total_value, COUNT(*) AS n_parts FROM rev)
        SELECT r.l_partkey, CAST(r.value AS DOUBLE) AS value
        FROM rev r, total t
        WHERE r.value * t.n_parts > 2 * t.total_value
        ORDER BY value DESC, l_partkey
    """,
)
def q78_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    s = _t(spark, "supplier", sf_dir)
    n = _t(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    rev = (
        l.join(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey),
               l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum_scaled_long_exact(revenue_fp4(), 10000).alias("value"))
    )
    total = rev.agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("value") * F.col("n_parts") > F.col("total_value") * 2)
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q79_supplier_part_counts",
    category="composite",
    doc=(
        "TPC-H Q16-shaped: distinct supplier counts per (brand, size) for "
        "non-excluded parts, with the complaint-supplier NOT IN subquery "
        "expressed as a left-anti join (fixtures carry no comment "
        "strings; low account balance plays the complaint role). The "
        "complaint set is a constant fraction of supplier — linear in SF — "
        "so the anti-join is un-hinted: AQE broadcasts it while it fits and "
        "falls back to shuffle at scale. "
        "COUNT(DISTINCT) partially aggregates map-side on (brand, size, "
        "suppkey) before the final exchange."
    ),
    oracle="""
        SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
          )
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p_size
    """,
)
def q79_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    p = _t(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    bad = _t(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q80_excess_shippers",
    category="composite",
    doc=(
        "TPC-H Q20-shaped: suppliers who shipped more than 1.5x the "
        "per-part average of selected parts in a date window — the nested "
        "IN-chain (parts -> per-(supplier,part) quantity -> correlated "
        "threshold -> supplier list) decorrelated into two aggregation "
        "levels joined back on the part key (exchange reuse: both "
        "aggregates and the join hash on l_partkey). Threshold compares "
        "exact cross-multiplied decimals (qty*n*2 > total*3), no division."
    ),
    oracle="""
        WITH sp AS (
            SELECT l.l_suppkey, l.l_partkey,
                   SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_name LIKE '%widget' AND l.l_shipdate >= DATE '1999-01-01'
            GROUP BY l.l_suppkey, l.l_partkey
        ),
        pa AS (
            SELECT l_partkey, SUM(qty) AS total_qty, COUNT(*) AS n_sup
            FROM sp GROUP BY l_partkey
        )
        SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
        FROM sp
        JOIN pa ON pa.l_partkey = sp.l_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE sp.qty * pa.n_sup * 2 > pa.total_qty * 3
        ORDER BY s.s_suppkey
    """,
)
def q80_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") >= "1999-01-01")
    p = _t(spark, "part", sf_dir).filter(F.col("p_name").like("%widget")).select("p_partkey")
    s = _t(spark, "supplier", sf_dir)
    n = _t(spark, "nation", sf_dir)
    sp = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("qty"))
    )
    pa = sp.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_sup")
    )
    return (
        sp.join(pa, sp.l_partkey == pa.pa_partkey)
        .filter(F.col("qty") * F.col("n_sup") * 2 > F.col("total_qty") * 3)
        .join(s, sp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )
