"""Extended relational surface: subqueries, pivot/unpivot, percentiles,
distribution windows, string aggregation, exact statistical moments,
HAVING, lateral expansion, and CDC enrichment joins.

Extends §2B beyond the minimum inventory so a user of the reference (plus
a normal analytics workload) finds every query shape they need.  Same
determinism rules as operators/relational.py.

Note on statistics: Spark's stddev/var/corr use streaming single-pass
algorithms whose float accumulation is partition-order dependent — NOT
reproducible across engines or even runs.  `q47_stats_moments` therefore
computes moments from exact decimal power sums (the map-side-combinable
form), which is both deterministic and the correct distributed design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import (
    MONEY,
    materialize,
    dsum,
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
    "q31_subquery_scalar_correlated",
    category="subquery",
    doc="Correlated scalar subquery: orders priced above their customer's average "
        "(decorrelates to an aggregate + join — Catalyst does the rewrite).",
    oracle="""
        WITH avg_per_cust AS (
            SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
            FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o JOIN avg_per_cust a ON o.o_custkey = a.o_custkey
        WHERE o.o_totalprice > a.avg_price
        ORDER BY o.o_orderkey
    """,
)
def q31_subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    avg_pc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(money("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        o.join(avg_pc, o.o_custkey == avg_pc.k)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q32_subquery_in",
    category="subquery",
    doc="IN / NOT IN subqueries over derived key sets.",
    oracle="""
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity <= 2)
        ORDER BY p_partkey
    """,
)
def q32_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, "part", sf_dir)
    l = _t(spark, "lineitem", sf_dir)
    hi = l.filter("l_quantity >= 49").select(F.col("l_partkey").alias("k")).distinct()
    lo = l.filter("l_quantity <= 2").select(F.col("l_partkey").alias("k")).distinct()
    return (
        p.join(hi, p.p_partkey == hi.k, "left_semi")
        .join(lo, p.p_partkey == lo.k, "left_anti")
        .select("p_partkey", "p_retailprice")
        .orderBy("p_partkey")
    )


@register(
    "q33_conditional_agg",
    category="aggregate",
    doc="Conditional aggregation (FILTER / CASE inside agg) — per-nation order-status mix.",
    oracle="""
        SELECT c.c_nationkey,
               COUNT(*) AS n_orders,
               CAST(COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
               CAST(COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_done,
               CAST(SUM(CASE WHEN o.o_totalprice > 100000.0 THEN CAST(o.o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_value
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
)
def q33_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    zero = F.lit(0).cast(MONEY)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_done"),
            F.sum(F.when(F.col("o_totalprice") > 100000.0, money("o_totalprice")).otherwise(zero))
            .cast("double")
            .alias("big_value"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q34_percentiles",
    category="aggregate",
    doc="Exact interpolated percentiles (median/quartiles) per group — Spark "
        "percentile ≡ DuckDB quantile_cont (same linear interpolation).",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               quantile_cont(l_extendedprice, 0.25) AS p25_price,
               quantile_cont(l_extendedprice, 0.75) AS p75_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_extendedprice", 0.25).alias("p25_price"),
            F.percentile("l_extendedprice", 0.75).alias("p75_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q35_pivot",
    category="aggregate",
    doc="Pivot: order counts + exact value sums by (year x status) — wide form.",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_O,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_P,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS v_O,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS v_F,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS v_P
        FROM orders
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q35_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    pivoted = (
        o.select(F.year("o_orderdate").cast("long").alias("o_year"), "o_orderstatus", money("o_totalprice").alias("v"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
    )
    zero = F.lit(0).cast(MONEY)
    return (
        pivoted.select(
            "o_year",
            F.coalesce(F.col("O_n"), F.lit(0)).cast("long").alias("n_O"),
            F.coalesce(F.col("F_n"), F.lit(0)).cast("long").alias("n_F"),
            F.coalesce(F.col("P_n"), F.lit(0)).cast("long").alias("n_P"),
            F.coalesce(F.col("O_v"), zero).cast("double").alias("v_O"),
            F.coalesce(F.col("F_v"), zero).cast("double").alias("v_F"),
            F.coalesce(F.col("P_v"), zero).cast("double").alias("v_P"),
        )
        .orderBy("o_year")
    )


@register(
    "q36_window_distribution",
    category="window",
    doc="Distribution window functions: ntile/percent_rank/cume_dist per segment.",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               CAST(NTILE(4) OVER w_u AS BIGINT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal),
               w_u AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
    """,
)
def q36_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    w_u = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w_u).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q37_string_agg",
    category="aggregate",
    doc="Ordered string aggregation (LISTAGG): nation roster per region.",
    oracle="""
        SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
    """,
)
def q37_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, "nation", sf_dir)
    r = _t(spark, "region", sf_dir)
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


@register(
    "q38_first_last_nth",
    category="window",
    doc="first_value/last_value/nth_value with explicit full-partition frames.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey)  OVER w AS last_order,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey
    """,
)
def q38_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q39_unpivot",
    category="setop",
    doc="Unpivot (wide->long melt) of per-part numeric attributes.",
    oracle="""
        SELECT p_partkey, attr, val FROM (
            SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        )
        ORDER BY p_partkey, attr
    """,
)
def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, "part", sf_dir)
    return (
        p.unpivot(
            "p_partkey",
            [F.col("p_size").cast("double").alias("size"), F.col("p_retailprice").alias("retailprice")],
            "attr",
            "val",
        )
        .orderBy("p_partkey", "attr")
    )


@register(
    "q40_having",
    category="aggregate",
    doc="Group filter (HAVING): suppliers with heavy shipment volume.",
    oracle="""
        SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 1000 AND COUNT(*) > 10
        ORDER BY l_suppkey
    """,
)
def q40_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.sum(money("l_quantity")).alias("qty_dec"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .filter((F.col("qty_dec") > 1000) & (F.col("n_lines") > 10))
        .select("l_suppkey", F.col("qty_dec").cast("double").alias("total_qty"), "n_lines")
        .orderBy("l_suppkey")
    )


@register(
    "q41_case_bucketing",
    category="filter",
    doc="Searched CASE bucketing + group-by on the derived bucket.",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
                    WHEN o_totalprice < 150000.0 THEN 'medium'
                    WHEN o_totalprice < 300000.0 THEN 'large'
                    ELSE 'jumbo' END AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def q41_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000.0, "small")
        .when(F.col("o_totalprice") < 150000.0, "medium")
        .when(F.col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(money("o_totalprice")).cast("double").alias("total"))
        .orderBy("bucket")
    )


@register(
    "q42_correlated_exists_agg",
    category="subquery",
    doc="Correlated EXISTS with aggregate condition: customers whose max order tops 300k.",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      GROUP BY o.o_custkey HAVING MAX(o.o_totalprice) > 300000.0)
        ORDER BY c_custkey
    """,
)
def q42_correlated_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    hot = (
        o.groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("mx"))
        .filter(F.col("mx") > 300000.0)
        .select("o_custkey")
    )
    return (
        c.join(hot, c.c_custkey == hot.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q43_lateral_explode",
    category="functions",
    doc="Lateral expansion (posexplode): word positions for short documents.",
    oracle="""
        SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS pos, t.word
        FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents WHERE n_chars < 150) d,
             LATERAL (SELECT unnest(d.words) AS word, generate_subscripts(d.words, 1) AS i) t
        ORDER BY doc_id, pos
    """,
)
def q43_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, "documents", sf_dir).filter("n_chars < 150")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("long"), "word")
        .orderBy("doc_id", "pos")
    )


@register(
    "q47_stats_moments",
    category="aggregate",
    doc="Deterministic distributed statistics: stddev/variance from exact decimal "
        "power sums (map-side combinable; never the order-dependent streaming form).",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                    / (COUNT(*) - 1)) AS stddev_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q47_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    q = money("l_quantity")
    s1 = F.sum(q).cast("double")
    s2 = F.sum(q * q).cast("double")
    n = F.count(F.lit(1))
    return (
        l.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            s1.alias("s1"),
            s2.alias("s2"),
            F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("stddev_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q48_cdc_enrichment_join",
    category="cdc",
    doc="Stream-table enrichment: events joined to the latest materialized state "
        "of their key (the canonical CDC lookup-join: Q27 state as dimension).",
    oracle="""
        WITH env AS (
            SELECT event_id AS seq, user_id AS pk,
                   CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
                   event_type, value
            FROM events
        ),
        state AS (
            SELECT pk, event_type AS last_event_type, value AS last_value
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) rn FROM env)
            WHERE rn = 1 AND op <> 'd'
        )
        SELECT e.seq, e.pk, e.value,
               s.last_event_type, s.last_value,
               CAST(CASE WHEN s.pk IS NULL THEN 0 ELSE 1 END AS BIGINT) AS key_live
        FROM env e LEFT JOIN state s ON e.pk = s.pk
        WHERE e.op = 'u'
        ORDER BY e.seq
    """,
)
def q48_cdc_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.operators.cdc import envelope

    env = envelope(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy(F.col("seq").desc())
    state = (
        env.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select(
            F.col("pk").alias("s_pk"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
    return (
        env.filter(F.col("op") == "u")
        .join(state, env.pk == state.s_pk, "left")
        .select(
            "seq",
            "pk",
            "value",
            "last_event_type",
            "last_value",
            F.when(F.col("s_pk").isNull(), 0).otherwise(1).cast("long").alias("key_live"),
        )
        .orderBy("seq")
    )


@register(
    "q49_funnel",
    category="window",
    doc="Conversion funnel: per user, first click -> first purchase within 1h "
        "(sequence analytics over event time).",
    oracle="""
        WITH c AS (SELECT user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS first_click_us
                   FROM events WHERE event_type = 'click' GROUP BY user_id),
             p AS (SELECT e.user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS first_purchase_us
                   FROM events e JOIN c ON e.user_id = c.user_id
                   WHERE e.event_type = 'purchase' AND CAST(epoch_us(ts) AS BIGINT) > c.first_click_us
                   GROUP BY e.user_id)
        SELECT c.user_id, c.first_click_us, p.first_purchase_us,
               CAST(CASE WHEN p.first_purchase_us IS NOT NULL
                          AND p.first_purchase_us - c.first_click_us <= 3600000000
                         THEN 1 ELSE 0 END AS BIGINT) AS converted_1h
        FROM c LEFT JOIN p ON c.user_id = p.user_id
        ORDER BY c.user_id
    """,
)
def q49_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, "events", sf_dir).withColumn("t_us", F.expr("ts_ns div 1000"))
    clicks = (
        e.filter("event_type = 'click'").groupBy("user_id").agg(F.min("t_us").alias("first_click_us"))
    )
    purchases = (
        e.filter("event_type = 'purchase'")
        .join(clicks, "user_id")
        .filter(F.col("t_us") > F.col("first_click_us"))
        .groupBy("user_id")
        .agg(F.min("t_us").alias("first_purchase_us"))
    )
    return (
        clicks.join(purchases, "user_id", "left")
        .select(
            "user_id",
            "first_click_us",
            "first_purchase_us",
            F.when(
                F.col("first_purchase_us").isNotNull()
                & (F.col("first_purchase_us") - F.col("first_click_us") <= 3_600_000_000),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("converted_1h"),
        )
        .orderBy("user_id")
    )


@register(
    "q51_shipping_priority",
    category="composite",
    doc="TPC-H Q3-shaped composite: unshipped-revenue per order for one segment, "
        "top 10 by revenue — selective join + agg + top-k in one plan.",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q51_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:

    c = _t(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1995-03-15")
    l = _t(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1995-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(sum_scaled_long(revenue_fp4(), 10000, "revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q52_returned_items",
    category="composite",
    doc="TPC-H Q10-shaped composite: revenue lost to returns per customer, "
        "top 20 — the selective-fact + dim-enrich + top-k pattern.",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q52_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:

    c = _t(spark, "customer", sf_dir)
    o = _t(spark, "orders", sf_dir)
    l = _t(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = _t(spark, "nation", sf_dir)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum_scaled_long(revenue_fp4(), 10000, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .select("c_custkey", "c_name", "n_name", "revenue", "n_items")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q53_region_share",
    category="composite",
    doc="Market-share-shaped composite: each region's yearly share of global "
        "revenue — two aggregation levels, deterministic share division.",
    oracle="""
        WITH rev AS (
            SELECT r.r_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, o_year
        )
        SELECT r_name, o_year,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY o_year) AS DOUBLE) AS share
        FROM rev
        ORDER BY r_name, o_year
    """,
)
def q53_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:


    l = _t(spark, "lineitem", sf_dir)
    o = _t(spark, "orders", sf_dir)
    c = _t(spark, "customer", sf_dir)
    n = _t(spark, "nation", sf_dir)
    r = _t(spark, "region", sf_dir)
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("long").alias("o_year"))
        # exact revenue sum on the primitive-fp path, kept DECIMAL for the
        # share-of-total window below (r14: value identical to
        # SUM(revenue()), see functions.sum_scaled_long_exact)
        .agg(sum_scaled_long_exact(revenue_fp4(), 10000).alias("rev"))
        # materialize the 35-row (region, year) aggregate ONCE: the
        # share-of-total tail reads it twice (per-year totals + the final
        # projection), and without the checkpoint the window formulation
        # re-planned the whole probe subtree into extra exchanges
        # (measured r14, interleaved A/B at sf0.1: window form min
        # 1.31 / median 2.03 s vs this form 0.23 / 0.42 s)
        .transform(materialize)
    )
    # share-of-total as a broadcast join against the per-year totals
    # instead of SUM() OVER (PARTITION BY o_year): decimal addition over
    # the identical addends is exact and associative, so the per-year
    # total — and therefore every share — is bit-identical to the window
    # form (oracle-proved); the plan loses the window's hash exchange +
    # sort and its range-sampling re-run (guide §2.4 "remove shuffles
    # outright").  At scale both sides of this tail are O(regions x
    # years) rows — the join is against a broadcast of a few hundred rows.
    totals = rev.groupBy("o_year").agg(F.sum("rev").alias("total"))
    return (
        rev.join(F.broadcast(totals), "o_year")
        .select(
            "r_name",
            "o_year",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("total").cast("double")).alias("share"),
        )
        .orderBy("r_name", "o_year")
    )


@register(
    "q55_string_distance",
    category="functions",
    doc="Edit-distance family: levenshtein between name fields (fuzzy-matching "
        "primitive for entity resolution).",
    oracle="""
        SELECT s.s_suppkey,
               CAST(levenshtein(s.s_name, c.c_name) AS BIGINT) AS dist_to_cust,
               CAST(levenshtein(s.s_name, UPPER(s.s_name)) AS BIGINT) AS dist_to_upper
        FROM supplier s JOIN customer c ON s.s_suppkey = c.c_custkey
        ORDER BY s.s_suppkey
    """,
)
def q55_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, "supplier", sf_dir)
    c = _t(spark, "customer", sf_dir)
    return (
        s.join(c, s.s_suppkey == c.c_custkey)
        .select(
            "s_suppkey",
            F.levenshtein("s_name", "c_name").cast("long").alias("dist_to_cust"),
            F.levenshtein(F.col("s_name"), F.upper("s_name")).cast("long").alias("dist_to_upper"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q56_bitwise_funcs",
    category="functions",
    doc="Bitwise family: and/or/xor/shift/bit_count over key columns.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_orderkey & 255 AS BIGINT) AS k_and,
               CAST(l_orderkey | 15 AS BIGINT) AS k_or,
               CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS k_xor,
               CAST(l_orderkey >> 4 AS BIGINT) AS k_shr,
               CAST(bit_count(l_orderkey) AS BIGINT) AS k_bits
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, l_partkey
    """,
)
def q56_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("long").alias("k_and"),
            F.col("l_orderkey").bitwiseOR(F.lit(15)).cast("long").alias("k_or"),
            F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).cast("long").alias("k_xor"),
            F.shiftright(F.col("l_orderkey"), 4).cast("long").alias("k_shr"),
            F.bit_count(F.col("l_orderkey")).cast("long").alias("k_bits"),
        )
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    )


@register(
    "q57_histogram",
    category="aggregate",
    doc="Fixed-width histogram of order values via integer bucketing — the "
        "distribution-profiling primitive, exact integer math.",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def q57_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir)
    bucket = F.floor(F.col("o_totalprice") / 25000.0).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q58_deterministic_sample",
    category="sampling",
    doc="Deterministic hash sampling: ~10%% of documents per language selected by "
        "md5(doc_id) residue — the reproducible, cluster-stable sampling every "
        "training-data pipeline needs (df.sample() is neither).",
    oracle="""
        WITH sampled AS (
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
        )
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM sampled
        GROUP BY lang
        ORDER BY lang
    """,
)
def q58_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.operators.dedup import md5_60bit

    d = _t(spark, "documents", sf_dir)
    sampled = d.filter(F.pmod(md5_60bit(F.col("doc_id").cast("string")), F.lit(10)) == 0)
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.sum("n_chars").cast("long").alias("sampled_chars"))
        .orderBy("lang")
    )


@register(
    "q71_argmax",
    category="aggregate",
    doc=(
        "Arg-max aggregation (max_by over a composite order key): top customer "
        "per market segment by (acctbal, custkey) — single-pass, map-side "
        "combinable, vs. the window row_number form the oracle uses (same "
        "result, two different physical strategies)."
    ),
    oracle="""
        SELECT c_mktsegment, c_name AS top_customer,
               c_acctbal AS top_acctbal, c_custkey AS top_custkey
        FROM (
            SELECT c_mktsegment, c_name, c_acctbal, c_custkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey DESC
                   ) AS rn
            FROM customer
        )
        WHERE rn = 1
        ORDER BY c_mktsegment
    """,
)
def q71_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, "customer", sf_dir)
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", key).alias("top_customer"),
            F.max_by("c_acctbal", key).alias("top_acctbal"),
            F.max_by("c_custkey", key).alias("top_custkey"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q72_conditional_aggregates",
    category="aggregate",
    doc=(
        "Conditional/boolean aggregate family: count_if, bool_and/bool_or, "
        "NULLIF-fed MIN, GREATEST/LEAST composition — all map-side "
        "combinable scalar aggregates (no window, one shuffle)."
    ),
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_lines,
               CAST(count_if(l_discount > l_tax) AS BIGINT) AS n_disc_gt_tax,
               CAST(bool_and(l_quantity > 0) AS BIGINT) AS all_qty_pos,
               CAST(bool_or(l_discount = 0) AS BIGINT) AS any_zero_disc,
               MIN(NULLIF(l_discount, 0)) AS min_nonzero_disc,
               MAX(GREATEST(l_discount, l_tax)) AS max_rate,
               MIN(LEAST(l_discount, l_tax)) AS min_rate
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q72_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # Output types pinned on BOTH engines (driver r03 hash-fail was
            # representational: DuckDB count_if/bool_* surface as HUGEINT /
            # BOOLEAN vs Spark long/boolean in the driver's canonicalizer).
            F.count_if(F.col("l_discount") > F.col("l_tax")).cast("long").alias("n_disc_gt_tax"),
            F.bool_and(F.col("l_quantity") > 0).cast("long").alias("all_qty_pos"),
            F.bool_or(F.col("l_discount") == 0).cast("long").alias("any_zero_disc"),
            F.min(F.nullif(F.col("l_discount"), F.lit(0))).alias("min_nonzero_disc"),
            F.max(F.greatest("l_discount", "l_tax")).alias("max_rate"),
            F.min(F.least("l_discount", "l_tax")).alias("min_rate"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q73_approx_percentile",
    category="aggregate",
    oracle=None,  # sketch-based: rows-only gate; tolerance vs exact tested in tier 1
    doc=(
        "Approximate percentiles (Greenwald-Khanna sketch, mergeable across "
        "partitions — the distributed complement to q34's exact percentiles): "
        "p50/p95/p99 of extended price per return flag, accuracy 1e-4."
    ),
)
def q73_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)").alias("p"),
        )
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q81_regression_funcs",
    category="aggregate",
    doc=(
        "Linear-regression aggregate family (REGR_SLOPE / REGR_INTERCEPT / "
        "REGR_R2 semantics): discount regressed on quantity per return "
        "flag, computed from exact decimal power sums (Sx, Sy, Sxx, Syy, "
        "Sxy) — the map-side-combinable form (one shuffle, reduce state = 5 "
        "decimals + a count per group). Never Spark's order-dependent "
        "streaming covariance. Inputs are 2-dp bounded columns, so every "
        "power sum is exactly double-representable (< 2^53 in fixed-point "
        "units even at 100 TB row counts) and the final slope/intercept/r2 "
        "double arithmetic — identical expression shape on both engines — "
        "is bit-reproducible. (Unbounded-magnitude inputs like "
        "extendedprice^2 sums exceed 53 bits and the decimal->double cast "
        "itself becomes the nondeterminism; see q47 for the raw-sums form.)"
    ),
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
               ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        FROM s
        ORDER BY l_returnflag
    """,
)
def q81_regression_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, "lineitem", sf_dir)
    x = money("l_quantity")
    y = money("l_discount")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        s.select(
            "l_returnflag",
            "n",
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
            (
                ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            ).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q44_grouping_sets",
    category="aggregate",
    doc=(
        "Explicit GROUPING SETS (distinct from ROLLUP/CUBE: an arbitrary, "
        "non-hierarchical set list) — per (returnflag, linestatus), per "
        "shipmode alone, and the grand total, in one aggregation pass with "
        "GROUPING() disambiguation. Spark expands the sets into one "
        "Expand+partial-agg plan: still a single shuffle."
    ),
    oracle="""
        SELECT l_returnflag, l_linestatus, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                    + GROUPING(l_linenumber) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
                 l_linenumber NULLS FIRST
    """,
)
def q44_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, "lineitem", sf_dir).createOrReplaceTempView("q44_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                    + GROUPING(l_linenumber) AS BIGINT) AS gid
        FROM q44_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
                 l_linenumber NULLS FIRST
    """)


@register(
    "q45_date_arithmetic",
    category="function-family",
    doc=(
        "Date/interval arithmetic family over orders: date +/- INTERVAL and "
        "day-count arithmetic, quarter/week extraction, truncation, "
        "month-boundary math (last_day), and age-in-days — the temporal "
        "expression surface the reference's SQL layer exposes, all "
        "whole-stage-codegen built-ins on a pruned 2-column scan."
    ),
    oracle="""
        SELECT o_orderkey,
               strftime(CAST(o_orderdate + INTERVAL 90 DAY AS DATE), '%Y-%m-%d') AS due_date,
               strftime(CAST(o_orderdate - INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS prior_month,
               CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
               CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS wk,
               strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
               strftime(CAST(last_day(o_orderdate) AS DATE), '%Y-%m-%d') AS month_end,
               CAST(date_diff('day', o_orderdate, DATE '1998-12-01') AS BIGINT) AS age_days
        FROM orders
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey
    """,
)
def q45_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(d, -1), "yyyy-MM-dd").alias("prior_month"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("wk"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).cast("long").alias("age_days"),
    ).orderBy("o_orderkey")


@register(
    "q84_range_join_binned",
    category="join",
    doc=(
        "Non-equi interval join at scale (functions.range_join): events "
        "matched to 1-hour 'incident windows' with NO equality key — the "
        "shape Catalyst can only plan as BroadcastNestedLoop/cartesian — "
        "rewritten as bin discretization (floor(t/15min) on points, "
        "interval exploded to overlapped bins) + equi-join on bin + exact "
        "residual. One hash-partitionable shuffle; bin hotspots are plain "
        "join-key skew, AQE/salting-compatible. A plan test pins the "
        "nested-loop join's absence."
    ),
    oracle="""
        WITH w AS (
            SELECT event_id AS window_id,
                   CAST(epoch_us(ts) AS BIGINT) AS lo_us,
                   CAST(epoch_us(ts) AS BIGINT) + 3600000000 AS hi_us
            FROM events WHERE event_id % 997 = 0
        )
        SELECT w.window_id, COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM w JOIN events e
          ON CAST(epoch_us(e.ts) AS BIGINT) >= w.lo_us
         AND CAST(epoch_us(e.ts) AS BIGINT) < w.hi_us
        GROUP BY w.window_id
        ORDER BY window_id
    """,
)
def q84_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions.range_join import range_join_binned

    e = _t(spark, "events", sf_dir)
    pts = e.select(
        F.expr("ts_ns div 1000").alias("t_us"), "user_id", "value"
    )
    win = e.filter(F.col("event_id") % 997 == 0).select(
        F.col("event_id").alias("window_id"),
        F.expr("ts_ns div 1000").alias("lo_us"),
        (F.expr("ts_ns div 1000") + F.lit(3_600_000_000)).alias("hi_us"),
    )
    joined = range_join_binned(
        pts, win, "t_us", "lo_us", "hi_us", bin_width=900_000_000, closed="left"
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "value_sum"),
        )
        .orderBy("window_id")
    )
