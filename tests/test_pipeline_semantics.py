"""Operator-semantics unit tests (tier 1): properties the oracle hash-match
can't express — LSH recall, ANN vs brute force, envelope invariants, and
plan-shape assertions for the scale-critical paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.operators import load_all
from cdc_platform_spark.operators.cdc import envelope

from .conftest import SF_SMOKE

REGISTRY = load_all()


def plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_envelope_invariants(spark):
    env = envelope(spark, SF_SMOKE)
    n = env.count()
    assert n == spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    # offsets unique per partition; op domain; partition bounded
    bad = env.groupBy("partition", "offset").count().filter("count > 1").count()
    assert bad == 0
    assert env.filter(~F.col("op").isin("c", "u", "d")).count() == 0
    assert env.filter((F.col("partition") < 0) | (F.col("partition") >= 8)).count() == 0


def test_minhash_lsh_full_recall_at_threshold(spark, duck):
    """r=1 banding must catch every pair above the Jaccard threshold at this
    scale (miss probability (1-j)^16 < 1e-4 for j >= 0.5) — verified exactly
    against the all-pairs oracle."""
    got = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_minhash_lsh"].builder(spark, SF_SMOKE).collect()
    }
    exact = duck.sql("""
        WITH ws AS (SELECT doc_id, str_split(text,' ') w FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
               i -> w[i]||' '||w[i+1]||' '||w[i+2])) s FROM ws)
        SELECT a.doc_id, b.doc_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """).fetchall()
    assert got == set(exact), "LSH candidate generation missed above-threshold pairs"


def test_ann_lsh_results_subset_of_bruteforce_space(spark):
    """ANN returns real neighbors with correct cosines: every (query, neighbor,
    cosine) must appear in the exact all-pairs ranking with the same cosine."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["sim_topk_bruteforce"].builder(spark, SF_SMOKE).collect()
    }
    ann = REGISTRY["sim_ann_lsh"].builder(spark, SF_SMOKE).collect()
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:  # ANN found a true top-k member -> cosine must agree
            assert abs(brute[key] - r["cosine"]) < 1e-12


def test_dedup_exact_is_partition_of_docs(spark):
    df = REGISTRY["dedup_exact"].builder(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows:
        assert r["canonical_id"] <= r["doc_id"]


@pytest.mark.parametrize(
    "name,fragment",
    [
        # dimension joins must be broadcast (no shuffle of the small side)
        ("q05_join_multiway", "BroadcastHashJoin"),
        # scans must push filters / prune columns
        ("q02_filter_predicates", "PushedFilters: ["),
        # aggregation must have a map-side partial phase
        ("q10_agg_pricing_summary", "partial_sum"),
    ],
)
def test_plan_shape(spark, name, fragment):
    """Scale-critical plan assertions: the optimized physical plan must contain
    the expected operator (broadcast join, pushed filters, partial agg)."""
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    assert fragment in plan, f"{name}: expected {fragment!r} in physical plan"


def test_column_pruning_reaches_scan(spark):
    df = REGISTRY["q01_scan_project"].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    # only the 5 projected columns may be read
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"]:
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_dedup_clusters_match_union_find(spark):
    """Connected components over the LSH pair graph must equal the union-find
    closure of the same pairs (cluster id = min member)."""
    pairs = [(r["doc_a"], r["doc_b"]) for r in REGISTRY["dedup_minhash_lsh"].builder(spark, SF_SMOKE).collect()]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["dedup_clusters"].builder(spark, SF_SMOKE).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {x: find(x) for x in parent}
    assert got == expected, "label propagation diverged from union-find closure"
    assert len(got) > 0
