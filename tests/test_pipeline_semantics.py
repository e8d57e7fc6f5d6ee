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

    out = []
    # sorted_view tails materialize their child (explain then shows only
    # `Scan ExistingRDD`); follow the _plan_child seam so plan assertions
    # keep seeing the real pre-sort subtree
    while df is not None:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(buf.getvalue())
        df = getattr(df, "_plan_child", None)
    return "\n".join(out)


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
    # non-vacuous: the pre-banding form returned ~0 rows (full-signature
    # equality), making this loop and the oracle gate trivially green
    assert len(ann) > 0
    queries_served = {r["query_id"] for r in ann}
    assert len(queries_served) >= 6  # banding must serve nearly every probe
    hits = 0
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:  # ANN found a true top-k member -> cosine must agree
            assert abs(brute[key] - r["cosine"]) < 1e-12
            hits += 1
    assert hits > 0  # at least some true top-k members are recalled


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
        # Q11-shape: the nation-filtered supplier arm broadcasts; the scalar
        # total is a 1-row broadcast nested-loop, never a shuffle
        ("q78_important_parts", "BroadcastNestedLoopJoin"),
        # Q16-shape: the complaint NOT IN compiles to a broadcast anti join
        ("q79_supplier_part_counts", "BroadcastHashJoin LeftAnti"),
        # regression family: exact sums partially aggregate map-side
        ("q81_regression_funcs", "partial_sum"),
        # per-doc top-k terms must be a WindowGroupLimit, not a full sort
        ("text_tfidf_topterms", "WindowGroupLimit"),
        # bigram counting must partially aggregate before its one shuffle
        ("text_bigram_fluency", "partial_count"),
        # grouping sets expand into ONE aggregation pass
        ("q44_grouping_sets", "Expand"),
    ],
)
def test_plan_shape(spark, name, fragment):
    """Scale-critical plan assertions: the optimized physical plan must contain
    the expected operator (broadcast join, pushed filters, partial agg)."""
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    assert fragment in plan, f"{name}: expected {fragment!r} in physical plan"


@pytest.mark.parametrize(
    "name",
    [
        "q05_join_multiway",
        "q51_shipping_priority",
        "q26_cdc_append",
        "q27_cdc_upsert_latest",
    ],
)
def test_scan_bound_plans_have_no_roundrobin_exchange(spark, name):
    """Scan-bound fact-side plans must stay exchange-free up to their one
    keyed shuffle: a round-robin repartition between the pushed-filter scan
    and the broadcast probes is pure overhead (it regressed q51 3.5x at
    sf0.1 when load_table spread unconditionally)."""
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    assert "RoundRobinPartitioning" not in plan, (
        f"{name}: unexpected round-robin exchange in scan-bound plan"
    )


def test_q27_uses_window_group_limit(spark):
    """Top-1-per-key must compile to partial/final WindowGroupLimit around a
    single hash exchange on the key — not a full window sort."""
    df = REGISTRY["q27_cdc_upsert_latest"].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    assert "WindowGroupLimit" in plan


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


def test_ngram_prefix_filter_deskews_join(spark):
    """De-skew regression: candidate generation joins only each doc's rarest
    prefix tokens, so the join fan-out (sum over keys of pairs-per-key) and
    the worst key's posting-list length both collapse relative to the naive
    all-words posting join that was quadratic on stopwords."""
    from cdc_platform_spark.operators.dedup import doc_words, ngram_prefix_keys

    ws = doc_words(spark, SF_SMOKE).select(
        "lang", "source", F.explode(F.array_distinct("words")).alias("word")
    )
    keys = ngram_prefix_keys(spark, SF_SMOKE).select("lang", "source", "word")

    def fanout(df):
        return (
            df.groupBy("lang", "source", "word")
            .count()
            .agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("max_df"),
            )
            .collect()[0]
        )

    full, pref = fanout(ws), fanout(keys)
    # measured at sf0.001: 26143 -> 1484 pairs, max posting 15 -> 10
    assert pref["pairs"] < full["pairs"] * 0.10
    assert pref["max_df"] <= full["max_df"]
    assert keys.count() < ws.count() * 0.25


def test_embedding_lsh_dedup_recall_on_planted_dups(spark, tmp_path):
    """The LSH-candidate rewrite must still find real near-duplicates: plant
    30 perturbed copies (cosine ~0.999) among 60 base vectors and require
    >=90% of planted pairs flagged with the partner as nearest neighbor."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64)).astype("float32")
    dup = base[:30] + rng.normal(size=(30, 64)).astype("float32") * 0.05
    vecs = np.vstack([base, dup])
    rows = [(i, [float(x) for x in vecs[i]], f"l{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["vec_id"]: r
        for r in REGISTRY["dedup_embedding_cosine"].builder(spark, str(tmp_path)).collect()
    }
    assert len(out) == 90
    flagged = sum(1 for i in range(30) if out[i]["is_dup"] == 1 and out[60 + i]["is_dup"] == 1)
    correct_nn = sum(1 for i in range(30) if out[i]["nn_id"] == 60 + i)
    assert flagged >= 27
    assert correct_nn >= 27


def test_embedding_cosine_plan_has_no_label_block_self_join(spark):
    """Scale regression: the old form self-joined on `label` (O(n^2) per
    label block). The rewrite must generate candidates via the banded
    signature equi-join only — no label column anywhere in the plan, no
    cartesian/nested-loop join."""
    df = REGISTRY["dedup_embedding_cosine"].builder(spark, SF_SMOKE)
    txt = plan_text(df)
    assert "label" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_ivf_trained_centroids_recall_vs_bruteforce(spark):
    """Trained-IVF quality gate: probing 2 of 8 cells (25% of the corpus)
    must recover well over the random-scan expectation (0.25) of the exact
    top-5 — measured 0.525 at smoke scale, deterministic (md5 seeds +
    fixed-point Lloyd), so the bound is stable."""
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_topk_bruteforce"].builder(spark, SF_SMOKE).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_ann_ivf"].builder(spark, SF_SMOKE).collect()
    }
    assert len(brute) == 40
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5


def test_ivf_centroids_are_trained_fixed_point(spark):
    """Lloyd training must move centroids off their seed vectors (they are
    means, not corpus members) while staying exact BIGINT micro-units."""
    from cdc_platform_spark.operators.similarity import _fixed_embeddings, train_ivf_centroids

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=False)
    cents = train_ivf_centroids(e).collect()
    assert len(cents) == 8
    vecs = {r["vec_id"]: r["a"] for r in e.select("vec_id", "a").collect()}
    moved = sum(1 for c in cents if c["ca"] != vecs[c["cent_id"]])
    assert moved >= 6  # nearly all cells re-estimated away from their seed
    for c in cents:
        assert all(isinstance(v, int) for v in c["ca"])


def test_decontaminate_bench_grams_broadcast(spark):
    """Scale assertion: the benchmark gram set (tiny eval partition) must be
    the BROADCAST side of the hit join — the corpus gram stream never
    shuffles for it."""
    df = REGISTRY["text_decontaminate"].builder(spark, SF_SMOKE)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt


def test_quantize_int8_no_vector_shuffle(spark):
    """Scale assertion: int8 quantization broadcasts the single stats row
    back over the corpus — no sort-merge join, no exchange of the vector
    side (the only exchanges are the stats aggregate's own tiny reduction)."""
    df = REGISTRY["sim_quantize_int8"].builder(spark, SF_SMOKE)
    txt = plan_text(df)
    assert "SortMergeJoin" not in txt
    assert "BroadcastNestedLoopJoin" in txt  # 1-row stats cross join


def test_quantize_int8_reconstruction_error_bounded(spark):
    """Dequantized values must sit within half a quantization step of the
    original on every dimension (the defining property of min/max scalar
    quantization)."""
    import math

    rows = (
        REGISTRY["sim_quantize_int8"].builder(spark, SF_SMOKE).limit(50).collect()
    )
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter("vec_id < 1000")
        .collect()
    }
    from cdc_platform_spark.operators.similarity import DIM

    # recompute the global per-dim min/max the operator trained on
    all_emb = [
        r["embedding"] for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    ]
    mins = [min(v[i] for v in all_emb) for i in range(DIM)]
    maxs = [max(v[i] for v in all_emb) for i in range(DIM)]
    for r in rows:
        x = emb[r["vec_id"]]
        # codes is serialized as a CSV string (driver-canonicalizer contract)
        for i, code in enumerate(int(c) for c in r["codes"].split(",")):
            lo, hi = mins[i], maxs[i]
            if hi <= lo:
                assert code == 0
                continue
            step = (hi - lo) / 255.0
            recon = lo + (code + 128) * step
            assert abs(recon - x[i]) <= step / 2 + 1e-9, (r["vec_id"], i)
            assert -128 <= code <= 127


def test_repetition_flags_planted_repetitive_doc(spark, tmp_path):
    """A planted one-word document must trip the is_repetitive gate; a
    maximally diverse document must not."""
    import pyspark.sql.functions as F  # noqa: N812

    docs = spark.createDataFrame(
        [
            (1, "spam " * 49 + "spam", "en", "s", 250),
            (2, " ".join(f"w{i}" for i in range(50)), "en", "s", 250),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    df = REGISTRY["text_repetition"].builder(spark, str(tmp_path))
    out = {r["doc_id"]: r for r in df.collect()}
    assert out[1]["is_repetitive"] == 1
    assert out[1]["top_word_fraction"] == 1.0
    assert out[1]["dup_bigram_fraction"] == 48.0 / 49.0  # 49 bigrams, 1 distinct
    assert out[2]["is_repetitive"] == 0
    assert out[2]["dup_bigram_fraction"] == 0.0


def test_shard_pack_matches_sequential_cumsum(spark):
    """The two-pass distributed prefix sum must equal the sequential
    definition (cumulative tokens in doc_id order, shard = start div
    budget), and shard ids must be non-decreasing in doc order."""
    from cdc_platform_spark.operators.text import SHARD_TOKEN_BUDGET

    out = (
        REGISTRY["text_shard_pack"].builder(spark, SF_SMOKE).orderBy("doc_id").collect()
    )
    cum = 0
    prev_shard = 0
    for r in out:
        assert r["shard_id"] == cum // SHARD_TOKEN_BUDGET, r
        assert r["shard_id"] >= prev_shard
        prev_shard = r["shard_id"]
        cum += r["n_tokens"]
    assert prev_shard >= 2  # the fixture actually spans multiple shards


def test_span_ngram_flags_planted_cross_doc_duplicates(spark, tmp_path):
    """Two identical documents share every span (fraction 1.0, flagged);
    a document with disjoint vocabulary shares none."""
    shared = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, shared, "en", "s", len(shared)),
            (2, shared, "en", "s", len(shared)),
            (3, " ".join(f"u{i}" for i in range(20)), "en", "s", 100),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_span_ngram"].builder(spark, str(tmp_path)).collect()
    }
    assert out[1]["shared_fraction"] == 1.0 and out[1]["is_flagged"] == 1
    assert out[2]["shared_fraction"] == 1.0 and out[2]["is_flagged"] == 1
    assert out[3]["shared_fraction"] == 0.0 and out[3]["is_flagged"] == 0
    assert out[3]["n_spans"] == 16  # 20 words -> 16 distinct 5-gram spans


def test_pq_codes_shape_and_encode_is_broadcast(spark):
    """PQ output: one row per (vector, subspace), codes within [0, K),
    non-negative integer squared error; the encode join must broadcast the
    codebook (never a sort-merge join of the corpus against it)."""
    from cdc_platform_spark.operators.similarity import PQ_K, PQ_SUBS

    df = REGISTRY["sim_quantize_pq"].builder(spark, SF_SMOKE)
    txt = plan_text(df)
    assert "SortMergeJoin" not in txt
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    rows = df.collect()
    assert len(rows) == n_vecs * PQ_SUBS
    seen_codes = set()
    for r in rows:
        assert 0 <= r["code"] < PQ_K
        assert r["sq_err"] >= 0
        seen_codes.add(r["code"])
    assert len(seen_codes) > 1  # codebook actually partitions the space


def test_distributed_prefix_sum_property(spark):
    """Property: the two-pass distributed prefix sum equals the sequential
    exclusive cumsum for arbitrary (key, value) data, regardless of how the
    range partitioner splits it."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cdc_platform_spark.functions import distributed_prefix_sum

    @given(
        vals=st.lists(st.integers(0, 1000), min_size=1, max_size=120),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    def check(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, v long"
        ).repartition(7)  # deliberately scrambled input partitioning
        got = {
            r["k"]: r["prefix"]
            for r in distributed_prefix_sum(df, "k", "v").collect()
        }
        cum = 0
        for i, v in enumerate(vals):
            assert got[i] == cum, (i, got[i], cum)
            cum += v

    check()


def test_avro_codec_stage_runs_full_width(spark):
    """The Python Avro encode stage must sit behind an explicit round-robin
    repartition: AQE coalesces the tiny upstream exchange by BYTES, but this
    stage's cost is per-row compute (regression guard for the 13s -> 4s
    parallelism fix)."""
    df = REGISTRY["q51_avro_envelope_roundtrip"].builder(spark, SF_SMOKE)
    assert "RoundRobinPartitioning" in plan_text(df)


def test_ivf_pq_recall_and_cosine_agreement(spark):
    """IVF-PQ quality gates: (1) every returned cosine must equal the exact
    bruteforce cosine for that pair (the re-rank is exact, so ADC can only
    affect WHICH pairs surface, never their scores); (2) the PQ shortlist
    must not lose IVF's recall floor — IVF-PQ recall vs exact top-5 stays
    at/above the 0.5 trained-IVF bound (deterministic: md5 seeds +
    fixed-point Lloyd for both quantizers)."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["sim_topk_bruteforce"].builder(spark, SF_SMOKE).collect()
    }
    ivf_pq = REGISTRY["sim_ann_ivf_pq"].builder(spark, SF_SMOKE).collect()
    assert len(ivf_pq) > 0
    for r in ivf_pq:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:
            assert abs(brute[key] - r["cosine"]) < 1e-12
    recall = len(set(brute) & {(r["query_id"], r["neighbor_id"]) for r in ivf_pq}) / len(brute)
    assert recall >= 0.5


def test_no_driver_collect_in_operator_builders():
    """Registry builders must stay one lazy composable plan: a driver-side
    .collect() forces an extra scheduled job and breaks composability (the
    q30 replay-cutoff scalar was the last one — now a broadcast single-row
    crossJoin).  Static scan so a future builder can't reintroduce one."""
    import pathlib

    import cdc_platform_spark.operators as ops

    offenders = []
    for path in pathlib.Path(ops.__file__).parent.glob("*.py"):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if ".collect()" in line.split("#")[0]:
                offenders.append(f"{path.name}:{i}")
    assert offenders == [], f"driver-side collect in operator module: {offenders}"


def test_range_join_binned_is_an_equi_join(spark):
    """The binned range join must compile to a hash-partitionable equi-join
    on the bin id — never the BroadcastNestedLoopJoin/cartesian Catalyst
    produces for a raw interval predicate."""
    df = REGISTRY["q84_range_join_binned"].builder(spark, SF_SMOKE)
    plan = plan_text(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # the bin equi-join survived optimization


def test_range_join_binned_matches_naive_and_respects_bounds(spark):
    """Bin width never changes the result (only the explode factor); closed
    endpoints behave as documented."""
    from cdc_platform_spark.functions.range_join import range_join_binned

    pts = spark.createDataFrame([(i,) for i in range(0, 100)], "t long")
    iv = spark.createDataFrame(
        [(1, 10, 20), (2, 15, 15), (3, 90, 120), (4, -5, 3)],
        "iv_id long, lo long, hi long",
    )
    naive = {
        (r.t, r.iv_id)
        for r in pts.crossJoin(iv).filter("t >= lo AND t <= hi").collect()
    }
    for width in (1, 7, 64, 1000):
        got = {
            (r.t, r.iv_id)
            for r in range_join_binned(pts, iv, "t", "lo", "hi", bin_width=width).collect()
        }
        assert got == naive, f"width={width}"
    half_open = {
        (r.t, r.iv_id)
        for r in range_join_binned(
            pts, iv, "t", "lo", "hi", bin_width=7, closed="left"
        ).collect()
    }
    assert half_open == {
        (t, i) for (t, i) in naive if t < {1: 20, 2: 15, 3: 120, 4: 3}[i]
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_width"):
        range_join_binned(pts, iv, "t", "lo", "hi", bin_width=0)
    with _pytest.raises(ValueError, match="closed"):
        range_join_binned(pts, iv, "t", "lo", "hi", bin_width=5, closed="right")


def test_range_join_binned_exact_past_double_precision(spark):
    """The bin id must be exact for longs beyond 2^53 (epoch nanos):
    double-division floor would mis-bin these and silently drop matches."""
    from cdc_platform_spark.functions.range_join import range_join_binned

    # points straddling bin edges at magnitudes where doubles round
    base = 2**60
    ts = [base + d for d in (-2, -1, 0, 1, 2)] + [-base + d for d in (-1, 0, 1)] + [0, -1, 1]
    pts = spark.createDataFrame([(t,) for t in ts], "t long")
    iv = spark.createDataFrame(
        [(1, base - 1, base + 1), (2, -base - 1, -base + 1), (3, -1, 1)],
        "iv_id long, lo long, hi long",
    )
    naive = {
        (r.t, r.iv_id)
        for r in pts.crossJoin(iv).filter("t >= lo AND t <= hi").collect()
    }
    for width in (3, 1000, 2**31 - 1):
        got = {
            (r.t, r.iv_id)
            for r in range_join_binned(pts, iv, "t", "lo", "hi", bin_width=width).collect()
        }
        assert got == naive, f"width={width}: {got ^ naive}"


def test_range_join_binned_left_join_preserves_unmatched_points(spark):
    """how='left' must keep points matching no interval (null-extended) —
    the residual is part of the join condition, not a post-filter that
    would silently degrade to inner semantics."""
    from cdc_platform_spark.functions.range_join import range_join_binned

    pts = spark.createDataFrame([(i,) for i in range(0, 50)], "t long")
    iv = spark.createDataFrame([(1, 10, 20), (2, 40, 45)], "iv_id long, lo long, hi long")
    out = range_join_binned(pts, iv, "t", "lo", "hi", bin_width=7, how="left").collect()
    assert len(out) == 50  # every point exactly once (no interval overlap here)
    matched = {r.t: r.iv_id for r in out if r.iv_id is not None}
    assert matched == {t: (1 if 10 <= t <= 20 else 2) for t in list(range(10, 21)) + list(range(40, 46))}
    unmatched = [r for r in out if r.iv_id is None]
    assert all(r.lo is None and r.hi is None for r in unmatched)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="how"):
        range_join_binned(pts, iv, "t", "lo", "hi", bin_width=7, how="right")
    bad = pts.withColumn("__range_bin", F.lit(0))
    with _pytest.raises(ValueError, match="__range_bin"):
        range_join_binned(bad, iv, "t", "lo", "hi", bin_width=7)


def test_range_join_binned_shared_column_names(spark):
    """String-named join columns resolve against their own frame, so the
    same name may exist on both inputs."""
    from cdc_platform_spark.functions.range_join import range_join_binned

    pts = spark.createDataFrame([(5, "a"), (25, "b")], "t long, tag string")
    iv = spark.createDataFrame([(1, 0, 10, "x")], "iv_id long, lo long, hi long, tag string")
    out = range_join_binned(pts, iv, "t", "lo", "hi", bin_width=4).collect()
    assert len(out) == 1 and out[0].t == 5


def test_embedding_cosine_survives_zero_norm_vectors(spark, tmp_path):
    """A vector quantizing to all-zeros (norm 0) has undefined cosine and
    previously put 0/0 into the re-rank — ANSI DIVIDE_BY_ZERO killed the
    operator. It must survive in the OUTPUT with a null neighbor."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], "l0") for i in range(20)]
    rows.append((20, [1e-9] * 64, "l0"))  # quantizes to the zero vector
    rows.append((21, [0.0] * 64, "l0"))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r for r in REGISTRY["dedup_embedding_cosine"].builder(spark, str(tmp_path)).collect()}
    assert len(out) == 22
    assert out[20].nn_id is None and out[20].is_dup == 0
    assert out[21].nn_id is None and out[21].is_dup == 0


def test_edit_distance_survives_empty_documents(spark, tmp_path):
    """Two empty documents are a legitimate candidate pair (identical
    simhash, zero length gap): similarity must report 1.0, not throw
    DIVIDE_BY_ZERO on 0/0."""
    rows = [
        (0, "", "en", "s0", 0),
        (1, "", "en", "s0", 0),
        (2, "some real words here again words", "en", "s0", 32),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.doc_a, r.doc_b): r for r in REGISTRY["dedup_edit_distance"].builder(spark, str(tmp_path)).collect()}
    assert (0, 1) in out
    assert out[(0, 1)].lev == 0 and out[(0, 1)].similarity == 1.0


def test_text_fingerprint_survives_short_documents(spark, tmp_path):
    """Docs under 4 words previously made the gram sequence step NEGATIVE
    and element_at threw INVALID_ARRAY_INDEX, aborting the job; they must
    fingerprint with a NULL rolling fp (the oracle's empty range())."""
    rows = [
        (0, "a b c", "en", "s0", 5),
        (1, "", "en", "s0", 0),
        (2, "one two three four five six", "en", "s0", 27),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in REGISTRY["text_fingerprint"].builder(spark, str(tmp_path)).collect()}
    assert out[0].rolling_min_fp is None and out[1].rolling_min_fp is None
    assert out[2].rolling_min_fp is not None
