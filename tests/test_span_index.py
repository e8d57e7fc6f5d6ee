"""BucketedSpanIndexSink: exact duplicated-span statistics under CDC.

The design contract under test (streaming/span_index.py module
docstring): the posting store is EXACT (unlike the minhash sink's
superset band store), enabled by the commit ORDER — the per-doc index,
the authoritative old-gram record, commits LAST, so every crash window
between store commits replays to the identical computation.  The tests
therefore cover not just end-state equivalence but each crash boundary
explicitly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.operators.dedup import SPAN_NGRAM, span_gram_hashes_col
from cdc_platform_spark.streaming.pipeline import StateInFlightError
from cdc_platform_spark.streaming.span_index import BucketedSpanIndexSink
from tests.conftest import SF_SMOKE

_BATCH_SCHEMA = "doc_id long, offset long, op string, text string"

# grams (5-word windows) chosen so docs share specific spans:
#   A: abcde bcdef cdefg defgh     (4 spans)
#   B: shares abcde with A only
#   C: disjoint
#   D: too short for any span
#   E: shares bcdef + cdefg with A (used in wave 2)
A = "a b c d e f g h"
B = "a b c d e x y z w"
C = "p q r s t u"
D = "short doc"
B2 = "m n o p q r s"
E = "b c d e f g q q q"


def _expected(spark, docs):
    """From-scratch batch computation (the dedup_span_ngram algebra) over
    the live corpus — the oracle every end state must equal."""
    d = spark.createDataFrame(docs, "doc_id long, text string")
    words = F.split(F.col("text"), " ")
    g = d.filter(F.size(words) >= SPAN_NGRAM).select(
        "doc_id", span_gram_hashes_col(words).alias("grams")
    )
    ex = g.select("doc_id", F.explode("grams").alias("gh"))
    dup = ex.groupBy("gh").agg(F.count(F.lit(1)).alias("df")).filter("df >= 2").select("gh")
    hits = ex.join(dup, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_spans")
    )
    ns = F.coalesce(F.col("n_shared_spans"), F.lit(0)).cast("long")
    return {
        r["doc_id"]: (r["n_spans"], r["n_shared_spans"])
        for r in g.select("doc_id", F.size("grams").cast("long").alias("n_spans"))
        .join(hits, "doc_id", "left")
        .select("doc_id", "n_spans", ns.alias("n_shared_spans"))
        .collect()
    }


def _got(spark, sink):
    return {
        r["doc_id"]: (r["n_spans"], r["n_shared_spans"])
        for r in sink.span_stats(spark).collect()
    }


def _b(spark, rows):
    return spark.createDataFrame(rows, _BATCH_SCHEMA)


WAVE1 = [(1, 1, "c", A), (2, 2, "c", B), (3, 3, "c", C), (4, 4, "c", D)]
# update doc2 away from the overlap, delete doc3, insert doc5 sharing
# two spans with UNTOUCHED doc1 — doc1's stats must move without doc1
# appearing in the batch (the df-crossing propagation path)
WAVE2 = [(2, 10, "u", B2), (3, 11, "d", None), (5, 12, "c", E)]
LIVE_AFTER_2 = [(1, A), (2, B2), (5, E)]


def test_multi_batch_equivalence_and_crossing_propagation(spark, tmp_path):
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    assert _got(spark, sink) == _expected(spark, [(1, A), (2, B), (3, C)])

    sink.write(_b(spark, WAVE2))
    got = _got(spark, sink)
    assert got == _expected(spark, LIVE_AFTER_2)
    # the crossing actually propagated: untouched doc1 gained the two
    # spans doc5 brought, and lost nothing from doc2's retreat (abcde
    # kept df>=2? no — B2 removed it, E never had it: 1 -> 2 net)
    assert got[1] == (4, 2)
    # retraction: doc2's rewrite dropped its old shared span
    assert got[2][1] == 0
    # deleted doc3 and short doc4 are not served
    assert 3 not in got and 4 not in got


def test_replay_idempotence(spark, tmp_path):
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    before = _got(spark, sink)
    sink.write(_b(spark, WAVE2))  # full redelivery of the last batch
    assert _got(spark, sink) == before


@pytest.mark.parametrize("fail_store", ["stats", "index"])
def test_crash_between_store_commits_replays_exact(spark, tmp_path, fail_store):
    """Kill the batch after the postings commit (fail_store='stats') or
    after postings+stats ('index'), then replay it — the commit-order
    argument says the replayed batch recomputes the identical state
    because the pre-merge index survives until the LAST commit."""
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))

    target = sink.stats if fail_store == "stats" else sink.index
    meth = "write_buckets" if fail_store == "stats" else "write"
    real = getattr(target, meth)

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    setattr(target, meth, boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink.write(_b(spark, WAVE2))
    setattr(target, meth, real)

    # mid-batch: the cross-store marker is still up, read-only serves
    # must refuse retriably rather than read a postings/stats mix
    ro = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError):
        ro.span_stats(spark)

    sink.write(_b(spark, WAVE2))  # checkpoint replay of the same batch
    assert _got(spark, sink) == _expected(spark, LIVE_AFTER_2)
    # marker cleared: serving reads work again
    assert _got(spark, ro) == _expected(spark, LIVE_AFTER_2)


def test_out_of_order_redelivery_cannot_regress(spark, tmp_path):
    """A stale redelivered version (lower offset) of an already-updated
    doc must not win any store: the winner derivation and the index
    merge both key on offset."""
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    before = _got(spark, sink)
    sink.write(_b(spark, [(2, 2, "c", B)]))  # wave-1 version, old offset
    assert _got(spark, sink) == before


def test_compact_drops_dead_weight_not_state(spark, tmp_path):
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    stats = sink.state_stats(spark)
    assert stats["postings"]["tombstones"] > 0  # retraction left dead rows
    before = _got(spark, sink)
    sink.compact(spark)
    after_stats = sink.state_stats(spark)
    assert after_stats["postings"]["tombstones"] == 0
    assert after_stats["stats"]["tombstones"] == 0
    assert _got(spark, sink) == before


def test_compact_crash_mid_sequence_blocks_serves_until_retry(spark, tmp_path):
    """compact() rewrites postings and stats as two separate journaled
    commits; the cross-store marker must bracket the sequence (ADVICE
    r12) so that if compact ever does more than tombstone GC, a crash
    between the rewrites fails read-only serves fast instead of serving
    a cross-store mix.  The scheduler's retry is idempotent and clears
    the marker."""
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    before = _got(spark, sink)

    real = sink.stats.rewrite_all

    def boom(*a, **k):
        raise RuntimeError("injected compact crash")

    sink.stats.rewrite_all = boom
    with pytest.raises(RuntimeError, match="injected compact crash"):
        sink.compact(spark)
    sink.stats.rewrite_all = real

    ro = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError):
        ro.span_stats(spark)

    sink.compact(spark)  # scheduler retry: idempotent, clears the marker
    assert not os.path.exists(sink._stores_marker)
    assert _got(spark, ro) == before
    assert sink.state_stats(spark)["postings"]["tombstones"] == 0


def test_read_only_refuses_writes(spark, tmp_path):
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    ro = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4, read_only=True)
    with pytest.raises(RuntimeError, match="read_only"):
        ro.write(_b(spark, WAVE2))
    # compact refuses BEFORE touching the marker (ADVICE r13): a
    # read-only compact must not strand a cross-store marker that would
    # block every serve with StateInFlightError until the writer's next
    # write clears it
    with pytest.raises(RuntimeError, match="read_only"):
        ro.compact(spark)
    assert not os.path.exists(sink._stores_marker)
    # and a read-only open of a missing root creates nothing
    ro2 = BucketedSpanIndexSink(str(tmp_path / "nope"), n_buckets=4, read_only=True)
    assert ro2.span_stats(spark).count() == 0
    assert not os.path.exists(str(tmp_path / "nope"))


def test_point_serve_reads_single_bucket(spark, tmp_path):
    """VERDICT r13 #3: a doc_id point lookup must prune its FILE LISTING
    to the single hash bucket — not scan the store then filter — and
    still serve exactly the full view's row for that doc."""
    from cdc_platform_spark.streaming.pipeline import spark_hash_bucket

    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, WAVE1))

    point = sink.span_stats(spark, doc_id=1)
    files = point.inputFiles()
    assert files, "point serve listed no files for a live doc"
    buckets = {f.split("bucket=")[1].split("/")[0] for f in files}
    assert len(buckets) == 1
    rows = point.collect()
    assert len(rows) == 1 and (rows[0]["n_spans"], rows[0]["n_shared_spans"]) == _got(
        spark, sink
    )[1]

    # a doc hashing to a never-committed bucket serves empty, not error
    did = next(
        d
        for d in range(100, 400)
        if not os.path.isdir(
            f"{sink.stats.path}/bucket="
            f"{spark_hash_bucket(spark, d, 'long', 4)}"
        )
    )
    assert sink.span_stats(spark, doc_id=did).count() == 0


def test_span_stats_cli(spark, tmp_path, capsys):
    """`cdc-spark span-stats`: the serve verb over a maintained span
    index — read-only, shared-fraction-descending, retriable exit 2
    while a writer batch is mid-commit."""
    import json

    from cdc_platform_spark.cli import main

    root = str(tmp_path / "span")
    sink = BucketedSpanIndexSink(root, n_buckets=4)
    sink.write(_b(spark, WAVE1))

    rc = main(["span-stats", root, "--n-buckets", "4", "--limit", "10"])
    assert rc == 0
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out and {
        "doc_id", "n_spans", "n_shared_spans", "shared_fraction", "is_flagged"
    } <= set(out[0])
    fr = [r["shared_fraction"] for r in out]
    assert fr == sorted(fr, reverse=True)

    # --flagged-only keeps only threshold breakers
    rc = main(["span-stats", root, "--n-buckets", "4", "--flagged-only"])
    assert rc == 0
    flagged = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert all(r["is_flagged"] == 1 for r in flagged)

    # --doc-id point lookup (bucket-pruned serve path)
    rc = main(["span-stats", root, "--n-buckets", "4", "--doc-id", "1"])
    assert rc == 0
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert len(rows) == 1 and rows[0]["doc_id"] == 1

    # wrong path -> clear error, not an empty serve
    assert main(["span-stats", str(tmp_path / "nope")]) == 1
    capsys.readouterr()

    # mid-batch marker -> retriable exit 2
    with open(sink._stores_marker, "w") as fh:
        fh.write("x")
    assert main(["span-stats", root, "--n-buckets", "4"]) == 2
    assert "retriable" in capsys.readouterr().err
    os.remove(sink._stores_marker)


def test_curated_span_filtered_composes_both_sinks(spark, tmp_path):
    """curated_span_filtered: the curation funnel minus span-flagged docs —
    cross-sink composition over the same batches (the sq_span_filtered_
    curation_stream recipe, pinned here at unit scale)."""
    from cdc_platform_spark.streaming.dedup_index import CuratedCorpusSink

    corpus = CuratedCorpusSink(str(tmp_path / "corpus"), n_buckets=4)
    span = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.col("doc_id").alias("offset"),
        F.lit("c").alias("op"),
        "text",
        "lang",
        "source",
    )
    corpus.write(d)
    span.write(d.select("doc_id", "offset", "op", "text"))
    curated = {r["doc_id"] for r in corpus.curated(spark).collect()}
    flagged = {
        r["doc_id"]
        for r in span.span_stats(spark).filter("is_flagged = 1").collect()
    }
    got = {
        r["doc_id"]
        for r in corpus.curated_span_filtered(spark, span.span_stats(spark)).collect()
    }
    assert got == curated - flagged
    assert flagged, "fixture should contain span-flagged docs (near-dup bait)"


def test_delete_only_first_batch(spark, tmp_path):
    """Degenerate but legal: a stream whose first delivered batch is all
    deletes (upstream compaction artifact) must no-op cleanly."""
    sink = BucketedSpanIndexSink(str(tmp_path / "span"), n_buckets=4)
    sink.write(_b(spark, [(9, 1, "d", None)]))
    assert sink.span_stats(spark).count() == 0
    sink.write(_b(spark, WAVE1))
    assert _got(spark, sink) == _expected(spark, [(1, A), (2, B), (3, C)])


def test_no_forced_broadcast_hints_in_sink_source():
    """Verdict r12: the touched/cross_docs semi/anti joins must carry NO
    broadcast hint — both sets are micro-batch-proportional (AQE
    broadcasts them at runtime), but a giant availableNow first wave in
    one batch must stay a shuffle join, not a corpus-sized broadcast.
    Source-level pin because the write path only exists mid-batch."""
    import cdc_platform_spark.streaming.span_index as m

    src = open(m.__file__).read()
    assert "F.broadcast" not in src, (
        "span_index re-introduced a forced broadcast hint; the r12 verdict "
        "adjudicated these joins to AQE"
    )


# --- property-based tier (hypothesis): ANY CDC sequence converges ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# texts over a 4-word vocabulary, lengths straddling SPAN_NGRAM, so
# cross-document shared spans (and df-threshold crossings on every
# update/delete) occur constantly; doc_id domain small so updates and
# deletes really collide
span_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),                      # doc_id
        st.sampled_from(["c", "u", "d"]),
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=16,
).map(
    lambda rows: [
        (off, did, op, " ".join(ws) if op != "d" else None)
        for off, (did, op, ws) in enumerate(rows)
    ]
)


def oracle_spans(events):
    """Single-delivery pure-Python oracle: latest text per doc, live docs'
    DISTINCT word-SPAN_NGRAM-grams, df over docs, per-doc shared count."""
    latest: dict[int, tuple] = {}
    for off, did, op, text in events:
        if did not in latest or off > latest[did][0]:
            latest[did] = (off, op, text)
    grams: dict[int, set] = {}
    for did, (off, op, text) in latest.items():
        if op == "d":
            continue
        ws = text.split(" ") if text else []
        if len(ws) >= SPAN_NGRAM:
            grams[did] = {
                " ".join(ws[i : i + SPAN_NGRAM])
                for i in range(len(ws) - SPAN_NGRAM + 1)
            }
    df: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    return {
        did: (len(gs), sum(1 for g in gs if df[g] >= 2))
        for did, gs in grams.items()
    }


@given(
    events=span_events_strategy,
    split_seed=st.integers(0, 2**16),
    n_batches=st.integers(1, 4),
    shuffle_batches=st.booleans(),
    replay_suffix=st.booleans(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_span_stats_converge_under_any_batching(
    spark, tmp_path_factory, events, split_seed, n_batches, shuffle_batches, replay_suffix
):
    """The maintained span view must equal the single-delivery pure-Python
    oracle under ANY partition of the CDC log into micro-batches, ANY
    batch ordering, and ANY replay duplication — randomized pressure on
    the retraction + df-crossing-propagation paths the targeted wave
    tests pin by hand."""
    import random

    rng = random.Random(split_seed)
    batches: list[list] = [[] for _ in range(n_batches)]
    for ev in events:
        batches[rng.randrange(n_batches)].append(ev)
    if replay_suffix and events:
        batches[rng.randrange(n_batches)].extend(events[-max(1, len(events) // 3):])
    if shuffle_batches:
        rng.shuffle(batches)

    sink = BucketedSpanIndexSink(
        str(tmp_path_factory.mktemp("spanprop") / "state"), n_buckets=4
    )
    for batch in batches:
        if batch:
            sink.write(
                spark.createDataFrame(
                    [(did, off, op, text) for off, did, op, text in batch],
                    _BATCH_SCHEMA,
                )
            )

    assert _got(spark, sink) == oracle_spans(events)
