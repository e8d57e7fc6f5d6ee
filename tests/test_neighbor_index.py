"""CosineNeighborIndexSink: the incrementally maintained best-neighbor
view must converge to the batch dedup_embedding_cosine recipe over the
live post-CDC vectors under any micro-batch split, including the
reverse-pointer cases (stored best updated away / deleted)."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: N812
import pytest
from pyspark.sql import Window

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    from cdc_platform_spark.operators.similarity import _fixed_embeddings

    # a 150-vector slice keeps the recompute fan-out test-sized; the planted
    # near-dups in the fixture are id-adjacent so the slice retains them
    return (
        _fixed_embeddings(spark, SF_SMOKE)
        .filter("vec_id < 150")
        .select("vec_id", "a")
        .localCheckpoint(eager=True)
    )


def _cdc_rows(e):
    wave0 = e.select(
        "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
    )
    upd = e.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        (F.col("vec_id") + 10**6).alias("offset"),
        F.lit("u").alias("op"),
        F.reverse("a").alias("a"),
    )
    dels = e.filter(F.col("vec_id") % 5 == 1).select(
        "vec_id",
        (F.col("vec_id") + 10**6).alias("offset"),
        F.lit("d").alias("op"),
        F.lit(None).cast("array<long>").alias("a"),
    )
    return wave0.unionByName(upd).unionByName(dels)


def _batch_expected(spark, live):
    """The batch dedup_embedding_cosine recipe over a (vec_id, a) frame."""
    from cdc_platform_spark.operators.dedup import (
        COSINE_DUP_THRESHOLD,
        dot_long,
        srp_bands,
    )

    e = live.withColumn("norm", dot_long(F.col("a"), F.col("a"))).localCheckpoint(eager=True)
    nz = e.filter(F.col("norm") > 0)
    bands = srp_bands(spark, nz)
    a, b = bands.alias("ba"), bands.alias("bb")
    cand = (
        a.join(
            b,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.val") == F.col("bb.val"))
            & (F.col("ba.vec_id") != F.col("bb.vec_id")),
        )
        .select(F.col("ba.vec_id").alias("ia"), F.col("bb.vec_id").alias("ib"))
        .distinct()
    )
    x = nz.select(F.col("vec_id").alias("ia"), F.col("a").alias("xa"), F.col("norm").alias("nx"))
    y = nz.select(F.col("vec_id").alias("ib"), F.col("a").alias("ya"), F.col("norm").alias("ny"))
    w = Window.partitionBy("ia").orderBy(F.col("c").desc(), F.col("ib"))
    best = (
        cand.join(x, "ia")
        .join(y, "ib")
        .withColumn("c", dot_long(F.col("xa"), F.col("ya")) / (F.sqrt("nx") * F.sqrt("ny")))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("ia", F.col("ib").alias("nn_id"), F.col("c"))
    )
    return (
        e.select("vec_id")
        .join(best, e.vec_id == best.ia, "left")
        .select(
            "vec_id",
            "nn_id",
            F.col("c").alias("cosine"),
            F.when(F.col("c") >= COSINE_DUP_THRESHOLD, 1).otherwise(0).cast("long").alias("is_dup"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("vec_id", "nn_id", "cosine", "is_dup").collect()))


def test_view_converges_under_any_batching(spark, tmp_path, emb):
    from cdc_platform_spark.streaming.neighbor_index import CosineNeighborIndexSink

    rows = _cdc_rows(emb).localCheckpoint(eager=True)
    live = (
        rows.groupBy("vec_id")
        .agg(F.max_by(F.struct("offset", "op", "a"), F.col("offset")).alias("m"))
        .select("vec_id", "m.op", "m.a")
        .filter("op != 'd'")
        .select("vec_id", "a")
    )
    expected = _rows(_batch_expected(spark, live))
    assert expected and any(r[1] is not None for r in expected)

    sink = CosineNeighborIndexSink(str(tmp_path / "nn"), n_buckets=8)
    batches = [rows.filter(F.pmod(F.col("offset"), F.lit(3)) == k) for k in range(3)]
    for b in batches:
        sink.write(b)
    assert _rows(sink.view(spark)) == expected
    sink.write(batches[0])  # at-least-once redelivery must be a no-op
    assert _rows(sink.view(spark)) == expected


def test_compact_reclaims_band_rows_dead_markers_and_tombstones(spark, tmp_path, emb):
    """compact() must shrink the band view to exactly the live current
    rows, drop the best store's dead markers, and (with a horizon) GC
    index tombstones — all without changing the served view, and the
    stream must continue correctly afterwards."""
    from cdc_platform_spark.streaming.neighbor_index import CosineNeighborIndexSink

    rows = _cdc_rows(emb).localCheckpoint(eager=True)
    sink = CosineNeighborIndexSink(str(tmp_path / "nn"), n_buckets=8)
    sink.write(rows.filter(F.col("op") == "c"))
    sink.write(rows.filter(F.col("op") == "u"))
    # a delete-only batch is the guaranteed stale-row generator: it emits
    # no band rows, so it rewrites no band bucket and the deleted vectors'
    # rows stay until compaction
    sink.write(rows.filter(F.col("op") == "d"))
    view_before = _rows(sink.view(spark))

    def n_bands():
        return spark.read.parquet(sink.bands.path).count()

    def band_bytes():
        import pathlib

        return sum(
            p.stat().st_size for p in pathlib.Path(sink.bands.path).rglob("*.parquet")
        )

    live = spark.read.parquet(sink.index.path).filter(
        (F.col("op") != "d") & F.col("bvals").isNotNull()
    )
    n_current = live.select("vec_id", F.posexplode("bvals")).count()
    assert n_bands() > n_current, "updates/deletes should leave stale band rows"
    assert spark.read.parquet(sink.best.path).filter("dead").count() > 0
    assert spark.read.parquet(sink.index.path).filter("op = 'd'").count() > 0
    bytes_before = band_bytes()

    sink.compact(spark, tombstone_horizon=10**9)
    assert n_bands() == n_current
    assert band_bytes() < bytes_before, "compaction must reclaim band storage"
    assert spark.read.parquet(sink.best.path).filter("dead").count() == 0
    assert spark.read.parquet(sink.index.path).filter("op = 'd'").count() == 0
    assert _rows(sink.view(spark)) == view_before

    # a replayed batch older than the horizon cannot resurrect GC'd keys
    sink.write(rows)
    assert _rows(sink.view(spark)) == view_before

    # and genuinely new data above the horizon still flows
    fresh = spark.createDataFrame(
        [(10**6, 2 * 10**9, "d", None)],
        "vec_id long, offset long, op string, a array<long>",
    )
    sink.write(fresh)  # unknown key delete: view unchanged, no crash
    assert _rows(sink.view(spark)) == view_before


def test_reverse_pointer_heals_best_on_partner_delete(spark, tmp_path, emb):
    """Deleting a vector that is someone's stored best must trigger that
    vector's recompute even though the delete emits no band rows."""
    from cdc_platform_spark.streaming.neighbor_index import CosineNeighborIndexSink

    inserts = emb.select(
        "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
    ).localCheckpoint(eager=True)
    sink = CosineNeighborIndexSink(str(tmp_path / "nn"), n_buckets=8)
    sink.write(inserts)
    first = sink.view(spark).filter("nn_id is not null").orderBy("vec_id").first()
    victim = first["nn_id"]

    dele = spark.createDataFrame(
        [(int(victim), 10**9, "d", None)],
        "vec_id long, offset long, op string, a array<long>",
    )
    sink.write(dele)
    got = _rows(sink.view(spark))
    live = inserts.filter(F.col("vec_id") != int(victim)).select("vec_id", "a")
    assert got == _rows(_batch_expected(spark, live))
    assert all(r[1] != victim for r in got), "deleted vector still referenced as best"


def test_view_converges_on_random_cdc_property(spark, tmp_path):
    """Property form: random small vector corpora (with planted copies so
    exact-dup cosine pairs exist), random update/delete/copy patterns,
    random batching and a redelivery — the maintained view must equal the
    batch recipe over the final live vectors every time."""
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cdc_platform_spark.operators.dedup import EMB_DIM
    from cdc_platform_spark.streaming.neighbor_index import CosineNeighborIndexSink

    counter = [0]

    @given(
        n_vecs=st.integers(4, 8),
        ops=st.lists(
            st.tuples(st.sampled_from(["u", "d", "c"]), st.integers(0, 7)),
            min_size=2,
            max_size=8,
        ),
        seed=st.integers(0, 2**16),
        n_batches=st.integers(1, 3),
    )
    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    def run(n_vecs, ops, seed, n_batches):
        rng = random.Random(seed)

        def vec(s):
            r = random.Random(s)
            return [r.randrange(-3, 4) * 1000000 for _ in range(EMB_DIM)]

        base = {i: vec(1000 + i) for i in range(n_vecs)}
        base[1] = list(base[0])  # planted exact dup: cosine-1 pair exists
        events = [(i, i, "c", base[i]) for i in range(n_vecs)]
        off = n_vecs
        for op, pick in ops:
            d = pick % n_vecs
            if op == "u":
                events.append((d, off, "u", vec(5000 + off)))
            elif op == "c":  # copy another vector: creates/moves a dup pair
                events.append((d, off, "u", list(base[(pick + 1) % n_vecs])))
            else:
                events.append((d, off, "d", None))
            off += 1

        schema = "vec_id long, offset long, op string, a array<long>"
        rows = spark.createDataFrame(events, schema).localCheckpoint(eager=True)
        live = (
            rows.groupBy("vec_id")
            .agg(F.max_by(F.struct("offset", "op", "a"), F.col("offset")).alias("m"))
            .select("vec_id", "m.op", "m.a")
            .filter("op != 'd'")
            .select("vec_id", "a")
        )
        expected = _rows(_batch_expected(spark, live))

        counter[0] += 1
        sink = CosineNeighborIndexSink(
            str(tmp_path / f"nn{counter[0]}"), n_buckets=4
        )
        batches = [[] for _ in range(n_batches)]
        for ev in events:
            batches[rng.randrange(n_batches)].append(ev)
        for b in batches:
            if b:
                sink.write(spark.createDataFrame(b, schema))
        if rng.random() < 0.5 and batches[0]:
            sink.write(spark.createDataFrame(batches[0], schema))  # redelivery
        got = _rows(sink.view(spark))
        assert got == expected, f"view diverged: {got} vs {expected}"

    run()
