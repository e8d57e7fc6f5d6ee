"""Read-only serving mode: a serve process must NEVER mutate a live
corpus state dir.

The writer's crash-recovery renames (tmp sweeps, ``.old-*`` restores,
journal rollback) are safe exactly once — run by the pipeline process
before it writes.  A concurrent serving process running them can delete
the writer's in-flight ``.tmp-*`` batch or race its two-rename swap.
``read_only=True`` disarms all of it: recovery inspects and either
passes (state consistent) or raises the retriable
:class:`StateInFlightError` (state mid-commit), and every write path
refuses.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.streaming.dedup_index import CuratedCorpusSink
from cdc_platform_spark.streaming.pipeline import StateInFlightError
from tests.conftest import SF_SMOKE


def _write_corpus(spark, root: str) -> CuratedCorpusSink:
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.col("doc_id").alias("offset"),
        F.lit("c").alias("op"),
        "text",
        "lang",
        "source",
    )
    sink = CuratedCorpusSink(root, n_buckets=4)
    sink.write(d)
    return sink


def _tree_snapshot(root: str) -> set[str]:
    out = set()
    for dirpath, dirnames, filenames in os.walk(os.path.dirname(root)):
        for n in dirnames + filenames:
            out.add(os.path.join(dirpath, n))
    return out


def test_read_only_serving_reads_without_mutation(spark, tmp_path):
    """Every serving read works through a read_only sink, and the state
    tree is byte-for-byte untouched afterwards — including a planted
    in-flight ``.tmp-*`` dir (a writer's half-written batch) and a
    completed-swap ``.old-*`` leftover, both of which WRITER-mode
    recovery would delete."""
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)

    # plant writer-in-flight artifacts a read-only recovery must not touch
    tmp_dir = f"{root}/index.tmp-feedbeef"
    os.makedirs(f"{tmp_dir}/bucket=0")
    with open(f"{tmp_dir}/bucket=0/part-0.parquet", "w") as fh:
        fh.write("in-flight")
    work = f"{root}/index.work"
    os.makedirs(work, exist_ok=True)
    # completed swap: live bucket exists, displaced snapshot is garbage —
    # consistent state, read-only must pass WITHOUT deleting it
    os.makedirs(f"{work}/bucket=0.old-cafe", exist_ok=True)

    before = _tree_snapshot(root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    assert ro.curated(spark).count() > 0
    assert ro.mix_sample(spark).count() > 0
    assert ro.mix_sample_tokens(spark).count() > 0
    assert ro.shard_manifest(spark).count() > 0
    ro.contamination_report(spark).count()
    ro.clusters(spark).count()
    assert _tree_snapshot(root) == before, "read-only serve mutated state"


def test_read_only_raises_on_pending_journal(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    work = f"{root}/index.work"
    os.makedirs(work, exist_ok=True)
    # mid-commit journal (tmp dir still present = commit point NOT
    # reached, live buckets may mix old and new): refuse
    os.makedirs(f"{root}/index.tmp-dead", exist_ok=True)
    with open(f"{work}/commit-dead.json", "w") as fh:
        json.dump({"tmp": f"{root}/index.tmp-dead", "run_id": "dead", "buckets": [0]}, fh)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError, match="journal"):
        ro.curated(spark).count()
    # commit point passed (tmp gone, only .old- cleanup pending): every
    # live bucket is the committed version — readable, a writer crash
    # between rmtree(tmp) and journal removal must not brick serving
    os.rmdir(f"{root}/index.tmp-dead")
    assert ro.curated(spark).count() > 0
    os.remove(f"{work}/commit-dead.json")

    # displaced snapshot with NO live bucket = mid-swap: also raises
    os.rename(f"{root}/index/bucket=0", f"{work}/bucket=0.old-dead")
    with pytest.raises(StateInFlightError, match="mid-swap"):
        ro.curated(spark).count()
    # the writer-mode sink recovers it (restores the bucket)
    CuratedCorpusSink(root, n_buckets=4)._recover()
    assert os.path.isdir(f"{root}/index/bucket=0")
    assert ro.curated(spark).count() > 0


def test_read_only_raises_on_mid_swap_flat_dir(spark, tmp_path):
    """The flat bench-gram mirror uses the two-rename swap: live missing
    + ``.old-*`` present must raise in read-only mode (writer mode
    restores it)."""
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    sink = CuratedCorpusSink(root, n_buckets=4)
    if not os.path.isdir(sink.bench_path):
        pytest.skip("fixture stream carried no benchmark docs")
    os.rename(sink.bench_path, f"{sink.bench_path}.old-dead")
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError, match="mid-swap"):
        ro.curated(spark).count()
    sink._recover()
    assert os.path.isdir(sink.bench_path)


def test_read_only_raises_on_decon_rebuild_marker(spark, tmp_path):
    """The ``_decon-inflight`` marker brackets a writer batch from the
    first store commit through _maintain_decon_hits: while it exists a
    read-only serve of the DECON-DEPENDENT views must refuse rather than
    join post-batch triples against pre-batch base rows — but curated()
    (consistent once the base stores marker clears) must stay available."""
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    sink = CuratedCorpusSink(root, n_buckets=4)
    sink._set_marker(sink._decon_marker)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError, match="decontamination"):
        ro.contamination_report(spark).count()
    with pytest.raises(StateInFlightError, match="decontamination"):
        ro.decontaminated(spark).count()
    # non-decon views do not block on the decon straddle window
    assert ro.curated(spark).count() > 0
    sink._clear_marker(sink._decon_marker)
    ro.contamination_report(spark).count()


def test_read_only_refuses_writes(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    batch = spark.createDataFrame(
        [(1, 1, "c", "a b c d e f g h i j", "en", "web")],
        "doc_id long, offset long, op string, text string, lang string, source string",
    )
    with pytest.raises(RuntimeError, match="read_only"):
        ro.write(batch)


def test_ann_index_read_only_serving(spark, tmp_path):
    """The ANN serving path shares the read-only contract: a read_only
    BucketedIvfFlatIndexSink serves ivf_search_from_index without
    mutating, raises on a planted mid-commit journal, and refuses
    writes."""
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        ivf_search_from_index,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    vecs = e.select(
        "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
    )
    cents = train_ivf_centroids(e)
    root = str(tmp_path / "ivf")
    BucketedIvfFlatIndexSink(root, cents, n_buckets=4).write(vecs)

    ro = BucketedIvfFlatIndexSink(root, cents, n_buckets=4, read_only=True)
    before = _tree_snapshot(root)
    assert ivf_search_from_index(ro.state(spark), cents).count() > 0
    assert _tree_snapshot(root) == before

    with pytest.raises(RuntimeError, match="read_only"):
        ro.write(vecs.limit(1))

    work = f"{root}.work"
    os.makedirs(work, exist_ok=True)
    os.makedirs(f"{root}.tmp-dead", exist_ok=True)  # tmp present = mid-commit
    with open(f"{work}/commit-dead.json", "w") as fh:
        json.dump({"tmp": f"{root}.tmp-dead", "run_id": "dead", "buckets": [0]}, fh)
    with pytest.raises(StateInFlightError, match="journal"):
        ro.state(spark).count()


def test_ann_search_cli_serves_generation(spark, tmp_path, capsys):
    """`cdc-spark ann-search` end-to-end: index built + quantizer
    persisted (save_quantizer), generation resolved via the CURRENT
    pointer, served read-only; --queries takes an external parquet batch
    (own id namespace: an external query equal to a corpus vector must
    get that vector back as its top hit, not have it self-excluded)."""
    from cdc_platform_spark.cli import main
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        save_quantizer,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    gen = str(tmp_path / "gens" / "g1")
    sink = BucketedIvfFlatIndexSink(gen, cents, n_buckets=4)
    sink.write(
        e.select("vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a")
    )
    save_quantizer(gen, cents)
    root = str(tmp_path / "gens")
    with open(f"{root}/CURRENT", "w") as fh:
        fh.write(gen)

    rc = main(["ann-search", root, "--n-buckets", "4", "--limit", "5"])
    assert rc == 0
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out and {"query_id", "rank", "neighbor_id", "cosine"} <= set(out[0])
    assert all(r["neighbor_id"] != r["query_id"] for r in out)

    # external queries: reuse two corpus embeddings under external ids
    qdir = str(tmp_path / "queries")
    spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(2).select(
        (F.col("vec_id") + 10**9).alias("vec_id"), "embedding"
    ).write.parquet(qdir)
    rc = main(["ann-search", root, "--queries", qdir, "--n-buckets", "4", "--limit", "4"])
    assert rc == 0
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    top = [r for r in out if r["rank"] == 1]
    assert top and all(
        r["neighbor_id"] == r["query_id"] - 10**9 and abs(r["cosine"] - 1.0) < 1e-9
        for r in top
    ), f"external query should find its corpus twin at rank 1: {top}"

    # quantizer missing -> clear error, not a retrain or a crash
    bare = str(tmp_path / "bare")
    BucketedIvfFlatIndexSink(bare, cents, n_buckets=4).write(
        e.limit(4).select(
            "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
        )
    )
    assert main(["ann-search", bare, "--n-buckets", "4"]) == 1
    assert "quantizer" in capsys.readouterr().err

    # mid-commit journal (tmp dir present) -> retriable exit 2
    work = f"{gen}.work"
    os.makedirs(work, exist_ok=True)
    os.makedirs(f"{gen}.tmp-dead", exist_ok=True)
    with open(f"{work}/commit-dead.json", "w") as fh:
        json.dump({"tmp": f"{gen}.tmp-dead", "run_id": "dead", "buckets": [0]}, fh)
    assert main(["ann-search", root, "--n-buckets", "4"]) == 2
    assert "retriable" in capsys.readouterr().err
    os.remove(f"{work}/commit-dead.json")


def test_ann_search_cli_pq_mode(spark, tmp_path, capsys):
    """`cdc-spark ann-search --pq-index`: IVF-ADC served from the PQ
    composite generation (codes scored against the broadcast query
    distance table, vectors read only for the rerank survivors), with
    the full (centroids, codebooks, ranks) triple loaded from the PQ
    generation's persisted quantizer."""
    from pyspark.sql import Window

    from cdc_platform_spark.cli import main
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        pq_seeds,
        pq_subvectors,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        BucketedIvfPqIndexSink,
        save_quantizer,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    seeds = pq_seeds(e)
    cb = train_pq_codebooks(pq_subvectors(e.select("vec_id", "a")), seeds)
    rk = seeds.withColumn(
        "code", (F.row_number().over(Window.orderBy("cent_id")) - 1).cast("long")
    )
    rows = e.select(
        "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
    )
    vec_root = str(tmp_path / "vec")
    pq_root = str(tmp_path / "pq")
    BucketedIvfFlatIndexSink(vec_root, cents, n_buckets=4).write(rows)
    BucketedIvfPqIndexSink(pq_root, cents, cb, rk, n_buckets=4).write(rows)
    save_quantizer(vec_root, cents)
    save_quantizer(pq_root, cents, cb, rk)

    rc = main(
        ["ann-search", vec_root, "--pq-index", pq_root, "--n-buckets", "4", "--limit", "5"]
    )
    assert rc == 0
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out and {"query_id", "rank", "neighbor_id", "cosine"} <= set(out[0])

    # a PQ root whose quantizer lacks codebooks is a clear config error
    save_quantizer(pq_root, cents)  # overwrite with centroids-only
    assert (
        main(["ann-search", vec_root, "--pq-index", pq_root, "--n-buckets", "4"]) == 1
    )
    assert "codebooks" in capsys.readouterr().err


def test_ann_search_cli_retry_reloads_quantizer(spark, tmp_path, monkeypatch):
    """Regression (ADVICE r11, cli.py ann-search): a live-root quantizer
    swap mid-attempt must make the RETRY reload centroids — the old code
    captured the first load's tables (and sinks built from them) in the
    closure, so the retry probed the NEW index with the OLD in-memory
    quantizer and, once the writer idled, run_stable returned silently
    wrong neighbors.  The spy swaps the quantizer while attempt 1 is in
    flight (inside the fingerprint bracket) and asserts attempt 2 loads
    the swapped table instead of reusing the captured one."""
    import cdc_platform_spark.streaming.ann_index as ann
    from cdc_platform_spark.cli import main
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    root = str(tmp_path / "live")
    sink = ann.BucketedIvfFlatIndexSink(root, cents, n_buckets=4)
    sink.write(
        e.select("vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a")
    )
    ann.save_quantizer(root, cents)
    n_full = cents.count()
    swapped = cents.limit(2).localCheckpoint(eager=True)

    real_load = ann.load_quantizer
    loaded_counts: list[int] = []

    def loading_spy(spark_, path, read_only=True):
        out = real_load(spark_, path, read_only=read_only)
        loaded_counts.append(out[0].count())
        if len(loaded_counts) == 1:
            # the writer swaps the quantizer while attempt 1 is in flight
            ann.save_quantizer(root, swapped)
        return out

    monkeypatch.setattr(ann, "load_quantizer", loading_spy)
    rc = main(["ann-search", root, "--n-buckets", "4", "--limit", "3"])
    assert rc == 0
    assert loaded_counts[0] == n_full
    # the bracket moved, so there WAS a retry, and it loaded the swapped
    # 2-centroid quantizer — not the captured first-attempt copy
    assert len(loaded_counts) >= 2 and loaded_counts[-1] == 2, loaded_counts


def test_read_only_projection_refuses_bucket_writes(spark, tmp_path):
    """Every _BucketStore publish path refuses under read_only — including
    the delta-refresh overwrite_buckets that IvfCellProjection uses (the
    path a serving-opened projection must never take)."""
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        IvfCellProjection,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    primary = BucketedIvfFlatIndexSink(str(tmp_path / "ix"), cents, n_buckets=4)
    primary.write(
        e.select("vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a")
    )
    IvfCellProjection(str(tmp_path / "proj")).refresh(primary.state(spark))

    ro = IvfCellProjection(str(tmp_path / "proj"), read_only=True)
    assert ro.search(
        spark, cents, primary.state(spark).limit(2).select(
            F.col("vec_id").alias("qid"), F.col("a").alias("qa")
        )
    ).count() >= 0
    with pytest.raises(RuntimeError, match="read_only"):
        ro.refresh(primary.state(spark), cells=[0])
    with pytest.raises(RuntimeError, match="read_only"):
        ro.refresh(primary.state(spark))


def test_quantizer_crash_heals_on_next_writer_touch(spark, tmp_path):
    """A crash between save_quantizer's two renames leaves the quantizer
    displaced: load_quantizer (read-only) raises retriably, and BOTH
    writer paths heal it — the sink's own _recover (next micro-batch) and
    the next save_quantizer."""
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        load_quantizer,
        save_quantizer,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    p = str(tmp_path / "ix")
    sink = BucketedIvfFlatIndexSink(p, cents, n_buckets=4)
    sink.write(
        e.select("vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a")
    )
    save_quantizer(p, cents)

    # simulate the mid-swap crash: live displaced, not yet replaced
    os.rename(f"{p}.quantizer", f"{p}.quantizer.old-dead")
    with pytest.raises(StateInFlightError, match="mid-swap"):
        load_quantizer(spark, p)
    # writer path 1: the sink's recovery restores the displaced snapshot
    sink._recover()
    assert load_quantizer(spark, p)[0].count() == cents.count()

    # crash again + an orphaned tmp: writer path 2, save_quantizer heals
    os.rename(f"{p}.quantizer", f"{p}.quantizer.old-dead2")
    os.makedirs(f"{p}.quantizer.tmp-orphan", exist_ok=True)
    save_quantizer(p, cents)
    assert not os.path.exists(f"{p}.quantizer.tmp-orphan")
    assert load_quantizer(spark, p)[0].count() == cents.count()


def test_ann_search_cli_bad_queries_path(spark, tmp_path, capsys):
    from cdc_platform_spark.cli import main
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        save_quantizer,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    p = str(tmp_path / "ix")
    BucketedIvfFlatIndexSink(p, cents, n_buckets=4).write(
        e.limit(4).select(
            "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
        )
    )
    save_quantizer(p, cents)
    rc = main(["ann-search", p, "--queries", str(tmp_path / "nope"), "--n-buckets", "4"])
    assert rc == 1
    assert "query parquet" in capsys.readouterr().err


def test_quantizer_roundtrip_and_rotation_persists(spark, tmp_path):
    """save_quantizer/load_quantizer roundtrip (centroids-only and full
    PQ triple), and rotate_ivf_generation persists the new generation's
    quantizer so it is self-describing."""
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import (
        BucketedIvfFlatIndexSink,
        load_quantizer,
        rotate_ivf_generation,
        save_quantizer,
    )
    from tests.conftest import SF_SMOKE

    e = _fixed_embeddings(spark, SF_SMOKE).localCheckpoint(eager=True)
    cents = train_ivf_centroids(e)
    p = str(tmp_path / "ix")
    save_quantizer(p, cents)
    got, cb, rk = load_quantizer(spark, p)
    assert cb is None and rk is None
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, cents.collect()))

    old = BucketedIvfFlatIndexSink(str(tmp_path / "g1"), cents, n_buckets=4)
    old.write(
        e.select("vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a")
    )
    new = rotate_ivf_generation(spark, old, str(tmp_path / "g2"), cents)
    got2, _, _ = load_quantizer(spark, new.path)
    assert got2.count() == cents.count()


def test_read_only_constructor_creates_nothing(tmp_path):
    root = str(tmp_path / "nonexistent")
    CuratedCorpusSink(root, n_buckets=4, read_only=True)
    assert not os.path.isdir(root)


def test_cli_serve_mid_commit_returns_retriable(spark, tmp_path, capsys):
    from cdc_platform_spark.cli import main

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    work = f"{root}/index.work"
    os.makedirs(work, exist_ok=True)
    os.makedirs(f"{root}/index.tmp-dead", exist_ok=True)  # mid-commit
    with open(f"{work}/commit-dead.json", "w") as fh:
        json.dump({"tmp": f"{root}/index.tmp-dead", "run_id": "dead", "buckets": [0]}, fh)
    rc = main(["serve", "curated", root, "--n-buckets", "4", "--limit", "1"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "retriable" in err
    # and the journal is still there for the writer to resolve
    assert os.path.exists(f"{work}/commit-dead.json")


def test_collect_stable_retries_on_fingerprint_change():
    """The check-read-recheck protocol (no Spark needed): a fingerprint
    change across the collect retries; a change plus a read error retries;
    an error with an UNCHANGED fingerprint propagates; persistent overlap
    exhausts into a retriable StateInFlightError."""
    from cdc_platform_spark.cli import _collect_stable

    class FakeDF:
        def __init__(self, rows, exc=None):
            self.rows, self.exc = rows, exc

        def collect(self):
            if self.exc:
                raise self.exc
            return self.rows

    # stable state: one attempt suffices
    assert _collect_stable(lambda: FakeDF([1, 2]), lambda: ("g1",)) == [1, 2]

    # commit lands mid-read once, then state is stable: second attempt wins
    fps = iter([("g1",), ("g2",), ("g2",), ("g2",)])
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return FakeDF([calls["n"]])

    assert _collect_stable(build, lambda: next(fps)) == [2]

    # swapped-bucket read error WITH a fingerprint change: retried
    dfs = iter([FakeDF(None, exc=OSError("bucket gone")), FakeDF([7])])
    fps2 = iter([("a",), ("b",), ("b",), ("b",)])
    assert _collect_stable(lambda: next(dfs), lambda: next(fps2)) == [7]

    # read error with UNCHANGED fingerprint: a real failure, propagates
    with pytest.raises(OSError, match="disk"):
        _collect_stable(lambda: FakeDF(None, exc=OSError("disk")), lambda: ("g",))

    # every attempt overlapped by a commit: retriable exhaustion
    counter = {"n": 0}

    def always_changing():
        counter["n"] += 1
        return (counter["n"],)

    with pytest.raises(StateInFlightError, match="retry"):
        _collect_stable(lambda: FakeDF([0]), always_changing, attempts=3)

    # mid-commit at build time: StateInFlightError propagates untouched
    def inflight_build():
        raise StateInFlightError("mid-commit")

    with pytest.raises(StateInFlightError, match="mid-commit"):
        _collect_stable(inflight_build, lambda: ("g",))


def test_state_fingerprint_tracks_commits_and_markers(spark, tmp_path):
    """state_fingerprint() must change across a writer commit (bucket
    replacement) and flip with the in-flight markers — the two signals
    _collect_stable brackets a serving read with."""
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    fp0 = ro.state_fingerprint()
    assert fp0 == ro.state_fingerprint()  # pure read, deterministic

    sink = CuratedCorpusSink(root, n_buckets=4)
    sink._set_marker(sink._stores_marker)
    assert ro.state_fingerprint() != fp0
    sink._clear_marker(sink._stores_marker)
    sink._set_marker(sink._decon_marker)
    assert ro.state_fingerprint() != fp0
    sink._clear_marker(sink._decon_marker)
    assert ro.state_fingerprint() == fp0

    batch = spark.createDataFrame(
        [(990001, 999, "c", "zz yy xx ww vv uu tt ss rr qq", "en", "web")],
        "doc_id long, offset long, op string, text string, lang string, source string",
    )
    sink.write(batch)
    assert ro.state_fingerprint() != fp0


def test_export_retries_on_torn_fingerprint(spark, tmp_path):
    """A fingerprint change bracketing the export commit means a writer
    swap overlapped the lazy source read: the torn snapshot is
    un-committed (it was never published, so nothing can have pinned it)
    and the export retries — the returned sid is the ONLY snapshot in
    the table's history."""
    from cdc_platform_spark.lakehouse.table import VersionedTable

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    sink = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    fps = iter(["fp-a", "fp-b", "fp-b", "fp-b"])  # attempt 1 torn, 2 stable
    sink.state_fingerprint = lambda scope="all": next(fps)
    table_root = str(tmp_path / "tbl")
    sid = sink.export_to_table(spark, table_root)
    t = VersionedTable(spark, table_root)
    assert t.current_snapshot_id() == sid
    assert [s["id"] for s in t.snapshots()] == [sid]
    assert t.read().count() == sink.export_docs(spark).count()


def test_export_exhaustion_leaves_no_published_snapshot(spark, tmp_path):
    """Persistent writer overlap exhausts into the retriable
    StateInFlightError, and every torn attempt is un-committed: the
    table holds NO pinnable snapshot afterwards."""
    from cdc_platform_spark.lakehouse.table import VersionedTable

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    sink = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    n = {"v": 0}

    def always_changing(scope="all"):
        n["v"] += 1
        return n["v"]

    sink.state_fingerprint = always_changing
    table_root = str(tmp_path / "tbl")
    with pytest.raises(StateInFlightError, match="retry"):
        sink.export_to_table(spark, table_root)
    t = VersionedTable(spark, table_root)
    assert t.current_snapshot_id() is None
    assert t.snapshots() == []


_LIVE_DOC = 990077
_LIVE_TEXT = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray"
)  # 24 distinct words: clears CURATION_MIN_WORDS / MIN_DISTINCT_RATIO


def _live_batch(spark):
    return spark.createDataFrame(
        [(_LIVE_DOC, 999_999, "c", _LIVE_TEXT, "en", "web")],
        "doc_id long, offset long, op string, text string, lang string, source string",
    )


def test_collect_stable_live_writer_interleave(spark, tmp_path):
    """End-to-end check-read-recheck against a REAL writer bucket swap —
    no mocked fingerprints: the first build()'s scan is bound to the
    pre-swap file listing, then a real writer batch replaces buckets
    before the collect (the exact window the in-flight markers cannot
    close).  Whatever the stale plan does — FileNotFound from the
    swapped bucket or a silently stale row set — _collect_stable must
    converge on the post-swap committed state."""
    from cdc_platform_spark.cli import _collect_stable

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    writer = CuratedCorpusSink(root, n_buckets=4)
    state = {"written": False}

    def build():
        df = ro.curated(spark)  # gate passes; scan bound to current files
        if not state["written"]:
            writer.write(_live_batch(spark))  # REAL swap before the collect
            state["written"] = True
        return df

    rows = _collect_stable(build, ro.state_fingerprint)
    assert _LIVE_DOC in {r["doc_id"] for r in rows}
    # the protocol converged in bounded attempts against a real swap
    assert state["written"]


def test_export_live_writer_interleave(spark, tmp_path):
    """Torn-export protection against a REAL writer swap: a writer batch
    lands between the export's source build and its lakehouse commit;
    the published snapshot must reflect the post-swap corpus and the
    torn attempt must not remain pinnable in history."""
    from cdc_platform_spark.lakehouse.table import VersionedTable

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    writer = CuratedCorpusSink(root, n_buckets=4)
    state = {"written": False}
    orig = ro.export_docs

    def interleaved(spark_, **kw):
        df = orig(spark_, **kw)
        if not state["written"]:
            writer.write(_live_batch(spark))
            state["written"] = True
        return df

    ro.export_docs = interleaved
    table_root = str(tmp_path / "tbl")
    sid = ro.export_to_table(spark, table_root)
    t = VersionedTable(spark, table_root)
    assert t.current_snapshot_id() == sid
    assert [s["id"] for s in t.snapshots()] == [sid]  # torn attempt un-committed
    assert _LIVE_DOC in {r["doc_id"] for r in t.read().select("doc_id").collect()}


def test_run_stable_exhaustion_chains_last_error():
    """Exhaustion must carry the last swallowed read error as __cause__ —
    a permanently failing read under a busy writer must not be silently
    misattributed to overlap."""
    from cdc_platform_spark.streaming.serving import run_stable

    n = {"v": 0}

    def always_changing():
        n["v"] += 1
        return (n["v"],)

    def broken():
        raise OSError("corrupt part-00000")

    with pytest.raises(StateInFlightError, match="retry") as ei:
        run_stable(broken, always_changing, attempts=3)
    assert isinstance(ei.value.__cause__, OSError)
    assert "corrupt" in str(ei.value.__cause__)

    # clean exhaustion (reads succeed, bracket always moves): no cause
    with pytest.raises(StateInFlightError) as ei2:
        run_stable(lambda: [1], always_changing, attempts=2)
    assert ei2.value.__cause__ is None


def test_fs_fingerprint_survives_vanishing_root(tmp_path, monkeypatch):
    """A root vanishing between two syscalls (the writer's two-rename swap
    in flight) must fingerprint as a CHANGE, never raise — the probe
    exists to survive exactly that window."""
    import os as _os

    from cdc_platform_spark.streaming.serving import fs_fingerprint

    root = tmp_path / "store"
    root.mkdir()
    (root / "bucket=0").mkdir()
    stable = fs_fingerprint([str(root)])
    assert stable == fs_fingerprint([str(root)])

    real_listdir = _os.listdir
    state = {"raced": False}

    def racing_listdir(p):
        if str(p) == str(root) and not state["raced"]:
            state["raced"] = True
            raise FileNotFoundError(p)  # swapped away mid-probe
        return real_listdir(p)

    monkeypatch.setattr(_os, "listdir", racing_listdir)
    mid_swap = fs_fingerprint([str(root)])
    assert mid_swap != stable  # reads as a changed state, not an error
    assert fs_fingerprint([str(root)]) == stable  # and heals after


def test_fingerprint_scope_ignores_decon_maintenance(spark, tmp_path):
    """A curated-family serve must not retry on decon-only state changes
    it never reads: the decon marker, hit store and bench mirror flip the
    'all' scope but leave 'text' untouched; a text-store commit flips
    BOTH scopes."""
    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    text0, all0 = ro.state_fingerprint("text"), ro.state_fingerprint("all")

    sink = CuratedCorpusSink(root, n_buckets=4)
    sink._set_marker(sink._decon_marker)
    assert ro.state_fingerprint("text") == text0
    assert ro.state_fingerprint("all") != all0
    sink._clear_marker(sink._decon_marker)

    os.makedirs(sink.hit_store.path, exist_ok=True)
    with open(f"{sink.hit_store.path}/bucket=0", "w") as fh:
        fh.write("x")
    assert ro.state_fingerprint("text") == text0
    assert ro.state_fingerprint("all") != all0
    os.remove(f"{sink.hit_store.path}/bucket=0")

    sink.write(_live_batch(spark))  # a real text-store commit
    assert ro.state_fingerprint("text") != text0
    assert ro.state_fingerprint("all") != all0


def test_export_survives_concurrent_child_of_torn_snapshot(spark, tmp_path, monkeypatch):
    """If a concurrent commit built on the torn snapshot before the
    un-commit runs, discard_snapshot refuses (leaf-only) — the export
    must swallow that, retry, and still publish a consistent snapshot."""
    from cdc_platform_spark.lakehouse.table import VersionedTable

    root = str(tmp_path / "corpus")
    _write_corpus(spark, root)
    ro = CuratedCorpusSink(root, n_buckets=4, read_only=True)
    fps = iter(["fp-a", "fp-b", "fp-b", "fp-b"])  # attempt 1 torn, 2 stable
    ro.state_fingerprint = lambda scope="all": next(fps)

    def refuse(self, sid):
        raise ValueError(f"snapshot {sid!r} has children")

    monkeypatch.setattr(VersionedTable, "discard_snapshot", refuse)
    table_root = str(tmp_path / "tbl")
    sid = ro.export_to_table(spark, table_root)
    t = VersionedTable(spark, table_root)
    assert t.current_snapshot_id() == sid  # the GOOD snapshot is HEAD
    assert t.read().count() == ro.export_docs(spark).count()


def test_ann_sink_fingerprint_tracks_commits(spark, tmp_path):
    """The bucketed ANN sinks fingerprint their state + work + quantizer
    dirs, so ann-search over a LIVE root brackets correctly."""
    from cdc_platform_spark.operators.similarity import (
        _fixed_embeddings,
        train_ivf_centroids,
    )
    from cdc_platform_spark.streaming.ann_index import BucketedIvfFlatIndexSink

    e = _fixed_embeddings(spark, SF_SMOKE)
    cents = train_ivf_centroids(e)
    vec_rows = e.select(
        "vec_id", F.col("vec_id").alias("offset"), F.lit("c").alias("op"), "a"
    )
    path = str(tmp_path / "flat")
    sink = BucketedIvfFlatIndexSink(path, cents, n_buckets=4)
    sink.write(vec_rows.limit(32))

    ro = BucketedIvfFlatIndexSink(path, cents, n_buckets=4, read_only=True)
    fp0 = ro.state_fingerprint()
    assert fp0 == ro.state_fingerprint()  # pure read, deterministic
    sink.write(
        vec_rows.filter(F.col("vec_id") >= 32).limit(16)
    )
    assert ro.state_fingerprint() != fp0
