"""Incremental embedding near-duplicate detection under CDC updates.

The streaming counterpart of the batch ``dedup_embedding_cosine``
operator: maintain, under an embedding CDC stream, the per-vector
BEST-NEIGHBOR view (nearest live vector by exact cosine among its SRP-LSH
band-mates, duplicate-flagged at the threshold) — the view a curation
pipeline consults to drop embedding-level near-dups.

Best-neighbor semantics make this a different maintenance problem from
the pair views: an update to vector X can invalidate OTHER vectors'
answers in two non-local ways —
  (1) X becomes a better neighbor for some vector Z it now shares a band
      with (discovered by probing the band view with X's new band keys),
  (2) X was the stored best of some vector Y and moved away or was
      deleted (no band collision reveals Y).
Case (2) is solved with REVERSE POINTERS: every best row (k=Y, o=X) is
stored together with a mirror marker (k=X, o=Y, rev=true) in X's bucket,
so "whose answer references a touched vector" is a pruned read of the
touched vectors' buckets — never a scan.

Per micro-batch (all reads DPP-pruned to the buckets they touch):
  1. latest-per-vec rows -> fixed-point norm + banded SRP signature
     (the exact ``srp_bands`` expressions of the batch operator),
     merged into the bucketed signature index (tombstones retained),
  2. band view: add the batch's band rows (superset maintenance with
     opportunistic cleaning, exact via the currency check, same design
     as the MinHash band view),
  3. recompute set T2 = batch vecs ∪ band-mates of their new signatures
     ∪ reverse-pointer targets of the batch vecs,
  4. for each live vector in T2: candidates = its current band-mates
     (probe pruned to its band buckets, currency-checked), exact
     fixed-point cosine, window best,
  5. best view: retract every row (k ∈ T2, rev=false) and every mirror
     (o ∈ T2, rev=true), add the fresh best rows + mirrors — per-bucket
     copy-on-write with dead markers for retraction-emptied buckets.

``view()`` equals the batch ``dedup_embedding_cosine`` over the live
post-CDC vectors — the driver query's oracle states exactly that.
Reference semantics: J1/W2 keyed materialization applied to a derived
answer table (``/root/reference/src/cdc_platform/sinks/iceberg.py:187-197``).

The touched/t2 semi/anti joins carry NO broadcast hint (verdict r12/r13,
same contract as the span and session sinks): under bounded triggers both
sets are micro-batch-proportional and AQE broadcasts them at runtime
anyway, while a giant ``availableNow`` first wave in one batch stays a
shuffle join instead of forcing a corpus-sized broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import materialize
from cdc_platform_spark.operators.dedup import (
    COSINE_DUP_THRESHOLD,
    dot_long,
    srp_bands,
)
from cdc_platform_spark.streaming.pipeline import (
    BucketedUpsertSink,
    _BucketStore,
)

_VIEW_SCHEMA = "vec_id long, nn_id long, cosine double, is_dup long"


class _VecIndexSink(BucketedUpsertSink):
    """Signature index: latest (vec_id, offset, op, a, norm, bvals) per
    vector, bucketed by ``hash(vec_id)``; ``bvals`` is the 8-entry SRP
    band-value array (NULL for tombstones and zero-norm vectors)."""

    _KEY = "vec_id"
    _COLS = ["vec_id", "offset", "op", "a", "norm", "bvals"]
    _STATE_SCHEMA = (
        "vec_id long, offset long, op string, "
        "a array<long>, norm long, bvals array<long>"
    )


class CosineNeighborIndexSink:
    """Materialized best-cosine-neighbor view over an embedding CDC
    stream of (vec_id, offset, op, a)."""

    def __init__(self, path: str, n_buckets: int = 16) -> None:
        self.index = _VecIndexSink(f"{path}/index", n_buckets)
        self.bands = _BucketStore(f"{path}/bands", n_buckets)
        self.best = _BucketStore(f"{path}/best", n_buckets)
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    def _recover(self) -> None:
        self.index._recover()
        self.bands._recover()
        self.best._recover()

    def _batch_rows(self, batch: DataFrame) -> DataFrame:
        """Latest row per vec + norm + banded SRP signature (the batch
        operator's exact expressions, via srp_bands)."""
        spark = batch.sparkSession
        latest = (
            batch.filter(F.col("op").isNotNull())
            .groupBy("vec_id")
            .agg(F.max_by(F.struct("offset", "op", "a"), F.col("offset")).alias("m"))
            .select("vec_id", "m.offset", "m.op", "m.a")
        )
        norm = F.when(F.col("op") != "d", dot_long(F.col("a"), F.col("a")))
        rows = latest.withColumn("norm", norm)
        nz = rows.filter(F.col("norm") > 0).select("vec_id", "a")
        bvals = (
            srp_bands(spark, nz)
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("band", "val"))),
                    lambda x: x["val"],
                ).alias("bvals")
            )
        )
        return rows.join(bvals, "vec_id", "left").select(
            "vec_id", "offset", "op", "a", "norm", "bvals"
        )

    def _band_rows(self, src: DataFrame) -> DataFrame:
        """(vec_id, band, val, bucket) from stored bvals arrays."""
        return (
            src.filter(F.col("bvals").isNotNull())
            .select("vec_id", F.posexplode("bvals").alias("band", "val"))
            .withColumn("band", F.col("band").cast("long"))
            .withColumn("bucket", F.pmod(F.hash("band", "val"), F.lit(self.n_buckets)))
        )

    def _mates(self, spark: SparkSession, probe: DataFrame) -> DataFrame:
        """Distinct live vec_ids sharing a CURRENT band with ``probe``'s
        band rows — band-view probe pruned to the probe's buckets, each
        hit currency-checked against the partner's live signature."""
        nb = F.lit(self.n_buckets)
        if not self.bands.exists():
            return spark.createDataFrame([], "vec_id long")
        lb = self.bands.read_buckets(spark, probe).select(
            F.col("vec_id").alias("other_id"), "band", "val", "bucket"
        )
        # checkpoint: candidate hits are batch-adjacent-sized, and the frame
        # seeds the next pruned read's DPP subquery — without truncation that
        # subquery re-executes the whole band-probe lineage
        cand0 = (
            probe.join(lb, ["bucket", "band", "val"])
            .filter(F.col("vec_id") != F.col("other_id"))
            .withColumn("ob", F.pmod(F.hash("other_id"), nb))
            .transform(materialize, eager=True)
        )
        partners = (
            self.index.pruned_read(
                spark, cand0.select(F.col("ob").alias("bucket"))
            )
            .filter((F.col("op") != "d") & F.col("bvals").isNotNull())
            .select(
                F.col("vec_id").alias("other_id"),
                F.col("bucket").alias("ob"),
                F.col("bvals").alias("obvals"),
            )
        )
        return (
            cand0.join(partners, ["other_id", "ob"])
            .filter(F.element_at("obvals", (F.col("band") + 1).cast("int")) == F.col("val"))
            .select(F.col("other_id").alias("vec_id"))
            .distinct()
        )

    def write(self, batch: DataFrame) -> None:
        """Apply one micro-batch.

        Every intermediate that later seeds a pruned read's DPP subquery
        or is consumed by several jobs is an EAGER ``localCheckpoint``,
        not a ``persist``: these frames are all touched-set-sized (batch
        vectors, their band-mates, candidate hits — never the corpus),
        and truncating their lineage keeps each of the three store writes
        a shallow plan instead of re-executing the whole probe chain
        inside every DPP subquery (measured 4-6x wall-clock on the
        write path).

        Durability trade-off: localCheckpoint blocks live on executors
        only, so an executor loss mid-batch aborts the micro-batch and
        forces a full batch retry — safe (every store merge is
        replay-idempotent) but not free at scale.  On a multi-executor
        deployment where mid-batch executor churn is routine, swap the
        eager localCheckpoints for persist(MEMORY_AND_DISK_2) or a
        reliable checkpoint dir: same lineage-truncation benefit for the
        DPP subqueries, replicated blocks.  Single-JVM local mode (this
        container) has no partial-executor-loss case, so the cheaper
        form is used here."""
        if not batch.take(1):
            return  # empty/replayed-out micro-batch: all views unchanged
        self._recover()
        spark = batch.sparkSession
        nb = F.lit(self.n_buckets)

        rows = self._batch_rows(batch).transform(materialize, eager=True)
        touched = rows.select("vec_id")  # distinct by construction

        # 1. signature index merge
        self.index.write(rows)

        # 2. batch vecs' POST-MERGE rows (out-of-order safe)
        tb = touched.select(F.pmod(F.hash("vec_id"), nb).alias("bucket"))
        batch_live = (
            self.index.pruned_read(spark, tb)
            .join(touched, "vec_id", "leftsemi")
            .filter((F.col("op") != "d") & F.col("bvals").isNotNull())
            .transform(materialize, eager=True)
        )

        # 3. band view: superset maintenance with opportunistic clean
        bb = self._band_rows(batch_live)
        band_content = bb.select("vec_id", "band", "val", "bucket")
        if self.bands.exists():
            surviving = (
                self.bands.read_buckets(spark, bb)
                .join(touched, "vec_id", "leftanti")
                .select("vec_id", "band", "val", "bucket")
            )
            band_content = surviving.unionByName(band_content)
        self.bands.write_buckets(band_content.repartition(self.n_buckets, "bucket"))

        # 4. recompute set T2 = batch ∪ new-signature band-mates ∪
        # reverse-pointer targets of the batch vecs
        t2 = touched.unionByName(self._mates(spark, bb))
        if self.best.exists():
            t_rows = self.best.read_buckets(spark, tb).filter(~F.col("dead"))
            rev_targets = (
                t_rows.filter(F.col("rev"))
                .join(touched.withColumnRenamed("vec_id", "k"), "k", "leftsemi")
                .select(F.col("o").alias("vec_id"))
            )
            t2 = t2.unionByName(rev_targets)
        t2 = t2.distinct().transform(materialize, eager=True)
        t2b = t2.select(F.pmod(F.hash("vec_id"), nb).alias("bucket"))

        # 5. recompute best for the live T2 vectors: candidates from
        # their current band rows, exact cosine, window best
        t2_live = (
            self.index.pruned_read(spark, t2b)
            .join(t2, "vec_id", "leftsemi")
            .filter((F.col("op") != "d") & F.col("bvals").isNotNull())
            .transform(materialize, eager=True)
        )
        qb = self._band_rows(t2_live)
        fresh = spark.createDataFrame([], "k long, o long, cosine double")
        if self.bands.exists():
            lb = self.bands.read_buckets(spark, qb).select(
                F.col("vec_id").alias("other_id"), "band", "val", "bucket"
            )
            cand0 = (
                qb.join(lb, ["bucket", "band", "val"])
                .filter(F.col("vec_id") != F.col("other_id"))
                .withColumn("ob", F.pmod(F.hash("other_id"), nb))
                .transform(materialize, eager=True)
            )
            partners = (
                self.index.pruned_read(
                    spark, cand0.select(F.col("ob").alias("bucket"))
                )
                .filter((F.col("op") != "d") & F.col("bvals").isNotNull())
                .select(
                    F.col("vec_id").alias("other_id"),
                    F.col("bucket").alias("ob"),
                    F.col("bvals").alias("obvals"),
                    F.col("a").alias("oa"),
                    F.col("norm").alias("onorm"),
                )
                .transform(materialize, eager=True)
            )
            cand = (
                cand0.join(partners.select("other_id", "ob", "obvals"), ["other_id", "ob"])
                .filter(
                    F.element_at("obvals", (F.col("band") + 1).cast("int")) == F.col("val")
                )
                .select("vec_id", "other_id")
                .distinct()
            )
            scored = (
                cand.join(
                    t2_live.select("vec_id", F.col("a").alias("qa"), F.col("norm").alias("qn")),
                    "vec_id",
                )
                .withColumn("ob", F.pmod(F.hash("other_id"), nb))
                .join(partners.select("other_id", "ob", "oa", "onorm"), ["other_id", "ob"])
                .select(
                    "vec_id",
                    "other_id",
                    (
                        dot_long(F.col("qa"), F.col("oa"))
                        / (F.sqrt("qn") * F.sqrt("onorm"))
                    ).alias("cosine"),
                )
            )
            w = Window.partitionBy("vec_id").orderBy(
                F.col("cosine").desc(), F.col("other_id")
            )
            fresh = (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(
                    F.col("vec_id").alias("k"), F.col("other_id").alias("o"), "cosine"
                )
            )

        # 6. best view: retract (k ∈ T2, rev=false) and (o ∈ T2,
        # rev=true), add fresh rows + reverse mirrors
        fresh_rows = (
            fresh.withColumn("rev", F.lit(False))
            .unionByName(
                fresh.select(
                    F.col("o").alias("k"),
                    F.col("k").alias("o"),
                    F.lit(None).cast("double").alias("cosine"),
                    F.lit(True).alias("rev"),
                )
            )
            .withColumn("bucket", F.pmod(F.hash("k"), nb))
            .withColumn("dead", F.lit(False))
            .transform(materialize, eager=True)
        )
        content = fresh_rows
        if self.best.exists():
            # the mirrors of T2's old best rows live in their old
            # neighbors' buckets — read those keys first
            p_old = (
                self.best.read_buckets(spark, t2b)
                .filter(~F.col("dead") & ~F.col("rev"))
                .join(t2.withColumnRenamed("vec_id", "k"), "k", "leftsemi")
                .select(F.pmod(F.hash("o"), nb).alias("bucket"))
            )
            all_buckets = (
                t2b.unionByName(p_old)
                .unionByName(fresh_rows.select("bucket"))
                .distinct()
                .transform(materialize, eager=True)  # <= n_buckets rows
            )
            tk = t2.select(F.col("vec_id").alias("k"), F.lit(True).alias("_tk"))
            to = t2.select(F.col("vec_id").alias("o"), F.lit(True).alias("_to"))
            existing = (
                self.best.read_buckets(spark, all_buckets)
                .filter(~F.col("dead"))
                .join(tk, "k", "left")
                .join(to, "o", "left")
                # retracted rows become dead markers so buckets emptied
                # by retraction still commit their rewrite
                .withColumn(
                    "dead",
                    (~F.col("rev") & F.col("_tk").isNotNull())
                    | (F.col("rev") & F.col("_to").isNotNull()),
                )
                .select("k", "o", "cosine", "rev", "dead", "bucket")
            )
            content = existing.unionByName(fresh_rows)
        self.best.write_buckets(content.repartition(self.n_buckets, "bucket"))

    def compact(self, spark: SparkSession, tombstone_horizon: int | None = None) -> None:
        """Maintenance pass (same shape as BucketedMinHashIndexSink.compact):
        rewrite the band buckets keeping only CURRENT rows — each (vec,
        band, val) must match the live index's signature — and drop the
        best store's dead markers and superseded reverse pointers.
        Correctness never requires this (probes currency-check and the
        view filters dead rows); it reclaims the dead weight superset
        maintenance leaves in rarely-rewritten buckets.  With
        ``tombstone_horizon``, index delete tombstones older than the
        replay watermark are GC'd too (see BucketedUpsertSink.compact).
        O(index) — schedule like compaction, not per batch."""
        self._recover()
        if tombstone_horizon is not None:
            self.index.compact(spark, tombstone_horizon)
        nb = F.lit(self.n_buckets)
        if self.bands.exists():
            live = self.index.raw_state(spark).filter(
                (F.col("op") != "d") & F.col("bvals").isNotNull()
            )
            current = self._band_rows(live).select("vec_id", "band", "val", "bucket")
            self.bands.rewrite_all(current.repartition(self.n_buckets, "bucket"))
        if self.best.exists():
            kept = (
                spark.read.parquet(self.best.path)
                .filter(~F.col("dead"))
                .select("k", "o", "cosine", "rev", "dead", "bucket")
            )
            self.best.rewrite_all(kept.repartition(self.n_buckets, "bucket"))

    def view(self, spark: SparkSession) -> DataFrame:
        """(vec_id, nn_id, cosine, is_dup) for every live vector — equals
        the batch dedup_embedding_cosine over the live corpus."""
        self._recover()
        if not self.index.exists():
            # only-empty batches commit no bucket dirs: serve an empty
            # view instead of raising on the bare parquet read
            return spark.createDataFrame([], _VIEW_SCHEMA)
        live = (
            spark.read.parquet(self.index.path)
            .filter(F.col("op") != "d")
            .select("vec_id")
        )
        if not self.best.exists():
            best = spark.createDataFrame([], "vec_id long, nn_id long, cosine double")
        else:
            best = (
                spark.read.parquet(self.best.path)
                .filter(~F.col("dead") & ~F.col("rev"))
                .select(
                    F.col("k").alias("vec_id"), F.col("o").alias("nn_id"), "cosine"
                )
            )
        return live.join(best, "vec_id", "left").select(
            "vec_id",
            "nn_id",
            "cosine",
            F.when(F.col("cosine") >= COSINE_DUP_THRESHOLD, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_dup"),
        )
