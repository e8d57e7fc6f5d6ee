"""Incremental ANN (IVF) index maintenance under CDC updates.

The production similarity-search story at 100 TB is not "rebuild the
index nightly" — it is a materialized view: the IVF coarse quantizer is
trained once (offline, frozen for the index generation, exactly how
FAISS/SCaNN deployments version their quantizers), and the *inverted
file* — the vec_id -> cell assignment table — is maintained
incrementally as embedding rows are inserted/updated/deleted by the CDC
stream.  This composes the round-4 streaming machinery
(``AggregatingSink``'s merge-per-micro-batch + two-rename swap,
streaming/pipeline.py) with the similarity family's exact fixed-point
assignment math (operators/similarity.py): reference semantics are the
keyed-upsert sink (J1/W2, ``/root/reference/src/cdc_platform/sinks/
iceberg.py:187-197``) applied to an index artifact instead of a table.

Batch algebra per micro-batch (never rescans the corpus or the index):
  1. upserts assign ONLY the batch's vectors: broadcast the (tiny,
     n_cells x dim) centroid table over the batch, exact integer dot
     products, map-side ``max_by`` argmax — zero shuffle of the batch
     beyond the merge below,
  2. deletes become tombstones (cell = NULL) — retained in state so an
     out-of-order replay cannot resurrect a deleted vector,
  3. merge: latest row per vec_id by offset into the swapped state dir
     (same crash-recovery protocol as UpsertSink).

``state()`` is the live inverted file; reading one cell's members is a
partition-pruned scan when the state is laid out by cell — at this
scale-in-miniature it is a single dir, the BucketedUpsertSink layout is
the drop-in upgrade (bucket == cell).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.operators.dedup import dot_long
from cdc_platform_spark.streaming.pipeline import (
    _commit_swap,
    _recover_swapped_dir,
)


class IvfIndexSink:
    """Materialized IVF assignment view over an embedding CDC stream.

    ``centroids`` is the frozen coarse quantizer ``(cent_id, ca, cn)``
    (fixed-point arrays + precomputed norms, as produced by
    ``operators.similarity.train_ivf_centroids``); it is captured
    eagerly (localCheckpoint) so every micro-batch broadcasts the same
    trained table.
    """

    _COLS = ["vec_id", "offset", "op", "cell"]

    def __init__(self, path: str, centroids: DataFrame) -> None:
        self.path = path
        self.cents = centroids.localCheckpoint(eager=True)

    def _assign(self, batch: DataFrame) -> DataFrame:
        """(vec_id, offset, op, a) -> (vec_id, offset, op, cell): exact
        fixed-point max-cosine cell for upserts, NULL cell tombstones for
        deletes.  Broadcast centroids; map-side combinable argmax."""
        ups = batch.filter(F.col("op") != "d").withColumn(
            "norm", dot_long(F.col("a"), F.col("a"))
        )
        vc = ups.crossJoin(F.broadcast(self.cents)).select(
            "vec_id",
            "offset",
            "op",
            "cent_id",
            (dot_long(F.col("a"), F.col("ca")) / (F.sqrt("norm") * F.sqrt("cn"))).alias("c"),
        )
        assigned = vc.groupBy("vec_id", "offset", "op").agg(
            F.max_by(
                "cent_id", F.struct(F.col("c"), (-F.col("cent_id")).alias("t"))
            ).alias("cell")
        )
        dels = batch.filter(F.col("op") == "d").select(
            "vec_id", "offset", "op", F.lit(None).cast("long").alias("cell")
        )
        return assigned.select(*self._COLS).unionByName(dels)

    def write(self, batch: DataFrame) -> None:
        _recover_swapped_dir(self.path)
        spark = batch.sparkSession
        updates = self._assign(batch)
        if os.path.isdir(self.path):
            updates = spark.read.parquet(self.path).unionByName(updates)
        merged = (
            updates.groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct("offset", "op", "cell"), F.col("offset")
                ).alias("m")
            )
            .select("vec_id", "m.offset", "m.op", "m.cell")
        )
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        _commit_swap(self.path, tmp)

    def state(self, spark: SparkSession) -> DataFrame:
        """The live inverted file: (vec_id, cell), tombstones dropped."""
        _recover_swapped_dir(self.path)
        return (
            spark.read.parquet(self.path)
            .filter(F.col("op") != "d")
            .select("vec_id", "cell")
        )
