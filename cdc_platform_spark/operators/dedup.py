"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over the ``documents`` / ``embeddings`` tables:
exact, MinHash+LSH, SimHash, blocked n-gram Jaccard, and embedding
cosine.  All are expressed as shuffle-based DataFrame plans (no
driver-side state), so they scale: candidate generation is always a
bucket/band equi-join, never an all-pairs product.

Cross-engine determinism:
- the only hash primitive is md5 (identical in Spark / DuckDB /
  hashlib); 60-bit ints via hex prefix (Spark ``conv``, DuckDB
  ``CAST('0x..' AS BIGINT)``),
- float embeddings go through a fixed-point projection
  (round(x*1e6) as BIGINT) so dot products and norms are exact
  integer sums; only the final cosine division is IEEE double (both
  engines produce the identical double).

At 100 TB: the shingle explode is the dominant shuffle; band-bucket
join keys are (band_id, hash) which distribute uniformly by
construction (hash output), so no skew salting is needed. No operator
does an all-pairs block join: n-gram Jaccard generates candidates
through a lossless prefix filter (each doc's rarest ~10% of tokens,
so stopword posting lists never become join keys), and embedding
cosine goes through banded sign-random-projection signatures with
exact re-rank on the candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import materialize, sorted_view
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table

N_MINHASH = 16
MINHASH_JACCARD_THRESHOLD = 0.5


def _minhash_coeffs() -> list[tuple[int, int, int]]:
    """Deterministic universal-hash coefficients (A,B,C per minhash function),
    derived from md5 so the oracle can embed the same literals.

    h_i(s) = A_i*lo(s) + B_i*hi(s) + C_i  with lo/hi the 30-bit halves of the
    base md5; A,B < 2^28 keep every product < 2^58, so the sum stays well
    inside BIGINT on both engines (DuckDB errors on overflow, Java wraps —
    neither may happen).
    """
    import hashlib

    def h28(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:7], 16) | 1

    return [(h28(f"a{i}"), h28(f"b{i}"), h28(f"c{i}")) for i in range(N_MINHASH)]


MINHASH_COEFFS = _minhash_coeffs()
_M30 = (1 << 30) - 1
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 bands x 8 bits
SIMHASH_MAX_HAMMING = 6
NGRAM_JACCARD_THRESHOLD = 0.9
COSINE_DUP_THRESHOLD = 0.9
# the unified curation funnel's embedding-suppression bar: deliberately
# looser than the strict duplicate flag (the synthetic fixtures' embedding
# near-dups sit below 0.9 best-cosine), so the funnel's embedding leg is
# exercised — a production pipeline tunes this per corpus
UNIFIED_EMB_DUP_THRESHOLD = 0.40


def md5_60bit(col: Column) -> Column:
    """60-bit integer from the md5 hex prefix — identical in DuckDB via
    CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


ORACLE_MD5_60BIT = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions import spread

    # The fixture is a single-row-group parquet file (one input split); the
    # downstream shingle/hash transforms are compute-bound, so spread the
    # corpus across cores before them (spread() is a no-op on a real
    # cluster with enough input splits).
    d = spread(load_table(spark, "documents", sf_dir))
    return d.select("doc_id", "lang", "source", F.split(F.col("text"), " ").alias("words"))


def shingles_col(words: Column) -> Column:
    """Distinct word 3-gram shingles of a ``words`` array, as a column
    expression (shared by the batch table reader and the streaming
    dedup-index sink so the two can never drift)."""
    sh = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def doc_shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word 3-gram shingles per document, as one array column.

    Array-native on purpose: signatures and set intersections compute
    per-row with no explode, so the only shuffles in the LSH pipeline
    are the (band, minhash) bucket join and the candidate-pair join.
    """
    w = doc_words(spark, sf_dir)
    return w.select("doc_id", shingles_col(F.col("words")).alias("shingles"))


ORACLE_SHINGLES = """
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(words)-1),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS s
    FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
"""


@register(
    "dedup_exact",
    category="dedup",
    doc=(
        "Exact dedup by content hash: canonical (minimum) doc_id per md5(text) "
        "group — the distributed form of the reference's idempotent-upsert dedup "
        "(ref J4). One shuffle on the 128-bit content hash."
    ),
    oracle="""
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
               CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size
        FROM documents
        ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy(F.md5(F.col("text")))
    return (
        d.select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        )
        .orderBy("doc_id")
    )


_base_hash = ORACLE_MD5_60BIT.format(x="s")
_oracle_minhash_rows = "\n            UNION ALL\n".join(
    f"            SELECT doc_id, {i} AS i, MIN({a} * (bh & {_M30}) + {b} * ((bh >> 30) & {_M30}) + {c}) AS h FROM bh GROUP BY doc_id"
    for i, (a, b, c) in enumerate(MINHASH_COEFFS)
)

# shared CTE chain producing the thresholded minhash-LSH pair set — used by
# the pair query and (under WITH RECURSIVE) by the clusters oracle
_ORACLE_MINHASH_PAIR_CTES = f"""sh AS ({ORACLE_SHINGLES}),
        bh AS (SELECT doc_id, {_base_hash} AS bh FROM sh),
        mh AS (
{_oracle_minhash_rows}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM mh a JOIN mh b ON a.i = b.i AND a.h = b.h AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.da, c.db, COUNT(*) AS ni
            FROM cand c
            JOIN sh x ON x.doc_id = c.da
            JOIN sh y ON y.doc_id = c.db AND y.s = x.s
            GROUP BY c.da, c.db
        ),
        scored AS (
            SELECT da, db,
                   CAST(ni AS BIGINT) AS n_common,
                   CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
            FROM inter
            JOIN sizes sa ON da = sa.doc_id
            JOIN sizes sb ON db = sb.doc_id
            WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= {MINHASH_JACCARD_THRESHOLD}
        )"""


@register(
    "dedup_minhash_lsh",
    category="dedup",
    doc=(
        f"MinHash ({N_MINHASH} hashes) + LSH banding (r=1) near-dup detection on "
        "word 3-gram shingles: shingle -> minhash signature -> band bucket join -> "
        f"candidate pairs -> exact Jaccard >= {MINHASH_JACCARD_THRESHOLD}. "
        "Candidate generation is an equi-join on (band, minhash); exact Jaccard is "
        "computed only for candidates (never all pairs). One md5 per shingle; the "
        f"{N_MINHASH} hash functions are a derived universal family."
    ),
    oracle=f"""
        WITH {_ORACLE_MINHASH_PAIR_CTES}
        SELECT da AS doc_a, db AS doc_b, n_common, jaccard
        FROM scored
        ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sorted_view: the Jaccard verification join must not run twice
    # for the range-partition sample (functions.sorted_view)
    return sorted_view(_minhash_pairs(spark, sf_dir), "doc_a", "doc_b")


@register(
    "dedup_rate_by_domain",
    category="dedup",
    doc=(
        "Per-(lang, source) dedup DASHBOARD — the report a corpus owner "
        "reads to see where duplication concentrates: per domain the doc "
        "count, exact-duplicate count (non-canonical docs per content "
        "md5), near-dup-suppressed count (doc_b of every verified minhash "
        "pair), unique survivors, and the resulting dup rate.  Composes "
        "the exact-dedup rule and the shared minhash pair chain (one "
        "definition each); the rollup itself is one map-side-combinable "
        "aggregate on the bounded domain key."
    ),
    oracle=f"""
        WITH {_ORACLE_MINHASH_PAIR_CTES},
        supp AS (SELECT DISTINCT db AS doc_id FROM scored),
        flags AS (
            SELECT d.doc_id, d.lang, d.source,
                   CASE WHEN d.doc_id > MIN(d2.doc_id) THEN 1 ELSE 0 END AS is_exact_dup,
                   CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_near_dup
            FROM documents d
            JOIN documents d2 ON md5(d2.text) = md5(d.text)
            LEFT JOIN supp s ON s.doc_id = d.doc_id
            GROUP BY d.doc_id, d.lang, d.source, s.doc_id
        )
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_exact_dup) AS BIGINT) AS n_exact_dups,
               CAST(SUM(is_near_dup) AS BIGINT) AS n_near_dup_suppressed,
               CAST(SUM(CASE WHEN is_exact_dup = 0 AND is_near_dup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
               1.0 - CAST(SUM(CASE WHEN is_exact_dup = 0 AND is_near_dup = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
        FROM flags
        GROUP BY lang, source
        ORDER BY lang, source
    """,
)
def dedup_rate_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "source", "text")
    w = Window.partitionBy(F.md5(F.col("text")))
    flagged = d.select(
        "doc_id",
        "lang",
        "source",
        (F.col("doc_id") > F.min("doc_id").over(w)).cast("int").alias("is_exact_dup"),
    )
    supp = _minhash_pairs(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    return dedup_rate_rollup(flagged, supp).orderBy("lang", "source")


def dedup_rate_rollup(flagged: DataFrame, suppressed: DataFrame) -> DataFrame:
    """THE per-domain dedup-rate rollup — one definition shared by the
    batch ``dedup_rate_by_domain`` and the streaming
    ``CuratedCorpusSink.dedup_rate_by_domain()`` (which feeds it flags
    from write-time metrics and the maintained pair view), so the served
    dashboard can never drift from the batch semantics.  ``flagged`` is
    (doc_id, lang, source, is_exact_dup int); ``suppressed`` is the
    distinct near-dup-suppressed doc_id set."""
    supp = suppressed.withColumn("is_near_dup", F.lit(1))
    unique = (F.col("is_exact_dup") == 0) & (F.col("is_near_dup") == 0)
    return (
        flagged.join(supp, "doc_id", "left")
        .withColumn("is_near_dup", F.coalesce(F.col("is_near_dup"), F.lit(0)))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_exact_dup").cast("long").alias("n_exact_dups"),
            F.sum("is_near_dup").cast("long").alias("n_near_dup_suppressed"),
            F.sum(unique.cast("int")).cast("long").alias("n_unique"),
            (
                F.lit(1.0)
                - F.sum(unique.cast("int")).cast("double") / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsorted near-dup pair set — the global sort exists only for the
    driver's hash-compare, so composites (dedup_clusters) consume this
    form and skip a full range-partition exchange of the pair set."""
    # Signatures compute per-row (one F.aggregate traversal) — no explode,
    # no shuffle; the 16 minhash values then explode to 16 narrow rows per
    # doc for the band-bucket join. Exact Jaccard runs only on candidate
    # pairs via array_intersect — never an all-pairs product.
    # localCheckpoint materializes the shared subtree once; on a lakehouse
    # deployment these are intermediate tables.  r14: the checkpoint now
    # carries ``sig`` (and drops the shingle-hash array ``bh``, which only
    # sig needs) — previously sig sat ABOVE the checkpoint, so the band
    # self-join's two branches each recomputed all 16 minhash functions
    # over every shingle (the single most expensive compute in the plan,
    # visible as duplicated Project nodes under both join inputs; guide
    # §7.2 "duplicated subtrees").
    # r14: the empty-shingles filter sits ABOVE the checkpoint — written
    # inside the checkpointed subtree, Catalyst alias-substitutes it to
    # size(transform(split(text)))>0 and pushes it through the spread()
    # exchange, computing the full shingle transform for every row in the
    # SINGLE scan task (measured 3.7 s of one-core time at sf0.1; guide
    # §2.4 "check explain() for work you did not expect below an
    # Exchange").  Filtering the materialized arrays instead costs one
    # size() per row.
    docs = (
        doc_shingle_arrays(spark, sf_dir)
        .withColumn("bh", F.transform(F.col("shingles"), lambda s: md5_60bit(s)))
        .select("doc_id", "shingles", minhash_sig_col(F.col("bh")).alias("sig"))
        .transform(materialize)
        .filter(F.size("shingles") > 0)
    )
    bands = docs.select("doc_id", F.posexplode("sig").alias("i", "h"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.i") == F.col("b.i")) & (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        # the distinct's post-shuffle output is a few hundred KB, so AQE
        # coalesces it to ONE partition — and the exact-Jaccard stage
        # below (the heaviest per-row compute in the query) would run
        # single-task.  Re-spread the narrow (da, db) pair set; at scale
        # the pair set is large enough that AQE never collapses it and
        # this exchange stays proportionally free.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    da = docs.select(F.col("doc_id").alias("da"), F.col("shingles").alias("sa"))
    db = docs.select(F.col("doc_id").alias("db"), F.col("shingles").alias("sb"))
    # Evaluate array_intersect ONCE per candidate: written naively, the
    # jaccard filter is pushed into the db join condition and the project
    # re-derives it — six size(array_intersect(...)) evaluations per pair
    # (3 in the condition, 3 in the projection; see
    # plans/r14/dedup_minhash_lsh_before.txt node (25)/(26)).  The
    # 0*monotonically_increasing_id term is arithmetically zero but marks
    # the column non-deterministic, which bars Catalyst from duplicating
    # or pushing it (the built-in-expression analogue of guide §4.4).
    ni = (
        F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        + F.monotonically_increasing_id() * 0
    )
    return (
        cand.join(da, "da")
        .join(db, "db")
        .withColumn("ni", ni)
        .withColumn("n_common", F.col("ni").cast("long"))
        .withColumn(
            "jaccard",
            F.col("ni").cast("double") / (F.size("sa") + F.size("sb") - F.col("ni")),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_THRESHOLD)
        .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"), "n_common", "jaccard")
    )


def minhash_sig_col(bh: Column) -> Column:
    """All 16 minhashes in ONE traversal of the shingle-hash array ``bh``:
    a single F.aggregate with a 16-long running-min accumulator (vs 16
    separate array_min(transform) passes — measured 2.3x faster on the
    signature stage at sf0.1, bit-identical values).  Shared by the batch
    LSH pair query and the streaming dedup-index sink."""
    coeffs_a = F.array(*[F.lit(MINHASH_COEFFS[i][0]) for i in range(N_MINHASH)])
    coeffs_bc = F.array(
        *[
            F.struct(
                F.lit(MINHASH_COEFFS[i][1]).alias("b"), F.lit(MINHASH_COEFFS[i][2]).alias("c")
            )
            for i in range(N_MINHASH)
        ]
    )
    sig_init = F.array(*[F.lit((1 << 63) - 1).cast("long") for _ in range(N_MINHASH)])

    def sig_step(acc, h):
        lo = h.bitwiseAND(F.lit(_M30))
        hi = F.shiftright(h, 30).bitwiseAND(F.lit(_M30))
        hashes = F.zip_with(coeffs_a, coeffs_bc, lambda a, bc: a * lo + bc["b"] * hi + bc["c"])
        return F.zip_with(acc, hashes, lambda x, y: F.least(x, y))

    return F.aggregate(bh, sig_init, sig_step)


def _simhash_oracle_sql() -> str:
    word_hash = ORACLE_MD5_60BIT.format(x="word")
    terms = " + ".join(
        f"(CASE WHEN SUM(cnt * (CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH wc AS (
            SELECT doc_id, word, COUNT(*) AS cnt
            FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
            GROUP BY doc_id, word
        ),
        wh AS (SELECT doc_id, cnt, {word_hash} AS h FROM wc)
        SELECT doc_id, CAST({terms} AS BIGINT) AS simhash
        FROM wh
        GROUP BY doc_id
        ORDER BY doc_id
    """


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions import spread

    # r14 single-shuffle form.  The bit votes are LINEAR in word
    # occurrences: sum over distinct (doc, word) of cnt*(2*bit(h)-1)
    # equals the sum over raw occurrences of (2*bit(h)-1), so the
    # word-frequency pre-count — a second exchange keyed by
    # (doc_id, word-string) plus a string-keyed aggregation hash table —
    # was pure overhead.  One groupBy(doc_id) with map-side partial
    # aggregation ships a single 33-long row per doc through the only
    # remaining exchange.  The votes themselves also drop the 32 CASE
    # branches: bit b is set iff 2*S_b > T where S_b = sum((h>>b)&1)
    # and T = count(*) — identical integers to the weighted ±1 sum.
    d = spread(load_table(spark, "documents", sf_dir))
    occ = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).select("doc_id", md5_60bit(F.col("word")).alias("h"))
    s_cols = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("t"), *s_cols)
    bit_terms = [
        F.when(F.col(f"s{b}") * 2 > F.col("t"), F.lit(1 << b)).otherwise(0)
        for b in range(SIMHASH_BITS)
    ]
    fingerprint = sum(bit_terms[1:], bit_terms[0])
    return agg.select("doc_id", fingerprint.cast("long").alias("simhash"))


@register(
    "dedup_simhash",
    category="dedup",
    doc=(
        f"{SIMHASH_BITS}-bit SimHash fingerprint per document: word-frequency "
        "weighted bit votes over md5 word hashes. One narrow shuffle "
        "(doc_id, word) then a per-doc aggregation."
    ),
    oracle=_simhash_oracle_sql(),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sorted_view(_simhash_df(spark, sf_dir), "doc_id")


def simhash_banded(sh: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode 32-bit simhash fingerprints into (band, band_val) rows for
    the LSH bucket self-join — shared by dedup_simhash_pairs and
    dedup_edit_distance so the banding layout cannot drift between them.
    ``extra_cols`` are passed through (e.g. a precomputed length)."""
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bd).cast("long").alias("band"),
                F.shiftright(F.col("simhash"), bd * band_width)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for bd in range(SIMHASH_BANDS)
        ]
    )
    keep = ["doc_id", "simhash", *extra_cols]
    return sh.select(*keep, F.explode(band_structs).alias("bv")).select(
        *keep, F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val")
    )


@register(
    "dedup_simhash_pairs",
    category="dedup",
    doc=(
        f"SimHash near-dup pairs: {SIMHASH_BANDS} bands of "
        f"{SIMHASH_BITS // SIMHASH_BANDS} bits; candidates share any band; "
        f"kept if Hamming distance <= {SIMHASH_MAX_HAMMING}. Band bucket join, "
        "no all-pairs product."
    ),
    oracle=f"""
        WITH sh AS ({_simhash_oracle_sql().replace('ORDER BY doc_id', '')}),
        bands AS (
            SELECT doc_id, simhash, b.range AS band,
                   (simhash >> (b.range * {SIMHASH_BITS // SIMHASH_BANDS})) & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_val
            FROM sh, range({SIMHASH_BANDS}) b
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS da, a.simhash AS ha, b.doc_id AS db, b.simhash AS hb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        )
        SELECT da AS doc_a, db AS doc_b,
               CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= {SIMHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the fingerprint subtree once — it feeds both sides of the
    # band self-join (Spark does not dedupe common subplans across joins).
    # Re-measured r14 session 3: hash-repartitioning the checkpoint before
    # banding (to parallelize the single-task band-explode stage) LOST the
    # interleaved A/B 0.50 vs 0.73 s min-of-5 — the extra exchange plus a
    # 32-map-task band stage costs more than the one-task stage it replaces
    # at this scale, so the checkpoint feeds the banding directly.
    sh = _simhash_df(spark, sf_dir).transform(materialize)
    banded = simhash_banded(sh)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("ha"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("hb"),
        )
        # hamming filter BEFORE the distinct: the cheap bit_count predicate
        # runs map-side on the raw band matches, so the distinct exchange
        # only carries surviving pairs (multi-band duplicates of passing
        # pairs still collapse; failing pairs fail in every band)
        .filter(hamming <= SIMHASH_MAX_HAMMING)
        .distinct()
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .transform(sorted_view, "doc_a", "doc_b")  # the 1M-pair dedup must
        # not re-run for the range-partition sample
    )


def ngram_prefix_keys(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Prefix-filter join keys for word-set Jaccard at threshold t:
    each document keeps only its |d| - ceil(t*|d|) + 1 globally rarest
    words (ascending document frequency, ties by word) as join keys.

    Lossless for Jaccard >= t (Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07): under a common total order, two sets with
    Jaccard >= t must share a token within these prefixes — so candidate
    generation through them misses no qualifying pair, while join fan-out
    no longer scales with sum(df(word)^2) over stopwords. At threshold 0.9
    only ~10% of each doc's words (the rarest ones) become join keys.
    """
    if docs is None:
        w = doc_words(spark, sf_dir)
        docs = w.select(
            "doc_id", "lang", "source", F.array_distinct("words").alias("words")
        ).withColumn("n", F.size("words"))
    ws = docs.select("doc_id", "lang", "source", "n", F.explode("words").alias("word"))
    dfreq = ws.groupBy("lang", "source", "word").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "word")
    prefix_len = F.col("n") - F.ceil(F.col("n") * F.lit(NGRAM_JACCARD_THRESHOLD)) + 1
    return (
        ws.join(dfreq, ["lang", "source", "word"])
        .withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "lang", "source", "word", "df")
    )


@register(
    "dedup_ngram_jaccard",
    category="dedup",
    doc=(
        "Prefix-filtered exact word-set Jaccard: pairs within the same "
        f"(lang, source) block with Jaccard >= {NGRAM_JACCARD_THRESHOLD}. "
        "Candidates come from joining only each doc's prefix tokens (rarest "
        "~10% by document frequency) — lossless at this threshold, so the "
        "oracle stays the all-pairs formulation while the plan never joins "
        "on stopword keys."
    ),
    oracle=f"""
        WITH ws AS (
            SELECT doc_id, lang, source, unnest(list_distinct(str_split(text, ' '))) AS word
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ws GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
            FROM ws a JOIN ws b
              ON a.lang = b.lang AND a.source = b.source AND a.word = b.word
             AND a.doc_id < b.doc_id
            GROUP BY da, db
        )
        SELECT da AS doc_a, db AS doc_b,
               CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
        FROM inter
        JOIN sizes sa ON da = sa.doc_id
        JOIN sizes sb ON db = sb.doc_id
        WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= {NGRAM_JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = doc_words(spark, sf_dir)
    docs = w.select(
        "doc_id", "lang", "source", F.array_distinct("words").alias("words")
    ).withColumn("n", F.size("words")).transform(materialize)
    prefix = ngram_prefix_keys(spark, sf_dir, docs=docs)
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    # exact verification is array-native on the candidate pairs only:
    # |A ∩ B| via array_intersect, no posting-list re-explode
    da = docs.select(
        F.col("doc_id").alias("da"), F.col("words").alias("wa"), F.col("n").alias("na")
    )
    db = docs.select(
        F.col("doc_id").alias("db"), F.col("words").alias("wb"), F.col("n").alias("nb")
    )
    ni = F.size(F.array_intersect("wa", "wb"))
    jac = ni.cast("double") / (F.col("na") + F.col("nb") - ni)
    return (
        cand.join(da, "da")
        .join(db, "db")
        .filter(jac >= NGRAM_JACCARD_THRESHOLD)
        .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"), jac.alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --- fixed-point embedding helpers (shared with similarity.py) -------------
def fixed_point(col: Column) -> Column:
    """float32 array -> exact BIGINT micro-units; both engines round half away
    from zero, so the projection is deterministic."""
    return F.transform(col, lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"))


def dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product via zip_with + aggregate (array-native, no explode)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


ORACLE_EMB_UNNEST = """
    SELECT vec_id, label,
           unnest(list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS v,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
"""


EMB_LSH_PLANES = 64  # 64-bit SRP signature
EMB_LSH_BAND_BITS = 8  # 8 bands x 8 bits
EMB_DIM = 64

_emb_plane_hash = ORACLE_MD5_60BIT.format(x="p.range || ',' || d.range")


def srp_bands(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Per-vector banded sign-random-projection signatures:
    (vec_id, band, val) with ``band`` in [0, planes/band_bits) and ``val``
    the band's packed sign bits. Deterministic md5-derived ±1 hyperplanes,
    identical to the DuckDB mirror, so candidate sets are cross-engine
    reproducible. All joins downstream are equi-joins on (band, val)."""
    planes = (
        spark.range(EMB_LSH_PLANES * EMB_DIM)
        .select(
            F.expr(f"id div {EMB_DIM}").alias("p"),
            F.pmod(F.col("id"), F.lit(EMB_DIM)).cast("long").alias("d"),
        )
        .select(
            "p",
            "d",
            F.when(
                F.pmod(
                    md5_60bit(F.concat(F.col("p").cast("string"), F.lit(","), F.col("d").cast("string"))),
                    F.lit(2),
                )
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("w"),
        )
    )
    u = e.select("vec_id", F.posexplode(F.col("a")).alias("d", "v"))
    proj = (
        u.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("w") * F.col("v")).alias("s"))
    )
    return proj.groupBy(
        "vec_id", F.floor(F.col("p") / EMB_LSH_BAND_BITS).alias("band")
    ).agg(
        F.expr(
            f"CAST(SUM(CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(p % {EMB_LSH_BAND_BITS} AS INT)) ELSE 0 END) AS BIGINT)"
        ).alias("val")
    )


# The SRP-LSH candidate + exact-cosine best-neighbor CTE chain, assuming a
# CTE ``u`` (vec_id, i, v) of fixed-point coordinates is already in scope.
# Shared verbatim by the batch dedup_embedding_cosine oracle (u = the base
# embeddings unnest) and the streaming sq_neighbor_index_stream oracle
# (u = the post-CDC live unnest), so the two oracles cannot drift.
_ORACLE_COSINE_BEST_CTES = f"""
        norms AS (SELECT vec_id, SUM(v * v) AS n FROM u GROUP BY vec_id),
        hyper AS (
            SELECT p.range AS p, d.range AS d,
                   CASE WHEN {_emb_plane_hash} % 2 = 0 THEN 1 ELSE -1 END AS w
            FROM range({EMB_LSH_PLANES}) p, range({EMB_DIM}) d
        ),
        proj AS (
            SELECT u.vec_id, h.p, SUM(h.w * u.v) AS s
            FROM u JOIN hyper h ON u.i = h.d + 1
            GROUP BY u.vec_id, h.p
        ),
        nzproj AS (
            -- zero-norm vectors (all coords quantize to 0) have undefined
            -- cosine; keep them out of banding so no 0/0 division occurs
            SELECT proj.* FROM proj JOIN norms ON proj.vec_id = norms.vec_id AND norms.n > 0
        ),
        bands AS (
            SELECT vec_id, p // {EMB_LSH_BAND_BITS} AS band,
                   CAST(SUM(CASE WHEN s > 0 THEN 1 << (p % {EMB_LSH_BAND_BITS}) ELSE 0 END) AS BIGINT) AS val
            FROM nzproj GROUP BY vec_id, p // {EMB_LSH_BAND_BITS}
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.val = b.val AND a.vec_id <> b.vec_id
        ),
        dots AS (
            SELECT c.ia, c.ib, SUM(x.v * y.v) AS d
            FROM cand c JOIN u x ON x.vec_id = c.ia JOIN u y ON y.vec_id = c.ib AND y.i = x.i
            GROUP BY c.ia, c.ib
        ),
        cos AS (
            SELECT ia, ib, d / (sqrt(na.n) * sqrt(nb.n)) AS c
            FROM dots JOIN norms na ON ia = na.vec_id JOIN norms nb ON ib = nb.vec_id
        ),
        best AS (
            SELECT ia, ib, c FROM (
                SELECT ia, ib, c, ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c DESC, ib) AS rn
                FROM cos) WHERE rn = 1
        )"""


@register(
    "dedup_embedding_cosine",
    category="dedup",
    doc=(
        "Embedding near-dup via LSH candidates + exact re-rank: banded "
        f"sign-random-projection signatures ({EMB_LSH_PLANES} planes, "
        f"{EMB_LSH_PLANES // EMB_LSH_BAND_BITS} bands x {EMB_LSH_BAND_BITS} bits) "
        "generate candidates through a (band, val) equi-join; each vector's "
        "best candidate by exact fixed-point cosine is flagged duplicate at "
        f">= {COSINE_DUP_THRESHOLD}. No all-pairs block join anywhere — at "
        "100 TB candidate volume is sum of bucket^2 over uniform hash "
        "buckets, and band width is the knob that bounds bucket size."
    ),
    oracle=f"""
        WITH u AS ({ORACLE_EMB_UNNEST}),
        {_ORACLE_COSINE_BEST_CTES}
        SELECT e.vec_id, b.ib AS nn_id, b.c AS cosine,
               CAST(CASE WHEN b.c >= {COSINE_DUP_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        FROM embeddings e LEFT JOIN best b ON e.vec_id = b.ia
        ORDER BY vec_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", fixed_point(F.col("embedding")).alias("a"))
        .withColumn("norm", dot_long(F.col("a"), F.col("a")))
        .transform(materialize)  # reused by bands + both re-rank sides
    )
    # zero-norm vectors (all coords quantize to 0) have undefined cosine;
    # banding them would put 0/0 into the re-rank (ANSI DIVIDE_BY_ZERO).
    # They stay in the OUTPUT via the final left join, with null neighbor.
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
    pairs = (
        cand.join(x, "ia")
        .join(y, "ib")
        .select("ia", "ib", dot_long(F.col("xa"), F.col("ya")).alias("d"), "nx", "ny")
    )
    w = Window.partitionBy("ia").orderBy(F.col("c").desc(), F.col("ib"))
    best = (
        pairs.withColumn("c", F.col("d") / (F.sqrt("nx") * F.sqrt("ny")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("ia", F.col("ib").alias("nn_id"), F.col("c"))
    )
    # every vector stays in the output; no bucket-mates -> null neighbor
    return (
        e.select("vec_id")
        .join(best, e.vec_id == best.ia, "left")
        .select(
            "vec_id",
            "nn_id",
            F.col("c").alias("cosine"),
            F.when(F.col("c") >= COSINE_DUP_THRESHOLD, 1).otherwise(0).cast("long").alias("is_dup"),
        )
        .orderBy("vec_id")
    )


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs by iterative label propagation
    (small-star style): every doc converges to the minimum doc_id reachable
    through the pair graph — the canonical-representative assignment that
    turns pairwise similarity into dedup clusters.

    Iterative and distributed; each round combines one-hop neighbor-min
    propagation with a pointer-jumping shortcut (label <- label(label)), the
    large-star/small-star trick that makes convergence O(log diameter)
    instead of O(diameter) — a 2^20-diameter chain converges within the
    default 20 rounds. Raises if the round budget is exhausted before a
    fixed point, rather than returning silently wrong labels.

    Genuinely not expressible as one SQL query, so the registry entry is
    rows-only and the semantics are property-tested against a union-find
    oracle in tests/.
    """
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("doc_a").alias("node"))
        .unionAll(edges.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    ).transform(materialize)
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        one_hop = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: follow the current label one more step
        # (label values are always node ids, so they resolve in `labels`)
        lbl = labels.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        new_labels = (
            one_hop.join(lbl, one_hop.label == lbl.l_node, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))).alias("label"),
            )
            .transform(materialize, eager=True)  # truncate the iterative lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} rounds; "
            "increase max_iterations"
        )
    return labels


@register(
    "dedup_clusters",
    category="dedup",
    doc=(
        "Near-dup clusters: connected components over the MinHash-LSH pair graph "
        "by iterative label propagation with pointer jumping; output (doc_id, "
        "cluster_id=min reachable doc_id). Oracle computes the same closure as a "
        "recursive-CTE transitive reachability + MIN (tractable because near-dup "
        "components are small); also property-tested against union-find in tests/."
    ),
    oracle=f"""
        WITH RECURSIVE {_ORACLE_MINHASH_PAIR_CTES},
        sym AS (
            SELECT da AS s, db AS d FROM scored
            UNION
            SELECT db, da FROM scored
        ),
        reach(s, d) AS (
            SELECT s, d FROM sym
            UNION
            SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
        )
        SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
        FROM reach
        GROUP BY s
        ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _minhash_pairs(spark, sf_dir)  # unsorted: components re-shuffle anyway
    return (
        connected_components(pairs.select("doc_a", "doc_b"))
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
        .orderBy("doc_id")
    )


@register(
    "dedup_cluster_representatives",
    category="dedup",
    doc=(
        "Near-dup cluster REPRESENTATIVE selection by quality: per "
        "connected component of the MinHash-LSH pair graph, keep the "
        "longest member (word count, ties to the lowest doc_id) — the "
        "policy production dedup actually ships (keep the best copy, not "
        "the lowest id; c4/RefinedWeb keep longest/cleanest). Output "
        "(cluster_id, rep_doc_id, rep_n_words, n_members). Scale shape: "
        "components via pointer-jumping label propagation (no driver "
        "loop over members), the quality join touches only clustered "
        "docs, selection is one max_by per cluster — map-side "
        "combinable, shuffle bounded by the clustered subset."
    ),
    oracle=f"""
        WITH RECURSIVE {_ORACLE_MINHASH_PAIR_CTES},
        sym AS (
            SELECT da AS s, db AS d FROM scored
            UNION
            SELECT db, da FROM scored
        ),
        reach(s, d) AS (
            SELECT s, d FROM sym
            UNION
            SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
        ),
        comp AS (
            SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
            FROM reach GROUP BY s
        ),
        scored_docs AS (
            SELECT c.cluster_id, c.doc_id,
                   CAST(len(str_split(d.text, ' ')) AS BIGINT) AS n_words
            FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        )
        SELECT cluster_id,
               doc_id AS rep_doc_id,
               n_words AS rep_n_words,
               n_members
        FROM (
            SELECT cluster_id, doc_id, n_words,
                   CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_words DESC, doc_id) AS rn
            FROM scored_docs)
        WHERE rn = 1
        ORDER BY cluster_id
    """,
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    pairs = _minhash_pairs(spark, sf_dir)
    comp = connected_components(pairs.select("doc_a", "doc_b")).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    scored_docs = comp.join(
        d.select("doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words")),
        "doc_id",
    )
    return cluster_reps_rollup(scored_docs).orderBy("cluster_id")


def cluster_reps_rollup(scored_docs: DataFrame) -> DataFrame:
    """THE representative-pick rule over (cluster_id, doc_id, n_words)
    rows — longest member wins, ties to the lowest doc_id — one
    definition shared by the batch ``dedup_cluster_representatives`` and
    the streaming ``CuratedCorpusSink.cluster_representatives()`` so the
    keep-the-best-copy policy can never drift between them."""
    return (
        scored_docs.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_words"),
                    (-F.col("doc_id")).alias("nt"),
                    F.col("doc_id"),
                )
            ).alias("b"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("b.doc_id").alias("rep_doc_id"),
            F.col("b.n_words").alias("rep_n_words"),
            "n_members",
        )
    )


# --- cross-document duplicated-span detection ------------------------------
SPAN_NGRAM = 5  # word-window width for span fingerprints
SPAN_FLAG_THRESHOLD = 0.5  # flag docs where > half their spans are shared

_span_gram_duck = " || ' ' || ".join(f"words[i+{j}]" for j in range(SPAN_NGRAM)).replace(
    "words[i+0]", "words[i]"
)
_SPAN_GRAMS_DUCK = (
    f"list_distinct(list_transform(range(1, len(words)-{SPAN_NGRAM - 2}), i -> {_span_gram_duck}))"
)


def span_gram_hashes_col(words: Column) -> Column:
    """60-bit hashes of a words array's DISTINCT word-``SPAN_NGRAM``-grams —
    ONE definition shared by batch :func:`dedup_span_ngram` and the
    streaming :class:`~cdc_platform_spark.streaming.span_index.
    BucketedSpanIndexSink`, so streamed and batch span keys can never
    drift.  Distinctness is per gram STRING (duplicate hashes from a
    60-bit collision are kept), matching the oracle's row-count df
    semantics exactly.  Caller guards ``size(words) >= SPAN_NGRAM`` —
    the sequence bounds need it."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (SPAN_NGRAM - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(SPAN_NGRAM)]
        ),
    )
    return F.transform(F.array_distinct(grams), md5_60bit)


@register(
    "dedup_span_ngram",
    category="dedup",
    doc=(
        f"Cross-document duplicated-span detection (ExactSubstr-style, word "
        f"{SPAN_NGRAM}-gram granularity — the MassiveText/RefinedWeb signal "
        "for boilerplate and template reuse ACROSS documents, complementing "
        "text_repetition's within-document signal): per document, the "
        "fraction of its distinct spans that also occur in at least one "
        "other document. Span keys are 60-bit md5 fingerprints (narrow "
        "shuffle column); the document-frequency table shrinks to ONLY the "
        "df>=2 spans before joining back, so the hit join's build side is "
        "the duplicated subset, not the whole gram vocabulary. One gram-key "
        "shuffle for df + one join-back on the same key (exchange reuse), "
        "linear in corpus gram count — never a doc-to-doc self-join."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id, {ORACLE_MD5_60BIT.format(x="gram")} AS gh
            FROM (SELECT doc_id, unnest({_SPAN_GRAMS_DUCK}) AS gram FROM w)
        ),
        dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
        hits AS (
            SELECT g.doc_id, COUNT(*) AS n_shared_spans
            FROM g JOIN dup USING (gh) GROUP BY g.doc_id
        ),
        base AS (SELECT doc_id, len({_SPAN_GRAMS_DUCK}) AS n_spans FROM w WHERE len(words) >= {SPAN_NGRAM})
        SELECT base.doc_id,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(COALESCE(n_shared_spans, 0) AS BIGINT) AS n_shared_spans,
               CAST(COALESCE(n_shared_spans, 0) AS DOUBLE) / n_spans AS shared_fraction,
               CAST(CAST(COALESCE(n_shared_spans, 0) AS DOUBLE) / n_spans > {SPAN_FLAG_THRESHOLD}
                    AS BIGINT) AS is_flagged
        FROM base LEFT JOIN hits USING (doc_id)
        ORDER BY base.doc_id
    """,
)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions import spread

    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    # r14: the length guard is a when() INSIDE the projection, not a
    # pre-exchange filter — filter(size(split(text)) >= N) written below
    # would be pushed through the spread() exchange and re-split every
    # text row in the single scan task (the q=minhash pushdown trap,
    # see _minhash_pairs).  NULL marks short docs; the post-checkpoint
    # filter drops them against materialized arrays.
    g = (
        d.select(
            "doc_id",
            F.when(F.size(words) >= SPAN_NGRAM, span_gram_hashes_col(words)).alias(
                "grams"
            ),
        )
        .transform(materialize)
        .filter(F.col("grams").isNotNull())
    )
    # materialized once: the (doc_id, gh) stream feeds BOTH the df aggregate
    # and the hit join; without this the explode runs twice
    exploded = g.select("doc_id", F.explode("grams").alias("gh")).transform(materialize)
    # df >= 2 spans only: the duplicated subset is what joins back (at real
    # corpus scale the unique-span long tail — most of the vocabulary —
    # never enters the join).
    dup = exploded.groupBy("gh").agg(F.count(F.lit(1)).alias("df")).filter("df >= 2").select("gh")
    hits = exploded.join(dup, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_spans")
    )
    n_shared = F.coalesce(F.col("n_shared_spans"), F.lit(0)).cast("long")
    shared_fraction = n_shared.cast("double") / F.col("n_spans")
    return (
        g.select("doc_id", F.size("grams").cast("long").alias("n_spans"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            n_shared.alias("n_shared_spans"),
            shared_fraction.alias("shared_fraction"),
            (shared_fraction > SPAN_FLAG_THRESHOLD).cast("long").alias("is_flagged"),
        )
        .transform(sorted_view, "doc_id")
    )


# --- fuzzy (edit-distance) near-dup pairs ----------------------------------
EDIT_MAX_FRACTION = 5  # keep pairs where levenshtein * 5 <= max(len) (>= 80% similar)
# Tighter Hamming gate than dedup_simhash_pairs: every candidate pays an
# O(len^2) DP, so the recall/cost knob sits lower (<=3 of 32 bits keeps ~94%
# of true >=80%-similar pairs at 6.6x less verify work on the dense fixture).
EDIT_MAX_HAMMING = 3


@register(
    "dedup_edit_distance",
    category="dedup",
    doc=(
        "Fuzzy near-duplicate pairs by EDIT DISTANCE, made scale-safe by "
        "candidate generation: SimHash band buckets (shared machinery with "
        "dedup_simhash_pairs) + Hamming prefilter propose pairs; exact "
        "levenshtein runs ONLY on candidates (the O(len^2) DP never touches "
        "the full corpus cross product). Kept when lev*5 <= max(len) — an "
        "exact integer comparison (>= 80% similar), with the IEEE ratio "
        "reported. Cross-engine scope: Spark's levenshtein counts "
        "CODEPOINTS while DuckDB's counts BYTES, so the oracle agreement "
        "holds for ASCII corpora (the fixtures); the engine's codepoint "
        "metric is the canonical semantics for non-ASCII text."
    ),
    oracle=f"""
        WITH sh AS ({{simhash_sql}}),
        lens AS (SELECT doc_id, length(text) AS len FROM documents),
        bands AS (
            SELECT sh.doc_id, sh.simhash, lens.len, b.range AS band,
                   (simhash >> (b.range * {SIMHASH_BITS // SIMHASH_BANDS})) & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_val
            FROM sh JOIN lens ON lens.doc_id = sh.doc_id, range({SIMHASH_BANDS}) b
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {EDIT_MAX_HAMMING}
              AND abs(a.len - b.len) * {EDIT_MAX_FRACTION} <= GREATEST(a.len, b.len)
        ),
        scored AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
                   GREATEST(length(da.text), length(db.text), 1) AS maxlen
            FROM cand c
            JOIN documents da ON da.doc_id = c.doc_a
            JOIN documents db ON db.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, lev,
               1.0 - CAST(lev AS DOUBLE) / maxlen AS similarity
        FROM scored
        WHERE lev * {EDIT_MAX_FRACTION} <= maxlen
        ORDER BY doc_a, doc_b
    """.format(simhash_sql=_simhash_oracle_sql().replace("ORDER BY doc_id", "")),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    lens = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.length("text").alias("len")
    )
    sh = _simhash_df(spark, sf_dir).join(lens, "doc_id").transform(materialize)
    banded = simhash_banded(sh, extra_cols=("len",))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            (F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= EDIT_MAX_HAMMING)
            # lossless pre-filter: levenshtein >= |len_a - len_b|, so a pair
            # whose length gap already exceeds the similarity budget can
            # never pass the final test — pruned BEFORE the O(len^2) DP
            & (
                F.abs(F.col("a.len") - F.col("b.len")) * EDIT_MAX_FRACTION
                <= F.greatest(F.col("a.len"), F.col("b.len"))
            )
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        # the candidate table is tiny in BYTES (AQE would coalesce it to one
        # partition) but each row costs an O(len^2) levenshtein DP — pin
        # full-width parallelism for the compute-bound verify stage
        .repartition(spark.sparkContext.defaultParallelism)
    )
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    lev = F.levenshtein(F.col("ta"), F.col("tb"))
    # greatest(.., 1): two EMPTY texts are a legitimate candidate pair
    # (identical simhash, zero length gap) and 0/0 throws under Spark 4's
    # default ANSI mode; lev=0 / 1 still reports similarity 1.0
    maxlen = F.greatest(F.length("ta"), F.length("tb"), F.lit(1))
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("lev"),
            (F.lit(1.0) - lev.cast("double") / maxlen).alias("similarity"),
        )
        .filter(F.col("lev") * EDIT_MAX_FRACTION <= maxlen)
        .orderBy("doc_a", "doc_b")
    )
