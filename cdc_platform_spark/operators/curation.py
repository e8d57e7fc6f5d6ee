"""Training-data curation extensions: vocabulary richness, deterministic
stratified sampling, and per-label embedding centroids.

Complements operators/text.py and operators/similarity.py with the
corpus-statistics operators a 100 TB pretraining pipeline runs between
dedup and tokenization.  All are single-shuffle aggregations or window
top-k; nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_platform_spark.functions import materialize
from cdc_platform_spark.operators import register
from cdc_platform_spark.sources.registry import load_table

SAMPLE_PER_LANG = 10


@register(
    "text_vocab_richness",
    category="text",
    doc=(
        "Per-language vocabulary richness: distinct-token / total-token ratio "
        "aggregated from exact integer counts (type-token ratio, the standard "
        "repetition-quality signal). Token sets computed array-native "
        "(split + array_distinct), no Python in the hot path."
    ),
    oracle="""
        WITH d AS (
            SELECT lang,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(list_distinct(string_split(trim(text), ' '))) AS n_distinct
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(n_distinct AS BIGINT)) AS BIGINT) AS total_distinct,
               CAST(SUM(CAST(n_distinct AS BIGINT)) AS DOUBLE)
                   / CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE) AS richness
        FROM d
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), " ")
    d = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_distinct").alias("total_distinct"),
        )
        .withColumn(
            "richness", F.col("total_distinct").cast("double") / F.col("total_tokens").cast("double")
        )
        .orderBy("lang")
    )


@register(
    "text_stratified_sample",
    category="text",
    doc=(
        f"Deterministic stratified sample: {SAMPLE_PER_LANG} documents per "
        "language, selected by md5(doc_id) order — a seedless, engine-portable "
        "reservoir that any worker can recompute (same recipe as "
        "q58_deterministic_sample, stratified). At 100 TB this is one window "
        "shuffle on the stratum key; no global sort."
    ),
    oracle=f"""
        SELECT doc_id, lang, source
        FROM (
            SELECT doc_id, lang, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= {SAMPLE_PER_LANG}
        ORDER BY lang, doc_id
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_LANG)
        .select("doc_id", "lang", "source")
        .orderBy("lang", "doc_id")
    )


@register(
    "sim_label_centroids",
    category="similarity",
    doc=(
        "Per-label embedding centroid in exact fixed-point: posexplode to "
        "(label, dim), integer micro-unit sums (map-side combinable), mean "
        "derived by one IEEE division at the end. The IVF coarse-quantizer "
        "training step (sim_ann_ivf consumes these cells)."
    ),
    oracle="""
        WITH u AS (
            SELECT label,
                   generate_subscripts(embedding, 1) - 1 AS dim,
                   unnest(list_transform(embedding,
                          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS v
            FROM embeddings
        )
        SELECT label, CAST(dim AS INTEGER) AS dim,
               CAST(SUM(v) AS BIGINT) AS sum_fp, COUNT(*) AS n,
               CAST(SUM(v) AS DOUBLE) / (1000000.0 * COUNT(*)) AS mean
        FROM u
        GROUP BY label, dim
        ORDER BY label, dim
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.operators.dedup import fixed_point

    e = load_table(spark, "embeddings", sf_dir)
    u = e.select(
        "label", F.posexplode(fixed_point(F.col("embedding"))).alias("dim", "v")
    )
    return (
        u.groupBy("label", F.col("dim").cast("int").alias("dim"))
        .agg(F.sum("v").alias("sum_fp"), F.count(F.lit(1)).alias("n"))
        .withColumn("mean", F.col("sum_fp").cast("double") / (F.lit(1000000.0) * F.col("n")))
        .orderBy("label", "dim")
    )


@register(
    "q69_retention_cohorts",
    category="composite",
    doc=(
        "Weekly retention cohorts over the event stream: users grouped by "
        "first-activity week, counted per subsequent activity week — two "
        "aggregations sharing the user_id shuffle key (AQE reuses the "
        "exchange), the standard product-analytics readout of a CDC stream."
    ),
    oracle="""
        WITH first_week AS (
            SELECT user_id, CAST(epoch(date_trunc('week', MIN(ts))) AS BIGINT) AS cohort_epoch
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_epoch
            FROM events
        )
        SELECT f.cohort_epoch,
               (a.week_epoch - f.cohort_epoch) // 604800 AS week_n,
               COUNT(*) AS active_users
        FROM activity a JOIN first_week f ON a.user_id = f.user_id
        GROUP BY f.cohort_epoch, week_n
        ORDER BY cohort_epoch, week_n
    """,
)
def q69_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    week = lambda c: F.unix_timestamp(F.date_trunc("week", c)).cast("long")  # noqa: E731
    first_week = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_epoch"))
    activity = e.select("user_id", week(F.col("ts")).alias("week_epoch")).distinct()
    return (
        activity.join(first_week, "user_id")
        .groupBy(
            "cohort_epoch",
            ((F.col("week_epoch") - F.col("cohort_epoch")) / F.lit(604800))
            .cast("long")
            .alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_epoch", "week_n")
    )


@register(
    "q70_higher_order_arrays",
    category="functions",
    doc=(
        "Higher-order array functions over tokenized documents: lambda "
        "filter/transform/aggregate plus sort/slice/join — all JVM-side "
        "array expressions inside whole-stage codegen (Spark's replacement "
        "for the reference's per-row Python dict manipulation)."
    ),
    oracle="""
        WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
        SELECT doc_id,
               CAST(len(list_filter(toks, x -> len(x) > 5)) AS BIGINT) AS n_long,
               CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS total_len,
               CAST(list_contains(toks, 'spark') AS BIGINT) AS has_spark,
               array_to_string(list_sort(toks)[1:3], '-') AS first3_sorted
        FROM t
        ORDER BY doc_id
    """,
)
def q70_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
        F.array_contains(toks, "spark").cast("long").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(toks), 1, 3), "-").alias("first3_sorted"),
    ).orderBy("doc_id")


TEMP_SAMPLE_MULT = 4  # K in target = min(n, max(1, floor(K * sqrt(n))))


PREFILTER_OVERSHOOT = 4  # safety factor on the per-domain md5 threshold


def _md5_prefix_pool(
    pool: DataFrame,
    tgt: DataFrame,
    *,
    target_col: str,
    total_col: str,
    weight,
) -> DataFrame:
    """Shared md5-prefix candidate filter for the two mix samplers.

    Keeps, per (lang, source) domain, the rows whose 32-bit numeric md5
    prefix falls in the first ``PREFILTER_OVERSHOOT * target / total`` of
    the hash space.  The 32-bit prefix orders exactly like the full md5
    string (hex chars sort lexicographically = numerically), so "u below
    threshold" keeps a CLEAN PREFIX of the md5 ranking order — ranks
    computed on survivors equal ranks in the full corpus.

    Exactness fallback: a domain whose survivors sum to less ``weight``
    than its target (docs for temperature_resample via ``weight=lit(1)``,
    tokens for token_budget_sample via ``weight=n_words``) may have its
    boundary row beyond the prefix — it is ranked in full.  ``short`` is
    derived from ``tgt`` (every domain) LEFT-joined with the survivor
    sums: a domain whose prefilter kept ZERO rows has no group in the
    candidate frame at all, and deriving the fallback set from candidates
    alone would silently drop it instead of falling back.

    The final pool is ONE pass over ``pool`` (candidate-threshold OR
    fallback-domain): a union of (cand anti short) with (pool semi short)
    would evaluate the pool's whole upstream lineage twice, which for the
    serving reads means re-deriving the curated corpus per branch.
    ``tgt`` and ``short`` are domain-cardinality (tiny) -> broadcasts
    are bounded."""
    out_cols = pool.columns
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    cand_pred = (
        u.cast("double") / F.lit(float(2**32))
        < F.lit(float(PREFILTER_OVERSHOOT))
        * F.col(target_col).cast("double")
        / F.col(total_col).cast("double")
    )
    dims = tgt.select("lang", "source", total_col, target_col)
    cand = pool.join(F.broadcast(dims), ["lang", "source"]).filter(cand_pred)
    kept = cand.groupBy("lang", "source").agg(F.sum(weight).alias("kept_weight"))
    short = (
        tgt.select("lang", "source", target_col)
        .join(kept, ["lang", "source"], "left")
        .filter(
            F.coalesce(F.col("kept_weight"), F.lit(0).cast("long"))
            < F.col(target_col)
        )
        .select("lang", "source", F.lit(True).alias("_short"))
    )
    return (
        pool.join(F.broadcast(dims), ["lang", "source"])
        .join(F.broadcast(short), ["lang", "source"], "left")
        .filter(cand_pred | F.col("_short").isNotNull())
        .select(*out_cols)
    )


def temperature_resample(d: DataFrame, prefilter: bool = False) -> DataFrame:
    """THE temperature-resampling body over a (lang, source, doc_id)
    frame — sqrt-law targets per domain, exactly ``target_docs`` picks in
    md5(doc_id) order.  One definition shared by the batch
    ``text_temperature_resample`` operator and the streaming
    ``CuratedCorpusSink.mix_sample()`` (which feeds it the LIVE curated
    corpus), so the mix a training scheduler consumes can never drift
    from the batch operator's semantics.  Scale shape: domain counts are
    one tiny map-side-combinable aggregate broadcast back; selection is
    one window shuffle keyed on the domain (md5 priorities are uniform;
    AQE's skew split covers a dominant domain).

    ``prefilter=True`` is the extreme-scale form, bit-identical output:
    since targets are ~sqrt(n), ranking every row wastes the shuffle on
    rows that can never be picked.  The prefilter keeps, per domain, the
    rows whose md5 falls in the first ``PREFILTER_OVERSHOOT * target/n``
    of the hash space — a CLEAN PREFIX of the md5 order (the 32-bit md5
    prefix compares exactly like the full string, so every kept row
    ranks before every dropped one; ranks computed on survivors equal
    ranks in the full corpus).  Domains where the binomial tail left
    fewer survivors than the target fall back to ranking the whole
    domain — the overshoot makes that astronomically rare at scale, and
    the fallback makes the result EXACT regardless, so the threshold
    compare may safely use doubles.  Cost: one extra tiny aggregate
    (survivor counts); the window input shrinks from O(n) to
    O(OVERSHOOT * K * sqrt(n)) per domain.

    The prefilter form takes THREE passes over ``d`` (domain counts,
    survivor counts, the final pool) where the exact form takes two —
    and for the serving reads ``d`` is the whole curated-corpus
    derivation, so the input is lazily localCheckpoint'ed (the
    ivf_candidates pattern): the lineage computes once per action and
    every pass reuses the materialized blocks."""
    if prefilter:
        d = d.select("lang", "source", "doc_id").transform(materialize)
    dom = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    tgt = dom.select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("domain_docs"),
        F.least(
            F.col("n_docs"),
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.lit(TEMP_SAMPLE_MULT) * F.sqrt(F.col("n_docs").cast("double"))),
            ),
        )
        .cast("long")
        .alias("target_docs"),
    )
    pool = d.select("lang", "source", "doc_id")
    if prefilter:
        pool = _md5_prefix_pool(
            pool, tgt, target_col="target_docs", total_col="domain_docs",
            weight=F.lit(1).cast("long"),
        )
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = pool.withColumn("sample_rank", F.row_number().over(w).cast("long"))
    # tgt is domain-cardinality (tiny by construction) -> broadcast is bounded
    return (
        ranked.join(F.broadcast(tgt), ["lang", "source"])
        .filter(F.col("sample_rank") <= F.col("target_docs"))
        .select("lang", "source", "doc_id", "sample_rank", "domain_docs", "target_docs")
        .orderBy("lang", "source", "sample_rank")
    )


@register(
    "text_temperature_resample",
    category="text",
    doc=(
        "Temperature-smoothed domain resampling: per-(lang, source) doc counts "
        "flattened with a sqrt law — target = min(n, max(1, floor("
        f"{TEMP_SAMPLE_MULT}*sqrt(n)))) — then exactly target docs selected per "
        "domain by md5(doc_id) order. This is the alpha=0.5 temperature "
        "sampling a multilingual pretraining mix runs to up-weight tail "
        "domains (text_domain_mix computes the weights table; this operator "
        "materializes the sampled corpus). sqrt is the one smoothing exponent "
        "that is IEEE-correctly-rounded in every engine, so targets are "
        "cross-engine bit-identical with NO global normalization term (a "
        "sum-normalized softmax would make every target depend on a "
        "float reduction order). Scale shape: domain counts are one tiny "
        "map-side-combinable aggregate, broadcast back; selection is ONE "
        "window shuffle keyed on the domain (md5 priorities are uniform, so "
        "AQE's skew split handles a dominant domain)."
    ),
    oracle=f"""
        WITH dom AS (
            SELECT lang, source, COUNT(*) AS n_docs
            FROM documents GROUP BY lang, source
        ),
        tgt AS (
            SELECT lang, source, CAST(n_docs AS BIGINT) AS domain_docs,
                   CAST(LEAST(n_docs, GREATEST(1, CAST(FLOOR(
                        {TEMP_SAMPLE_MULT} * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)))
                        AS BIGINT) AS target_docs
            FROM dom
        ),
        ranked AS (
            SELECT lang, source, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        )
        SELECT r.lang, r.source, r.doc_id, CAST(r.rn AS BIGINT) AS sample_rank,
               t.domain_docs, t.target_docs
        FROM ranked r JOIN tgt t ON r.lang = t.lang AND r.source = t.source
        WHERE r.rn <= t.target_docs
        ORDER BY r.lang, r.source, sample_rank
    """,
)
def text_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    # prefilter=True: md5-prefix candidate filter, bit-identical output
    # (property-tested), window input shrinks O(n) -> O(K*sqrt(n))/domain
    return temperature_resample(d.select("lang", "source", "doc_id"), prefilter=True)


TOKEN_BUDGET_MULT = 40  # K_tok in target_tokens = min(total, max(1, floor(K_tok*sqrt(total))))


@register(
    "text_token_budget_sample",
    category="text",
    doc=(
        "TOKEN-budgeted temperature sampling: per (lang, source) domain a "
        "sqrt-law TOKEN budget — target_tokens = min(total, max(1, floor("
        f"{TOKEN_BUDGET_MULT}*sqrt(total_tokens)))) — filled by documents in "
        "md5(doc_id) order until the running token count crosses the budget "
        "(the boundary-crossing document is kept, so every domain "
        "contributes at least one doc). This is the mix a production "
        "scheduler actually provisions: training budgets are measured in "
        "TOKENS, not document counts — text_domain_mix computes the shares, "
        "text_temperature_resample flattens doc counts, this operator "
        "materializes a token-budgeted pool. Exact integer arithmetic "
        "throughout (word counts and running sums are BIGINT; the only "
        "double is the sqrt target expression shared verbatim with the "
        "oracle). Scale shape: one tiny domain aggregate broadcast back + "
        "ONE window shuffle on the domain key — same plan family as the "
        "doc-count resampler."
    ),
    oracle=f"""
        WITH w AS (
            SELECT lang, source, doc_id,
                   CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
            FROM documents
        ),
        dom AS (
            SELECT lang, source, SUM(n_words) AS total_tokens
            FROM w GROUP BY lang, source
        ),
        tgt AS (
            SELECT lang, source, CAST(total_tokens AS BIGINT) AS total_tokens,
                   CAST(LEAST(total_tokens, GREATEST(1, CAST(FLOOR(
                        {TOKEN_BUDGET_MULT} * sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT)))
                        AS BIGINT) AS target_tokens
            FROM dom
        ),
        ranked AS (
            SELECT lang, source, doc_id, n_words,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                   SUM(n_words) OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
            FROM w
        )
        SELECT r.lang, r.source, r.doc_id, r.n_words,
               CAST(r.rn AS BIGINT) AS sample_rank,
               CAST(r.cum_tokens AS BIGINT) AS cum_tokens,
               t.target_tokens
        FROM ranked r JOIN tgt t ON r.lang = t.lang AND r.source = t.source
        WHERE r.cum_tokens - r.n_words < t.target_tokens
        ORDER BY r.lang, r.source, sample_rank
    """,
)
def text_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).select(
        "lang",
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
    )
    # prefilter=True: md5-prefix candidate filter, bit-identical output
    # (fallback makes it exact); plan shape pinned in test_prefilter_pin.py
    return token_budget_sample(d, prefilter=True)


def token_budget_sample(d: DataFrame, prefilter: bool = False) -> DataFrame:
    """THE token-budget sampling body over a (lang, source, doc_id,
    n_words) frame — sqrt-law token targets per domain, documents kept in
    md5(doc_id) order while the PRECEDING cumulative token count is under
    the budget (the boundary document is included, so a non-empty domain
    always contributes).  Factored for the same reason as
    ``temperature_resample``: a maintained-state serving form can reuse
    it verbatim.

    ``prefilter=True`` is the extreme-scale form, bit-identical output —
    ``temperature_resample``'s md5-prefix candidate filter re-derived for
    TOKEN targets: keep, per domain, the rows whose 32-bit md5 prefix
    falls in the first ``PREFILTER_OVERSHOOT * target_tokens /
    total_tokens`` of hash space.  That is a CLEAN PREFIX of the md5
    ranking order, so survivor ranks AND survivor cumulative token sums
    equal their full-corpus values (the running sum over a prefix only
    reads rows inside the prefix).  md5 order is independent of
    ``n_words``, so the expected token mass of a hash fraction f is
    f * total_tokens; with f = OVERSHOOT * target/total the survivors
    carry ~OVERSHOOT * target_tokens.  Sufficiency is therefore checked
    in TOKENS: a domain whose survivors sum to fewer than
    ``target_tokens`` is ranked in full (the boundary document — first
    row whose cumulative sum reaches the target — is guaranteed inside
    the survivor prefix exactly when the survivor token sum reaches the
    target).  Same LEFT-join-from-targets shape as the resample
    fallback, so a zero-survivor domain falls back instead of vanishing.
    The window input shrinks from O(corpus) to
    ~OVERSHOOT * K_tok * sqrt(total_tokens) tokens' worth of rows per
    domain — the serving read a training scheduler provisions must not
    sort the corpus per call."""
    if prefilter:
        d = d.select("lang", "source", "doc_id", "n_words").transform(materialize)
    dom = d.groupBy("lang", "source").agg(F.sum("n_words").alias("total_tokens"))
    tgt = dom.select(
        "lang",
        "source",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.least(
            F.col("total_tokens"),
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    F.lit(TOKEN_BUDGET_MULT) * F.sqrt(F.col("total_tokens").cast("double"))
                ),
            ),
        )
        .cast("long")
        .alias("target_tokens"),
    )
    pool = d.select("lang", "source", "doc_id", "n_words")
    if prefilter:
        pool = _md5_prefix_pool(
            pool, tgt, target_col="target_tokens", total_col="total_tokens",
            weight=F.col("n_words"),
        )
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = pool.withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    ).withColumn(
        "cum_tokens",
        F.sum("n_words").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    # tgt is domain-cardinality (tiny by construction) -> broadcast is bounded
    return (
        ranked.join(F.broadcast(tgt.select("lang", "source", "target_tokens")), ["lang", "source"])
        .filter(F.col("cum_tokens") - F.col("n_words") < F.col("target_tokens"))
        .select(
            "lang", "source", "doc_id", "n_words", "sample_rank", "cum_tokens", "target_tokens"
        )
        .orderBy("lang", "source", "sample_rank")
    )
