"""Text-analysis operators for training-data pipelines.

Language ID (marker n-gram heuristic), quality scoring, token
counting (whitespace + subword estimate), and document fingerprinting
(rolling min-hash) over the ``documents`` table.  Everything is
integer/string arithmetic on JVM built-ins — no Python UDF in the hot
path — so the plans are whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_platform_spark.operators import register
from cdc_platform_spark.functions import materialize, sorted_view, spread
from cdc_platform_spark.operators.dedup import ORACLE_MD5_60BIT, md5_60bit
from cdc_platform_spark.sources.registry import load_table

# Deterministic marker vocabularies for the language-ID heuristic. With the
# synthetic corpus every doc scores identically — the point is the operator
# mechanics (per-language scores + deterministic argmax), not model quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und"),
    "en": ("the", "a", "of"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "zh": ("的", "是", "了"),
}

STOPWORDS = ("the", "a", "of", "and")




@register(
    "text_lang_id",
    category="text",
    doc=(
        "Language ID by marker-word counts with deterministic argmax "
        "(score desc, lang asc). Scores are exact integers; ties resolved "
        "alphabetically on both engines."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, lang, str_split(text, ' ') AS words FROM documents),
        scores AS (
            SELECT doc_id, lang,
                   {", ".join(
                       f"len(list_filter(words, x -> x IN ({', '.join(repr(m) for m in LANG_MARKERS[lg])}))) AS score_{lg}"
                       for lg in sorted(LANG_MARKERS)
                   )}
            FROM w
        ),
        best AS (
            SELECT doc_id, lang,
                   GREATEST({", ".join(f"score_{lg}" for lg in sorted(LANG_MARKERS))}) AS mx,
                   CASE {" ".join(f"WHEN score_{lg} = GREATEST({', '.join('score_' + l2 for l2 in sorted(LANG_MARKERS))}) THEN '{lg}'" for lg in sorted(LANG_MARKERS))} END AS cand
            FROM scores
        )
        SELECT doc_id, cand AS pred_lang, CAST(mx AS BIGINT) AS score,
               CAST(CASE WHEN cand = lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
        FROM best
        ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    def marker_score(lg: str):
        markers = LANG_MARKERS[lg]
        # NB: the filter lambda must take exactly one parameter — a second one
        # would be interpreted by Spark as the element-index column.
        return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("long")

    score_structs = F.array(
        *[
            F.struct(marker_score(lg).alias("score"), F.lit(lg).alias("cand"))
            for lg in sorted(LANG_MARKERS)
        ]
    )
    # deterministic argmax: sort by (-score, cand) and take the head
    best = F.element_at(
        F.array_sort(
            score_structs,
            lambda a, b: F.when(a["score"] > b["score"], -1)
            .when(a["score"] < b["score"], 1)
            .when(a["cand"] < b["cand"], -1)
            .when(a["cand"] > b["cand"], 1)
            .otherwise(0),
        ),
        1,
    )
    return (
        d.select("doc_id", "lang", best.alias("best"))
        .select(
            "doc_id",
            F.col("best.cand").alias("pred_lang"),
            F.col("best.score").alias("score"),
            F.when(F.col("best.cand") == F.col("lang"), 1).otherwise(0).cast("long").alias("is_correct"),
        )
        .transform(sorted_view, "doc_id")
    )


@register(
    "text_quality",
    category="text",
    doc=(
        "Quality scoring: length, word counts, distinct ratio, stopword ratio, "
        "mean word length — exact integer counts, IEEE-deterministic ratios."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, n_chars, str_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
               CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS distinct_ratio,
               CAST(len(list_filter(words, x -> x IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS DOUBLE) / len(words) AS stopword_ratio,
               CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) AS mean_word_len
        FROM w
        ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return sorted_view(
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            n_words.cast("long").alias("n_words"),
            n_distinct.cast("long").alias("n_distinct"),
            (n_distinct.cast("double") / n_words).alias("distinct_ratio"),
            (n_stop.cast("double") / n_words).alias("stopword_ratio"),
            (total_chars.cast("double") / n_words).alias("mean_word_len"),
        ),
        "doc_id",
    )


@register(
    "text_token_count",
    category="text",
    doc=(
        "Token counting: whitespace tokens plus a BPE-ish subword estimate "
        "(ceil(len/4) per word) — the standard pre-tokenizer cost model, all "
        "exact integer arithmetic."
    ),
    oracle="""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS ws_tokens,
               CAST(list_sum(list_transform(words, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS subword_tokens,
               CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS total_chars
        FROM w
        ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    sub = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return (
        d.select(
            "doc_id",
            F.size(words).cast("long").alias("ws_tokens"),
            sub.alias("subword_tokens"),
            chars.alias("total_chars"),
        )
        .transform(sorted_view, "doc_id")
    )


_gram_hash = ORACLE_MD5_60BIT.format(
    x="words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]"
)

@register(
    "text_fingerprint",
    category="text",
    doc=(
        "Document fingerprinting: content md5 of normalized text plus a "
        "rolling-hash fingerprint (min md5 over word 4-grams — winnowing-style), "
        "the join key for fuzzy-dup candidate lookups."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, lower(trim(text)) AS norm, str_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               md5(norm) AS content_md5,
               CAST(list_min(list_transform(range(1, len(words)-2), i -> {_gram_hash})) AS BIGINT) AS rolling_min_fp
        FROM w
        ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
            F.element_at(words, i + 3),
        ),
    )
    # short-doc guard: under 4 words the sequence would step NEGATIVE and
    # element_at would throw INVALID_ARRAY_INDEX (job abort); the oracle's
    # empty range() yields NULL, so mirror that
    min_fp = F.when(
        F.size(words) >= 4, F.array_min(F.transform(grams, lambda g: md5_60bit(g)))
    )
    return (
        d.select(
            "doc_id",
            F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
            min_fp.cast("long").alias("rolling_min_fp"),
        )
        .transform(sorted_view, "doc_id")
    )


@register(
    "text_repetition",
    category="text",
    doc=(
        "Repetition signals (Gopher-style quality filters, Rae et al. 2021 "
        "§A1.1): top-word fraction, top-bigram fraction, duplicate-bigram "
        "fraction per document, plus the is_repetitive gate. Computed by "
        "explode + two-level aggregation — one narrow shuffle on "
        "(doc_id, term), linear in corpus size (never per-row O(len^2) "
        "scans, which die on long documents)."
    ),
    oracle="""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
        wc AS (
            SELECT doc_id, MAX(cnt) AS top_word_cnt, SUM(cnt) AS n_words,
                   COUNT(*) AS n_distinct_words
            FROM (SELECT doc_id, word, COUNT(*) AS cnt
                  FROM (SELECT doc_id, unnest(words) AS word FROM w)
                  GROUP BY doc_id, word)
            GROUP BY doc_id
        ),
        bc AS (
            SELECT doc_id, MAX(cnt) AS top_bigram_cnt, SUM(cnt) AS n_bigrams,
                   COUNT(*) AS n_distinct_bigrams
            FROM (SELECT doc_id, bigram, COUNT(*) AS cnt
                  FROM (SELECT doc_id,
                               unnest(list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i+1])) AS bigram
                        FROM w)
                  GROUP BY doc_id, bigram)
            GROUP BY doc_id
        )
        SELECT wc.doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(top_word_cnt AS DOUBLE) / n_words AS top_word_fraction,
               CAST(top_bigram_cnt AS DOUBLE) / n_bigrams AS top_bigram_fraction,
               CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_fraction,
               CAST((CAST(top_word_cnt AS DOUBLE) / n_words > 0.125)
                    OR (CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams > 0.5)
                    AS BIGINT) AS is_repetitive
        FROM wc LEFT JOIN bc ON wc.doc_id = bc.doc_id
        ORDER BY wc.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    # guarded: sequence(1, 0) would infer a NEGATIVE step and yield [1, 0]
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Materialized once: both term-stats branches explode from this, and
    # re-deriving it means re-running the split + 2-wide concat over every
    # document per branch (the dominant compute at corpus scale).
    # persist, not localCheckpoint: branch reuse needs materialize-once,
    # and persist keeps LINEAGE so a lost executor recomputes instead of
    # failing the job (localCheckpoint is reserved for iterative plans
    # where lineage must be CUT — Lloyd training, components)
    base = d.select("doc_id", words.alias("words"), bigrams.alias("bigrams")).persist()

    def term_stats(col: str, prefix: str) -> DataFrame:
        return (
            base.select("doc_id", F.explode(col).alias("t"))
            .groupBy("doc_id", "t")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("doc_id")
            .agg(
                F.max("cnt").alias(f"top_{prefix}_cnt"),
                F.sum("cnt").alias(f"n_{prefix}s"),
                F.count(F.lit(1)).alias(f"n_distinct_{prefix}s"),
            )
        )

    out = term_stats("words", "word").join(term_stats("bigrams", "bigram"), "doc_id", "left")
    top_word_fraction = F.col("top_word_cnt").cast("double") / F.col("n_words")
    top_bigram_fraction = F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams")
    dup_bigram_fraction = (
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double") / F.col("n_bigrams")
    )
    return (
        out.select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            top_word_fraction.alias("top_word_fraction"),
            top_bigram_fraction.alias("top_bigram_fraction"),
            dup_bigram_fraction.alias("dup_bigram_fraction"),
            ((top_word_fraction > 0.125) | (dup_bigram_fraction > 0.5))
            .cast("long")
            .alias("is_repetitive"),
        )
        .transform(sorted_view, "doc_id")
    )


DECON_NGRAM = 8  # benchmark-overlap n-gram width (GPT-3/PaLM style decontamination)
DECON_BENCH_MOD = 97  # synthetic "eval set": doc_id % 97 == 0
STOP_GRAM_DOC_FREQ_CAP = 2  # opt-in boilerplate cap for the capped report

_decon_gram_spark_width = DECON_NGRAM - 1
_decon_gram_duck = " || ' ' || ".join(f"words[i+{j}]" for j in range(DECON_NGRAM)).replace(
    "words[i+0]", "words[i]"
)
_DECON_GRAMS_DUCK = (
    f"list_distinct(list_transform(range(1, len(words)-{DECON_NGRAM - 2}), i -> {_decon_gram_duck}))"
)


def decon_gram_hashes_col(text_col: F.Column) -> F.Column:
    """THE decontamination gram expression — distinct word
    ``DECON_NGRAM``-grams of a text column as 60-bit md5 hashes
    (``array<long>``).  One definition shared by the batch
    ``text_decontaminate`` and the streaming ``CuratedCorpusSink``'s
    write-time gram computation, so the incrementally stored grams can
    never drift from the batch's.  Pure JVM higher-order functions —
    no Python in the gram path."""
    words = F.split(text_col, " ")
    grams = F.when(
        F.size(words) >= DECON_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - _decon_gram_spark_width),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(DECON_NGRAM)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.transform(grams, lambda g: md5_60bit(g)))


@register(
    "text_decontaminate",
    category="text",
    doc=(
        f"Train/eval decontamination: word {DECON_NGRAM}-gram overlap of every "
        f"corpus document against the benchmark partition (doc_id % {DECON_BENCH_MOD} == 0). "
        "Benchmark grams are a DISTINCT projection of a tiny partition, joined "
        "broadcast against the corpus gram stream (60-bit md5 keys keep the "
        "shuffle narrow); the corpus side never self-joins. The contaminated "
        "flag + ratio drive the drop/keep decision in a real pretraining funnel."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id, {ORACLE_MD5_60BIT.format(x="gram")} AS gh
            FROM (SELECT doc_id, unnest({_DECON_GRAMS_DUCK}) AS gram FROM w)
        ),
        bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0),
        hits AS (
            SELECT c.doc_id, COUNT(*) AS n_hit_grams
            FROM g c JOIN bench b USING (gh)
            WHERE c.doc_id % {DECON_BENCH_MOD} <> 0
            GROUP BY c.doc_id
        ),
        base AS (
            SELECT doc_id, len({_DECON_GRAMS_DUCK}) AS n_grams
            FROM w WHERE doc_id % {DECON_BENCH_MOD} <> 0
        )
        SELECT base.doc_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
               CASE WHEN n_grams > 0
                    THEN CAST(COALESCE(n_hit_grams, 0) AS DOUBLE) / n_grams END AS contamination_ratio,
               CAST(COALESCE(n_hit_grams, 0) > 0 AS BIGINT) AS is_contaminated
        FROM base LEFT JOIN hits USING (doc_id)
        ORDER BY base.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    # distinct gram hashes per doc, materialized once (feeds bench set,
    # hit join, and the per-doc gram counts)
    g = (
        d.select("doc_id", decon_gram_hashes_col(F.col("text")).alias("grams"))
        .persist()  # branch reuse with lineage kept (see text_repetition note)
    )
    exploded = g.select("doc_id", F.explode("grams").alias("gh"))
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    # No broadcast HINT: a real eval set is fixed-size and auto-broadcasts
    # under the threshold, but this fixture stand-in (a mod-97 slice) grows
    # WITH the corpus — a forced broadcast would bypass
    # autoBroadcastJoinThreshold and OOM at scale, so let Catalyst/AQE pick
    # the strategy from actual sizes.
    bench = exploded.filter(is_bench).select("gh").distinct()
    hits = (
        exploded.filter(~is_bench)
        .join(bench, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    base = g.filter(~is_bench).select("doc_id", F.size("grams").alias("n_grams"))
    n_hits = F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long")
    out = (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            n_hits.alias("n_hit_grams"),
            F.when(F.col("n_grams") > 0, n_hits.cast("double") / F.col("n_grams")).alias(
                "contamination_ratio"
            ),
            (n_hits > 0).cast("long").alias("is_contaminated"),
        )
    )
    return sorted_view(out, "doc_id")


@register(
    "text_contamination_report",
    category="text",
    doc=(
        "Contamination ATTRIBUTION — the operational counterpart of "
        "text_decontaminate: per BENCHMARK document, how many corpus "
        "documents leak it (share >= 1 word 8-gram) and how many of its "
        "grams are leaked at all.  This is the report an eval owner reads "
        "to decide which benchmark tasks are compromised; the overlap join "
        "is the same gram-hash equi-join as the drop rule, with the "
        "attribution kept on the bench side (one shuffle on the gram key, "
        "distinct-doc counting map-side partial)."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id, {ORACLE_MD5_60BIT.format(x="gram")} AS gh
            FROM (SELECT doc_id, unnest({_DECON_GRAMS_DUCK}) AS gram FROM w)
        ),
        bench AS (SELECT doc_id AS bench_id, gh FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0),
        corpus AS (SELECT doc_id, gh FROM g WHERE doc_id % {DECON_BENCH_MOD} <> 0),
        leaks AS (
            SELECT b.bench_id,
                   COUNT(DISTINCT c.doc_id) AS n_leaking_docs,
                   COUNT(DISTINCT b.gh) AS n_leaked_grams
            FROM bench b JOIN corpus c USING (gh)
            GROUP BY b.bench_id
        ),
        base AS (
            SELECT doc_id AS bench_id, len({_DECON_GRAMS_DUCK}) AS n_grams
            FROM w WHERE doc_id % {DECON_BENCH_MOD} = 0
        )
        SELECT base.bench_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams,
               CAST(COALESCE(n_leaking_docs, 0) AS BIGINT) AS n_leaking_docs,
               CASE WHEN n_grams > 0
                    THEN CAST(COALESCE(n_leaked_grams, 0) AS DOUBLE) / n_grams END AS leak_ratio
        FROM base LEFT JOIN leaks USING (bench_id)
        ORDER BY bench_id
    """,
)
def text_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    g = d.select("doc_id", decon_gram_hashes_col(F.col("text")).alias("grams")).persist()
    return contamination_report_from_grams(g).orderBy("bench_id")


@register(
    "text_contamination_report_capped",
    category="text",
    doc=(
        "Contamination attribution with the OPT-IN stop-gram cap: grams "
        "appearing in more corpus documents than the cap are excluded from "
        "the leak join as boilerplate (license headers, footers) — the skew "
        "valve for web-scale corpora where one universal 8-gram makes a hot "
        "join key AND is semantically worthless as contamination evidence. "
        "Changes semantics vs text_contamination_report, hence a separate "
        "registered operator; the doc-frequency pass is a map-side-partial "
        "count_distinct, so the hot key itself aggregates skew-safely."
    ),
    oracle=f"""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id, {ORACLE_MD5_60BIT.format(x="gram")} AS gh
            FROM (SELECT doc_id, unnest({_DECON_GRAMS_DUCK}) AS gram FROM w)
        ),
        bench AS (SELECT doc_id AS bench_id, gh FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0),
        corpus0 AS (SELECT doc_id, gh FROM g WHERE doc_id % {DECON_BENCH_MOD} <> 0),
        stop AS (
            SELECT gh FROM corpus0 GROUP BY gh
            HAVING COUNT(DISTINCT doc_id) > {STOP_GRAM_DOC_FREQ_CAP}
        ),
        corpus AS (SELECT * FROM corpus0 WHERE gh NOT IN (SELECT gh FROM stop)),
        leaks AS (
            SELECT b.bench_id,
                   COUNT(DISTINCT c.doc_id) AS n_leaking_docs,
                   COUNT(DISTINCT b.gh) AS n_leaked_grams
            FROM bench b JOIN corpus c USING (gh)
            GROUP BY b.bench_id
        ),
        base AS (
            SELECT doc_id AS bench_id, len({_DECON_GRAMS_DUCK}) AS n_grams
            FROM w WHERE doc_id % {DECON_BENCH_MOD} = 0
        )
        SELECT base.bench_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams,
               CAST(COALESCE(n_leaking_docs, 0) AS BIGINT) AS n_leaking_docs,
               CASE WHEN n_grams > 0
                    THEN CAST(COALESCE(n_leaked_grams, 0) AS DOUBLE) / n_grams END AS leak_ratio
        FROM base LEFT JOIN leaks USING (bench_id)
        ORDER BY bench_id
    """,
)
def text_contamination_report_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    g = d.select("doc_id", decon_gram_hashes_col(F.col("text")).alias("grams")).persist()
    return contamination_report_from_grams(
        g, stop_gram_cap=STOP_GRAM_DOC_FREQ_CAP
    ).orderBy("bench_id")


def contamination_report_from_grams(
    g: DataFrame, stop_gram_cap: int | None = None
) -> DataFrame:
    """THE contamination-attribution rollup over a (doc_id, grams
    array<long>) frame — one definition shared by the batch
    ``text_contamination_report`` and the streaming
    ``CuratedCorpusSink.contamination_report()`` (which feeds it the
    write-time gram hashes), so the served report can never drift from
    the batch semantics.  No broadcast hint on the leak join: the
    fixture bench slice grows with the corpus, AQE picks the strategy
    from actual sizes.

    ``stop_gram_cap`` (OPT-IN — it changes semantics) excludes grams
    appearing in more than ``cap`` distinct corpus documents before the
    leak join.  This is the skew valve for web-scale corpora: one
    universal 8-gram (a license header, a boilerplate footer) joins
    against every document carrying it and makes a hot key the equi-join
    shuffles entirely to one reducer family; AQE's skew split covers the
    join mechanically, but a boilerplate gram is also semantically
    worthless as contamination evidence — every decontamination system
    at scale drops it.  The doc-frequency pass itself is skew-safe:
    count_distinct partials combine map-side, so the hot key arrives at
    its reducer pre-collapsed rather than row-per-document."""
    exploded = g.select("doc_id", F.explode("grams").alias("gh"))
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench = exploded.filter(is_bench).select(F.col("doc_id").alias("bench_id"), "gh")
    corpus = exploded.filter(~is_bench)
    if stop_gram_cap is not None:
        corpus = drop_stop_grams(corpus, stop_gram_cap)
    base = g.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), F.size("grams").alias("n_grams")
    )
    return contamination_rollup(base, bench.join(corpus, "gh"))


def drop_stop_grams(g: DataFrame, stop_gram_cap: int) -> DataFrame:
    """THE stop-gram exclusion rule over (doc_id, gh, ...) evidence rows —
    drop every row whose gram appears in more than ``cap`` distinct
    documents.  One definition shared by the batch capped report above
    and the served ``CuratedCorpusSink`` capped reads (which apply it to
    the maintained leak triples, where the per-gram distinct-doc count
    equals the live-corpus DF), so the two capped semantics cannot
    drift.  Skew-safe: ``count_distinct`` partials combine map-side, so a
    boilerplate gram reaches its reducer pre-collapsed; extra columns on
    ``g`` pass through the anti join untouched."""
    over = (
        g.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > stop_gram_cap)
        .select("gh")
    )
    return g.join(over, "gh", "leftanti")


def contamination_rollup(base: DataFrame, leak_triples: DataFrame) -> DataFrame:
    """THE attribution rollup over the leak evidence — one definition
    shared by the batch ``contamination_report_from_grams`` (which
    derives the triples from grams per run) and the streaming
    ``CuratedCorpusSink.contamination_report()`` (which reads them from
    the MAINTAINED leak view), so the served report can never drift from
    the batch semantics.  ``base`` = (bench_id, n_grams) for every live
    benchmark doc; ``leak_triples`` = (bench_id, doc_id, gh) leak
    evidence rows (duplicates tolerated — both counts are DISTINCT)."""
    leaks = leak_triples.groupBy("bench_id").agg(
        F.count_distinct("doc_id").alias("n_leaking_docs"),
        F.count_distinct("gh").alias("n_leaked_grams"),
    )
    n_grams_lk = F.coalesce(F.col("n_leaked_grams"), F.lit(0)).cast("long")
    n_docs_lk = F.coalesce(F.col("n_leaking_docs"), F.lit(0)).cast("long")
    return base.join(leaks, "bench_id", "left").select(
        "bench_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        n_grams_lk.alias("n_leaked_grams"),
        n_docs_lk.alias("n_leaking_docs"),
        F.when(
            F.col("n_grams") > 0, n_grams_lk.cast("double") / F.col("n_grams")
        ).alias("leak_ratio"),
    )


# PII patterns: explicit [0-9]/[a-z] classes only, so the Java (Spark) and
# RE2 (DuckDB) dialects match byte-for-byte.
PII_EMAIL_RE = r"[a-z0-9]+@[a-z0-9.]+"
PII_PHONE_RE = r"\+[0-9]-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_scrub",
    category="text",
    doc=(
        "PII scrubbing: regex redaction of emails and phone numbers with "
        "per-document match accounting. The synthetic corpus carries no PII, "
        "so a deterministic contact line (derived from doc_id IN BOTH ENGINES) "
        "is prepended before scrubbing — the operator under test is the "
        "redaction pipeline itself: pattern counts, replacement, byte-exact "
        "output (md5-pinned). Pure JVM regexp — whole-stage codegen, no UDF."
    ),
    oracle=f"""
        WITH c AS (
            SELECT doc_id,
                   'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com +1-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' says: ' || text AS contact
            FROM documents
        ),
        r AS (
            SELECT doc_id, contact,
                   regexp_replace(regexp_replace(contact, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
            FROM c
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(contact, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(contact, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
               CAST(length(contact) - length(redacted) AS BIGINT) AS chars_redacted,
               md5(redacted) AS redacted_md5
        FROM r
        ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    contact = F.concat(
        F.lit("user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" says: "),
        F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(contact, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return (
        d.select(
            "doc_id",
            F.regexp_count(contact, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
            F.regexp_count(contact, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
            (F.length(contact) - F.length(redacted)).cast("long").alias("chars_redacted"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .transform(sorted_view, "doc_id")
    )


@register(
    "text_domain_mix",
    category="text",
    doc=(
        "Data-mixing weights: per (lang, source) domain token totals with "
        "global token share and cumulative share (largest-first) — the table "
        "a sampling scheduler consumes to hit a target mixture. One tiny "
        "aggregate (domains are low-cardinality) after a map-side partial agg "
        "over the corpus."
    ),
    oracle="""
        WITH tok AS (
            SELECT lang, source,
                   CAST(list_sum(list_transform(str_split(text, ' '),
                        x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS toks
            FROM documents
        ),
        dom AS (
            SELECT lang, source, COUNT(*) AS n_docs, SUM(toks) AS total_tokens
            FROM tok GROUP BY lang, source
        )
        SELECT lang, source,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(total_tokens AS BIGINT) AS total_tokens,
               CAST(total_tokens AS DOUBLE) / SUM(total_tokens) OVER () AS token_share,
               CAST(SUM(total_tokens) OVER (ORDER BY total_tokens DESC, lang, source
                                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / SUM(total_tokens) OVER () AS cum_share
        FROM dom
        ORDER BY total_tokens DESC, lang, source
    """,
)
def text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    toks = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dom = (
        d.select("lang", "source", toks.alias("toks"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("total_tokens"))
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy()
        .orderBy(F.col("total_tokens").desc(), "lang", "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grand = F.sum("total_tokens").over(w_all)
    return (
        dom.select(
            "lang",
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            (F.col("total_tokens").cast("double") / grand).alias("token_share"),
            (F.sum("total_tokens").over(w_cum).cast("double") / grand).alias("cum_share"),
        )
        .orderBy(F.col("total_tokens").desc(), "lang", "source")
    )


CURATION_MIN_WORDS = 20
CURATION_MIN_DISTINCT_RATIO = 0.15


def curation_metric_cols() -> tuple[F.Column, F.Column, F.Column]:
    """THE quality-metric expressions of the curation funnel —
    (content_md5, n_words, distinct_ratio) over a ``text`` column.  One
    definition shared by the batch funnel (curation_survivors) and the
    streaming CuratedCorpusSink's write-time metric computation, so the
    incrementally stored metrics can never drift from the batch's."""
    words = F.split(F.col("text"), " ")
    return (
        F.md5("text").alias("content_md5"),
        F.size(words).alias("n_words"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias(
            "distinct_ratio"
        ),
    )


def curation_survivors_from_metrics(scored: DataFrame) -> DataFrame:
    """The funnel's filter + exact-dedup stage over PRE-COMPUTED metric
    columns (content_md5, n_words, distinct_ratio) — the serving half of
    the funnel, shared by the batch path and the streaming curated()
    read (which stores the metrics incrementally at write time)."""
    from pyspark.sql import Window

    quality = scored.filter(
        (F.col("n_words") >= CURATION_MIN_WORDS)
        & (F.col("distinct_ratio") >= CURATION_MIN_DISTINCT_RATIO)
    )
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return quality.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")


def curation_survivors(d: DataFrame, *extra_cols: F.Column) -> DataFrame:
    """The canonical curation funnel — quality filter (>= CURATION_MIN_WORDS
    words, >= CURATION_MIN_DISTINCT_RATIO distinct-word ratio) then exact
    dedup to the lowest doc_id per content md5.  ONE definition shared by
    text_curation_pipeline and the export-side curated_packed_docs, so the
    metrics operator and the CLI export can never disagree about which
    documents survived.  ``extra_cols`` are computed alongside (e.g. lang,
    token counts); output always has doc_id, content_md5, n_words,
    distinct_ratio plus the extras."""
    scored = d.select("doc_id", *curation_metric_cols(), *extra_cols)
    return curation_survivors_from_metrics(scored)



@register(
    "text_curation_pipeline",
    category="text",
    doc=(
        "End-to-end training-data curation composite: quality-filter (length, "
        "distinct-ratio) -> exact-dedup (keep canonical doc per content hash) -> "
        "language selection -> per-language token budget accounting. The whole "
        "LLM-data funnel as one declarative plan."
    ),
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang, text,
                   str_split(text, ' ') AS words,
                   md5(text) AS content_md5
            FROM documents
        ),
        quality AS (
            SELECT doc_id, lang, content_md5, len(words) AS n_words,
                   CAST(list_sum(list_transform(words, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS subword_tokens
            FROM scored
            WHERE len(words) >= 20
              AND CAST(len(list_distinct(words)) AS DOUBLE) / len(words) >= 0.15
        ),
        canonical AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id) AS rn
                FROM quality) WHERE rn = 1
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               CAST(SUM(subword_tokens) AS BIGINT) AS total_tokens
        FROM canonical
        WHERE lang IN ('en', 'de', 'fr')
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    subtok = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    canonical = curation_survivors(d, F.col("lang"), subtok.alias("subword_tokens"))
    return (
        canonical.filter(F.col("lang").isin("en", "de", "fr"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("subword_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("lang")
    )


SHARD_TOKEN_BUDGET = 2000  # whitespace tokens per output shard


@register(
    "text_shard_pack",
    category="text",
    doc=(
        f"Token-budget shard packing: assign documents (in deterministic "
        f"doc_id order) to consecutive shards of ~{SHARD_TOKEN_BUDGET} "
        "whitespace tokens each — the write-side layout step of a training "
        "run (fixed-size shard files, stable doc order). Implemented as a "
        "TWO-PASS DISTRIBUTED PREFIX SUM, not a global single-partition "
        "window: pass 1 range-partitions on doc_id and reduces each "
        "partition to one token total (a #partitions-row side table); the "
        "exclusive per-partition offsets from that tiny table broadcast "
        "back, and pass 2 adds a partition-local running sum. Shard id = "
        "global starting offset div budget. At 100 TB the only full-data "
        "exchange is the range partitioning; the cross-partition dependency "
        "is the #partitions-row offset table (driver-side math on bounded "
        "metadata, same class as zipWithIndex's offset collection)."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(str_split(text, ' ')) AS n_tokens FROM documents
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id
        FROM t
        ORDER BY doc_id
    """,
)
def text_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions import distributed_prefix_sum

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        distributed_prefix_sum(d, "doc_id", "n_tokens", out_col="start")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"start div {SHARD_TOKEN_BUDGET}").alias("shard_id"),
        )
        .transform(sorted_view, "doc_id")
    )


def curated_packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shard assignments for the CURATED corpus — the write-side
    dataframe behind ``text_export_shards`` (the CLI ``export`` verb writes
    exactly this, partitioned by shard_id)."""
    from pyspark.sql import Window

    from cdc_platform_spark.functions import distributed_prefix_sum

    d = spread(load_table(spark, "documents", sf_dir))
    canonical = curation_survivors(d).select(
        "doc_id", F.col("n_words").cast("long").alias("n_tokens")
    )
    return distributed_prefix_sum(canonical, "doc_id", "n_tokens", out_col="start").select(
        "doc_id", "n_tokens", F.expr(f"start div {SHARD_TOKEN_BUDGET}").alias("shard_id")
    )



@register(
    "text_export_shards",
    category="text",
    doc=(
        "The full training-data EXPORT composite — what a pretraining run "
        "actually consumes: quality filter (length, distinct-ratio) -> "
        "exact dedup (canonical doc per content hash) -> token-budget shard "
        "assignment over the SURVIVORS (distributed prefix sum, see "
        "text_shard_pack) -> per-shard manifest (doc count, token total, "
        "doc_id range). One declarative plan end to end: the funnel stages "
        "are filters/windows feeding the prefix sum; the manifest is a "
        "map-side-combinable aggregate on shard_id. At 100 TB the shard "
        "manifest IS the training job's input list."
    ),
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, md5(text) AS content_md5,
                   len(str_split(text, ' ')) AS n_tokens,
                   CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                       / len(str_split(text, ' ')) AS distinct_ratio
            FROM documents
        ),
        quality AS (
            SELECT * FROM scored WHERE n_tokens >= 20 AND distinct_ratio >= 0.15
        ),
        canonical AS (
            SELECT doc_id, n_tokens FROM (
                SELECT doc_id, n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id) AS rn
                FROM quality) WHERE rn = 1
        ),
        packed AS (
            SELECT doc_id, n_tokens,
                   (SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens) // {SHARD_TOKEN_BUDGET} AS shard_id
            FROM canonical
        )
        SELECT CAST(shard_id AS BIGINT) AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS first_doc_id,
               MAX(doc_id) AS last_doc_id
        FROM packed
        GROUP BY shard_id
        ORDER BY shard_id
    """,
)
def text_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        curated_packed_docs(spark, sf_dir)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("shard_id")
    )


SEQ_LEN = 512  # tokens per packed training sequence


@register(
    "text_sequence_pack",
    category="text",
    doc=(
        f"Token-granular SEQUENCE packing (the GPT-style concat-then-chunk "
        f"layout, distinct from text_shard_pack's doc-granular budget "
        f"buckets): documents concatenate in doc_id order into one token "
        f"stream chunked into {SEQ_LEN}-token training sequences; each doc "
        "reports its global token offset, first/last sequence index, and "
        "whether it straddles a sequence boundary (the attention-masking "
        "concern in packed pretraining batches). Offsets come from the "
        "same two-pass distributed prefix sum — no global single-partition "
        "window at any scale."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len(str_split(text, ' ')) AS n_tokens FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS token_start
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(token_start AS BIGINT) AS token_start,
               CAST(token_start // {SEQ_LEN} AS BIGINT) AS first_seq,
               CAST((token_start + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS last_seq,
               CAST((token_start // {SEQ_LEN}) <> ((token_start + n_tokens - 1) // {SEQ_LEN})
                    AS BIGINT) AS crosses_boundary
        FROM c
        ORDER BY doc_id
    """,
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_platform_spark.functions import distributed_prefix_sum

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    packed = distributed_prefix_sum(d, "doc_id", "n_tokens", out_col="token_start")
    first_seq = F.expr(f"token_start div {SEQ_LEN}")
    last_seq = F.expr(f"(token_start + n_tokens - 1) div {SEQ_LEN}")
    return (
        packed.select(
            "doc_id",
            "n_tokens",
            F.col("token_start").cast("long").alias("token_start"),
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (first_seq != last_seq).cast("long").alias("crosses_boundary"),
        )
        .transform(sorted_view, "doc_id")
    )


@register(
    "text_bigram_fluency",
    category="text",
    doc=(
        "LM-style fluency signal for corpus filtering: each document scored "
        "by the corpus-frequency of its bigrams — total and mean occurrence "
        "count of the doc's word bigrams across the whole corpus, plus how "
        "many are corpus-unique (hapax bigrams: count==1, i.e. only this "
        "occurrence). Low mean / high hapax share flags disfluent or "
        "garbled text the way an n-gram LM perplexity filter would, but in "
        "exact integer arithmetic (the only division is the final "
        "deterministic cast). Scale shape: one shuffle to count bigrams "
        "(map-side combinable), one count-lookup join keyed by bigram "
        "(1:1 fan-out per occurrence), one doc-id aggregation."
    ),
    oracle="""
        WITH ws AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
        bg AS (
            SELECT doc_id, unnest(list_transform(range(1, len(w)),
                   i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM ws WHERE len(w) >= 2
        ),
        counts AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
        scored AS (
            SELECT bg.doc_id,
                   COUNT(*) AS n_bigrams,
                   SUM(counts.c) AS freq_sum,
                   SUM(CASE WHEN counts.c = 1 THEN 1 ELSE 0 END) AS n_hapax
            FROM bg JOIN counts ON bg.bigram = counts.bigram
            GROUP BY bg.doc_id
        )
        SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(freq_sum AS BIGINT) AS freq_sum,
               CAST(n_hapax AS BIGINT) AS n_hapax,
               CAST(freq_sum AS DOUBLE) / n_bigrams AS mean_freq
        FROM scored
        ORDER BY doc_id
    """,
)
def text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda w, i: F.concat(w, F.lit(" "), F.element_at(words, i + 2)),
    )
    bg = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .persist()  # feeds both the count and the lookup side; lineage kept
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    out = (
        bg.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c").alias("freq_sum"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("freq_sum").cast("long").alias("freq_sum"),
            F.col("n_hapax").cast("long").alias("n_hapax"),
            (F.col("freq_sum").cast("double") / F.col("n_bigrams")).alias("mean_freq"),
        )
    )
    return sorted_view(out, "doc_id")


TFIDF_TOP_K = 3


@register(
    "text_tfidf_topterms",
    category="text",
    doc=(
        f"Rational TF-IDF: top-{TFIDF_TOP_K} terms per document ranked by "
        "tf/df (term frequency over document frequency — the log-free "
        "variant preserves the ranking semantics while staying exact: tf "
        "and df are integers, the ratio is one deterministic IEEE division, "
        "ties break lexically). The corpus-side df is a distinct-doc count "
        "per term (one shuffle, map-side combinable); the per-doc tf join "
        "is keyed by term with 1:1 fan-out; the top-k is a WindowGroupLimit "
        "per doc, never a global sort."
    ),
    oracle=f"""
        WITH ws AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
        tf AS (
            SELECT doc_id, unnest(w) AS term FROM ws
        ),
        tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        ranked AS (
            SELECT tfc.doc_id, tfc.term, tfc.tf, df.df,
                   CAST(tfc.tf AS DOUBLE) / df.df AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tfc.doc_id
                       ORDER BY CAST(tfc.tf AS DOUBLE) / df.df DESC, tfc.term) AS rnk
            FROM tfc JOIN df ON tfc.term = df.term
        )
        SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        FROM ranked WHERE rnk <= {TFIDF_TOP_K}
        ORDER BY doc_id, rank
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, "documents", sf_dir))
    terms = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    terms = terms.persist()  # tf and df share one scan; lineage kept
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    out = (
        tf.join(df, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id", "rank", "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            score.alias("score"),
        )
    )
    return sorted_view(out, "doc_id", "rank")
