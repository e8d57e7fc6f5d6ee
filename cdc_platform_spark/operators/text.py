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
from cdc_platform_spark.functions import spread
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


def _in_set(col, values: tuple[str, ...]):
    out = F.lit(False)
    for v in values:
        out = out | (col == v)
    return out


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
        return F.size(F.filter(words, lambda w: _in_set(w, markers))).cast("long")

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
        .orderBy("doc_id")
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
    n_stop = F.size(F.filter(words, lambda w: _in_set(w, STOPWORDS)))
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            n_words.cast("long").alias("n_words"),
            n_distinct.cast("long").alias("n_distinct"),
            (n_distinct.cast("double") / n_words).alias("distinct_ratio"),
            (n_stop.cast("double") / n_words).alias("stopword_ratio"),
            (total_chars.cast("double") / n_words).alias("mean_word_len"),
        )
        .orderBy("doc_id")
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
        .orderBy("doc_id")
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
    min_fp = F.array_min(F.transform(grams, lambda g: md5_60bit(g)))
    return (
        d.select(
            "doc_id",
            F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
            min_fp.cast("long").alias("rolling_min_fp"),
        )
        .orderBy("doc_id")
    )


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
    from pyspark.sql import Window

    d = spread(load_table(spark, "documents", sf_dir))
    words = F.split(F.col("text"), " ")
    subtok = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("content_md5"),
        F.size(words).alias("n_words"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("distinct_ratio"),
        subtok.alias("subword_tokens"),
    )
    quality = scored.filter((F.col("n_words") >= 20) & (F.col("distinct_ratio") >= 0.15))
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    canonical = quality.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
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
