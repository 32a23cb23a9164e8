"""Text-analysis + dedup queries over the `documents` table
(build-brief LLM-pipeline surface; FIXTURES.md §C: documents exercise
dedup + string/regexp + length/lang filters).

All hot-path expressions are JVM built-ins (split/regexp/md5/xxhash64);
no Python UDFs (SURVEY §2.10 policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, rebalance
from . import register

#: Tiny deterministic stopword list for quality scoring (shared with the
#: oracle SQL verbatim).
STOPWORDS = ("the", "a")


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
    doc="Exact dedup via content hash groupBy (dedup family, tier 1). "
        "At 100 TB: hash first (md5 col is 32 bytes vs document KBs), "
        "shuffle only (hash, doc_id) — never the text.",
    tags=("documents", "dedup"),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4)  AS avg_tokens,
           round(avg(n_chars), 4)                       AS avg_chars,
           max(len(string_split(text, ' ')))            AS max_tokens
    FROM documents
    GROUP BY lang
    """,
    doc="Token counting (whitespace tokenizer) + length stats per lang — "
        "the basic text-quality signal set. Pure codegen'd string ops.",
    tags=("documents", "text"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max(ntok).cast("long").alias("max_tokens"),
    )


@register(
    "doc_quality_scores",
    oracle="""
    WITH scored AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a'))) AS n_stop
      FROM documents
    )
    SELECT source,
           round(avg(CAST(n_stop AS DOUBLE) / n_tokens), 4) AS avg_stopword_ratio,
           round(avg(n_tokens), 2) AS avg_len,
           count(*) FILTER (WHERE n_tokens >= 30) AS n_long_docs
    FROM scored GROUP BY source
    """,
    doc="Quality scoring: stopword ratio + length filters per source "
        "(LLM-data curation heuristics). Array higher-order functions "
        "(F.filter) keep it JVM-side.",
    tags=("documents", "text"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(load_table(spark, sf_dir, "documents"), spark)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return (
        docs.select("source", n_tokens.alias("n_tokens"), n_stop.alias("n_stop"))
        .groupBy("source")
        .agg(
            F.round(F.avg(F.col("n_stop").cast("double") / F.col("n_tokens")), 4).alias(
                "avg_stopword_ratio"
            ),
            F.round(F.avg("n_tokens"), 2).alias("avg_len"),
            F.sum(F.when(F.col("n_tokens") >= 30, 1).otherwise(0)).alias("n_long_docs"),
        )
    )


@register(
    "doc_ngram_shingles",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT doc_id,
           len(t) - 2 AS n_shingles,
           len(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_distinct_shingles
    FROM toks
    """,
    doc="3-gram shingling (the MinHash precursor): distinct-shingle "
        "counts per doc. Spark: transform over token index array -> "
        "explode -> distinct count; all built-ins.",
    tags=("documents", "text", "dedup"),
)
def doc_ngram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(load_table(spark, sf_dir, "documents"), spark)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # Shingles via zip_with over three shifted slices. NOT element_at
    # inside a transform lambda: lambda bodies re-evaluate captured
    # expressions per element, turning split() into O(tokens^2) work per
    # doc (measured 8s -> 0.4s at sf0.1 for this query).
    sh = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n - 2),
            F.slice(toks, 2, n - 2),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice(toks, 3, n - 2),
        lambda xy, z: F.concat_ws(" ", xy, z),
    )
    return docs.filter(n >= 3).select(
        "doc_id",
        (n - 2).cast("long").alias("n_shingles"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct_shingles"),
    )


@register(
    "lang_distribution_filtered",
    oracle="""
    SELECT lang, source, count(*) AS n
    FROM documents
    WHERE n_chars BETWEEN 100 AND 2000
      AND regexp_matches(text, '^[a-z]')
    GROUP BY lang, source
    """,
    doc="Language/length filter pipeline (curation-style predicate "
        "pushdown: n_chars range reaches the parquet scan).",
    tags=("documents", "text"),
)
def lang_distribution_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars").between(100, 2000))
        .filter(F.col("text").rlike("^[a-z]"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
    )


@register(
    "top_tokens_explode",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    doc="Generator/explode operator class (LATERAL VIEW equivalent): "
        "token frequency top-20 across the corpus. Explode is narrow "
        "(no shuffle); the count groupBy is the only exchange.",
    tags=("documents", "text", "generator"),
)
def top_tokens_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(load_table(spark, sf_dir, "documents"), spark)
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )
