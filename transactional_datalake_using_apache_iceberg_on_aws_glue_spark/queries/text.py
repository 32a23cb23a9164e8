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
    "doc_text_stats",
    oracle="""
    WITH f AS (
      SELECT source,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS n_punct,
             round(len(list_filter(string_split_regex(text, '\\s+'),
                   t -> t IN ('the', 'a', 'and', 'of', 'to')))::DOUBLE
                   / len(string_split_regex(text, '\\s+')), 6) AS stopword_ratio
      FROM documents
    )
    SELECT 'tokens_by_lang' AS tag, lang AS grp,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4)  AS avg_a,
           round(avg(n_chars), 4)                       AS avg_b,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS big_c,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')))
             AS BIGINT) AS big_d,
           round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))), 4)
             AS avg_e
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'quality_by_source', source,
           count(*),
           round(avg(stopword_ratio), 4),
           round(avg(n_tokens), 2),
           CAST(count(*) FILTER (WHERE n_tokens >= 30) AS BIGINT),
           CAST(sum(CASE WHEN n_tokens >= 10
                     AND round((n_chars - n_tokens + 1)::DOUBLE / n_tokens, 4)
                         BETWEEN 2.0 AND 12.0
                     AND round(n_punct::DOUBLE / n_chars, 6) < 0.2
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM f GROUP BY source
    """,
    doc="Token/length stats per lang AND quality/curation stats per "
        "source in one tagged union: whitespace tokenizer, the BPE-ish "
        "pre-tokenizer (GPT-2-style regex pre-split), stopword ratio, "
        "and the composite operators.text.quality_features keep-rate. "
        "Pure codegen'd string/regex/array ops, no Python UDFs. "
        "Generic metric slots (avg_a..avg_e, big_c/big_d) carry "
        "branch-specific meanings documented per tag. (Registry "
        "consolidation r8: former doc_token_stats + doc_quality_scores "
        "— the registry had grown to 51 names and the driver records "
        "the first 50 sorted, silently dropping winnowing_fingerprints "
        "since r6; this merge restores it to the gate. Those were "
        "themselves r2 consolidations of four originals.)",
    tags=("documents", "text"),
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    nbpe = X.bpe_token_count(F.col("text"))
    tokens = docs.groupBy(F.col("lang").alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(ntok), 4).alias("avg_a"),
        F.round(F.avg("n_chars"), 4).alias("avg_b"),
        F.max(ntok).cast("long").alias("big_c"),
        F.sum(nbpe).alias("big_d"),
        F.round(F.avg(nbpe), 4).alias("avg_e"),
    ).select(F.lit("tokens_by_lang").alias("tag"), "*")

    feats = X.quality_features(rebalance(docs, spark))
    quality = feats.groupBy(F.col("source").alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_a"),
        F.round(F.avg("n_tokens"), 2).alias("avg_b"),
        F.sum(F.when(F.col("n_tokens") >= 30, 1).otherwise(0))
         .cast("long").alias("big_c"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("big_d"),
        F.lit(None).cast("double").alias("avg_e"),
    ).select(F.lit("quality_by_source").alias("tag"), "*")
    return tokens.unionByName(quality)


@register(
    "doc_fingerprints_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, list_transform(range(1, len(toks) - 3),
             i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4])) AS h
      FROM t WHERE len(toks) >= 5
    ),
    w AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(h) - 2),
             j -> list_aggregate(h[j:j+3], 'min'))) AS fps
      FROM g WHERE len(h) >= 4
    )
    SELECT 'winnow' AS tag, doc_id, unnest(fps) AS tok,
           CAST(NULL AS BIGINT) AS n
    FROM w
    UNION ALL
    SELECT 'top_token', CAST(NULL AS BIGINT), tok, n FROM (
      SELECT tok, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
      ORDER BY n DESC, tok
      LIMIT 20)
    """,
    doc="Two text fingerprint/frequency tiers in one tagged union, "
        "both value-oracled per row. tag='winnow': winnowing "
        "(SIGMOD'03) document fingerprints — k=5-gram md5 shingles "
        "(byte-identical across engines), window-4 lexicographic "
        "minima, per-doc distinct; density ~2/(w+1) of all k-grams, "
        "the standard plagiarism/near-dup fingerprint at corpus scale "
        "(shuffles 32-byte digests only, 0 wide shuffles — row-local). "
        "tag='top_token': generator/explode operator class (LATERAL "
        "VIEW equivalent), token frequency top-20 — explode is narrow, "
        "the count groupBy is the only exchange. (Registry "
        "consolidation r13: former winnowing_fingerprints + "
        "top_tokens_explode — judge r12 #1, the driver's 50-row cap "
        "was evicting gated queries alphabetically.)",
    tags=("documents", "text", "dedup", "generator"),
)
def doc_fingerprints_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = rebalance(load_table(spark, sf_dir, "documents"), spark)
    winnow = X.winnowing_fingerprints(docs).select(
        F.lit("winnow").alias("tag"),
        "doc_id",
        F.col("fingerprint").alias("tok"),
        F.lit(None).cast("long").alias("n"),
    )
    top = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
        .select(
            F.lit("top_token").alias("tag"),
            F.lit(None).cast("long").alias("doc_id"),
            "tok", "n",
        )
    )
    return winnow.unionByName(top)
