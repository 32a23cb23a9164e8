"""Training-data curation screens: within-document repetition
(Gopher-style), PII detection/redaction, and benchmark-contamination
scanning.

These are the filters a pretraining pipeline runs between raw ingest
and dedup (build brief: "the operations a large-scale training-data
pipeline would need"). The reference repo stops at CDC ingest; these
extend the same DataFrame→DataFrame operator surface.

Scale notes (100 TB):
- Repetition: the duplicate-n-gram fraction is pure array expressions
  (narrow, zero shuffle). The top-bigram fraction explodes bigrams and
  groups on (doc_id, md5(bigram)) — one shuffle of 32-byte hashes,
  never the text; linear in corpus token count and immune to
  long-document blowup (an all-array formulation would be O(distinct ×
  len) per doc).
- PII: pure regexp expressions (codegen'd, zero shuffle). Patterns are
  deliberately RE2-compatible so the DuckDB oracle runs the very same
  regex.
- Contamination: corpus n-grams are md5-hashed and joined against the
  DISTINCT benchmark n-gram set. Eval benchmarks are tiny relative to
  a crawl (MBs vs TBs), so the benchmark side is broadcast — the scan
  is a single narrow pass over the corpus at scale. Hashes (32 bytes)
  shuffle/broadcast, not shingle text.

No Python UDFs anywhere (SURVEY §2.10 policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-compatible (DuckDB) AND java.util.regex-compatible (Spark)
# patterns — shared verbatim with oracle SQL so engines cannot drift.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
}


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (zip_with slice
    cascade — same construction as dedup.shingle_hashes, kept as
    strings here so DuckDB can reproduce them)."""
    size = F.size(toks)
    gram = F.slice(toks, 1, size - (n - 1))
    for j in range(1, n):
        gram = F.zip_with(gram, F.slice(toks, j + 1, size - (n - 1)),
                          lambda x, y: F.concat_ws(" ", x, y))
    return gram


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Within-document repetition signals from the Gopher data-quality
    rules (Rae et al. 2021, §A1.1 "repetition removal"):

    - ``dup_ngram_frac``: fraction of word n-grams that are duplicates
      of another n-gram in the same document (1 - distinct/total).
      Pure array expressions — narrow, no shuffle.
    - ``top_bigram_frac``: fraction of all bigram occurrences taken by
      the single most frequent bigram. Explode + count on
      (id, md5(bigram)) — one hash shuffle, linear at any doc length.

    Returns (id_col, n_tokens, top_bigram_frac, dup_ngram_frac); docs
    shorter than ``n`` tokens get dup_ngram_frac 0.0 (nothing to
    repeat at that order).
    """
    toks = F.split(F.col(text_col), " ")
    grams = _word_ngrams(toks, n)
    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.when(
            F.size(toks) >= n,
            F.round(
                (F.size(grams) - F.size(F.array_distinct(grams)))
                .cast("double") / F.size(grams), 6),
        ).otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
    )
    bigrams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(toks, 2)).alias("_bg"),
    ).select(id_col, F.md5("_bg").alias("_h"))
    top = (
        bigrams.groupBy(id_col, "_h").agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.round(F.max("_c").cast("double") / F.sum("_c"), 6)
             .alias("top_bigram_frac"))
    )
    return per_doc.join(top, id_col, "left").select(
        id_col, "n_tokens",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        "dup_ngram_frac",
    )


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document PII hit counts (emails, IPv4 literals,
    phone-shaped numbers) as ``n_email``/``n_ipv4``/``n_phone`` plus
    the total ``n_pii``. Pure regexp_count expressions — codegen'd,
    zero shuffle, linear scan."""
    text = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(text, F.lit(pat)))
    return out.withColumn(
        "n_pii", sum(F.col(f"n_{k}") for k in PII_PATTERNS).cast("int"))


def redact_pii(df: DataFrame, text_col: str = "text",
               replacement: str = "[PII]") -> DataFrame:
    """Replace every PII match in ``text_col`` with ``replacement``
    (chained regexp_replace — still one projection, zero shuffle)."""
    col = F.col(text_col)
    for pat in PII_PATTERNS.values():
        col = F.regexp_replace(col, pat, replacement)
    return df.withColumn(text_col, col)


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 5,
                          flag_threshold: float = 0.05) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, how
    many of its distinct word n-grams also appear in the benchmark
    (eval-set) corpus — the standard train/test overlap hygiene check
    (GPT-3 appendix C / PaLM §8 style, done with exact n-gram
    collisions rather than fuzzy matching).

    Output per corpus doc: ``n_grams`` (distinct n-grams),
    ``n_bench_hits`` (how many collide with the benchmark),
    ``contamination_frac`` and the boolean ``is_contaminated``
    (frac >= flag_threshold).

    Both sides reduce to DISTINCT md5(n-gram) — the join ships 32-byte
    hashes, never text. The benchmark side (distinct grams of an eval
    set) is small by construction and broadcast, so the corpus pass is
    narrow; at 100 TB this is a map-side hash probe per partition.
    """
    def grams(df: DataFrame) -> DataFrame:
        toks = F.split(F.col(text_col), " ")
        return (
            df.filter(F.size(toks) >= n)
            .select(F.col(id_col),
                    F.explode(F.array_distinct(_word_ngrams(toks, n)))
                    .alias("_g"))
            .select(id_col, F.md5("_g").alias("_h"))
        )

    c = grams(corpus)
    b = F.broadcast(grams(benchmark).select("_h").distinct())
    hits = c.join(b, "_h", "left_semi").groupBy(id_col).agg(
        F.count("*").alias("n_bench_hits"))
    totals = c.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    frac = F.col("n_bench_hits").cast("double") / F.col("n_grams")
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col, "n_grams",
            F.coalesce("n_bench_hits", F.lit(0)).alias("n_bench_hits"))
        .withColumn("contamination_frac", F.round(frac, 6))
        .withColumn("is_contaminated",
                    (frac >= flag_threshold).cast("int"))
    )
