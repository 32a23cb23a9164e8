"""Text-analysis operators (build brief M4): language-ID heuristic,
quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting (rolling-hash winnowing).

Everything is built-in expressions (split/regexp/xxhash64/array HOFs);
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker-word profiles for the n-gram/stopword language heuristic.
#: Tiny on purpose — the operator's value is the *shape* (profile scoring
#: scales to real profiles); the fixture texts are synthetic anyway.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "ne"),
    "es": ("el", "la", "los", "y", "no"),
    "zh": ("的", "了", "是", "在", "我"),
}

#: BPE-ish pre-tokenizer: word pieces OR single non-space symbols —
#: the standard GPT-2-style pre-split shape, regex-only.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(text, r"\s+"))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens via regexp_extract_all — a cheap,
    deterministic proxy for tokenizer cost estimation at corpus scale."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the token set."""
    toks = F.split(F.lower(text), r"\s+")

    def _hit(markers):
        # closure factory — a default-arg lambda would change the visible
        # arity and PySpark would bind the HOF lambda as (x, idx)
        return lambda t: t.isin(*markers)

    return {
        lang: F.size(F.filter(toks, _hit(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker profiles; ties resolve alphabetically (stable).

    Implemented as a sort over (score desc, lang asc) structs — one
    expression tree, no UDF.
    """
    scores = lang_scores(text)
    entries = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    return F.array_sort(entries)[0]["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append curation-quality features: token counts, mean token length,
    punctuation/digit/stopword ratios, and a composite keep-score."""
    text = F.col(text_col)
    toks = F.split(text, r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    mean_tok_len = (n_chars - n_tok + 1).cast("double") / n_tok
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to")))
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", F.round(mean_tok_len, 4))
        .withColumn("punct_ratio", F.round(n_punct.cast("double") / n_chars, 6))
        .withColumn("digit_ratio", F.round(n_digit.cast("double") / n_chars, 6))
        .withColumn("stopword_ratio", F.round(stop.cast("double") / n_tok, 6))
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("mean_token_len").between(2.0, 12.0))
        & (F.col("punct_ratio") < 0.2)
    )
    return out.withColumn("keep", keep)


def winnowing_fingerprints(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash all k-grams, slide a window of ``window`` hashes, keep each
    window's minimum — a locality-sensitive subset ~2/(window+1) of all
    hashes, standard for plagiarism/near-dup detection.

    Output: (id, fingerprint_hash) pairs. Pure array expressions:
    k-gram hashes via zip_with-slices + xxhash64, window minima via
    transform over an index sequence on the MATERIALIZED hash array
    (cheap per element), distinct via array_distinct before explode.
    """
    toks = F.split(F.col(text_col), r"\s+")
    size = F.size(toks)
    gram = F.slice(toks, 1, size - (k - 1))
    for j in range(1, k):
        gram = F.zip_with(gram, F.slice(toks, j + 1, size - (k - 1)),
                          lambda x, y: F.concat_ws(" ", x, y))
    hashed = F.transform(gram, lambda g: F.xxhash64(g))
    docs_h = docs.filter(size >= k).select(id_col, hashed.alias("_h"))
    # window minima over the materialized (small) hash array; element_at
    # on a column reference is O(1) — the O(n^2) trap only bites when the
    # captured expression is itself expensive (a split/transform)
    n_windows = F.size(F.col("_h")) - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(F.col("_h"), i, window)),
    )
    return (
        docs_h.filter(F.size(F.col("_h")) >= window)
        .select(id_col, F.explode(F.array_distinct(mins)).alias("fingerprint"))
    )
