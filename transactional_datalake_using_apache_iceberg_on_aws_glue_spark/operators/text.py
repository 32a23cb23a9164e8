"""Text-analysis operators (build brief M4): language-ID heuristic,
quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting (rolling-hash winnowing).

Everything is built-in expressions (split/regexp/xxhash64/array HOFs);
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Stopword profiles for segmented (space-delimited) languages — the
#: highest-frequency function words of each language (public wordlist
#: knowledge). Function words are the standard langid signal: they are
#: closed-class, extremely frequent, and rarely shared verbatim across
#: languages. Scoring = token-hit count per profile, argmax, ties
#: alphabetical (stable).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "mit",
           "ein", "zu", "den", "von", "auf", "für", "sich"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you",
           "that", "was", "for", "on", "with", "as"),
    "es": ("el", "los", "las", "y", "no", "que", "en", "un", "una",
           "por", "con", "para", "es", "su", "al"),
    "fr": ("le", "la", "les", "et", "ne", "une", "que", "pas", "pour",
           "dans", "ce", "il", "au", "est", "vous"),
    "it": ("il", "di", "che", "e", "per", "non", "sono", "del", "si",
           "mi", "ma", "con", "una", "della", "questo"),
    "nl": ("de", "het", "een", "van", "ik", "te", "dat", "je", "niet",
           "zijn", "op", "aan", "met", "voor", "er"),
    "pt": ("o", "os", "as", "não", "um", "uma", "do", "da", "em",
           "para", "com", "por", "se", "mais", "como"),
}

#: Unicode block ranges for unsegmented / non-Latin scripts — the
#: char-n-gram fallback (ROADMAP #4): these languages can't be detected
#: by whitespace-token stopwords, but their script is unambiguous at the
#: character level. A text whose dominant script covers >=30% of its
#: non-space characters is classified by script; kana beats han within
#: a text (Japanese uses both, Chinese never uses kana).
SCRIPT_RANGES: dict[str, str] = {
    "ar": "؀-ۿ",  # Arabic
    "ja": "぀-ヿ",  # Hiragana + Katakana
    "ko": "가-힯",  # Hangul syllables
    "ru": "Ѐ-ӿ",  # Cyrillic
    "zh": "一-鿿",  # CJK unified ideographs
}

#: Backward-compatible alias (pre-upgrade name).
LANG_MARKERS = LANG_PROFILES

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
    """Per-language stopword-hit counts over the token set (segmented
    languages only — see ``script_char_counts`` for the rest)."""
    toks = F.split(F.lower(text), r"\s+")

    def _hit(markers):
        # closure factory — a default-arg lambda would change the visible
        # arity and PySpark would bind the HOF lambda as (x, idx)
        return lambda t: t.isin(*markers)

    return {
        lang: F.size(F.filter(toks, _hit(markers)))
        for lang, markers in LANG_PROFILES.items()
    }


def script_char_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts (single-char regex matches)."""
    return {
        lang: F.size(F.regexp_extract_all(text, F.lit(f"[{rng}]"), F.lit(0)))
        for lang, rng in SCRIPT_RANGES.items()
    }


def _argmax_entries(scores: dict[str, Column]) -> Column:
    """array_sort over (-score, lang) structs: [0] is the argmax with
    alphabetical tie-break — one expression tree, no UDF."""
    return F.array_sort(
        F.array(
            *[
                F.struct((-scores[lang]).alias("n"), F.lit(lang).alias("l"))
                for lang in sorted(scores)
            ]
        )
    )[0]


def lang_id(text: Column) -> Column:
    """Two-stage language ID, pure expressions (no UDF):

    1. **Script stage** (unsegmented/non-Latin): if the dominant
       ``SCRIPT_RANGES`` script covers >=30% of non-space characters,
       classify by script (integer compare: cnt*10 >= nonspace*3).
    2. **Stopword stage** (segmented): argmax of ``LANG_PROFILES``
       token-hit counts; ties alphabetical (stable).
    """
    best_script = _argmax_entries(script_char_counts(text))
    script_cnt = -best_script["n"]
    nonspace = F.size(F.regexp_extract_all(text, F.lit(r"\S"), F.lit(0)))
    latin = _argmax_entries(lang_scores(text))["l"]
    return F.when(
        (script_cnt > 0) & (script_cnt * 10 >= nonspace * 3), best_script["l"]
    ).otherwise(latin)


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB SQL computing the SAME two-stage prediction, generated
    from the same profile tables so the engines cannot drift — the
    oracle half of the ``lang_id_confusion`` gate. Returns a SELECT
    yielding (``lang``, ``predicted``) per row."""
    script_entries = ", ".join(
        "{n: -len(regexp_extract_all(%s, '[%s]')), l: '%s'}"
        % (text_col, SCRIPT_RANGES[lang], lang)
        for lang in sorted(SCRIPT_RANGES)
    )
    latin_entries = ", ".join(
        "{n: -len(list_filter(regexp_split_to_array(lower(%s), '\\s+'), t -> t IN (%s))), l: '%s'}"
        % (text_col, ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]), lang)
        for lang in sorted(LANG_PROFILES)
    )
    return f"""
    SELECT lang,
           CASE WHEN -s.n > 0 AND -s.n * 10 >= ns * 3 THEN s.l ELSE latin END
             AS predicted
    FROM (
      SELECT lang,
             list_sort([{script_entries}])[1] AS s,
             len(regexp_extract_all({text_col}, '\\S')) AS ns,
             list_sort([{latin_entries}])[1].l AS latin
      FROM {table}
    )
    """


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
    k-gram hashes via zip_with-slices + md5, window minima via
    transform over an index sequence on the MATERIALIZED hash array
    (cheap per element), distinct via array_distinct before explode.

    The k-gram hash is md5 (hex string; lexicographic window minima)
    rather than xxhash64: byte-identical across engines, so the whole
    operator is DuckDB-value-oracle-able (r3 judge item #6) — same
    trade ``doc_repetition_contamination`` makes. At 100 TB the cost
    profile is unchanged: both hash tiers shuffle fixed-width digests,
    never text.
    """
    toks = F.split(F.col(text_col), r"\s+")
    size = F.size(toks)
    gram = F.slice(toks, 1, size - (k - 1))
    for j in range(1, k):
        gram = F.zip_with(gram, F.slice(toks, j + 1, size - (k - 1)),
                          lambda x, y: F.concat_ws(" ", x, y))
    hashed = F.transform(gram, lambda g: F.md5(g))
    # both length gates expressed on the RAW token count: len(_h) =
    # len(toks) - (k-1), so (len(toks) >= k AND len(_h) >= window) ==
    # len(toks) >= k + window - 1. Filtering on size(_h) re-evaluated
    # the whole gram-hash pipeline inside the filter that Catalyst
    # pushes below the rebalance exchange — the md5 cascade ran TWICE,
    # once serially in the single-split scan stage (r13 opt; guide
    # §4.4's duplicated-expensive-expression trap, expression flavor).
    docs_h = docs.filter(size >= k + window - 1).select(
        id_col, hashed.alias("_h"))
    # window minima over the materialized (small) hash array; element_at
    # on a column reference is O(1) — the O(n^2) trap only bites when the
    # captured expression is itself expensive (a split/transform)
    n_windows = F.size(F.col("_h")) - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(F.col("_h"), i, window)),
    )
    return docs_h.select(
        id_col, F.explode(F.array_distinct(mins)).alias("fingerprint"))
