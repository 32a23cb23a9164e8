"""Document dedup family (build brief M4): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

All operators are DataFrame->DataFrame and shuffle on HASHES, never on
document text — the property that makes them viable at 100 TB:

- exact:    shuffle 32-byte md5 + doc_id
- minhash:  shuffle (doc_id, shingle_hash) pairs, then (band_key, doc_id)
- simhash:  one groupBy over exploded token hashes, then bucket join
- jaccard:  only for candidate pairs (post-LSH) or bounded subsets

No Python UDFs anywhere — xxhash64 / bit ops / array functions are all
JVM built-ins (SURVEY §2.10 policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic MinHash parameters (Carter-Wegman style h(x) = (a*x+b)
# mod p). p is the Mersenne prime 2^31-1 and inputs are folded to 31
# bits so a*x+b stays under 2^62 — pure LONG arithmetic inside
# whole-stage codegen. (r4 perf fix: the first version used p=2^61-1
# with decimal(38,0) math, which dropped every row through BigDecimal
# and made the 64 min-aggregates ~20x slower than the rest of the
# sketch suite combined.)
_P31 = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs derived from a small LCG — no RNG state,
    reproducible across runs/engines. a in [1, p-1], b in [0, p-1]."""
    params = []
    x = seed
    for _ in range(num_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (_P31 - 1)) + 1  # non-zero
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % _P31
        params.append((a, b))
    return params


def shingle_hashes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3) -> DataFrame:
    """(id, shingle_hash) pairs: n-gram word shingles hashed to int64.

    zip_with over shifted slices (NOT element_at-in-lambda, which
    re-evaluates the split per element — see queries/text.py note).
    """
    toks = F.split(F.col(text_col), " ")
    size = F.size(toks)
    sh = F.slice(toks, 1, size - (n - 1))
    for k in range(1, n):
        sh = F.zip_with(sh, F.slice(toks, k + 1, size - (n - 1)),
                        lambda x, y: F.concat_ws(" ", x, y))
    return (
        docs.filter(size >= n)
        .select(id_col, F.explode(F.array_distinct(sh)).alias("_shingle"))
        .select(id_col, F.xxhash64("_shingle").alias("shingle_hash"))
    )


def minhash_signatures(pairs: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 64) -> DataFrame:
    """MinHash signature per doc: one shuffle (groupBy id), num_hashes
    min-aggregates computed map-side first (partial agg). All-long
    arithmetic: shingle hashes fold to 31 bits, so a*x+b < 2^62 and
    the whole expression stays in codegen."""
    params = _hash_params(num_hashes)
    x = F.col("shingle_hash").bitwiseAND(F.lit(_P31))  # fold to 31 bits
    mins = [
        F.min((F.lit(a) * x + F.lit(b)) % F.lit(_P31)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return pairs.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """Band the signatures and self-join on (band_index, band_hash):
    classic MinHash-LSH candidate generation. Output: (doc_a, doc_b)
    with doc_a < doc_b, distinct.

    Scale: the join key is the band bucket — collision lists are short
    for realistic thresholds, so the self-join is near-linear; a hot
    bucket (e.g. boilerplate docs) is exactly an AQE skew-join case.
    """
    assert bands * rows_per_band <= sum(1 for c in signatures.columns if c.startswith("mh_"))
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "bk.band", "bk.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(pairs: DataFrame, shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for (doc_a, doc_b) candidate pairs.

    intersection(a,b) = count of shingle hashes present in both docs:
    join pairs->shingles(a) -> semi-ish join shingles(b) on (doc, hash);
    union size = |A| + |B| - inter. Shuffles only hashes and ids.
    """
    sh_a = shingles.select(F.col(id_col).alias("doc_a"), "shingle_hash")
    sh_b = shingles.select(F.col(id_col).alias("doc_b"), "shingle_hash")
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle_hash"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, subset=["inter"])
        .join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16, rows_per_band: int = 4,
                      threshold: float = 0.7, verify: bool = True) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH candidates ->
    (optional) exact-Jaccard verification >= threshold.

    Returns (doc_a, doc_b[, jaccard]) near-duplicate pairs.
    """
    sh = shingle_hashes(docs, text_col, id_col)
    if verify:
        # the shingle frame feeds BOTH the signatures and the exact-
        # Jaccard verification; a lazy localCheckpoint materializes it
        # once on first use instead of re-tokenizing the corpus twice
        # (freed with the DataFrame, no explicit unpersist needed)
        sh = sh.localCheckpoint(eager=False)
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    if not verify:
        return cand
    return jaccard_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------- SimHash


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit sums of token-hash bits.

    Explode tokens -> xxhash64 -> per-doc sums of (2*bit_j - 1) for each
    bit j -> reassemble the sign bits into one long. One shuffle
    (groupBy doc); the 64 conditional sums are map-side partial aggs.
    """
    tok = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("_t"))
        .select(id_col, F.xxhash64("_t").alias("h"))
    )
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return sums.select(id_col, sig.alias("simhash"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit signature into
    (max_hamming+1) 16-bit blocks — any pair within distance k agrees
    exactly on >= 1 block (pigeonhole), so an equi-join per block finds
    all candidates without O(n^2). Verification: popcount of XOR.
    """
    sig = simhash(docs, text_col, id_col)
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for i in range(n_blocks)
        ]
    )
    keyed = sig.select(id_col, "simhash", F.explode(blocks).alias("b")).select(
        id_col, "simhash", "b.blk", "b.bv"
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bv") == F.col("b.bv"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ----------------------------------------------------- embedding near-dup


def embedding_near_dups(emb: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.9,
                        planes: int = 16) -> DataFrame:
    """Embedding near-duplicates: random-hyperplane LSH bucketing, then
    exact cosine inside buckets only.

    The hyperplanes are deterministic pseudo-vectors derived from
    xxhash64(dim_index, plane_index) — no RNG, reproducible, and the
    projection is a JVM-side aggregate over the zipped array.
    """
    from .similarity import cosine_sim_cols, hyperplane_bucket

    bucketed = emb.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cosine_sim_cols(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
