"""Document dedup family (build brief M4): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

All operators are DataFrame->DataFrame and shuffle on HASHES, never on
document text — the property that makes them viable at 100 TB:

- exact:    shuffle 32-byte md5 + doc_id
- minhash:  signatures fold ROW-LOCALLY over the shingle-hash array
            (zero shuffle, r4); only the band self-join exchanges
            (band_key, doc_id)
- simhash:  the 64-bit signature folds row-locally too (r4); only the
            pigeonhole bucket join shuffles
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


def shingle_hash_arrays(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, array<long> of distinct n-gram shingle hashes) — the
    UNEXPLODED form: one row per doc, computed entirely row-local
    (split -> shifted-slice zip_with -> array_distinct -> xxhash64 per
    element). Signature computation aggregates this array in place
    with ZERO shuffle; only tiers that genuinely need (id, hash) PAIRS
    (exact-Jaccard verification joins) explode it."""
    toks = F.split(F.col(text_col), " ")
    size = F.size(toks)
    sh = F.slice(toks, 1, size - (n - 1))
    for k in range(1, n):
        sh = F.zip_with(sh, F.slice(toks, k + 1, size - (n - 1)),
                        lambda x, y: F.concat_ws(" ", x, y))
    hashes = F.transform(F.array_distinct(sh), lambda g: F.xxhash64(g))
    return (
        docs.filter(F.col(text_col).isNotNull())
        .filter(size >= n)
        .select(id_col, hashes.alias("shingle_hashes"))
    )


def shingle_hashes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3) -> DataFrame:
    """(id, shingle_hash) pairs: n-gram word shingles hashed to int64
    (the exploded form of ``shingle_hash_arrays``)."""
    return (
        shingle_hash_arrays(docs, text_col, id_col, n)
        .select(id_col, F.explode("shingle_hashes").alias("shingle_hash"))
    )


def minhash_signatures(pairs: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 64) -> DataFrame:
    """MinHash signature per doc from EXPLODED (id, shingle_hash)
    pairs: one shuffle (groupBy id), num_hashes min-aggregates computed
    map-side first (partial agg). All-long arithmetic: shingle hashes
    fold to 31 bits, so a*x+b < 2^62 and the whole expression stays in
    codegen. Prefer ``minhash_signatures_from_arrays`` when the
    unexploded array frame is available — same values, no shuffle."""
    params = _hash_params(num_hashes)
    x = F.col("shingle_hash").bitwiseAND(F.lit(_P31))  # fold to 31 bits
    mins = [
        F.min((F.lit(a) * x + F.lit(b)) % F.lit(_P31)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return pairs.groupBy(id_col).agg(*mins)


def minhash_signatures_from_arrays(arrs: DataFrame, id_col: str = "doc_id",
                                   num_hashes: int = 64,
                                   arr_col: str = "shingle_hashes") -> DataFrame:
    """MinHash signatures computed ROW-LOCALLY over the shingle-hash
    array — no explode, no shuffle: per doc, ``aggregate`` folds the
    array into a running array of num_hashes minima (zip_with against
    the literal (a, b) parameter array). Identical values to
    ``minhash_signatures`` (same Carter-Wegman params, same 31-bit
    fold); at 100 TB this removes the (docs x shingles)-row exchange
    entirely — the signature stage becomes a projection."""
    params = _hash_params(num_hashes)
    p_arr = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params
    ])
    init = F.array_repeat(F.lit(_P31).cast("long"), num_hashes)  # > any h
    sig = F.aggregate(
        F.col(arr_col),
        init,
        lambda acc, x: F.zip_with(
            acc, p_arr,
            lambda m, p: F.least(
                m,
                (p["a"] * x.bitwiseAND(F.lit(_P31)) + p["b"]) % F.lit(_P31),
            ),
        ),
    )
    # two-step select: materialize the fold ONCE per row, then split
    # into columns — CollapseProject keeps non-cheap aliases with >1
    # consumer, so the aggregate is not inlined 64 times
    return arrs.select(id_col, sig.alias("_sig")).select(
        id_col,
        *[F.element_at("_sig", i + 1).alias(f"mh_{i}")
          for i in range(num_hashes)],
    )


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
    # the banded frame sits on BOTH sides of the self-join; a lazy
    # localCheckpoint computes the minhash fold + band hashes once
    # instead of twice (r5 — same fix as the simhash/embedding
    # families; the frame is compact: bands rows of (id, band, bh)
    # per doc)
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "bk.band", "bk.bh").localCheckpoint(eager=False)
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
    arrs = shingle_hash_arrays(docs, text_col, id_col)
    if verify:
        # the shingle-ARRAY frame feeds BOTH the signatures and the
        # exact-Jaccard verification; a lazy localCheckpoint
        # materializes it once (one row per doc — far more compact
        # than the exploded pair frame it replaced) instead of
        # re-tokenizing the corpus twice
        arrs = arrs.localCheckpoint(eager=False)
    sig = minhash_signatures_from_arrays(arrs, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    if not verify:
        return cand
    sh = arrs.select(id_col, F.explode("shingle_hashes").alias("shingle_hash"))
    return jaccard_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------- SimHash


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit sums of token-hash bits.

    Computed ROW-LOCALLY — split -> xxhash64 per token (transform) ->
    ``aggregate`` folds the hash array into a ``bits``-element array of
    (2*bit_j - 1) sums -> sign bits reassemble into one long. Zero
    shuffle: the whole operator is a projection (the r4 rewrite of the
    original explode + groupBy-with-64-sums, which exchanged one row
    per TOKEN — the dominant cost at corpus scale)."""
    hs = F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t))
    # bit masks as a literal array (shiftright needs a Python-int
    # amount, so bit j tests as h & 2^j != 0; bit 63 is the sign bit —
    # its mask is long MIN_VALUE in two's complement)
    pow_arr = F.array(*[
        F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
        for j in range(bits)
    ])
    sums = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, pow_arr,
            lambda s, p: s + F.when(
                h.bitwiseAND(p) != 0, F.lit(1).cast("long")
            ).otherwise(F.lit(-1).cast("long")),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            sums, pow_arr,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a.bitwiseXOR(v),  # disjoint bits: XOR == OR
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(id_col, sig.alias("simhash"))
    )


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
    # the exploded signature frame sits on BOTH sides of the self-join;
    # a lazy localCheckpoint computes the (expensive) 64-bit HOF
    # signature once instead of twice — same fix the embedding family
    # got in r4 (r5: simhash was the slowest sketch family in the
    # per-family bench, 2x the signature cost for no reason)
    keyed = sig.select(id_col, "simhash", F.explode(blocks).alias("b")).select(
        id_col, "simhash", "b.blk", "b.bv"
    ).localCheckpoint(eager=False)
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

    # the bucketed frame sits on BOTH sides of the self-join; a lazy
    # localCheckpoint computes the 2^planes projection once instead of
    # twice (freed with the DataFrame)
    bucketed = emb.withColumn(
        "_bucket", hyperplane_bucket(F.col(vec_col), planes)
    ).localCheckpoint(eager=False)
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
