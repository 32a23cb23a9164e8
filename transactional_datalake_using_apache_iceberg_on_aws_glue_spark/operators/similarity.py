"""Similarity search over embedding columns (build brief M4).

Two tiers:
- ``cosine_topk``      — exact brute force; the correctness baseline.
  Linear scan, broadcast query vector, TakeOrderedAndProject top-k.
- ``lsh_topk``         — random-hyperplane LSH: probe only buckets that
  match the query signature (optionally within Hamming distance r),
  exact cosine inside candidates. The 100 TB path: the bucket column
  can be a partition/cluster key so probes prune at the file level.

Determinism: hyperplanes are pseudo-random unit-ish vectors derived
from xxhash64(plane, dim) — identical across runs and engines, no RNG
state shipped to executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_cols(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim_cols(a: Column, b: Column) -> Column:
    return dot_cols(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(emb: DataFrame, query: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine against a 1-row ``query`` DataFrame with a
    ``qv`` array column. Broadcast cross join keeps the scan
    embarrassingly parallel."""
    sim = cosine_sim_cols(F.col(vec_col), F.col("qv"))
    return (
        emb.crossJoin(F.broadcast(query))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _plane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-gaussian-ish component in [-1, 1): derived
    from xxhash64 of (plane, dim)."""
    h = F.xxhash64(F.lit(plane), dim_index)
    return (h % F.lit(2_000_001)).cast("double") / F.lit(1_000_000.0)


def hyperplane_bucket(vec: Column, planes: int = 16) -> Column:
    """Sign-of-projection LSH signature packed into a long.

    Each plane's projection = sum_i vec[i] * plane[plane, i], computed
    with one zip over (value, index) pairs per plane — all JVM-side.
    """
    indexed = F.zip_with(
        vec, F.sequence(F.lit(0), F.size(vec) - 1), lambda v, i: F.struct(
            v.cast("double").alias("v"), i.alias("i")
        )
    )
    def _proj_lambda(p: int):
        # closure factory, NOT a default-arg lambda: an extra default
        # param changes the visible arity and PySpark then binds the HOF
        # lambda as (acc, x, idx)
        return lambda acc, s: acc + s.v * _plane_component(p, s.i)

    bucket = None
    for p in range(planes):
        proj = F.aggregate(indexed, F.lit(0.0), _proj_lambda(p))
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return bucket


def lsh_topk(emb: DataFrame, query: DataFrame, k: int = 10, planes: int = 8,
             hamming_radius: int = 1, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: probe only vectors whose hyperplane signature
    is within ``hamming_radius`` of the query's. Recall is tuned by
    (planes, radius); cost drops ~2^-planes * sum_binomials.

    At scale the bucket column is precomputed & persisted (write-time
    cost), making the probe a partition-pruned scan.
    """
    bucketed = emb.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    qb = query.withColumn("_qbucket", hyperplane_bucket(F.col("qv"), planes))
    joined = bucketed.crossJoin(F.broadcast(qb))
    cand = joined.filter(
        F.bit_count(F.col("_bucket").bitwiseXOR(F.col("_qbucket"))) <= hamming_radius
    )
    sim = cosine_sim_cols(F.col(vec_col), F.col("qv"))
    return (
        cand.select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
