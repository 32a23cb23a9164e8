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


def hyperplane_bucket(vec: Column, planes: int = 16,
                      plane_offset: int = 0) -> Column:
    """Sign-of-projection LSH signature packed into a long.

    Each plane's projection = sum_i vec[i] * plane[plane, i], computed
    with one zip over (value, index) pairs per plane — all JVM-side.

    ``plane_offset`` selects a DISJOINT plane family (planes
    ``offset .. offset+planes-1``) — the multi-table LSH
    (OR-amplification) primitive: table t hashes with offset
    ``t * planes``, so its signature is independent of table 0's.
    Offset 0 is byte-identical to the historical single-table
    signature (persisted indexes keep probing unchanged)."""
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
        proj = F.aggregate(indexed, F.lit(0.0),
                           _proj_lambda(plane_offset + p))
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


# ---------------------------------------------------------------- IVF


def ivf_assign(emb: DataFrame, n_cells: int = 16, iters: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id") -> tuple:
    """IVF coarse quantizer: deterministic k-means over the corpus.

    Init: the vectors whose xxhash64(id) are smallest become the seed
    centroids (reproducible, no RNG). Then ``iters`` Lloyd rounds, each
    one = a broadcast-join assignment pass + a posexplode/groupBy
    centroid update — all distributed, centroids themselves are tiny
    (n_cells x dim) and travel by broadcast.

    Returns (assigned_df with `_cell`, centroids_df(cell, c)).
    """
    from pyspark.sql import functions as F

    seeds = (
        emb.withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(n_cells)
        .select(F.col(vec_col).alias("c"))
        .withColumn("cell", F.monotonically_increasing_id())
        .select("cell", F.transform("c", lambda x: x.cast("double")).alias("c"))
    )
    centroids = seeds
    for _ in range(iters):
        assigned = _assign_cells(emb, centroids, vec_col, id_col)
        centroids = (
            assigned.select("_cell", F.posexplode(vec_col).alias("i", "v"))
            .groupBy("_cell", "i")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("_cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("p"))
            .select(F.col("_cell").alias("cell"), F.transform("p", lambda s: s.m).alias("c"))
        )
    return _assign_cells(emb, centroids, vec_col, id_col), centroids


def _assign_cells(emb: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Nearest-centroid assignment via broadcast join + per-group min."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d2 = F.aggregate(
        F.zip_with(vec_col, "c", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(id_col).orderBy("_d2", "cell")
    return (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*emb.columns, F.col("cell").alias("_cell"))
    )


def ivf_topk(emb: DataFrame, query: DataFrame, k: int = 10, n_cells: int = 16,
             n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: assign corpus to cells once (in a real
    pipeline this is persisted as a partition column at write time),
    probe only the ``n_probe`` cells nearest the query, exact cosine
    inside. Cost ~ n_probe/n_cells of brute force, recall tuned by
    n_probe.
    """
    from pyspark.sql import functions as F

    assigned, centroids = ivf_assign(emb, n_cells=n_cells, vec_col=vec_col, id_col=id_col)
    qd2 = F.aggregate(
        F.zip_with("qv", "c", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe_cells = [
        r["cell"]
        for r in query.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", qd2)
        .orderBy("_d2")
        .limit(n_probe)
        .select("cell")
        .collect()
    ]
    cand = assigned.filter(F.col("_cell").isin(probe_cells))
    sim = cosine_sim_cols(F.col(vec_col), F.col("qv"))
    return (
        cand.crossJoin(F.broadcast(query))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
