"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — native ``zip_with`` dot product +
TakeOrderedAndProject; scale path: LSH-bucketed ANN via random
hyperplane signs (Charikar), where buckets turn the O(N·Q) scan into an
equi-join on bucket keys. Hyperplanes are derived deterministically
from xxhash64 of (dim index, plane index) so the operator needs no RNG
state and both sides of any join bucket identically on every executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast('double'))


def cosine_sim(a: Column, b: Column) -> Column:
    """Native cosine similarity between two array<double> columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(df: DataFrame, query_vec: list[float],
                     id_col: str = 'vec_id', vec_col: str = 'embedding',
                     k: int = 10) -> DataFrame:
    """Exact top-k by cosine vs a constant query vector. One scan, no
    shuffle; limit plans as TakeOrderedAndProject."""
    q = F.lit([float(x) for x in query_vec])
    sim = cosine_sim(_as_double(F.col(vec_col)), _as_double(q))
    return (df.select(id_col, F.round(sim, 6).alias('cos_sim'))
            .orderBy(F.desc('cos_sim'), F.asc(id_col))
            .limit(k))


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """sign(v · h_plane) where h_plane[d] ∈ {-1,+1} is pseudo-random
    from xxhash64(d, plane) — deterministic, identical everywhere."""
    terms = [
        F.when(F.xxhash64(F.lit(d), F.lit(plane)).bitwiseAND(F.lit(1)) == 1,
               F.element_at(vec, d + 1)).otherwise(-F.element_at(vec, d + 1))
        for d in range(dim)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return (s >= 0).cast('int')


def with_lsh_bucket(df: DataFrame, vec_col: str, dim: int,
                    planes: int = 8, out_col: str = 'lsh_bucket') -> DataFrame:
    """Random-hyperplane LSH bucket id (0 .. 2^planes-1)."""
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket + F.shiftleft(_hyperplane_sign(v, p, dim), p)
    return df.withColumn(out_col, bucket)


def lsh_topk(df: DataFrame, query_vec: list[float],
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             k: int = 10, planes: int = 6) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket (partition-prunable
    when the table is written bucketed by lsh_bucket). Recall < 1.0 by
    construction — the bench reports it against brute force."""
    dim = len(query_vec)
    bucketed = with_lsh_bucket(df, vec_col, dim, planes)
    # driver-side bucket of the query vector (same deterministic planes)
    import pandas as pd  # noqa: F401
    qsig = 0
    for p in range(planes):
        import struct
        s = 0.0
        for d, x in enumerate(query_vec):
            h = _xxhash64_int(d, p)
            s += x if (h & 1) == 1 else -x
        qsig += (1 if s >= 0 else 0) << p
    cand = bucketed.filter(F.col('lsh_bucket') == qsig)
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def _xxhash64_int(d: int, p: int) -> int:
    """Driver-side xxhash64(lit(d), lit(p)) — computed once via a tiny
    local DataFrame at first use and memoized."""
    key = (d, p)
    cache = _xxhash64_int.__dict__.setdefault('cache', {})
    if key not in cache:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        row = (spark.range(1)
               .select(F.xxhash64(F.lit(d), F.lit(p)).alias('h'))
               .collect())
        cache[key] = row[0]['h']
    return cache[key]


def ivf_index(df: DataFrame, n_lists: int = 16,
              id_col: str = 'vec_id', vec_col: str = 'embedding',
              seed: int = 42):
    """IVF (inverted-file) ANN index: KMeans partitions the corpus into
    n_lists cells; a table bucketed/partitioned by ``ivf_cell`` makes a
    probe read only the probed cells (partition pruning). Returns
    (indexed_df, kmeans_model)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn('__v', array_to_vector(_as_double(F.col(vec_col))))
    km = KMeans(k=n_lists, seed=seed, featuresCol='__v',
                predictionCol='ivf_cell')
    model = km.fit(feats)
    return model.transform(feats).drop('__v'), model


def ivf_topk(indexed_df: DataFrame, kmeans_model, query_vec: list[float],
             k: int = 10, n_probe: int = 4,
             id_col: str = 'vec_id', vec_col: str = 'embedding') -> DataFrame:
    """ANN top-k over an IVF index: rank cells by centroid distance to
    the query (driver-side — n_lists tiny), scan only the n_probe
    nearest cells, exact cosine within them. Recall rises with n_probe;
    n_probe = n_lists degenerates to exact brute force."""
    import math
    q = [float(x) for x in query_vec]
    dists = []
    for cid, center in enumerate(kmeans_model.clusterCenters()):
        d = math.sqrt(sum((c - x) ** 2 for c, x in zip(center, q)))
        dists.append((d, cid))
    probe = [cid for _, cid in sorted(dists)[:n_probe]]
    cand = indexed_df.filter(F.col('ivf_cell').isin(probe))
    return brute_force_topk(cand, q, id_col, vec_col, k)


def pairwise_cosine_dups(df: DataFrame, id_col: str = 'vec_id',
                         vec_col: str = 'embedding',
                         threshold: float = 0.95,
                         planes: int = 6, dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked: only vectors in the
    same hyperplane bucket are compared (equi-join), then exact cosine
    filters. At 100 TB the bucket count (2^planes) is tuned so each
    bucket's pair count stays bounded."""
    if dim is None:
        first = df.select(F.size(vec_col).alias('d')).first()
        dim = first['d']
    b = with_lsh_bucket(df, vec_col, dim, planes)
    lhs = b.select(F.col(id_col).alias('id_a'), F.col(vec_col).alias('v_a'), 'lsh_bucket')
    rhs = b.select(F.col(id_col).alias('id_b'), F.col(vec_col).alias('v_b'), 'lsh_bucket')
    return (lhs.join(rhs, on='lsh_bucket')
            .filter(F.col('id_a') < F.col('id_b'))
            .withColumn('cos_sim', F.round(
                cosine_sim(_as_double(F.col('v_a')), _as_double(F.col('v_b'))), 6))
            .filter(F.col('cos_sim') >= threshold)
            .select('id_a', 'id_b', 'cos_sim'))
