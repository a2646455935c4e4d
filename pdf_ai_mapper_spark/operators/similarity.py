"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — native ``zip_with`` dot product +
TakeOrderedAndProject; scale path: LSH-bucketed ANN via random
hyperplane signs (Charikar, STOC 2002) and an IVF (inverted-file)
index over KMeans cells.

Hyperplanes are ±1 Rademacher vectors derived deterministically from a
vendored splitmix64 of (plane, dim-index) — pure numpy, no RNG state,
bit-identical on the driver and every executor. All plane signs for a
row are computed by ONE Arrow-batched pandas UDF as a single
(batch × dim) @ (dim × planes) matmul; the earlier formulation built a
per-dimension Catalyst expression tree (dim × planes expression nodes
— plan-compile explosion at 768 dims) and ran one Spark job per
(dim, plane) pair on the driver to bucket the query vector. Both are
gone: the driver buckets the query with the same numpy kernel, zero
jobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
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


# ------------------------------------------------------- hyperplane LSH

_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vendored splitmix64 finalizer (Steele et al., OOPSLA 2014 —
    public domain), vectorized over uint64. Deterministic everywhere;
    uint64 arithmetic wraps, which is the intended mod-2^64 math."""
    with np.errstate(over='ignore'):
        z = x + _SM64_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM64_M1
        z = (z ^ (z >> np.uint64(27))) * _SM64_M2
        return z ^ (z >> np.uint64(31))


def _plane_signs(dim: int, planes: int) -> np.ndarray:
    """(dim × planes) ±1 hyperplane matrix from splitmix64(p·2^32 + d).
    Same bits on driver and executors — the whole determinism story."""
    p = np.arange(planes, dtype=np.uint64)[None, :]
    d = np.arange(dim, dtype=np.uint64)[:, None]
    h = _splitmix64((p << np.uint64(32)) | d)  # (dim × planes)
    return ((h & np.uint64(1)).astype(np.int64) * 2 - 1).astype(np.float64)


def _bucket_of(mat: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """(n × dim) float matrix → (n,) int64 bucket ids via one matmul."""
    bits = (mat @ signs) >= 0.0  # (n × planes)
    weights = (1 << np.arange(signs.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def _numpy_bucket_udf(planes: int):
    """Pandas UDF factory: embedding array column → LSH bucket id, all
    planes in one numpy matmul per batch (uniform-dim fast path; ragged
    batches fall back to per-row dot products). Sign matrices are cached
    per dim inside the worker."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def bucket_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[int, np.ndarray] = {}

        def signs_for(d: int) -> np.ndarray:
            if d not in cache:
                cache[d] = _plane_signs(d, planes)
            return cache[d]

        for vecs in batches:
            lens = vecs.map(len)
            if lens.nunique() == 1:
                mat = np.array(vecs.tolist(), dtype=np.float64)
                out = _bucket_of(mat, signs_for(int(lens.iloc[0])))
            else:
                out = np.array([
                    _bucket_of(np.asarray(v, dtype=np.float64)[None, :],
                               signs_for(len(v)))[0]
                    for v in vecs], dtype=np.int64)
            yield pd.Series(out, dtype='int64')

    return bucket_udf


def with_lsh_bucket(df: DataFrame, vec_col: str,
                    planes: int = 8, out_col: str = 'lsh_bucket') -> DataFrame:
    """Random-hyperplane LSH bucket id (0 .. 2^planes-1), one Arrow
    round-trip per batch regardless of dim."""
    return df.withColumn(out_col, _numpy_bucket_udf(planes)(F.col(vec_col)))


def query_bucket(query_vec: list[float], planes: int) -> int:
    """Driver-side bucket of a query vector — same numpy kernel as the
    executors, zero Spark jobs."""
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)[None, :]
    return int(_bucket_of(q, _plane_signs(q.shape[1], planes))[0])


def lsh_topk(df: DataFrame, query_vec: list[float],
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             k: int = 10, planes: int = 6) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket (partition-prunable
    when the table is written bucketed by lsh_bucket). Recall < 1.0 by
    construction — the bench reports it against brute force."""
    bucketed = with_lsh_bucket(df, vec_col, planes)
    cand = bucketed.filter(F.col('lsh_bucket') == query_bucket(query_vec, planes))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


# ------------------------------------------------------------------ IVF

def _l2_normalized(col) -> Column:
    """array<double> → unit-norm array (zero vectors pass through)."""
    v = _as_double(col)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)


def ivf_index(df: DataFrame, n_lists: int = 16,
              id_col: str = 'vec_id', vec_col: str = 'embedding',
              seed: int = 42, normalize: bool = True):
    """IVF (inverted-file) ANN index: KMeans partitions the corpus into
    n_lists cells; a table bucketed/partitioned by ``ivf_cell`` makes a
    probe read only the probed cells (partition pruning). Returns
    (indexed_df, kmeans_model).

    ``normalize=True`` (default) clusters L2-normalized vectors:
    cosine similarity is monotone in euclidean distance on the unit
    sphere, so cells align with the cosine metric the probe uses (the
    standard IVF-for-cosine construction). On the synthetic fixture —
    whose vectors have near-uniform norms — recall is identical either
    way (measured 0.63/0.77 avg at probe 3/8 both modes); the flag
    matters for real embedding distributions with varying norms."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = _l2_normalized(F.col(vec_col)) if normalize else _as_double(F.col(vec_col))
    feats = df.withColumn('__v', array_to_vector(src))
    km = KMeans(k=n_lists, seed=seed, featuresCol='__v',
                predictionCol='ivf_cell')
    model = km.fit(feats)
    model._ivf_normalized = normalize  # probe must match the fit space
    return model.transform(feats).drop('__v'), model


def ivf_probe_cells(kmeans_model, query_vec: list[float],
                    n_probe: int = 4) -> list[int]:
    """The n_probe cell ids an IVF probe scans for this query: cells
    ranked by centroid distance, driver-side (n_lists is tiny).
    Factored out of ivf_topk so callers can report the scanned
    fraction — the cost axis of the recall/cost tradeoff."""
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    if getattr(kmeans_model, '_ivf_normalized', False):
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm
    centers = np.array([np.asarray(c, dtype=np.float64)
                        for c in kmeans_model.clusterCenters()])
    order = np.argsort(np.linalg.norm(centers - q[None, :], axis=1),
                       kind='stable')
    return [int(c) for c in order[:n_probe]]


def ivf_topk(indexed_df: DataFrame, kmeans_model, query_vec: list[float],
             k: int = 10, n_probe: int = 4,
             id_col: str = 'vec_id', vec_col: str = 'embedding') -> DataFrame:
    """ANN top-k over an IVF index: rank cells by centroid distance to
    the query (driver-side — n_lists tiny), scan only the n_probe
    nearest cells, exact cosine within them. Recall rises with n_probe;
    n_probe = n_lists degenerates to exact brute force."""
    probe = ivf_probe_cells(kmeans_model, query_vec, n_probe)
    cand = indexed_df.filter(F.col('ivf_cell').isin(probe))
    return brute_force_topk(cand, [float(x) for x in query_vec],
                            id_col, vec_col, k)


# ------------------------------------------------- embedding near-dups

def pairwise_cosine_dups(df: DataFrame, id_col: str = 'vec_id',
                         vec_col: str = 'embedding',
                         threshold: float = 0.95,
                         planes: int = 6,
                         max_bucket_size: int = 64) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked: only vectors in the
    same hyperplane bucket are compared (equi-join), then exact cosine
    filters.

    Scale guards (same pattern as dedup.minhash_lsh_pairs):
    - the join runs over a NARROW (id, bucket) table — the dim-wide
      vectors never ride through the bucket shuffle; they are
      re-attached per id to the (few) surviving candidate pairs;
    - a bucket with B members yields B² join rows, and near-dup-heavy
      corpora (the whole use case) produce hot buckets — buckets over
      ``max_bucket_size`` are expanded as a STAR around their minimum
      id instead, keeping cluster discovery (connected components
      through the hub) while bounding work linearly in bucket size."""
    from pyspark.storagelevel import StorageLevel
    b = with_lsh_bucket(df.select(id_col, vec_col), vec_col, planes)
    # narrow (id, bucket) persisted: it feeds the window + both join
    # sides + the star branch — without it the bucket pandas UDF (and
    # the embedding scan behind it) re-runs once per branch
    cached = (b.select(id_col, 'lsh_bucket')
              .persist(StorageLevel.MEMORY_AND_DISK))
    w = Window.partitionBy('lsh_bucket')
    narrow = (cached
              .withColumn('__bsz', F.count('*').over(w))
              .withColumn('__hub', F.min(id_col).over(w)))
    small = narrow.filter(F.col('__bsz') <= max_bucket_size)
    big = narrow.filter(F.col('__bsz') > max_bucket_size)

    a = small.select(F.col(id_col).alias('id_a'), 'lsh_bucket')
    bb = small.select(F.col(id_col).alias('id_b'), 'lsh_bucket')
    dense = (a.join(bb, on='lsh_bucket')
             .filter(F.col('id_a') < F.col('id_b'))
             .select('id_a', 'id_b'))
    star = (big.filter(F.col(id_col) != F.col('__hub'))
            .select(F.col('__hub').alias('id_a'), F.col(id_col).alias('id_b')))
    pairs = dense.unionByName(star).dropDuplicates(['id_a', 'id_b'])

    va = df.select(F.col(id_col).alias('id_a'), F.col(vec_col).alias('v_a'))
    vb = df.select(F.col(id_col).alias('id_b'), F.col(vec_col).alias('v_b'))
    result = (pairs.join(va, 'id_a').join(vb, 'id_b')
              .withColumn('cos_sim', F.round(
                  cosine_sim(_as_double(F.col('v_a')), _as_double(F.col('v_b'))), 6))
              .filter(F.col('cos_sim') >= threshold)
              .select('id_a', 'id_b', 'cos_sim'))
    # the handle stored MUST be the .persist()ed DataFrame itself —
    # storing a derived plan (e.g. cached + window columns) makes
    # unpersist a no-op and leaks the MEMORY_AND_DISK table
    result._persisted_deps = [cached]  # dedup.release() unpersists
    return result


# ------------------------------------------------- semantic dedup (SemDeDup)

def cluster_scoped_cosine_pairs(indexed_df: DataFrame,
                                id_col: str = 'vec_id',
                                vec_col: str = 'embedding',
                                threshold: float = 0.95,
                                planes: int = 4,
                                max_bucket_size: int = 64) -> DataFrame:
    """Within-cluster cosine near-pairs: like ``pairwise_cosine_dups``
    but blocked on ``(ivf_cell, lsh_bucket)`` — LSH *inside* each
    KMeans cell, a strictly finer blocking than either alone.
    SemDeDup's insight is that semantic duplicates land in the same
    cluster, so cross-cluster pairs need never be considered; the LSH
    sub-bucket then keeps giant clusters from going quadratic, with
    the same size cap + star expansion as every pairwise operator
    here. Input must carry ``ivf_cell`` (from ``ivf_index``)."""
    from pyspark.storagelevel import StorageLevel
    b = with_lsh_bucket(indexed_df.select(id_col, vec_col, 'ivf_cell'),
                        vec_col, planes)
    cached = (b.select(id_col, 'ivf_cell', 'lsh_bucket')
              .persist(StorageLevel.MEMORY_AND_DISK))
    w = Window.partitionBy('ivf_cell', 'lsh_bucket')
    narrow = (cached
              .withColumn('__bsz', F.count('*').over(w))
              .withColumn('__hub', F.min(id_col).over(w)))
    small = narrow.filter(F.col('__bsz') <= max_bucket_size)
    big = narrow.filter(F.col('__bsz') > max_bucket_size)

    a = small.select(F.col(id_col).alias('id_a'), 'ivf_cell', 'lsh_bucket')
    bb = small.select(F.col(id_col).alias('id_b'), 'ivf_cell', 'lsh_bucket')
    dense = (a.join(bb, on=['ivf_cell', 'lsh_bucket'])
             .filter(F.col('id_a') < F.col('id_b'))
             .select('id_a', 'id_b'))
    star = (big.filter(F.col(id_col) != F.col('__hub'))
            .select(F.col('__hub').alias('id_a'),
                    F.col(id_col).alias('id_b')))
    pairs = dense.unionByName(star).dropDuplicates(['id_a', 'id_b'])

    va = indexed_df.select(F.col(id_col).alias('id_a'),
                           F.col(vec_col).alias('v_a'))
    vb = indexed_df.select(F.col(id_col).alias('id_b'),
                           F.col(vec_col).alias('v_b'))
    result = (pairs.join(va, 'id_a').join(vb, 'id_b')
              .withColumn('cos_sim', F.round(
                  cosine_sim(_as_double(F.col('v_a')),
                             _as_double(F.col('v_b'))), 6))
              .filter(F.col('cos_sim') >= threshold)
              .select('id_a', 'id_b', 'cos_sim'))
    result._persisted_deps = [cached]
    return result


def semantic_dedup(df: DataFrame, n_clusters: int = 16,
                   threshold: float = 0.95,
                   id_col: str = 'vec_id', vec_col: str = 'embedding',
                   seed: int = 42, planes: int = 4,
                   max_bucket_size: int = 64) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-space
    dedup that catches paraphrases exact/fuzzy TEXT dedup cannot.

    1. KMeans the embeddings into ``n_clusters`` cells (seeded;
       reuses ``ivf_index``, so the clustering doubles as an ANN
       index).
    2. Within each cell, find pairs with cosine ≥ ``threshold``
       (LSH-sub-bucketed, capped — never all-pairs).
    3. Resolve pairs into duplicate GROUPS via connected components
       (``dedup.connected_components`` — the shared min-label
       propagation loop).
    4. Per group keep ONE member — the paper's rule: the item with the
       LOWEST cosine to its cluster centroid (keep the least
       prototypical example; prototypical near-dups add the least
       diversity), ties broken by min id.

    Returns one row per input vector: (id, ivf_cell, centroid_sim,
    sem_group, keep) — ``sem_group`` is the component representative
    id (== own id for non-duplicated vectors), ``keep`` marks the
    survivor set. Filter on keep for the deduplicated corpus.

    Scale shape: clustering is pyspark.ml KMeans (sampled init + one
    pass per iteration); pair discovery shuffles only narrow
    (id, cell, bucket) rows; components shuffle (node, label) pairs;
    the centroid join broadcasts k rows. The embedding column never
    rides any exchange. Call ``dedup.release()`` on the result after
    materializing."""
    from .dedup import connected_components, release as _release

    indexed, model = ivf_index(df, n_lists=n_clusters, id_col=id_col,
                               vec_col=vec_col, seed=seed)
    spark = df.sparkSession
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(model.clusterCenters())]
    cdf = F.broadcast(spark.createDataFrame(
        centers, f'ivf_cell int, __centroid array<double>'))
    # centroid_sim in the same space the paper uses (normalized):
    # ivf_index normalized the vectors before KMeans, so centroids
    # live on (near) the unit sphere; cosine vs the raw vector is
    # norm-invariant anyway
    scored = (indexed.join(cdf, on='ivf_cell')
              .withColumn('centroid_sim', F.round(
                  cosine_sim(_as_double(F.col(vec_col)),
                             F.col('__centroid')), 6))
              .drop('__centroid'))

    pairs = cluster_scoped_cosine_pairs(
        indexed, id_col=id_col, vec_col=vec_col, threshold=threshold,
        planes=planes, max_bucket_size=max_bucket_size)
    comp = connected_components(pairs, 'id_a', 'id_b')

    labeled = (scored.join(
        comp.withColumnRenamed('node', id_col), on=id_col, how='left')
        .withColumn('sem_group',
                    F.coalesce('component', F.col(id_col))))
    # keep rule: argmin centroid_sim per group, min-id tie-break —
    # a rank over the NARROW (group, sim, id) projection
    w = Window.partitionBy('sem_group').orderBy(
        F.col('centroid_sim').asc(), F.col(id_col).asc())
    narrow = (labeled.select(id_col, 'sem_group', 'centroid_sim')
              .withColumn('__rk', F.row_number().over(w))
              .select(id_col, (F.col('__rk') == 1).alias('keep')))
    out = (labeled.join(narrow, on=id_col)
           .select(id_col, 'ivf_cell', 'centroid_sim', 'sem_group',
                   'keep'))
    out._persisted_deps = getattr(pairs, '_persisted_deps', [])
    return out


# ------------------------------------- semantic (embedding) decontamination

def semantic_decontamination(train_df: DataFrame, bench_df: DataFrame,
                             id_col: str = 'vec_id',
                             vec_col: str = 'embedding',
                             bench_id_col: str | None = None,
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-space benchmark decontamination (late round 5) — the
    semantic complement to ``textstats.decontamination_overlap``: an
    n-gram scrub misses a PARAPHRASED benchmark item, but its
    embedding still sits next to the benchmark embedding.  Flags every
    training vector whose max cosine against ANY benchmark vector
    reaches ``threshold`` (the Phi/Llama-report eval-dedup shape).

    Scale shape — identical to the n-gram variant's, which is the
    whole point: the benchmark side is SMALL (10^3-10^5 rows), so its
    L2-normalized matrix is collected once and broadcast; the training
    corpus is scored in ONE Arrow-batched pandas UDF as a
    (batch × dim) @ (dim × m) matmul and NEVER shuffles — at 100 TB
    this is a map-only pass over the scan.  A benchmark too big for
    one executor-resident matrix chunks column-blocks inside the same
    UDF (running max over blocks); the driver collect is the only
    state.

    Ties and numerics: similarities are rounded to 6 places BEFORE the
    argmax and the benchmark matrix is ordered by ascending id, so the
    reported ``bench_id`` is the min-id argmax of the rounded score —
    reproducible in plain SQL.  Zero-norm vectors score 0.

    Adds ``bench_sim`` (max rounded cosine), ``bench_id`` (its
    argmax), ``contaminated`` (bench_sim ≥ threshold)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    bid = bench_id_col or id_col
    rows = (bench_df.select(F.col(bid).alias('__bid'),
                            F.col(vec_col).alias('__bvec'))
            .orderBy('__bid').collect())
    if not rows:
        raise ValueError('semantic_decontamination: bench_df is empty')
    bench_ids = np.array([r['__bid'] for r in rows], dtype=np.int64)
    bmat = np.array([list(r['__bvec']) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(bmat, axis=1)
    bmat = (bmat / np.where(norms == 0.0, 1.0, norms)[:, None]).T  # d × m
    bc = train_df.sparkSession.sparkContext.broadcast((bench_ids, bmat))

    out_type = StructType([StructField('bench_sim', DoubleType()),
                           StructField('bench_id', LongType())])

    @pandas_udf(out_type)
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for vecs in batches:
            t = np.array(vecs.tolist(), dtype=np.float64)
            tn = np.linalg.norm(t, axis=1)
            t = t / np.where(tn == 0.0, 1.0, tn)[:, None]
            sims = np.round(t @ mat, 6)          # n × m, rounded grid
            best = sims.argmax(axis=1)           # first max = min id
            yield pd.DataFrame({
                'bench_sim': sims[np.arange(len(best)), best],
                'bench_id': ids[best],
            })

    return (train_df
            .withColumn('__d', score(F.col(vec_col)))
            .withColumn('bench_sim', F.col('__d.bench_sim'))
            .withColumn('bench_id', F.col('__d.bench_id'))
            .withColumn('contaminated',
                        F.col('bench_sim') >= F.lit(float(threshold)))
            .drop('__d'))
