"""Deduplication operators (D1-D4 + the training-data-pipeline family).

Exact dedup re-expresses the reference's first-seen-wins semantics
(``filter_manager.py:70-97`` search-time; ``document_storage.py:105-138``
destructive) as a rank-1 window — a single hash shuffle on
``content_hash`` instead of the reference's O(n²) scan.  Rows with a
NULL hash are always kept (reference :80-82).

Near-dup family (MinHash+LSH, SimHash, n-gram Jaccard) is built
entirely from native Catalyst expressions — explode / xxhash64 /
groupBy / bit ops — no Python UDFs, so every stage is whole-stage
codegen'd and map-side-combined.  At 100 TB the LSH band join is the
only shuffle whose keys are content-derived; band buckets bound the
candidate-pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------- exact dedup

def with_dup_rank(df: DataFrame,
                  hash_col: str = 'content_hash',
                  order_cols: tuple[str, ...] = ('warc_ts', 'url')) -> DataFrame:
    """First-seen-wins rank per content hash (D2). Deterministic total
    order inside each hash group via (warc_ts, url)."""
    w = Window.partitionBy(hash_col).orderBy(*[F.col(c).asc() for c in order_cols])
    return df.withColumn('dup_rank', F.row_number().over(w))


def dedup_exact(df: DataFrame,
                hash_col: str = 'content_hash',
                order_cols: tuple[str, ...] = ('warc_ts', 'url')) -> DataFrame:
    """Survivor set: rank-1 rows; NULL hashes exempt (reference
    filter_manager.py:80-82)."""
    ranked = with_dup_rank(df, hash_col, order_cols)
    return (ranked
            .filter(F.col(hash_col).isNull() | (F.col('dup_rank') == 1))
            .drop('dup_rank'))


def anti_join_committed(batch: DataFrame, committed: DataFrame,
                        hash_col: str = 'content_hash') -> DataFrame:
    """J1: drop incoming rows whose hash already exists in the committed
    table — a broadcast/shuffle left-anti join instead of the
    reference's per-doc linear scan (document_storage.py:86-103)."""
    return batch.join(committed.select(hash_col).distinct(),
                      on=hash_col, how='left_anti')


# --------------------------------------------------------------- shingling

def with_shingles(df: DataFrame, text_col: str, k: int = 3,
                  out_col: str = 'shingles') -> DataFrame:
    """Distinct word k-gram shingles per row, via native higher-order
    functions (no UDF): tokens → transform over a sequence of start
    offsets → array_distinct."""
    toks = F.split(F.lower(F.col(text_col)), r'\s+')
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(' ', F.slice(toks, i + 1, k)))
    return df.withColumn(
        out_col,
        F.when(n >= k, F.array_distinct(sh)).otherwise(F.array()),
    )


# --------------------------------------------------------------- MinHash LSH

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 64, k: int = 3) -> DataFrame:
    """(id, sig: array<bigint>) — num_hashes min-hash values per doc.
    One explode + one groupBy with map-side partial mins; hash family =
    xxhash64(shingle, i)."""
    ex = (with_shingles(df.select(id_col, text_col), text_col, k)
          .select(id_col, F.explode('shingles').alias('sh')))
    aggs = [F.min(F.xxhash64(F.col('sh'), F.lit(i))).alias(f'h{i}')
            for i in range(num_hashes)]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(id_col,
                      F.array(*[F.col(f'h{i}') for i in range(num_hashes)]).alias('sig'))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16, k: int = 3,
                      jaccard_threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified by estimated
    Jaccard = fraction of agreeing minhashes. Returns (id_a, id_b,
    jaccard_est) with id_a < id_b."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k)
    band = sig.select(
        id_col, 'sig',
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias('band'),
    ).withColumn('band_key', F.xxhash64(
        F.col('band'),
        F.concat_ws(',', F.transform(
            F.slice('sig', F.col('band') * rows + 1, rows),
            lambda v: v.cast('string'))),
    ))
    a = band.select(F.col(id_col).alias('id_a'), F.col('sig').alias('sig_a'),
                    'band', 'band_key')
    b = band.select(F.col(id_col).alias('id_b'), F.col('sig').alias('sig_b'),
                    'band', 'band_key')
    pairs = (a.join(b, on=['band', 'band_key'])
             .filter(F.col('id_a') < F.col('id_b'))
             .dropDuplicates(['id_a', 'id_b']))
    agree = F.size(F.filter(
        F.zip_with('sig_a', 'sig_b', lambda x, y: x == y),
        lambda m: m,
    ))
    return (pairs
            .withColumn('jaccard_est', agree / F.lit(float(num_hashes)))
            .filter(F.col('jaccard_est') >= jaccard_threshold)
            .select('id_a', 'id_b', 'jaccard_est'))


# --------------------------------------------------------------- SimHash

def with_simhash(df: DataFrame, id_col: str, text_col: str,
                 bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc from token hashes — explode + 64 signed
    bit-sum aggregations (all map-side combinable), assembled back into
    one bigint. (Charikar, STOC 2002.)"""
    ex = (df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), r'\s+')).alias('tok'))
            .filter(F.length('tok') > 0)
            .withColumn('h', F.xxhash64('tok')))
    aggs = [
        F.sum(F.shiftright('h', b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f'b{b}')
        for b in range(bits)
    ]
    sums = ex.groupBy(id_col).agg(*aggs)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f'b{b}') >= 0,
                      F.shiftleft(F.lit(1).cast('long'), b)).otherwise(F.lit(0).cast('long'))
        sim = term if sim is None else sim.bitwiseOR(term)
    return sums.select(id_col, sim.alias('simhash'))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (pigeonhole: distance ≤3 → at least one of 4 chunks equal),
    so the join is equi-key, not a cross product."""
    sh = with_simhash(df, id_col, text_col)
    chunks = sh.select(
        id_col, 'simhash',
        F.explode(F.array(*[
            F.struct(F.lit(c).alias('chunk'),
                     F.shiftrightunsigned('simhash', 16 * c)
                      .bitwiseAND(F.lit(0xFFFF)).alias('key'))
            for c in range(4)
        ])).alias('blk'),
    ).select(id_col, 'simhash', F.col('blk.chunk').alias('chunk'),
             F.col('blk.key').alias('key'))
    a = chunks.select(F.col(id_col).alias('id_a'), F.col('simhash').alias('sh_a'),
                      'chunk', 'key')
    b = chunks.select(F.col(id_col).alias('id_b'), F.col('simhash').alias('sh_b'),
                      'chunk', 'key')
    return (a.join(b, on=['chunk', 'key'])
            .filter(F.col('id_a') < F.col('id_b'))
            .dropDuplicates(['id_a', 'id_b'])
            .withColumn('hamming', F.bit_count(F.col('sh_a').bitwiseXOR(F.col('sh_b'))))
            .filter(F.col('hamming') <= max_hamming)
            .select('id_a', 'id_b', 'hamming'))


# --------------------------------------------------------------- Jaccard

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle:
    explode → self-join on shingle → |∩| per pair → |∪| from per-doc
    sizes. The shingle join IS the blocking — disjoint docs never meet."""
    sh = with_shingles(df.select(id_col, text_col), text_col, k)
    sizes = sh.select(id_col, F.size('shingles').alias('n_sh'))
    ex = sh.select(id_col, F.explode('shingles').alias('sh'))
    a = ex.select(F.col(id_col).alias('id_a'), 'sh')
    b = ex.select(F.col(id_col).alias('id_b'), 'sh')
    inter = (a.join(b, on='sh')
             .filter(F.col('id_a') < F.col('id_b'))
             .groupBy('id_a', 'id_b').agg(F.count('*').alias('n_inter')))
    sa = sizes.select(F.col(id_col).alias('id_a'), F.col('n_sh').alias('n_a'))
    sb = sizes.select(F.col(id_col).alias('id_b'), F.col('n_sh').alias('n_b'))
    return (inter.join(sa, 'id_a').join(sb, 'id_b')
            .withColumn('jaccard',
                        F.col('n_inter') / (F.col('n_a') + F.col('n_b') - F.col('n_inter')))
            .filter(F.col('jaccard') >= threshold)
            .select('id_a', 'id_b', 'jaccard'))
