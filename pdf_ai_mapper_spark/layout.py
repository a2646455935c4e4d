"""Storage layout for repeated access — the two levers a 100 TB table
has BEFORE any query runs: co-locating join keys (bucketing) and
clustering scan ranges (range layout + min/max file skipping).

**Bucketed tables** (`write_bucketed` / `colocated_join`): the fact
table of a pipeline is joined on the same key every day (documents ⋈
scores, events ⋈ sessions). Paying a full shuffle of the big side per
join is the single largest recurring cost at scale; hash-bucketing
both tables on the join key at WRITE time makes every later equi-join
on that key shuffle-FREE — Spark's bucketed scan reports
HashPartitioning(key, n) as its output partitioning, so the planner
drops both Exchanges (and both Sorts, when ``sortBy`` matches). This
is the parquet-table stand-in for Iceberg's bucket partition
transform (reference persistence is Iceberg-shaped:
/root/reference/app/core/document_storage.py:50-74 — same idea, no
Iceberg jars in this sandbox, SURVEY §4.3). Notes that matter at
scale: both sides must agree on bucket COUNT (or be integer
multiples, AQE-era Spark handles k·n); the bucket column must be the
join column exactly; bucketed writes produce n_buckets files per
task — repartition ON the bucket key first so each task writes one
file per bucket it owns.

**Range-clustered layout + file skipping** (`write_clustered` /
`read_pruned`): parquet row-group stats only help when values are
CLUSTERED — a random layout has every file spanning the full value
range, so nothing skips. ``write_clustered`` lays the table out with
``repartitionByRange + sortWithinPartitions`` (each file owns a
contiguous value range) and records a per-FILE min/max sidecar — the
same manifest-level pruning Iceberg/Delta do — built from a scan that
reads ONLY the cluster column (column pruning makes it a metadata-
weight job). ``read_pruned`` consults the driver-scale sidecar and
hands Spark only the overlapping files: a range predicate over a
1000-file table plans a scan of the ~k files that can match, before
parquet even opens a footer. Row-group pushdown then prunes further
WITHIN the chosen files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS = '_cluster_stats'


# --------------------------------------------------------- bucketing

def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_col: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Write ``df`` as a bucketed external table (data at ``path``,
    name registered in the session catalog — bucketed reads require a
    table, plain ``.parquet(path)`` loses the bucket metadata).
    Repartitions on the bucket column first so each task writes a
    single file per bucket instead of n_buckets small files each."""
    if n_buckets <= 0:
        raise ValueError(f'n_buckets must be positive, got {n_buckets}')
    w = (df.repartition(n_buckets, F.col(bucket_col))
         .write.bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.option('path', path).format('parquet').saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str,
                   right_table: str, on: 'str | list[str]',
                   how: str = 'inner') -> DataFrame:
    """Join two bucketed tables on their bucket key. When both were
    written with the same ``n_buckets`` on the join column, the plan
    contains NO shuffle Exchange on either side (asserted in
    tests/test_layout.py with broadcast disabled — a broadcast join
    would hide the co-location)."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=on, how=how)


def drop_table(spark: SparkSession, table: str) -> None:
    """Unregister a table written by write_bucketed (external: the
    files at ``path`` are left alone; callers own their temp dirs)."""
    spark.sql(f'DROP TABLE IF EXISTS {table}')


# ------------------------------------------- range-clustered pruning

def write_clustered(df: DataFrame, path: str, cluster_col: str,
                    n_files: int) -> None:
    """Write ``df`` range-clustered on ``cluster_col`` into ~n_files
    contiguous-range files, plus the per-file min/max sidecar at
    ``path/_cluster_stats``. The sidecar job re-reads only
    (file, cluster_col) — column pruning keeps it metadata-weight."""
    if n_files <= 0:
        raise ValueError(f'n_files must be positive, got {n_files}')
    (df.repartitionByRange(n_files, F.col(cluster_col))
     .sortWithinPartitions(cluster_col)
     .write.parquet(path))
    stats = (df.sparkSession.read.parquet(path)
             .groupBy(F.input_file_name().alias('file'))
             .agg(F.min(cluster_col).alias('lo'),
                  F.max(cluster_col).alias('hi'),
                  F.count('*').cast('long').alias('n_rows')))
    stats.coalesce(1).write.parquet(os.path.join(path, _STATS))


def read_pruned(spark: SparkSession, path: str, cluster_col: str,
                lo, hi) -> DataFrame:
    """Scan only the files whose [min, max] overlaps [lo, hi] (both
    inclusive), then re-apply the predicate for row-level exactness
    (files straddling a bound hold rows outside it; parquet row-group
    pushdown prunes most of those before they materialize). The
    sidecar read is driver-scale. Returns a DataFrame carrying
    ``_pruned_files = (files_read, files_total)`` as skip evidence."""
    stats = spark.read.parquet(os.path.join(path, _STATS)).collect()
    keep = [r['file'] for r in stats
            if not (r['hi'] < lo or r['lo'] > hi)]
    total = len(stats)
    pred_all = (F.col(cluster_col) >= F.lit(lo)) \
        & (F.col(cluster_col) <= F.lit(hi))
    if not keep:
        out = (spark.read.parquet(path).filter(pred_all).limit(0))
        out._pruned_files = (0, total)
        return out
    out = spark.read.parquet(*keep).filter(pred_all)
    out._pruned_files = (len(keep), total)
    return out
