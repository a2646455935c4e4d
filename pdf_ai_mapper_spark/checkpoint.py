"""Checkpoint / lineage table: resumable, idempotent extraction runs.

The reference batches JSON index writes behind a pending-save flag
(``document_storage.py:59-74``); at cluster scale that becomes
snapshot-style commits with per-bucket lineage (SURVEY.md §4.3):

- Output is laid out in ``output_buckets`` url-hash buckets
  (``bucket = pmod(xxhash64(url), B)``), written with dynamic
  partition overwrite — each bucket commit is atomic at the
  directory level (Iceberg snapshot commit on real clusters; the
  parquet layout here is Iceberg-shaped).
- ``_checkpoints`` parquet records, per committed bucket:
  run id, rows in/out, error-row count, commit timestamp.
- A resumed run reads the committed bucket set and processes only the
  remaining buckets — re-running a finished job writes 0 rows
  (idempotence test in tests/test_pipeline.py).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = ('run_id string, bucket int, rows_in long, rows_out long, '
                     'error_rows long, committed_at timestamp')


def checkpoint_path(output_path: str) -> str:
    return os.path.join(output_path, '_checkpoints')


def data_path(output_path: str) -> str:
    return os.path.join(output_path, 'data')


def is_missing_path_error(e: Exception) -> bool:
    """True only for the missing-input-path analysis error — a corrupt
    or permission-broken table must surface, not silently disable
    resume (which would reprocess every bucket)."""
    cond = None
    for attr in ('getCondition', 'getErrorClass'):
        get = getattr(e, attr, None)
        if callable(get):
            try:
                cond = get()
            except Exception:
                cond = None
            break
    s = str(e)
    return (cond == 'PATH_NOT_FOUND' or 'PATH_NOT_FOUND' in s
            or 'Path does not exist' in s)


def committed_buckets(spark: SparkSession, output_path: str) -> set[int]:
    from pyspark.errors import AnalysisException
    cp = checkpoint_path(output_path)
    try:
        rows = spark.read.parquet(cp).select('bucket').distinct().collect()
    except AnalysisException as e:
        if is_missing_path_error(e):  # first run: no checkpoint table yet
            return set()
        raise
    return {r['bucket'] for r in rows}


def append_checkpoints(spark: SparkSession, output_path: str,
                       entries: list[dict]) -> None:
    if not entries:
        return
    df = spark.createDataFrame(
        [(e['run_id'], e['bucket'], e['rows_in'], e['rows_out'], e['error_rows'])
         for e in entries],
        'run_id string, bucket int, rows_in long, rows_out long, error_rows long',
    ).withColumn('committed_at', F.current_timestamp())
    df.write.mode('append').parquet(checkpoint_path(output_path))


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    recover_swap(data_path(output_path))
    return spark.read.parquet(data_path(output_path))


def swap_dirs(data: str, tmp: str, old: str) -> None:
    """Promote ``tmp`` to ``data`` via rename-through-``old``.

    Crash-safe contract (local-fs stand-in for an Iceberg snapshot
    commit, where this whole dance is one metadata pointer swap):
    - a stale ``old`` left by a previously interrupted swap is removed
      first — otherwise ``os.rename(data, old)`` raises ENOTEMPTY and
      every later swap fails forever;
    - the window between the two renames is NOT atomic: a crash there
      leaves ``data`` missing but ``old`` + ``tmp`` intact.
      ``recover_swap`` (called by ``read_output``) restores ``old`` in
      that case, so readers see the pre-swap table rather than
      PATH_NOT_FOUND.
    """
    import shutil
    shutil.rmtree(old, ignore_errors=True)
    os.rename(data, old)
    os.rename(tmp, data)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(data: str) -> None:
    """Roll back a swap that crashed between its two renames: if
    ``data`` is missing but a ``.dedup_old`` / ``.compact_old`` sibling
    exists, restore it."""
    if os.path.exists(data):
        return
    for suffix in ('.dedup_old', '.compact_old'):
        old = data + suffix
        if os.path.exists(old):
            os.rename(old, data)
            return


def compact_output(spark: SparkSession, output_path: str,
                   files_per_bucket: int = 1) -> dict:
    """Small-file compaction for the bucketed batch layout.

    Every append-mode run (incremental batches via
    ``run_extraction(dedup_against_output=True)``) adds ≥1 file per
    touched bucket, so file count grows linearly with runs — at
    cluster scale each read then pays one open()+footer parse per tiny
    file. Rewrites each bucket into ``files_per_bucket`` files
    (repartition on (bucket, url-hash-salt) so a bucket can also be
    SPLIT into several right-sized files), verifies the row count,
    then atomically swaps directories. The lineage table is untouched:
    compaction moves bytes, not rows, so resume semantics and
    counters stay valid.

    On a real cluster this is Iceberg's rewrite-data-files snapshot
    commit; the local-fs stand-in is write-to-sibling + rename swap,
    with the row-count check before the old data is dropped."""
    import shutil

    data = data_path(output_path)
    df = spark.read.parquet(data)
    files_before = len(df.inputFiles())
    n_before = df.count()

    k = max(1, files_per_bucket)
    n_buckets = df.select('bucket').distinct().count()
    parts = df.repartition(max(1, n_buckets * k), F.col('bucket'),
                           F.pmod(F.xxhash64('url'), F.lit(k)))
    tmp = data + '.compact_tmp'
    parts.write.partitionBy('bucket').mode('overwrite').parquet(tmp)

    compacted = spark.read.parquet(tmp)
    n_after = compacted.count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f'compaction row-count mismatch: {n_before} -> {n_after}; '
            f'original data left untouched')
    files_after = len(compacted.inputFiles())

    swap_dirs(data, tmp, data + '.compact_old')
    return {'rows': int(n_after), 'files_before': int(files_before),
            'files_after': int(files_after)}
