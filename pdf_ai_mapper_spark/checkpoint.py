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


# -- exactly-once lineage counters for append-mode (incremental) runs --
#
# Append-mode writes commit rows in the parquet job; the lineage
# counters land in a SECOND write (append_checkpoints).  A crash in
# between leaves rows committed but uncounted — and because the
# content anti-join makes retries drop already-written rows, the
# counters would stay wrong forever.  The fix is a tiny intent marker:
#
#   write _intents/<run_id>.json  (carries the per-bucket rows_in map)
#   → parquet append job commits
#   → append_checkpoints
#   → remove the marker
#
# ``reconcile_intents`` (called at the start of every run) finds
# orphaned markers and rebuilds the missing checkpoint entries by
# scanning ONLY the crashed run's rows (run_id + bucket + is_error —
# three narrow columns, column-pruned).  Normal startup cost is one
# listdir.  On a real cluster this marker is a row in a driver-side
# run-state table next to the Iceberg snapshot log.

def intents_path(output_path: str) -> str:
    return os.path.join(output_path, '_intents')


def write_intent(output_path: str, run_id: str,
                 rows_in: dict[int, int]) -> None:
    import json
    d = intents_path(output_path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f'.{run_id}.tmp')
    with open(tmp, 'w') as f:
        json.dump({'run_id': run_id,
                   'rows_in': {str(k): int(v) for k, v in rows_in.items()}},
                  f)
    os.rename(tmp, os.path.join(d, f'{run_id}.json'))  # atomic publish


def clear_intent(output_path: str, run_id: str) -> None:
    try:
        os.remove(os.path.join(intents_path(output_path), f'{run_id}.json'))
    except FileNotFoundError:
        pass


def pending_intents(output_path: str) -> list[dict]:
    import json
    d = intents_path(output_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith('.json'):
            continue
        with open(os.path.join(d, name)) as f:
            out.append(json.load(f))
    return out


def reconcile_intents(spark: SparkSession, output_path: str) -> int:
    """Rebuild lineage entries for runs that crashed between the data
    append and the checkpoint append.  Returns the number of runs
    reconciled.  Idempotent: a marker whose entries already exist (the
    crash hit between append_checkpoints and clear_intent) is simply
    cleared."""
    from pyspark.errors import AnalysisException
    intents = pending_intents(output_path)
    if not intents:
        return 0

    def _run_ids(path: str) -> set[str]:
        try:
            return {r['run_id'] for r in spark.read.parquet(path)
                    .select('run_id').distinct().collect()}
        except AnalysisException as e:
            if is_missing_path_error(e):
                return set()
            raise

    counted = _run_ids(checkpoint_path(output_path))
    written = _run_ids(data_path(output_path))
    fixed = 0
    for intent in intents:
        rid = intent['run_id']
        if rid in written and rid not in counted:
            rows_in = {int(k): v for k, v in intent.get('rows_in', {}).items()}
            stats = (spark.read.parquet(data_path(output_path))
                     .filter(F.col('run_id') == rid)
                     .groupBy('bucket')
                     .agg(F.count('*').alias('out'),
                          F.sum(F.col('is_error').cast('long')).alias('err'))
                     .collect())
            append_checkpoints(spark, output_path, [
                {'run_id': rid, 'bucket': int(r['bucket']),
                 'rows_in': int(rows_in.get(int(r['bucket']), r['out'])),
                 'rows_out': int(r['out']), 'error_rows': int(r['err'])}
                for r in stats])
            fixed += 1
        clear_intent(output_path, rid)
    return fixed


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    recover_swap(data_path(output_path))
    recover_upsert(data_path(output_path))
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


def _upsert_paths(data: str) -> tuple[str, str, str]:
    return (data + '.upsert_tmp', data + '.upsert_old',
            data + '.upsert_intent.json')


def _promote_upsert(data: str, buckets: list[int]) -> None:
    """Per-bucket promotion, idempotent so a crashed run can resume it
    (roll-forward). Per bucket the only reachable states are:
    tmp present + data present (not started → both renames), tmp
    present + data absent (crashed between renames, or an inserted
    bucket → rename tmp in), tmp absent (done). os.rename is atomic,
    so no state is ambiguous."""
    import shutil
    tmp, old, intent = _upsert_paths(data)
    for n in buckets:
        t = os.path.join(tmp, f'bucket={n}')
        d = os.path.join(data, f'bucket={n}')
        if os.path.exists(t):
            if os.path.exists(d):
                os.makedirs(old, exist_ok=True)
                os.rename(d, os.path.join(old, f'bucket={n}'))
            os.rename(t, d)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    try:
        os.remove(intent)
    except FileNotFoundError:
        pass


def recover_upsert(data: str) -> None:
    """Finish or discard an interrupted ``upsert_output`` (called by
    ``read_output`` and at the start of every upsert). With a
    published intent the merge write had completed → roll FORWARD
    (finish the per-bucket promotion); without one the crash hit
    mid-merge-write → the stored table is untouched, discard the
    stray tmp."""
    import json
    import shutil
    tmp, old, intent = _upsert_paths(data)
    if os.path.exists(intent):
        with open(intent) as f:
            buckets = json.load(f)['buckets']
        _promote_upsert(data, buckets)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)


def upsert_output(spark: SparkSession, output_path: str,
                  batch: DataFrame, key_col: str = 'url',
                  order_col: str = 'crawl_ts',
                  n_buckets: int = 64) -> dict:
    """Recrawl upsert — MERGE INTO for the bucketed layout (the
    Iceberg MERGE stand-in, reference persistence document_storage.py:
    50-74): keep-latest per key between the stored table and a new
    batch. Rows with a matched key are replaced when the batch row's
    ``order_col`` is >= the stored one (a re-crawl at the same
    timestamp refreshes — ties go to the BATCH); unmatched batch keys
    insert; stored rows the batch never mentions are untouched BYTES —
    only the buckets containing batch keys are read and rewritten
    (per-bucket directory promotion, see crash safety below).

    Contract: ``batch`` carries the stored schema minus ``bucket``
    (computed here with the layout's own hash), is key-unique, and
    ``order_col`` is non-null. ``n_buckets`` must equal the layout's
    bucket count — a different value scatters keys into the wrong
    directories.

    Scale shape: the affected-bucket set collects driver-side
    (≤ n_buckets ints); the stored scan is partition-pruned to those
    directories (bucket is the partition column — Spark never lists
    the others); the merge is ONE groupBy(key) max_by over the
    affected slice + batch — payloads shuffle once, bounded by the
    slice, never the whole table. At 1000 buckets a batch touching 1%
    of keys rewrites ~63% of buckets (birthday bound) — size
    n_buckets so a typical batch's bucket fan-out stays well under
    the table, or bucket by host for crawl-locality.

    Crash safety (ADVICE r5 #3): the merged plan READS the same bucket
    directories it replaces, and V1 dynamic partition overwrite deletes
    matched dirs during commit — an in-place overwrite can lose the
    affected buckets on a mid-commit failure with no recovery path.
    So the merge writes to a SIBLING tmp dir first; once that write
    completes, an intent marker (the affected-bucket list) publishes
    atomically, and promotion is per-bucket renames that
    ``recover_upsert`` can roll forward after any crash — the same
    write-then-publish contract as ``compact_output``'s swap."""
    import json
    from pyspark.sql import Observation

    data = data_path(output_path)
    recover_upsert(data)
    tmp, _old, intent = _upsert_paths(data)
    b = batch.withColumn(
        'bucket', F.pmod(F.xxhash64(F.col(key_col)),
                         F.lit(n_buckets)).cast('int'))
    affected = sorted(r['bucket']
                      for r in b.select('bucket').distinct().collect())
    if not affected:
        return {'buckets_rewritten': 0, 'rows_written': 0}

    stored = (read_output(spark, output_path)
              .filter(F.col('bucket').isin(affected))
              .withColumn('__src', F.lit(0)))
    cols = [c for c in stored.columns if c != '__src']
    bb = b.select(*cols).withColumn('__src', F.lit(1))
    pick = F.max_by(
        F.struct(*[F.col(c) for c in cols]),
        F.struct(F.col(order_col), F.col('__src'))).alias('__row')
    obs = Observation()
    merged = (stored.unionByName(bb)
              .groupBy(key_col).agg(pick).select('__row.*')
              .observe(obs, F.count(F.lit(1)).alias('n')))
    merged.write.partitionBy('bucket').mode('error').parquet(tmp)
    # publish the intent ATOMICALLY (rename): from here on a crash
    # rolls forward; before here the stored table is untouched
    itmp = intent + '.tmp'
    with open(itmp, 'w') as f:
        json.dump({'buckets': [int(n) for n in affected]}, f)
    os.rename(itmp, intent)
    _promote_upsert(data, affected)
    return {'buckets_rewritten': len(affected),
            'rows_written': int(obs.get['n'])}
