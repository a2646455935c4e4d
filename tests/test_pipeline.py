"""Checkpoint/resume semantics of run_extraction (SURVEY.md §4.3)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdf_ai_mapper_spark import checkpoint as cp
from pdf_ai_mapper_spark.config import EngineConfig
from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
from pdf_ai_mapper_spark.pipeline import run_extraction

CFG = EngineConfig(shuffle_partitions=8, output_buckets=8)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix='pam_test_out_')
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_run_then_resume_is_idempotent(spark, outdir):
    pages = web_pages_df(spark, 120, num_partitions=4)
    s1 = run_extraction(spark, pages, outdir, CFG)
    assert s1['rows_in'] == 120 and s1['rows_out'] == 120
    assert s1['buckets'] == CFG.output_buckets

    n1 = cp.read_output(spark, outdir).count()
    s2 = run_extraction(spark, pages, outdir, CFG)
    assert s2['rows_out'] == 0 and s2['buckets'] == 0
    assert s2['resumed_skipped_buckets'] == CFG.output_buckets
    assert cp.read_output(spark, outdir).count() == n1


def test_partial_run_resumes_remaining_buckets(spark, outdir):
    """Simulate a crash after some buckets committed: drop half the
    checkpoint entries, rerun, and expect exactly the missing buckets
    to be (re)processed with no duplicated output rows."""
    pages = web_pages_df(spark, 120, num_partitions=4)
    run_extraction(spark, pages, outdir, CFG)

    # forge a partial checkpoint table: keep only buckets < 4
    cps = spark.read.parquet(cp.checkpoint_path(outdir))
    kept = cps.filter(F.col('bucket') < 4)
    kept_pd = kept.toPandas()
    shutil.rmtree(cp.checkpoint_path(outdir))
    spark.createDataFrame(kept_pd).write.parquet(cp.checkpoint_path(outdir))

    s = run_extraction(spark, pages, outdir, CFG)
    assert s['resumed_skipped_buckets'] == 4
    assert s['buckets'] == CFG.output_buckets - 4

    out = cp.read_output(spark, outdir)
    assert out.count() == 120                        # no dup rows
    assert out.select('url').distinct().count() == 120


def test_lineage_counters_sum_to_input(spark, outdir):
    pages = web_pages_df(spark, 90, num_partitions=4)
    run_extraction(spark, pages, outdir, CFG)
    cps = spark.read.parquet(cp.checkpoint_path(outdir))
    agg = cps.agg(F.sum('rows_in').alias('i'), F.sum('rows_out').alias('o'),
                  F.sum('error_rows').alias('e')).collect()[0]
    assert agg['i'] == 90 and agg['o'] == 90 and agg['e'] == 0


def test_dedup_against_output_anti_join(spark, outdir):
    """J1 at the pipeline level (incremental mode): a second batch whose
    rows' content_hash is already committed gets anti-joined away; only
    genuinely new rows append, and retries are idempotent."""
    run_extraction(spark, web_pages_df(spark, 60, num_partitions=4),
                   outdir, CFG, dedup_against_output=True)
    n1 = cp.read_output(spark, outdir).count()
    assert n1 == 60

    # second batch: rows 0-59 repeated + rows 60-89 new
    s = run_extraction(spark, web_pages_df(spark, 90, num_partitions=4),
                       outdir, CFG, dedup_against_output=True)
    out = cp.read_output(spark, outdir)
    assert s['rows_in'] == 30          # only the 30 genuinely new rows
    assert out.count() == 90
    assert out.groupBy('url').count().filter('count > 1').count() == 0

    # retry of the same batch (simulated crash-recovery) → no-op
    s2 = run_extraction(spark, web_pages_df(spark, 90, num_partitions=4),
                        outdir, CFG, dedup_against_output=True)
    assert s2['rows_in'] == 0
    assert cp.read_output(spark, outdir).count() == 90


def test_corrupt_checkpoint_table_surfaces(spark, outdir):
    """A broken _checkpoints table must raise, not silently disable
    resume (checkpoint.committed_buckets narrows its catch to the
    missing-path error only)."""
    import os
    import pytest

    os.makedirs(cp.checkpoint_path(outdir), exist_ok=True)
    with open(os.path.join(cp.checkpoint_path(outdir), 'part-0.parquet'), 'wb') as f:
        f.write(b'this is not parquet')
    # corrupt footers raise a SparkException (not the missing-path
    # AnalysisException) — committed_buckets must let it propagate
    with pytest.raises(Exception, match='[Pp]arquet|Job aborted'):
        cp.committed_buckets(spark, outdir)


def test_compact_output_preserves_rows_and_reduces_files(spark, outdir):
    """Three incremental append runs fragment the buckets; compaction
    rewrites to ~1 file per bucket with identical rows, and resume
    semantics survive (lineage table untouched)."""
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_pandas
    for start in (0, 100, 200):
        batch = spark.createDataFrame(web_pages_pandas(40, start=start))
        run_extraction(spark, batch, outdir, CFG, dedup_against_output=True)

    before = cp.read_output(spark, outdir)
    rows_before = sorted(r['url'] for r in before.select('url').collect())
    files_before = len(before.inputFiles())

    stats = cp.compact_output(spark, outdir)
    assert stats['rows'] == len(rows_before) == 120
    assert stats['files_after'] < files_before
    assert stats['files_after'] <= CFG.output_buckets

    after = cp.read_output(spark, outdir)
    assert sorted(r['url'] for r in after.select('url').collect()) == rows_before
    # retry of already-ingested batch is still a no-op after compaction
    batch = spark.createDataFrame(web_pages_pandas(40, start=0))
    s = run_extraction(spark, batch, outdir, CFG, dedup_against_output=True)
    assert s['rows_in'] == 0
    assert cp.read_output(spark, outdir).count() == 120


def test_swap_survives_stale_old_dir_and_crashed_window(spark, outdir):
    """Crash-safety of the rename swap (ADVICE r2): a stale
    '.compact_old' left by an interrupted run must not break the next
    compaction, and a crash BETWEEN the two renames (data moved aside,
    tmp not yet promoted) must be recoverable by readers."""
    import os
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_pandas
    batch = spark.createDataFrame(web_pages_pandas(30, start=0))
    run_extraction(spark, batch, outdir, CFG, dedup_against_output=True)
    data = cp.data_path(outdir)
    n = cp.read_output(spark, outdir).count()

    # 1. stale old dir from a previously interrupted swap
    os.makedirs(data + '.compact_old/junk', exist_ok=True)
    stats = cp.compact_output(spark, outdir)
    assert stats['rows'] == n
    assert not os.path.exists(data + '.compact_old')

    # 2. crash between the renames: data gone, old present
    os.rename(data, data + '.compact_old')
    assert cp.read_output(spark, outdir).count() == n  # recovered
    assert os.path.exists(data)


def test_crash_between_data_and_checkpoint_append_reconciles(
        spark, outdir, monkeypatch):
    """Exactly-once counters for the incremental path (VERDICT r3 #6):
    kill the run between the parquet append and append_checkpoints,
    then verify the next run's startup reconcile rebuilds the missing
    lineage entries from the intent marker + the committed rows."""
    run_extraction(spark, web_pages_df(spark, 60, num_partitions=4),
                   outdir, CFG, dedup_against_output=True)

    # crash injection: the data append succeeds, the checkpoint append
    # dies (matches a driver kill in the gap)
    real_append = cp.append_checkpoints

    def dying_append(*a, **kw):
        raise RuntimeError('injected crash before checkpoint append')

    monkeypatch.setattr('pdf_ai_mapper_spark.pipeline.cp.append_checkpoints',
                        dying_append)
    with pytest.raises(RuntimeError, match='injected crash'):
        run_extraction(spark, web_pages_df(spark, 90, num_partitions=4),
                       outdir, CFG, dedup_against_output=True,
                       run_id='crashedrun01')
    monkeypatch.setattr('pdf_ai_mapper_spark.pipeline.cp.append_checkpoints',
                        real_append)

    # rows committed, counters missing, marker pending
    assert cp.read_output(spark, outdir).count() == 90
    cps = spark.read.parquet(cp.checkpoint_path(outdir))
    assert cps.filter(F.col('run_id') == 'crashedrun01').count() == 0
    assert [i['run_id'] for i in cp.pending_intents(outdir)] == ['crashedrun01']

    # next run (empty batch) triggers reconcile at startup
    s = run_extraction(spark, web_pages_df(spark, 90, num_partitions=4),
                       outdir, CFG, dedup_against_output=True)
    assert s['rows_in'] == 0
    assert cp.pending_intents(outdir) == []
    cps = spark.read.parquet(cp.checkpoint_path(outdir))
    crashed = cps.filter(F.col('run_id') == 'crashedrun01')
    agg = crashed.agg(F.sum('rows_in').alias('i'),
                      F.sum('rows_out').alias('o')).collect()[0]
    assert agg['i'] == 30 and agg['o'] == 30   # the 30 new rows, exact
    # global invariant restored: counters sum to committed rows
    total = cps.agg(F.sum('rows_out').alias('o')).collect()[0]['o']
    assert total == 90


def test_intent_marker_cleared_on_clean_run(spark, outdir):
    run_extraction(spark, web_pages_df(spark, 30, num_partitions=2),
                   outdir, CFG, dedup_against_output=True)
    assert cp.pending_intents(outdir) == []


def test_reconcile_idempotent_when_entries_exist(spark, outdir):
    """Crash AFTER append_checkpoints but before clear_intent: the
    marker is stale; reconcile must clear it without duplicating
    entries."""
    run_extraction(spark, web_pages_df(spark, 30, num_partitions=2),
                   outdir, CFG, dedup_against_output=True, run_id='rid0')
    cp.write_intent(outdir, 'rid0', {0: 30})   # stale marker
    assert cp.reconcile_intents(spark, outdir) == 0
    assert cp.pending_intents(outdir) == []
    cps = spark.read.parquet(cp.checkpoint_path(outdir))
    assert cps.agg(F.sum('rows_out').alias('o')).collect()[0]['o'] == 30


def _write_store(spark, outdir, rows, n_buckets=8):
    df = (spark.createDataFrame(rows, 'url string, crawl_ts long, body string')
          .withColumn('bucket', F.pmod(F.xxhash64(F.col('url')),
                                       F.lit(n_buckets)).cast('int')))
    df.write.partitionBy('bucket').parquet(cp.data_path(outdir))
    return df


def _listing(outdir):
    import os
    data = cp.data_path(outdir)
    out = {}
    for d in os.listdir(data):
        if d.startswith('bucket='):
            p = os.path.join(data, d)
            out[d] = sorted((f, os.path.getsize(os.path.join(p, f)),
                             os.path.getmtime(os.path.join(p, f)))
                            for f in os.listdir(p) if f.endswith('.parquet'))
    return out


def test_upsert_keep_latest_semantics(spark, outdir):
    rows = [(f'u{i}', 100, f'old{i}') for i in range(40)]
    _write_store(spark, outdir, rows)
    batch = spark.createDataFrame(
        [('u0', 200, 'newer'),        # newer ts -> replaces
         ('u1', 50, 'stale'),         # older ts -> stored survives
         ('u2', 100, 'tie-batch'),    # tie -> batch wins (refresh)
         ('brand-new', 150, 'insert')],
        'url string, crawl_ts long, body string')
    stats = cp.upsert_output(spark, outdir, batch, key_col='url',
                             order_col='crawl_ts', n_buckets=8)
    got = {r['url']: (r['crawl_ts'], r['body'])
           for r in cp.read_output(spark, outdir).collect()}
    assert len(got) == 41
    assert got['u0'] == (200, 'newer')
    assert got['u1'] == (100, 'old1')
    assert got['u2'] == (100, 'tie-batch')
    assert got['brand-new'] == (150, 'insert')
    assert got['u5'] == (100, 'old5')
    assert stats['buckets_rewritten'] >= 1
    assert stats['rows_written'] >= 4


def test_upsert_rewrites_only_affected_buckets(spark, outdir):
    rows = [(f'u{i}', 100, f'old{i}') for i in range(60)]
    _write_store(spark, outdir, rows)
    before = _listing(outdir)
    batch = spark.createDataFrame([('u0', 200, 'newer')],
                                  'url string, crawl_ts long, body string')
    stats = cp.upsert_output(spark, outdir, batch, key_col='url',
                             order_col='crawl_ts', n_buckets=8)
    assert stats['buckets_rewritten'] == 1
    after = _listing(outdir)
    from pyspark.sql import functions as SF
    hot = 'bucket=%d' % (spark.createDataFrame([('u0',)], 'url string')
                         .select(SF.pmod(SF.xxhash64('url'), SF.lit(8))
                                 .cast('int').alias('b'))
                         .collect()[0]['b'])
    assert set(before) == set(after)
    for d in before:
        if d == hot:
            assert before[d] != after[d]      # rewritten
        else:
            assert before[d] == after[d]      # untouched bytes


def test_upsert_crash_before_intent_leaves_store_untouched(spark, outdir):
    """ADVICE r5 #3: the r5 in-place dynamic overwrite could LOSE
    affected buckets on a mid-commit failure. Now the merge writes to
    a sibling tmp; a crash before the intent publishes must leave the
    stored table byte-identical and the stray tmp discarded on read."""
    import os
    _write_store(spark, outdir, [(f'u{i}', 100, f'old{i}')
                                 for i in range(40)])
    before = _listing(outdir)
    tmp = cp.data_path(outdir) + '.upsert_tmp'
    os.makedirs(os.path.join(tmp, 'bucket=0'))
    with open(os.path.join(tmp, 'bucket=0', 'part-junk.parquet'), 'w') as f:
        f.write('torn')
    got = cp.read_output(spark, outdir)
    assert got.count() == 40
    assert not os.path.exists(tmp)           # stray tmp discarded
    assert _listing(outdir) == before        # untouched bytes


def test_upsert_crash_after_intent_rolls_forward(spark, outdir, monkeypatch):
    """Crash between the intent publish and promotion: the merge write
    completed, so recovery must roll FORWARD — readers see the merged
    table, never a missing bucket."""
    import os
    _write_store(spark, outdir, [(f'u{i}', 100, f'old{i}')
                                 for i in range(40)])
    batch = spark.createDataFrame(
        [('u0', 200, 'newer'), ('brand-new', 150, 'insert')],
        'url string, crawl_ts long, body string')
    # simulate the crash: merge write + intent land, promotion never runs
    monkeypatch.setattr(cp, '_promote_upsert', lambda *a, **k: None)
    cp.upsert_output(spark, outdir, batch, key_col='url',
                     order_col='crawl_ts', n_buckets=8)
    monkeypatch.undo()
    _tmp, _old, intent = cp._upsert_paths(cp.data_path(outdir))
    assert os.path.exists(intent)
    got = {r['url']: (r['crawl_ts'], r['body'])
           for r in cp.read_output(spark, outdir).collect()}
    assert len(got) == 41
    assert got['u0'] == (200, 'newer')
    assert got['brand-new'] == (150, 'insert')
    assert got['u5'] == (100, 'old5')
    assert not os.path.exists(intent)        # recovery cleaned up
    # promotion is idempotent: a second recovery pass is a no-op
    cp.recover_upsert(cp.data_path(outdir))
    assert cp.read_output(spark, outdir).count() == 41


def test_upsert_empty_batch_is_noop(spark, outdir):
    _write_store(spark, outdir, [('u0', 100, 'x')])
    before = _listing(outdir)
    empty = spark.createDataFrame([], 'url string, crawl_ts long, body string')
    stats = cp.upsert_output(spark, outdir, empty, key_col='url',
                             order_col='crawl_ts', n_buckets=8)
    assert stats == {'buckets_rewritten': 0, 'rows_written': 0}
    assert _listing(outdir) == before
