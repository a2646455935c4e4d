"""Multimodal column plumbing + streaming ingestion."""

from __future__ import annotations

import shutil
import struct
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_ai_mapper_spark import checkpoint as cp
from pdf_ai_mapper_spark.config import EngineConfig
from pdf_ai_mapper_spark.fixtures.webpages import build_png, web_pages_pandas
from pdf_ai_mapper_spark.operators.multimodal import (audio_metadata,
                                                      image_embeddings,
                                                      image_metadata,
                                                      video_sampled_frames)
from pdf_ai_mapper_spark.streaming import ingest_stream

CFG = EngineConfig(shuffle_partitions=4, output_buckets=8)


def _wav(rate=16000, channels=1, seconds=0.5):
    n = int(rate * seconds) * 2 * channels
    hdr = (b'RIFF' + struct.pack('<I', 36 + n) + b'WAVE'
           + b'fmt ' + struct.pack('<IHHIIHH', 16, 1, channels, rate,
                                   rate * 2 * channels, 2 * channels, 16)
           + b'data' + struct.pack('<I', n))
    return hdr + b'\x00' * n


def _video(frames):
    out = b''
    for fdata in frames:
        out += struct.pack('>I', len(fdata)) + fdata
    return out


def test_image_metadata_and_errors(spark):
    rows = [(0, build_png('a')), (1, build_png('b')), (2, b'not a png'), (3, None)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=['id', 'payload']))
    got = {r['id']: r for r in image_metadata(df).collect()}
    assert got[0]['width'] == 1 and got[0]['height'] == 1
    assert got[0]['decode_error'] is None
    assert got[2]['decode_error'] is not None
    assert got[3]['decode_error'] is not None
    assert len(got) == 4


def test_image_embeddings_deterministic(spark):
    rows = [(0, build_png('a')), (1, build_png('b')), (2, build_png('a'))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=['id', 'payload']))
    got = {r['id']: list(r['embedding']) for r in image_embeddings(df).collect()}
    assert got[0] == got[2]          # identical payload → identical features
    assert got[0] != got[1]
    assert len(got[0]) == 8
    assert abs(sum(x * x for x in got[0]) - 1.0) < 1e-6


def test_audio_metadata(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, _wav()), (1, b'garbage')], columns=['id', 'payload']))
    got = {r['id']: r for r in audio_metadata(df).collect()}
    assert got[0]['sample_rate'] == 16000 and got[0]['channels'] == 1
    assert abs(got[0]['duration_s'] - 0.5) < 0.01
    assert got[1]['decode_error'] is not None


def test_video_frame_sampling(spark):
    frames = [f'frame{i}'.encode() for i in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame([(0, _video(frames))], columns=['id', 'payload']))
    got = video_sampled_frames(df, every_n=3).collect()
    assert [bytes(r['frame']) for r in got] == [b'frame0', b'frame3', b'frame6', b'frame9']
    assert [r['frame_idx'] for r in got] == [0, 1, 2, 3]


def test_streaming_ingest_availablenow(spark):
    indir = tempfile.mkdtemp(prefix='pam_stream_in_')
    outdir = tempfile.mkdtemp(prefix='pam_stream_out_')
    try:
        pdf = web_pages_pandas(60)
        spark.createDataFrame(pdf).repartition(3).write.mode('overwrite').parquet(indir)

        ingest_stream(spark, indir, outdir, CFG)
        out = cp.read_output(spark, outdir)
        assert out.count() == 60
        assert out.filter('is_error').count() == 0

        # restart with no new files → no new rows (offsets checkpointed)
        ingest_stream(spark, indir, outdir, CFG)
        assert cp.read_output(spark, outdir).count() == 60

        # new files arrive → only they are processed
        pdf2 = web_pages_pandas(12, start=100)
        spark.createDataFrame(pdf2).coalesce(1).write.mode('append').parquet(indir)
        ingest_stream(spark, indir, outdir, CFG)
        assert cp.read_output(spark, outdir).count() == 72
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def test_windowed_host_counts_with_watermark(spark):
    from pdf_ai_mapper_spark.streaming import windowed_host_counts
    indir = tempfile.mkdtemp(prefix='pam_win_in_')
    outdir = tempfile.mkdtemp(prefix='pam_win_out_')
    try:
        # 600 rows span ~2.8h of event time (17s cadence)
        pdf = web_pages_pandas(600)
        spark.createDataFrame(pdf).repartition(4).write.mode('overwrite').parquet(indir)
        windowed_host_counts(spark, indir, outdir,
                             window='30 minutes', watermark='10 minutes',
                             hot_threshold=15)
        out = spark.read.parquet(f'{outdir}/host_counts')
        rows = out.collect()
        # append mode emits only watermark-finalized windows — the
        # early windows must be present, the final one may be withheld
        assert len(rows) > 0
        assert all(r['n_pages'] > 0 for r in rows)
        hot = [r for r in rows if r['host'] == 'host0.example.com']
        assert hot, 'hot host must appear in finalized windows'
        # the fixture's deliberate 20% hot host crosses the flag
        # threshold; the long tail must not
        assert any(r['is_hot'] for r in hot)
        assert not any(r['is_hot'] for r in rows
                       if r['host'] != 'host0.example.com')
        # no window may exceed the total row count
        assert all(r['n_pages'] <= 600 for r in rows)
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def test_status_projection(spark):
    from pdf_ai_mapper_spark.pipeline import transform, with_status
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
    from pdf_ai_mapper_spark.config import EngineConfig
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = EngineConfig(shuffle_partitions=4)
    out = transform(web_pages_df(spark, 24, 2), 't', cfg)
    st1 = with_status(out)
    assert {r['status'] for r in st1.select('status').distinct().collect()} == {'processing'}

    cats = out.withColumn('categories', F.array(F.lit('Topic: x')))
    st2 = with_status(cats)
    assert {r['status'] for r in st2.select('status').distinct().collect()} == {'processed'}

    err = spark.createDataFrame(pd.DataFrame(
        {'url': ['u'], 'is_error': [True],
         'categories': [['Topic: x']]}))
    assert with_status(err).collect()[0]['status'] == 'error'


def test_stateful_sessionization(spark):
    from pdf_ai_mapper_spark.streaming import sessionize_events
    import pandas as pd
    indir = tempfile.mkdtemp(prefix='pam_sess_in_')
    outdir = tempfile.mkdtemp(prefix='pam_sess_out_')
    try:
        events = spark.read.parquet('/root/testdata/sf0.001/events.parquet')
        events.write.mode('overwrite').parquet(indir)
        sessionize_events(spark, indir, outdir, gap_seconds=1800)
        got = spark.read.parquet(f'{outdir}/sessions').toPandas()

        # brute-force expected sessions (all but each user's open last one)
        pdf = events.toPandas().sort_values(['user_id', 'ts'])
        expected = []
        for uid, g in pdf.groupby('user_id'):
            ts = list(g['ts'])
            start = last = ts[0]; n = 1
            for t in ts[1:]:
                if (t - last).total_seconds() > 1800:
                    expected.append((uid, start, last, n))
                    start = last = t; n = 1
                else:
                    last = t; n += 1
            # final session stays in state (never emitted with NoTimeout)
        want = sorted(expected)
        have = sorted(got[['user_id', 'session_start', 'session_end',
                           'n_events']].itertuples(index=False, name=None))
        assert have == want, f'{len(have)} vs {len(want)}'
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def test_batch_sink_retry_is_idempotent(spark):
    """A foreachBatch micro-batch retried after a crash between job
    commit and stream-checkpoint commit must not duplicate rows: the
    sink overwrites its own run_id=stream-{batch_id} partitions."""
    import tempfile
    import shutil
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
    from pdf_ai_mapper_spark.streaming import batch_sink

    outdir = tempfile.mkdtemp(prefix='pam_sink_')
    try:
        sink = batch_sink(outdir, CFG)
        batch = web_pages_df(spark, 30)
        sink(batch, 0)
        n1 = cp.read_output(spark, outdir).count()
        sink(batch, 0)  # simulated retry of the same batch_id
        assert cp.read_output(spark, outdir).count() == n1 == 30
        batch2 = spark.createDataFrame(web_pages_pandas(10, start=100))
        sink(batch2, 1)  # next batch adds its own partitions
        out = cp.read_output(spark, outdir)
        assert out.count() == 40
        assert out.select('run_id').distinct().count() == 2
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
