"""Sequence packing / distributed prefix sum (operators/packing)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.dedup import release
from pdf_ai_mapper_spark.operators.packing import (pack_sequences,
                                                   with_global_offset)


def _rand_df(spark, n=500, parts=7):
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 40)) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, 'doc_id long, toks long').repartition(parts)


def test_global_offset_matches_single_partition_cumsum(spark):
    df = _rand_df(spark)
    got = with_global_offset(df, 'doc_id', 'toks', partitions=5)
    rows = {r['doc_id']: r['offset'] for r in got.collect()}
    release(got)
    data = sorted((r['doc_id'], r['toks']) for r in df.collect())
    run = 0
    for i, t in data:
        assert rows[i] == run, (i, rows[i], run)
        run += t


def test_global_offset_no_single_partition_exchange(spark):
    """The whole point: the naive global-window cumsum funnels the
    corpus through Exchange SinglePartition; the two-phase scan must
    not."""
    df = _rand_df(spark)
    naive = df.withColumn('off', F.sum('toks').over(
        Window.orderBy('doc_id')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert 'SinglePartition' in naive_plan    # the anti-pattern exists

    got = with_global_offset(df, 'doc_id', 'toks', partitions=5)
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    release(got)
    assert 'SinglePartition' not in plan
    assert 'BroadcastHashJoin' in plan        # offsets join broadcasts


def test_pack_sequences_boundary_semantics(spark):
    rows = [(0, 100), (1, 412), (2, 0), (3, 600), (4, 1)]
    df = spark.createDataFrame(rows, 'doc_id long, toks long')
    packed = pack_sequences(df, 'doc_id', 'toks', seq_len=512)
    got = {r['doc_id']: r for r in packed.collect()}
    release(packed)
    # stream: doc0 [0,100) seq0; doc1 [100,512) seq0 exactly to the
    # boundary; doc2 empty; doc3 [512,1112) seqs 1-2; doc4 [1112,1113)
    assert (got[0]['offset'], got[0]['first_seq'], got[0]['last_seq']) == (0, 0, 0)
    assert (got[1]['offset'], got[1]['first_seq'], got[1]['last_seq']) == (100, 0, 0)
    assert got[2]['n_seqs_spanned'] == 0 and got[2]['first_seq'] is None
    assert (got[3]['offset'], got[3]['first_seq'], got[3]['last_seq']) == (512, 1, 2)
    assert got[3]['n_seqs_spanned'] == 2
    assert (got[4]['offset'], got[4]['first_seq']) == (1112, 2)


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest
    df = spark.createDataFrame([(0, 1)], 'doc_id long, toks long')
    with pytest.raises(ValueError):
        pack_sequences(df, 'doc_id', 'toks', seq_len=0)
