"""DSIR importance resampling (operators/dsir): determinism,
derandomized-Gumbel exactness vs hashlib, target-distribution pull,
and the broadcast / payload-free plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.dsir import (
    dsir_log_ratio, dsir_select)

SF = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def docs(spark):
    return spark.read.parquet(f'{SF}/documents.parquet')


@pytest.fixture(scope='module')
def split(docs):
    tgt = docs.filter((F.col('lang') == 'en') & (F.col('doc_id') % 5 == 0))
    raw = docs.join(tgt.select('doc_id'), 'doc_id', 'left_anti')
    return raw, tgt


def test_select_repartition_invariant(split):
    raw, tgt = split
    a = [tuple(r) for r in dsir_select(raw, tgt, 25).collect()]
    b = [tuple(r) for r in
         dsir_select(raw.repartition(13), tgt, 25).collect()]
    assert a == b and len(a) == 25


def test_gumbel_key_matches_hashlib(split):
    """gumbel_key - logw must equal -ln(-ln u) with u rebuilt from
    md5(seed|id) in pure Python — pins the derandomization contract."""
    raw, tgt = split
    rows = (dsir_log_ratio(raw, tgt)
            .join(dsir_select(raw, tgt, 10), ['doc_id', 'n_feats',
                                              'dsir_logw'])
            .collect())
    assert len(rows) == 10
    for r in rows:
        h = hashlib.md5(f'dsir|{r.doc_id}'.encode()).hexdigest()[:6]
        u = (int(h, 16) + 0.5) / 16 ** 6
        g = -math.log(-math.log(u))
        assert r.gumbel_key == pytest.approx(r['__logw_raw'] + g,
                                             abs=1.5e-6)


def test_weights_pull_toward_target_distribution(spark):
    """Raw docs drawn from the target's vocabulary must out-score docs
    from a disjoint vocabulary — the defining DSIR property.  (The
    testdata fixture can't witness this: its `lang` column is a label
    over ONE shared vocabulary, so a purpose-built corpus is used.)"""
    sci = 'theorem lemma proof integral manifold tensor spectrum'.split()
    web = 'click buy cheap deal offer shop sale'.split()
    rows = []
    for i in range(8):          # target: science-flavored sample
        rows.append((100 + i, ' '.join(sci[i % 3:] + sci[:i % 3]), 'tgt'))
    for i in range(6):          # raw: half science, half webspam
        rows.append((i, ' '.join(sci[i % 2:] + sci[:i % 2]), 'raw_sci'))
        rows.append((50 + i, ' '.join(web[i % 2:] + web[:i % 2]), 'raw_web'))
    df = spark.createDataFrame(rows, 'doc_id long, text string, role string')
    w = (dsir_log_ratio(df.filter(F.col('role') != 'tgt'),
                        df.filter(F.col('role') == 'tgt'))
         .join(df.select('doc_id', 'role'), 'doc_id')
         .groupBy('role')
         .agg(F.avg(F.col('dsir_logw') / F.col('n_feats')).alias('m'))
         .collect())
    means = {r.role: r.m for r in w}
    assert means['raw_sci'] > means['raw_web'] + 1.0, means


def test_k_overshoot_returns_all_scored_docs(split):
    raw, tgt = split
    n = dsir_log_ratio(raw, tgt).count()
    assert dsir_select(raw, tgt, 10 ** 6).count() == n


def test_plan_lambda_join_broadcast_and_text_free(split):
    """The bucket-ratio table must broadcast (raw corpus scored in one
    map-side pass) and the document text must never enter an
    Exchange — only narrow (id, bucket) rows shuffle."""
    raw, tgt = split
    plan = dsir_log_ratio(raw, tgt)._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastHashJoin' in plan
    for line in plan.splitlines():
        if 'Exchange' in line:
            assert 'text#' not in line, line
