"""Bloom pre-split for incremental ingest (operators/bloom.py).

Correctness contract: the Bloom filter moves bytes, never answers —
the final ingested set must be byte-identical with and without the
prefilter; ``definite_new`` must have zero false negatives; the false
positive rate must be near the design point.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.bloom import (
    _MAX_BITMAP_BYTES, bloom_params, bloom_split, build_bloom,
    might_contain_col)


@pytest.fixture(scope='module')
def keys_df(spark):
    return spark.range(0, 10_000).select(
        F.concat(F.lit('key-'), F.col('id')).alias('k'))


def test_no_false_negatives(spark, keys_df):
    bitmap = build_bloom(keys_df, 'k')
    flagged = might_contain_col(keys_df, 'k', bitmap)
    assert flagged.filter(~F.col('__bloom_maybe')).count() == 0


def test_false_positive_rate_near_design(spark, keys_df):
    bitmap = build_bloom(keys_df, 'k')
    others = spark.range(0, 20_000).select(
        F.concat(F.lit('other-'), F.col('id')).alias('k'))
    fp = (might_contain_col(others, 'k', bitmap)
          .filter(F.col('__bloom_maybe')).count())
    # 10k keys × 10 bits/key → next power of two = 131072 bits
    # (13.1 bits/key effective): design fpp ≲ 1%, assert ≤ 3%
    assert fp / 20_000 <= 0.03


def test_split_partitions_the_input(spark, keys_df):
    bitmap = build_bloom(keys_df, 'k')
    mixed = spark.range(5_000, 15_000).select(
        F.concat(F.lit('key-'), F.col('id')).alias('k'))  # half members
    fresh, maybe = bloom_split(mixed, 'k', bitmap)
    n_fresh, n_maybe = fresh.count(), maybe.count()
    assert n_fresh + n_maybe == 10_000
    # every true member (key-5000..key-9999) must land in `maybe`
    members = maybe.filter(F.regexp_extract('k', r'key-(\d+)', 1)
                           .cast('long') < 10_000).count()
    assert members == 5_000
    # fresh side contains only non-members (no false negatives)
    assert fresh.filter(F.regexp_extract('k', r'key-(\d+)', 1)
                        .cast('long') < 10_000).count() == 0


def test_bitmap_deterministic(spark, keys_df):
    assert build_bloom(keys_df, 'k') == build_bloom(
        keys_df.repartition(7), 'k')


def test_params_cap():
    with pytest.raises(ValueError):
        bloom_params(_MAX_BITMAP_BYTES)  # 8 B/bit × 10 bits/key >> cap


def test_incremental_ingest_identical_with_bloom(spark, tmp_path):
    """E2E: bloom-prefiltered incremental ingest produces the exact
    same committed rows as the plain anti-join path."""
    from pdf_ai_mapper_spark import checkpoint as cp
    from pdf_ai_mapper_spark.config import EngineConfig
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_pandas
    from pdf_ai_mapper_spark.pipeline import run_extraction

    cfg = EngineConfig(shuffle_partitions=8, output_buckets=8)
    batch_a = spark.createDataFrame(web_pages_pandas(120, start=0))
    batch_b = spark.createDataFrame(web_pages_pandas(120, start=60))  # 50% overlap

    outs = {}
    for name, bloom in (('plain', False), ('bloom', True)):
        out = str(tmp_path / name)
        run_extraction(spark, batch_a, out, cfg, dedup_against_output=True,
                       bloom_prefilter=bloom)
        stats = run_extraction(spark, batch_b, out, cfg,
                               dedup_against_output=True,
                               bloom_prefilter=bloom)
        assert stats['rows_out'] < 120  # the overlap was pruned
        outs[name] = {tuple(r) for r in cp.read_output(spark, out)
                      .select('url', 'content_hash', 'extracted_text')
                      .collect()}
    assert outs['plain'] == outs['bloom']
    assert len(outs['plain']) > 120


def test_broadcast_handle_rides_and_releases(spark, keys_df):
    from pdf_ai_mapper_spark.operators.bloom import release_blooms
    bitmap = build_bloom(keys_df, 'k')
    fresh, maybe = bloom_split(keys_df, 'k', bitmap)
    assert fresh._bloom_broadcasts is maybe._bloom_broadcasts
    fresh.count(), maybe.count()
    release_blooms(fresh)  # must not raise; executor copies dropped
