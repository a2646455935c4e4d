"""Storage layout (pdf_ai_mapper_spark/layout): bucketed co-located
joins (zero-Exchange plans) and range-clustered file skipping."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdf_ai_mapper_spark.layout import (colocated_join, drop_table,
                                        read_pruned, write_bucketed,
                                        write_clustered)


@pytest.fixture
def tmpdirs():
    ds = []

    def make():
        d = tempfile.mkdtemp(prefix='pam_layout_')
        shutil.rmtree(d)          # writers demand a fresh path
        ds.append(d)
        return d
    yield make
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def _facts(spark, n=2000):
    return spark.range(n).select(
        F.col('id').alias('k'),
        (F.col('id') % 7).alias('v'),
        F.md5(F.col('id').cast('string')).alias('payload'))


def _dims(spark, n=2000):
    return spark.range(n).select(
        F.col('id').alias('k'),
        (F.col('id') % 13).alias('w'))


class TestBucketedJoin:
    def test_join_is_shuffle_free_and_correct(self, spark, tmpdirs):
        lt, rt = 'pam_t_bleft', 'pam_t_bright'
        old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
        try:
            write_bucketed(_facts(spark), lt, tmpdirs(), 'k', 8)
            write_bucketed(_dims(spark), rt, tmpdirs(), 'k', 8)
            # broadcast would hide the co-location — force SMJ
            spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
            joined = colocated_join(spark, lt, rt, 'k')
            rows = joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert 'Exchange' not in plan, plan
            # values identical to a plain (shuffled) join
            expect = {(r['k'], r['v'], r['w'])
                      for r in _facts(spark).join(_dims(spark), 'k')
                      .collect()}
            assert {(r['k'], r['v'], r['w']) for r in rows} == expect
        finally:
            spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)
            drop_table(spark, lt)
            drop_table(spark, rt)

    def test_unbucketed_baseline_shuffles(self, spark):
        """The contrast case: the same join over plain DataFrames
        plans at least one shuffle Exchange once broadcast is off."""
        old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
        try:
            spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
            j = _facts(spark).join(_dims(spark), 'k')
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert 'Exchange' in plan
        finally:
            spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)

    def test_one_file_per_bucket(self, spark, tmpdirs):
        t, d = 'pam_t_onefile', tmpdirs()
        try:
            write_bucketed(_facts(spark, 500), t, d, 'k', 4)
            files = [f for f in os.listdir(d) if f.endswith('.parquet')]
            assert len(files) == 4    # repartition-on-key pre-pass
        finally:
            drop_table(spark, t)

    def test_bad_bucket_count_rejected(self, spark, tmpdirs):
        with pytest.raises(ValueError):
            write_bucketed(_facts(spark, 10), 'pam_t_bad', tmpdirs(),
                           'k', 0)


class TestRangePruning:
    def _clustered(self, spark, make, n=1000, files=10):
        d = make()
        write_clustered(
            spark.range(n).select(F.col('id'),
                                  F.md5(F.col('id').cast('string'))
                                  .alias('payload')),
            d, 'id', files)
        return d

    def test_narrow_range_skips_files_and_matches_full_filter(
            self, spark, tmpdirs):
        d = self._clustered(spark, tmpdirs)
        got = read_pruned(spark, d, 'id', 150, 249)
        read, total = got._pruned_files
        assert total == 10
        assert read <= 3          # contiguous ranges: ~1-2 files + edge
        vals = sorted(r['id'] for r in got.collect())
        assert vals == list(range(150, 250))

    def test_bounds_are_inclusive(self, spark, tmpdirs):
        d = self._clustered(spark, tmpdirs, n=100, files=4)
        vals = sorted(r['id'] for r in
                      read_pruned(spark, d, 'id', 25, 25).collect())
        assert vals == [25]

    def test_empty_range_reads_zero_files(self, spark, tmpdirs):
        d = self._clustered(spark, tmpdirs, n=100, files=4)
        got = read_pruned(spark, d, 'id', 1000, 2000)
        assert got._pruned_files == (0, 4)
        assert got.count() == 0

    def test_wide_range_reads_everything(self, spark, tmpdirs):
        d = self._clustered(spark, tmpdirs, n=100, files=4)
        got = read_pruned(spark, d, 'id', 0, 99)
        assert got._pruned_files == (4, 4)
        assert got.count() == 100

    def test_sidecar_hidden_from_plain_reads(self, spark, tmpdirs):
        """_cluster_stats must be invisible to a normal scan of the
        table path (underscore-prefixed, like _checkpoints)."""
        d = self._clustered(spark, tmpdirs, n=100, files=4)
        df = spark.read.parquet(d)
        assert df.count() == 100
        assert set(df.columns) == {'id', 'payload'}
