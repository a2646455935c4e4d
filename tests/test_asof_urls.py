"""as-of join + URL canonicalization operators (round 3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import pytest

from pdf_ai_mapper_spark.operators.asof import asof_join
from pdf_ai_mapper_spark.operators.urls import with_canonical_url


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.mark.parametrize('strategy', ['inline', 'narrow'])
def test_asof_join_backward_inclusive_semantics(spark, strategy):
    left = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(5)), (3, _ts(9)), (4, _ts(12)), (5, _ts(3))],
        'event_id long, ts timestamp').withColumn('user_id', F.lit(7))
    right = spark.createDataFrame(
        [(7, _ts(5), 50.0), (7, _ts(10), 100.0), (8, _ts(0), 9.0)],
        'user_id long, cp_ts timestamp, cp_value double')
    got = {r['event_id']: r['cp_value'] for r in
           asof_join(left, right, on='user_id',
                     left_ts='ts', right_ts='cp_ts',
                     strategy=strategy).collect()}
    assert got[1] is None          # before any checkpoint
    assert got[5] is None
    assert got[2] == 50.0          # inclusive: cp at ts == left ts matches
    assert got[3] == 50.0          # latest at-or-before, not nearest
    assert got[4] == 100.0
    # key isolation: user 8's checkpoint never leaks to user 7
    assert all(v in (None, 50.0, 100.0) for v in got.values())


@pytest.mark.parametrize('strategy', ['inline', 'narrow'])
def test_asof_join_matches_brute_force(spark, strategy):
    import random
    rng = random.Random(42)
    left = [(i, rng.randint(0, 4), _ts(rng.randint(0, 23), rng.randint(0, 59)))
            for i in range(200)]
    right = {}
    for _ in range(60):
        right[(rng.randint(0, 4), _ts(rng.randint(0, 23), rng.randint(0, 59)))] = \
            round(rng.random() * 100, 3)
    ldf = spark.createDataFrame(left, 'event_id long, k long, ts timestamp')
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right.items()],
        'k long, rts timestamp, payload double')
    got = {r['event_id']: r['payload'] for r in
           asof_join(ldf, rdf, on='k', left_ts='ts', right_ts='rts',
                     strategy=strategy).collect()}
    for eid, k, t in left:
        cands = [(rt, v) for (rk, rt), v in right.items()
                 if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, k, t)


@pytest.mark.parametrize('strategy', ['inline', 'narrow'])
def test_asof_join_null_payload_from_latest_row(spark, strategy):
    """A right row whose payload value is legitimately NULL must still
    win over older non-null rows, and multi-column payloads must all
    come from the SAME (latest) right row — DuckDB ASOF semantics
    (ADVICE r3: per-column last(ignorenulls) mixed rows)."""
    left = spark.createDataFrame(
        [(1, _ts(12))], 'event_id long, ts timestamp'
    ).withColumn('k', F.lit(1))
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0, 'old'),
         (1, _ts(10), None, 'new')],   # latest row: value NULL, tag set
        'k long, rts timestamp, cp_value double, tag string')
    row = asof_join(left, right, on='k', left_ts='ts', right_ts='rts',
                    strategy=strategy).collect()[0]
    # both payload columns from the ts=10 row: NULL value, 'new' tag —
    # NOT the per-column mix (50.0, 'new')
    assert row['cp_value'] is None
    assert row['tag'] == 'new'


@pytest.mark.parametrize('strategy', ['inline', 'narrow'])
def test_asof_join_no_match_still_all_null(spark, strategy):
    left = spark.createDataFrame(
        [(1, _ts(1))], 'event_id long, ts timestamp'
    ).withColumn('k', F.lit(1))
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0, 'x')],
        'k long, rts timestamp, cp_value double, tag string')
    row = asof_join(left, right, on='k', left_ts='ts', right_ts='rts',
                    strategy=strategy).collect()[0]
    assert row['cp_value'] is None and row['tag'] is None


def test_asof_join_rejects_payload_collision(spark):
    import pytest
    l = spark.createDataFrame([(1, _ts(1), 0.0)], 'k long, ts timestamp, p double')
    r = spark.createDataFrame([(1, _ts(0), 1.0)], 'k long, rts timestamp, p double')
    with pytest.raises(ValueError, match='collide'):
        asof_join(l, r, on='k', left_ts='ts', right_ts='rts')


def test_canonical_url_rules(spark):
    cases = [
        # (input, canonical, host, domain)
        ('https://www.Example.COM:443/a/b/?utm_source=x#frag',
         'https://example.com/a/b', 'example.com', 'example.com'),
        ('http://site.org:80/p', 'http://site.org/p', 'site.org', 'site.org'),
        ('https://a.b.test.net/x?a=1&utm_medium=m&b=2',
         'https://a.b.test.net/x?a=1&b=2', 'a.b.test.net', 'test.net'),
        ('https://host.com/', 'https://host.com/', 'host.com', 'host.com'),
        ('https://host.com/x?gclid=123', 'https://host.com/x',
         'host.com', 'host.com'),
        ('https://host.com:8443/x', 'https://host.com:8443/x',
         'host.com', 'host.com'),  # non-default port kept
        ('HTTPS://HOST.COM/UPPER/Path', 'https://host.com/UPPER/Path',
         'host.com', 'host.com'),  # path case preserved
    ]
    df = spark.createDataFrame([(i, u) for i, (u, *_ ) in enumerate(cases)],
                               'id long, url string')
    got = {r['id']: r for r in with_canonical_url(df).collect()}
    for i, (u, canon, host, domain) in enumerate(cases):
        assert got[i]['canonical_url'] == canon, (u, got[i]['canonical_url'])
        assert got[i]['host'] == host, (u, got[i]['host'])
        assert got[i]['domain'] == domain, (u, got[i]['domain'])


class TestCrawlDelta:
    """crawl_delta (round 7): per-url snapshot diff from content md5s.
    The q_crawl_delta oracle value-checks the whole corpus-scale
    construction; these pin the row-level contract and the plan shape
    (payloads must hash in-row, never ride the join exchange)."""

    def _delta(self, spark, old_rows, new_rows):
        from pdf_ai_mapper_spark.operators.urls import crawl_delta
        old = spark.createDataFrame(old_rows, 'url string, text string')
        new = spark.createDataFrame(new_rows, 'url string, text string')
        return {r['url']: r['status']
                for r in crawl_delta(old, new).collect()}

    def test_all_four_statuses(self, spark):
        got = self._delta(
            spark,
            [('u1', 'same'), ('u2', 'old text'), ('u3', 'goes away')],
            [('u1', 'same'), ('u2', 'new text'), ('u4', 'brand new')])
        assert got == {'u1': 'unchanged', 'u2': 'changed',
                       'u3': 'removed', 'u4': 'added'}

    def test_empty_sides(self, spark):
        assert self._delta(spark, [], [('u', 't')]) == {'u': 'added'}
        assert self._delta(spark, [('u', 't')], []) == {'u': 'removed'}

    def test_payload_never_rides_the_exchange(self, spark):
        from pdf_ai_mapper_spark.operators.urls import crawl_delta
        old = spark.createDataFrame([('u', 'x')], 'url string, text string')
        new = spark.createDataFrame([('u', 'x')], 'url string, text string')
        plan = (crawl_delta(old, new)
                ._jdf.queryExecution().executedPlan().toString())
        for line in plan.splitlines():
            if 'Exchange' in line:
                assert 'text#' not in line  # only (url, md5) shuffles
