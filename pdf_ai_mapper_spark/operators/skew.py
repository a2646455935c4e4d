"""Skew handling: salted aggregation for hot keys (SURVEY.md §4.3).

At web scale a handful of hosts dominate row counts (the fixture bakes
a 20% hot host in deliberately). A plain ``groupBy(host)`` funnels the
hot host into one reducer; salting splits it into S partial groups that
combine map-side, then merges the partials — two small shuffles instead
of one straggler. AQE's skew-join splitting covers the join case; this
helper covers aggregations, which AQE does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of_url(url: Column) -> Column:
    # try_parse_url: under ANSI mode (default-on) parse_url throws on
    # malformed URLs; crawl data always has some — NULL host is the
    # right grouping behavior, not a job abort.
    return F.try_parse_url(url, F.lit('HOST'))


def salted_count(df: DataFrame, key: Column, salt_buckets: int = 16,
                 key_name: str = 'key') -> DataFrame:
    """count(*) per key with a salt pre-aggregation: stage 1 groups on
    (key, salt) — hot keys split across salt_buckets reducers — stage 2
    merges the partials. Equivalent plan to two-level combining."""
    salted = df.select(key.alias(key_name)).withColumn(
        '__salt', F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_buckets)))
    partial = salted.groupBy(key_name, '__salt').agg(F.count('*').alias('__c'))
    return partial.groupBy(key_name).agg(F.sum('__c').cast('long').alias('n'))


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               aggs_partial: Sequence[Column],
               aggs_merge: Sequence[Column],
               salt_buckets: int = 16) -> DataFrame:
    """General two-stage salted aggregation for algebraic aggregates:
    ``aggs_partial`` run per (keys, salt); ``aggs_merge`` combine the
    partials per keys."""
    salted = df.withColumn(
        '__salt', F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, '__salt').agg(*aggs_partial)
    return partial.groupBy(*key_cols).agg(*aggs_merge)
