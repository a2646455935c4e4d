"""Search operators (F4-F8, W1-W3, J2-J3) — the reference's query path
(``search_engine.py:39-145``) as one lazy DataFrame program.

Stage order is hand-pinned (Catalyst cannot reorder around opaque
UDFs — SURVEY.md §4.1): category filter → dedup rank → relevance UDF →
score>0 filter → top-k → snippet UDF (on the k winners ONLY — ranking
never reads the snippet, so deferring it is result-identical and costs
k computations instead of one per matching document).
``orderBy(desc).limit(k)`` plans as TakeOrderedAndProject — true
distributed top-k, no global sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from ..config import DEFAULT_CONFIG
from ..kernels.query import is_valid_query, preprocess_query
from ..kernels.relevance import generate_snippet, relevance_score
from .dedup import with_dup_rank


def _relevance_udf(tokens: list[str]):
    """Relevance (W1) as an Arrow pandas UDF; tokens are captured in the
    closure (tiny — a handful of strings), shipped once per task."""
    toks = list(tokens)

    @pandas_udf(LongType())
    def rel(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series([relevance_score(toks, t or '') for t in texts],
                            dtype='int64')
    return rel


def _snippet_udf(tokens: list[str], length: int, stride: int):
    toks = list(tokens)

    @pandas_udf(StringType())
    def snip(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series([generate_snippet(toks, t or '', length, stride)
                             for t in texts], dtype='object')
    return snip


def category_filter(df: DataFrame, categories: list[str] | None,
                    cat_col: str = 'categories') -> DataFrame:
    """F4: keep rows whose category array overlaps the wanted list —
    native arrays_overlap, no explode, no shuffle
    (reference filter_manager.py:25-34)."""
    if not categories:
        return df
    return df.filter(F.arrays_overlap(F.col(cat_col),
                                      F.lit([c for c in categories])))


def structured_category_filter(df: DataFrame, cats_dim: DataFrame,
                               category_types: list[str] | None = None,
                               keywords: list[str] | None = None,
                               cat_col: str = 'categories') -> DataFrame:
    """F5/J3: resolve type/keyword filters against the (tiny) structured
    category dimension, then semi-join — the dimension side is
    broadcast (reference filter_manager.py:52-68)."""
    dim = cats_dim
    conds = []
    if category_types:
        conds.append(F.col('type').isin(category_types))
    if keywords:
        conds.append(F.arrays_overlap(F.col('keywords'),
                                      F.lit([k for k in keywords])))
    if not conds:
        return df
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    wanted = dim.filter(cond).select(F.col('display_name').alias('__cat'))
    # the dimension is tiny (driver-built: topic names, ≤ dozens) —
    # when it fits in a literal list the whole filter is ONE native
    # arrays_overlap predicate: no explode, no shuffle, heavy rows
    # never move. Guarded fallback for an unexpectedly large dim:
    # explode ONLY the key columns and semi-join the matching keys
    # back, so the wide rows still never ride an explode/dedup shuffle
    # (the earlier formulation exploded and dropDuplicates'd full rows).
    head = wanted.take(10_001)
    if len(head) <= 10_000:
        names = [r['__cat'] for r in head]
        if not names:
            return df.filter(F.lit(False))
        return df.filter(F.arrays_overlap(F.col(cat_col), F.lit(names)))
    key = 'url' if 'url' in df.columns else None
    narrow = (df.select(key, F.explode(F.col(cat_col)).alias('__cat'))
              if key else
              df.select(F.explode(F.col(cat_col)).alias('__cat')))
    if key:
        hits = (narrow.join(wanted, on='__cat', how='left_semi')
                .select(key).distinct())
        return df.join(hits, on=key, how='left_semi')
    # no stable key: fall back to a full-row semi join via the array
    return df.join(
        narrow.join(wanted, on='__cat', how='left_semi').distinct(),
        on=F.array_contains(F.col(cat_col), F.col('__cat')), how='left_semi')


def search(df: DataFrame, query: str,
           categories: list[str] | None = None,
           text_col: str = 'extracted_text',
           k: int | None = None,
           dedup: bool = True,
           cfg=DEFAULT_CONFIG) -> DataFrame:
    """Full search pipeline (reference search_engine.py:39-84):
    driver-side query stem → filters → dedup → score → snippet → top-k.
    Returns (url, categories?, score, snippet) ordered by score desc."""
    k = k or cfg.max_results
    tokens = preprocess_query(query)
    if not is_valid_query(tokens):  # F7 early exit (driver-side)
        return df.sparkSession.createDataFrame(
            [], 'url string, score long, snippet string')

    out = df
    if categories and 'categories' in df.columns:
        out = category_filter(out, categories)
    if dedup and 'content_hash' in df.columns:
        out = (with_dup_rank(out)
               .filter(F.col('content_hash').isNull() | (F.col('dup_rank') == 1))
               .drop('dup_rank'))

    rel = _relevance_udf(tokens)
    out = out.withColumn('score', rel(F.col(text_col)))
    out = out.filter(F.col('score') > 0)  # F6 — before the snippet UDF

    # top-k FIRST (TakeOrderedAndProject), snippet UDF on the k
    # survivors only: ranking is (score, url) and never reads the
    # snippet, so this is result-identical — and at corpus scale it
    # means k snippet computations instead of one per matching row
    keep = [c for c in ('url', 'categories') if c in out.columns]
    order = [F.desc('score')] + ([F.asc('url')] if 'url' in keep else [])
    top = (out.select(*keep, 'score', text_col)
           .orderBy(*order)
           .limit(k))  # W3 → TakeOrderedAndProject

    snip = _snippet_udf(tokens, cfg.snippet_length, cfg.snippet_stride)
    return (top.withColumn('snippet', snip(F.col(text_col)))
            .select(*keep, 'score', 'snippet')
            .orderBy(*order))
