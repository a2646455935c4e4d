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


# -- native (whole-stage-codegen) relevance + snippet ------------------
#
# VERDICT r3 #7: the closure-UDF pair above is rebuilt per query and
# puts two ArrowEvalPython nodes in every search plan.  For the common
# case — every stemmed query token is plain ascii [a-z0-9]+ — both
# kernels are expressible as pure Catalyst columns, value-identical to
# the Python kernels:
#
# - substring count == (len(s) - len(replace(s, tok, ''))) / len(tok)
#   (str.count and replace both consume non-overlapping occurrences
#   left-to-right);
# - the sliding-window argmax is a sequence/transform/aggregate over
#   window counts with the same strict-> first-max tie-break;
# - Python's re \s on str is a FIXED character set (not Java's ascii
#   \s, nor (?U)\s which misses U+001C..1F) — _PY_WS_CLASS transcribes
#   it, so the whitespace collapse is byte-identical;
# - F.lower and str.lower() both implement un-localized full Unicode
#   case mapping (Spark: String.toLowerCase(Locale.ROOT)).
#
# Non-ascii tokens fall back to the UDF kernels.

_SIMPLE_TOKEN = __import__('re').compile(r'^[a-z0-9]+$')

# Python re \s (unicode, enumerated exhaustively in test_search_native)
_PY_WS_CLASS = ('[\\x09-\\x0d\\x1c-\\x1f\\x20\\x85\\xa0\\u1680'
                '\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]')


def _native_ok(tokens: list[str]) -> bool:
    return all(_SIMPLE_TOKEN.match(t) for t in tokens)


def _count_in(col, token: str):
    """Non-overlapping substring count as a codegen expression."""
    return ((F.length(col)
             - F.length(F.replace(col, F.lit(token), F.lit(''))))
            / F.lit(len(token)))


def native_relevance_col(tokens: list[str], text_col: str):
    """relevance_score (W1) as a pure Catalyst column — Σ token counts
    plus the reference's in-loop phrase bonus (+10 × n_tokens when the
    full phrase occurs and there are ≥2 tokens)."""
    lower = F.lower(F.coalesce(F.col(text_col), F.lit('')))
    score = _count_in(lower, tokens[0])
    for t in tokens[1:]:
        score = score + _count_in(lower, t)
    if len(tokens) > 1:
        phrase = ' '.join(tokens)
        score = score + F.when(lower.contains(F.lit(phrase)),
                               F.lit(10 * len(tokens))).otherwise(F.lit(0))
    return score.cast('long')


def native_snippet_col(tokens: list[str], text_col: str,
                       length: int = 200, stride: int = 50):
    """generate_snippet (W2) as a pure Catalyst column: sliding-window
    token-count argmax (first strict max), whitespace collapse with the
    exact Python \\s set, ellipsis affixes."""
    lower = F.lower(F.coalesce(F.col(text_col), F.lit('')))
    n = F.length(lower)
    # python range(0, len - length, stride): empty unless len > length
    positions = F.when(
        n > length,
        F.sequence(F.lit(0), n - F.lit(length + 1), F.lit(stride))
    ).otherwise(F.array().cast('array<int>'))

    def window_count(i):
        w = F.substring(lower, i + F.lit(1), F.lit(length))
        c = _count_in(w, tokens[0])
        for t in tokens[1:]:
            c = c + _count_in(w, t)
        return c

    pairs = F.transform(
        positions,
        lambda i: F.struct(i.alias('p'), window_count(i).alias('c')))
    best = F.aggregate(
        pairs,
        F.struct(F.lit(0).alias('p'), F.lit(0.0).alias('c')),
        lambda acc, x: F.when(x['c'] > acc['c'], x).otherwise(acc))
    hit = best['c'] > 0
    pos = F.when(hit, best['p']).otherwise(F.lit(0))
    raw = F.substring(lower, pos + F.lit(1), F.lit(length))
    clean = F.trim(F.regexp_replace(raw, F.lit(_PY_WS_CLASS + '+'),
                                    F.lit(' ')))
    clean = F.when(pos > 0, F.concat(F.lit('...'), clean)).otherwise(clean)
    return F.when(pos + F.lit(length) < n,
                  F.concat(clean, F.lit('...'))).otherwise(clean)


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

    # ascii tokens (the common case after stemming) → fully native
    # relevance AND snippet: the whole search plan stays inside
    # whole-stage codegen with ZERO ArrowEvalPython nodes (VERDICT r3
    # #7); non-ascii tokens fall back to the UDF kernels
    native = _native_ok(tokens)
    if native:
        out = out.withColumn('score', native_relevance_col(tokens, text_col))
    else:
        rel = _relevance_udf(tokens)
        out = out.withColumn('score', rel(F.col(text_col)))
    out = out.filter(F.col('score') > 0)  # F6 — before the snippet stage

    # top-k FIRST (TakeOrderedAndProject), snippet on the k survivors
    # only: ranking is (score, url) and never reads the snippet, so
    # this is result-identical — and at corpus scale it means k snippet
    # computations instead of one per matching row
    keep = [c for c in ('url', 'categories') if c in out.columns]
    order = [F.desc('score')] + ([F.asc('url')] if 'url' in keep else [])
    top = (out.select(*keep, 'score', text_col)
           .orderBy(*order)
           .limit(k))  # W3 → TakeOrderedAndProject

    if native:
        snippet = native_snippet_col(tokens, text_col,
                                     cfg.snippet_length, cfg.snippet_stride)
    else:
        snip = _snippet_udf(tokens, cfg.snippet_length, cfg.snippet_stride)
        snippet = snip(F.col(text_col))
    return (top.withColumn('snippet', snippet)
            .select(*keep, 'score', 'snippet')
            .orderBy(*order))
