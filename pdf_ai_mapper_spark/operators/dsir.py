"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus documents whose hashed-n-gram
distribution looks most like a small TARGET corpus.  This is the
domain-targeted sibling of the frozen quality model
(operators/quality_model): instead of a trained classifier it fits two
bag-of-hashed-n-grams unigram models — one on the target sample, one
on the raw pool — and weighs every raw document by its likelihood
ratio, then resamples top-k under Gumbel noise so the selection is a
SAMPLE from the importance distribution, not a hard argmax (the
paper's key trick: argmax alone over-concentrates on near-duplicates
of the target).

    feature(x)  = multiset of hashed {unigram, bigram} buckets
    log w(x)    = Σ_b c_b(x) · [ln p̂_target(b) − ln p̂_raw(b)]
    selection   = top-k of  log w(x) + g_x,   g_x ~ Gumbel(0, 1)

Engine-portability contract (the whole design hinges on it): the
bucket id is ``substr(md5(ngram), 1, hex_chars)`` — a hex STRING, so
both Spark and DuckDB reproduce the exact same bucketing with no
integer-conversion gymnastics, and hash collisions (which CHANGE the
fitted probabilities — unlike a semi-join key, they are semantics
here) are identical on both sides.  The Gumbel noise is derandomized
the same way: u = (md5(seed|id) first-6-hex + 0.5) / 16^6 — a dyadic
rational strictly inside (0,1) both engines compute exactly — and
g = −ln(−ln u).  Determinism: assignment depends only on (seed, id),
so the selected set survives repartition, re-runs, and appends.

Shape at 100 TB (same skeleton as textstats.decontamination_overlap):
n-grams are hashed to buckets IN-ROW (md5+substr, codegen — the
document text never leaves its row); only narrow (id, bucket) pairs
explode.  The bucket-ratio table is bounded by the bucket space
(16^hex_chars rows ≤ 65k) — it broadcasts, so the raw corpus is
scored in one map-side pass; the only wide-ish shuffle is the per-doc
partial-sum aggregate on (id), and top-k is TakeOrderedAndProject
(per-partition heads, no global sort).  The target side is tiny by
construction (a curated sample).  Raising ``hex_chars`` to 4 (65k
buckets) is the paper's m=10^4 regime; beyond that, swap the map
literal's broadcast join for a bucketed table.

Reference analogue: the closest reference behavior is category-driven
document selection (app/processor/categorizer.py scoring docs against
topic terms); DSIR is the corpus-scale generalization a training-data
pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = '0123456789abcdef'


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r'\s+'),
                    lambda t: t != '')


def _bucket_list(text_col: str, hex_chars: int) -> Column:
    """Hashed {unigram, bigram} bucket multiset, built entirely in-row:
    tokens → n-gram strings → md5 → first ``hex_chars`` hex digits."""
    toks = _tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(' ', F.get(toks, i - 1),
                                          F.get(toks, i)))
    ).otherwise(F.array().cast('array<string>'))
    ngrams = F.concat(toks, bigrams)
    return F.transform(
        ngrams, lambda ng: F.substring(F.md5(ng), 1, hex_chars))


def _gumbel_key(id_col: str, seed: str) -> Column:
    """Derandomized Gumbel(0,1) noise keyed on (seed, id): u is the
    first 6 hex digits of md5(seed|id) read as a 24-bit dyadic rational
    in (0,1) (the +0.5 keeps ln() away from 0/1 exactly), g=-ln(-ln u).
    24 bits of entropy is tie-free for any realistic k and both engines
    compute u EXACTLY (integer/4096^2 arithmetic, one IEEE division)."""
    h6 = F.substring(
        F.md5(F.concat(F.lit(seed + '|'),
                       F.col(id_col).cast('string'))), 1, 6)
    # position-weighted hex digits: Σ digit_j · 16^(5-j)
    digits = [
        (F.position(F.substring(h6, j + 1, 1), F.lit(HEX)) - 1).cast('double')
        * F.lit(float(16 ** (5 - j)))
        for j in range(6)
    ]
    u = (sum(digits[1:], digits[0]) + F.lit(0.5)) / F.lit(float(16 ** 6))
    return -F.log(-F.log(u))


def dsir_log_ratio(raw_df: DataFrame, target_df: DataFrame,
                   id_col: str = 'doc_id', text_col: str = 'text',
                   hex_chars: int = 3,
                   alpha: float = 0.5) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    Both bucket models are Lidstone-smoothed over the FULL bucket
    space m = 16^hex_chars (not just observed buckets — the fixed
    feature-space size is a model parameter, so unseen buckets carry
    the same mass on both sides and cancel structurally):

        p̂(b) = (c(b) + α) / (N + α·m)

    Returns (id, n_feats, dsir_logw) with the summed log-ratio rounded
    to 6 places (same exactness budget as textstats.unigram_logprob:
    cross-engine double noise ~1e-13, ten orders below the grain).
    Docs with zero features (empty text) are absent.  The unrounded
    sum is also returned as ``__logw_raw`` for callers composing
    further arithmetic (dsir_select) — drop it for display.
    """
    m = float(16 ** hex_chars)
    buckets = _bucket_list(text_col, hex_chars).alias('b')

    # explode_outer + isNotNull: an inner explode's inferred
    # non-empty filter re-runs the whole bucket-hash transform per row
    # at the scan (round 8)
    tgt_ex = (target_df.select(F.explode_outer(buckets).alias('bucket'))
              .filter(F.col('bucket').isNotNull()))
    raw_ex = (raw_df.select(id_col, F.explode_outer(buckets).alias('bucket'))
              .filter(F.col('bucket').isNotNull()))

    ct = tgt_ex.groupBy('bucket').agg(F.count('*').alias('c_t'))
    cr = raw_ex.groupBy('bucket').agg(F.count('*').alias('c_r'))
    n_t = int(tgt_ex.count())
    n_r = int(raw_ex.count())

    # bucket-ratio table: ≤ 16^hex_chars rows — broadcast dimension
    lam = (ct.join(cr, on='bucket', how='full_outer')
           .select('bucket',
                   (F.log((F.coalesce(F.col('c_t'), F.lit(0))
                           + F.lit(alpha))
                          / F.lit(n_t + alpha * m))
                    - F.log((F.coalesce(F.col('c_r'), F.lit(0))
                             + F.lit(alpha))
                            / F.lit(n_r + alpha * m))).alias('lam')))

    return (raw_ex.join(F.broadcast(lam), on='bucket')
            .groupBy(id_col)
            .agg(F.count('*').cast('long').alias('n_feats'),
                 F.round(F.sum('lam'), 6).alias('dsir_logw'),
                 F.sum('lam').alias('__logw_raw')))


def dsir_select(raw_df: DataFrame, target_df: DataFrame, k: int,
                id_col: str = 'doc_id', text_col: str = 'text',
                hex_chars: int = 3, alpha: float = 0.5,
                seed: str = 'dsir') -> DataFrame:
    """Gumbel top-k importance resampling: the k raw docs with the
    largest ``log w + Gumbel(seed, id)`` — equivalently, k samples
    WITHOUT replacement from the softmax of the importance weights
    (the Gumbel-top-k identity), which is exactly the paper's sampling
    step.  Returns (id, n_feats, dsir_logw, gumbel_key) ordered by
    (gumbel_key desc, id) — a TakeOrderedAndProject, no global sort.
    """
    w = dsir_log_ratio(raw_df, target_df, id_col, text_col,
                       hex_chars, alpha)
    key = F.round(F.col('__logw_raw') + _gumbel_key(id_col, seed), 6)
    return (w.select(id_col, 'n_feats', 'dsir_logw',
                     key.alias('gumbel_key'))
            .orderBy(F.desc('gumbel_key'), F.asc(id_col))
            .limit(k))
