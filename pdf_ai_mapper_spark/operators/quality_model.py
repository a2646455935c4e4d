"""Model-based quality scoring — the FineWeb-Edu / DCLM-style stage
that the heuristic gates (textstats.with_quality) approximate: a
linear text classifier whose per-term weights come from a trained
model, applied to every document as a pure column expression.

Two halves, deliberately separated:

- **fit** (`fit_quality_model`): pyspark.ml LogisticRegression over
  count-vector features. The vocabulary is built with a PINNED total
  order (document frequency desc, term asc) instead of
  ``CountVectorizer.fit`` — CV's frequency ties break
  nondeterministically across refits (same trap as
  operators/categorize.count_vector_features). The fitted model is
  exported as a plain ``{term: coefficient}`` dict + intercept — the
  portable artifact every fastText-style quality filter ships.

- **apply** (`model_quality_units` / `model_quality_score`): scoring
  is a NATIVE column expression — the term→weight table inlines as a
  map literal and a single ``aggregate`` HOF folds the token array
  through it. Whole-stage codegen, zero shuffle, zero Python, no
  model object at scoring time; at 100 TB the scorer adds nothing to
  the scan+project plan (vocabularies up to ~10^4 terms inline fine;
  beyond that, switch to a broadcast join on an exploded-token
  projection). Fit-to-apply equivalence is pytest-pinned against
  ``model.transform``'s rawPrediction.

Why NOT HashingTF for the native path: pyspark.ml's HashingTF hashes
with ``hashUnsafeBytes2`` while SQL ``F.hash`` uses
``hashUnsafeBytes`` — different tail-byte handling, so the feature
indices cannot be reproduced as a column expression. A vocabulary map
sidesteps the whole problem and is what production quality
classifiers export anyway.

Exactness contract for the FROZEN model (the oracle-facing path): the
pinned weights are INTEGERS in 1e-4-logit units, so per-document
score sums are integer-valued doubles (< 2^53) that are EXACT under
any addition order — Spark's ordered fold and DuckDB's unordered SUM
agree bit-for-bit, no rounding tolerance needed anywhere. The margin
in logits is ``units / 10**4`` (one IEEE division, deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pinned frozen quality model (round 5): integer weights in 1e-4-logit
# units over the corpus lexicon — analytic/quality terms positive,
# noise/filler terms negative. Like kernels/stopwords.py, this list is
# part of the determinism contract: one changed weight changes every
# frozen score.
FROZEN_QUALITY_WEIGHTS: dict[str, int] = {
    'query': 300, 'sort': 250, 'merge': 250, 'vector': 220,
    'stream': 200, 'window': 200, 'fast': 200, 'scan': 150,
    'join': 150, 'spark': 150, 'hash': 120, 'column': 120,
    'table': 100, 'batch': 100, 'agg': 100, 'group': 100,
    'order': 100, 'filter': 100, 'key': 80, 'row': 80,
    'value': 60, 'data': 60, 'line': 60, 'part': 60,
    'customer': 50, 'big': 50,
    'small': -150, 'slow': -400, 'dup': -500, 'a': -100, 'the': -100,
}
FROZEN_QUALITY_INTERCEPT_UNITS = -4700   # ≈ corpus median of the sum
UNITS_PER_LOGIT = 10_000


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r'\s+')


def _weights_map(term_weights: 'dict[str, float]') -> Column:
    pairs: list[Column] = []
    for t, w in term_weights.items():
        pairs.append(F.lit(t))
        pairs.append(F.lit(float(w)))
    return F.create_map(*pairs)


def term_sum(text_col: Column, term_weights: 'dict[str, float]') -> Column:
    """Σ over tokens of weight[token] (0 for unknown terms) as one
    codegen fold — the dot product of the count vector with the
    coefficient vector, computed without materializing either.
    try_element_at, not element_at: ANSI mode (default-on) makes
    element_at THROW on missing map keys."""
    m = _weights_map(term_weights)
    keys = list(term_weights)
    # pre-filter to vocabulary tokens with ONE isin pass (round 8):
    # GetMapValue on a map literal is a linear scan over all keys per
    # token, while isin over >10 items compiles to an InSet hash
    # lookup — out-of-vocabulary tokens (the vast majority) contribute
    # exactly 0 to the fold either way, so the sum is unchanged and
    # the per-token cost drops from ~|vocab| string compares to one
    # hash probe. Null text: filter(null) is null, aggregate(null) is
    # null — identical to the unfiltered fold.
    vocab_toks = F.filter(_tokens(text_col), lambda t: t.isin(*keys))
    return F.aggregate(
        vocab_toks, F.lit(0.0),
        lambda acc, t: acc + F.coalesce(F.try_element_at(m, t), F.lit(0.0)))


def model_quality_units(df: DataFrame, text_col: str = 'text',
                        term_weights: 'dict[str, int] | None' = None,
                        intercept_units: 'int | None' = None,
                        out_col: str = 'mq_units') -> DataFrame:
    """Frozen-model scoring in exact integer units (see module
    docstring): adds ``out_col`` (BIGINT margin units; gate is
    ``> 0``) and ``mq_margin`` (logits, units / 1e4)."""
    if term_weights is None:
        term_weights = FROZEN_QUALITY_WEIGHTS
    if intercept_units is None:
        intercept_units = FROZEN_QUALITY_INTERCEPT_UNITS
    units = (term_sum(F.col(text_col), term_weights)
             + F.lit(float(intercept_units))).cast('long')
    return (df.withColumn(out_col, units)
            .withColumn('mq_margin',
                        F.col(out_col) / F.lit(float(UNITS_PER_LOGIT))))


def model_quality_score(df: DataFrame,
                        term_weights: 'dict[str, float]',
                        intercept: float,
                        text_col: str = 'text',
                        out_col: str = 'mq_score') -> DataFrame:
    """Fitted-model scoring: adds the raw margin (``out_col``,
    logits — LogisticRegression's rawPrediction for class 1) and its
    sigmoid ``{out_col}_prob``. Same fold as the frozen path, float
    weights."""
    margin = term_sum(F.col(text_col), term_weights) + F.lit(float(intercept))
    return (df.withColumn(out_col, margin)
            .withColumn(f'{out_col}_prob',
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(out_col)))))


def fit_quality_model(df: DataFrame, label_col: str,
                      text_col: str = 'text',
                      vocab_size: int = 256,
                      reg_param: float = 0.0,
                      max_iter: int = 50):
    """Train the quality classifier; returns
    ``(term_weights, intercept, model)`` where term_weights/intercept
    feed `model_quality_score` directly and ``model`` is the raw
    pyspark.ml LogisticRegressionModel (for persistence via its own
    writer).

    Vocabulary: top ``vocab_size`` terms by (document frequency desc,
    term asc) — an explicit TakeOrdered job with a total order, so
    refits are deterministic. Features: raw per-doc term counts
    (CountVectorizerModel over the pinned vocab), matching the
    scorer's fold exactly: Σ_t coef[t]·count_t + intercept."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizerModel

    toks = df.withColumn('__mq_toks', _tokens(F.col(text_col)))
    vocab_rows = (toks
                  .select(F.explode_outer(
                      F.array_distinct('__mq_toks')).alias('t'))
                  .filter(F.col('t').isNotNull())
                  .groupBy('t').agg(F.count('*').alias('df_'))
                  .orderBy(F.desc('df_'), F.asc('t'))
                  .limit(vocab_size)
                  .collect())
    vocab = [r['t'] for r in vocab_rows]
    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol='__mq_toks', outputCol='__mq_features')
    feats = cv.transform(toks)
    lr = LogisticRegression(featuresCol='__mq_features',
                            labelCol=label_col,
                            regParam=reg_param, maxIter=max_iter,
                            standardization=False)
    model = lr.fit(feats)
    # Return the model through a save/load roundtrip: the freshly-fit
    # model carries an in-memory training SUMMARY that references the
    # live SparkSession, and a session reference inside a later task
    # closure dies with NotSerializableException(ObservationManager)
    # (Spark 4.1, surfaces once any Observation has run in the
    # session). The reload drops the summary — and doubles as a
    # persistence check on every fit.
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel
    tmp = tempfile.mkdtemp(prefix='pam_lr_')
    try:
        model.write().overwrite().save(tmp)
        model = LogisticRegressionModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    coefs = model.coefficients.toArray()
    term_weights = {t: float(c) for t, c in zip(vocab, coefs)
                    if c != 0.0}
    return term_weights, float(model.intercept), model
