"""Model-based quality filter (operators/quality_model, round 5):
fit-to-apply equivalence against pyspark.ml, frozen-model exactness,
deterministic refits, and the no-shuffle scoring plan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.quality_model import (
    FROZEN_QUALITY_INTERCEPT_UNITS, FROZEN_QUALITY_WEIGHTS,
    fit_quality_model, model_quality_score, model_quality_units)


def _labeled_corpus(spark, n=240):
    """Synthetic labeled docs: 'good' docs draw from an analytic
    lexicon, 'bad' docs from filler — linearly separable enough for a
    stable LR fit, with overlap so coefficients stay finite-ish."""
    rng = random.Random(7)
    good = ['query', 'merge', 'vector', 'stream', 'scan', 'join',
            'table', 'window', 'sort', 'column']
    bad = ['slow', 'dup', 'small', 'a', 'the', 'filler', 'noise']
    rows = []
    for i in range(n):
        label = i % 2
        pool = good if label else bad
        other = bad if label else good
        words = [rng.choice(pool) for _ in range(30)]
        words += [rng.choice(other) for _ in range(6)]   # overlap
        rng.shuffle(words)
        rows.append((i, ' '.join(words), float(label)))
    return spark.createDataFrame(rows, 'doc_id long, text string, label double')


def test_fit_then_native_apply_matches_ml_transform(spark):
    """The native map-literal fold must reproduce the pyspark.ml
    model's rawPrediction (margin) and probability exactly (fp
    tolerance only)."""
    df = _labeled_corpus(spark)
    weights, intercept, model = fit_quality_model(df, 'label')
    scored = {r['doc_id']: r for r in
              model_quality_score(df, weights, intercept).collect()}
    # model.transform needs the __mq_features column: rebuild it via
    # the fit helper's contract (vocab order is pinned → same features)
    from pyspark.ml.feature import CountVectorizerModel
    toks = df.withColumn(
        '__mq_toks', F.split(F.lower(F.trim(F.col('text'))), r'\s+'))
    # recover the vocab from the exported weights is lossy (zero coefs
    # dropped) — refit the vocab exactly as fit_quality_model does
    vocab_rows = (toks
                  .select(F.explode(F.array_distinct('__mq_toks')).alias('t'))
                  .groupBy('t').agg(F.count('*').alias('df_'))
                  .orderBy(F.desc('df_'), F.asc('t'))
                  .limit(256).collect())
    cv = CountVectorizerModel.from_vocabulary(
        [r['t'] for r in vocab_rows],
        inputCol='__mq_toks', outputCol='__mq_features')
    ml = {r['doc_id']: r for r in
          model.transform(cv.transform(toks)).collect()}
    for i, row in scored.items():
        raw = ml[i]['rawPrediction'][1]       # margin for class 1
        prob = ml[i]['probability'][1]
        assert abs(row['mq_score'] - raw) < 1e-9, i
        assert abs(row['mq_score_prob'] - prob) < 1e-9, i


def test_fit_separates_the_labels(spark):
    df = _labeled_corpus(spark)
    weights, intercept, _ = fit_quality_model(df, 'label')
    scored = model_quality_score(df, weights, intercept)
    agree = scored.filter(
        ((F.col('mq_score') > 0) & (F.col('label') == 1.0))
        | ((F.col('mq_score') <= 0) & (F.col('label') == 0.0))).count()
    assert agree / scored.count() > 0.95


def test_refit_is_deterministic(spark):
    """Pinned vocab order (df desc, term asc) → identical weights on
    refit; CountVectorizer.fit's tie order would break this."""
    df = _labeled_corpus(spark)
    w1, i1, _ = fit_quality_model(df, 'label')
    w2, i2, _ = fit_quality_model(df, 'label')
    assert w1 == w2 and i1 == i2


def test_frozen_units_are_exact_integers(spark):
    rows = [(0, 'query merge vector'),          # 300+250+220 - 4700
            (1, 'slow dup the'),                # -400-500-100 - 4700
            (2, 'unknownword'),                 # 0 - 4700
            (3, '')]                            # '' token: unknown → 0
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    got = {r['doc_id']: r['mq_units']
           for r in model_quality_units(df).collect()}
    assert got[0] == 300 + 250 + 220 + FROZEN_QUALITY_INTERCEPT_UNITS
    assert got[1] == -1000 + FROZEN_QUALITY_INTERCEPT_UNITS
    assert got[2] == FROZEN_QUALITY_INTERCEPT_UNITS
    assert got[3] == FROZEN_QUALITY_INTERCEPT_UNITS


def test_scoring_plan_has_no_shuffle_no_python(spark):
    """Scoring is a pure projection: zero Exchange, zero
    ArrowEvalPython/BatchEvalPython in the executed plan — at 100 TB
    the scorer adds nothing to scan+project."""
    df = spark.range(10).withColumn('text', F.lit('query merge slow'))
    plan = (model_quality_units(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert 'Exchange' not in plan
    assert 'EvalPython' not in plan


def test_frozen_weights_cover_both_signs():
    ws = set(FROZEN_QUALITY_WEIGHTS.values())
    assert any(w > 0 for w in ws) and any(w < 0 for w in ws)
