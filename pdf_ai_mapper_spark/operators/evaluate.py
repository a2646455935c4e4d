"""Classifier evaluation at corpus scale — the missing half of the
model-based quality filter (operators/quality_model): once a quality
classifier gates 100 TB of text, the pipeline needs to MEASURE it on
held-out labels at the same scale. scikit-learn's `roc_auc_score`
collects everything to one machine; the operators here keep the work
distributed and the arithmetic exact.

**auc_score** — exact ROC-AUC (Mann-Whitney U with midrank tie
handling). The textbook formulation sorts all N rows globally
(`Exchange SinglePartition` — the same anti-pattern
operators/packing.py documents for prefix sums). The scalable
identity: AUC only depends on the per-DISTINCT-SCORE counts of
positives and negatives,

    AUC · 2·P·N  =  Σ_s  p_s · (2·n_below(s) + n_s)

where ``n_below`` is the count of negatives with strictly smaller
score. So the plan is (1) ONE narrow groupBy(score) — map-side
combine collapses the corpus to its distinct score values; (2) a
prefix sum of ``n`` in score order over that collapsed table — the
two-phase distributed scan from packing.with_global_offset for the
global case (no single-partition stage), a plain partitioned window
for the per-group case (groups spread the sort); (3) a final tiny
aggregate. Raw rows and payloads never ride any exchange.

Exactness: every quantity is an integer; the numerator is widened to
DECIMAL(38,0) (ANSI mode throws on BIGINT overflow, and at 10^14 rows
``p·n_below`` products pass 2^63 — same widening as
operators/graph.py's pagerank). The midrank factor-of-2 keeps ties
integer: a tie group of ``n_s`` negatives contributes ``n_s/2`` per
positive, so 2·AUC·P·N stays a whole number. The reported ``auc``
double is ONE IEEE division of exact integers — deterministic across
engines and partitionings.

**threshold_report** — precision/recall/F1 confusion counts at given
cut points: a single conditional aggregate pass (every threshold is a
pair of CASE sums), zero extra shuffles beyond the one final agg.

**calibration_bins** — reliability-diagram bins (mean score vs
positive rate per equal-width bin): one narrow groupBy over the bin
index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import with_global_offset

_DEC = 'decimal(38,0)'


def _label01(label_col: str) -> 'F.Column':
    # accept boolean / int 0-1; anything truthy>0 counts as positive
    return (F.col(label_col).cast('int') > 0).cast('long')


def auc_score(df: DataFrame, score_col: str, label_col: str,
              group_cols: 'list[str] | None' = None) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against binary ``label_col``.

    Returns one row (or one per group): ``pos_n`` / ``neg_n`` (BIGINT
    label counts), ``auc_num2`` (DECIMAL(38,0) — the exact integer
    2·AUC·P·N), and ``auc`` (DOUBLE; NULL when either class is empty,
    where AUC is undefined).

    Global mode (``group_cols=None``) runs the prefix sum through the
    two-phase distributed scan and returns a MATERIALIZED one-row
    DataFrame (the persisted range table is released internally).
    Grouped mode keeps the plan lazy — the partitioned window spreads
    across groups, no persist involved."""
    lab = _label01(label_col)
    groups = list(group_cols or [])
    per = (df.groupBy(*groups, F.col(score_col).alias('__s'))
           .agg(F.sum(lab).cast('long').alias('__p'),
                (F.count('*') - F.sum(lab)).cast('long').alias('__n')))

    if groups:
        w = (Window.partitionBy(*groups).orderBy('__s')
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        nb = (F.sum('__n').over(w) - F.col('__n')).alias('__nb')
        scored = per.select(*groups, '__s', '__p', '__n', nb)
        return _auc_agg(scored, groups)

    scored = with_global_offset(per, '__s', '__n', out_col='__nb')
    out = _auc_agg(scored, [])
    rows = out.collect()                      # one row — driver-scale
    for dep in getattr(scored, '_persisted_deps', ()):
        dep.unpersist()
    return df.sparkSession.createDataFrame(rows, out.schema)


def _auc_agg(scored: DataFrame, groups: 'list[str]') -> DataFrame:
    num2 = F.sum(F.col('__p').cast(_DEC)
                 * (2 * F.col('__nb') + F.col('__n')).cast(_DEC))
    agg = (scored.groupBy(*groups)
           .agg(F.sum('__p').cast('long').alias('pos_n'),
                F.sum('__n').cast('long').alias('neg_n'),
                num2.cast(_DEC).alias('auc_num2')))
    denom = 2 * F.col('pos_n').cast('double') * F.col('neg_n').cast('double')
    return agg.withColumn(
        'auc',
        F.when((F.col('pos_n') > 0) & (F.col('neg_n') > 0),
               F.col('auc_num2').cast('double') / denom))


def _pr_rows(df: DataFrame, score_col: str, label_col: str,
             groups: 'list[str]') -> DataFrame:
    """Per-distinct-score PR state: exact tp/fp at threshold s
    (predict positive iff score >= s) via class totals minus exclusive
    below-prefix sums — the auc_score collapse reused. Global mode
    runs the two-phase scan twice (p then n) over the already-collapsed
    score table; grouped mode shares ONE exchange+sort across its
    windows. Callers release() the result (persisted range tables)."""
    lab = _label01(label_col)
    per = (df.groupBy(*groups, F.col(score_col).alias('__s'))
           .agg(F.sum(lab).cast('long').alias('__p'),
                (F.count('*') - F.sum(lab)).cast('long').alias('__n')))
    deps: list = []
    if groups:
        wcum = (Window.partitionBy(*groups).orderBy('__s')
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wall = Window.partitionBy(*groups)
        cur = (per
               .withColumn('__pb', F.sum('__p').over(wcum) - F.col('__p'))
               .withColumn('__nb', F.sum('__n').over(wcum) - F.col('__n'))
               .withColumn('__ptot', F.sum('__p').over(wall))
               .withColumn('__ntot', F.sum('__n').over(wall)))
    else:
        s1 = with_global_offset(per, '__s', '__p', out_col='__pb')
        deps += getattr(s1, '_persisted_deps', [])
        s2 = with_global_offset(s1, '__s', '__n', out_col='__nb')
        deps += getattr(s2, '_persisted_deps', [])
        # class totals as literals: two longs collected from the
        # persisted ranged table (a crossJoin with per.agg() trips
        # Spark's self-join AMBIGUOUS_REFERENCE on the shared lineage)
        trow = s1.agg(F.sum('__p').cast('long'),
                      F.sum('__n').cast('long')).collect()[0]
        cur = (s2.withColumn('__ptot', F.lit(int(trow[0] or 0)))
               .withColumn('__ntot', F.lit(int(trow[1] or 0))))
    out = (cur.withColumn('tp', (F.col('__ptot') - F.col('__pb'))
                          .cast('long'))
           .withColumn('fp', (F.col('__ntot') - F.col('__nb'))
                       .cast('long')))
    out._persisted_deps = deps
    return out


def pr_curve(df: DataFrame, score_col: str, label_col: str,
             group_cols: 'list[str] | None' = None) -> DataFrame:
    """Exact precision-recall curve (round 6 — the PR complement to
    ``auc_score``): one row per observed distinct score value, with
    exact BIGINT tp/fp at that threshold and precision/recall as
    single IEEE divisions of them (hash-stable: every row is computed
    independently from cumulative counts — no running float state).
    precision is always defined at an observed score (tp+fp >= the
    rows AT that score >= 1); recall is NULL when the positive class
    is empty. release() the result (global mode persists the range
    tables)."""
    groups = list(group_cols or [])
    rows = _pr_rows(df, score_col, label_col, groups)
    prec = F.col('tp').cast('double') / (F.col('tp') + F.col('fp'))
    rec = F.when(F.col('__ptot') > 0,
                 F.col('tp').cast('double') / F.col('__ptot'))
    out = (rows.select(*groups, F.col('__s').alias('score'), 'tp', 'fp',
                       prec.alias('precision'), rec.alias('recall'))
           .orderBy(*groups, F.col('score').desc()))
    out._persisted_deps = getattr(rows, '_persisted_deps', [])
    return out


def average_precision(df: DataFrame, score_col: str, label_col: str,
                      group_cols: 'list[str] | None' = None) -> DataFrame:
    """Exact-after-pinned-rounding average precision (round 6 —
    sklearn's step-wise AP = Σ_i (R_i − R_{i−1})·P_i over observed
    thresholds): per distinct score the recall gain is p_s / P, so
    AP·P = Σ_s p_s·precision_s. Each term is independent of every
    other (no running float state); precision is pinned to 12 decimal
    places and the sum runs in DECIMAL(38,12) — decimal addition is
    exact, so the total is independent of aggregation ORDER, unlike a
    double sum. Returns (pos_n, neg_n, ap); ap is NULL for an empty
    positive class. Materialized one-row/per-group result (range
    tables released internally, like auc_score)."""
    groups = list(group_cols or [])
    rows = _pr_rows(df, score_col, label_col, groups)
    prec12 = F.round(F.col('tp').cast('double')
                     / (F.col('tp') + F.col('fp')), 12)
    term = F.round(F.col('__p') * prec12, 12).cast('decimal(38,12)')
    agg = (rows.groupBy(*groups)
           .agg(F.max('__ptot').cast('long').alias('pos_n'),
                F.max('__ntot').cast('long').alias('neg_n'),
                F.sum(term).alias('__apnum')))
    out = agg.withColumn(
        'ap', F.when(F.col('pos_n') > 0,
                     F.col('__apnum').cast('double') / F.col('pos_n'))
    ).drop('__apnum')
    rows2 = out.collect()      # one row per group — driver-scale
    for dep in getattr(rows, '_persisted_deps', ()):
        dep.unpersist()
    return df.sparkSession.createDataFrame(rows2, out.schema)


def threshold_report(df: DataFrame, score_col: str, label_col: str,
                     thresholds: 'list[float]',
                     group_cols: 'list[str] | None' = None) -> DataFrame:
    """Confusion counts + precision/recall/F1 at each threshold
    (``score >= t`` predicts positive). One conditional-aggregate
    pass: all thresholds fold into a single groupBy — the corpus is
    scanned once however many cut points are asked for. Counts are
    exact BIGINTs; the ratios are single IEEE divisions of them."""
    if not thresholds:
        raise ValueError('thresholds must be non-empty')
    lab = _label01(label_col)
    s = F.col(score_col)
    groups = list(group_cols or [])
    aggs = []
    for i, t in enumerate(thresholds):
        pred = (s >= F.lit(t)).cast('long')
        aggs += [
            F.sum(pred * lab).cast('long').alias(f'__tp{i}'),
            F.sum(pred * (1 - lab)).cast('long').alias(f'__fp{i}'),
            F.sum((1 - pred) * lab).cast('long').alias(f'__fn{i}'),
            F.sum((1 - pred) * (1 - lab)).cast('long').alias(f'__tn{i}'),
        ]
    wide = df.groupBy(*groups).agg(*aggs)
    # unpivot the threshold blocks into rows (driver-built struct
    # array — len(thresholds) literals, no extra shuffle: the explode
    # runs on the already-tiny aggregate)
    blocks = F.array(*[
        F.struct(F.lit(float(t)).alias('threshold'),
                 F.col(f'__tp{i}').alias('tp'),
                 F.col(f'__fp{i}').alias('fp'),
                 F.col(f'__fn{i}').alias('fn'),
                 F.col(f'__tn{i}').alias('tn'))
        for i, t in enumerate(thresholds)])
    tall = (wide.select(*groups, F.explode(blocks).alias('__b'))
            .select(*groups, '__b.*'))
    tp, fp, fn = F.col('tp'), F.col('fp'), F.col('fn')
    prec = F.when(tp + fp > 0, tp.cast('double') / (tp + fp))
    rec = F.when(tp + fn > 0, tp.cast('double') / (tp + fn))
    f1 = F.when(2 * tp + fp + fn > 0,
                2 * tp.cast('double') / (2 * tp + fp + fn))
    return (tall.withColumn('precision', prec)
            .withColumn('recall', rec)
            .withColumn('f1', f1))


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     n_bins: int = 10,
                     lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """Reliability-diagram bins over ``[lo, hi)``: per equal-width bin,
    row count, positive count, mean score, and positive rate. Scores
    outside the range clamp into the edge bins (bin 0 / n_bins-1), so
    every row lands somewhere. ONE narrow groupBy(bin) — map-side
    combine makes the shuffle n_bins rows per task."""
    if n_bins <= 0:
        raise ValueError(f'n_bins must be positive, got {n_bins}')
    lab = _label01(label_col)
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)),
                   F.lit(n_bins - 1)).cast('long')
    return (df.select(bin_.alias('bin'),
                      F.col(score_col).alias('__s'), lab.alias('__l'))
            .groupBy('bin')
            .agg(F.count('*').cast('long').alias('n'),
                 F.sum('__l').cast('long').alias('n_pos'),
                 F.avg('__s').alias('mean_score'),
                 (F.sum('__l').cast('double') / F.count('*'))
                 .alias('pos_rate'))
            .orderBy('bin'))


def auc_report(df: DataFrame, score_col: str, label_col: str,
               group_cols: 'list[str]',
               overall_label: str = '__all__') -> DataFrame:
    """Per-group AUC plus the overall row from ONE pass over the
    corpus (the report shape evaluations actually ship). Calling
    ``auc_score`` twice would scan — and re-run the scoring
    expressions over — the full table once per path; here the
    per-(group, score) class counts are computed once, the grouped
    path windows over them, and the GLOBAL path re-aggregates the
    already-collapsed counts (distinct (group, score) rows — narrow)
    before the two-phase prefix sum. The groups ride a column named
    ``group`` (stringified, '|'-joined for multi-column groups) so
    the overall row unions cleanly."""
    if not group_cols:
        raise ValueError('group_cols must be non-empty; '
                         'use auc_score for a single global AUC')
    lab = _label01(label_col)
    gcol = F.concat_ws('|', *[F.col(c).cast('string')
                              for c in group_cols]).alias('group')
    per = (df.groupBy(gcol, F.col(score_col).alias('__s'))
           .agg(F.sum(lab).cast('long').alias('__p'),
                (F.count('*') - F.sum(lab)).cast('long').alias('__n')))
    from pyspark.storagelevel import StorageLevel
    per = per.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        w = (Window.partitionBy('group').orderBy('__s')
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        nb = (F.sum('__n').over(w) - F.col('__n')).alias('__nb')
        grouped = _auc_agg(per.select('group', '__s', '__p', '__n', nb),
                           ['group'])

        gper = (per.groupBy('__s')
                .agg(F.sum('__p').cast('long').alias('__p'),
                     F.sum('__n').cast('long').alias('__n')))
        scored = with_global_offset(gper, '__s', '__n', out_col='__nb')
        overall = (_auc_agg(scored, [])
                   .withColumn('group', F.lit(overall_label))
                   .select('group', 'pos_n', 'neg_n', 'auc_num2', 'auc'))
        rows = grouped.unionByName(overall).collect()
        for dep in getattr(scored, '_persisted_deps', ()):
            dep.unpersist()
        return df.sparkSession.createDataFrame(
            rows, grouped.unionByName(overall).schema)
    finally:
        per.unpersist()
