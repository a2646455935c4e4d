"""Classifier evaluation operators (operators/evaluate): exact AUC
(global two-phase path and grouped window path) against a brute-force
pairwise reference, threshold confusion reports, calibration bins."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pdf_ai_mapper_spark.operators.evaluate import (auc_score,
                                                    calibration_bins,
                                                    threshold_report)


def _brute_auc(pairs):
    """Reference AUC: all positive×negative comparisons, ties 0.5."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num2 = 0
    for p in pos:
        for n in neg:
            num2 += 2 if p > n else (1 if p == n else 0)
    return num2, len(pos), len(neg)


def _labelled_df(spark, n=400, seed=11, groups=('a', 'b', 'c')):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        g = groups[i % len(groups)]
        y = rng.random() < 0.4
        # integer scores -> heavy ties, exercises the midrank path
        s = rng.randint(0, 25) + (5 if y else 0)
        rows.append((i, g, s, 1 if y else 0))
    return spark.createDataFrame(
        rows, 'id long, grp string, score long, label int').repartition(7)


class TestAucScore:
    def test_global_matches_bruteforce(self, spark):
        df = _labelled_df(spark)
        got = auc_score(df, 'score', 'label').collect()
        assert len(got) == 1
        r = got[0]
        pairs = [(row['score'], row['label']) for row in df.collect()]
        num2, p, n = _brute_auc(pairs)
        assert (int(r['auc_num2']), r['pos_n'], r['neg_n']) == (num2, p, n)
        assert abs(r['auc'] - num2 / (2.0 * p * n)) == 0.0

    def test_grouped_matches_bruteforce_and_global(self, spark):
        df = _labelled_df(spark)
        got = {r['grp']: r
               for r in auc_score(df, 'score', 'label', ['grp']).collect()}
        rows = df.collect()
        for g in ('a', 'b', 'c'):
            pairs = [(r['score'], r['label']) for r in rows
                     if r['grp'] == g]
            num2, p, n = _brute_auc(pairs)
            r = got[g]
            assert (int(r['auc_num2']), r['pos_n'], r['neg_n']) == \
                (num2, p, n)
        # a single-group grouped run equals the global path bit-for-bit
        one = df.withColumn('grp', F.lit('x'))
        gr = auc_score(one, 'score', 'label', ['grp']).collect()[0]
        gl = auc_score(one, 'score', 'label').collect()[0]
        assert (int(gr['auc_num2']), gr['auc']) == \
            (int(gl['auc_num2']), gl['auc'])

    def test_degenerate_single_class_gives_null(self, spark):
        df = spark.createDataFrame([(i, i, 1) for i in range(10)],
                                   'id long, score long, label int')
        r = auc_score(df, 'score', 'label').collect()[0]
        assert r['neg_n'] == 0 and r['auc'] is None

    def test_perfect_and_reversed_separation(self, spark):
        rows = [(i, i, 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, 'id long, score long, label int')
        assert auc_score(df, 'score', 'label').collect()[0]['auc'] == 1.0
        rev = df.withColumn('score', -F.col('score'))
        assert auc_score(rev, 'score', 'label').collect()[0]['auc'] == 0.0

    def test_global_plan_has_no_single_partition_stage(self, spark):
        """The scalable identity's point: no global sort, no
        SinglePartition exchange anywhere in the AUC job. The result
        is materialized internally, so audit the narrow per-score
        stage the same way test_packing does."""
        from pdf_ai_mapper_spark.operators.packing import \
            with_global_offset
        df = _labelled_df(spark)
        lab = (F.col('label').cast('int') > 0).cast('long')
        per = (df.groupBy(F.col('score').alias('__s'))
               .agg(F.sum(lab).cast('long').alias('__p'),
                    (F.count('*') - F.sum(lab)).cast('long').alias('__n')))
        scored = with_global_offset(per, '__s', '__n', out_col='__nb')
        scored.collect()
        plan = scored._jdf.queryExecution().executedPlan().toString()
        for dep in getattr(scored, '_persisted_deps', ()):
            dep.unpersist()
        assert 'SinglePartition' not in plan

    def test_invariant_under_repartition(self, spark):
        df = _labelled_df(spark, seed=23)
        a = auc_score(df, 'score', 'label').collect()[0]
        b = auc_score(df.repartition(31), 'score', 'label').collect()[0]
        assert (int(a['auc_num2']), a['pos_n'], a['neg_n'], a['auc']) == \
            (int(b['auc_num2']), b['pos_n'], b['neg_n'], b['auc'])


class TestThresholdReport:
    def test_matches_python_reference(self, spark):
        df = _labelled_df(spark, seed=5)
        ths = [5.0, 10.0, 20.0]
        got = {r['threshold']: r
               for r in threshold_report(df, 'score', 'label', ths).collect()}
        rows = [(r['score'], r['label']) for r in df.collect()]
        for t in ths:
            tp = sum(1 for s, y in rows if s >= t and y == 1)
            fp = sum(1 for s, y in rows if s >= t and y == 0)
            fn = sum(1 for s, y in rows if s < t and y == 1)
            tn = sum(1 for s, y in rows if s < t and y == 0)
            r = got[t]
            assert (r['tp'], r['fp'], r['fn'], r['tn']) == (tp, fp, fn, tn)
            assert r['precision'] == (tp / (tp + fp) if tp + fp else None)
            assert r['recall'] == (tp / (tp + fn) if tp + fn else None)
            assert r['f1'] == (2 * tp / (2 * tp + fp + fn)
                               if 2 * tp + fp + fn else None)

    def test_grouped_counts_sum_to_global(self, spark):
        df = _labelled_df(spark, seed=7)
        g = threshold_report(df, 'score', 'label', [10.0], ['grp']).collect()
        tot = threshold_report(df, 'score', 'label', [10.0]).collect()[0]
        assert sum(r['tp'] for r in g) == tot['tp']
        assert sum(r['tn'] for r in g) == tot['tn']

    def test_empty_thresholds_rejected(self, spark):
        import pytest
        df = _labelled_df(spark)
        with pytest.raises(ValueError):
            threshold_report(df, 'score', 'label', [])


class TestCalibrationBins:
    def test_matches_python_reference_with_clamping(self, spark):
        rng = random.Random(3)
        rows = [(i, rng.uniform(-0.2, 1.2), 1 if rng.random() < 0.5 else 0)
                for i in range(300)]
        df = spark.createDataFrame(rows, 'id long, score double, label int')
        got = {r['bin']: r
               for r in calibration_bins(df, 'score', 'label', 10).collect()}
        import collections
        import math
        n = collections.Counter()
        npos = collections.Counter()
        ssum = collections.defaultdict(float)
        for _, s, y in rows:
            # same double division + floor the operator performs
            b = min(max(int(math.floor((s - 0.0) / 0.1)), 0), 9)
            n[b] += 1
            npos[b] += y
            ssum[b] += s
        assert set(got) == set(n)
        for b in n:
            r = got[b]
            assert (r['n'], r['n_pos']) == (n[b], npos[b])
            assert abs(r['mean_score'] - ssum[b] / n[b]) < 1e-12
            assert r['pos_rate'] == npos[b] / n[b]


class TestAucReport:
    def test_matches_two_auc_score_calls_bit_for_bit(self, spark):
        from pdf_ai_mapper_spark.operators.evaluate import (auc_report,
                                                            auc_score)
        df = _labelled_df(spark, seed=31)
        rep = {r['group']: r
               for r in auc_report(df, 'score', 'label', ['grp']).collect()}
        for g in ('a', 'b', 'c'):
            ref = auc_score(df.filter(F.col('grp') == g),
                            'score', 'label').collect()[0]
            r = rep[g]
            assert (int(r['auc_num2']), r['pos_n'], r['neg_n'], r['auc']) \
                == (int(ref['auc_num2']), ref['pos_n'], ref['neg_n'],
                    ref['auc'])
        ref = auc_score(df, 'score', 'label').collect()[0]
        r = rep['__all__']
        assert (int(r['auc_num2']), r['pos_n'], r['neg_n'], r['auc']) \
            == (int(ref['auc_num2']), ref['pos_n'], ref['neg_n'],
                ref['auc'])

    def test_empty_groups_rejected(self, spark):
        import pytest
        from pdf_ai_mapper_spark.operators.evaluate import auc_report
        df = _labelled_df(spark, seed=2)
        with pytest.raises(ValueError):
            auc_report(df, 'score', 'label', [])


def _brute_pr(pairs):
    """Reference PR curve + step-wise AP over observed thresholds."""
    scores = sorted({s for s, _ in pairs}, reverse=True)
    P = sum(1 for _, y in pairs if y == 1)
    N = len(pairs) - P
    curve = []
    ap_num = 0.0
    for t in scores:
        tp = sum(1 for s, y in pairs if s >= t and y == 1)
        fp = sum(1 for s, y in pairs if s >= t and y == 0)
        p_at = sum(1 for s, y in pairs if s == t and y == 1)
        prec = tp / (tp + fp)
        curve.append((t, tp, fp, round(prec, 6),
                      round(tp / P, 6) if P else None))
        ap_num += p_at * round(prec, 12)
    return curve, (round(ap_num / P, 6) if P else None), P, N


class TestPrCurve:
    def test_global_matches_bruteforce(self, spark):
        from pdf_ai_mapper_spark.operators.dedup import release
        from pdf_ai_mapper_spark.operators.evaluate import pr_curve
        df = _labelled_df(spark)
        pairs = [(r['score'], r['label']) for r in df.collect()]
        exp, _, _, _ = _brute_pr(pairs)
        cur = pr_curve(df, 'score', 'label')
        got = [(r['score'], r['tp'], r['fp'],
                round(r['precision'], 6), round(r['recall'], 6))
               for r in cur.collect()]
        release(cur)
        assert got == exp

    def test_grouped_matches_per_group_bruteforce(self, spark):
        from pdf_ai_mapper_spark.operators.dedup import release
        from pdf_ai_mapper_spark.operators.evaluate import pr_curve
        df = _labelled_df(spark)
        cur = pr_curve(df, 'score', 'label', ['grp'])
        rows = cur.collect()
        release(cur)
        data = [(r['grp'], r['score'], r['label']) for r in df.collect()]
        for g in ('a', 'b', 'c'):
            pairs = [(s, y) for gg, s, y in data if gg == g]
            exp, _, _, _ = _brute_pr(pairs)
            got = [(r['score'], r['tp'], r['fp'],
                    round(r['precision'], 6), round(r['recall'], 6))
                   for r in rows if r['grp'] == g]
            assert sorted(got, reverse=True) == exp, g

    def test_global_plan_no_single_partition(self, spark):
        from pdf_ai_mapper_spark.operators.dedup import release
        from pdf_ai_mapper_spark.operators.evaluate import pr_curve
        df = _labelled_df(spark, n=200)
        cur = pr_curve(df, 'score', 'label')
        cur.collect()
        plan = cur._jdf.queryExecution().executedPlan().toString()
        release(cur)
        assert 'SinglePartition' not in plan


class TestAveragePrecision:
    def test_matches_bruteforce_and_is_partition_invariant(self, spark):
        from pdf_ai_mapper_spark.operators.evaluate import (
            average_precision)
        df = _labelled_df(spark)
        pairs = [(r['score'], r['label']) for r in df.collect()]
        _, exp_ap, P, N = _brute_pr(pairs)
        for d in (df, df.repartition(3), df.repartition(17)):
            row = average_precision(d, 'score', 'label').collect()[0]
            assert (row['pos_n'], row['neg_n']) == (P, N)
            assert round(row['ap'], 6) == exp_ap

    def test_grouped_matches_bruteforce(self, spark):
        from pdf_ai_mapper_spark.operators.evaluate import (
            average_precision)
        df = _labelled_df(spark)
        got = {r['grp']: r for r in average_precision(
            df, 'score', 'label', ['grp']).collect()}
        data = [(r['grp'], r['score'], r['label']) for r in df.collect()]
        for g in ('a', 'b', 'c'):
            pairs = [(s, y) for gg, s, y in data if gg == g]
            _, exp_ap, P, N = _brute_pr(pairs)
            assert (got[g]['pos_n'], got[g]['neg_n']) == (P, N)
            assert round(got[g]['ap'], 6) == exp_ap

    def test_empty_positive_class_gives_null(self, spark):
        from pdf_ai_mapper_spark.operators.evaluate import (
            average_precision)
        df = spark.createDataFrame([(1.0, 0), (0.5, 0)],
                                   'score double, label int')
        row = average_precision(df, 'score', 'label').collect()[0]
        assert row['ap'] is None and row['pos_n'] == 0
