"""Per-query isolation bench + stage-level profiling (round 8).

NOT the graded bench (bench.py is frozen for measurement) — this is the
guide-§1 measurement harness: isolate one query at a time with the same
session/config/methodology as bench.py, attribute wall time to stages
via the status REST API, and dump .explain('formatted') plans.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --iters 3 q_lang_id ...
  python bench_extra.py --sf /root/testdata/sf1.0 --stages q_ngram_jaccard_exact
  python bench_extra.py --explain plans/r08 --suffix before q_lang_id ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _get_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def stage_report(ui_port: int = 4040, top: int = 20) -> list[dict]:
    """Completed-stage summary from the status REST API, slowest first."""
    base = f'http://localhost:{ui_port}/api/v1'
    apps = _get_json(f'{base}/applications')
    app_id = apps[0]['id']
    stages = _get_json(f'{base}/applications/{app_id}/stages?status=complete')
    rows = []
    for s in stages:
        rows.append({
            'stageId': s['stageId'],
            'attempt': s['attemptId'],
            'name': s['name'][:80],
            'desc': (s.get('description') or '')[:60],
            'tasks': s['numCompleteTasks'],
            'executorRunTime_s': round(s['executorRunTime'] / 1000, 2),
            'executorCpuTime_s': round(s['executorCpuTime'] / 1e9, 2),
            'shuffleRead_MB': round(s['shuffleReadBytes'] / 1e6, 2),
            'shuffleWrite_MB': round(s['shuffleWriteBytes'] / 1e6, 2),
            'input_MB': round(s['inputBytes'] / 1e6, 2),
            'wall_s': round((s.get('completionTime') is not None and
                             _ms(s['completionTime']) - _ms(s['firstTaskLaunchedTime'])
                             or 0) / 1000, 2)
            if s.get('firstTaskLaunchedTime') else None,
        })
    rows.sort(key=lambda r: -(r['executorRunTime_s']))
    return rows[:top]


def _ms(iso: str) -> float:
    # "2026-08-21T12:34:56.789GMT"
    import datetime
    s = iso.replace('GMT', '+0000')
    return datetime.datetime.strptime(s, '%Y-%m-%dT%H:%M:%S.%f%z').timestamp() * 1000


# queries whose returned DataFrame is a LocalTableScan of pre-collected
# rows: explain the INNER computation instead
def _inner_df(name: str, spark, sf_dir: str):
    from pyspark.sql import functions as F
    from pdf_ai_mapper_spark.queries import _t
    if name == 'q_ngram_jaccard_exact':
        from pdf_ai_mapper_spark.operators.dedup import ngram_jaccard_pairs
        d = _t(spark, sf_dir, 'documents')
        res = ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.5,
                                  max_shingle_df=256)
        return (res.select('id_a', 'id_b',
                           F.round('jaccard', 6).alias('jaccard'))
                .orderBy('id_a', 'id_b'))
    if name == 'q_substring_removal':
        from pdf_ai_mapper_spark.operators.dedup import (
            remove_duplicated_substrings)
        d = _t(spark, sf_dir, 'documents')
        return remove_duplicated_substrings(d, 'doc_id', 'text', k=8,
                                            min_df=2).orderBy('doc_id')
    if name == 'q_encode_pack':
        from pdf_ai_mapper_spark.operators import textstats
        from pdf_ai_mapper_spark.operators.packing import pack_input_ids
        d = textstats.with_input_ids(_t(spark, sf_dir, 'documents'), 'text')
        packed = pack_input_ids(d.select('doc_id', 'input_ids'),
                                'doc_id', 'input_ids', seq_len=512,
                                sep_id=1114111)
        return (packed.select(
            'seq', 'n_docs', 'n_ids',
            F.md5(F.array_join(
                F.transform('input_ids', lambda x: x.cast('string')),
                ',')).alias('ids_md5')).orderBy('seq'))
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('queries', nargs='+')
    ap.add_argument('--sf', default='/root/testdata/sf0.1')
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--stages', action='store_true',
                    help='enable UI + print per-stage attribution')
    ap.add_argument('--explain', metavar='DIR',
                    help='write .explain(formatted) to DIR/<q>_<suffix>.txt')
    ap.add_argument('--suffix', default='before')
    ap.add_argument('--no-warm', action='store_true')
    args = ap.parse_args()

    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    from pdf_ai_mapper_spark.config import EngineConfig
    from pdf_ai_mapper_spark.operators.dedup import release
    from pdf_ai_mapper_spark.queries import catalog
    from pdf_ai_mapper_spark.session import get_spark

    cfg = EngineConfig(shuffle_partitions=cpus)
    extra = {'spark.ui.enabled': 'true'} if args.stages else None
    spark = get_spark(app_name='pam-bench-extra',
                      master=f'local[{cpus}]', cfg=cfg, extra_conf=extra)
    cat = catalog()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        if not args.no_warm:
            df = cat[name](spark, '/root/testdata/sf0.001')
            df.collect()
            release(df)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            target = _inner_df(name, spark, args.sf) or cat[name](spark, args.sf)
            plan = target._sc._jvm.PythonSQLUtils.explainString(
                target._jdf.queryExecution(), 'formatted')
            with open(os.path.join(args.explain,
                                   f'{name}_{args.suffix}.txt'), 'w') as f:
                f.write(plan)
            release(target)
            print(f'{name}: plan written', file=sys.stderr)
            continue
        times = []
        for _ in range(args.iters):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            df = cat[name](spark, args.sf)
            df.collect()
            release(df)
            times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({'query': name, 'sf': args.sf, 'times': times,
                          'min': min(times)}))
        if args.stages:
            for r in stage_report():
                print('  ', json.dumps(r))
    spark.stop()
    return 0


if __name__ == '__main__':
    sys.exit(main())
