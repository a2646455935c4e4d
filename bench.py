"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric = the north metric (BASELINE.json): documents/sec
through the full extraction pipeline (doctype sniff → extract UDF →
preprocess UDF → md5 → dedup window) over a multi-doctype web_pages
corpus (html/pdf/scanned-pdf/dup/image, 20% hot-host skew) with as many
rows as the scale factor's documents table. Corpus is materialized to
parquet untimed; the timed section is scan → pipeline → full
materialization via a noop sink (no driver collect).

Self-validating artifact (VERDICT r2 #1): the shared sandbox host's
ambient load once masqueraded as a 4× engine regression, so the JSON
now carries the evidence needed to judge its own trustworthiness —
``os.getloadavg()`` before/after every timed section, the raw
per-iteration wall-clocks behind each best-of-N number, and the list
of queries whose warm-up failed (and therefore timed cold). A bounded
wait-for-quiet loop (``SPARK_GRAFT_LOAD_MAX``, default 2.0 × 3 retries
× 20 s) delays the timed sections when the 1-minute load is high;
if the host never quiets, the run proceeds and the readings say so.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _consume(df) -> int:
    """Force full computation without collecting to the driver."""
    df.write.format('noop').mode('overwrite').save()
    return 0


def _load() -> list[float]:
    return [round(x, 2) for x in os.getloadavg()]


def _wait_for_quiet(max_load: float, retries: int, sleep_s: float) -> list[float]:
    """Bounded wait for ambient load to drop below max_load; returns the
    final reading either way (the artifact records it)."""
    for _ in range(retries):
        if os.getloadavg()[0] <= max_load:
            break
        time.sleep(sleep_s)
    return _load()


HEADLINE_QUERIES = [
    'q_tpch_q1_pricing_summary',
    'q_j2_broadcast_join',
    'q_j1_anti_join',
    'q_d2_dedup_first_seen',
    'q_w1_relevance_topk',
    'q_a1_wordfreq_top3',
    'q_a3_term_document_frequency',
    'q_lang_id',
    'q_quality_scores',
    'q_token_counts',
    'q_fingerprint',
    'q_emb_cosine_topk',
    'q_minhash_near_dups',
    'q_simhash_near_dups',
    'q_ngram_jaccard_exact',
    'q_tfidf_top_terms',
    'q_asof_join',
    'q_decontamination',
    'q_search_pipeline',   # round 4: fully native (zero ArrowEvalPython)
]


def run_bench(sf_dir: str, cpus: int, keep_spark=None) -> dict:
    from pdf_ai_mapper_spark.config import EngineConfig
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
    from pdf_ai_mapper_spark.operators.dedup import release
    from pdf_ai_mapper_spark.pipeline import transform
    from pdf_ai_mapper_spark.queries import catalog
    from pdf_ai_mapper_spark.session import get_spark

    max_load = float(os.environ.get('SPARK_GRAFT_LOAD_MAX', '2.0'))
    quiet_retries = int(os.environ.get('SPARK_GRAFT_LOAD_RETRIES', '3'))
    quiet_sleep = float(os.environ.get('SPARK_GRAFT_LOAD_SLEEP', '20'))
    # gate ONCE here, before our own Spark session exists — this is the
    # only moment the 1-min loadavg is purely AMBIENT; after warm-up it
    # includes our own 32 worker threads and would gate on ourselves
    load_readings: dict[str, list[float]] = {
        'bench_start_ambient': _wait_for_quiet(max_load, quiet_retries,
                                               quiet_sleep)}

    # partitions sized to the measured data volume: sf0.1 shuffles are
    # KB-scale, where the corpus-scale default (4× cores, config.py)
    # pays pure scheduling overhead — measured +3 s on the suite; at
    # 120k+ docs the 4× setting wins by 30% (BENCH/BASELINE.md)
    cfg = EngineConfig(shuffle_partitions=cpus)
    spark = keep_spark or get_spark(app_name='pdf-ai-mapper-bench',
                                    master=f'local[{cpus}]', cfg=cfg)

    n_docs = spark.read.parquet(f'{sf_dir}/documents.parquet').count()

    # ---- warm-up (untimed): run every headline query once at the
    # smallest scale so JIT/codegen/Python-worker startup doesn't land
    # in the timed sections — the target regime is a steady-state job,
    # not a cold JVM. Failures are RECORDED (a typo'd query would
    # otherwise silently time cold) ----
    warm_sf = '/root/testdata/sf0.001'
    cat_warm = catalog()
    warmup_failures: list[str] = []
    for name in HEADLINE_QUERIES:
        try:
            df = cat_warm[name](spark, warm_sf)
            df.collect()
            release(df)  # drop per-call cached signature tables
        except Exception as e:
            warmup_failures.append(f'{name}: {type(e).__name__}')
            print(f'WARN bench warm-up failed for {name}: '
                  f'{type(e).__name__}: {e}', file=sys.stderr)
    _consume(transform(web_pages_df(spark, 200, num_partitions=cpus),
                       run_id='warm', cfg=cfg).drop('text'))

    # ---- extraction corpus (untimed prep) ----
    # sized ≥40k rows so the timed pipeline measures steady-state
    # throughput, not stage-scheduling floor (documents.parquet is only
    # 5k rows at sf0.1 — a ~1 s job at 32 cores; at 40k the timed job
    # runs ~4 s, diluting the shared host's scheduling noise)
    n_corpus = max(n_docs, 40_000)
    tmp = tempfile.mkdtemp(prefix='pam_bench_')
    corpus_path = os.path.join(tmp, 'web_pages')
    web_pages_df(spark, n_corpus, num_partitions=cpus * 2).write.parquet(corpus_path)

    # ---- timed: the north-metric pipeline (best of 3 — the sandbox
    # host is shared and wall-clock is noisy; min approximates the
    # steady-state throughput a dedicated cluster would see) ----
    load_readings['extraction_pre'] = _load()
    pages = spark.read.parquet(corpus_path)
    extraction_iters: list[float] = []
    for _ in range(3):
        t0 = time.monotonic()
        _consume(transform(pages, run_id='bench', cfg=cfg)
                 .drop('text'))
        extraction_iters.append(round(time.monotonic() - t0, 3))
    extraction_sec = min(extraction_iters)
    load_readings['extraction_post'] = _load()

    timings: dict[str, float] = {'extraction_pipeline': round(extraction_sec, 3)}
    raw_iters: dict[str, list[float]] = {'extraction_pipeline': extraction_iters}

    load_readings['queries_pre'] = _load()
    cat = catalog()
    for name in HEADLINE_QUERIES:
        iters: list[float] = []
        for _ in range(3):
            t0 = time.monotonic()
            df = cat[name](spark, sf_dir)
            df.collect()
            iters.append(round(time.monotonic() - t0, 3))
            release(df)  # unpersist outside the timed window
        timings[name] = min(iters)
        raw_iters[name] = iters
    load_readings['queries_post'] = _load()

    shutil.rmtree(tmp, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    result = {
        'metric': 'headline suite wall-clock (extraction pipeline + operator queries)',
        'value': total,
        'unit': 'sec',
        'queries': timings,
        'sf': float(sf_dir.rstrip('/').rsplit('sf', 1)[-1]),
        'cpus': cpus,
        'extraction_rows': n_corpus,
        'extraction_docs_per_sec': round(n_corpus / extraction_sec, 2),
        # trustworthiness evidence: 1/5/15-min loadavg around each timed
        # section + every raw iteration behind the best-of-3 numbers.
        # bench_start_ambient is the only OUR-LOAD-FREE reading (taken
        # before the Spark session exists, after the bounded
        # wait-for-quiet); later stamps include this bench's own worker
        # threads, so judge ambient from bench_start_ambient and the
        # 15-min component of the later stamps.
        'load_readings': load_readings,
        'raw_iterations': raw_iters,
        'warmup_failures': warmup_failures,
        'load_max_threshold': max_load,
    }
    if keep_spark is None:
        spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
