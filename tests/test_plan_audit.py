"""Physical-plan regression guards (PLANS.md claims, pinned).

Each test asserts a load-bearing property of an executed plan that a
careless refactor could silently regress: a broadcast that must not
become a shuffle, a scan-level filter that must not become a shuffle,
a pipeline that must keep payloads out of every exchange. String
checks are against Spark 4.1.2's executedPlan formatting (pinned in
this sandbox).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = '/root/testdata/sf0.001'


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_stays_broadcast(spark):
    import __spark_entry__ as e
    p = _plan(e.queries()['q_j2_broadcast_join'](spark, SF))
    assert 'BroadcastHashJoin' in p
    assert 'SortMergeJoin' not in p


def test_decontamination_train_side_never_shuffles(spark):
    """The benchmark shingle set must broadcast; the training corpus
    must reach the semi-join without an exchange on its shingles."""
    import __spark_entry__ as e
    p = _plan(e.queries()['q_decontamination'](spark, SF))
    assert 'BroadcastHashJoin' in p and 'LeftSemi' in p
    assert 'SortMergeJoin' not in p


def test_stratified_sample_filter_is_scan_level(spark):
    """The sampling predicate must sit directly on the FileScan (in
    DataFilters) — the exchanges in the plan belong to the small
    reporting aggregate, not to the sample itself."""
    import __spark_entry__ as e
    p = _plan(e.queries()['q_stratified_sample'](spark, SF))
    scan_lines = [ln for ln in p.splitlines() if 'FileScan' in ln]
    assert scan_lines and 'md5' in scan_lines[0]  # hash filter at scan
    # no exchange between the filter and the scan: the Filter's child
    # is the FileScan itself
    lines = p.splitlines()
    fidx = next(i for i, ln in enumerate(lines) if 'Filter ' in ln)
    assert 'FileScan' in lines[fidx + 1]


def test_extraction_transform_no_payload_in_exchange(spark):
    """pipeline.transform: the only shuffle is the narrow content-hash
    aggregate — html payload and extracted/preprocessed text must
    never appear in any Exchange's output columns."""
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
    from pdf_ai_mapper_spark.pipeline import transform
    df = transform(web_pages_df(spark, 50, num_partitions=2), 'plan-audit')
    plan = _plan(df)
    for line in plan.splitlines():
        if 'Exchange' in line:
            assert 'html' not in line
            assert 'extracted_text' not in line
            assert 'preprocessed_text' not in line


def test_extraction_single_arrow_eval_python(spark):
    """extract+preprocess must stay FUSED: exactly one ArrowEvalPython
    node (two chained pandas UDFs double Python workers per task)."""
    from pdf_ai_mapper_spark.fixtures.webpages import web_pages_df
    from pdf_ai_mapper_spark.operators.extraction import extracted
    plan = _plan(extracted(web_pages_df(spark, 50, num_partitions=2)))
    assert plan.count('ArrowEvalPython') == 1


def test_scan_prunes_columns_for_narrow_query(spark):
    """Column pruning reaches the parquet scan: a two-column projection
    must not read the text payload."""
    df = (spark.read.parquet(f'{SF}/documents.parquet')
          .groupBy('lang').agg(F.count('*').alias('n')))
    qe = df._jdf.queryExecution().toString()
    assert 'ReadSchema' in qe
    read_schema = [ln for ln in qe.splitlines() if 'ReadSchema' in ln][-1]
    assert 'text' not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f'{SF}/events.parquet')
          .filter(F.col('user_id') == 7).select('event_id'))
    qe = df._jdf.queryExecution().toString()
    assert 'PushedFilters: [' in qe
    pushed = [ln for ln in qe.splitlines() if 'PushedFilters' in ln][-1]
    assert 'user_id' in pushed


def _formatted(spark, df) -> str:
    fm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        'formatted')
    return df._jdf.queryExecution().explainString(fm)


def _sections(formatted: str) -> list[tuple[str, str, str]]:
    """[(operator_id, operator_name, section_text)] from the operator
    DETAILS region of a formatted explain (details follow both plan
    trees, so callers filter by the ids present in the final tree)."""
    import re
    out, cur_id, cur_name, cur = [], None, None, []
    for ln in formatted.splitlines():
        m = re.match(r'\((\d+)\) (\w+)', ln)
        if m:
            if cur_name:
                out.append((cur_id, cur_name, '\n'.join(cur)))
            cur_id, cur_name, cur = m.group(1), m.group(2), [ln]
        elif cur_name:
            cur.append(ln)
    if cur_name:
        out.append((cur_id, cur_name, '\n'.join(cur)))
    return out


def test_asof_narrow_keeps_left_payload_out_of_window_exchange(spark):
    """asof_join(strategy='narrow'): the wide left columns must never
    enter any shuffle Exchange or Sort — only the join-back carries
    them (VERDICT r4: the inline form's window exchange was the one
    perf `weak`; the narrow path is the 100 TB shape for wide lefts)."""
    import datetime as dt

    from pdf_ai_mapper_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 7, 'wide-doc-text')],
        'doc_id long, ts timestamp, k long, doc_text string')
    right = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 4), 'snap')],
        'k long, rts timestamp, tag string')
    import re

    df = asof_join(left, right, on='k', left_ts='ts', right_ts='rts')
    df.collect()   # let AQE finalize (runtime stats → broadcast join-back)
    fm = _formatted(spark, df)
    # AQE's formatted explain carries BOTH plan trees (details follow
    # them); audit only the operators present in the FINAL tree
    final_tree = fm.split('== Initial Plan ==')[0]
    final_ids = set(re.findall(r'\((\d+)\)', final_tree))
    # wide left (a string payload column) must auto-route to narrow:
    # every window-pipeline operator (carries __src/__payload) must be
    # free of the left payload column
    window_sections = 0
    for sid, name, section in _sections(fm):
        if (sid in final_ids
                and name in ('Exchange', 'Sort', 'Window', 'WindowGroupLimit')
                and '__src' in section):
            window_sections += 1
            assert 'doc_text' not in section, (name, section)
    assert window_sections >= 3   # exchange + sort + windows at minimum
    # and with a small resolved table AQE must broadcast the join-back
    # in the final plan, so the left payload avoids a network shuffle
    assert 'BroadcastHashJoin' in final_tree
    assert 'SortMergeJoin' not in final_tree


def test_asof_inline_single_window_no_join(spark):
    """asof_join(strategy='inline'): one window, no join-back — the
    skinny-payload fast path must not acquire a second join."""
    import datetime as dt

    from pdf_ai_mapper_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 7, 2.0)],
        'event_id long, ts timestamp, k long, value double')
    right = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 4), 9.0)],
        'k long, rts timestamp, cp double')
    df = asof_join(left, right, on='k', left_ts='ts', right_ts='rts')
    p = _plan(df)   # all-fixed-width left → auto routes to inline
    assert 'Join' not in p
    assert p.count('Window') == 1


def _final_ids(formatted: str) -> set[str]:
    """Operator ids appearing in FINAL plan regions of a formatted
    AQE explain. A nested InMemoryRelation carries its OWN
    AdaptiveSparkPlan whose '== Initial Plan ==' marker appears before
    the outer final tree finishes printing, so 'split at the first
    Initial marker' (the r5 recipe) drops outer-final operators.
    Track marker blocks by INDENTATION: a marker governs exactly the
    deeper-or-equal-indented lines below it until indentation falls
    back past it; scanning stops where the details region starts
    (section headers at column 0)."""
    import re
    ids: set[str] = set()
    stack: list[tuple[int, bool]] = []   # (marker indent, is_final)
    for ln in formatted.splitlines():
        if re.match(r'^\(\d+\) ', ln):   # details region begins
            break
        stripped = ln.lstrip(' :+|-*')
        indent = len(ln) - len(stripped)
        if stripped.startswith(('== Final Plan ==', '== Initial Plan ==')):
            while stack and stack[-1][0] >= indent:
                stack.pop()
            stack.append((indent, stripped.startswith('== Final')))
            continue
        m = re.search(r'\((\d+)\)', ln)
        if not m:
            continue
        while stack and stack[-1][0] > indent:
            stack.pop()
        if not stack or stack[-1][1]:
            ids.add(m.group(1))
    return ids


def test_substring_removal_text_never_in_exchange(spark):
    """remove_duplicated_substrings (round 6): window strings hash
    in-row — no Exchange may carry the text column or any window
    string; shuffles are (id, pos/start, hash) longs plus the rebuilt
    aggregate.

    Exempt: the RoundRobinPartitioning spread (ensure_min_parallelism)
    — it fires ONLY on single-split inputs (this test's one-row-group
    parquet file), where the whole corpus lives on one core anyway; at
    scale the guard is a no-op, so text still never rides a KEY
    exchange."""
    from pdf_ai_mapper_spark.operators.dedup import (
        remove_duplicated_substrings)
    docs = spark.read.parquet(f'{SF}/documents.parquet') \
        .select('doc_id', 'text')
    import re

    out = remove_duplicated_substrings(docs, k=8)
    out.collect()
    fm = _formatted(docs.sparkSession, out)
    for dep in getattr(out, '_persisted_deps', ()):
        dep.unpersist()
    # Check the exchanges' INPUT COLUMN lists from the formatted
    # details (the toString line only ever showed partition KEYS —
    # round-robin exchanges have none, so the old string check could
    # not see what they carried; ADVICE r7). Scoped exemption: a
    # ROUND-ROBIN exchange may carry raw text — that is the
    # ensure_min_parallelism spread, which sits on the scan before any
    # window column exists — but no exchange of any kind may carry a
    # window array/string (__w*), and keyed exchanges never carry text.
    final_ids = _final_ids(fm)
    n_exchanges = 0
    for sid, name, section in _sections(fm):
        if sid not in final_ids or name != 'Exchange':
            continue
        n_exchanges += 1
        inputs = ' '.join(ln for ln in section.splitlines()
                          if ln.startswith('Input'))
        assert '__w' not in inputs, section   # window arrays never shuffle
        if 'RoundRobinPartitioning' not in section:
            assert 'text#' not in inputs, section
    assert n_exchanges >= 2   # the audit actually saw the shuffles


def test_gopher_repetition_text_never_in_exchange(spark):
    """gopher_repetition (round 6): one exploded union of narrow
    (id, kind, key) rows — the document text column itself must not
    ride any Exchange (keys are lines/paragraphs/n-grams, bounded per
    row; the full text never moves)."""
    from pdf_ai_mapper_spark.operators.textstats import gopher_repetition
    docs = spark.read.parquet(f'{SF}/documents.parquet') \
        .select('doc_id', 'text')
    import re

    out = gopher_repetition(docs)
    out.collect()
    fm = _formatted(docs.sparkSession, out)
    for dep in getattr(out, '_persisted_deps', ()):
        dep.unpersist()
    # input-column audit, scoped as in
    # test_substring_removal_text_never_in_exchange: only the
    # round-robin spread may carry text
    final_ids = _final_ids(fm)
    n_exchanges = 0
    for sid, name, section in _sections(fm):
        if sid not in final_ids or name != 'Exchange':
            continue
        n_exchanges += 1
        inputs = ' '.join(ln for ln in section.splitlines()
                          if ln.startswith('Input'))
        if 'RoundRobinPartitioning' not in section:
            assert 'text#' not in inputs, section
    assert n_exchanges >= 1


def test_with_input_ids_single_arrow_stage(spark):
    """with_input_ids must stay ONE ArrowEvalPython (chaining a second
    pandas UDF doubles Python workers per task), and pack_input_ids on
    top must not introduce a SinglePartition stage (covered in
    test_packing) nor a second Python stage."""
    from pdf_ai_mapper_spark.operators.packing import pack_input_ids
    from pdf_ai_mapper_spark.operators.textstats import with_input_ids
    docs = spark.read.parquet(f'{SF}/documents.parquet') \
        .select('doc_id', 'text')
    ids = with_input_ids(docs).select('doc_id', 'input_ids')
    assert _plan(ids).count('ArrowEvalPython') == 1
    packed = pack_input_ids(ids, 'doc_id', 'input_ids', seq_len=512)
    packed.collect()
    plan = _plan(packed)
    for dep in getattr(packed, '_persisted_deps', ()):
        dep.unpersist()
    # AQE prints Final + Initial TREES (CLAUDE.md r5 note) — count
    # Python stages in the FINAL tree only; the encode UDF must run at
    # most once there (the ranged table is persisted downstream of it)
    final = plan.split('== Initial Plan ==')[0]
    assert final.count('ArrowEvalPython') <= 1
    assert 'SinglePartition' not in plan


def test_release_contract_no_persist_leaks(spark):
    """Every catalog query that persists internally (two-phase scans,
    LSH signatures, shared array bases) must leave ZERO persisted RDDs
    behind — a leak per call accumulates MEMORY_AND_DISK tables across
    a bench loop or a long driver session."""
    # NOT covered: q_pagerank_centrality / q_semantic_dedup /
    # q_minhash_incremental — their operators localCheckpoint()
    # iterations, and checkpointed RDDs stay registered until the JVM
    # ContextCleaner GCs the unreferenced handles (bounded per call,
    # self-cleaning; a hard unpersist would break the lineage
    # truncation they exist for).
    import __spark_entry__ as e
    cat = e.queries()

    def _ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    # the suite shares one session: earlier tests may have left
    # checkpoint-class RDDs behind (GC-cleaned) — assert no GROWTH
    # beyond the baseline, not absolute zero
    baseline = _ids()
    for name in ('q_substring_removal', 'q_substring_keep_first',
                 'q_gopher_repetition', 'q_gopher_dup_ngrams',
                 'q_pack_sequences', 'q_encode_pack', 'q_pr_curve',
                 'q_average_precision', 'q_model_auc',
                 'q_ngram_jaccard_exact', 'q_minhash_near_dups',
                 'q_simhash_near_dups', 'q_emb_cosine_dups'):
        cat[name](spark, SF).collect()
        new = _ids() - baseline
        assert not new, (name, new)


def test_cluster_spark_conf_contract():
    """cluster_spark_conf (round 7, from the DRIFT_AB_r7 straggler
    finding): the real-cluster conf must enable speculation and
    decommissioning and must NOT be baked into get_spark's local-mode
    defaults (speculation double-runs tasks inside one JVM)."""
    import inspect
    from pdf_ai_mapper_spark.session import cluster_spark_conf, get_spark
    conf = cluster_spark_conf()
    assert conf['spark.speculation'] == 'true'
    assert conf['spark.decommission.enabled'] == 'true'
    assert all(isinstance(v, str) for v in conf.values())  # builder-safe
    src = inspect.getsource(get_spark)
    assert 'speculation' not in src
