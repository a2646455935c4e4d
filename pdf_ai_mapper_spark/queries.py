"""Driver-contract query catalog: every operator from SURVEY.md §2 as a
(spark, sf_dir) → DataFrame callable plus, where SQL-expressible, an
exact ANSI-SQL oracle for DuckDB over the same parquet tables.

Conventions (the driver hashes values after sorting columns by name):
- every computed column is aliased identically on both sides;
- aggregate ints are cast to bigint on both sides (DuckDB SUM(int)
  returns HUGEINT otherwise);
- doubles are rounded to 6 decimals on both sides;
- every query has a deterministic total order *of values* (the hash is
  order-insensitive, but ties inside top-k/limit must be broken
  deterministically or the *set* itself differs).

Keys are prefixed with the SURVEY.md §2 operator ids they cover.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .kernels.stopwords import TOPIC_KEYWORDS, sorted_stopwords
from .operators import textstats
from .operators.dedup import (dedup_exact, minhash_lsh_pairs,
                              ngram_jaccard_pairs, simhash_near_pairs)
from .operators.similarity import brute_force_topk

_STOPS = sorted_stopwords()
_STOPS_SQL = ', '.join(f"'{w}'" for w in _STOPS)

# language-ID marker table (operators/textstats.py) — SQL mirror built
# from the same pinned dict
_MARKERS = textstats.LANG_MARKERS


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f'{sf_dir}/{name}.parquet')


def _ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_t + a one-split-scan spread for queries whose per-row map work
    (marker counts, regex stats, scoring folds, explodes) dominates:
    a single-row-group parquet file scans as ONE task no matter what
    (round-7 finding), serializing the whole map stage onto one core.
    No-op whenever the scan already has >= defaultParallelism splits —
    i.e. always at real corpus scale (guide §2.5 input-skew fix) —
    and size-gated so a tiny fixture scan is not repartitioned for
    nothing (the gate is data-derived; see skew.py)."""
    from .operators.skew import (SPREAD_MIN_BYTES_PER_PART,
                                 ensure_min_parallelism)
    return ensure_min_parallelism(
        _t(spark, sf_dir, name),
        min_bytes_per_part=SPREAD_MIN_BYTES_PER_PART)


def _count_token_sql(word: str) -> str:
    # mirrors textstats._count_token verbatim: one [^a-z]+ tokenization
    # + equality filter per marker
    return (f"len(list_filter(string_split_regex(lower(text), '[^a-z]+'), "
            f"t -> t = '{word}'))")


# =====================================================================
# queries — each fn(spark, sf_dir) -> DataFrame
# =====================================================================

def q_t2_t5_normalize(spark, sf_dir):
    """T2-T5 native regex-normalization chain (text_preprocessor.py:
    106-119) over documents; returns per-doc normalized text."""
    t = F.col('text')
    norm = F.lower(t)
    norm = F.regexp_replace(norm, r'[^\w\s-]', ' ')
    norm = F.regexp_replace(norm, r'\d+', ' ')
    norm = F.trim(F.regexp_replace(norm, r'\s+', ' '))
    return (_t(spark, sf_dir, 'documents')
            .select('doc_id', norm.alias('norm_text'))
            .orderBy('doc_id'))


def q_t7_meaningful_tokens(spark, sf_dir):
    """T7/T8 token filter: per-doc count of tokens with len>=3, not in
    the frozen stopword set, not all-digits (text_preprocessor.py:
    132-139)."""
    toks = F.split(F.col('text'), ' ')
    keep = F.filter(toks, lambda x: (F.length(x) >= 3)
                    & ~x.isin(_STOPS)
                    & ~x.rlike('^[0-9]+$'))
    return (_t(spark, sf_dir, 'documents')
            .select('doc_id', F.size(keep).cast('long').alias('n_meaningful'))
            .orderBy('doc_id'))


def q_d1_content_hash(spark, sf_dir):
    """D1 md5 content hash (document_storage.py:76-84) + corpus dup
    stats."""
    d = _t(spark, sf_dir, 'documents').withColumn(
        'h', F.md5(F.encode(F.col('text'), 'UTF-8')))
    return d.agg(F.count('*').cast('long').alias('n_rows'),
                 F.countDistinct('h').cast('long').alias('n_distinct_hashes'))


def q_d2_dedup_first_seen(spark, sf_dir):
    """D2 first-seen-wins dedup window (filter_manager.py:70-97):
    survivors per lang after rank-1 on md5(text) ordered by doc_id."""
    d = _t(spark, sf_dir, 'documents').withColumn(
        'h', F.md5(F.encode(F.col('text'), 'UTF-8')))
    w = Window.partitionBy('h').orderBy('doc_id')
    return (d.withColumn('rn', F.row_number().over(w))
            .filter(F.col('rn') == 1)
            .groupBy('lang').agg(F.count('*').cast('long').alias('n_survivors'))
            .orderBy('lang'))


def q_w1_relevance_topk(spark, sf_dir):
    """W1+W3: substring-count relevance for token 'spark'
    (relevance_calculator.py:30-33) + top-10 (search_engine.py:81-84)."""
    lower = F.lower(F.col('text'))
    score = ((F.length(lower) - F.length(F.replace(lower, F.lit('spark'), F.lit(''))))
             / F.lit(5)).cast('long')
    return (_t(spark, sf_dir, 'documents')
            .select('doc_id', score.alias('score'))
            .filter(F.col('score') > 0)
            .orderBy(F.desc('score'), F.asc('doc_id'))
            .limit(10))


def q_w3_topk_events(spark, sf_dir):
    """W3 top-k: 10 highest-value events."""
    return (_t(spark, sf_dir, 'events')
            .select('event_id', 'user_id', 'event_type',
                    F.round('value', 6).alias('value_r'))
            .orderBy(F.desc('value_r'), F.asc('event_id'))
            .limit(10))


def q_w5_first_event_per_user(spark, sf_dir):
    """W5/window: each user's first event by (ts, event_id)."""
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    return (_t(spark, sf_dir, 'events')
            .withColumn('rn', F.row_number().over(w))
            .filter(F.col('rn') == 1)
            .select('user_id', 'event_id', 'event_type')
            .orderBy('user_id'))


def q_f2_lang_filter_counts(spark, sf_dir):
    """F2-style isin predicate + projection + grouped count."""
    return (_t(spark, sf_dir, 'documents')
            .filter(F.col('lang').isin('en', 'de'))
            .groupBy('lang', 'source')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('lang', 'source'))


def q_a1_wordfreq_top3(spark, sf_dir):
    """A1 per-doc top-3 words of len>=4 (category_manager.py:90-103),
    tie-broken (count desc, word asc) for SQL expressibility; the
    Counter first-occurrence variant is covered by kernel tests."""
    d = _ts(spark, sf_dir, 'documents')
    # explode_outer + isNotNull: keeps the inferred non-empty-array
    # filter from sinking below the spread into the scan (round 8)
    ex = (d.select('doc_id', F.explode_outer(F.split('text', ' ')).alias('w'))
          .filter(F.col('w').isNotNull()))
    ex = ex.filter(F.length('w') >= 4)
    counts = ex.groupBy('doc_id', 'w').agg(F.count('*').alias('c'))
    w = Window.partitionBy('doc_id').orderBy(F.desc('c'), F.asc('w'))
    top = counts.withColumn('rn', F.row_number().over(w)).filter(F.col('rn') <= 3)
    return (top.groupBy('doc_id')
            .agg(F.concat_ws(', ', F.array_sort(
                F.collect_list(F.struct('rn', 'w'))).getField('w'))
                .alias('top_words'))
            .orderBy('doc_id'))


def q_a3_term_document_frequency(spark, sf_dir):
    """A3 corpus term stats: top-20 terms by document frequency
    (len>=3, non-stopword) — the vocabulary builder's exact order
    (df desc, term asc)."""
    d = _t(spark, sf_dir, 'documents')
    toks = F.array_distinct(F.split('text', ' '))
    # outer explode: the inferred non-empty filter would re-run
    # array_distinct(split(..)) per row at the scan (round 8)
    ex = d.select(F.explode_outer(toks).alias('t'))
    ex = ex.filter(F.col('t').isNotNull() & (F.length('t') >= 3)
                   & ~F.col('t').isin(_STOPS))
    return (ex.groupBy('t').agg(F.count('*').cast('long').alias('df_count'))
            .orderBy(F.desc('df_count'), F.asc('t'))
            .limit(20))


def q_a7_distinct_filter_values(spark, sf_dir):
    """A7 available-filter values: sorted distinct (lang, source)
    (filter_manager.py:99-125)."""
    return (_t(spark, sf_dir, 'documents')
            .select('lang', 'source').distinct()
            .orderBy('lang', 'source'))


def q_a8_corpus_stats(spark, sf_dir):
    """A8 corpus counts + per-lang char stats."""
    return (_t(spark, sf_dir, 'documents')
            .groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('n_chars').cast('long').alias('total_chars'),
                 F.round(F.avg('n_chars'), 6).alias('avg_chars'))
            .orderBy('lang'))


def q_j1_anti_join(spark, sf_dir):
    """J1 duplicate-lookup as anti-join (document_storage.py:86-103):
    customers with no orders, counted per market segment."""
    c = _t(spark, sf_dir, 'customer')
    o = _t(spark, sf_dir, 'orders')
    return (c.join(o.select('o_custkey').distinct(),
                   c.c_custkey == F.col('o_custkey'), 'left_anti')
            .groupBy('c_mktsegment')
            .agg(F.count('*').cast('long').alias('n_custs'))
            .orderBy('c_mktsegment'))


def q_j2_broadcast_join(spark, sf_dir):
    """J2 broadcast hash join (search_engine.py:160-174 analogue):
    revenue per market segment, dimension side broadcast."""
    c = _t(spark, sf_dir, 'customer')
    o = _t(spark, sf_dir, 'orders')
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy('c_mktsegment')
            .agg(F.round(F.sum('o_totalprice'), 4).alias('revenue'),
                 F.count('*').cast('long').alias('n_orders'))
            .orderBy('c_mktsegment'))


def q_j3_semi_join(spark, sf_dir):
    """J3 semi-join expansion (filter_manager.py:56-68 analogue):
    orders of BUILDING-segment customers, counted by status."""
    c = _t(spark, sf_dir, 'customer').filter(F.col('c_mktsegment') == 'BUILDING')
    o = _t(spark, sf_dir, 'orders')
    return (o.join(F.broadcast(c.select('c_custkey')),
                   o.o_custkey == F.col('c_custkey'), 'left_semi')
            .groupBy('o_orderstatus')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('o_orderstatus'))


def q_tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style aggregation over lineitem (hash agg with map-side
    combine; the workhorse plan shape for corpus statistics)."""
    li = _t(spark, sf_dir, 'lineitem')
    return (li.filter(F.col('l_shipdate') <= F.lit('1998-09-02'))
            .groupBy('l_returnflag', 'l_linestatus')
            .agg(F.round(F.sum('l_quantity'), 4).alias('sum_qty'),
                 F.round(F.sum('l_extendedprice'), 4).alias('sum_base_price'),
                 F.round(F.sum(F.col('l_extendedprice') * (1 - F.col('l_discount'))), 4)
                 .alias('sum_disc_price'),
                 F.round(F.avg('l_quantity'), 6).alias('avg_qty'),
                 F.count('*').cast('long').alias('count_order'))
            .orderBy('l_returnflag', 'l_linestatus'))


def q_set_ops(spark, sf_dir):
    """Set operators: doc_ids in lang 'en' INTERSECT source 'src1',
    plus EXCEPT count — exercised over the documents table."""
    d = _t(spark, sf_dir, 'documents')
    en = d.filter(F.col('lang') == 'en').select('doc_id')
    s1 = d.filter(F.col('source') == 'src1').select('doc_id')
    inter = en.intersect(s1).count()
    minus = en.exceptAll(s1).count()
    union = en.union(s1).distinct().count()
    return spark.createDataFrame(
        [(int(inter), int(minus), int(union))],
        'n_intersect long, n_except long, n_union long')


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (operators/textstats.py): predicted lang
    per doc from marker-word counts; returns per-(lang, pred) counts."""
    d = textstats.with_lang_id(_ts(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('lang', 'lang_pred')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('lang', 'lang_pred'))


# One sample per script family + the contract's edge cases; sid pins
# the construction. The SQL oracle inlines the same rows as VALUES.
_SCRIPT_SAMPLES: list[tuple[int, str]] = [
    (1, 'The quick brown fox jumps over the lazy dog'),
    (2, 'Привет мир это тест русского текста'),
    (3, 'مرحبا بالعالم هذا نص عربي للاختبار'),
    (4, 'नमस्ते दुनिया यह परीक्षण है'),
    (5, '안녕하세요 세계 한국어 테스트입니다'),
    (6, 'こんにちは世界 これはテストです'),      # kana+han → jpan
    (7, 'Γεια σου κόσμε αυτό είναι δοκιμή'),
    (8, 'שלום עולם זה מבחן'),
    (9, 'สวัสดีชาวโลก นี่คือการทดสอบ'),
    (10, '你好世界这是中文测试文本'),              # pure han → hani
    (11, '12345 67890 !!! ???'),                  # no script chars → und
    (12, 'abc где αβγ'),                          # 3-way tie → mixed
    (13, '漢字漢字漢字漢字漢字の'),                # han-heavy + 1 kana → jpan
    (14, 'hello world это'),                      # latn majority → latn
]


def q_script_id(spark, sf_dir):
    """Dominant-script classification (textstats.with_script_id, round
    7 — the routing step before per-script language ID): per-(src,
    script) doc counts over the corpus UNION 14 planted samples that
    exercise every script family plus the und/mixed/jpan-threshold
    edges. Each planted script appears exactly once, so the (planted,
    script) rows pin every sample's label individually; the corpus
    rows pin the latn/hani split of the real documents table. The
    DuckDB oracle re-derives all ten code-point counts independently
    (length(regexp_replace)) and repeats the pinned CASE chain."""
    d = (_t(spark, sf_dir, 'documents')
         .select(F.lit('corpus').alias('src'), 'text'))
    planted = (spark.createDataFrame(_SCRIPT_SAMPLES, 'sid long, text string')
               .select(F.lit('planted').alias('src'), 'text'))
    out = textstats.with_script_id(d.unionByName(planted), 'text')
    return (out.groupBy('src', 'script')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('src', 'script'))


def q_quality_scores(spark, sf_dir):
    """Quality heuristics aggregated per source."""
    d = textstats.with_quality(_ts(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('source')
            .agg(F.round(F.avg('alpha_ratio'), 6).alias('avg_alpha'),
                 F.round(F.avg('digit_ratio'), 6).alias('avg_digit'),
                 F.sum(F.col('quality_ok').cast('long')).cast('long').alias('n_ok'))
            .orderBy('source'))


def q_model_quality_gate(spark, sf_dir):
    """Model-based quality filter (operators/quality_model, round 5 —
    the FineWeb-Edu/DCLM stage the heuristic gates approximate): the
    frozen linear model scores every document as ONE codegen fold over
    an inlined term→weight map (no shuffle, no Python — plan-pinned in
    test_quality_model), gate = margin units > 0. Integer-unit weights
    make per-doc sums EXACT under any addition order, so Spark's
    ordered fold and DuckDB's unordered SUM agree bit-for-bit; the
    per-source (n_docs, n_pass, sum_units) triple witnesses every
    document's exact score sum, not just the gate bit."""
    from .operators.quality_model import model_quality_units
    d = model_quality_units(_t(spark, sf_dir, 'documents'))
    return (d.groupBy('source')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum((F.col('mq_units') > 0).cast('int'))
                 .cast('long').alias('n_pass'),
                 F.sum('mq_units').cast('long').alias('sum_units'))
            .orderBy('source'))


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish subword estimate, corpus
    totals per lang."""
    d = textstats.with_token_counts(_ts(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('lang')
            .agg(F.sum('ws_tokens').cast('long').alias('total_ws_tokens'),
                 F.sum('bpe_ish_tokens').cast('long').alias('total_bpe_tokens'))
            .orderBy('lang'))


def q_token_counts_bpe(spark, sf_dir):
    """EXACT BPE token counting (kernels/bpe.py + textstats.
    with_exact_token_counts, round 5): the real merge loop over the
    pinned table, per-lang corpus totals. Oracle: per-word counts for
    the corpus lexicon computed by tests/reference_bpe.py (the
    independent GPT-2-loop transcription), pasted as a VALUES map —
    any word the map misses NULL-poisons the oracle total, so lexicon
    drift fails loudly instead of silently passing."""
    d = textstats.with_exact_token_counts(
        _t(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('lang')
            .agg(F.sum(F.size(F.split(F.trim(F.col('text')), r'\s+')))
                 .cast('long').alias('total_ws_tokens'),
                 F.sum('bpe_tokens').cast('long').alias('total_bpe_exact'))
            .orderBy('lang'))


def q_tokenizer_report(spark, sf_dir):
    """Tokenizer fertility/compression per language
    (textstats.tokenizer_report, round 6): exact-BPE tokens per
    whitespace word and characters per token, from one Arrow pass +
    one narrow aggregate. Oracle: the reference-BPE per-word count
    map (q_token_counts_bpe's VALUES, loud on lexicon drift) + the
    same exact-sum divisions."""
    from .operators.textstats import tokenizer_report
    return (tokenizer_report(_t(spark, sf_dir, 'documents'))
            .orderBy('lang'))


def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 + xxhash64 of normalized text;
    distinct-fingerprint count per lang."""
    d = textstats.with_fingerprint(_t(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('lang')
            .agg(F.countDistinct('fp_md5').cast('long').alias('n_fp'))
            .orderBy('lang'))


def q_emb_cosine_topk(spark, sf_dir):
    """Embedding similarity: brute-force cosine top-10 vs the vec_id=0
    query vector (array<float> → double math, rounded)."""
    vecs = _t(spark, sf_dir, 'embeddings')
    q = vecs.filter(F.col('vec_id') == 0).select('embedding').collect()[0][0]
    return brute_force_topk(vecs, [float(x) for x in q], k=10)


def q_emb_centroid_per_label(spark, sf_dir):
    """Per-label centroid norm: aggregate elementwise mean over the
    embedding array (posexplode + groupBy), rounded."""
    vecs = _t(spark, sf_dir, 'embeddings')
    ex = vecs.select('label', F.posexplode('embedding').alias('pos', 'v'))
    cent = (ex.groupBy('label', 'pos')
            .agg(F.avg(F.col('v').cast('double')).alias('m')))
    return (cent.groupBy('label')
            .agg(F.round(F.sqrt(F.sum(F.col('m') * F.col('m'))), 6)
                 .alias('centroid_norm'))
            .orderBy('label'))


def q_rollup_orders(spark, sf_dir):
    """Grouping sets: ROLLUP over (orderstatus, orderpriority) with
    grand totals — the hierarchical-summary shape of corpus reporting
    (free in Catalyst; SURVEY.md §2.4 notes the reference has none)."""
    o = _t(spark, sf_dir, 'orders')
    return (o.rollup('o_orderstatus', 'o_orderpriority')
            .agg(F.count('*').cast('long').alias('n'),
                 F.round(F.sum('o_totalprice'), 4).alias('total'))
            .select(F.coalesce('o_orderstatus', F.lit('ALL')).alias('status'),
                    F.coalesce('o_orderpriority', F.lit('ALL')).alias('priority'),
                    'n', 'total')
            .orderBy('status', 'priority'))


def q_cube_events(spark, sf_dir):
    """Grouping sets: CUBE over (event_type, hour-of-day bucket)."""
    e = _t(spark, sf_dir, 'events').withColumn(
        'hour_bucket', (F.hour('ts') / 6).cast('int'))
    return (e.cube('event_type', 'hour_bucket')
            .agg(F.count('*').cast('long').alias('n'),
                 F.round(F.sum('value'), 4).alias('total_value'))
            .select(F.coalesce('event_type', F.lit('ALL')).alias('etype'),
                    F.coalesce(F.col('hour_bucket').cast('string'),
                               F.lit('ALL')).alias('hbucket'),
                    'n', 'total_value')
            .orderBy('etype', 'hbucket'))


_SNIPPET_TOKENS = ['data', 'model']  # pinned; phrase = 'data model'

# q_search_pipeline's query string; its stems are computed ONCE here on
# the driver — the same call search() makes — and inlined into the
# DuckDB oracle as literals, so the oracle tracks the stemmer exactly
_SEARCH_QUERY = 'data models'


def _pagerank_oracle_sql(iterations: int = 10, num: int = 85,
                         den: int = 100) -> str:
    """Replay q_pagerank_centrality's exact integer fixed-point power
    iteration as unrolled CTEs (DuckDB forbids aggregates inside a
    recursive CTE term, so the fixed iteration count is unrolled)."""
    scale = 10 ** 12
    base = ((den - num) * scale) // den
    parts = [f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        e AS (
            SELECT doc_id AS src,
                   (doc_id * 13 + 7) % (SELECT n FROM nn) AS dst
            FROM documents
            UNION ALL
            SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
            FROM documents
        ),
        nodes AS (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        ed AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
        r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"""]
    for i in range(1, iterations + 1):
        parts.append(f""",
        r{i} AS (
            SELECT nodes.node,
                   CAST({base} + ({num} * COALESCE(c.contrib, 0)) // {den}
                        AS BIGINT) AS rank
            FROM nodes LEFT JOIN (
                SELECT dst AS node, sum(rank // outdeg) AS contrib
                FROM ed JOIN r{i - 1} ON r{i - 1}.node = ed.src
                GROUP BY dst) c USING (node))""")
    parts.append(f"""
        SELECT node, rank FROM r{iterations}
        ORDER BY rank DESC, node ASC LIMIT 20
    """)
    return ''.join(parts)


def _gopher_dup_ngrams_oracle_sql(ns=(5, 6, 7, 8, 9, 10)) -> str:
    """Generated oracle for q_gopher_dup_ngrams: one UNION ALL window
    branch per n (a VALUES alias cannot be referenced inside a LATERAL
    in DuckDB — measured INTERNAL binder error), then within-doc
    duplicate counts, span-union coverage, char weights, and a pivot —
    all re-derived from scratch."""
    branches = '\n              UNION ALL\n'.join(f"""
              SELECT doc_id, {k} AS n, i AS s,
                     array_to_string(ws[(i+1):(i+{k})], ' ') AS gr
              FROM wa, LATERAL (SELECT unnest(range(0,
                       greatest(len(ws) - {k - 1}, 0))) AS i)""" [1:]
                                                  for k in ns)
    piv = ',\n                       '.join(
        f'max(CASE WHEN n = {k} THEN cc END) AS c{k}' for k in ns)
    outs = ',\n               '.join(
        f'round(COALESCE(c{k}, 0) / greatest(total_chars, 1), 6) '
        f'AS dup_{k}gram_char_frac' for k in ns)
    return rf"""
        WITH t AS (SELECT doc_id,
                          CASE WHEN doc_id % 4 = 0
                               THEN text || ' ' || text
                               ELSE text END AS text
                   FROM documents),
        wa AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text),
                                                     '\s+'),
                                  x -> len(x) > 0) AS ws
               FROM t),
        chars AS (SELECT doc_id,
                         COALESCE(list_sum(list_transform(ws,
                                  x -> len(x))), 0) AS total_chars
                  FROM wa),
        g AS ({branches}),
        d AS (SELECT doc_id, n, gr FROM g GROUP BY doc_id, n, gr
              HAVING count(*) >= 2),
        c AS (SELECT DISTINCT g.doc_id, g.n, p
              FROM g JOIN d USING (doc_id, n, gr),
                   LATERAL (SELECT unnest(range(g.s, g.s + g.n)) AS p)),
        s AS (SELECT c.doc_id, c.n, sum(len(ws[p + 1])) AS cc
              FROM c JOIN wa ON c.doc_id = wa.doc_id
              GROUP BY c.doc_id, c.n),
        piv AS (SELECT doc_id,
                       {piv}
                FROM s GROUP BY doc_id)
        SELECT chars.doc_id,
               {outs}
        FROM chars LEFT JOIN piv USING (doc_id)
        ORDER BY chars.doc_id
    """


def _search_pipeline_oracle_sql() -> str:
    """Full-pipeline oracle for q_search_pipeline: relevance (substring
    counts + the in-loop +10-per-token phrase bonus), score>0, top-10
    by (score desc, url asc), and the 200-char/stride-50 sliding-window
    snippet — q_w2's hash-green SQL reconstruction, parameterized by
    the driver-computed stems of _SEARCH_QUERY."""
    from .kernels.query import preprocess_query
    toks = preprocess_query(_SEARCH_QUERY)
    assert toks and all(t.isascii() and t.isalnum() for t in toks), toks
    phrase = ' '.join(toks)
    bonus = 10 * len(toks) if len(toks) > 1 else 0

    def counts(col: str) -> str:
        return ' + '.join(
            f"(length({col}) - length(replace({col}, '{t}', ''))) / {len(t)}"
            for t in toks)

    win = 'substr(h.t, CAST(w.i AS INT) + 1, 200)'
    return rf"""
        WITH d AS (SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS url,
                          lower(text) AS t
                   FROM documents),
        scored AS (
            SELECT url, t,
                   CAST({counts('t')}
                        + CASE WHEN position('{phrase}' IN t) > 0
                               THEN {bonus} ELSE 0 END AS BIGINT) AS score
            FROM d),
        hits AS (SELECT * FROM scored WHERE score > 0
                 ORDER BY score DESC, url ASC LIMIT 10),
        wins AS (
            SELECT h.url, h.t, h.score, w.i,
                   CAST({counts(win)} AS BIGINT) AS wcount
            FROM hits h,
                 LATERAL (SELECT unnest(list_append(
                     range(0, greatest(length(h.t) - 200, 0), 50), 0)) AS i) w),
        best AS (
            SELECT url, t, score, i AS best_pos, wcount,
                   row_number() OVER (PARTITION BY url
                                      ORDER BY wcount DESC, i ASC) AS rn
            FROM wins),
        pick AS (
            SELECT url, score, t,
                   CASE WHEN wcount = 0 THEN 0 ELSE best_pos END AS pos
            FROM best WHERE rn = 1),
        cleaned AS (
            SELECT url, score, t, pos,
                   trim(regexp_replace(
                       replace(substr(t, CAST(pos AS INT) + 1, 200), chr(10), ' '),
                       '\s+', ' ', 'g')) AS body
            FROM pick)
        SELECT url, score,
               (CASE WHEN pos > 0 THEN '...' ELSE '' END) || body
               || (CASE WHEN pos + 200 < length(t) THEN '...' ELSE '' END)
                   AS snippet
        FROM cleaned ORDER BY score DESC, url ASC
    """


def q_w2_search_snippets(spark, sf_dir):
    """W1+W2+W3+F6 composed: reference-semantics relevance (substring
    counts + the in-loop phrase bonus of +10 per token), score>0
    filter, top-10, and the 200-char/stride-50 sliding-window snippet
    with first-max tie-break, whitespace cleanup and ellipses —
    computed by the engine's pandas-UDF kernels and cross-checked
    against a pure-SQL reconstruction in DuckDB."""
    from .config import DEFAULT_CONFIG
    from .operators.search import _relevance_udf, _snippet_udf
    toks = list(_SNIPPET_TOKENS)
    rel = _relevance_udf(toks)
    snip = _snippet_udf(toks, DEFAULT_CONFIG.snippet_length,
                        DEFAULT_CONFIG.snippet_stride)

    d = _t(spark, sf_dir, 'documents')
    out = (d.withColumn('score', rel(F.col('text')))
           .filter(F.col('score') > 0)
           .orderBy(F.desc('score'), F.asc('doc_id'))
           .limit(10)
           .withColumn('snippet', snip(F.col('text'))))
    return out.select('doc_id', 'score', 'snippet')


def q_skew_salted_counts(spark, sf_dir):
    """Salted two-stage aggregation (operators/skew.py) over a skewed
    key — user_id event counts. The salt splits hot keys across
    reducers; the merged result is byte-equal to a plain GROUP BY,
    which is exactly what the oracle asserts."""
    from .operators.skew import salted_count
    ev = _t(spark, sf_dir, 'events')
    return (salted_count(ev, F.col('user_id'), salt_buckets=8,
                         key_name='user_id')
            .orderBy('user_id'))


def q_f1_size_reject(spark, sf_dir):
    """F1 file-size predicate (operators/extraction.size_ok_col;
    reference document_processor.py:66-73): accept/reject counts at a
    1500-byte threshold over the UTF-8 payload size."""
    from .operators.extraction import size_ok_col
    d = _t(spark, sf_dir, 'documents')
    ok = size_ok_col(F.encode(F.col('text'), 'UTF-8'), 1500)
    return (d.groupBy(ok.alias('accepted'))
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('accepted'))


def q_f4_category_overlap(spark, sf_dir):
    """F4 category-overlap filter (operators/search.category_filter;
    reference filter_manager.py:25-34): docs whose category array
    overlaps the wanted list, counted per (lang, source). Categories
    are derived natively from (lang, source) so the arrays_overlap
    path is exercised with a SQL-checkable input."""
    from .operators.search import category_filter
    d = _t(spark, sf_dir, 'documents').withColumn(
        'categories', F.array('lang', 'source'))
    return (category_filter(d, ['de', 'src1'])
            .groupBy('lang', 'source')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('lang', 'source'))


def q_f5_structured_semi_join(spark, sf_dir):
    """F5 structured category filter (operators/search.
    structured_category_filter + operators/categorize.
    category_dimension; reference filter_manager.py:52-68): resolve a
    type filter + a keyword filter against the category dimension,
    broadcast-semi-join the docs, count per (lang, source)."""
    from .operators.categorize import category_dimension
    from .operators.search import structured_category_filter
    dim = category_dimension(
        spark, ['Lang: en', 'Lang: de', 'Source: src1'])
    d = _t(spark, sf_dir, 'documents').withColumn(
        'categories',
        F.array(F.concat(F.lit('Lang: '), F.col('lang')),
                F.concat(F.lit('Source: '), F.col('source'))))
    hit = structured_category_filter(d, dim, category_types=['Lang'],
                                     keywords=['src1'])
    return (hit.groupBy('lang', 'source')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('lang', 'source'))


def q_j4_status_projection(spark, sf_dir):
    """J4 status projection (pipeline.with_status; reference
    app/api/status.py:36-42): error/processing/processed counts over
    deterministically derived is_error/categories flags."""
    from .pipeline import with_status
    d = (_t(spark, sf_dir, 'documents')
         .withColumn('is_error', F.col('doc_id') % 11 == 0)
         .withColumn('categories',
                     F.when(F.col('doc_id') % 3 == 0,
                            F.array().cast('array<string>'))
                     .otherwise(F.array(F.lit('Topic: sample')))))
    return (with_status(d).groupBy('status')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('status'))


def q_d3_destructive_dedup(spark, sf_dir):
    """D3 destructive dedup (operators/dedup.dedup_exact; reference
    document_storage.py:105-138): per-lang count of REMOVED rows —
    the destructive delta — via survivors anti-join."""
    d = _t(spark, sf_dir, 'documents').withColumn(
        'h', F.md5(F.encode(F.col('text'), 'UTF-8')))
    surv = dedup_exact(d, hash_col='h', order_cols=('doc_id',))
    removed = d.join(surv.select('doc_id'), on='doc_id', how='left_anti')
    return (removed.groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_removed'))
            .orderBy('lang'))


def q_a6_topic_type(spark, sf_dir):
    """A6 topic-type scoring (operators/categorize.with_topic_type;
    reference _determine_topic_type, category_manager.py:266-296):
    per-doc argmax over the pinned keyword table, counted per type."""
    from .operators.categorize import with_topic_type
    d = with_topic_type(_t(spark, sf_dir, 'documents'), 'text')
    return (d.groupBy('topic_type')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('topic_type'))


def q_error_taxonomy(spark, sf_dir):
    """Typed error-code classifier (operators/extraction.
    error_code_col; reference analogue app/core/exceptions.py) over a
    deterministic mix of the kernel's pinned error strings and clean
    text."""
    from .operators.extraction import error_code_col
    d = _t(spark, sf_dir, 'documents')
    msg = (F.when(F.col('doc_id') % 7 == 0, F.lit('Error: File too large'))
           .when(F.col('doc_id') % 7 == 1,
                 F.lit('Error: PDF extraction timed out after 120 seconds. '
                       'The file may be too large or complex.'))
           .when(F.col('doc_id') % 7 == 2, F.lit('Error extracting text: boom'))
           .when(F.col('doc_id') % 7 == 3,
                 F.lit('Error: No text could be extracted from the PDF'))
           .otherwise(F.col('text')))
    return (d.select(error_code_col(msg).alias('error_code'))
            .groupBy('error_code')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('error_code'))


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing (operators/textstats.with_redacted): deterministic
    emails/URLs/phone strings are embedded per doc, then redacted in
    the pinned URL→EMAIL→PHONE order; per-lang counts of each PII kind
    plus a hash-stable sample of redacted text lengths."""
    d = _t(spark, sf_dir, 'documents')
    sid = F.col('doc_id').cast('string')
    msg = F.concat(F.col('text'),
                   F.lit(' contact user'), sid,
                   F.lit('@example.com or https://ex.com/p/'), sid,
                   F.lit(' tel +1 (555) 000-'), F.lpad(sid, 4, '0'))
    staged = d.withColumn('__msg', msg)
    red = textstats.with_redacted(staged, '__msg')
    return (red.groupBy('lang')
            .agg(F.sum('n_urls').cast('long').alias('total_urls'),
                 F.sum('n_emails').cast('long').alias('total_emails'),
                 F.sum('n_phones').cast('long').alias('total_phones'),
                 F.sum(F.length('redacted_text')).cast('long')
                 .alias('total_redacted_chars'))
            .orderBy('lang'))


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters (operators/textstats.
    repetition_stats): per-doc top-word fraction, distinct-word ratio
    and word count."""
    d = _t(spark, sf_dir, 'documents')
    return textstats.repetition_stats(d, 'doc_id', 'text').orderBy('doc_id')


def q_source_quality_gate(spark, sf_dir):
    """C4-style group quality gate (operators/textstats.
    source_quality_gate): keep docs whose source's mean alpha ratio
    clears 0.8232 (a max-gap threshold on this corpus, so the pass set
    is stable against float noise); surviving doc counts per source."""
    d = _t(spark, sf_dir, 'documents')
    gated = textstats.source_quality_gate(d, 'source', 'text',
                                          min_avg_alpha=0.8232)
    return (gated.groupBy('source')
            .agg(F.count('*').cast('long').alias('n'))
            .orderBy('source'))


def q_doc_chunking(spark, sf_dir):
    """Context-window chunking (operators/textstats.with_chunks,
    chunk=64 overlap=8): per-doc chunk counts + total chunk tokens —
    the training-window prep stage, value-checked against a DuckDB
    list-slicing mirror."""
    d = _t(spark, sf_dir, 'documents')
    ch = textstats.with_chunks(d, 'doc_id', 'text',
                               chunk_tokens=64, overlap=8)
    return (ch.groupBy('doc_id')
            .agg(F.count('*').cast('long').alias('n_chunks'),
                 F.sum('n_tokens').cast('long').alias('total_chunk_tokens'),
                 F.md5(F.concat_ws('\x1f',
                                   F.array_sort(F.collect_list(
                                       F.concat_ws(':', F.col('chunk_idx'),
                                                   F.col('chunk_text'))))))
                 .alias('chunks_digest'))
            .orderBy('doc_id'))


def q_skew_salted_agg(spark, sf_dir):
    """General two-stage salted aggregation (operators/skew.salted_agg)
    over the skewed events table: per-event_type count + sum + max of
    value. The oracle asserts byte-equality with a plain GROUP BY —
    the salting must be algebraically invisible."""
    from .operators.skew import salted_agg
    ev = _t(spark, sf_dir, 'events')
    out = salted_agg(
        ev, ['event_type'],
        aggs_partial=[F.count('*').alias('__n'),
                      F.sum('value').alias('__s'),
                      F.max('value').alias('__m')],
        aggs_merge=[F.sum('__n').cast('long').alias('n'),
                    F.round(F.sum('__s'), 4).alias('total_value'),
                    F.round(F.max('__m'), 6).alias('max_value')])
    return out.orderBy('event_type')


def q_emb_cosine_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (operators/similarity.
    pairwise_cosine_dups, hyperplane-LSH blocked) over the embeddings
    table unioned with an exactly-duplicated slice (vec_id%5==0,
    shifted ids). The fixture's max natural pairwise cosine is ~0.51,
    so at threshold 0.95 the true pair set is exactly the duplicate
    identities — which identical vectors' identical buckets provably
    find — making the LSH operator's output equal to the exact DuckDB
    all-pairs oracle. ``max_bucket_size`` is set above the table size
    so every bucket takes the dense branch: the star-expansion branch
    only guarantees pairs THROUGH the hub, so the exact-equality claim
    would be fragile to fixture growth otherwise (ADVICE r2)."""
    from .operators.similarity import pairwise_cosine_dups
    vecs = _t(spark, sf_dir, 'embeddings').select('vec_id', 'embedding')
    dup = (vecs.filter(F.col('vec_id') % 5 == 0)
           .withColumn('vec_id', F.col('vec_id') + 100000))
    both = vecs.unionByName(dup)
    from .operators.dedup import release as _release
    res = pairwise_cosine_dups(both, threshold=0.95, planes=6,
                               max_bucket_size=1_000_000)
    out = res.orderBy('id_a', 'id_b')   # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_ngram_jaccard_exact(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (k=3, threshold 0.5,
    blocking through shingles with document frequency ≤ 256) — the
    hash-green anchor for the near-dup family. The DuckDB oracle
    replicates both the blocking contract and the exact arithmetic, so
    this is a full value-level check of operators/dedup.py:
    ngram_jaccard_pairs."""
    from .operators.dedup import release as _release
    d = _t(spark, sf_dir, 'documents')
    res = ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.5,
                              max_shingle_df=256)
    out = (res.select('id_a', 'id_b',
                      F.round('jaccard', 6).alias('jaccard'))
           .orderBy('id_a', 'id_b'))   # select/orderBy drop deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_tfidf_top_terms(spark, sf_dir):
    """Exact-term TF-IDF (operators/textstats.tfidf_terms — the
    SQL-checkable sibling of the HashingTF+IDF featurizer the north
    star names; Spark ML IDF smoothing ln((N+1)/(df+1))): top-20 terms
    by corpus-summed tf-idf. The sum is rounded BEFORE the ordering /
    limit on both sides, so rank-boundary ties break on the rounded
    value + term and the top-20 SET is engine-independent."""
    d = _t(spark, sf_dir, 'documents')
    t = textstats.tfidf_terms(d, 'doc_id', 'text', min_token_len=3)
    return (t.groupBy('term')
            .agg(F.max('df_count').cast('long').alias('df_count'),
                 F.round(F.sum('tfidf'), 3).alias('tfidf_sum'))
            .orderBy(F.desc('tfidf_sum'), F.asc('term'))
            .limit(20))


def q_asof_join(spark, sf_dir):
    """Backward-inclusive as-of join (operators/asof.asof_join — the
    union + windowed last(ignorenulls) re-expression; one shuffle, no
    range-join blowup): every event gains the latest checkpoint row
    (a deterministic events subset) at or before its timestamp;
    aggregated per event_type. Oracle: DuckDB's native ASOF LEFT JOIN
    — a true independent implementation of the semantics.

    strategy='inline': events rows are SKINNY (two longs, a double, a
    short categorical string), so carrying them through the window
    exchange is cheaper than the narrow form's resolve+join-back
    (interleaved quiet A/B at sf0.1/local[32]: inline 0.57-0.61 s vs
    narrow 0.82-0.88 s — the join-back broadcast build is a constant
    ~0.25 s the skinny payload can't amortize). Wide-left inputs take
    strategy='narrow' (plan-pinned in test_plan_audit)."""
    from .operators.asof import asof_join
    ev = _t(spark, sf_dir, 'events').select(
        'event_id', 'ts', 'user_id', 'event_type', 'value')
    cps = (ev.filter(F.col('event_id') % 7 == 0)
           .groupBy('user_id', 'ts')
           .agg(F.max('value').alias('cp_value'))
           .withColumnRenamed('ts', 'cp_ts'))
    joined = asof_join(ev, cps, on='user_id',
                       left_ts='ts', right_ts='cp_ts',
                       payload_cols=['cp_value'], strategy='inline')
    return (joined.groupBy('event_type')
            .agg(F.count('*').cast('long').alias('n_events'),
                 F.sum(F.col('cp_value').isNotNull().cast('long'))
                 .cast('long').alias('n_matched'),
                 F.round(F.coalesce(F.sum('cp_value'), F.lit(0.0)), 4)
                 .alias('total_cp_value'))
            .orderBy('event_type'))


def q_url_canonicalization(spark, sf_dir):
    """URL canonicalization + per-domain stats (operators/urls — all
    native regexp/string expressions, codegen'd): messy URL variants
    (WWW., default ports, utm params, fragments, trailing slash) are
    synthesized deterministically from doc_id, canonicalized, and
    grouped by registered domain. The oracle derives the EXPECTED
    canonical form independently from the same doc_id arithmetic —
    checking output values, not re-running the transform."""
    from .operators.urls import with_canonical_url
    d = _t(spark, sf_dir, 'documents')
    sid = F.col('doc_id')
    host = F.concat(F.lit('s'), (sid % 7).cast('string'), F.lit('.'),
                    F.element_at(F.lit(['example.com', 'sample.org', 'test.net']),
                                 (sid % 3 + 1).cast('int')))
    # path modulus chosen so distinct doc_ids COLLIDE onto the same
    # canonical form through different messy variants (lcm(7,3,10,5) =
    # 210 < 500 docs → ~2.4 urls per canonical at sf0.01) — the check
    # proves variants actually merge, not just that strings round-trip
    path = F.concat(F.lit('/p/'), (sid % 10).cast('string'))
    v = sid % 5
    url = (F.when(v == 0, F.concat(F.lit('https://'), host, path))
           .when(v == 1, F.concat(F.lit('https://WWW.'), F.upper(host),
                                  F.lit(':443'), path, F.lit('/')))
           .when(v == 2, F.concat(F.lit('https://'), host, F.lit(':443'), path,
                                  F.lit('?utm_source=x&utm_campaign=y')))
           .when(v == 3, F.concat(F.lit('https://'), host, path, F.lit('#frag')))
           .otherwise(F.concat(F.lit('https://'), host, path,
                               F.lit('?a=1&utm_medium=z'))))
    cu = with_canonical_url(d.select('doc_id', url.alias('url')))
    return (cu.groupBy('domain')
            .agg(F.count('*').cast('long').alias('n_urls'),
                 F.countDistinct('canonical_url').cast('long').alias('n_canonical'),
                 F.countDistinct('host').cast('long').alias('n_hosts'))
            .orderBy('domain'))


def q_html_meta(spark, sf_dir):
    """HTML head-metadata extraction (extraction.with_html_meta, round
    7 — the crawl-hygiene step before content extraction): pages are
    synthesized deterministically around the documents corpus (title
    from doc_id; a noindex robots meta on doc_id%4==0, an index one on
    %4==1, none otherwise; a rel=canonical to target doc_id//9 on
    doc_id%3==0 — so ~3 live pages consolidate per canonical target),
    passed through as BINARY payloads (the input-hint schema). Reports
    corpus totals: doc count, noindex count, distinct canonical
    targets among live pages, max consolidation fan-in, and an
    order-independent titles digest. The oracle re-derives every
    column with the same pinned regexes (Java regex and RE2 agree on
    these constructs, including ''-on-no-match)."""
    from .operators.extraction import with_html_meta
    d = _t(spark, sf_dir, 'documents')
    did = F.col('doc_id')
    html = F.concat(
        F.lit('<html><head><title>Doc '), did.cast('string'),
        F.lit('</title>'),
        F.when(did % 4 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(did % 4 == 1,
              F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit('')),
        F.when(did % 3 == 0, F.concat(
            F.lit('<link rel="canonical" href="https://canon.example/p/'),
            # DIV, not floor(did / 9): long/long `/` goes through DOUBLE
            # and loses exactness above 2^53 (ADVICE r7; round-5 rule) —
            # identical for every non-negative sub-2^53 doc_id
            F.expr('doc_id DIV 9').cast('long').cast('string'), F.lit('">')))
        .otherwise(F.lit('')),
        F.lit('</head><body>'), F.col('text'), F.lit('</body></html>'))
    url = F.concat(F.lit('https://crawl.example/p/'), did.cast('string'))
    m = with_html_meta(d.select(
        'doc_id', html.cast('binary').alias('html'), url.alias('url')))
    per_t = (m.filter(~F.col('noindex'))
             .groupBy('canonical_target').agg(F.count('*').alias('n')))
    return (m.agg(
        F.count('*').cast('long').alias('n_docs'),
        F.sum(F.col('noindex').cast('long')).cast('long').alias('n_noindex'),
        F.md5(F.concat_ws('\x1f', F.array_sort(
            F.collect_list('html_title')))).alias('titles_md5'))
        .crossJoin(per_t.agg(
            F.count('*').cast('long').alias('n_targets'),
            F.max('n').cast('long').alias('max_consolidation'))))


def q_crawl_delta(spark, sf_dir):
    """Crawl-snapshot delta report (operators/urls.crawl_delta, round
    7): old = the documents corpus with urls derived from doc_id; new
    = a deterministic mutation (doc_id%7==3 removed, doc_id%5==0
    rewritten with an ' [updated]' suffix, one '?page=2' sibling added
    per doc_id%11==0). The operator classifies every url as added /
    removed / changed / unchanged from content md5s; the report is
    per-status count + order-independent urls_md5, so the oracle
    value-checks EVERY url's classification, not just the counts. The
    oracle re-derives the mutation and the full-outer-join delta in
    SQL from the same arithmetic."""
    from .operators.urls import crawl_delta
    d = _t(spark, sf_dir, 'documents')
    url = F.concat(F.lit('https://crawl.example/p/'),
                   F.col('doc_id').cast('string'))
    old = d.select(url.alias('url'), 'text')
    new_kept = (d.filter(F.col('doc_id') % 7 != 3)
                .select(url.alias('url'),
                        F.when(F.col('doc_id') % 5 == 0,
                               F.concat(F.col('text'), F.lit(' [updated]')))
                        .otherwise(F.col('text')).alias('text')))
    new_added = (d.filter(F.col('doc_id') % 11 == 0)
                 .select(F.concat(url, F.lit('?page=2')).alias('url'),
                         F.concat(F.lit('continuation of '),
                                  F.col('doc_id').cast('string'))
                         .alias('text')))
    res = crawl_delta(old, new_kept.unionByName(new_added), 'url', 'text')
    return (res.groupBy('status')
            .agg(F.count('*').cast('long').alias('n'),
                 F.md5(F.concat_ws(',', F.array_sort(F.collect_list('url'))))
                 .alias('urls_md5'))
            .orderBy('status'))


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — the training-data mixing
    primitive: per-language quotas selected by a content-independent
    hash threshold (first 3 hex chars of ``md5(doc_id)`` compared
    against a per-stratum hex cutoff — fixed-width lowercase hex
    compares lexicographically AS a number, and md5 is bit-identical
    in every engine, unlike xxhash64 which DuckDB lacks), so the
    sample is reproducible across runs/cluster sizes, requires NO
    shuffle (a scan-level filter Catalyst pushes down), and composes
    with dedup (same row always picked). Quotas (per 4096): en 2048,
    de 1024, others 410."""
    d = _t(spark, sf_dir, 'documents')
    cutoff = (F.when(F.col('lang') == 'en', '800')
              .when(F.col('lang') == 'de', '400')
              .otherwise('19a'))
    h3 = F.substring(F.md5(F.encode(F.col('doc_id').cast('string'),
                                    'UTF-8')), 1, 3)
    picked = d.filter(h3 < cutoff)
    return (picked.groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_sampled'),
                 F.sum('n_chars').cast('long').alias('sampled_chars'))
            .orderBy('lang'))


def q_event_percentiles(spark, sf_dir):
    """Exact grouped percentiles (monitoring/stats family): p50/p90/p99
    of event value per event_type via Spark's exact ``percentile``
    (continuous interpolation) — DuckDB's ``quantile_cont`` implements
    the same definition, so this is value-oracled, unlike
    approx_percentile sketches."""
    e = _t(spark, sf_dir, 'events')
    return (e.groupBy('event_type')
            .agg(F.round(F.percentile('value', 0.5), 6).alias('p50'),
                 F.round(F.percentile('value', 0.9), 6).alias('p90'),
                 F.round(F.percentile('value', 0.99), 6).alias('p99'),
                 F.count('*').cast('long').alias('n'))
            .orderBy('event_type'))


# ---- non-SQL-expressible (rows-only checks) -------------------------

def q_minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup pairs over documents (no SQL oracle —
    LSH banding; driver records a rows-only check)."""
    from .operators.dedup import release as _release
    d = _t(spark, sf_dir, 'documents')
    res = minhash_lsh_pairs(d, 'doc_id', 'text',
                            num_hashes=64, bands=16,
                            jaccard_threshold=0.8)
    out = res.orderBy('id_a', 'id_b')   # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs over documents (rows-only check)."""
    from .operators.dedup import release as _release
    d = _t(spark, sf_dir, 'documents')
    res = simhash_near_pairs(d, 'doc_id', 'text', max_hamming=3)
    out = res.orderBy('id_a', 'id_b')   # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_lda_categories(spark, sf_dir):
    """A3-A6 composed, VALUE-ORACLED via the assignment-arity histogram
    (VERDICT r3 #3): CountVectorizer(pinned-order vocab) + LDA(k=8,
    seed=42, maxIter=10) over the documents table, then n_docs per
    number of assigned categories (arity 1-3: topics over the 0.1
    threshold, reference category_manager.py:153-185, capped at 3).

    Topic IDENTITIES are not SQL-expressible, but the arity histogram
    is parallelism-invariant at fixed seed — measured identical across
    local[4]/local[8]/local[32] × shuffle 8/32/128 on every test SF.
    The oracle joins the measured golden histogram against a content
    statistic (doc count + total text length), so an unknown dataset
    yields 0 oracle rows — a loud mismatch, never a silent pass."""
    from .operators.categorize import fit_lda_categories
    d = (_t(spark, sf_dir, 'documents')
         .withColumn('preprocessed_text', F.col('text')))
    out = fit_lda_categories(d, max_iter=10)
    return (out.select(F.size('categories').alias('arity'))
            .groupBy('arity')
            .agg(F.count('*').cast('long').alias('n_docs'))
            .orderBy('arity'))


def q_line_dedup(spark, sf_dir):
    """Cross-document exact line dedup (dedup.line_dedup — the CCNet /
    RefinedWeb boilerplate-removal step, round 4): documents' text
    re-laid-out as 4-token lines (construction shared verbatim with
    the SQL oracle), every line occurring in >= 2 distinct docs
    removed, order-preserving rebuild. FULL value check including the
    rebuilt cleaned_text (~11% of lines are cross-doc dups at
    sf0.01)."""
    from .operators.dedup import line_dedup
    k = 4
    toks = F.split(F.col('text'), ' ')
    n = F.size(toks)
    linearr = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(k)).cast('int') - 1),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(k) + F.lit(1), F.lit(k)), ' '))
    d4 = (_t(spark, sf_dir, 'documents')
          .select('doc_id', F.array_join(linearr, '\n').alias('text')))
    return (line_dedup(d4, 'doc_id', 'text', min_df=2)
            .orderBy('doc_id'))


def q_line_dedup_within(spark, sf_dir):
    """Within-document line dedup (dedup.line_dedup_within_doc, round
    7 — zero-shuffle in-row HOF form): each doc becomes a 6-line page
    with its own text twice, a nav-chrome banner three times, and an
    empty line (construction shared verbatim with the oracle) — keep
    first occurrence of each non-empty line, keep empties. FULL value
    check per doc including the rebuilt cleaned_text; the oracle runs
    the EXPLODED window formulation, so parity doubles as the
    in-row ≡ exploded equivalence proof."""
    from .operators.dedup import line_dedup_within_doc
    nl = F.lit('\n')
    page = F.concat(F.col('text'), nl, F.lit('HOME | ABOUT | CONTACT'),
                    nl, F.col('text'), nl, F.lit('HOME | ABOUT | CONTACT'),
                    nl, F.lit(''), nl, F.lit('HOME | ABOUT | CONTACT'))
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id', page.alias('text')))
    return (line_dedup_within_doc(d, 'doc_id', 'text')
            .orderBy('doc_id'))


def q_group_quota(spark, sf_dir):
    """Per-source row quota (dedup.group_quota, round 4 — crawl
    balancing): keep the 30 longest docs per source (n_chars desc,
    doc_id asc tiebreak); per-source survivor counts + id/char sums
    witness the exact survivor SET."""
    from .operators.dedup import group_quota
    d = _t(spark, sf_dir, 'documents')
    out = group_quota(d, 'source', [('n_chars', 'desc'), ('doc_id', 'asc')],
                      cap=30)
    return (out.groupBy('source')
            .agg(F.count('*').cast('long').alias('n_kept'),
                 F.sum('doc_id').cast('long').alias('id_sum'),
                 F.sum('n_chars').cast('long').alias('chars_sum'))
            .orderBy('source'))


def q_substring_duplication(spark, sf_dir):
    """Exact substring-level duplication measure
    (dedup.substring_duplication_stats, round 4 — the Lee et al.
    suffix-array dedup signal at fixed k=8 granularity): per-doc
    duplicated-window stats, aggregated per source. The Spark side
    hashes windows before the shuffle (xxhash64); the oracle counts
    the window STRINGS — equal absent 64-bit collisions (birthday
    bound ~1e-9 at this scale)."""
    from .operators.dedup import substring_duplication_stats
    d = _t(spark, sf_dir, 'documents')
    stats = substring_duplication_stats(d, 'doc_id', 'text', k=8)
    return (stats.join(d.select('doc_id', 'source'), on='doc_id')
            .groupBy('source')
            .agg(F.sum('n_windows').cast('long').alias('windows'),
                 F.sum('n_dup_windows').cast('long').alias('dup_windows'),
                 F.round(F.avg('dup_frac'), 6).alias('avg_dup_frac'))
            .orderBy('source'))


def q_gopher_repetition(spark, sf_dir):
    """The complete Gopher repetition family
    (textstats.gopher_repetition, round 6 — VERDICT r5 #5): documents
    re-laid-out as 4-token lines grouped into 2-line paragraphs
    (construction shared verbatim with the SQL oracle, the q_line_dedup
    trick), then per doc: duplicate-line/paragraph fractions, their
    character fractions, and top-2/3/4-gram character fractions — all
    seven columns re-derived in SQL from scratch, rounded to 6dp."""
    from .operators.textstats import gopher_repetition
    k = 4
    toks = F.split(F.col('text'), ' ')
    n = F.size(toks)
    linearr = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(k)).cast('int') - 1),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(k) + F.lit(1), F.lit(k)), ' '))
    d = (_t(spark, sf_dir, 'documents')
         .withColumn('__lines', linearr))
    paraarr = F.transform(
        F.sequence(F.lit(0),
                   F.ceil(F.size('__lines') / F.lit(2)).cast('int') - 1),
        lambda j: F.array_join(
            F.slice('__lines', j * F.lit(2) + F.lit(1), F.lit(2)), '\n'))
    d2 = d.select('doc_id', F.array_join(paraarr, '\n\n').alias('text'))
    from .operators.dedup import release as _release
    res = gopher_repetition(d2, 'doc_id', 'text')
    out = res.orderBy('doc_id')     # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_learn_bpe(spark, sf_dir):
    """BPE merge-table LEARNING (textstats.learn_bpe_merges →
    kernels/bpe.learn_merges, round 6): the first 10 merges learned
    from the documents corpus (one word-count aggregate + the
    published driver-side loop, ties pinned count-desc/pair-asc).
    Oracle: golden merge sequences measured per corpus (keyed by
    (count, total text length) exactly like q_lda_categories' golden
    histogram — an unknown dataset matches nothing and fails the
    row-count check loudly); goldens derived from DuckDB word counts
    + the kernel, independent of the Spark aggregation under test."""
    from .operators.textstats import learn_bpe_merges
    merges = learn_bpe_merges(_t(spark, sf_dir, 'documents'),
                              num_merges=10)
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, 'merge_rank int, lhs string, rhs string').orderBy('merge_rank')


def q_substring_keep_first(spark, sf_dir):
    """Substring-span removal with the Lee et al. PAPER policy
    (keep='first'): the globally first occurrence of each duplicated
    8-token window — min (doc_id, position) — survives; later copies
    are dropped. Same full byte check as q_substring_removal; the
    oracle replays the keep rule as a row_number over (doc_id, start)
    per window value."""
    from .operators.dedup import release as _release
    from .operators.dedup import remove_duplicated_substrings
    d = _t(spark, sf_dir, 'documents')
    res = remove_duplicated_substrings(d, 'doc_id', 'text', k=8,
                                       min_df=2, keep='first')
    out = res.orderBy('doc_id')     # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_gopher_dup_ngrams(spark, sf_dir):
    """Within-doc duplicated-n-gram character coverage
    (textstats.gopher_dup_ngrams, round 6 — the dup-5..10-gram half of
    Gopher's repetition table). Docs with doc_id % 4 == 0 have their
    text DOUBLED on both sides, guaranteeing duplicated n-grams at
    every n (frac near 1); the rest carry natural values. All six
    columns re-derived in SQL (windows, within-doc counts, span-union
    coverage, char weights)."""
    from .operators.dedup import release as _release
    from .operators.textstats import gopher_dup_ngrams
    d = _t(spark, sf_dir, 'documents').select(
        'doc_id',
        F.when(F.col('doc_id') % 4 == 0,
               F.concat_ws(' ', F.col('text'), F.col('text')))
        .otherwise(F.col('text')).alias('text'))
    res = gopher_dup_ngrams(d)
    out = res.orderBy('doc_id')     # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_substring_removal(spark, sf_dir):
    """Exact substring-span REMOVAL (dedup.remove_duplicated_substrings,
    round 6 — the Lee et al. dedup ACT, not just the signal): every
    token covered by an 8-token window occurring in >= 2 distinct docs
    is dropped from all of them, texts rebuilt order-preserving. FULL
    value check including the rebuilt cleaned_text bytes (the
    q_line_dedup contract at token/window granularity); the Spark side
    hashes windows (xxhash64) before the shuffle while the oracle
    compares window STRINGS — equal absent 64-bit collisions."""
    from .operators.dedup import release as _release
    from .operators.dedup import remove_duplicated_substrings
    d = _t(spark, sf_dir, 'documents')
    res = remove_duplicated_substrings(d, 'doc_id', 'text', k=8,
                                       min_df=2)
    out = res.orderBy('doc_id')     # orderBy drops _persisted_deps
    rows = out.collect()
    _release(res)
    return spark.createDataFrame(rows, out.schema)


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test split (textstats.hash_split,
    round 4): md5-hex-threshold assignment on a derived doc key —
    engine-portable by construction, so the oracle repeats the exact
    CASE expression. id_sum witnesses the ASSIGNMENT, not just the
    counts."""
    from .operators.textstats import hash_split
    d = _t(spark, sf_dir, 'documents').withColumn(
        'key', F.concat(F.lit('doc-'), F.col('doc_id').cast('string')))
    return (hash_split(d, 'key')
            .groupBy('split')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('doc_id').cast('long').alias('id_sum'))
            .orderBy('split'))


def q_search_pipeline(spark, sf_dir):
    """F7+F8+W1-W3+F6 composed through the REAL search() operator:
    query stem → guard → relevance → score>0 → snippet → top-k
    projection. ORACLED (VERDICT r2 #3): the query's Porter stems are
    computed on the driver (exactly as search() computes them,
    search.py's preprocess_query) and inlined into the DuckDB SQL as
    literals, so the full value-level check covers the pipeline
    end-to-end — not just the q_w2 scoring-math reconstruction."""
    from .operators.search import search
    d = (_t(spark, sf_dir, 'documents')
         .withColumn('url', F.concat(F.lit('doc-'), F.col('doc_id')))
         .withColumn('extracted_text', F.col('text')))
    return search(d, _SEARCH_QUERY, k=10)


def q_lsh_ann_topk(spark, sf_dir):
    """Approximate top-k via hyperplane LSH (operators/similarity.
    lsh_topk; rows-only — recall < 1.0 by construction, so no SQL
    oracle; the exact variant q_emb_cosine_topk is the oracled
    anchor). The query's own vector must always be found (its bucket
    is its own)."""
    from .operators.similarity import lsh_topk
    vecs = _t(spark, sf_dir, 'embeddings')
    q = vecs.filter(F.col('vec_id') == 0).select('embedding').collect()[0][0]
    return (lsh_topk(vecs, [float(x) for x in q], k=10, planes=4)
            .orderBy(F.desc('cos_sim'), F.asc('vec_id')))


def q_neardup_pr(spark, sf_dir):
    """Precision/recall of the approximate near-dup operators (MinHash
    LSH, SimHash) against the EXACT n-gram Jaccard pair sets (rows-only
    — the approximations are not SQL; the exact anchor is the oracled
    q_ngram_jaccard_exact). Precision vs the J≥0.5 set, recall vs the
    J≥0.8 set — the same contract tests/test_dedup_similarity.py pins
    (SimHash approximates token-multiset cosine, not shingle Jaccard,
    so its numbers are looser by design). Deterministic: fixed hash
    params, no RNG."""
    from .operators.dedup import release as _release

    def pairs(q):
        got = {(r['id_a'], r['id_b']) for r in q.collect()}
        _release(q)
        return got

    d = _t(spark, sf_dir, 'documents')
    exact = pairs(ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.5))
    exact_hi = pairs(ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.8))
    mh = pairs(minhash_lsh_pairs(d, 'doc_id', 'text', num_hashes=64,
                                 bands=16, jaccard_threshold=0.8))
    sh = pairs(simhash_near_pairs(d, 'doc_id', 'text', max_hamming=3))
    rows = []
    for name, got in (('minhash_lsh', mh), ('simhash', sh)):
        prec = len(got & exact) / len(got) if got else 1.0
        rec = len(got & exact_hi) / len(exact_hi) if exact_hi else 1.0
        rows.append((name, len(got), round(prec, 6), round(rec, 6)))
    return spark.createDataFrame(
        rows, 'operator string, n_pairs long, precision double, recall double')


def q_para_neardup_planted(spark, sf_dir):
    """Paragraph-level fuzzy dedup with a FULL value oracle (round 6 —
    VERDICT r5 #6: the q_semantic_dedup construction trick at
    paragraph granularity). Corpus built deterministically from
    documents' ids: every doc gets three 8-token paragraphs whose
    tokens are doc-namespaced (cross-paragraph Jaccard EXACTLY 0),
    except docs with doc_id % 50 < 3, whose first paragraph is a
    group-namespaced sentinel shared verbatim within its group of
    three (g = doc_id DIV 50; all eight tokens carry g, so
    cross-GROUP Jaccard is also exactly 0). Identical paragraphs have
    identical shingle sets → identical minhash signatures in every
    band → guaranteed candidates with est-Jaccard exactly 1.0; every
    other pair shares zero shingles, so nothing else can verify at
    0.8 (margin 1.0 vs ~0). The LSH result is therefore EXACTLY the
    planted all-pairs set, which the oracle re-derives from documents
    by arithmetic alone (per-group pair counts, id sums, unit
    jaccards, all cross-doc)."""
    from .operators.dedup import paragraph_neardup_pairs
    from .operators.dedup import release as _release
    i = F.col('doc_id')
    g = F.expr('doc_id DIV 50')

    def filler(prefix):
        return F.concat_ws(' ', *[
            F.concat(F.lit(prefix), i.cast('string'), F.lit(f't{j}'))
            for j in range(8)])

    sentinel = F.concat_ws(' ', *[
        F.concat(F.lit('g'), g.cast('string'), F.lit(f'd{j}'))
        for j in range(8)])
    para0 = F.when(i % 50 < 3, sentinel).otherwise(filler('d'))
    corpus = (_t(spark, sf_dir, 'documents')
              .select('doc_id',
                      F.concat_ws('\n\n', para0, filler('x'),
                                  filler('y')).alias('text')))
    pairs = paragraph_neardup_pairs(corpus, jaccard_threshold=0.8)
    rows = pairs.collect()
    _release(pairs)
    back = spark.createDataFrame(rows, pairs.schema)
    return (back.withColumn('g', F.expr('doc_a DIV 50'))
            .groupBy('g')
            .agg(F.count('*').cast('long').alias('n_pairs'),
                 F.sum('doc_a').cast('long').alias('id_sum_a'),
                 F.sum('doc_b').cast('long').alias('id_sum_b'),
                 F.sum('para_a').cast('long').alias('para_sum'),
                 F.round(F.min('jaccard_est'), 6).alias('min_j'),
                 F.round(F.max('jaccard_est'), 6).alias('max_j'),
                 F.sum(F.col('cross_doc').cast('long')).cast('long')
                 .alias('n_cross'))
            .orderBy('g'))


def _planted_corpus(spark, sf_dir, n_tokens: int = 12):
    """Shared planted construction (round 7 — VERDICT r6 #3): every
    doc is ``n_tokens`` doc-namespaced tokens (cross-doc token/shingle
    sets EXACTLY disjoint), except docs with doc_id % 50 < 3, which
    carry a group-namespaced sentinel text shared VERBATIM within
    their group of three (g = doc_id DIV 50; every token carries g, so
    cross-group overlap is also exactly zero). Identical texts make
    near-dup discovery provable; disjoint texts make false pairs
    impossible up to hash collisions (2^-31 per minhash slot and ~2^-47
    per simhash pair — zero on the deterministic fixtures)."""
    i = F.col('doc_id')
    g = F.expr('doc_id DIV 50')
    filler = F.concat_ws(' ', *[
        F.concat(F.lit('d'), i.cast('string'), F.lit(f't{j}'))
        for j in range(n_tokens)])
    sentinel = F.concat_ws(' ', *[
        F.concat(F.lit('g'), g.cast('string'), F.lit(f'd{j}'))
        for j in range(n_tokens)])
    return (_t(spark, sf_dir, 'documents')
            .select('doc_id',
                    F.when(i % 50 < 3, sentinel).otherwise(filler)
                    .alias('text')))


def q_minhash_planted(spark, sf_dir):
    """Banded MinHash LSH with a FULL value oracle (round 7 — VERDICT
    r6 #3: the construction that oracled q_semantic_dedup and
    q_para_neardup_planted, applied to the MinHash operator itself;
    q_minhash_near_dups stays as the natural-corpus rows check and
    q_neardup_pr as the P/R pin). Identical sentinel texts have
    identical shingle sets → identical signatures in EVERY band →
    guaranteed candidates with est-Jaccard exactly 1.0; any other pair
    has disjoint shingles, so passing 0.8 would need ≥52 of 64 slots
    to collide in the 2^31 permutation space. The LSH output is
    therefore EXACTLY the planted all-pairs set, which the oracle
    re-derives from documents by arithmetic alone."""
    from .operators.dedup import minhash_lsh_pairs
    from .operators.dedup import release as _release
    pairs = minhash_lsh_pairs(_planted_corpus(spark, sf_dir),
                              'doc_id', 'text', num_hashes=64,
                              bands=16, jaccard_threshold=0.8)
    rows = pairs.collect()
    _release(pairs)
    back = spark.createDataFrame(rows, pairs.schema)
    return (back.withColumn('g', F.expr('id_a DIV 50'))
            .groupBy('g')
            .agg(F.count('*').cast('long').alias('n_pairs'),
                 F.sum('id_a').cast('long').alias('id_sum_a'),
                 F.sum('id_b').cast('long').alias('id_sum_b'),
                 F.round(F.min('jaccard_est'), 6).alias('min_j'),
                 F.round(F.max('jaccard_est'), 6).alias('max_j'))
            .orderBy('g'))


def q_simhash_planted(spark, sf_dir):
    """SimHash near-dup with a FULL value oracle (round 7 — VERDICT r6
    #3, the q_minhash_planted construction through the SimHash path).
    Identical sentinel texts → identical 64-bit simhashes → all four
    16-bit chunks match (guaranteed candidates) at Hamming distance
    exactly 0; disjoint-token docs land ~32 bits apart (P[≤3] ≈ 2^-47
    per pair — zero on the deterministic fixtures). Output is exactly
    the planted all-pairs set with max_hamming 0."""
    from .operators.dedup import release as _release
    from .operators.dedup import simhash_near_pairs
    pairs = simhash_near_pairs(_planted_corpus(spark, sf_dir),
                               'doc_id', 'text', max_hamming=3)
    rows = pairs.collect()
    _release(pairs)
    back = spark.createDataFrame(rows, pairs.schema)
    return (back.withColumn('g', F.expr('id_a DIV 50'))
            .groupBy('g')
            .agg(F.count('*').cast('long').alias('n_pairs'),
                 F.sum('id_a').cast('long').alias('id_sum_a'),
                 F.sum('id_b').cast('long').alias('id_sum_b'),
                 F.max('hamming').cast('long').alias('max_h'))
            .orderBy('g'))


def q_para_neardup(spark, sf_dir):
    """Paragraph-level fuzzy dedup (dedup.paragraph_neardup_pairs /
    paragraph_neardup_rollup, round 5 — RefinedWeb runs line-EXACT and
    paragraph-FUZZY dedup; this is the fuzzy half, reusing the banded
    MinHash machinery over composite (doc, para) keys). Documents are
    re-laid-out as 12-token paragraphs; rows-only (LSH is not SQL —
    the exact anchor is paragraph n-gram Jaccard, whose doc-level
    form is the oracled q_ngram_jaccard_exact). Reports P/R against
    the exact J>=0.5 / J>=0.8 paragraph pair sets plus the roll-up
    totals."""
    from .operators.dedup import (explode_paragraphs, ngram_jaccard_pairs,
                                  paragraph_neardup_pairs,
                                  paragraph_neardup_rollup)
    from .operators.dedup import release as _release
    k = 12
    toks = F.split(F.col('text'), ' ')
    n = F.size(toks)
    linearr = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(k)).cast('int') - 1),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(k) + F.lit(1), F.lit(k)), ' '))
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id', F.array_join(linearr, '\n\n').alias('text')))

    def pset(q):
        s = {(r['id_a'], r['id_b']) for r in q.collect()}
        _release(q)
        return s

    ptext = explode_paragraphs(d).withColumnRenamed('para', 'text')
    exact_lo = pset(ngram_jaccard_pairs(ptext, 'pid', 'text',
                                        k=3, threshold=0.5))
    exact_hi = pset(ngram_jaccard_pairs(ptext, 'pid', 'text',
                                        k=3, threshold=0.8))
    pairs_df = paragraph_neardup_pairs(d, jaccard_threshold=0.8)
    rows = pairs_df.collect()
    _release(pairs_df)
    shift = 1 << 20
    got = {(r['doc_a'] * shift + r['para_a'],
            r['doc_b'] * shift + r['para_b']) for r in rows}
    n_cross = sum(1 for r in rows if r['cross_doc'])
    prec = len(got & exact_lo) / len(got) if got else 1.0
    rec = len(got & exact_hi) / len(exact_hi) if exact_hi else 1.0
    roll = paragraph_neardup_rollup(d, jaccard_threshold=0.8)
    sums = roll.agg(
        F.sum((F.col('n_dup_paras') > 0).cast('long')).alias('docs_with_dups'),
        F.sum('n_dup_paras').alias('dup_paras')).collect()[0]
    _release(roll)
    return spark.createDataFrame(
        [(len(got), n_cross, round(prec, 6), round(rec, 6),
          int(sums['docs_with_dups'] or 0), int(sums['dup_paras'] or 0))],
        'n_pairs long, n_cross_doc long, precision double, recall double, '
        'docs_with_dups long, dup_paras long')


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (similarity.semantic_dedup, round 5 — Abbas et al.
    2023: embedding-space dedup that catches paraphrases text dedup
    cannot): KMeans cells → within-cell LSH-sub-bucketed cosine pairs
    → connected components → keep the least-prototypical member per
    group. Runs over the embeddings table unioned with an
    exactly-duplicated slice (the q_emb_cosine_dups construction).

    ORACLED despite the seeded KMeans, because on this fixture the
    result is provably assignment-INDEPENDENT: identical vectors land
    in the same cell and LSH sub-bucket whatever the clustering, the
    fixture's max natural cosine (~0.51, pinned by q_emb_cosine_dups'
    exact-equality oracle) is far below the 0.995 threshold so the
    pair set is exactly the planted identities, identical vectors tie
    on centroid_sim so the keep rule degenerates to min-id, and
    max_bucket_size sits above the corpus so every bucket takes the
    dense branch (star pairs only guarantee hub adjacency). The SQL
    side needs only the construction arithmetic."""
    from .operators.dedup import release as _release
    from .operators.similarity import semantic_dedup
    vecs = _t(spark, sf_dir, 'embeddings').select('vec_id', 'embedding')
    dup = (vecs.filter(F.col('vec_id') % 5 == 0)
           .withColumn('vec_id', F.col('vec_id') + 100000))
    both = vecs.unionByName(dup)
    out = semantic_dedup(both, n_clusters=8, threshold=0.995,
                         max_bucket_size=100000)
    agg = out.agg(
        F.count('*').cast('long').alias('n_vecs'),
        F.count_distinct('sem_group').cast('long').alias('n_groups'),
        F.sum((~F.col('keep')).cast('long')).cast('long').alias('n_removed'),
        F.sum(F.when(F.col('keep'), F.col('vec_id'))).cast('long')
        .alias('survivor_id_sum')).collect()
    _release(out)
    return spark.createDataFrame(agg,
                                 'n_vecs long, n_groups long, '
                                 'n_removed long, survivor_id_sum long')


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training export (operators/packing,
    round 5 — GPT-style concat-and-chop): every document's position
    in the packed token stream at seq_len=512, via the two-phase
    distributed prefix sum (range shuffle + per-partition windows +
    broadcast partial offsets — NO single-partition stage,
    plan-pinned in test_packing). Oracle: DuckDB's cumulative-sum
    window reproduces the offsets exactly; per-doc
    first/last/spanned-sequence columns witness the full assignment."""
    from .operators.dedup import release as _release
    from .operators.packing import pack_sequences
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id',
                 F.size(F.split(F.trim(F.col('text')), r'\s+'))
                 .cast('long').alias('toks')))
    packed = pack_sequences(d, 'doc_id', 'toks', seq_len=512)
    out = (packed.select('doc_id', 'offset', 'first_seq', 'last_seq',
                         'n_seqs_spanned')
           .orderBy('doc_id'))
    rows = out.collect()
    _release(packed)
    return spark.createDataFrame(rows, out.schema)


def q_encode_pack(spark, sf_dir):
    """BPE encode-to-ids + materialized concat-and-chop
    (textstats.with_input_ids → packing.pack_input_ids, round 6 —
    VERDICT r5 #4: the export family becomes loader-real, packed rows
    carry the actual input_ids). Per 512-token context window:
    contributing-doc count, id count, and md5 over the exact
    comma-joined id sequence IN ORDER. Oracle: per-word id sequences
    computed by tests/reference_bpe.py (the independent GPT-2-loop
    transcription) + the public vocab rule (char → code point, merge →
    0x110000+rank), pasted as a VALUES map; an unmapped word NULLs the
    doc's stream and fails loudly. The window arithmetic (global
    offsets → chop) is re-derived in SQL from scratch."""
    from .operators.dedup import release as _release
    from .operators.packing import pack_input_ids
    d = textstats.with_input_ids(_t(spark, sf_dir, 'documents'), 'text')
    # sep_id 1114111 = the last Unicode code point — never emitted by
    # the encoder for fixture text, so it marks boundaries unambiguously
    packed = pack_input_ids(d.select('doc_id', 'input_ids'),
                            'doc_id', 'input_ids', seq_len=512,
                            sep_id=1114111)
    out = (packed.select(
        'seq', 'n_docs', 'n_ids',
        F.md5(F.array_join(
            F.transform('input_ids', lambda x: x.cast('string')),
            ',')).alias('ids_md5'))
        .orderBy('seq'))
    rows = out.collect()
    _release(packed)
    return spark.createDataFrame(rows, out.schema)


def q_ivf_ann_topk(spark, sf_dir):
    """IVF (inverted-file) ANN top-k (operators/similarity.ivf_index/
    ivf_topk; rows-only — KMeans cells are seeded but not SQL): probe
    the 4 nearest of 8 cells for the vec_id=0 query; the exact variant
    q_emb_cosine_topk is the oracled anchor."""
    from .operators.similarity import ivf_index, ivf_topk
    vecs = _t(spark, sf_dir, 'embeddings')
    q = vecs.filter(F.col('vec_id') == 0).select('embedding').collect()[0][0]
    indexed, model = ivf_index(vecs, n_lists=8)
    return (ivf_topk(indexed, model, [float(x) for x in q], k=10, n_probe=4)
            .orderBy(F.desc('cos_sim'), F.asc('vec_id')))


def q_ann_recall(spark, sf_dir):
    """Recall@k evidence for the ANN prune paths (round 7 — VERDICT r6
    #5): LSH (planes=4, the q_lsh_ann_topk config) and IVF (probe
    4-of-8 cells, the q_ivf_ann_topk config) measured against the
    ORACLED exact twin (q_emb_cosine_topk's brute_force_topk) over
    eight fixture query vectors, with the mean scanned corpus fraction
    alongside — the cost axis of the recall/cost tradeoff (LSH scans
    ~1/16 of the corpus for its recall; IVF ~half). Rows-only (recall
    < 1.0 by construction; KMeans cells are not SQL), but the quality
    floors are asserted IN-QUERY so a recall regression turns the
    driver row RED instead of hiding behind a stable row count:
    self-hit must be perfect (the query's bucket is its own; its cell
    is the nearest), and mean recall must clear 0.15 (lsh) / 0.60
    (ivf). Measured: 0.2375 / 0.85 at sf0.01 (0.275 lsh at sf0.001) —
    leave margin because KMeans cell boundaries may shift with
    partitioning; the LSH path is splitmix64-deterministic and pinned
    EXACTLY by tests/test_dedup_similarity.py::test_ann_recall_pinned.
    Scale shape: the corpus is bucketed/indexed ONCE and persisted;
    each probe reads one bucket / n_probe cells (partition-prunable
    when written bucketed by lsh_bucket / ivf_cell)."""
    from pyspark import StorageLevel
    from .operators.similarity import (brute_force_topk, ivf_index,
                                       ivf_probe_cells, query_bucket,
                                       with_lsh_bucket)
    planes, n_lists, n_probe, k = 4, 8, 4, 10
    vecs = _t(spark, sf_dir, 'embeddings')
    qids = list(range(8))
    queries = {r['vec_id']: [float(x) for x in r['embedding']]
               for r in vecs.filter(F.col('vec_id').isin(qids))
               .select('vec_id', 'embedding').collect()}
    indexed, model = ivf_index(vecs, n_lists=n_lists)
    both = (with_lsh_bucket(indexed, 'embedding', planes=planes)
            .persist(StorageLevel.MEMORY_AND_DISK))
    n_total = both.count()
    bucket_n = {r['lsh_bucket']: r['n'] for r in
                both.groupBy('lsh_bucket').agg(F.count('*').alias('n'))
                .collect()}
    cell_n = {r['ivf_cell']: r['n'] for r in
              both.groupBy('ivf_cell').agg(F.count('*').alias('n'))
              .collect()}

    def ids(df):
        return {r['vec_id'] for r in df.collect()}

    per_method = {'lsh': [], 'ivf': []}  # (recall, self_hit, scanned)
    for qid in qids:
        qv = queries[qid]
        exact = ids(brute_force_topk(vecs, qv, k=k))
        b = query_bucket(qv, planes)
        lsh = ids(brute_force_topk(
            both.filter(F.col('lsh_bucket') == b), qv, k=k))
        probe = ivf_probe_cells(model, qv, n_probe)
        ivf = ids(brute_force_topk(
            both.filter(F.col('ivf_cell').isin(probe)), qv, k=k))
        per_method['lsh'].append(
            (len(lsh & exact) / k, qid in lsh, bucket_n.get(b, 0)))
        per_method['ivf'].append(
            (len(ivf & exact) / k, qid in ivf,
             sum(cell_n.get(c, 0) for c in probe)))
    both.unpersist()
    floors = {'lsh': 0.15, 'ivf': 0.60}
    rows = []
    for name in ('lsh', 'ivf'):
        rs = per_method[name]
        mean_r = sum(r for r, _, _ in rs) / len(rs)
        min_r = min(r for r, _, _ in rs)
        self_hit = sum(1 for _, s, _ in rs if s) / len(rs)
        scan = sum(n for _, _, n in rs) / (len(rs) * n_total)
        assert self_hit == 1.0, \
            f'{name}: query vector missing from its own top-{k} ({self_hit})'
        assert mean_r >= floors[name], \
            f'{name}: mean recall@{k} {mean_r} below floor {floors[name]}'
        rows.append((name, len(rs), k, round(mean_r, 6), round(min_r, 6),
                     round(self_hit, 6), round(scan, 6)))
    return spark.createDataFrame(
        rows, 'operator string, n_queries long, k long, mean_recall double,'
              ' min_recall double, self_hit double, mean_scan_frac double')


def q_pagerank_centrality(spark, sf_dir):
    """Link-graph centrality (operators/graph.pagerank): 10 exact
    integer fixed-point power iterations over a deterministic synthetic
    link graph derived from doc_ids (each doc links to (13·id+7) mod N
    and (7·id+3) mod N) — the quality-prior face of corpus ranking.
    Top-20 by rank. ORACLED: integer arithmetic is bit-identical on
    any engine, so DuckDB replays the same 10 iterations as unrolled
    CTEs and the hashes must agree — a full value check of an
    ITERATIVE fixed-point algorithm (float power iteration could never
    hash-match across engines)."""
    from .operators.dedup import release
    from .operators.graph import pagerank
    d = _t(spark, sf_dir, 'documents')
    n = d.count()
    e1 = d.select(F.col('doc_id').alias('src'),
                  ((F.col('doc_id') * 13 + 7) % n).alias('dst'))
    e2 = d.select(F.col('doc_id').alias('src'),
                  ((F.col('doc_id') * 7 + 3) % n).alias('dst'))
    pr = pagerank(e1.unionByName(e2), iterations=10)
    rows = (pr.orderBy(F.desc('rank'), F.asc('node')).limit(20).collect())
    release(pr)
    return spark.createDataFrame([tuple(r) for r in rows],
                                 'node long, rank long')


def q_unigram_logprob(spark, sf_dir):
    """Unigram LM quality score (textstats.unigram_logprob): per-doc
    mean ln p(token) under the corpus's own Lidstone-smoothed unigram
    distribution — the CCNet-style perplexity-proxy filter signal.
    Bottom-20 docs by score (the filter's reject candidates). ORACLED:
    DuckDB reproduces tf/N/V and the smoothed mean exactly."""
    from .operators.textstats import unigram_logprob
    d = _t(spark, sf_dir, 'documents')
    return (unigram_logprob(d, 'doc_id', 'text')
            .orderBy(F.asc('logprob'), F.asc('doc_id')).limit(20))


def q_bigram_lm(spark, sf_dir):
    """Bigram LM quality score (textstats.bigram_lm_score): per-doc
    mean ln p(v|u) under the corpus's own Lidstone-smoothed bigram
    distribution — the word-order-aware rung between q_unigram_logprob
    and CCNet's trained-KenLM perplexity filter (shuffled/stuffed text
    keeps its unigram score but collapses here). Bottom-20 docs by
    score. ORACLED: DuckDB rebuilds the bigram/context counts, V, and
    the smoothed mean exactly."""
    from .operators.textstats import bigram_lm_score
    d = _t(spark, sf_dir, 'documents')
    return (bigram_lm_score(d, 'doc_id', 'text')
            .orderBy(F.asc('bigram_logprob'), F.asc('doc_id')).limit(20))


def q_quality_cascade(spark, sf_dir):
    """Staged quality funnel (curate.cascade_report, round 6): four
    C4/Gopher-style gates in order — min length, min tokens, alpha
    ratio, digit ratio — each document exiting at its FIRST failure;
    per-stage attrition counts and pass rates from ONE corpus scan.
    ORACLED: the first-fail CASE chain and the funnel arithmetic
    replayed in SQL over the same rebuilt quality columns."""
    from .operators.curate import cascade_report
    from .operators.textstats import with_quality
    q = with_quality(_t(spark, sf_dir, 'documents'))
    stages = [
        ('min_length', F.col('n_chars_q') >= 100),
        ('min_tokens', F.col('n_tokens') >= 10),
        ('alpha', F.col('alpha_ratio') > 0.6),
        ('digit', F.col('digit_ratio') < 0.2),
    ]
    return cascade_report(q, stages).orderBy('stage_idx')


def q_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization (textstats.with_nfc, round 6): every
    document's text gets a DECOMPOSED suffix appended (' cafe' +
    combining acute U+0301 — bytes that NFC must recompose to 'é'),
    then per-doc md5 of the normalized text plus char lengths before/
    after. Oracle: DuckDB's nfc_normalize implements the same Unicode
    standard — byte-for-byte agreement is the whole point."""
    from .operators.textstats import with_nfc
    d = _t(spark, sf_dir, 'documents').select(
        'doc_id',
        F.concat(F.col('text'), F.lit(' café')).alias('text'))
    out = with_nfc(d)
    return (out.select('doc_id',
                       F.length('text').cast('long').alias('len_raw'),
                       F.length('nfc_text').cast('long').alias('len_nfc'),
                       F.md5('nfc_text').alias('nfc_md5'))
            .orderBy('doc_id'))


def q_stupid_backoff(spark, sf_dir):
    """Trigram Stupid Backoff LM score
    (textstats.stupid_backoff_score, round 6 — Brants et al. 2007,
    the smoothing built FOR distributed web-scale LMs): per-doc mean
    ln s over trigram positions with the pinned λ=0.4 backoff chain
    and Lidstone unigram floor, self-scored. Bottom-20 docs.
    ORACLED: DuckDB rebuilds all three count tables, N/V, and the
    exact CASE chain (λ·λ written as 0.4*0.4 on both sides for bit
    parity)."""
    from .operators.textstats import stupid_backoff_score
    d = _t(spark, sf_dir, 'documents')
    return (stupid_backoff_score(d, 'doc_id', 'text')
            .orderBy(F.asc('sb_logscore'), F.asc('doc_id')).limit(20))


def q_ppl_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity bucketing
    (textstats.ppl_buckets, Wenzek et al. 2020): score every doc with
    the Lidstone unigram LM (q_unigram_logprob's signal), then split
    each language into equal-population head/middle/tail tiers —
    'head' is the best-scoring slice CCNet keeps for LM training.
    Per-doc assignment output (doc_id, lang, logprob, bucket).
    ORACLED: DuckDB rebuilds the smoothed score and applies the
    identical NTILE(3) OVER (lang / score DESC, id ASC) — both rank on
    the 6-rounded score, so ordering and tiers match exactly."""
    from .operators.textstats import ppl_buckets, unigram_logprob
    d = _t(spark, sf_dir, 'documents')
    scores = unigram_logprob(d, 'doc_id', 'text')
    scored = d.select('doc_id', 'lang').join(scores, on='doc_id')
    return (ppl_buckets(scored, 'doc_id', 'logprob', 'lang')
            .select('doc_id', 'lang', 'logprob', 'ppl_bucket'))


def q_token_budget_mix(spark, sf_dir):
    """Token-budget mixture allocation (curate.token_budget_fill):
    per-language token budgets {en:6000, de/fr/es:2000, zh: ABSENT —
    dropped by the explicit-mixture contract}, filled greedily by
    (alpha_ratio desc, doc_id asc) priority; a doc is kept iff its
    group's running token total BEFORE it is under budget. Reports
    per-language doc/token totals plus an id_sum witnessing the exact
    kept set. ORACLED: DuckDB repeats the rounded alpha_ratio order,
    the integer exclusive running sum, and the budget CASE exactly."""
    from .operators.curate import token_budget_fill
    from .operators.textstats import with_quality
    d = _t(spark, sf_dir, 'documents')
    q = with_quality(d, 'text')
    budgets = {'en': 6000, 'de': 2000, 'fr': 2000, 'es': 2000}
    kept = token_budget_fill(q, 'lang', budgets, 'n_tokens',
                             [('alpha_ratio', 'desc'), ('doc_id', 'asc')])
    return (kept.groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('n_tokens').cast('long').alias('sum_tokens'),
                 F.sum('doc_id').cast('long').alias('id_sum')))


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled mixture (curate.temperature_weights →
    budgets_from_mixture → token_budget_fill, round 7): per-language
    weights DERIVED from the corpus as isqrt(sum n_tokens) (alpha=0.5,
    the multilingual-sampling standard), total budget 6000 tokens —
    chosen clamp-free at the gate scales so the waterfilling loop is
    provably its single proportional round and the oracle can replay
    budget_g = floor(total·w_g / Σw) in pure integer SQL. Fill order
    (alpha_ratio DESC, doc_id ASC) as in q_token_budget_mix; per-lang
    doc/token/id sums witness the exact kept set."""
    from .operators.curate import (budgets_from_mixture,
                                   temperature_weights,
                                   token_budget_fill)
    from .operators.textstats import with_quality
    d = _t(spark, sf_dir, 'documents')
    q = with_quality(d, 'text')
    w = temperature_weights(q, 'lang', 'n_tokens', alpha=0.5)
    budgets = budgets_from_mixture(q, 'lang', 'n_tokens', w, 6000)
    # clamp-freeness guard (ADVICE r7): the oracle replays exactly ONE
    # unclamped proportional round, so fail LOUDLY if waterfilling ever
    # clamps at this corpus/budget instead of silently diverging.
    from fractions import Fraction
    _wsum = sum(w.values())
    _expect = {g: int(Fraction(6000) * Fraction(wg) / _wsum)
               for g, wg in w.items()}
    _expect = {g: b for g, b in _expect.items() if b > 0}
    if budgets != _expect:
        raise RuntimeError(
            'q_temperature_mix: budgets_from_mixture clamped '
            f'(got {budgets}, single-round {_expect}) — the frozen '
            'oracle only replays the unclamped proportional round')
    kept = token_budget_fill(q, 'lang', budgets, 'n_tokens',
                             [('alpha_ratio', 'desc'), ('doc_id', 'asc')])
    return (kept.groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('n_tokens').cast('long').alias('sum_tokens'),
                 F.sum('doc_id').cast('long').alias('id_sum'))
            .orderBy('lang'))


def q_stream_dedup(spark, sf_dir):
    """Streaming dedup within a watermark (streaming.dedup_stream,
    dropDuplicatesWithinWatermark): every doc_id % 3 == 0 document is
    re-ingested as a +120 s re-crawl copy (new id, same text); the
    1-hour watermark GUARANTEES each such pair collapses to one row,
    whichever copy arrives first. Aggregates only text-determined
    values (counts, text bytes) so the arrival-order-dependent
    survivor choice never reaches the result. ORACLED: the post-dedup
    corpus is exactly the documents table's distinct texts."""
    import shutil
    import tempfile
    from .streaming import dedup_stream
    d = _t(spark, sf_dir, 'documents')
    dup_ids = F.col('doc_id') % 3 == 0
    dups = (d.filter(dup_ids)
            .withColumn('doc_id', F.col('doc_id') + F.lit(10_000_000)))
    indir = tempfile.mkdtemp(prefix='pam_q_sdedup_in_')
    outdir = tempfile.mkdtemp(prefix='pam_q_sdedup_out_')
    try:
        d.unionByName(dups).coalesce(4).write.mode('overwrite').parquet(indir)

        def derive(s):
            orig_id = F.col('doc_id') % F.lit(10_000_000)
            late = F.when(F.col('doc_id') >= 10_000_000,
                          F.lit(120)).otherwise(F.lit(0))
            return (s.withColumn('ts', F.timestamp_seconds(
                        F.lit(1735689600) + orig_id * 17 + late))
                    .withColumn('content_hash', F.md5('text')))

        dedup_stream(
            spark, indir, outdir,
            'doc_id long, text string, lang string, source string, '
            'n_chars long',
            ['content_hash'], ts_col='ts', watermark='1 hour',
            derive=derive)
        out = spark.read.parquet(f'{outdir}/deduped')
        row = (out.agg(F.count('*').alias('n_kept'),
                       F.count_distinct('content_hash').alias('n_texts'),
                       F.sum(F.length('text')).alias('total_chars'))
               .collect()[0])
        return spark.createDataFrame(
            [tuple(row)], 'n_kept long, n_texts long, total_chars long')
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def q_semantic_decontamination(spark, sf_dir):
    """Embedding-space benchmark decontamination
    (similarity.semantic_decontamination): the benchmark = a shifted
    copy of every 10th embedding (ids +100000), so exactly those 50
    train vectors sit at rounded cosine 1.0 while the corpus's max
    natural cosine (~0.51, measured for q_semantic_dedup) is far under
    the 0.9 threshold — the verdict has no rounding boundary anywhere
    near it. Reports per-verdict counts, train-id sums, and the sum of
    matched bench ids (witnessing the min-id argmax). ORACLED: DuckDB
    recomputes every train×bench cosine, rounds to the same 6-place
    grid, and applies the identical (sim DESC, bench_id ASC) argmax."""
    from .operators.similarity import semantic_decontamination
    emb = _t(spark, sf_dir, 'embeddings')
    bench = emb.filter(F.col('vec_id') % 10 == 0).select(
        (F.col('vec_id') + 100000).alias('vec_id'), 'embedding')
    out = semantic_decontamination(emb, bench, threshold=0.9)
    verdict = F.when(F.col('contaminated'),
                     F.lit('contaminated')).otherwise(F.lit('clean'))
    return (out.groupBy(verdict.alias('verdict'))
            .agg(F.count('*').cast('long').alias('n_vecs'),
                 F.sum('vec_id').cast('long').alias('id_sum'),
                 F.sum(F.when(F.col('contaminated'), F.col('bench_id')))
                 .cast('long').alias('bench_id_sum')))


def q_url_filter(spark, sf_dir):
    """URL-level quality gate (urls.url_quality_filter — the
    RefinedWeb first stage: reject from the URL alone, before fetch or
    extraction): URLs synthesized deterministically from doc_id — one
    in 7 on a blocklisted domain, path keywords by residue so some
    cross the weighted-score threshold ('casino'/'poker' = 5 ≥ 5) and
    some accumulate only soft signal ('free-download'/'win-free' = 2).
    Per-verdict counts + score totals + id_sum witnessing the exact
    partition. ORACLED: DuckDB derives the expected verdict
    INDEPENDENTLY from the construction arithmetic (CASE on the
    residues), not by re-running the string scan."""
    from .operators.urls import url_quality_filter
    d = _t(spark, sf_dir, 'documents')
    sid = F.col('doc_id')
    dom = (F.when(sid % 7 == 0, F.lit('badsite.example'))
           .otherwise(F.concat(F.lit('site'), (sid % 5).cast('string'),
                               F.lit('.example.com'))))
    word = F.element_at(
        F.lit(['casino', 'poker', 'news', 'blog', 'free-download',
               'sports', 'travel', 'recipes', 'win-free', 'music']),
        (sid % 10 + 1).cast('int'))
    url = F.concat(F.lit('https://'), dom, F.lit('/'), word,
                   F.lit('/p'), sid.cast('string'))
    out = url_quality_filter(d.select('doc_id', url.alias('url')))
    verdict = (F.when(F.col('url_block'), F.lit('blocked'))
               .when(~F.col('url_ok'), F.lit('rejected'))
               .otherwise(F.lit('ok')))
    return (out.groupBy(verdict.alias('verdict'))
            .agg(F.count('*').cast('long').alias('n_urls'),
                 F.sum('url_score').cast('long').alias('sum_score'),
                 F.sum('doc_id').cast('long').alias('id_sum')))


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (operators/dsir, round 5 — Xie et
    al. 2023): target = every 5th English doc (the curated sample),
    raw = the rest; hashed-{uni,bi}gram bucket models (md5-hex
    buckets, engine-portable), Lidstone log-ratio weights, Gumbel
    top-25 under the derandomized md5-keyed noise. ORACLED: DuckDB
    rebuilds the exact bucketing, both smoothed models, the summed
    log-ratio AND the Gumbel keys digit-for-digit."""
    from .operators.dsir import dsir_select
    d = _t(spark, sf_dir, 'documents')
    tgt = d.filter((F.col('lang') == 'en') & (F.col('doc_id') % 5 == 0))
    raw = d.join(tgt.select('doc_id'), 'doc_id', 'left_anti')
    return dsir_select(raw, tgt, 25)


def q_epoch_upsample(spark, sf_dir):
    """Fractional per-group epoch upsampling (curate.epoch_upsample,
    late round 5): en×1.25 / de×2.0 / fr×0.5 (es/zh unlisted →
    dropped). Each doc emits floor(f) copies plus an md5-coin
    fractional copy — per-doc rows (doc_id, lang, epoch) witness the
    exact realized copy set. ORACLED: DuckDB replays the coin
    (md5(id·'|'·seed) against the exact 2^126/2^127 hex thresholds)
    and the range-explode bit-for-bit."""
    from .operators.curate import epoch_upsample
    d = _t(spark, sf_dir, 'documents')
    out = epoch_upsample(d.select('doc_id', 'lang'), 'lang',
                         {'en': 1.25, 'de': 2.0, 'fr': 0.5}, seed='r5')
    return out.select('doc_id', 'lang',
                      F.col('epoch').cast('long').alias('epoch'))


def q_shuffle_shards(spark, sf_dir):
    """Seeded global shuffle + token-balanced sharding
    (packing.shuffle_shards, late round 5): documents laid out in
    md5(id|seed)·id order, exclusive token prefix sum via the
    two-phase distributed scan, shards cut every 5000 tokens.
    Per-doc (offset, shard, shard_offset) witnesses the entire
    stream layout. ORACLED: DuckDB re-sorts on the same key and
    replays the cumulative window + integer divide exactly."""
    from .operators.dedup import release as _release
    from .operators.packing import shuffle_shards
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id',
                 F.size(F.split(F.trim(F.col('text')), r'\s+'))
                 .cast('long').alias('toks')))
    sharded = shuffle_shards(d, 'doc_id', 'toks', 5000, seed='r5')
    out = sharded.select('doc_id', 'offset', 'shard', 'shard_offset')
    rows = out.collect()
    _release(sharded)
    return spark.createDataFrame(rows, out.schema)


def q_shard_export(spark, sf_dir):
    """Shard export sink (packing.write_shards, late round 5): the
    q_shuffle_shards layout materialized to shard=N/ parquet
    partitions, manifest recomputed FROM THE WRITTEN FILES (write-
    then-publish: no manifest, no export) and verified on read.
    Returns the manifest — per-shard doc/token totals plus the md5 of
    the sorted id list. ORACLED: DuckDB rebuilds the stream, the cut,
    and the checksum (md5 of the comma-joined lexicographically
    sorted ids) per shard."""
    import shutil
    import tempfile
    from .operators.dedup import release as _release
    from .operators.packing import (shuffle_shards, verify_shards,
                                    write_shards)
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id',
                 F.size(F.split(F.trim(F.col('text')), r'\s+'))
                 .cast('long').alias('toks')))
    out = tempfile.mkdtemp(prefix='pam_q_shards_')
    shutil.rmtree(out)
    try:
        sharded = shuffle_shards(d, 'doc_id', 'toks', 5000, seed='r5')
        manifest = write_shards(spark, sharded, out, 'doc_id', 'toks')
        _release(sharded)
        assert verify_shards(spark, out, 'doc_id', 'toks')
        rows = manifest.collect()
        return spark.createDataFrame(rows, manifest.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_append_shards(spark, sf_dir):
    """Incremental shard append (packing.append_shards, late round 5):
    even doc_ids export first (seed r5a), odd doc_ids append as a
    second crawl batch (seed r5b) starting at the next shard boundary
    — stored shards stay byte-identical, numbering continues, no
    shard spans two batches, and verify_shards passes on the combined
    tree. Returns the combined manifest. ORACLED: DuckDB builds both
    batch streams, shifts batch 2 by the ceil-div boundary, and
    unions the per-shard manifests."""
    import shutil
    import tempfile
    from .operators.dedup import release as _release
    from .operators.packing import (append_shards, shuffle_shards,
                                    verify_shards, write_shards)
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id',
                 F.size(F.split(F.trim(F.col('text')), r'\s+'))
                 .cast('long').alias('toks')))
    out = tempfile.mkdtemp(prefix='pam_q_append_')
    shutil.rmtree(out)
    try:
        b1 = d.filter(F.col('doc_id') % 2 == 0)
        b2 = d.filter(F.col('doc_id') % 2 == 1)
        s1 = shuffle_shards(b1, 'doc_id', 'toks', 5000, seed='r5a')
        write_shards(spark, s1, out, 'doc_id', 'toks')
        _release(s1)
        combined = append_shards(spark, b2, out, 'doc_id', 'toks',
                                 5000, seed='r5b')
        assert verify_shards(spark, out, 'doc_id', 'toks')
        rows = combined.collect()
        return spark.createDataFrame(rows, combined.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_model_auc(spark, sf_dir):
    """Exact distributed ROC-AUC (operators/evaluate.auc_score, late
    round 5): the frozen quality model's score (integer units —
    heavy ties, so the midrank path is live) evaluated against the
    lang='en' label, per source via the partitioned-window path PLUS
    a global '__all__' row via the two-phase prefix-sum path (no
    SinglePartition stage) — both derived from ONE corpus pass
    (auc_report computes the per-(group, score) counts once; the
    global path re-aggregates the collapsed counts). auc_num2 = the
    exact integer 2·AUC·P·N; auc is one IEEE division of exact
    integers, rounded 6."""
    from .operators.evaluate import auc_report
    from .operators.quality_model import model_quality_units
    d = (model_quality_units(_ts(spark, sf_dir, 'documents'))
         .select('source', F.col('mq_units').alias('score'),
                 (F.col('lang') == 'en').cast('int').alias('label')))
    rep = auc_report(d, 'score', 'label', ['source'])
    return (rep.select(F.col('group').alias('source'), 'pos_n', 'neg_n',
                       F.col('auc_num2').cast('long').alias('auc_num2'),
                       F.round('auc', 6).alias('auc'))
            .orderBy('source'))


def q_pr_curve(spark, sf_dir):
    """Exact precision-recall curve (operators/evaluate.pr_curve,
    round 6): one row per distinct frozen-model score, exact BIGINT
    tp/fp at that threshold (predict positive iff score >= s) and
    precision/recall as single IEEE divisions, rounded 6 — every row
    computed independently from cumulative counts, no running float
    state. Oracle: the same class totals minus exclusive below-prefix
    sums in SQL."""
    from .operators.dedup import release as _release
    from .operators.evaluate import pr_curve
    from .operators.quality_model import model_quality_units
    d = (model_quality_units(_ts(spark, sf_dir, 'documents'))
         .select(F.col('mq_units').alias('score'),
                 (F.col('lang') == 'en').cast('int').alias('label')))
    cur = pr_curve(d, 'score', 'label')
    out = (cur.select('score', 'tp', 'fp',
                      F.round('precision', 6).alias('precision'),
                      F.round('recall', 6).alias('recall'))
           .orderBy(F.col('score').desc()))
    rows = out.collect()
    _release(cur)
    return spark.createDataFrame(rows, out.schema)


def q_average_precision(spark, sf_dir):
    """Step-wise average precision per source
    (operators/evaluate.average_precision, round 6): AP·P = Σ_s
    p_s·precision_s with precision pinned to 12 places and the sum in
    DECIMAL(38,12) — order-independent by construction, so the value
    is hash-stable under any partitioning. Oracle: the identical
    pinned arithmetic replayed in SQL."""
    from .operators.evaluate import average_precision
    from .operators.quality_model import model_quality_units
    d = (model_quality_units(_ts(spark, sf_dir, 'documents'))
         .select('source', F.col('mq_units').alias('score'),
                 (F.col('lang') == 'en').cast('int').alias('label')))
    ap = average_precision(d, 'score', 'label', ['source'])
    return (ap.select('source', 'pos_n', 'neg_n',
                      F.round('ap', 6).alias('ap'))
            .orderBy('source'))


def q_threshold_report(spark, sf_dir):
    """Confusion counts + precision/recall/F1 at three gate cut
    points (operators/evaluate.threshold_report, late round 5): one
    conditional-aggregate pass over the corpus however many
    thresholds are asked for. Counts are exact BIGINTs; the ratios
    are single IEEE divisions of them, rounded 6."""
    from .operators.evaluate import threshold_report
    from .operators.quality_model import model_quality_units
    d = (model_quality_units(_ts(spark, sf_dir, 'documents'))
         .select(F.col('mq_units').alias('score'),
                 (F.col('lang') == 'en').cast('int').alias('label')))
    rep = threshold_report(d, 'score', 'label', [-1000.0, 0.0, 1000.0])
    return (rep.select('threshold', 'tp', 'fp', 'fn', 'tn',
                       F.round('precision', 6).alias('precision'),
                       F.round('recall', 6).alias('recall'),
                       F.round('f1', 6).alias('f1'))
            .orderBy('threshold'))


def q_calibration_bins(spark, sf_dir):
    """Reliability-diagram bins (operators/evaluate.calibration_bins,
    late round 5) over the frozen model's integer units in
    [-10000, 10000), 8 equal bins, edge clamping: per bin the row
    count, positive count and positive rate (one narrow groupBy —
    map-side combine makes the shuffle n_bins rows per task).
    mean_score is avg-of-doubles (addition-order-dependent) and is
    deliberately NOT in the graded projection."""
    from .operators.evaluate import calibration_bins
    from .operators.quality_model import model_quality_units
    d = (model_quality_units(_ts(spark, sf_dir, 'documents'))
         .select(F.col('mq_units').cast('double').alias('score'),
                 (F.col('lang') == 'en').cast('int').alias('label')))
    bins = calibration_bins(d, 'score', 'label', n_bins=8,
                            lo=-10000.0, hi=10000.0)
    return (bins.select('bin', 'n', 'n_pos',
                        F.round('pos_rate', 6).alias('pos_rate'))
            .orderBy('bin'))


def q_bucketed_join(spark, sf_dir):
    """Bucketed co-located join (layout.write_bucketed /
    colocated_join, late round 5): documents and their frozen-model
    scores land as two tables hash-bucketed on doc_id, then join with
    ZERO shuffle Exchange on either side (plan pinned in
    tests/test_layout.py with broadcast forced off — here the values
    witness the join). Per-lang totals over docs whose score passes
    the gate. Tables are external to a temp dir and dropped in
    finally; the result is materialized first."""
    import shutil
    import tempfile
    from .layout import colocated_join, drop_table, write_bucketed
    from .operators.quality_model import model_quality_units
    lt, rt = 'pam_q_bjoin_docs', 'pam_q_bjoin_scores'
    d1 = tempfile.mkdtemp(prefix='pam_q_bj1_')
    d2 = tempfile.mkdtemp(prefix='pam_q_bj2_')
    shutil.rmtree(d1)
    shutil.rmtree(d2)
    docs = (_t(spark, sf_dir, 'documents')
            .select('doc_id', 'lang',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    scores = (model_quality_units(_t(spark, sf_dir, 'documents'))
              .filter(F.col('mq_units') > 0)
              .select('doc_id', F.col('mq_units').alias('units')))
    try:
        write_bucketed(docs, lt, d1, 'doc_id', 8)
        write_bucketed(scores, rt, d2, 'doc_id', 8)
        res = (colocated_join(spark, lt, rt, 'doc_id')
               .groupBy('lang')
               .agg(F.count('*').cast('long').alias('n_docs'),
                    F.sum('toks').cast('long').alias('sum_toks'),
                    F.sum('units').cast('long').alias('sum_units'))
               .orderBy('lang'))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        drop_table(spark, lt)
        drop_table(spark, rt)
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def q_range_pruned_read(spark, sf_dir):
    """Range-clustered layout + min/max file skipping
    (layout.write_clustered / read_pruned, late round 5 — the
    Iceberg/Delta manifest-pruning idea over plain parquet):
    documents land range-clustered on doc_id across 8 files with a
    per-file min/max sidecar; a mid-range predicate then scans ONLY
    the overlapping files (skip evidence asserted here: fewer files
    read than exist). Values must equal a plain WHERE over the whole
    table — pruning is a physical optimization, never a semantic
    one."""
    import shutil
    import tempfile
    from .layout import read_pruned, write_clustered
    docs = (_t(spark, sf_dir, 'documents')
            .select('doc_id', 'lang',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    b = docs.agg(F.min('doc_id'), F.max('doc_id')).collect()[0]
    mn, mx = int(b[0]), int(b[1])
    lo = mn + (mx - mn) * 2 // 10
    hi = mn + (mx - mn) * 6 // 10
    out = tempfile.mkdtemp(prefix='pam_q_prune_')
    shutil.rmtree(out)
    try:
        write_clustered(docs, out, 'doc_id', 8)
        pruned = read_pruned(spark, out, 'doc_id', lo, hi)
        res = (pruned.groupBy('lang')
               .agg(F.count('*').cast('long').alias('n_docs'),
                    F.sum('toks').cast('long').alias('sum_toks'),
                    F.min('doc_id').cast('long').alias('min_id'),
                    F.max('doc_id').cast('long').alias('max_id'))
               .orderBy('lang'))
        rows = res.collect()
        read, total = pruned._pruned_files
        assert read < total, (read, total)   # the skip actually happened
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_salted_join(spark, sf_dir):
    """Salted shuffle join (skew.salted_join, late round 5 — the join
    companion to the salted aggs): events join a derived user dim on
    (user_id, per-row salt) so a hot user spreads across 8 reducers;
    the salt is routing only, so values must equal the plain join
    (hot-key partition spread is pinned in tests/test_skew.py).
    Per-event-type totals of the joined weight witness every matched
    row."""
    from .operators.skew import salted_join
    ev = _t(spark, sf_dir, 'events')
    dim = (ev.select('user_id').distinct()
           .withColumn('weight', (F.col('user_id') % 13).cast('long')))
    joined = salted_join(ev, dim, 'user_id', salt_buckets=8)
    return (joined.groupBy('event_type')
            .agg(F.count('*').cast('long').alias('n'),
                 F.sum('weight').cast('long').alias('sum_weight'),
                 F.sum('user_id').cast('long').alias('sum_uid'))
            .orderBy('event_type'))


def q_corpus_datasheet(spark, sf_dir):
    """Corpus datasheet (curate.corpus_datasheet, late round 5): the
    one-row release report — volume, diversity, duplication, quality
    pass rates — in a single aggregate job. Every value is an exact
    count or one IEEE division of exact counts (no avg-of-doubles),
    so the row is hash-stable under any partitioning."""
    from .operators.curate import corpus_datasheet
    return corpus_datasheet(_t(spark, sf_dir, 'documents'))


def q_jsonl_export(spark, sf_dir):
    """JSONL export sink round-trip (packing.export_jsonl /
    verify_jsonl, late round 5): documents export as range-clustered
    gzip JSONL with a written-last attested manifest, the loader-side
    verify passes, and the data read BACK from disk carries exactly
    the corpus — witnessed by the count, the token sum, and an
    order-independent md5 over the sorted id strings (file layout is
    a physical choice; the content checksum is not)."""
    import shutil
    import tempfile
    from .operators.packing import export_jsonl, verify_jsonl
    docs = (_t(spark, sf_dir, 'documents')
            .select('doc_id', 'lang',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    out = tempfile.mkdtemp(prefix='pam_q_jsonl_')
    shutil.rmtree(out)
    try:
        export_jsonl(spark, docs, out, 'doc_id', n_files=6)
        assert verify_jsonl(spark, out, 'doc_id')
        back = spark.read.json(f'{out}/data')
        res = back.agg(
            F.count('*').cast('long').alias('n_docs'),
            F.sum('toks').cast('long').alias('sum_toks'),
            F.md5(F.concat_ws(',', F.array_sort(
                F.collect_list(F.col('doc_id').cast('string')))))
            .alias('ids_md5'))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_recrawl_upsert(spark, sf_dir):
    """Recrawl upsert / MERGE INTO (checkpoint.upsert_output, late
    round 5): documents land as a bucketed store at ts=100; a
    re-crawl batch updates every doc_id%3==0 row (ts=200, toks+1000)
    and inserts one new key per doc_id%7==0 doc; only the affected
    bucket directories rewrite (pinned in tests/test_pipeline.py —
    here the read-back VALUES witness keep-latest + insert
    semantics, derived independently in SQL)."""
    import shutil
    import tempfile
    from . import checkpoint as cp
    docs = (_t(spark, sf_dir, 'documents')
            .select(F.col('doc_id').cast('string').alias('url'), 'lang',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    out = tempfile.mkdtemp(prefix='pam_q_upsert_')
    shutil.rmtree(out)
    try:
        stored = (docs.withColumn('crawl_ts', F.lit(100).cast('long'))
                  .withColumn('bucket',
                              F.pmod(F.xxhash64(F.col('url')), F.lit(8))
                              .cast('int')))
        stored.write.partitionBy('bucket').parquet(cp.data_path(out))
        upd = (docs.filter(F.col('url').cast('long') % 3 == 0)
               .withColumn('toks', F.col('toks') + 1000)
               .withColumn('crawl_ts', F.lit(200).cast('long')))
        ins = (docs.filter(F.col('url').cast('long') % 7 == 0)
               .select(F.concat(F.lit('x'), F.col('url')).alias('url'),
                       'lang', F.lit(1).cast('long').alias('toks'),
                       F.lit(150).cast('long').alias('crawl_ts')))
        batch = upd.select('url', 'lang', 'toks', 'crawl_ts') \
            .unionByName(ins)
        cp.upsert_output(spark, out, batch, key_col='url',
                         order_col='crawl_ts', n_buckets=8)
        res = (cp.read_output(spark, out)
               .groupBy('lang')
               .agg(F.count('*').cast('long').alias('n'),
                    F.sum('toks').cast('long').alias('sum_toks'),
                    F.sum('crawl_ts').cast('long').alias('sum_ts'))
               .orderBy('lang'))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_stream_export(spark, sf_dir):
    """Streaming training export (streaming.stream_export_shards,
    late round 5): documents flow through an availableNow stream into
    the shard tree — first batch creates the export, the manifest
    publishes last, verify_shards gates the read. Batching and shard
    layout are physical choices; the CONTENT is not: count, token sum
    and the order-independent md5 over sorted ids must equal the
    corpus, derived independently in SQL."""
    import shutil
    import tempfile
    from .operators.packing import verify_shards
    from .streaming import stream_export_shards
    docs = (_t(spark, sf_dir, 'documents')
            .select('doc_id',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    inp = tempfile.mkdtemp(prefix='pam_q_sx_in_')
    out = tempfile.mkdtemp(prefix='pam_q_sx_out_')
    shutil.rmtree(inp)
    shutil.rmtree(out)
    try:
        docs.write.parquet(inp)
        stream_export_shards(spark, inp, out, 'doc_id long, toks long',
                             'doc_id', 'toks', 5000, seed='r5sx')
        assert verify_shards(spark, out, 'doc_id', 'toks')
        back = spark.read.parquet(f'{out}/shards')
        res = back.agg(
            F.count('*').cast('long').alias('n_docs'),
            F.sum('toks').cast('long').alias('sum_toks'),
            F.md5(F.concat_ws(',', F.array_sort(
                F.collect_list(F.col('doc_id').cast('string')))))
            .alias('ids_md5'))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(inp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def q_export_diff(spark, sf_dir):
    """Export versioning diff (packing.diff_manifests, round 6):
    export A = even docs; export B = a COPY of A with the odd docs
    appended at the next boundary (append_shards). The diff must read
    all of A's shards as UNCHANGED (the append-only immutability
    contract, audited through the user-facing artifact) plus ADDED
    shards carrying exactly the odd batch — never changed/removed.
    ORACLED: per-status doc/token sums derive from documents by
    arithmetic (shard layout is physical; the even/odd content split
    is not)."""
    import shutil
    import tempfile
    from .operators.dedup import release as _release
    from .operators.packing import (append_shards, diff_manifests,
                                    shuffle_shards, write_shards)
    docs = (_t(spark, sf_dir, 'documents')
            .select('doc_id',
                    F.size(F.split(F.trim(F.col('text')), r'\s+'))
                    .cast('long').alias('toks')))
    a = tempfile.mkdtemp(prefix='pam_q_diff_a_')
    b = tempfile.mkdtemp(prefix='pam_q_diff_b_')
    shutil.rmtree(a)
    try:
        even = docs.filter(F.col('doc_id') % 2 == 0)
        sharded = shuffle_shards(even, 'doc_id', 'toks', 5000,
                                 seed='r6diff')
        write_shards(spark, sharded, a, 'doc_id', 'toks')
        _release(sharded)
        shutil.rmtree(b)
        shutil.copytree(a, b)
        odd = docs.filter(F.col('doc_id') % 2 == 1)
        append_shards(spark, odd, b, 'doc_id', 'toks', 5000,
                      seed='r6diff2')
        d = diff_manifests(spark, a, b)
        # shard COUNTS are physical (md5-order dependent) — the oracle
        # grades the layout-independent content sums per status
        out = (d.groupBy('status')
               .agg(F.sum('n_docs').cast('long').alias('sum_docs'),
                    F.sum('n_tokens').cast('long').alias('sum_tokens'))
               .orderBy('status'))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)


def q_mixture_fill(spark, sf_dir):
    """Mixture waterfilling end-to-end (curate.budgets_from_mixture →
    token_budget_fill, late round 5): weights en:3 / de:2 / zh:5
    against a total of 3/5 of those groups' combined tokens. zh's
    share (5/10 of total) exceeds its availability at every gate SF,
    so round 1 clamps zh to availability and the shortfall reflows
    to en/de by 3:2 in round 2 (neither clamps — comfortable margin
    at both SFs). The greedy fill then selects by (alpha_ratio desc,
    doc_id asc). ORACLED: DuckDB rebuilds availability, the exact
    integer waterfilling arithmetic, and the fill window."""
    from .operators.curate import budgets_from_mixture, token_budget_fill
    from .operators.textstats import with_quality
    d = _t(spark, sf_dir, 'documents')
    q = with_quality(d, 'text')
    weights = {'en': 3, 'de': 2, 'zh': 5}
    avail = (q.filter(F.col('lang').isin(*weights))
             .agg(F.sum('n_tokens')).collect()[0][0])
    total = 3 * int(avail) // 5
    budgets = budgets_from_mixture(q, 'lang', 'n_tokens', weights, total)
    kept = token_budget_fill(q, 'lang', budgets, 'n_tokens',
                             [('alpha_ratio', 'desc'), ('doc_id', 'asc')])
    b = spark.createDataFrame(list(budgets.items()),
                              'lang string, budget long')
    return (kept.groupBy('lang')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('n_tokens').cast('long').alias('sum_tokens'),
                 F.sum('doc_id').cast('long').alias('id_sum'))
            .join(F.broadcast(b), on='lang'))


def q_minhash_incremental(spark, sf_dir):
    """Incremental MinHash index (dedup.minhash_index_update; rows-only
    — estimated Jaccard is not SQL, and the full-vs-incremental
    equivalence is pinned by tests/test_minhash_index.py): even doc_ids
    arrive as batch 1, odd as batch 2; batch 2 signs ONLY itself and
    joins the stored band table — per-batch cost scales with the batch,
    not the corpus. Reports per-batch pair counts, the cross-batch
    discovery count, and the index size."""
    import shutil
    import tempfile
    from .operators.dedup import minhash_index_update
    d = _t(spark, sf_dir, 'documents')
    idx = tempfile.mkdtemp(prefix='pam_q_mhidx_')
    try:
        b1 = d.filter(F.col('doc_id') % 2 == 0)
        b2 = d.filter(F.col('doc_id') % 2 == 1)
        p1 = minhash_index_update(spark, b1, idx, 'doc_id', 'text',
                                  'batch-even').collect()
        p2 = minhash_index_update(spark, b2, idx, 'doc_id', 'text',
                                  'batch-odd').collect()
        cross = sum(1 for r in p2
                    if (r['id_a'] % 2 == 0) != (r['id_b'] % 2 == 0))
        n_index = spark.read.parquet(idx).count()
        return spark.createDataFrame(
            [(len(p1), len(p2), cross, n_index)],
            'n_pairs_batch1 long, n_pairs_batch2 long, '
            'n_cross_batch_pairs long, n_index_rows long')
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination screen (textstats.decontamination_
    overlap): every 97th document plays the held-out benchmark; the
    rest is the training corpus. Per contaminated training doc, the
    count of distinct 3-gram shingles shared with the benchmark —
    the published GPT-3/Llama n-gram scrub re-expressed as one
    broadcast semi-join (the training side never shuffles). ORACLED:
    DuckDB rebuilds both shingle sets and intersects them."""
    from .operators.textstats import decontamination_overlap
    d = _t(spark, sf_dir, 'documents')
    bench = d.filter(F.col('doc_id') % 97 == 0)
    train = d.filter(F.col('doc_id') % 97 != 0)
    return (decontamination_overlap(train, bench, 'doc_id', 'text', k=3)
            .orderBy('doc_id'))


def q_neardup_clusters(spark, sf_dir):
    """Transitive closure of the near-dup graph: the oracled exact
    n-gram-Jaccard pairs (J≥0.5) resolved into duplicate CLUSTERS by
    dedup.connected_components (iterative min-label propagation —
    Spark's Pregel-style loop, one narrow shuffle per round). Reports
    per-cluster (representative, size, id-checksum). ORACLED: DuckDB
    reconstructs the same pairs (the q_ngram_jaccard_exact SQL) and
    closes them with a recursive CTE — a full value check of an
    ITERATIVE graph operator."""
    from .operators.dedup import connected_components, release
    d = _t(spark, sf_dir, 'documents')
    pairs = ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.5)
    cc = connected_components(pairs)
    rows = (cc.groupBy('component')
            .agg(F.count('*').cast('long').alias('n_members'),
                 F.sum('node').cast('long').alias('id_sum'))
            .orderBy('component').collect())
    release(cc)
    release(pairs)
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        'component long, n_members long, id_sum long')


def q_cluster_keep_best(spark, sf_dir):
    """Acting on near-dup clusters (dedup.keep_best_per_cluster, round
    7): the oracled exact-Jaccard pairs resolve to clusters
    (connected_components), then ONE survivor per cluster is kept by
    the production policy — longest document wins (n_chars DESC),
    doc_id ASC breaks ties — instead of the min-id label. Unclustered
    docs pass through untouched. The corpus-level witness (count,
    id sum, order-independent ids_md5, char sum) pins every keep/drop
    decision. ORACLED: DuckDB replays pairs → recursive-CTE closure →
    the same ROW_NUMBER policy."""
    from .operators.dedup import (connected_components,
                                  keep_best_per_cluster, release)
    d = _t(spark, sf_dir, 'documents')
    pairs = ngram_jaccard_pairs(d, 'doc_id', 'text', k=3, threshold=0.5)
    cc = connected_components(pairs)
    kept = keep_best_per_cluster(d, cc, 'doc_id', ('n_chars',))
    res = kept.agg(
        F.count('*').cast('long').alias('n_kept'),
        F.sum('doc_id').cast('long').alias('id_sum'),
        F.md5(F.concat_ws(',', F.array_sort(
            F.collect_list(F.col('doc_id').cast('string'))))).alias('ids_md5'),
        F.sum('n_chars').cast('long').alias('char_sum'))
    rows = res.collect()
    release(cc)
    release(pairs)
    return spark.createDataFrame(rows, res.schema)


def q_bloom_incremental_ingest(spark, sf_dir):
    """Bloom-prefiltered incremental ingest (operators/bloom.py +
    run_extraction(bloom_prefilter=True)): batch A (even doc_ids) is
    committed, then batch B (doc_ids divisible by 3, overlapping A at
    multiples of 6) ingests through the Bloom split — definite-new
    rows bypass the anti-join shuffle entirely; maybe-dup rows (true
    overlaps + ~1% false positives) take the exact anti-join. The
    filter moves bytes, never answers, so the committed set is exactly
    A ∪ B. ORACLED: per-lang counts of {doc_id : 2|id or 3|id} derived
    independently from the documents table."""
    import shutil
    import tempfile
    from . import checkpoint as cp_mod
    from .config import EngineConfig
    from .fixtures.webpages import web_pages_from_documents
    from .pipeline import run_extraction
    d = _t(spark, sf_dir, 'documents')
    outdir = tempfile.mkdtemp(prefix='pam_q_bloom_')
    try:
        cfg = EngineConfig(shuffle_partitions=8, output_buckets=8)
        for pred in (F.col('doc_id') % 2 == 0, F.col('doc_id') % 3 == 0):
            pages = web_pages_from_documents(spark, sf_dir,
                                             docs=d.filter(pred))
            run_extraction(spark, pages, outdir, cfg,
                           dedup_against_output=True, bloom_prefilter=True)
        out = cp_mod.read_output(spark, outdir)
        ids = out.select(F.regexp_extract('url', r'/p/(\d+)$', 1)
                         .cast('long').alias('doc_id'))
        rows = (ids.join(d.select('doc_id', 'lang'), on='doc_id')
                .groupBy('lang').agg(F.count('*').cast('long').alias('n'))
                .orderBy('lang').collect())  # materialize before rmtree
        return spark.createDataFrame([tuple(r) for r in rows],
                                     'lang string, n long')
    finally:
        shutil.rmtree(outdir, ignore_errors=True)


def q_ivf_ann_exact(spark, sf_dir):
    """IVF ANN probed at n_probe = n_lists — every cell scanned, so the
    result is PROVABLY the exact brute-force top-k (ivf_topk degenerates
    to brute_force_topk over the whole corpus; similarity.py:185-201).
    ORACLED with the same exact-cosine SQL as q_emb_cosine_topk: this
    value-checks the IVF machinery end-to-end — KMeans cell assignment
    loses no vectors, the probe-union covers the corpus, and the
    per-cell cosine math matches the exact oracle bit-for-bit. The
    pruning path (n_probe < n_lists, partition-pruned scan) stays the
    rows-only q_ivf_ann_topk + the pytest recall/pruning pins."""
    from .operators.similarity import ivf_index, ivf_topk
    vecs = _t(spark, sf_dir, 'embeddings')
    q = vecs.filter(F.col('vec_id') == 0).select('embedding').collect()[0][0]
    indexed, model = ivf_index(vecs, n_lists=8)
    return (ivf_topk(indexed, model, [float(x) for x in q], k=10, n_probe=8)
            .orderBy(F.desc('cos_sim'), F.asc('vec_id')))


def q_stream_ingest(spark, sf_dir):
    """Structured Streaming ingest (streaming.ingest_stream; rows-only —
    runs a real availableNow file-source stream through the SAME
    pipeline.transform body into the idempotent per-batch sink, then
    reports corpus-level outcomes incl. per-url byte identity.
    Reference analogue: the upload daemon-thread loop,
    document_service.py:154-162."""
    import shutil
    import tempfile
    from . import checkpoint as cp_mod
    from .config import EngineConfig
    from .fixtures.webpages import web_pages_from_documents
    from .streaming import ingest_stream
    indir = tempfile.mkdtemp(prefix='pam_q_stream_in_')
    outdir = tempfile.mkdtemp(prefix='pam_q_stream_out_')
    try:
        pages = web_pages_from_documents(spark, sf_dir)
        pages.coalesce(4).write.mode('overwrite').parquet(indir)
        ingest_stream(spark, indir, outdir,
                      EngineConfig(shuffle_partitions=8, output_buckets=8))
        out = cp_mod.read_output(spark, outdir)
        truth = spark.read.parquet(indir).select('url', 'text')
        row = (out.join(truth, on='url')
               .agg(F.count('*').alias('n_rows'),
                    F.sum((F.col('extracted_text') == F.col('text'))
                          .cast('long')).alias('n_byte_identical'),
                    F.sum(F.col('is_error').cast('long')).alias('n_errors'),
                    F.countDistinct('content_hash').alias('n_hashes'))
               .collect()[0])
        return spark.createDataFrame(
            [(row['n_rows'], row['n_byte_identical'], row['n_errors'],
              row['n_hashes'])],
            'n_rows long, n_byte_identical long, n_errors long, n_hashes long')
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def q_stream_windowed_counts(spark, sf_dir):
    """Watermarked event-time windowed aggregation over a real stream
    (streaming.windowed_host_counts): per-(window, host) page counts
    with hot-host flags, reported as deterministic corpus totals.
    ORACLED: the DuckDB oracle reconstructs the same 30-minute tumbling
    windows independently from the documents table (the fixture's
    warc_ts/host arithmetic — epoch + 17·doc_id seconds, 20% hot-host
    skew — is pure SQL) and keeps only windows FINALIZED by the stream's
    watermark (window_end ≤ max(ts) − 10 min; append mode emits exactly
    those once the final no-data microbatch advances the watermark).
    Batch-split independent: whatever availableNow's file batching,
    the post-flush emitted set is the same."""
    import shutil
    import tempfile
    from .fixtures.webpages import web_pages_from_documents
    from .streaming import windowed_host_counts
    indir = tempfile.mkdtemp(prefix='pam_q_win_in_')
    outdir = tempfile.mkdtemp(prefix='pam_q_win_out_')
    try:
        pages = web_pages_from_documents(spark, sf_dir)
        pages.coalesce(4).write.mode('overwrite').parquet(indir)
        windowed_host_counts(spark, indir, outdir,
                             window='30 minutes', watermark='10 minutes',
                             hot_threshold=15)
        rows = (spark.read.parquet(f'{outdir}/host_counts')
                .agg(F.count('*').alias('n_window_rows'),
                     F.countDistinct('host').alias('n_hosts'),
                     F.sum('n_pages').alias('total_pages'),
                     F.sum(F.col('is_hot').cast('long')).alias('n_hot'))
                .collect()[0])
        return spark.createDataFrame(
            [tuple(rows)],
            'n_window_rows long, n_hosts long, total_pages long, n_hot long')
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def q_sessionization(spark, sf_dir):
    """Stateful streaming sessionization (streaming.sessionize_events,
    applyInPandasWithState): gap-based sessions over the events table
    run as a REAL stream, then aggregated. ORACLED: the DuckDB oracle
    reconstructs the same sessions independently via the classic
    lag + cumulative-break-sum SQL and drops each user's trailing
    session (which stays OPEN in the stream's state by design) — a
    full value-level check of a custom stateful streaming operator."""
    import shutil
    import tempfile
    from .streaming import sessionize_events
    indir = tempfile.mkdtemp(prefix='pam_q_sess_in_')
    outdir = tempfile.mkdtemp(prefix='pam_q_sess_out_')
    try:
        _t(spark, sf_dir, 'events').coalesce(4).write.mode('overwrite').parquet(indir)
        sessionize_events(spark, indir, outdir, gap_seconds=1800)
        rows = (spark.read.parquet(f'{outdir}/sessions')
                .agg(F.count('*').alias('n_sessions'),
                     F.countDistinct('user_id').alias('n_users'),
                     F.sum('n_events').alias('total_events'),
                     F.max('n_events').alias('max_session_events'))
                .collect()[0])
        return spark.createDataFrame(
            [tuple(rows)],
            'n_sessions long, n_users long, total_events long, '
            'max_session_events long')
    finally:
        shutil.rmtree(indir, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)


def q_multimodal_metadata(spark, sf_dir):
    """Multimodal column operators (operators/multimodal; rows-only):
    image/audio/video payloads as opaque binary columns decoded by
    Arrow-batched mapInPandas stages — per-modality decode-ok/error
    counts plus a deterministic metadata checksum. Payloads are real
    container formats (PNG IHDR, RIFF/WAVE header, length-prefixed
    frames) built deterministically from row ids; every 5th image and
    every 4th audio row is deliberately undecodable. ORACLED: the
    DuckDB oracle derives the EXPECTED metadata independently from the
    construction arithmetic (1×1 8-bit PNGs → width 1 per decoded
    image; WAV rate 8000+1000·(i%3); ceil((4+i)/2) sampled frames at
    every_n=2), so the header parsers are value-checked, not just
    executed."""
    import struct as _struct
    from .fixtures.webpages import build_png
    from .operators.multimodal import (audio_metadata, image_metadata,
                                       video_sampled_frames)

    def wav(rate, seconds):
        n = int(rate * seconds) * 2
        return (b'RIFF' + _struct.pack('<I', 36 + n) + b'WAVE'
                + b'fmt ' + _struct.pack('<IHHIIHH', 16, 1, 1, rate,
                                         rate * 2, 2, 16)
                + b'data' + _struct.pack('<I', n) + b'\x00' * n)

    def video(n_frames):
        out = b''
        for j in range(n_frames):
            f = f'frame{j}'.encode()
            out += _struct.pack('>I', len(f)) + f
        return out

    imgs = spark.createDataFrame(
        [(i, b'not a png' if i % 5 == 0 else build_png(f'm{i}'))
         for i in range(24)], 'id long, payload binary')
    auds = spark.createDataFrame(
        [(i, b'garbage' if i % 4 == 0 else wav(8000 + 1000 * (i % 3), 0.25))
         for i in range(12)], 'id long, payload binary')
    vids = spark.createDataFrame(
        [(i, video(4 + i)) for i in range(6)], 'id long, payload binary')

    im = (image_metadata(imgs)
          .agg(F.count('*').alias('n'),
               F.sum(F.col('decode_error').isNull().cast('long')).alias('n_ok'),
               F.coalesce(F.sum('width'), F.lit(0)).alias('checksum'))
          .collect()[0])
    au = (audio_metadata(auds)
          .agg(F.count('*').alias('n'),
               F.sum(F.col('decode_error').isNull().cast('long')).alias('n_ok'),
               F.coalesce(F.sum('sample_rate'), F.lit(0)).alias('checksum'))
          .collect()[0])
    vi = (video_sampled_frames(vids, every_n=2)
          .agg(F.countDistinct('id').alias('n'),
               F.countDistinct('id').alias('n_ok'),
               F.count('*').alias('checksum'))  # total sampled frames
          .collect()[0])
    rows = [('image', im['n'], im['n_ok'], int(im['checksum'])),
            ('audio', au['n'], au['n_ok'], int(au['checksum'])),
            ('video', vi['n'], vi['n_ok'], int(vi['checksum']))]
    return spark.createDataFrame(
        rows, 'modality string, n_rows long, n_decode_ok long, checksum long')


def q_warc_ingest(spark, sf_dir):
    """WARC source (sources/warc.py; rows-only — byte identity is not
    SQL): documents-derived pages serialized as REAL WARC 1.0 segments
    (one plain, one per-record-gzipped — the Common Crawl convention),
    read back distributively via binaryFile + mapInPandas, and pushed
    through the full extraction transform; reports per-url
    byte-identity against the fixture ground truth."""
    import shutil
    import tempfile
    from .fixtures.webpages import build_warc, web_pages_from_documents
    from .pipeline import transform
    from .sources.warc import read_warc
    d = _t(spark, sf_dir, 'documents').filter(F.col('doc_id') < 200)
    rows = (web_pages_from_documents(spark, sf_dir, docs=d)
            .select('url', 'warc_ts', 'html', 'text').collect())
    tmp = tempfile.mkdtemp(prefix='pam_q_warc_')
    try:
        half = len(rows) // 2
        with open(f'{tmp}/seg1.warc', 'wb') as f:
            f.write(build_warc([(r['url'], r['warc_ts'], bytes(r['html']))
                                for r in rows[:half]]))
        with open(f'{tmp}/seg2.warc.gz', 'wb') as f:
            f.write(build_warc([(r['url'], r['warc_ts'], bytes(r['html']))
                                for r in rows[half:]], gzip_members=True))
        truth = {r['url']: r['text'] for r in rows}
        out = transform(read_warc(spark, tmp), run_id='warc').collect()
        n_ok = sum(1 for r in out if r['extracted_text'] == truth[r['url']])
        return spark.createDataFrame(
            [(len(rows), len(out), n_ok)],
            'n_pages long, n_ingested long, n_byte_identical long')
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_warc_framing(spark, sf_dir):
    """WARC framing arithmetic, VALUE-ORACLED (round 7 — VERDICT r6
    #6: the rows-only q_warc_ingest byte-checks real extraction; this
    one proves the OFFSET-INDEX path's record framing in SQL). A raw
    WARC segment is synthesized from pure doc_id arithmetic (ASCII
    payload 'p{id}:' + 'x'×((id·37)%256+1), fixed date, fixed-width
    record id — build_warc's exact template), then (a) the streamed
    offset-index sidecar (sources/warc.build_warc_index — the 2 GiB+
    scale path) frames every record and (b) the span reader
    (read_warc(index=...), target 8 KiB → ~10 seek+read tasks over one
    file) recovers every payload. DuckDB re-derives each record's
    offset and length from the construction template (raw-record
    lengths TILE the file, so length == head+http+4 exactly, offset ==
    the running sum) and each payload's md5 — a full value check that
    the independently-written index framing and the reader agree with
    the WARC 1.0 grammar byte-for-byte. Windows here are fixture-scale
    (one row per record, collected before return); at 100 TB the index
    is built once per segment and persisted (CDX-style)."""
    import shutil
    import tempfile
    from datetime import datetime
    from .fixtures.webpages import build_warc
    from .sources.warc import build_warc_index, read_warc
    i = F.col('doc_id')
    payload = F.concat(
        F.lit('p'), i.cast('string'), F.lit(':'),
        F.repeat(F.lit('x'), ((i * 37) % 256 + 1).cast('int')))
    rows = (_t(spark, sf_dir, 'documents').filter(i < 200)
            .select('doc_id',
                    F.concat(F.lit('http://w.example/'),
                             i.cast('string')).alias('url'),
                    payload.alias('payload'))
            .orderBy('doc_id').collect())
    tmp = tempfile.mkdtemp(prefix='pam_q_warcf_')
    try:
        with open(f'{tmp}/seg.warc', 'wb') as f:
            f.write(build_warc([(r['url'], datetime(2025, 1, 1),
                                 r['payload'].encode('ascii'))
                                for r in rows]))
        idx = build_warc_index(spark, tmp)
        # offset order == build order == doc_id order: align by rank
        recs = (idx.withColumn(
            'rid', F.row_number().over(Window.orderBy('offset')) - 1)
            .select('rid', 'offset', 'length'))
        pages = read_warc(spark, tmp, index=idx, target_task_bytes=8192)
        got = (pages.select(
            F.regexp_extract('url', r'/(\d+)$', 1).cast('long')
            .alias('doc_id'),
            F.length('html').cast('long').alias('payload_len'),
            F.md5('html').alias('payload_md5'))
            .withColumn('rid',
                        F.row_number().over(Window.orderBy('doc_id')) - 1))
        out = (got.join(recs, 'rid')
               .select('doc_id', 'offset', 'length', 'payload_len',
                       'payload_md5')
               .orderBy('doc_id').collect())
        return spark.createDataFrame(
            [tuple(r) for r in out],
            'doc_id long, offset long, length long, payload_len long,'
            ' payload_md5 string')
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation (operators/curate.curate_corpus):
    quality gate → exact dedup → line dedup → chrome-dedup → dup score
    → per-source quota → hash split, composed over the documents table
    re-laid-out as 4-token lines (construction shared verbatim with
    q_line_dedup so the line stage has real cross-doc duplicates to
    remove). FULL value oracle since round 5 (VERDICT r4 #3): the
    DuckDB side chains every stage's already-proven oracle into one
    CTE pipeline — including the data-dependent line_min_df =
    max(3, floor(0.002·|gated|)) threshold as a scalar subquery — and
    the id_sum / line-count / dup_frac witnesses pin the exact
    survivor set of the whole composition, not just its cardinality."""
    from .operators.curate import curate_corpus
    k = 4
    toks = F.split(F.col('text'), ' ')
    n = F.size(toks)
    linearr = F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(k)).cast('int') - 1),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(k) + F.lit(1), F.lit(k)), ' '))
    d = (_t(spark, sf_dir, 'documents')
         .select('doc_id', F.array_join(linearr, '\n').alias('text'),
                 'lang', 'source', 'n_chars'))
    out = curate_corpus(d, source_cap=30)
    return (out.groupBy('split', 'source')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('doc_id').cast('long').alias('id_sum'),
                 F.sum('n_kept').cast('long').alias('lines_kept'),
                 F.sum('n_removed').cast('long').alias('lines_removed'),
                 F.round(F.avg('dup_frac'), 6).alias('avg_dup_frac'))
            .orderBy('split', 'source'))


def q_compaction_content(spark, sf_dir):
    """Small-file compaction, VALUE-ORACLED (round 6 — the rows-only
    q_compaction exercises the real extraction store; this one proves
    content invariance end-to-end on SQL-derivable data): documents
    written as a fragmented bucketed store in three append slices,
    compacted behind the row-count check + atomic swap, read back —
    count, id sum, order-independent ids-md5 and char sum must equal
    the corpus exactly (compaction moves bytes, never rows). The
    files-reduced invariant is asserted in-query so a no-op compactor
    cannot pass."""
    import shutil
    import tempfile
    from . import checkpoint as cp_mod
    d = _t(spark, sf_dir, 'documents').select(
        F.concat(F.lit('doc-'), F.col('doc_id').cast('string'))
        .alias('url'),
        'doc_id', 'text',
        F.pmod(F.xxhash64(F.col('doc_id').cast('string')),
               F.lit(8)).cast('int').alias('bucket'))
    outdir = tempfile.mkdtemp(prefix='pam_q_compc_')
    shutil.rmtree(outdir)
    data = cp_mod.data_path(outdir)
    try:
        for r in range(3):
            (d.filter(F.col('doc_id') % 3 == r).repartition(4)
             .write.partitionBy('bucket').mode('append').parquet(data))
        files_before = len(spark.read.parquet(data).inputFiles())
        stats = cp_mod.compact_output(spark, outdir)
        assert stats['files_after'] < files_before
        back = cp_mod.read_output(spark, outdir)
        res = back.agg(
            F.count('*').cast('long').alias('n_docs'),
            F.sum('doc_id').cast('long').alias('id_sum'),
            F.md5(F.concat_ws(',', F.array_sort(F.collect_list(
                F.col('doc_id').cast('string'))))).alias('ids_md5'),
            F.sum(F.length('text')).cast('long').alias('chars'))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)


def q_compaction(spark, sf_dir):
    """Small-file compaction (checkpoint.compact_output; rows-only):
    three incremental ingest batches fragment the bucketed layout, the
    compactor rewrites it to ≤1 file per bucket behind a row-count
    check and an atomic swap; reports rows + the invariants."""
    import shutil
    import tempfile
    from . import checkpoint as cp_mod
    from .config import EngineConfig
    from .fixtures.webpages import web_pages_pandas
    from .pipeline import run_extraction
    cfg = EngineConfig(shuffle_partitions=8, output_buckets=8)
    outdir = tempfile.mkdtemp(prefix='pam_q_compact_')
    try:
        for start in (0, 100, 200):
            batch = spark.createDataFrame(web_pages_pandas(40, start=start))
            run_extraction(spark, batch, outdir, cfg,
                           dedup_against_output=True)
        files_before = len(cp_mod.read_output(spark, outdir).inputFiles())
        stats = cp_mod.compact_output(spark, outdir)
        n_after = cp_mod.read_output(spark, outdir).count()
        return spark.createDataFrame(
            [(stats['rows'], n_after == stats['rows'],
              stats['files_after'] < files_before,
              stats['files_after'] <= cfg.output_buckets)],
            'rows long, rows_preserved boolean, files_reduced boolean, '
            'files_within_bucket_bound boolean')
    finally:
        shutil.rmtree(outdir, ignore_errors=True)


def q_extraction_pipeline(spark, sf_dir):
    """The flagship: full extraction pipeline over web pages synthesized
    from the documents table; per-url byte-identity asserted as a
    boolean column (rows-only check — extraction is not SQL)."""
    from .fixtures.webpages import web_pages_from_documents
    from .pipeline import transform
    pages = web_pages_from_documents(spark, sf_dir)
    out = transform(pages, run_id='driver', partitions=None)
    return (out.select('url', 'doctype', 'content_hash', 'is_error',
                       'error_code',
                       (F.col('extracted_text') == F.col('text')).alias('byte_identical'))
            .orderBy('url'))


# =====================================================================
# SQL oracles (DuckDB dialect-compatible ANSI SQL)
# =====================================================================

def _markers_score_sql(lang: str) -> str:
    return ' + '.join(_count_token_sql(w) for w in _MARKERS[lang])


_LANG_ID_CASE = (
    "CASE WHEN s_han >= 1 AND s_han * 5 >= GREATEST(n_cp, 1) THEN 'zh' "
    + ' '.join(
        f"WHEN s_{lang} >= GREATEST({', '.join('s_' + o for o in _MARKERS)}) "
        f"AND s_{lang} >= 1 THEN '{lang}'"
        for lang in _MARKERS)
    + " ELSE 'und' END"
)

# script-ID SQL mirror, generated from the same pinned SCRIPT_RANGES
# (counts re-derived via length(regexp_replace) — an independent
# derivation of the same code-point counts; CASE chain in dict order,
# earlier wins ties, 'kana' relabels to 'jpan')
_SCRIPTS = list(textstats.SCRIPT_RANGES)
_SCRIPT_COUNTS_SQL = ', '.join(
    "length(regexp_replace(text, '[^" + r + "]', '', 'g')) AS c_" + s
    for s, r in textstats.SCRIPT_RANGES.items())
_SCRIPT_TOTAL_SQL = ' + '.join('c_' + s for s in _SCRIPTS)
_SCRIPT_MAX_SQL = 'GREATEST(' + ', '.join('c_' + s for s in _SCRIPTS) + ')'
_SCRIPT_CASE = (
    "CASE WHEN total = 0 THEN 'und' "
    "WHEN c_kana >= 1 AND c_kana * 20 >= total THEN 'jpan' "
    "WHEN 2 * m < total THEN 'mixed' "
    + ' '.join(
        "WHEN c_" + s + " = m THEN '" + ('jpan' if s == 'kana' else s) + "'"
        for s in _SCRIPTS)
    + ' END')
_SCRIPT_VALUES_SQL = ', '.join(
    "(" + str(sid) + ", '" + txt + "')" for sid, txt in _SCRIPT_SAMPLES)

# A6 topic-type SQL mirror, generated from the same pinned keyword dict
# (first-in-dict-order wins ties — the CASE chain in dict order)
_TOPIC_TYPES = list(TOPIC_KEYWORDS)
_TOPIC_SCORES_SQL = ', '.join(
    "len(list_filter(toks, t -> regexp_matches(t, '"
    + '|'.join(TOPIC_KEYWORDS[t]) + f"'))) AS s_{i}"
    for i, t in enumerate(_TOPIC_TYPES))
_TOPIC_CASE = (
    "CASE "
    + ' '.join(
        f"WHEN s_{i} >= GREATEST("
        + ', '.join(f's_{j}' for j in range(len(_TOPIC_TYPES)))
        + f") AND s_{i} > 0 THEN '{t}'"
        for i, t in enumerate(_TOPIC_TYPES))
    + " ELSE 'Document' END"
)

ORACLES: dict[str, str] = {
    'q_t2_t5_normalize': r"""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(text), '[^\w\s-]', ' ', 'g'),
                       '\d+', ' ', 'g'),
                   '\s+', ' ', 'g')) AS norm_text
        FROM documents ORDER BY doc_id
    """,
    'q_t7_meaningful_tokens': f"""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> length(x) >= 3
                         AND x NOT IN ({_STOPS_SQL})
                         AND NOT regexp_full_match(x, '[0-9]+')))
                    AS BIGINT) AS n_meaningful
        FROM documents ORDER BY doc_id
    """,
    'q_d1_content_hash': """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_hashes
        FROM documents
    """,
    'q_d2_dedup_first_seen': """
        WITH ranked AS (
            SELECT lang, row_number() OVER (PARTITION BY md5(text)
                                            ORDER BY doc_id) AS rn
            FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_survivors
        FROM ranked WHERE rn = 1 GROUP BY lang ORDER BY lang
    """,
    'q_w1_relevance_topk': """
        SELECT doc_id,
               CAST((length(lower(text)) -
                     length(replace(lower(text), 'spark', ''))) / 5 AS BIGINT)
                   AS score
        FROM documents
        WHERE (length(lower(text)) -
               length(replace(lower(text), 'spark', ''))) / 5 > 0
        ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
    'q_w3_topk_events': """
        SELECT event_id, user_id, event_type, round(value, 6) AS value_r
        FROM events ORDER BY value_r DESC, event_id ASC LIMIT 10
    """,
    'q_w5_first_event_per_user': """
        WITH ranked AS (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events)
        SELECT user_id, event_id, event_type
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    'q_f2_lang_filter_counts': """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY lang, source ORDER BY lang, source
    """,
    'q_a1_wordfreq_top3': """
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents),
        filtered AS (SELECT doc_id, w FROM words WHERE length(w) >= 4),
        counts AS (
            SELECT doc_id, w, count(*) AS c
            FROM filtered GROUP BY doc_id, w),
        ranked AS (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, w ASC) AS rn
            FROM counts)
        SELECT doc_id, string_agg(w, ', ' ORDER BY rn) AS top_words
        FROM ranked WHERE rn <= 3 GROUP BY doc_id ORDER BY doc_id
    """,
    'q_a3_term_document_frequency': f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
            FROM documents)
        SELECT t, CAST(count(*) AS BIGINT) AS df_count
        FROM toks
        WHERE length(t) >= 3 AND t NOT IN ({_STOPS_SQL})
        GROUP BY t ORDER BY df_count DESC, t ASC LIMIT 20
    """,
    'q_a7_distinct_filter_values': """
        SELECT DISTINCT lang, source FROM documents ORDER BY lang, source
    """,
    'q_a8_corpus_stats': """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    'q_j1_anti_join': """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    'q_j2_broadcast_join': """
        SELECT c_mktsegment, round(sum(o_totalprice), 4) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    'q_j3_semi_join': """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    'q_tpch_q1_pricing_summary': """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    'q_set_ops': """
        SELECT CAST((SELECT count(*) FROM (
                   SELECT doc_id FROM documents WHERE lang = 'en'
                   INTERSECT
                   SELECT doc_id FROM documents WHERE source = 'src1')) AS BIGINT)
                   AS n_intersect,
               CAST((SELECT count(*) FROM (
                   SELECT doc_id FROM documents WHERE lang = 'en'
                   EXCEPT ALL
                   SELECT doc_id FROM documents WHERE source = 'src1')) AS BIGINT)
                   AS n_except,
               CAST((SELECT count(DISTINCT doc_id) FROM (
                   SELECT doc_id FROM documents WHERE lang = 'en'
                   UNION ALL
                   SELECT doc_id FROM documents WHERE source = 'src1')) AS BIGINT)
                   AS n_union
    """,
    'q_lang_id': (
        "WITH scored AS (SELECT lang, "
        + ', '.join(f"{_markers_score_sql(lang)} AS s_{lang}" for lang in _MARKERS)
        + r", length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g'))"
        " AS s_han, length(text) AS n_cp"
        + " FROM documents), pred AS (SELECT lang, " + _LANG_ID_CASE
        + " AS lang_pred FROM scored) "
        "SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n "
        "FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred"
    ),
    # dominant-script ID: ten independent code-point counts + the
    # pinned CASE chain over corpus ∪ planted samples
    'q_script_id': (
        "WITH planted(sid, text) AS (VALUES " + _SCRIPT_VALUES_SQL + "), "
        "uni AS (SELECT 'corpus' AS src, text FROM documents "
        "UNION ALL SELECT 'planted', text FROM planted), "
        "c AS (SELECT src, " + _SCRIPT_COUNTS_SQL + " FROM uni), "
        "t AS (SELECT src, " + _SCRIPT_TOTAL_SQL + " AS total, "
        + _SCRIPT_MAX_SQL + " AS m, c.* FROM c) "
        "SELECT src, " + _SCRIPT_CASE + " AS script, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM t GROUP BY src, script ORDER BY src, script"
    ),
    # html head metadata: same pinned regexes replayed by RE2 (''-on-
    # no-match matches Spark's regexp_extract), same page construction
    'q_html_meta': r"""
        WITH pages AS (
            SELECT doc_id,
                   '<html><head><title>Doc ' || doc_id::VARCHAR
                   || '</title>' ||
                   CASE WHEN doc_id % 4 = 0 THEN
                            '<meta name="robots" content="noindex, nofollow">'
                        WHEN doc_id % 4 = 1 THEN
                            '<meta name="robots" content="index, follow">'
                        ELSE '' END ||
                   CASE WHEN doc_id % 3 = 0 THEN
                            '<link rel="canonical" href="https://canon.example/p/'
                            || (doc_id // 9)::VARCHAR || '">'
                        ELSE '' END ||
                   '</head><body>' || text || '</body></html>' AS html,
                   'https://crawl.example/p/' || doc_id::VARCHAR AS url
            FROM documents),
        m AS (
            SELECT doc_id, url,
                   regexp_extract(html,
                       '(?is)<title[^>]*>(.*?)</title>', 1) AS html_title,
                   regexp_extract(html,
                       '(?is)<meta[^>]*name\s*=\s*"robots"[^>]*content\s*=\s*"([^"]*)"',
                       1) AS meta_robots,
                   regexp_extract(html,
                       '(?is)<link[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)"',
                       1) AS canon
            FROM pages),
        mm AS (
            SELECT *, contains(lower(meta_robots), 'noindex') AS noindex,
                   CASE WHEN canon != '' THEN canon ELSE url END
                       AS canonical_target
            FROM m),
        pt AS (SELECT canonical_target, count(*) AS n FROM mm
               WHERE NOT noindex GROUP BY canonical_target)
        SELECT CAST((SELECT count(*) FROM mm) AS BIGINT) AS n_docs,
               CAST((SELECT count(*) FILTER (WHERE noindex) FROM mm)
                    AS BIGINT) AS n_noindex,
               (SELECT md5(string_agg(html_title, chr(31)
                                      ORDER BY html_title)) FROM mm)
                   AS titles_md5,
               CAST((SELECT count(*) FROM pt) AS BIGINT) AS n_targets,
               CAST((SELECT max(n) FROM pt) AS BIGINT) AS max_consolidation
    """,
    # crawl delta: the mutation arithmetic + full-outer content-hash
    # join re-derived; urls_md5 witnesses every url's classification
    'q_crawl_delta': r"""
        WITH old AS (
            SELECT 'https://crawl.example/p/' || doc_id::VARCHAR AS url,
                   text FROM documents),
        newt AS (
            SELECT 'https://crawl.example/p/' || doc_id::VARCHAR AS url,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' [updated]'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 != 3
            UNION ALL
            SELECT 'https://crawl.example/p/' || doc_id::VARCHAR
                       || '?page=2',
                   'continuation of ' || doc_id::VARCHAR
            FROM documents WHERE doc_id % 11 = 0),
        o AS (SELECT url, md5(text) AS h FROM old),
        n AS (SELECT url, md5(text) AS h FROM newt),
        d AS (SELECT coalesce(o.url, n.url) AS url,
                     CASE WHEN o.url IS NULL THEN 'added'
                          WHEN n.url IS NULL THEN 'removed'
                          WHEN o.h = n.h THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM o FULL OUTER JOIN n ON o.url = n.url)
        SELECT status, CAST(count(*) AS BIGINT) AS n,
               md5(string_agg(url, ',' ORDER BY url)) AS urls_md5
        FROM d GROUP BY status ORDER BY status
    """,
    'q_quality_scores': r"""
        WITH q AS (
            SELECT source,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS digit_ratio,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens
            FROM documents)
        SELECT source,
               round(avg(alpha_ratio), 6) AS avg_alpha,
               round(avg(digit_ratio), 6) AS avg_digit,
               CAST(sum(CASE WHEN alpha_ratio > 0.6 AND digit_ratio < 0.2
                             AND n_tokens >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ok
        FROM q GROUP BY source ORDER BY source
    """,
    # frozen linear quality model: integer 1e-4-logit weights make the
    # per-doc sums exact in any addition order (no fp tolerance); the
    # VALUES list mirrors quality_model.FROZEN_QUALITY_WEIGHTS verbatim
    'q_model_quality_gate': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, source,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id, any_value(source) AS source,
                      CAST(-4700 + sum(coalesce(wt, 0)) AS BIGINT) AS units
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN units > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pass,
               CAST(sum(units) AS BIGINT) AS sum_units
        FROM sc GROUP BY source ORDER BY source
    """,
    'q_token_counts': r"""
        SELECT lang,
               CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                   AS total_ws_tokens,
               CAST(sum(len(regexp_extract_all(text,
                   '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT)
                   AS total_bpe_tokens
        FROM documents GROUP BY lang ORDER BY lang
    """,
    # sequence packing: the two-phase distributed prefix sum must equal
    # the single cumulative-sum window (integer arithmetic — exact)
    'q_pack_sequences': r"""
        WITH t AS (SELECT doc_id,
                          len(string_split_regex(trim(text), '\s+'))
                              AS toks
                   FROM documents),
        c AS (SELECT doc_id, toks,
                     sum(toks) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - toks AS off
              FROM t)
        SELECT doc_id, CAST(off AS BIGINT) AS "offset",
               CASE WHEN toks > 0
                    THEN CAST(off // 512 AS BIGINT) END AS first_seq,
               CASE WHEN toks > 0
                    THEN CAST((off + toks - 1) // 512 AS BIGINT)
                    END AS last_seq,
               CAST(CASE WHEN toks > 0
                         THEN (off + toks - 1) // 512 - off // 512 + 1
                         ELSE 0 END AS BIGINT) AS n_seqs_spanned
        FROM c ORDER BY doc_id
    """,

    # encode+pack: per-word id sequences computed by
    # tests/reference_bpe.py (independent GPT-2-loop transcription)
    # under the public vocab rule (single char -> code point, merge ->
    # 0x110000 + rank); window chop re-derived from scratch. An
    # unmapped word NULLs its doc's stream (count<>count(idl)) and the
    # NULL poisons the offsets — loud failure on lexicon drift.
    'q_encode_pack': r"""
        WITH c(w, ids) AS (VALUES
            ('join', '106,111,1114114'),
            ('hash', '104,1114135,104'),
            ('row', '1114123,119'),
            ('batch', '1114146,104'),
            ('scan', '1114149'),
            ('column', '1114124,1114137,109,110'),
            ('customer', '99,117,1114120,111,1114142'),
            ('filter', '1114150,116,1114115'),
            ('small', '1114144,1114140'),
            ('slow', '115,108,1114134'),
            ('merge', '1114143,101'),
            ('order', '1114119,100,1114115'),
            ('vector', '118,101,99,116,1114119'),
            ('line', '108,1114138'),
            ('table', '116,97,1114139'),
            ('data', '100,1114118,97'),
            ('agg', '97,1114133'),
            ('value', '118,1114141,1114132'),
            ('key', '1114131'),
            ('stream', '1114120,114,101,97,109'),
            ('window', '119,1114114,100,1114134'),
            ('a', '97'),
            ('spark', '115,1114147,107'),
            ('part', '1114147,116'),
            ('group', '103,1114123,1114136'),
            ('big', '98,105,103'),
            ('sort', '115,1114119,116'),
            ('query', '1114125,1114115,121'),
            ('fast', '102,97,1114120'),
            ('the', '1114113'),
            ('dup', '100,1114136')),
        t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents),
        tok AS (SELECT doc_id, i AS wpos, ws[i + 1] AS w
                FROM t, LATERAL (SELECT unnest(range(0, len(ws)))
                                 AS i)),
        m AS (SELECT tok.doc_id, tok.wpos, string_split(c.ids, ',')
                         AS idl
              FROM tok LEFT JOIN c ON tok.w = c.w),
        docx AS (SELECT doc_id,
                        CASE WHEN count(*) <> count(idl) THEN NULL
                             ELSE list_append(
                                 flatten(list(idl ORDER BY wpos)),
                                 '1114111')
                        END AS idl
                 FROM m GROUP BY doc_id),
        off AS (SELECT doc_id, idl,
                       COALESCE(CAST(sum(len(idl)) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS BIGINT), 0) AS o
                FROM docx),
        tk AS (SELECT doc_id, o + i AS p, idl[i + 1] AS id
               FROM off, LATERAL (SELECT unnest(range(0, len(idl)))
                                  AS i))
        SELECT CAST(p // 512 AS BIGINT) AS seq,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_ids,
               md5(string_agg(id, ',' ORDER BY p)) AS ids_md5
        FROM tk GROUP BY seq ORDER BY seq
    """,

    # SemDeDup: the construction arithmetic IS the oracle — the planted
    # duplicate slice is removed (min-id survivors), nothing else is
    # (max natural cosine ~0.51 << 0.995, pinned by q_emb_cosine_dups)
    'q_semantic_dedup': """
        SELECT CAST(count(*)
                    + sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_vecs,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(sum(vec_id) AS BIGINT) AS survivor_id_sum
        FROM embeddings
    """,

    # exact BPE: per-word counts computed by tests/reference_bpe.py
    # (independent transcription of the public GPT-2 merge loop) over
    # the fixture lexicon; an unmapped word makes count(*)<>count(n)
    # and NULLs the total — loud failure on lexicon drift
    'q_token_counts_bpe': r"""
        WITH c(w, n) AS (VALUES
            ('join', 3), ('hash', 3), ('row', 2), ('batch', 2),
            ('scan', 1), ('column', 4), ('customer', 5), ('filter', 3),
            ('small', 2), ('slow', 3), ('merge', 2), ('order', 3),
            ('vector', 5), ('line', 2), ('table', 3), ('data', 3),
            ('agg', 2), ('value', 3), ('key', 1), ('stream', 5),
            ('window', 4), ('a', 1), ('spark', 3), ('part', 2),
            ('group', 3), ('big', 3), ('sort', 3), ('query', 3),
            ('fast', 3), ('the', 1), ('dup', 2)),
        tok AS (SELECT lang,
                       unnest(string_split_regex(trim(text), '\s+')) AS t
                FROM documents),
        j AS (SELECT lang, t, c.n FROM tok LEFT JOIN c ON t = c.w)
        SELECT lang, CAST(count(*) AS BIGINT) AS total_ws_tokens,
               CAST(CASE WHEN count(*) <> count(n) THEN NULL
                         ELSE sum(n) END AS BIGINT) AS total_bpe_exact
        FROM j GROUP BY lang ORDER BY lang
    """,
    'q_fingerprint': r"""
        SELECT lang,
               CAST(count(DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g')))
                    AS BIGINT) AS n_fp
        FROM documents GROUP BY lang ORDER BY lang
    """,
    'q_emb_cosine_topk': """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        sims AS (
            SELECT vec_id,
                   round(list_dot_product(embedding::DOUBLE[], q.qv)
                         / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
            FROM embeddings, q)
        SELECT vec_id, cos_sim FROM sims
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    'q_rollup_orders': """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
    'q_cube_events': """
        WITH e AS (SELECT event_type, CAST(hour(ts) // 6 AS INT) AS hour_bucket,
                          value
                   FROM events)
        SELECT coalesce(event_type, 'ALL') AS etype,
               coalesce(CAST(hour_bucket AS VARCHAR), 'ALL') AS hbucket,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM e
        GROUP BY CUBE (event_type, hour_bucket)
        ORDER BY etype, hbucket
    """,
    'q_w2_search_snippets': """
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        scored AS (
            SELECT doc_id, t,
                   CAST((length(t) - length(replace(t, 'data', ''))) / 4
                        + (length(t) - length(replace(t, 'model', ''))) / 5
                        + CASE WHEN position('data model' IN t) > 0
                               THEN 20 ELSE 0 END AS BIGINT) AS score
            FROM d),
        hits AS (SELECT * FROM scored WHERE score > 0
                 ORDER BY score DESC, doc_id ASC LIMIT 10),
        wins AS (
            SELECT h.doc_id, h.t, h.score, w.i,
                   CAST((length(substr(h.t, CAST(w.i AS INT) + 1, 200))
                         - length(replace(substr(h.t, CAST(w.i AS INT) + 1, 200), 'data', ''))) / 4
                        + (length(substr(h.t, CAST(w.i AS INT) + 1, 200))
                           - length(replace(substr(h.t, CAST(w.i AS INT) + 1, 200), 'model', ''))) / 5
                        AS BIGINT) AS wcount
            FROM hits h,
                 LATERAL (SELECT unnest(list_append(
                     range(0, greatest(length(h.t) - 200, 0), 50), 0)) AS i) w),
        best AS (
            SELECT doc_id, t, score, i AS best_pos, wcount,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY wcount DESC, i ASC) AS rn
            FROM wins),
        pick AS (
            SELECT doc_id, score, t,
                   CASE WHEN wcount = 0 THEN 0 ELSE best_pos END AS pos
            FROM best WHERE rn = 1),
        cleaned AS (
            SELECT doc_id, score, t, pos,
                   trim(regexp_replace(
                       replace(substr(t, CAST(pos AS INT) + 1, 200), chr(10), ' '),
                       '\\s+', ' ', 'g')) AS body
            FROM pick)
        SELECT doc_id, score,
               (CASE WHEN pos > 0 THEN '...' ELSE '' END) || body
               || (CASE WHEN pos + 200 < length(t) THEN '...' ELSE '' END)
                   AS snippet
        FROM cleaned ORDER BY score DESC, doc_id ASC
    """,
    'q_skew_salted_counts': """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    'q_f1_size_reject': """
        SELECT octet_length(encode(text)) <= 1500 AS accepted,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY accepted ORDER BY accepted
    """,
    'q_f4_category_overlap': """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents
        WHERE list_has_any([lang, source], ['de', 'src1'])
        GROUP BY lang, source ORDER BY lang, source
    """,
    'q_f5_structured_semi_join': """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents
        WHERE ('Lang: ' || lang) IN ('Lang: en', 'Lang: de')
           OR ('Source: ' || source) = 'Source: src1'
        GROUP BY lang, source ORDER BY lang, source
    """,
    'q_j4_status_projection': """
        WITH s AS (
            SELECT CASE WHEN doc_id % 11 = 0 THEN 'error'
                        WHEN doc_id % 3 = 0 THEN 'processing'
                        ELSE 'processed' END AS status
            FROM documents)
        SELECT status, CAST(count(*) AS BIGINT) AS n
        FROM s GROUP BY status ORDER BY status
    """,
    'q_d3_destructive_dedup': """
        WITH ranked AS (
            SELECT lang, row_number() OVER (PARTITION BY md5(text)
                                            ORDER BY doc_id) AS rn
            FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_removed
        FROM ranked WHERE rn > 1 GROUP BY lang ORDER BY lang
    """,
    'q_a6_topic_type': (
        "WITH toks_t AS (SELECT string_split(lower(text), ' ') AS toks "
        "FROM documents), scored AS (SELECT " + _TOPIC_SCORES_SQL
        + " FROM toks_t), pred AS (SELECT " + _TOPIC_CASE
        + " AS topic_type FROM scored) "
        "SELECT topic_type, CAST(count(*) AS BIGINT) AS n "
        "FROM pred GROUP BY topic_type ORDER BY topic_type"
    ),
    'q_error_taxonomy': """
        WITH m AS (
            SELECT CASE
                WHEN doc_id % 7 = 0 THEN 'Error: File too large'
                WHEN doc_id % 7 = 1 THEN 'Error: PDF extraction timed out after 120 seconds. The file may be too large or complex.'
                WHEN doc_id % 7 = 2 THEN 'Error extracting text: boom'
                WHEN doc_id % 7 = 3 THEN 'Error: No text could be extracted from the PDF'
                ELSE text END AS msg
            FROM documents)
        SELECT CASE
                 WHEN msg IS NULL THEN 'EMPTY'
                 WHEN NOT starts_with(msg, 'Error') THEN 'OK'
                 WHEN starts_with(msg, 'Error: File too large') THEN 'TOO_LARGE'
                 WHEN starts_with(msg, 'Error: PDF extraction timed out') THEN 'TIMEOUT'
                 WHEN starts_with(msg, 'Error: No text could be extracted') THEN 'NO_TEXT'
                 WHEN starts_with(msg, 'Error: empty payload') THEN 'EMPTY'
                 WHEN starts_with(msg, 'Error extracting text:') THEN 'EXTRACT_FAILED'
                 ELSE 'UNKNOWN_ERROR' END AS error_code,
               CAST(count(*) AS BIGINT) AS n
        FROM m GROUP BY error_code ORDER BY error_code
    """,
    'q_pii_redaction': r"""
        WITH staged AS (
            SELECT lang,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or https://ex.com/p/'
                        || CAST(doc_id AS VARCHAR)
                        || ' tel +1 (555) 000-'
                        || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS msg
            FROM documents),
        s1 AS (
            SELECT lang,
                   len(regexp_extract_all(msg, 'https?://[^\s]+')) AS n_urls,
                   regexp_replace(msg, 'https?://[^\s]+', '<URL>', 'g') AS m1
            FROM staged),
        s2 AS (
            SELECT lang, n_urls,
                   len(regexp_extract_all(m1,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_emails,
                   regexp_replace(m1,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS m2
            FROM s1),
        s3 AS (
            SELECT lang, n_urls, n_emails,
                   len(regexp_extract_all(m2, '\+?[0-9][0-9()\- ]{7,}[0-9]'))
                       AS n_phones,
                   regexp_replace(m2, '\+?[0-9][0-9()\- ]{7,}[0-9]',
                                  '<PHONE>', 'g') AS m3
            FROM s2)
        SELECT lang,
               CAST(sum(n_urls) AS BIGINT) AS total_urls,
               CAST(sum(n_emails) AS BIGINT) AS total_emails,
               CAST(sum(n_phones) AS BIGINT) AS total_phones,
               CAST(sum(length(m3)) AS BIGINT) AS total_redacted_chars
        FROM s3 GROUP BY lang ORDER BY lang
    """,
    'q_repetition_stats': r"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> len(x) > 0)) AS w
            FROM documents),
        c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w)
        SELECT doc_id,
               round(max(c) * 1.0 / sum(c), 6) AS top_word_frac,
               round(count(*) * 1.0 / sum(c), 6) AS distinct_word_ratio,
               CAST(sum(c) AS BIGINT) AS n_words
        FROM c GROUP BY doc_id ORDER BY doc_id
    """,
    'q_source_quality_gate': """
        WITH q AS (
            SELECT source,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio
            FROM documents),
        passing AS (
            SELECT source FROM q GROUP BY source
            HAVING avg(alpha_ratio) >= 0.8232)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n
        FROM documents d JOIN passing USING (source)
        GROUP BY d.source ORDER BY d.source
    """,
    'q_doc_chunking': r"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> len(x) > 0) AS toks
            FROM documents),
        st AS (
            SELECT doc_id, toks, unnest(range(0, len(toks), 56)) AS s
            FROM t WHERE len(toks) > 0),
        c AS (
            SELECT doc_id, (s // 56) AS chunk_idx,
                   array_to_string(toks[s+1 : s+64], ' ') AS chunk_text,
                   len(toks[s+1 : s+64]) AS n_tokens
            FROM st),
        lab AS (
            SELECT doc_id,
                   CAST(chunk_idx AS VARCHAR) || ':' || chunk_text AS lbl,
                   n_tokens
            FROM c)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(n_tokens) AS BIGINT) AS total_chunk_tokens,
               md5(string_agg(lbl, chr(31) ORDER BY lbl)) AS chunks_digest
        FROM lab GROUP BY doc_id ORDER BY doc_id
    """,
    'q_skew_salted_agg': """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value,
               round(max(value), 6) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    'q_emb_cosine_dups': """
        WITH u AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings
            WHERE vec_id % 5 = 0),
        p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                a.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]))), 6)
                       AS cos_sim
            FROM u a JOIN u b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos_sim FROM p
        WHERE cos_sim >= 0.95 ORDER BY id_a, id_b
    """,
    'q_ngram_jaccard_exact': r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE []::VARCHAR[] END AS shingles
            FROM toks
        ), shne AS (SELECT * FROM sh WHERE len(shingles) > 0),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM shne),
        rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 256),
        exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM exr a JOIN exr b USING (s) WHERE a.doc_id < b.doc_id),
        j AS (
            SELECT id_a, id_b,
                   len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
                   (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))) AS jac
            FROM cand JOIN shne sa ON sa.doc_id = id_a
                      JOIN shne sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
        WHERE jac >= 0.5 ORDER BY id_a, id_b
    """,
    'q_emb_centroid_per_label': """
        WITH ex AS (
            SELECT label, u.pos AS pos, u.v AS v
            FROM embeddings,
                 LATERAL (SELECT unnest(embedding)::DOUBLE AS v,
                                 generate_subscripts(embedding, 1) AS pos) u),
        cent AS (
            SELECT label, pos, avg(v) AS m FROM ex GROUP BY label, pos)
        SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
        FROM cent GROUP BY label ORDER BY label
    """,
    'q_search_pipeline': _search_pipeline_oracle_sql(),
    'q_gopher_dup_ngrams': _gopher_dup_ngrams_oracle_sql(),
    'q_pagerank_centrality': _pagerank_oracle_sql(),

    'q_substring_duplication': r"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(lower(text), '\s+') AS toks
                   FROM documents),
        w AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS win
              FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 8 + 2))
                               AS i)
              WHERE len(toks) >= 8),
        freq AS (SELECT win, count(*) AS c FROM w GROUP BY win),
        per AS (SELECT w.doc_id,
                       CAST(count(*) AS BIGINT) AS n_windows,
                       CAST(sum(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dup_windows
                FROM w JOIN freq f USING (win) GROUP BY w.doc_id),
        stats AS (SELECT d.doc_id, d.source,
                         COALESCE(p.n_windows, 0) AS n_windows,
                         COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
                         round(COALESCE(p.n_dup_windows, 0) * 1.0
                               / greatest(COALESCE(p.n_windows, 0), 1), 6)
                             AS dup_frac
                  FROM documents d LEFT JOIN per p USING (doc_id))
        SELECT source, CAST(sum(n_windows) AS BIGINT) AS windows,
               CAST(sum(n_dup_windows) AS BIGINT) AS dup_windows,
               round(avg(dup_frac), 6) AS avg_dup_frac
        FROM stats GROUP BY source ORDER BY source
    """,

    # keep-first substring removal: the survivor rule (globally first
    # occurrence per duplicated window value) replayed as a
    # row_number over (doc_id, start); rebuilt bytes checked
    'q_substring_keep_first': r"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, i AS pos, toks[i + 1] AS tok
                FROM t, LATERAL (SELECT unnest(range(0, len(toks)))
                                 AS i)),
        win AS (SELECT doc_id, i AS start,
                       array_to_string(toks[(i + 1):(i + 8)], ' ') AS w
                FROM t, LATERAL (SELECT unnest(range(0,
                                 greatest(len(toks) - 7, 0))) AS i)),
        dup AS (SELECT w FROM win GROUP BY w
                HAVING count(DISTINCT doc_id) >= 2),
        occ AS (SELECT win.doc_id, win.start,
                       row_number() OVER (PARTITION BY win.w
                                          ORDER BY win.doc_id,
                                                   win.start) AS rn
                FROM win JOIN dup USING (w)),
        cov AS (SELECT DISTINCT occ.doc_id, p AS pos
                FROM occ, LATERAL (SELECT unnest(range(occ.start,
                                   occ.start + 8)) AS p)
                WHERE occ.rn > 1),
        tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_total
                FROM t),
        reb AS (SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(tok, ' ' ORDER BY tok.pos)
                           AS cleaned_text
                FROM tok LEFT JOIN cov
                     ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
                WHERE cov.pos IS NULL
                GROUP BY tok.doc_id)
        SELECT tot.doc_id,
               COALESCE(reb.n_kept, 0) AS n_kept,
               CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(reb.cleaned_text, '') AS cleaned_text
        FROM tot LEFT JOIN reb USING (doc_id)
        ORDER BY tot.doc_id
    """,

    # the full Gopher repetition family: the 4-token-line / 2-line-
    # paragraph layout is constructed identically on both sides, then
    # all seven signals (dup line/para fractions + char fractions,
    # top-2/3/4-gram char fractions with the count-then-weight tie
    # rule) are re-derived from scratch
    'q_gopher_repetition': r"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        lin AS (SELECT doc_id, i AS pos,
                       array_to_string(toks[(i*4+1):(i*4+4)], ' ')
                           AS line
                FROM t, LATERAL (SELECT unnest(range(0,
                         CAST(ceil(len(toks)/4.0) AS INT))) AS i)),
        par AS (SELECT doc_id, pos // 2 AS j,
                       string_agg(line, chr(10) ORDER BY pos) AS para
                FROM lin GROUP BY doc_id, pos // 2),
        wa AS (SELECT doc_id,
                      list_filter(list_transform(toks, x -> lower(x)),
                                  x -> len(x) > 0) AS ws
               FROM t),
        chars AS (SELECT doc_id,
                         COALESCE(list_sum(list_transform(ws,
                                  x -> len(x))), 0) AS total_chars
                  FROM wa),
        lc AS (SELECT doc_id, line, count(*) AS c, len(line) AS w
               FROM lin WHERE len(line) > 0 GROUP BY doc_id, line),
        lstat AS (SELECT doc_id,
                         round((sum(c) - count(*)) / sum(c), 6)
                             AS dup_line_frac,
                         round(sum(CASE WHEN c >= 2 THEN (c-1)*w
                                        ELSE 0 END)
                               / greatest(sum(c*w), 1), 6)
                             AS dup_line_char_frac
                  FROM lc GROUP BY doc_id),
        pc AS (SELECT doc_id, para, count(*) AS c, len(para) AS w
               FROM par WHERE len(para) > 0 GROUP BY doc_id, para),
        pstat AS (SELECT doc_id,
                         round((sum(c) - count(*)) / sum(c), 6)
                             AS dup_para_frac,
                         round(sum(CASE WHEN c >= 2 THEN (c-1)*w
                                        ELSE 0 END)
                               / greatest(sum(c*w), 1), 6)
                             AS dup_para_char_frac
                  FROM pc GROUP BY doc_id),
        g AS (SELECT doc_id, 2 AS k,
                     array_to_string(ws[(i+1):(i+2)], ' ') AS gram
              FROM wa, LATERAL (SELECT unnest(range(0,
                       greatest(len(ws) - 1, 0))) AS i)
              UNION ALL
              SELECT doc_id, 3 AS k,
                     array_to_string(ws[(i+1):(i+3)], ' ') AS gram
              FROM wa, LATERAL (SELECT unnest(range(0,
                       greatest(len(ws) - 2, 0))) AS i)
              UNION ALL
              SELECT doc_id, 4 AS k,
                     array_to_string(ws[(i+1):(i+4)], ' ') AS gram
              FROM wa, LATERAL (SELECT unnest(range(0,
                       greatest(len(ws) - 3, 0))) AS i)),
        gc AS (SELECT doc_id, k, gram, count(*) AS c,
                      len(gram) - (k-1) AS w
               FROM g GROUP BY doc_id, k, gram),
        gt AS (SELECT doc_id, k, c*w AS num,
                      row_number() OVER (PARTITION BY doc_id, k
                                         ORDER BY c DESC, w DESC) AS rn
               FROM gc),
        gp AS (SELECT doc_id,
                      max(CASE WHEN k = 2 THEN num END) AS t2,
                      max(CASE WHEN k = 3 THEN num END) AS t3,
                      max(CASE WHEN k = 4 THEN num END) AS t4
               FROM gt WHERE rn = 1 GROUP BY doc_id)
        SELECT c0.doc_id,
               COALESCE(l.dup_line_frac, 0.0) AS dup_line_frac,
               COALESCE(l.dup_line_char_frac, 0.0)
                   AS dup_line_char_frac,
               COALESCE(p.dup_para_frac, 0.0) AS dup_para_frac,
               COALESCE(p.dup_para_char_frac, 0.0)
                   AS dup_para_char_frac,
               round(COALESCE(g.t2, 0) / greatest(c0.total_chars, 1), 6)
                   AS top_2gram_char_frac,
               round(COALESCE(g.t3, 0) / greatest(c0.total_chars, 1), 6)
                   AS top_3gram_char_frac,
               round(COALESCE(g.t4, 0) / greatest(c0.total_chars, 1), 6)
                   AS top_4gram_char_frac
        FROM chars c0
        LEFT JOIN lstat l USING (doc_id)
        LEFT JOIN pstat p USING (doc_id)
        LEFT JOIN gp g USING (doc_id)
        ORDER BY c0.doc_id
    """,

    # BPE learning: golden merge sequences measured per corpus (the
    # q_lda_categories golden-histogram pattern) — goldens computed
    # from DuckDB word counts + kernels/bpe.learn_merges, keyed by
    # corpus stats so unknown datasets fail loudly
    'q_learn_bpe': r"""
        WITH stat AS (SELECT count(*) AS n,
                             CAST(sum(length(text)) AS BIGINT) AS tl
                      FROM documents),
        golden(n, tl, merge_rank, lhs, rhs) AS (VALUES
            (500, 153156, 0, 'e', 'r'), (500, 153156, 1, 'o', 'r'),
            (500, 153156, 2, 'i', 'n'), (500, 153156, 3, 'o', 'w'),
            (500, 153156, 4, 's', 't'), (500, 153156, 5, 'l', 'u'),
            (500, 153156, 6, 'a', 'r'), (500, 153156, 7, 'p', 'ar'),
            (500, 153156, 8, 'm', 'er'), (500, 153156, 9, 'a', 't'),
            (500, 149174, 0, 'e', 'r'), (500, 149174, 1, 'i', 'n'),
            (500, 149174, 2, 'o', 'w'), (500, 149174, 3, 'o', 'r'),
            (500, 149174, 4, 's', 't'), (500, 149174, 5, 'm', 'er'),
            (500, 149174, 6, 'a', 't'), (500, 149174, 7, 'l', 'u'),
            (500, 149174, 8, 'a', 'r'), (500, 149174, 9, 'p', 'ar'),
            (5000, 1485576, 0, 'e', 'r'), (5000, 1485576, 1, 'i', 'n'),
            (5000, 1485576, 2, 'o', 'r'), (5000, 1485576, 3, 's', 't'),
            (5000, 1485576, 4, 'o', 'w'), (5000, 1485576, 5, 't', 'a'),
            (5000, 1485576, 6, 'l', 'u'), (5000, 1485576, 7, 'm', 'er'),
            (5000, 1485576, 8, 'a', 'r'), (5000, 1485576, 9, 'p', 'ar'))
        SELECT CAST(g.merge_rank AS INT) AS merge_rank, g.lhs, g.rhs
        FROM golden g JOIN stat s ON g.n = s.n AND g.tl = s.tl
        ORDER BY merge_rank
    """,

    # paragraph fuzzy dedup, planted construction: the result is
    # provably EXACTLY the planted all-pairs set (see the query's
    # docstring), re-derived here by arithmetic over documents' ids
    # MinHash / SimHash planted oracles (round 7): the construction
    # makes the LSH output provably the planted all-pairs set, so the
    # oracle is pure arithmetic over documents' ids
    'q_minhash_planted': r"""
        WITH m AS (SELECT doc_id, doc_id // 50 AS g FROM documents
                   WHERE doc_id % 50 < 3),
        p AS (SELECT a.g, a.doc_id AS da, b.doc_id AS db
              FROM m a JOIN m b ON a.g = b.g AND a.doc_id < b.doc_id)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(da) AS BIGINT) AS id_sum_a,
               CAST(sum(db) AS BIGINT) AS id_sum_b,
               round(1.0, 6) AS min_j,
               round(1.0, 6) AS max_j
        FROM p GROUP BY g ORDER BY g
    """,

    'q_simhash_planted': r"""
        WITH m AS (SELECT doc_id, doc_id // 50 AS g FROM documents
                   WHERE doc_id % 50 < 3),
        p AS (SELECT a.g, a.doc_id AS da, b.doc_id AS db
              FROM m a JOIN m b ON a.g = b.g AND a.doc_id < b.doc_id)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(da) AS BIGINT) AS id_sum_a,
               CAST(sum(db) AS BIGINT) AS id_sum_b,
               CAST(0 AS BIGINT) AS max_h
        FROM p GROUP BY g ORDER BY g
    """,

    # WARC framing (round 7): DuckDB rebuilds build_warc's exact
    # record template per doc (the record-id contributes only its
    # fixed 32-char width, so a '0'×32 filler stands in), re-derives
    # offset/length from the running sum (raw-record lengths tile the
    # file), and recomputes each payload's md5 from the construction.
    'q_warc_framing': r"""
        WITH d AS (
          SELECT doc_id,
                 'http://w.example/' || doc_id AS url,
                 'p' || doc_id || ':'
                   || repeat('x', (doc_id * 37) % 256 + 1) AS payload
          FROM documents WHERE doc_id < 200),
        r AS (
          SELECT doc_id, url, payload,
                 'HTTP/1.1 200 OK' || E'\r\n' || 'Content-Type: text/html'
                   || E'\r\n\r\n' || payload AS http
          FROM d),
        h AS (
          SELECT doc_id, payload, http,
                 'WARC/1.0' || E'\r\n' || 'WARC-Type: response' || E'\r\n'
                   || 'WARC-Target-URI: ' || url || E'\r\n'
                   || 'WARC-Date: 2025-01-01T00:00:00Z' || E'\r\n'
                   || 'WARC-Record-ID: <urn:uuid:' || repeat('0', 32)
                   || '>' || E'\r\n'
                   || 'Content-Type: application/http; msgtype=response'
                   || E'\r\n'
                   || 'Content-Length: ' || CAST(length(http) AS VARCHAR)
                   || E'\r\n\r\n' AS head
          FROM r)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(COALESCE(SUM(length(head) + length(http) + 4)
                     OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS offset,
               CAST(length(head) + length(http) + 4 AS BIGINT) AS length,
               CAST(length(payload) AS BIGINT) AS payload_len,
               md5(payload) AS payload_md5
        FROM h ORDER BY doc_id
    """,

    'q_para_neardup_planted': r"""
        WITH m AS (SELECT doc_id, doc_id // 50 AS g FROM documents
                   WHERE doc_id % 50 < 3),
        p AS (SELECT a.g, a.doc_id AS da, b.doc_id AS db
              FROM m a JOIN m b ON a.g = b.g AND a.doc_id < b.doc_id)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(da) AS BIGINT) AS id_sum_a,
               CAST(sum(db) AS BIGINT) AS id_sum_b,
               CAST(0 AS BIGINT) AS para_sum,
               round(1.0, 6) AS min_j,
               round(1.0, 6) AS max_j,
               CAST(count(*) AS BIGINT) AS n_cross
        FROM p GROUP BY g ORDER BY g
    """,

    # substring-span removal: windows, coverage, and the order-
    # preserving token rebuild all re-derived over window STRINGS;
    # cleaned_text checked byte-for-byte (q_line_dedup's contract at
    # token granularity)
    'q_substring_removal': r"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, i AS pos, toks[i + 1] AS tok
                FROM t, LATERAL (SELECT unnest(range(0, len(toks)))
                                 AS i)),
        win AS (SELECT doc_id, i AS start,
                       array_to_string(toks[(i + 1):(i + 8)], ' ') AS w
                FROM t, LATERAL (SELECT unnest(range(0,
                                 greatest(len(toks) - 7, 0))) AS i)),
        dup AS (SELECT w FROM win GROUP BY w
                HAVING count(DISTINCT doc_id) >= 2),
        cov AS (SELECT DISTINCT win.doc_id, p AS pos
                FROM win JOIN dup USING (w),
                     LATERAL (SELECT unnest(range(win.start,
                                      win.start + 8)) AS p)),
        tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_total
                FROM t),
        reb AS (SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(tok, ' ' ORDER BY tok.pos)
                           AS cleaned_text
                FROM tok LEFT JOIN cov
                     ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
                WHERE cov.pos IS NULL
                GROUP BY tok.doc_id)
        SELECT tot.doc_id,
               COALESCE(reb.n_kept, 0) AS n_kept,
               CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(reb.cleaned_text, '') AS cleaned_text
        FROM tot LEFT JOIN reb USING (doc_id)
        ORDER BY tot.doc_id
    """,

    'q_group_quota': """
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id ASC)
                       AS rn
            FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum
        FROM ranked WHERE rn <= 30
        GROUP BY source ORDER BY source
    """,

    # hash_split: thresholds are exact-integer-arithmetic hex literals
    # (4/5 and 9/10 of 16^32); md5 hex compare is engine-portable
    'q_hash_split': """
        WITH s AS (
            SELECT doc_id,
                   CASE WHEN md5('doc-' || doc_id)
                             < 'cccccccccccccccccccccccccccccccc'
                        THEN 'train'
                        WHEN md5('doc-' || doc_id)
                             < 'e6666666666666666666666666666666'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents)
        SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM s GROUP BY split ORDER BY split
    """,

    # curation composition (round 5): every stage's already-proven
    # oracle chained into ONE CTE pipeline over the same 4-token-line
    # layout as q_line_dedup — quality gate (q_quality_scores exprs) →
    # min-id exact dedup on raw text → line dedup at the data-dependent
    # threshold max(3, floor(0.002*|gated|)) (scalar subquery) →
    # empty-doc drop → min-id exact dedup on cleaned text → k=8 window
    # duplication on cleaned text (q_substring_duplication exprs) →
    # per-source quota (dup_frac asc, doc_id asc, cap 30) → md5 hash
    # split on the doc id. The hex thresholds are 4/5 and 9/10 of
    # 16^32 in exact integer arithmetic (hash_split's contract).
    'q_curation_pipeline': r"""
        WITH t0 AS (SELECT doc_id, lang, source, n_chars,
                           string_split(text, ' ') AS toks
                    FROM documents),
        lin0 AS (
            SELECT doc_id, i,
                   array_to_string(toks[(i*4+1):(i*4+4)], ' ') AS line
            FROM t0, LATERAL (SELECT unnest(range(0,
                     CAST(ceil(len(toks)/4.0) AS INT))) AS i)
        ),
        docs AS (
            SELECT t0.doc_id, t0.lang, t0.source, t0.n_chars, r.text
            FROM t0 JOIN (
                SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
                FROM lin0 GROUP BY doc_id) r USING (doc_id)
        ),
        q AS (
            SELECT *,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS digit_ratio,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens
            FROM docs),
        gated AS (
            SELECT doc_id, lang, source, n_chars, text FROM q
            WHERE alpha_ratio > 0.6 AND digit_ratio < 0.2 AND n_tokens >= 5),
        d1 AS (
            SELECT g.* FROM gated g
            JOIN (SELECT min(doc_id) AS keep
                  FROM gated GROUP BY md5(text)) kk
              ON g.doc_id = kk.keep),
        mdf AS (SELECT greatest(3, CAST(floor(0.002 * count(*)) AS INT)) AS v
                FROM d1),
        lin AS (
            SELECT doc_id, i AS pos, ls[i+1] AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d1) s,
                 LATERAL (SELECT unnest(range(0, len(ls))) AS i)
        ),
        hot AS (SELECT line FROM lin GROUP BY line
                HAVING count(DISTINCT doc_id) >= (SELECT v FROM mdf)),
        tot AS (SELECT doc_id, count(*) AS n_total FROM lin GROUP BY doc_id),
        reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
                FROM lin WHERE line NOT IN (SELECT line FROM hot)
                GROUP BY doc_id),
        ld AS (SELECT tot.doc_id,
                      COALESCE(reb.n_kept, 0) AS n_kept,
                      CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT)
                          AS n_removed,
                      COALESCE(reb.cleaned_text, '') AS cleaned_text
               FROM tot LEFT JOIN reb USING (doc_id)),
        j1 AS (SELECT d1.*, ld.n_kept, ld.n_removed, ld.cleaned_text
               FROM d1 JOIN ld USING (doc_id)
               WHERE length(ld.cleaned_text) > 0),
        d2 AS (
            SELECT j.* FROM j1 j
            JOIN (SELECT min(doc_id) AS keep
                  FROM j1 GROUP BY md5(cleaned_text)) kk
              ON j.doc_id = kk.keep),
        st AS (SELECT doc_id,
                      string_split_regex(lower(cleaned_text), '\s+') AS ctoks
               FROM d2),
        w AS (SELECT doc_id, array_to_string(ctoks[i:i+7], ' ') AS win
              FROM st, LATERAL (SELECT unnest(range(1, len(ctoks) - 8 + 2))
                                AS i)
              WHERE len(ctoks) >= 8),
        freq AS (SELECT win, count(*) AS c FROM w GROUP BY win),
        per AS (SELECT w.doc_id,
                       CAST(count(*) AS BIGINT) AS n_windows,
                       CAST(sum(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dup
                FROM w JOIN freq f USING (win) GROUP BY w.doc_id),
        wd AS (SELECT d2.*,
                      round(COALESCE(p.n_dup, 0) * 1.0
                            / greatest(COALESCE(p.n_windows, 0), 1), 6)
                          AS dup_frac
               FROM d2 LEFT JOIN per p USING (doc_id)),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY source
                       ORDER BY dup_frac ASC, doc_id ASC) AS rn
                   FROM wd),
        sp AS (
            SELECT *,
                   CASE WHEN md5(CAST(doc_id AS VARCHAR))
                             < 'cccccccccccccccccccccccccccccccc'
                        THEN 'train'
                        WHEN md5(CAST(doc_id AS VARCHAR))
                             < 'e6666666666666666666666666666666'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM ranked WHERE rn <= 30)
        SELECT split, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(sum(n_kept) AS BIGINT) AS lines_kept,
               CAST(sum(n_removed) AS BIGINT) AS lines_removed,
               round(avg(dup_frac), 6) AS avg_dup_frac
        FROM sp GROUP BY split, source ORDER BY split, source
    """,

    # line_dedup: the 4-token-line layout is constructed identically on
    # both sides, then the full dedup (exact distinct-doc frequency,
    # >=2 removed, ordered rebuild) is value-checked including the
    # within-doc line dedup: the EXPLODED window formulation (keep
    # first occurrence per (doc, line), empties always kept) — parity
    # vs the engine's zero-shuffle in-row HOF form proves the two
    # formulations equivalent
    'q_line_dedup_within': """
        WITH page AS (
            SELECT doc_id,
                   text || chr(10) || 'HOME | ABOUT | CONTACT' ||
                   chr(10) || text || chr(10) ||
                   'HOME | ABOUT | CONTACT' || chr(10) || '' ||
                   chr(10) || 'HOME | ABOUT | CONTACT' AS text
            FROM documents),
        ex AS (
            SELECT doc_id, u.line, u.pos
            FROM page, LATERAL (
                SELECT unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1)
                           AS pos) u),
        keep AS (
            SELECT doc_id, line, pos,
                   CASE WHEN line = '' THEN TRUE
                        ELSE pos = min(pos) OVER (PARTITION BY doc_id,
                                                  line) END AS k,
                   count(*) OVER (PARTITION BY doc_id) AS n_total
            FROM ex)
        SELECT doc_id,
               CAST(count(*) FILTER (WHERE k) AS BIGINT) AS n_kept,
               CAST(any_value(n_total)
                    - count(*) FILTER (WHERE k) AS BIGINT) AS n_removed,
               string_agg(line, chr(10) ORDER BY pos)
                   FILTER (WHERE k) AS cleaned_text
        FROM keep GROUP BY doc_id ORDER BY doc_id
    """,
    # rebuilt text bytes.
    'q_line_dedup': """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        lin AS (
            SELECT doc_id, i AS pos,
                   array_to_string(toks[(i*4+1):(i*4+4)], ' ') AS line
            FROM t, LATERAL (SELECT unnest(range(0,
                     CAST(ceil(len(toks)/4.0) AS INT))) AS i)
        ),
        hot AS (SELECT line FROM lin GROUP BY line
                HAVING count(DISTINCT doc_id) >= 2),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total
                FROM lin GROUP BY doc_id),
        reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
                FROM lin WHERE line NOT IN (SELECT line FROM hot)
                GROUP BY doc_id)
        SELECT tot.doc_id,
               COALESCE(reb.n_kept, 0) AS n_kept,
               CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(reb.cleaned_text, '') AS cleaned_text
        FROM tot LEFT JOIN reb USING (doc_id)
        ORDER BY doc_id
    """,

    # Golden-histogram oracle: the (arity → n_docs) values below were
    # measured from the seeded LDA run (seed=42, maxIter=10, pinned
    # vocab) and verified parallelism-invariant (see q_lda_categories
    # docstring). Keyed by (count, total text length) so each test
    # dataset selects exactly its own golden rows; an unknown dataset
    # matches nothing and fails the row-count check loudly.
    'q_lda_categories': """
        WITH stat AS (
            SELECT count(*) AS n,
                   CAST(sum(length(text)) AS BIGINT) AS tl
            FROM documents
        ),
        golden(n, tl, arity, n_docs) AS (VALUES
            (500,  153156,  1, 195), (500,  153156,  2, 266),
            (500,  153156,  3, 39),
            (500,  149174,  1, 279), (500,  149174,  2, 214),
            (500,  149174,  3, 7),
            (5000, 1485576, 1, 2176), (5000, 1485576, 2, 2472),
            (5000, 1485576, 3, 352))
        SELECT CAST(g.arity AS INTEGER) AS arity,
               CAST(g.n_docs AS BIGINT) AS n_docs
        FROM golden g JOIN stat s ON g.n = s.n AND g.tl = s.tl
        ORDER BY arity
    """,
    'q_tfidf_top_terms': r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> len(x) >= 3)) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df_count
                  FROM toks GROUP BY term),
        nd AS (SELECT count(*) AS n FROM documents),
        j AS (SELECT t.term, d.df_count,
                     t.tf * ln((nd.n + 1.0) / (d.df_count + 1.0)) AS tfidf
              FROM tf t JOIN dfreq d USING (term), nd)
        SELECT term, CAST(max(df_count) AS BIGINT) AS df_count,
               round(sum(tfidf), 3) AS tfidf_sum
        FROM j GROUP BY term
        ORDER BY tfidf_sum DESC, term ASC LIMIT 20
    """,
    'q_asof_join': """
        WITH cp AS (
            SELECT user_id, ts AS cp_ts, max(value) AS cp_value
            FROM events WHERE event_id % 7 = 0 GROUP BY user_id, ts),
        j AS (
            SELECT e.event_type, cp.cp_value
            FROM events e
            ASOF LEFT JOIN cp
              ON e.user_id = cp.user_id AND e.ts >= cp.cp_ts)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN cp_value IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_matched,
               round(coalesce(sum(cp_value), 0), 4) AS total_cp_value
        FROM j GROUP BY event_type ORDER BY event_type
    """,
    # derives the EXPECTED canonical form independently from the same
    # doc_id arithmetic the Spark side uses to SYNTHESIZE the messy
    # variants — a value oracle over outputs, not a regex re-run
    'q_url_canonicalization': """
        WITH u AS (
            SELECT doc_id,
                   's' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
                   CASE doc_id % 3 WHEN 0 THEN 'example.com'
                                   WHEN 1 THEN 'sample.org'
                                   ELSE 'test.net' END AS host,
                   CASE doc_id % 3 WHEN 0 THEN 'example.com'
                                   WHEN 1 THEN 'sample.org'
                                   ELSE 'test.net' END AS domain,
                   '/p/' || CAST(doc_id % 10 AS VARCHAR) AS path,
                   doc_id % 5 AS v
            FROM documents),
        c AS (SELECT domain, host,
                     'https://' || host || path ||
                     CASE WHEN v = 4 THEN '?a=1' ELSE '' END AS canonical
              FROM u)
        SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        FROM c GROUP BY domain ORDER BY domain
    """,
    'q_stratified_sample': """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) <
              CASE WHEN lang = 'en' THEN '800'
                   WHEN lang = 'de' THEN '400'
                   ELSE '19a' END
        GROUP BY lang ORDER BY lang
    """,
    'q_event_percentiles': """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # independent SQL reconstruction of gap-based sessionization: the
    # streaming applyInPandasWithState operator's output must equal the
    # classic lag + cumulative-break-sum formulation, minus each user's
    # trailing session (which stays OPEN in state and is never emitted).
    # Ties at equal ts are harmless: gap 0 either way, and the reported
    # aggregates are order-invariant within a session.
    'q_sessionization': """
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts)
                             > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS brk
            FROM events),
        g AS (SELECT user_id,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
              FROM o),
        s AS (SELECT user_id, grp, count(*) AS n_events
              FROM g GROUP BY user_id, grp),
        closed AS (
            SELECT * FROM (
                SELECT s.*, row_number() OVER (PARTITION BY user_id
                                               ORDER BY grp DESC) AS rn
                FROM s) WHERE rn > 1)
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(n_events) AS BIGINT) AS total_events,
               CAST(max(n_events) AS BIGINT) AS max_session_events
        FROM closed
    """,
    # tf/N/V and the Lidstone-smoothed mean reproduced exactly
    'q_unigram_logprob': r"""
        WITH ex AS (
            SELECT doc_id, s.t AS term
            FROM documents,
                 LATERAL (SELECT unnest(string_split_regex(lower(text),
                                                           '\s+')) AS t) s
            WHERE s.t <> ''
        ), tf AS (
            SELECT term, count(*) AS tf FROM ex GROUP BY term
        ), tot AS (
            SELECT sum(tf) AS n, count(*) AS v FROM tf
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ln((tf.tf + 0.5)
                            / (tot.n + 0.5 * tot.v))), 6) AS logprob
        FROM ex JOIN tf USING (term), tot
        GROUP BY doc_id
        ORDER BY logprob ASC, doc_id ASC LIMIT 20
    """,
    # bigram/context counts, V, and the smoothed conditional mean
    # rebuilt exactly; docs with <2 tokens have no bigrams and are
    # absent on both sides
    'q_bigram_lm': r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS t
            FROM documents
        ), big AS (
            SELECT doc_id, t[s.i] AS u, t[s.i + 1] AS v
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) s
            WHERE len(t) >= 2
        ), bg AS (
            SELECT u, v, count(*) AS c_uv FROM big GROUP BY u, v
        ), ctx AS (
            SELECT u, CAST(sum(c_uv) AS BIGINT) AS c_u FROM bg GROUP BY u
        ), voc AS (
            SELECT count(DISTINCT x) AS v_sz
            FROM (SELECT unnest(t) AS x FROM toks)
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln((bg.c_uv + 0.5)
                            / (ctx.c_u + 0.5 * voc.v_sz))), 6)
                   AS bigram_logprob
        FROM big JOIN bg USING (u, v) JOIN ctx USING (u), voc
        GROUP BY doc_id
        ORDER BY bigram_logprob ASC, doc_id ASC LIMIT 20
    """,
    # tokenizer report: the reference-BPE word->count map (loud NULL
    # on lexicon drift) + exact-sum divisions
    'q_tokenizer_report': r"""
        WITH c(w, n) AS (VALUES
            ('join', 3), ('hash', 3), ('row', 2), ('batch', 2),
            ('scan', 1), ('column', 4), ('customer', 5), ('filter', 3),
            ('small', 2), ('slow', 3), ('merge', 2), ('order', 3),
            ('vector', 5), ('line', 2), ('table', 3), ('data', 3),
            ('agg', 2), ('value', 3), ('key', 1), ('stream', 5),
            ('window', 4), ('a', 1), ('spark', 3), ('part', 2),
            ('group', 3), ('big', 3), ('sort', 3), ('query', 3),
            ('fast', 3), ('the', 1), ('dup', 2)),
        tok AS (SELECT doc_id, lang, length(text) AS chars,
                       unnest(string_split_regex(trim(text), '\s+'))
                           AS t
                FROM documents),
        j AS (SELECT doc_id, lang, chars, t, c.n
              FROM tok LEFT JOIN c ON t = c.w),
        per AS (SELECT doc_id, any_value(lang) AS lang,
                       any_value(chars) AS chars,
                       CAST(count(*) AS BIGINT) AS words,
                       CAST(CASE WHEN count(*) <> count(n) THEN NULL
                            ELSE sum(n) END AS BIGINT) AS toks
                FROM j GROUP BY doc_id)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(words) AS BIGINT) AS ws_words,
               CAST(sum(toks) AS BIGINT) AS bpe_tokens,
               CAST(sum(chars) AS BIGINT) AS chars,
               round(sum(toks) / greatest(sum(words), 1), 6)
                   AS fertility,
               round(sum(chars) / greatest(sum(toks), 1), 6)
                   AS compression
        FROM per GROUP BY lang ORDER BY lang
    """,

    # cascade funnel: the first-fail CASE chain and funnel arithmetic
    # replayed over the rebuilt quality columns
    'q_quality_cascade': r"""
        WITH q AS (
            SELECT length(text) AS n_chars,
                   len(string_split_regex(trim(text), '\s+')) AS n_toks,
                   round(length(regexp_replace(text, '[^A-Za-z]', '',
                                               'g'))
                         * 1.0 / greatest(length(text), 1), 6)
                       AS alpha_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6)
                       AS digit_ratio
            FROM documents),
        tagged AS (
            SELECT CASE WHEN NOT coalesce(n_chars >= 100, FALSE)
                        THEN 'min_length'
                        WHEN NOT coalesce(n_toks >= 10, FALSE)
                        THEN 'min_tokens'
                        WHEN NOT coalesce(alpha_ratio > 0.6, FALSE)
                        THEN 'alpha'
                        WHEN NOT coalesce(digit_ratio < 0.2, FALSE)
                        THEN 'digit'
                        ELSE '__pass__' END AS stage
            FROM q),
        c AS (SELECT stage, count(*) AS n FROM tagged GROUP BY stage),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        f(stage_idx, stage) AS (VALUES
            (0, 'min_length'), (1, 'min_tokens'), (2, 'alpha'),
            (3, 'digit')),
        funnel AS (
            SELECT f.stage_idx, f.stage,
                   COALESCE(c.n, 0) AS n_fail,
                   tot.total
                   - COALESCE(CAST(sum(c.n) OVER (ORDER BY f.stage_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS n_in
            FROM f LEFT JOIN c USING (stage), tot)
        SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
               CAST(n_in AS BIGINT) AS n_in,
               CAST(n_fail AS BIGINT) AS n_fail,
               CAST(n_in - n_fail AS BIGINT) AS n_pass,
               CASE WHEN n_in > 0
                    THEN round((n_in - n_fail) * 1.0 / n_in, 6)
               END AS pass_rate
        FROM funnel ORDER BY stage_idx
    """,

    # NFC: both engines implement the Unicode standard algorithm —
    # byte-for-byte md5 agreement on decomposed input is the check
    'q_nfc_normalize': r"""
        SELECT doc_id,
               CAST(length(text || ' cafe' || chr(769)) AS BIGINT)
                   AS len_raw,
               CAST(length(nfc_normalize(text || ' cafe' || chr(769)))
                   AS BIGINT) AS len_nfc,
               md5(nfc_normalize(text || ' cafe' || chr(769)))
                   AS nfc_md5
        FROM documents ORDER BY doc_id
    """,

    # compaction content invariance: what comes back after the rewrite
    # + swap must BE the corpus, independent of file layout
    'q_compaction_content': r"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5,
               CAST(sum(length(text)) AS BIGINT) AS chars
        FROM documents
    """,

    # stupid backoff: all three count tables, N/V, and the exact CASE
    # chain rebuilt; λ·λ written 0.4*0.4 on both sides (0.4**2 differs
    # in the last bit)
    'q_stupid_backoff': r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS t
            FROM documents
        ), trid AS (
            SELECT doc_id, t[s.j] AS w1, t[s.j + 1] AS w2,
                   t[s.j + 2] AS w3
            FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1))
                                AS j) s
            WHERE len(t) >= 3
        ), tri AS (
            SELECT w1, w2, w3, count(*) AS c3 FROM trid
            GROUP BY w1, w2, w3
        ), bigd AS (
            SELECT t[s.j] AS u, t[s.j + 1] AS v
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS j) s
            WHERE len(t) >= 2
        ), big AS (
            SELECT u, v, count(*) AS c2 FROM bigd GROUP BY u, v
        ), uni AS (
            SELECT x AS w, count(*) AS c1
            FROM (SELECT unnest(t) AS x FROM toks) GROUP BY x
        ), tot AS (
            SELECT CAST(sum(c1) AS BIGINT) AS n, count(*) AS v FROM uni
        ), scored AS (
            SELECT trid.doc_id,
                   CASE WHEN tri.c3 IS NOT NULL
                        THEN tri.c3 * 1.0 / b12.c2
                        WHEN b23.c2 IS NOT NULL
                        THEN 0.4 * b23.c2 / u2.c1
                        ELSE 0.4 * 0.4 * ((coalesce(u3.c1, 0) + 0.5)
                             / (tot.n + 0.5 * tot.v)) END AS s
            FROM trid
            LEFT JOIN tri USING (w1, w2, w3)
            LEFT JOIN big b12 ON trid.w1 = b12.u AND trid.w2 = b12.v
            LEFT JOIN big b23 ON trid.w2 = b23.u AND trid.w3 = b23.v
            LEFT JOIN uni u2 ON trid.w2 = u2.w
            LEFT JOIN uni u3 ON trid.w3 = u3.w, tot
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
               round(avg(ln(s)), 6) AS sb_logscore
        FROM scored GROUP BY doc_id
        ORDER BY sb_logscore ASC, doc_id ASC LIMIT 20
    """,

    # CCNet head/middle/tail: the unigram-LM CTE verbatim, then the
    # identical NTILE(3) over (lang / rounded-score DESC, id ASC) —
    # both engines rank the same 6-rounded doubles, so tier boundaries
    # (larger buckets first, standard SQL NTILE) match row-for-row
    'q_ppl_buckets': r"""
        WITH ex AS (
            SELECT doc_id, s.t AS term
            FROM documents,
                 LATERAL (SELECT unnest(string_split_regex(lower(text),
                                                           '\s+')) AS t) s
            WHERE s.t <> ''
        ), tf AS (
            SELECT term, count(*) AS tf FROM ex GROUP BY term
        ), tot AS (
            SELECT sum(tf) AS n, count(*) AS v FROM tf
        ), score AS (
            SELECT doc_id,
                   round(avg(ln((tf.tf + 0.5)
                                / (tot.n + 0.5 * tot.v))), 6) AS logprob
            FROM ex JOIN tf USING (term), tot
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, s.logprob,
               CASE NTILE(3) OVER (PARTITION BY d.lang
                                   ORDER BY s.logprob DESC, d.doc_id ASC)
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM documents d JOIN score s USING (doc_id)
    """,
    # greedy budget fill rebuilt: rounded alpha_ratio priority, integer
    # exclusive running sum, budget VALUES mirror the query's dict;
    # zh has no budget row so the inner join drops it (the operator's
    # explicit-mixture contract)
    'q_token_budget_mix': r"""
        WITH q AS (
            SELECT doc_id, lang,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio
            FROM documents
        ), c AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY alpha_ratio DESC, doc_id ASC
                                       ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum_before
            FROM q
        ), b(lang, budget) AS (VALUES
            ('en', 6000), ('de', 2000), ('fr', 2000), ('es', 2000))
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM c JOIN b USING (lang)
        WHERE cum_before < budget
        GROUP BY lang
    """,
    # temperature mixture: weights = floor(sqrt(per-lang token sums))
    # (IEEE sqrt correctly rounded → agrees with Python isqrt below
    # 2^52), budgets = single proportional round in integer floor
    # division (clamp-free total by construction), then the same
    # exclusive-running-sum fill as q_token_budget_mix
    'q_temperature_mix': r"""
        WITH q AS (
            SELECT doc_id, lang,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio
            FROM documents
        ), w AS (
            SELECT lang,
                   CAST(floor(sqrt(sum(n_tokens)::DOUBLE)) AS BIGINT) AS w
            FROM q GROUP BY lang HAVING sum(n_tokens) > 0
        ), b AS (
            SELECT lang, (6000 * w) // (SELECT sum(w) FROM w) AS budget
            FROM w
        ), c AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY alpha_ratio DESC, doc_id ASC
                                       ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum_before
            FROM q
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM c JOIN b USING (lang)
        WHERE cum_before < budget
        GROUP BY lang ORDER BY lang
    """,
    # every injected +120s re-crawl pair sits inside the 1-hour
    # watermark, so dropDuplicatesWithinWatermark GUARANTEES one
    # survivor per text: the deduped stream == documents' distinct
    # texts, and every reported value is text-determined
    'q_stream_dedup': r"""
        SELECT CAST(count(*) AS BIGINT) AS n_kept,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_texts,
               CAST(sum(length(text)) AS BIGINT) AS total_chars
        FROM documents
    """,
    # every train×bench cosine recomputed, rounded to the same 6-place
    # grid, identical (sim DESC, bid ASC) argmax; bench_id_sum is NULL
    # for the clean group on both sides
    'q_semantic_decontamination': r"""
        WITH bench AS (
            SELECT vec_id + 100000 AS bid, embedding FROM embeddings
            WHERE vec_id % 10 = 0
        ), sims AS (
            SELECT t.vec_id, b.bid,
                   round(list_dot_product(t.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(t.embedding::DOUBLE[],
                                                t.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]))), 6)
                       AS sim
            FROM embeddings t, bench b
        ), best AS (
            SELECT vec_id, bid, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, bid ASC) AS rk
            FROM sims
        ), v AS (
            SELECT vec_id, bid, sim >= 0.9 AS contaminated
            FROM best WHERE rk = 1
        )
        SELECT CASE WHEN contaminated THEN 'contaminated'
                    ELSE 'clean' END AS verdict,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(vec_id) AS BIGINT) AS id_sum,
               CAST(sum(CASE WHEN contaminated THEN bid END) AS BIGINT)
                   AS bench_id_sum
        FROM v GROUP BY verdict
    """,
    # verdicts derived INDEPENDENTLY from the construction residues:
    # doc_id%7==0 → blocked domain; word residues 0/1 carry weight-5
    # keywords (score 5 ≥ threshold → rejected), residues 4/8 carry
    # two weight-1 tokens (score 2 → ok); everything else scores 0
    'q_url_filter': r"""
        WITH v AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN 'blocked'
                        WHEN doc_id % 10 IN (0, 1) THEN 'rejected'
                        ELSE 'ok' END AS verdict,
                   CASE WHEN doc_id % 10 IN (0, 1) THEN 5
                        WHEN doc_id % 10 IN (4, 8) THEN 2
                        ELSE 0 END AS url_score
            FROM documents
        )
        SELECT verdict, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(url_score) AS BIGINT) AS sum_score,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM v GROUP BY verdict
    """,
    # DSIR rebuilt end-to-end: md5-hex bucketing of {uni,bi}grams,
    # both Lidstone bucket models over the fixed 16^3 space, summed
    # log-ratio, and the derandomized Gumbel key from the same
    # md5(seed|id) 24-bit dyadic uniform
    'q_dsir_select': r"""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS t
            FROM documents
        ), ng AS (
            SELECT doc_id, lang,
                   list_concat(t,
                       CASE WHEN len(t) >= 2 THEN
                           list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i+1])
                       ELSE []::VARCHAR[] END) AS ngrams
            FROM toks
        ), bx AS (
            SELECT doc_id, lang, substr(md5(x), 1, 3) AS bucket
            FROM (SELECT doc_id, lang, unnest(ngrams) AS x FROM ng)
        ),
        tgt AS (SELECT bucket FROM bx
                WHERE lang = 'en' AND doc_id % 5 = 0),
        rawx AS (SELECT doc_id, bucket FROM bx
                 WHERE NOT (lang = 'en' AND doc_id % 5 = 0)),
        ct AS (SELECT bucket, count(*) AS c_t FROM tgt GROUP BY bucket),
        cr AS (SELECT bucket, count(*) AS c_r FROM rawx GROUP BY bucket),
        nt AS (SELECT count(*) AS n_t FROM tgt),
        nr AS (SELECT count(*) AS n_r FROM rawx),
        lam AS (
            SELECT bucket,
                   ln((coalesce(c_t, 0) + 0.5) / (nt.n_t + 0.5 * 4096))
                 - ln((coalesce(c_r, 0) + 0.5) / (nr.n_r + 0.5 * 4096))
                       AS lam
            FROM ct FULL OUTER JOIN cr USING (bucket), nt, nr
        ), w AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                   round(sum(lam), 6) AS dsir_logw,
                   sum(lam) AS logw_raw
            FROM rawx JOIN lam USING (bucket)
            GROUP BY doc_id
        ), gum AS (
            SELECT doc_id, n_feats, dsir_logw, logw_raw,
                   substr(md5('dsir|' || doc_id::VARCHAR), 1, 6) AS h6
            FROM w
        ), key AS (
            SELECT doc_id, n_feats, dsir_logw,
                   round(logw_raw + (-ln(-ln((
                       (strpos('0123456789abcdef', substr(h6,1,1)) - 1)
                           * 1048576.0
                     + (strpos('0123456789abcdef', substr(h6,2,1)) - 1)
                           * 65536.0
                     + (strpos('0123456789abcdef', substr(h6,3,1)) - 1)
                           * 4096.0
                     + (strpos('0123456789abcdef', substr(h6,4,1)) - 1)
                           * 256.0
                     + (strpos('0123456789abcdef', substr(h6,5,1)) - 1)
                           * 16.0
                     + (strpos('0123456789abcdef', substr(h6,6,1)) - 1)
                     + 0.5) / 16777216.0))), 6) AS gumbel_key
            FROM gum
        )
        SELECT doc_id, n_feats, dsir_logw, gumbel_key
        FROM key ORDER BY gumbel_key DESC, doc_id ASC LIMIT 25
    """,
    # both shingle sets rebuilt in SQL and intersected — the benchmark
    # slice is every 97th doc
    'q_decontamination': r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE []::VARCHAR[] END AS shingles
            FROM toks
        ),
        bench AS (SELECT DISTINCT unnest(shingles) AS s
                  FROM sh WHERE doc_id % 97 = 0),
        trainx AS (SELECT doc_id, unnest(shingles) AS s
                   FROM sh WHERE doc_id % 97 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM trainx JOIN bench USING (s)
        GROUP BY doc_id ORDER BY doc_id
    """,
    # the exact-Jaccard pair CTEs (same as q_ngram_jaccard_exact) closed
    # transitively by a recursive CTE — min reachable id per node
    'q_neardup_clusters': r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE []::VARCHAR[] END AS shingles
            FROM toks
        ), shne AS (SELECT * FROM sh WHERE len(shingles) > 0),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM shne),
        rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 256),
        exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM exr a JOIN exr b USING (s) WHERE a.doc_id < b.doc_id),
        j AS (
            SELECT id_a, id_b,
                   len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
                   (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))) AS jac
            FROM cand JOIN shne sa ON sa.doc_id = id_a
                      JOIN shne sb ON sb.doc_id = id_b),
        pairs AS (SELECT id_a, id_b FROM j WHERE jac >= 0.5),
        e AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
        n AS (SELECT DISTINCT u FROM e),
        comp(u, m) AS (
            SELECT u, u FROM n
            UNION
            SELECT e.u, c.m FROM e JOIN comp c ON c.u = e.v
        ),
        lab AS (SELECT u, min(m) AS component FROM comp GROUP BY u)
        SELECT component, CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(u) AS BIGINT) AS id_sum
        FROM lab GROUP BY component ORDER BY component
    """,
    # keep-best-per-cluster: pairs → recursive closure → the SAME
    # ROW_NUMBER policy (n_chars DESC, doc_id ASC); kept = all docs
    # minus the losers — every keep/drop decision witnessed by ids_md5
    'q_cluster_keep_best': r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE []::VARCHAR[] END AS shingles
            FROM toks
        ), shne AS (SELECT * FROM sh WHERE len(shingles) > 0),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM shne),
        rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 256),
        exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM exr a JOIN exr b USING (s) WHERE a.doc_id < b.doc_id),
        j AS (
            SELECT id_a, id_b,
                   len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
                   (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))) AS jac
            FROM cand JOIN shne sa ON sa.doc_id = id_a
                      JOIN shne sb ON sb.doc_id = id_b),
        pairs AS (SELECT id_a, id_b FROM j WHERE jac >= 0.5),
        e AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
        n AS (SELECT DISTINCT u FROM e),
        comp(u, m) AS (
            SELECT u, u FROM n
            UNION
            SELECT e.u, c.m FROM e JOIN comp c ON c.u = e.v
        ),
        lab AS (SELECT u, min(m) AS component FROM comp GROUP BY u),
        ranked AS (
            SELECT lab.u AS doc_id,
                   row_number() OVER (PARTITION BY lab.component
                                      ORDER BY d.n_chars DESC,
                                               lab.u ASC) AS rk
            FROM lab JOIN documents d ON d.doc_id = lab.u),
        losers AS (SELECT doc_id FROM ranked WHERE rk > 1),
        kept AS (SELECT * FROM documents
                 WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        SELECT CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5,
               CAST(sum(n_chars) AS BIGINT) AS char_sum
        FROM kept
    """,
    # the Bloom filter moves bytes, never answers: the committed set is
    # exactly batch A ∪ batch B, reconstructed here from doc_id alone
    'q_bloom_incremental_ingest': """
        SELECT lang, CAST(count(*) AS BIGINT) AS n
        FROM documents
        WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
        GROUP BY lang ORDER BY lang
    """,
    # full-probe IVF provably degenerates to exact brute force — same
    # SQL as q_emb_cosine_topk by construction
    'q_ivf_ann_exact': """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        sims AS (
            SELECT vec_id,
                   round(list_dot_product(embedding::DOUBLE[], q.qv)
                         / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
            FROM embeddings, q)
        SELECT vec_id, cos_sim FROM sims
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    # independent reconstruction of the stream's watermark-finalized
    # tumbling windows from the documents table (fixture arithmetic:
    # warc_ts = 2025-01-01 + 17·doc_id s; host0 takes every 5th row)
    'q_stream_windowed_counts': """
        WITH pages AS (
            SELECT doc_id,
                   TIMESTAMP '2025-01-01 00:00:00'
                       + doc_id * INTERVAL 17 SECOND AS ts,
                   CASE WHEN doc_id % 5 = 0 THEN 'host0.example.com'
                        ELSE 'host' || CAST(1 + (doc_id * 13) % 49 AS VARCHAR)
                             || '.example.com'
                   END AS host
            FROM documents
        ), wm AS (
            SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM pages
        ), win AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS wstart, host,
                   count(*) AS n_pages
            FROM pages GROUP BY 1, 2
        ), fin AS (
            SELECT * FROM win
            WHERE wstart + INTERVAL 30 MINUTE <= (SELECT w FROM wm)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_window_rows,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               CAST(sum(n_pages) AS BIGINT) AS total_pages,
               CAST(sum(CASE WHEN n_pages > 15 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hot
        FROM fin
    """,
    # expected decode metadata derived INDEPENDENTLY from the fixture
    # construction arithmetic (no table needed): the PNG/WAV/frame
    # parsers must return exactly what was encoded
    'q_multimodal_metadata': """
        WITH img AS (SELECT unnest(range(24)) AS i),
             aud AS (SELECT unnest(range(12)) AS i),
             vid AS (SELECT unnest(range(6)) AS i)
        SELECT * FROM (
            SELECT 'image' AS modality,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN i % 5 <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_decode_ok,
                   CAST(sum(CASE WHEN i % 5 <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS checksum  -- 1x1 PNGs: width = 1
            FROM img
            UNION ALL
            SELECT 'audio', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN i % 4 <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(sum(CASE WHEN i % 4 <> 0
                            THEN 8000 + 1000 * (i % 3) ELSE 0 END)
                        AS BIGINT)
            FROM aud
            UNION ALL
            SELECT 'video', CAST(count(*) AS BIGINT),
                   CAST(count(*) AS BIGINT),
                   CAST(sum((4 + i + 1) // 2) AS BIGINT)  -- ceil(n/2) frames
            FROM vid)
        ORDER BY modality
    """,
    # the md5 coin replayed digit-for-digit: thresholds are the exact
    # hex of frac(f)·16^32 (1/4 → 2^126 = '4'+31×'0', 1/2 → 2^127 =
    # '8'+31×'0'); es/zh have no factor row, the join drops them
    'q_epoch_upsample': r"""
        WITH f(lang, whole, thr) AS (VALUES
            ('en', 1, '40000000000000000000000000000000'),
            ('de', 2, '00000000000000000000000000000000'),
            ('fr', 0, '80000000000000000000000000000000')),
        n AS (
            SELECT d.doc_id, d.lang,
                   f.whole + CASE WHEN md5(d.doc_id || '|r5') < f.thr
                                  THEN 1 ELSE 0 END AS n_copies
            FROM documents d JOIN f USING (lang)
        )
        SELECT doc_id, lang, CAST(e AS BIGINT) AS epoch
        FROM (SELECT doc_id, lang, unnest(range(n_copies)) AS e
              FROM n WHERE n_copies > 0)
    """,
    # the seeded stream re-sorted on the identical md5(id|seed)·id key,
    # cumulative window minus self = exclusive offset, integer divide
    # for the shard cut — byte-for-byte the operator's contract
    'q_shuffle_shards': r"""
        WITH t AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS toks,
                   md5(doc_id || '|r5') || doc_id AS k
            FROM documents
        ), c AS (
            SELECT doc_id,
                   sum(toks) OVER (ORDER BY k
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - toks AS off
            FROM t
        )
        SELECT doc_id, CAST(off AS BIGINT) AS "offset",
               CAST(off // 5000 AS BIGINT) AS shard,
               CAST(off % 5000 AS BIGINT) AS shard_offset
        FROM c
    """,
    # the written tree attested end-to-end: same stream/cut CTE as
    # q_shuffle_shards, checksum = md5 of the comma-joined ids sorted
    # AS STRINGS (spark array_sort == binary-collation ORDER BY)
    'q_shard_export': r"""
        WITH t AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS toks,
                   md5(doc_id || '|r5') || doc_id AS k
            FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   (sum(toks) OVER (ORDER BY k
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - toks) // 5000
                       AS shard
            FROM t
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS n_tokens,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5
        FROM c GROUP BY shard
    """,
    # both batch streams rebuilt, batch 2 shifted to the ceil-div
    # boundary (no shard spans two batches), manifests unioned — the
    # append-only contract checked value-for-value
    'q_append_shards': r"""
        WITH t1 AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS toks,
                   md5(doc_id || '|r5a') || doc_id AS k
            FROM documents WHERE doc_id % 2 = 0
        ), c1 AS (
            SELECT doc_id, toks,
                   (sum(toks) OVER (ORDER BY k
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - toks) // 5000
                       AS shard
            FROM t1
        ), base AS (
            SELECT ((sum(toks) + 4999) // 5000) * 5000 AS b FROM t1
        ), t2 AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS toks,
                   md5(doc_id || '|r5b') || doc_id AS k
            FROM documents WHERE doc_id % 2 = 1
        ), c2 AS (
            SELECT doc_id, toks,
                   (sum(toks) OVER (ORDER BY k
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - toks + base.b)
                       // 5000 AS shard
            FROM t2, base
        ), m AS (
            SELECT shard, doc_id, toks FROM c1
            UNION ALL SELECT shard, doc_id, toks FROM c2
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS n_tokens,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5
        FROM m GROUP BY shard
    """,
    # export diff: append-only history must read as unchanged + added
    # with the even/odd content sums — never changed/removed
    'q_export_diff': r"""
        WITH t AS (SELECT doc_id,
                          len(string_split_regex(trim(text), '\s+'))
                              AS toks
                   FROM documents)
        SELECT 'added' AS status,
               CAST(count(*) AS BIGINT) AS sum_docs,
               CAST(sum(toks) AS BIGINT) AS sum_tokens
        FROM t WHERE doc_id % 2 = 1
        UNION ALL
        SELECT 'unchanged' AS status,
               CAST(count(*) AS BIGINT) AS sum_docs,
               CAST(sum(toks) AS BIGINT) AS sum_tokens
        FROM t WHERE doc_id % 2 = 0
        ORDER BY status
    """,

    # streaming export content witnessed corpus-wide — batching and
    # shard cuts are physical, the ids/token totals are not
    'q_stream_export': r"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS sum_toks,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5
        FROM documents
    """,
    # MERGE keep-latest derived independently: updates replayed as a
    # CASE over the update predicate, inserts as a UNION ALL
    'q_recrawl_upsert': r"""
        WITH base AS (
            SELECT lang,
                   CASE WHEN doc_id % 3 = 0
                        THEN len(string_split_regex(trim(text), '\s+'))
                             + 1000
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END AS toks,
                   CASE WHEN doc_id % 3 = 0 THEN 200 ELSE 100 END AS ts
            FROM documents
        ), ins AS (
            SELECT lang, 1 AS toks, 150 AS ts
            FROM documents WHERE doc_id % 7 = 0
        ), m AS (
            SELECT * FROM base UNION ALL SELECT * FROM ins
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(toks) AS BIGINT) AS sum_toks,
               CAST(sum(ts) AS BIGINT) AS sum_ts
        FROM m GROUP BY lang ORDER BY lang
    """,
    # the JSONL round-trip witnessed content-wise: what comes back off
    # disk must be the corpus, independent of file layout
    'q_jsonl_export': r"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS sum_toks,
               md5(string_agg(doc_id::VARCHAR, ','
                              ORDER BY doc_id::VARCHAR)) AS ids_md5
        FROM documents
    """,
    # the release datasheet rebuilt column-for-column: exact counts,
    # the md5-distinct duplication measure, both quality gates, and
    # single-division ratios
    'q_corpus_datasheet': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id, -4700 + sum(coalesce(wt, 0)) AS units
               FROM tok LEFT JOIN w ON t = term GROUP BY doc_id),
        q AS (SELECT doc_id, lang, source,
                     len(string_split_regex(trim(text), '\s+')) AS tokc,
                     length(text) AS chars, md5(text) AS h,
                     CASE WHEN
                         round(length(regexp_replace(text, '[^A-Za-z]',
                                                     '', 'g')) * 1.0
                               / greatest(length(text), 1), 6) > 0.6
                         AND round(length(regexp_replace(text, '[^0-9]',
                                                         '', 'g')) * 1.0
                                   / greatest(length(text), 1), 6) < 0.2
                         AND len(string_split_regex(trim(text), '\s+')) >= 5
                     THEN 1 ELSE 0 END AS qok,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
              FROM documents),
        j AS (SELECT q.*, sc.units FROM q JOIN sc USING (doc_id))
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(tokc) AS BIGINT) AS n_tokens,
               CAST(sum(chars) AS BIGINT) AS n_chars,
               CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
               CAST(sum(qok) AS BIGINT) AS n_quality_ok,
               CAST(sum(CASE WHEN units > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_model_pass,
               CAST(sum(en) AS BIGINT) AS n_en,
               round((count(*) - count(DISTINCT h))
                     / CAST(count(*) AS DOUBLE), 6) AS dup_frac,
               round(sum(tokc) / CAST(count(*) AS DOUBLE), 6)
                   AS tokens_per_doc
        FROM j
    """,
    # salt is routing only: the salted join's values must equal the
    # plain join, replayed here without any salt
    'q_salted_join': r"""
        WITH dim AS (SELECT DISTINCT user_id, user_id % 13 AS weight
                     FROM events)
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d.weight) AS BIGINT) AS sum_weight,
               CAST(sum(e.user_id) AS BIGINT) AS sum_uid
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    # the co-located join's VALUES witnessed single-table (bucketing
    # is a physical layout choice — results must be layout-invariant);
    # the zero-Exchange plan itself is pinned in tests/test_layout.py
    'q_bucketed_join': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, lang,
                       len(string_split_regex(trim(text), '\s+')) AS toks,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id, any_value(lang) AS lang,
                      any_value(toks) AS toks,
                      -4700 + sum(coalesce(wt, 0)) AS units
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS sum_toks,
               CAST(sum(units) AS BIGINT) AS sum_units
        FROM sc WHERE units > 0 GROUP BY lang ORDER BY lang
    """,
    # file skipping must be value-invisible: the pruned scan equals a
    # plain WHERE over the whole table (bounds derived the same way —
    # integer floor-div of the id span)
    'q_range_pruned_read': r"""
        WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
                   FROM documents),
        r AS (SELECT mn + (mx - mn) * 2 // 10 AS lo,
                     mn + (mx - mn) * 6 // 10 AS hi FROM b)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS sum_toks,
               CAST(min(doc_id) AS BIGINT) AS min_id,
               CAST(max(doc_id) AS BIGINT) AS max_id
        FROM documents, r WHERE doc_id BETWEEN lo AND hi
        GROUP BY lang ORDER BY lang
    """,
    # exact AUC replayed: per-distinct-score class counts, negatives-
    # below cumsum, 2·AUC·P·N as an integer — the '__all__' row checks
    # the two-phase global path against plain SQL
    'q_model_auc': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, source, lang,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id, any_value(source) AS source,
                      CASE WHEN any_value(lang) = 'en' THEN 1 ELSE 0 END
                          AS y,
                      -4700 + sum(coalesce(wt, 0)) AS s
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id),
        lab AS (SELECT source, s, y FROM sc
                UNION ALL SELECT '__all__', s, y FROM sc),
        per AS (SELECT source, s, sum(y) AS p, count(*) - sum(y) AS n
                FROM lab GROUP BY source, s),
        nb AS (SELECT source, p, n,
                      sum(n) OVER (PARTITION BY source ORDER BY s
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - n AS nbelow
               FROM per),
        g AS (SELECT source, sum(p) AS pos_n, sum(n) AS neg_n,
                     sum(p * (2 * nbelow + n)) AS num2
              FROM nb GROUP BY source)
        SELECT source, CAST(pos_n AS BIGINT) AS pos_n,
               CAST(neg_n AS BIGINT) AS neg_n,
               CAST(num2 AS BIGINT) AS auc_num2,
               CASE WHEN pos_n > 0 AND neg_n > 0 THEN
                   round(CAST(num2 AS DOUBLE) / (2.0 * pos_n * neg_n), 6)
               END AS auc
        FROM g ORDER BY source
    """,
    # PR curve: class totals minus exclusive below-prefix sums per
    # distinct score; precision/recall single IEEE divisions of exact
    # counts, every row independent
    'q_pr_curve': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, lang,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id,
                      CASE WHEN any_value(lang) = 'en' THEN 1 ELSE 0 END
                          AS y,
                      -4700 + sum(coalesce(wt, 0)) AS s
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id),
        per AS (SELECT s, sum(y) AS p, count(*) - sum(y) AS n
                FROM sc GROUP BY s),
        tot AS (SELECT sum(p) AS tp_all, sum(n) AS fn_all FROM per),
        c AS (SELECT s, p, n,
                     sum(p) OVER (ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - p AS pb,
                     sum(n) OVER (ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n AS nb
              FROM per)
        SELECT s AS score,
               CAST(tp_all - pb AS BIGINT) AS tp,
               CAST(fn_all - nb AS BIGINT) AS fp,
               round((tp_all - pb) * 1.0
                     / ((tp_all - pb) + (fn_all - nb)), 6) AS precision,
               round((tp_all - pb) * 1.0 / tp_all, 6) AS recall
        FROM c, tot ORDER BY score DESC
    """,

    # average precision: the identical pinned arithmetic — precision
    # rounded to 12 places, terms summed in DECIMAL(38,12)
    'q_average_precision': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, source, lang,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id, any_value(source) AS source,
                      CASE WHEN any_value(lang) = 'en' THEN 1 ELSE 0 END
                          AS y,
                      -4700 + sum(coalesce(wt, 0)) AS s
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id),
        per AS (SELECT source, s, sum(y) AS p, count(*) - sum(y) AS n
                FROM sc GROUP BY source, s),
        c AS (SELECT source, s, p, n,
                     sum(p) OVER (PARTITION BY source ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - p AS pb,
                     sum(n) OVER (PARTITION BY source ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n AS nb,
                     sum(p) OVER (PARTITION BY source) AS bigp,
                     sum(n) OVER (PARTITION BY source) AS bign
              FROM per),
        terms AS (SELECT source, bigp, bign,
                         CAST(round(p * round((bigp - pb) * 1.0
                              / ((bigp - pb) + (bign - nb)), 12), 12)
                              AS DECIMAL(38,12)) AS term
                  FROM c)
        SELECT source,
               CAST(any_value(bigp) AS BIGINT) AS pos_n,
               CAST(any_value(bign) AS BIGINT) AS neg_n,
               CASE WHEN any_value(bigp) > 0 THEN
                   round(CAST(sum(term) AS DOUBLE)
                         / any_value(bigp), 6) END AS ap
        FROM terms GROUP BY source ORDER BY source
    """,

    # the conditional-aggregate confusion pass replayed per threshold;
    # ratios are single IEEE divisions of exact counts
    'q_threshold_report': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, lang,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id,
                      CASE WHEN any_value(lang) = 'en' THEN 1 ELSE 0 END
                          AS y,
                      -4700 + sum(coalesce(wt, 0)) AS s
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id),
        th(threshold) AS (VALUES (CAST(-1000 AS DOUBLE)),
                                 (CAST(0 AS DOUBLE)),
                                 (CAST(1000 AS DOUBLE))),
        c AS (SELECT threshold,
                     sum(CASE WHEN s >= threshold AND y = 1
                         THEN 1 ELSE 0 END) AS tp,
                     sum(CASE WHEN s >= threshold AND y = 0
                         THEN 1 ELSE 0 END) AS fp,
                     sum(CASE WHEN s < threshold AND y = 1
                         THEN 1 ELSE 0 END) AS fn,
                     sum(CASE WHEN s < threshold AND y = 0
                         THEN 1 ELSE 0 END) AS tn
              FROM sc, th GROUP BY threshold)
        SELECT threshold, CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
               CAST(tn AS BIGINT) AS tn,
               CASE WHEN tp + fp > 0 THEN
                   round(CAST(tp AS DOUBLE) / (tp + fp), 6)
               END AS precision,
               CASE WHEN tp + fn > 0 THEN
                   round(CAST(tp AS DOUBLE) / (tp + fn), 6)
               END AS recall,
               CASE WHEN 2 * tp + fp + fn > 0 THEN
                   round(2 * CAST(tp AS DOUBLE) / (2 * tp + fp + fn), 6)
               END AS f1
        FROM c ORDER BY threshold
    """,
    # equal-width bins over integer units with edge clamping; pos_rate
    # is one division of exact counts (mean_score deliberately absent:
    # avg-of-doubles is addition-order-dependent)
    'q_calibration_bins': r"""
        WITH w(term, wt) AS (VALUES
            ('query', 300), ('sort', 250), ('merge', 250), ('vector', 220),
            ('stream', 200), ('window', 200), ('fast', 200), ('scan', 150),
            ('join', 150), ('spark', 150), ('hash', 120), ('column', 120),
            ('table', 100), ('batch', 100), ('agg', 100), ('group', 100),
            ('order', 100), ('filter', 100), ('key', 80), ('row', 80),
            ('value', 60), ('data', 60), ('line', 60), ('part', 60),
            ('customer', 50), ('big', 50), ('small', -150), ('slow', -400),
            ('dup', -500), ('a', -100), ('the', -100)),
        tok AS (SELECT doc_id, lang,
                       unnest(string_split_regex(lower(trim(text)), '\s+'))
                           AS t
                FROM documents),
        sc AS (SELECT doc_id,
                      CASE WHEN any_value(lang) = 'en' THEN 1 ELSE 0 END
                          AS y,
                      -4700 + sum(coalesce(wt, 0)) AS s
               FROM tok LEFT JOIN w ON t = term
               GROUP BY doc_id),
        b AS (SELECT CAST(least(greatest(
                         floor((CAST(s AS DOUBLE) + 10000.0) / 2500.0),
                         0), 7) AS BIGINT) AS bin, y
              FROM sc)
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
        FROM b GROUP BY bin ORDER BY bin
    """,
    # waterfilling replayed in exact integer arithmetic: round 1 clamps
    # zh (its 5/10 share exceeds availability at both gate SFs — en/de
    # round-1 shares are discarded per the repair loop), round 2
    # reflows the shortfall 3:2 to en/de with floor division, then the
    # q_token_budget_mix fill window runs against the derived budgets
    'q_mixture_fill': r"""
        WITH q AS (
            SELECT doc_id, lang,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio
            FROM documents
        ), w(lang, wt) AS (VALUES ('en', 3), ('de', 2), ('zh', 5)),
        av AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS avail
            FROM q JOIN w USING (lang) GROUP BY lang
        ), tot AS (
            SELECT CAST(3 * sum(avail) // 5 AS BIGINT) AS total FROM av
        ), b AS (
            SELECT av.lang,
                   CAST(CASE av.lang
                        WHEN 'zh' THEN av.avail
                        WHEN 'en' THEN (tot.total - zh.avail) * 3 // 5
                        ELSE (tot.total - zh.avail) * 2 // 5
                        END AS BIGINT) AS budget
            FROM av, tot, (SELECT avail FROM av WHERE lang = 'zh') zh
        ), c AS (
            SELECT doc_id, lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY alpha_ratio DESC,
                                                doc_id ASC
                                       ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum_before
            FROM q JOIN w USING (lang)
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(sum(doc_id) AS BIGINT) AS id_sum, b.budget
        FROM c JOIN b USING (lang)
        WHERE cum_before < budget
        GROUP BY lang, b.budget
    """,
}


def catalog() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query catalog, ordered by algorithmic substance.

    The driver grades the FIRST 50 entries only (CORRECTNESS_r03 window),
    so the most substantial value-oracled queries come first: the six
    round-3 flagships (windowed streaming, bloom ingest, near-dup
    clustering, decontamination, unigram LM, pagerank) are inside the
    window as of round 4.  Trivial oracles (set ops, distinct values,
    size reject, status projection, destructive dedup, stratified
    sample; + q_token_counts since round 5 to make room for the
    end-to-end q_curation_pipeline oracle; + q_event_percentiles for
    the bigram-LM oracle) — all previously hash-green
    in a driver window — sit at positions 51+; they keep their
    oracle_sql entries and stay graded by the internal parity suite
    (tests/test_oracle_parity.py runs the FULL catalog) and pinned by
    tests/test_catalog_window.py.
    """
    return {
        # -- flagship oracles (driver-window priority); round 6 adds
        # the r5 heavyweights (semantic decontamination, DSIR, exact
        # AUC, MERGE upsert, bucketed layout) and the r6 trio
        # (substring removal, gopher repetition, encode+pack) --------
        'q_bloom_incremental_ingest': q_bloom_incremental_ingest,
        'q_cluster_keep_best': q_cluster_keep_best,
        'q_decontamination': q_decontamination,
        'q_unigram_logprob': q_unigram_logprob,
        'q_pagerank_centrality': q_pagerank_centrality,
        'q_semantic_decontamination': q_semantic_decontamination,
        'q_dsir_select': q_dsir_select,
        'q_model_auc': q_model_auc,
        # -- reference-parity and operator oracles --------------------
        'q_t2_t5_normalize': q_t2_t5_normalize,
        'q_t7_meaningful_tokens': q_t7_meaningful_tokens,
        'q_line_dedup': q_line_dedup,
        'q_d2_dedup_first_seen': q_d2_dedup_first_seen,
        'q_minhash_planted': q_minhash_planted,
        'q_pack_sequences': q_pack_sequences,
        'q_encode_pack': q_encode_pack,
        'q_simhash_planted': q_simhash_planted,
        'q_gopher_dup_ngrams': q_gopher_dup_ngrams,
        'q_learn_bpe': q_learn_bpe,
        'q_a3_term_document_frequency': q_a3_term_document_frequency,
        'q_semantic_dedup': q_semantic_dedup,
        'q_stupid_backoff': q_stupid_backoff,
        'q_substring_duplication': q_substring_duplication,
        'q_substring_removal': q_substring_removal,
        'q_gopher_repetition': q_gopher_repetition,
        'q_ppl_buckets': q_ppl_buckets,
        'q_temperature_mix': q_temperature_mix,
        'q_curation_pipeline': q_curation_pipeline,
        'q_model_quality_gate': q_model_quality_gate,
        'q_quality_cascade': q_quality_cascade,
        'q_token_counts_bpe': q_token_counts_bpe,
        'q_w2_search_snippets': q_w2_search_snippets,
        'q_stream_dedup': q_stream_dedup,
        'q_group_quota': q_group_quota,
        'q_ngram_jaccard_exact': q_ngram_jaccard_exact,
        'q_emb_cosine_dups': q_emb_cosine_dups,
        'q_skew_salted_agg': q_skew_salted_agg,
        'q_recrawl_upsert': q_recrawl_upsert,
        'q_bucketed_join': q_bucketed_join,
        'q_script_id': q_script_id,
        'q_f5_structured_semi_join': q_f5_structured_semi_join,
        'q_a6_topic_type': q_a6_topic_type,
        'q_error_taxonomy': q_error_taxonomy,
        'q_search_pipeline': q_search_pipeline,
        'q_tfidf_top_terms': q_tfidf_top_terms,
        'q_asof_join': q_asof_join,
        'q_lda_categories': q_lda_categories,
        'q_bigram_lm': q_bigram_lm,
        'q_sessionization': q_sessionization,
        'q_multimodal_metadata': q_multimodal_metadata,
        'q_ivf_ann_exact': q_ivf_ann_exact,
        # -- oracled, outside the window (still value-graded every CI
        # run by tests/test_oracle_parity.py's full-catalog pass) -----
        # Round-6 demotions, each with its in-window cover:
        # q_stream_windowed_counts (1-row; streaming = q_stream_dedup +
        # q_sessionization), q_tpch_q1 (thin aggregate),
        # q_emb_centroid_per_label (thin agg; embeddings = topk/
        # semantic_dedup/cosine_dups/semantic_decontamination),
        # q_pii_redaction (native regexp), q_repetition_stats
        # (superseded by q_gopher_repetition), q_source_quality_gate
        # (gates = curation_pipeline + model_quality_gate),
        # q_doc_chunking (window math graded inside q_encode_pack),
        # q_hash_split (md5-threshold assignment also inside
        # q_epoch_upsample's coin).
        # Round-7 demotions (VERDICT r6 #4 — swap the thinnest slots
        # for the strongest new oracles), each with in-window cover:
        # q_w1_relevance_topk (relevance scoring graded inside
        # q_search_pipeline and q_w2_search_snippets),
        # q_w5_first_event_per_user (ranking windows = q_group_quota +
        # q_sessionization), q_f2_lang_filter_counts (thin counts;
        # lang heuristics stay oracled via q_lang_id),
        # q_a1_wordfreq_top3 (same explode+agg shape as
        # q_tfidf_top_terms), q_j2_broadcast_join (broadcast joins =
        # q_f5_structured_semi_join + q_bucketed_join),
        # q_emb_cosine_topk (embedding path = q_semantic_dedup +
        # q_emb_cosine_dups + q_ivf_ann_exact +
        # q_semantic_decontamination).
        'q_w1_relevance_topk': q_w1_relevance_topk,
        'q_w5_first_event_per_user': q_w5_first_event_per_user,
        'q_f2_lang_filter_counts': q_f2_lang_filter_counts,
        'q_a1_wordfreq_top3': q_a1_wordfreq_top3,
        'q_j2_broadcast_join': q_j2_broadcast_join,
        'q_emb_cosine_topk': q_emb_cosine_topk,
        'q_stream_windowed_counts': q_stream_windowed_counts,
        'q_tpch_q1_pricing_summary': q_tpch_q1_pricing_summary,
        'q_emb_centroid_per_label': q_emb_centroid_per_label,
        'q_pii_redaction': q_pii_redaction,
        'q_repetition_stats': q_repetition_stats,
        'q_source_quality_gate': q_source_quality_gate,
        'q_doc_chunking': q_doc_chunking,
        'q_hash_split': q_hash_split,
        'q_lang_id': q_lang_id,
        'q_quality_scores': q_quality_scores,
        'q_rollup_orders': q_rollup_orders,
        'q_event_percentiles': q_event_percentiles,
        'q_j3_semi_join': q_j3_semi_join,
        'q_cube_events': q_cube_events,
        'q_a8_corpus_stats': q_a8_corpus_stats,
        'q_d1_content_hash': q_d1_content_hash,
        'q_url_canonicalization': q_url_canonicalization,
        'q_set_ops': q_set_ops,
        'q_a7_distinct_filter_values': q_a7_distinct_filter_values,
        'q_f1_size_reject': q_f1_size_reject,
        'q_j4_status_projection': q_j4_status_projection,
        'q_d3_destructive_dedup': q_d3_destructive_dedup,
        'q_stratified_sample': q_stratified_sample,
        'q_token_counts': q_token_counts,
        'q_fingerprint': q_fingerprint,
        'q_skew_salted_counts': q_skew_salted_counts,
        'q_j1_anti_join': q_j1_anti_join,
        'q_w3_topk_events': q_w3_topk_events,
        'q_url_filter': q_url_filter,
        'q_epoch_upsample': q_epoch_upsample,
        'q_shuffle_shards': q_shuffle_shards,
        'q_mixture_fill': q_mixture_fill,
        'q_shard_export': q_shard_export,
        'q_append_shards': q_append_shards,
        'q_threshold_report': q_threshold_report,
        'q_calibration_bins': q_calibration_bins,
        'q_pr_curve': q_pr_curve,
        'q_average_precision': q_average_precision,
        'q_compaction_content': q_compaction_content,
        'q_nfc_normalize': q_nfc_normalize,
        'q_tokenizer_report': q_tokenizer_report,
        'q_export_diff': q_export_diff,
        'q_range_pruned_read': q_range_pruned_read,
        'q_salted_join': q_salted_join,
        'q_corpus_datasheet': q_corpus_datasheet,
        'q_jsonl_export': q_jsonl_export,
        'q_stream_export': q_stream_export,
        'q_para_neardup_planted': q_para_neardup_planted,
        'q_substring_keep_first': q_substring_keep_first,
        'q_warc_framing': q_warc_framing,
        'q_neardup_clusters': q_neardup_clusters,
        'q_token_budget_mix': q_token_budget_mix,
        'q_f4_category_overlap': q_f4_category_overlap,
        'q_crawl_delta': q_crawl_delta,
        'q_html_meta': q_html_meta,
        'q_line_dedup_within': q_line_dedup_within,
        # rows-only (no SQL oracle):
        'q_minhash_near_dups': q_minhash_near_dups,
        'q_minhash_incremental': q_minhash_incremental,
        'q_simhash_near_dups': q_simhash_near_dups,
        'q_extraction_pipeline': q_extraction_pipeline,
        'q_lsh_ann_topk': q_lsh_ann_topk,
        'q_neardup_pr': q_neardup_pr,
        'q_para_neardup': q_para_neardup,
        'q_ivf_ann_topk': q_ivf_ann_topk,
        'q_ann_recall': q_ann_recall,
        'q_stream_ingest': q_stream_ingest,
        'q_warc_ingest': q_warc_ingest,
        'q_compaction': q_compaction,
    }
