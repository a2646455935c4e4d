"""Extraction + preprocessing Spark operators (S2-S6, T1-T10).

Plan shape, chosen deliberately (SURVEY.md §4.3):

1. ``with_doctype`` is native Catalyst (magic-byte ``substring`` on the
   binary column) → stays inside whole-stage codegen, usable for
   partition routing and pruning *without* touching Python.
2. ``extract_text_udf`` / ``preprocess_udf`` are Arrow-batched
   iterator pandas UDFs: one Python worker round-trip per batch, not
   per row; the iterator form amortizes per-task setup (the reference
   kernel imports) across all batches of a partition.
3. ``extracted`` drops the payload column immediately after extraction
   so downstream stages never shuffle multi-KB binaries.

The per-file timeout of the reference (pdf 120 s, image 30 s —
``pdf_extractor.py:62-73``) becomes a cooperative per-row budget inside
the batch loop; rows over budget yield the reference's timeout error
string instead of killing the task.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..config import DEFAULT_CONFIG
from ..kernels.extract import extract_text
from ..kernels.preprocess import preprocess_text, preprocess_text_nltk

_PDF_MAGIC = b'%PDF-'
_PNG_MAGIC = b'\x89PNG\r\n\x1a\n'


def doctype_col(html: Column) -> Column:
    """Magic-byte doctype sniff as a native Catalyst expression
    (replaces the extension dispatch of extractor_factory.py:25-32)."""
    return (
        F.when(F.substring(html, 1, 5) == F.lit(_PDF_MAGIC), F.lit('pdf'))
        .when(F.substring(html, 1, 8) == F.lit(_PNG_MAGIC), F.lit('image'))
        .otherwise(F.lit('html'))
    )


def with_doctype(df: DataFrame, payload_col: str = 'html') -> DataFrame:
    return df.withColumn('doctype', doctype_col(F.col(payload_col)))


# head-metadata patterns, pinned for the SQL oracle: Java regex and
# DuckDB's RE2 agree on (?is) flags, lazy quantifiers, [^"]* classes,
# group-1 extraction, AND the no-match result ('' in both engines).
# Whitespace is the EXPLICIT class [ \t\n\f\r] (ADVICE r7; round-4
# transcription rule): Java's \s additionally matches U+000B where
# RE2's does not, so a bare \s here would diverge from the oracle on
# payloads containing vertical tabs.
_WS = r'[ \t\n\f\r]'
_TITLE_RX = r'(?is)<title[^>]*>(.*?)</title>'
_ROBOTS_RX = (r'(?is)<meta[^>]*name' + _WS + r'*=' + _WS
              + r'*"robots"[^>]*content' + _WS + r'*=' + _WS + r'*"([^"]*)"')
_CANONICAL_RX = (r'(?is)<link[^>]*rel' + _WS + r'*=' + _WS
                 + r'*"canonical"[^>]*href' + _WS + r'*=' + _WS
                 + r'*"([^"]*)"')


def with_html_meta(df: DataFrame, payload_col: str = 'html',
                   url_col: str = 'url') -> DataFrame:
    """Head-metadata extraction for HTML payloads — the crawl-hygiene
    step a Common-Crawl pipeline runs BEFORE content extraction and
    URL-level dedup: pages that declare ``<meta name="robots"
    content="noindex">`` must not enter the corpus, and pages that
    declare ``<link rel="canonical">`` should consolidate onto the
    canonical target (the publisher's own dedup hint — catches mobile/
    AMP/print/session-URL variants that no syntactic URL
    canonicalization can).

    Adds columns (all native regexp on the decoded payload — pure
    codegen inside the scan projection, zero shuffle, zero Python):
    - ``html_title``: first <title> text ('' when absent),
    - ``meta_robots``: robots meta content ('' when absent),
    - ``noindex``: true iff meta_robots contains 'noindex'
      (case-insensitive) — the corpus-exclusion gate,
    - ``canonical_target``: the rel=canonical href when present and
      non-empty, else the page's own ``url_col`` — group directly on
      this column for canonical consolidation (first grouped stage
      shuffles only (target, narrow keys), never payloads).

    First-attribute-wins and double-quoted attributes are the pinned
    contract (regexes above are shared verbatim with the SQL oracle;
    single-quoted/unquoted attribute variants are a documented
    non-goal — at corpus scale they route through the full DOM parse
    in kernels/html_extract, not this fast path)."""
    page = F.decode(F.col(payload_col), 'UTF-8') \
        if dict(df.dtypes)[payload_col] == 'binary' else F.col(payload_col)
    robots = F.regexp_extract(page, _ROBOTS_RX, 1)
    canon = F.regexp_extract(page, _CANONICAL_RX, 1)
    return (df
            .withColumn('html_title', F.regexp_extract(page, _TITLE_RX, 1))
            .withColumn('meta_robots', robots)
            .withColumn('noindex',
                        F.lower(robots).contains('noindex'))
            .withColumn('canonical_target',
                        F.when(canon != '', canon)
                        .otherwise(F.col(url_col))))


def size_ok_col(payload: Column, max_bytes: int) -> Column:
    """F1 file-size predicate as a native expression (reference
    document_processor.py:66-73; the per-row kernel mirror is
    kernels/extract.py:88-89). Native so Catalyst can push it into the
    scan and route oversized rows without touching Python."""
    return F.octet_length(payload) <= F.lit(max_bytes)


def error_code_col(text: Column) -> Column:
    """Typed error taxonomy derived from the reference-faithful error
    strings (reference analogue: app/core/exceptions.py's exception
    classes; the strings themselves are pinned by kernels/extract.py).
    A small enum column for routing/monitoring at scale — the raw
    'Error: ...' strings stay byte-faithful in extracted_text."""
    return (
        F.when(text.isNull(), F.lit('EMPTY'))
        .when(~text.startswith('Error'), F.lit('OK'))
        .when(text.startswith('Error: File too large'), F.lit('TOO_LARGE'))
        .when(text.startswith('Error: PDF extraction timed out'), F.lit('TIMEOUT'))
        .when(text.startswith('Error: No text could be extracted'), F.lit('NO_TEXT'))
        .when(text.startswith('Error: empty payload'), F.lit('EMPTY'))
        .when(text.startswith('Error extracting text:'), F.lit('EXTRACT_FAILED'))
        .otherwise(F.lit('UNKNOWN_ERROR')))


_TIMEOUT_MSG = ("Error: PDF extraction timed out after {s} seconds. "
                "The file may be too large or complex.")


def _budget_check(text: str, elapsed: float, budget: float) -> str:
    """Post-hoc per-row time budget (reference pdf_extractor.py:68-73):
    a row whose extraction ran over budget AND produced no text gets
    the reference's timeout string; partial text is kept, and a
    genuine extraction error message is never rewritten. NB this is a
    detection mechanism, not a preemption one — it cannot interrupt a
    hung kernel call; at cluster scale stragglers are additionally
    bounded by spark.task.maxFailures + speculative execution."""
    if elapsed > budget and not text:
        return _TIMEOUT_MSG.format(s=int(budget))
    return text


@pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """payload bytes → extracted text (S2-S6 unified kernel), with the
    post-hoc per-row time budget of ``_budget_check``."""
    cfg = DEFAULT_CONFIG
    budget = cfg.pdf_timeout_s
    for payloads in batches:
        out = []
        for data in payloads:
            t0 = time.monotonic()
            text = extract_text(data, cfg)
            out.append(_budget_check(text, time.monotonic() - t0, budget))
        yield pd.Series(out, dtype='object')


@pandas_udf(StringType())
def preprocess_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """T1-T10 preprocess chain, byte-identical to the reference's
    deterministic path (text_preprocessor.py:95-177)."""
    for texts in batches:
        yield pd.Series([preprocess_text(t) if t is not None else None
                         for t in texts], dtype='object')


_EXTRACT_STRUCT = StructType([
    StructField('extracted_text', StringType()),
    StructField('preprocessed_text', StringType()),
])


def _make_extract_preprocess_udf(preprocess_mode: str):
    """Fused extract+preprocess kernel returning a struct column.

    Fused deliberately: two CHAINED pandas UDFs run as two concurrent
    Python workers per task (pipelined ArrowEvalPython stages), which
    doubles the Python process count per core and round-trips the
    multi-KB extracted text through Arrow twice. Fusing halves worker
    pressure and Arrow bytes (measured: the chained form flatlined
    local[8]→local[32] scaling)."""
    if preprocess_mode not in ('deterministic', 'nltk'):
        raise ValueError(
            f'unknown preprocess_mode {preprocess_mode!r}: '
            "expected 'deterministic' or 'nltk'")
    pre_fn = (preprocess_text_nltk if preprocess_mode == 'nltk'
              else preprocess_text)

    @pandas_udf(_EXTRACT_STRUCT)
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cfg = DEFAULT_CONFIG
        budget = cfg.pdf_timeout_s
        for payloads in batches:
            ext, pre = [], []
            for data in payloads:
                t0 = time.monotonic()
                text = extract_text(data, cfg)
                text = _budget_check(text, time.monotonic() - t0, budget)
                ext.append(text)
                pre.append(pre_fn(text))
            yield pd.DataFrame({'extracted_text': ext,
                                'preprocessed_text': pre})
    return _udf


extract_preprocess_udf = _make_extract_preprocess_udf('deterministic')


def needs_salt(df: DataFrame, threshold: int) -> bool:
    """Cheap pre-aggregation skew detector (SURVEY.md §4.3's 'salting
    on by default with a measured threshold'): max rows per host over
    the url column only — a narrow partial-agg job, the payload stays
    in place.  A host over ``threshold`` rows means url-hash
    repartitioning can put re-crawl bursts (many rows, few urls) on one
    task; the caller then salts the repartition key with warc_ts.

    try_parse_url, not parse_url: ANSI mode (on by default) makes
    parse_url THROW on malformed URLs, and real WARC/crawl input — the
    use case for auto-salt — routinely contains them; try_parse_url
    returns NULL and the malformed rows just group together."""
    top = (df.groupBy(F.try_parse_url(F.col('url'), F.lit('HOST')).alias('__h'))
           .agg(F.count('*').alias('__n'))
           .agg(F.max('__n').alias('m')).collect())
    return bool(top) and (top[0]['m'] or 0) > threshold


def extracted(df: DataFrame,
              payload_col: str = 'html',
              keep_payload: bool = False,
              partitions: int | None = None,
              preprocess_mode: str = 'deterministic',
              auto_salt: bool = True,
              hot_host_threshold: int | None = None) -> DataFrame:
    """Input table → + doctype, extracted_text, preprocessed_text,
    content_hash.

    NO repartition by default: shuffling raw payload bytes before the
    UDFs is a full write+read of the corpus (measured: it capped
    N→4N extraction scaling at 0.3 efficiency locally, and at 100 TB
    it would be a 100 TB shuffle). Uniform work distribution comes from
    the scan itself — `spark.sql.files.maxPartitionBytes` splits
    parquet row-groups evenly, and the url-hash bucket layout of our
    own outputs is already uniform. Pass ``partitions`` only when the
    input layout is genuinely pathological (a handful of giant
    unsplittable files).

    When ``partitions`` is passed and ``auto_salt`` is on (default),
    ``needs_salt`` probes for hot hosts first; over the threshold
    (cfg.hot_host_threshold) the repartition key becomes
    xxhash64(url, warc_ts), spreading same-url re-crawl bursts across
    tasks.  Salting only changes physical layout — every downstream
    stage (dedup agg, bucket write) keys on content, not partition."""
    fused = (extract_preprocess_udf if preprocess_mode == 'deterministic'
             else _make_extract_preprocess_udf(preprocess_mode))
    out = with_doctype(df, payload_col)
    if partitions:
        threshold = (hot_host_threshold if hot_host_threshold is not None
                     else DEFAULT_CONFIG.hot_host_threshold)
        key_cols = ['url']
        if auto_salt and 'warc_ts' in df.columns and needs_salt(df, threshold):
            key_cols.append('warc_ts')
        # repartition on the FULL-RANGE hash: repartition(n, expr)
        # applies hash(expr) % n, so wrapping the key in pmod(.., n)
        # first collapses it to n values that re-hash into ~0.63*n
        # occupied partitions (measured: 8 requested → 4 non-empty);
        # the raw 64-bit hash distributes uniformly
        out = out.repartition(partitions, F.xxhash64(*key_cols))
    out = (
        out
        .withColumn('content_hash', F.md5(F.col(payload_col)))  # D1: F.md5 == hashlib.md5 hex
        .withColumn('__ep', fused(F.col(payload_col)))
        .withColumn('extracted_text', F.col('__ep.extracted_text'))
        .withColumn('preprocessed_text', F.col('__ep.preprocessed_text'))
        .drop('__ep')
        .withColumn('is_error',
                    F.col('extracted_text').startswith('Error'))  # F3
        .withColumn('error_code', error_code_col(F.col('extracted_text')))
        .withColumn('processed_at', F.current_timestamp())
    )
    if not keep_payload:
        out = out.drop(payload_col)  # prune the binary before any shuffle
    return out
