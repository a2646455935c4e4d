"""WARC (ISO 28500) reader — the Common-Crawl-native input format.

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; the raw material for that table is WARC segments, so a
switch-over user needs a path from ``*.warc(.gz)`` files to the
engine's ``web_pages`` shape. This module implements the public WARC
1.0/1.1 record grammar (version line, CRLF name:value headers, blank
line, ``Content-Length`` octets of block, CRLF CRLF record separator)
plus the HTTP-response framing inside ``response`` records, and wraps
it Spark-side as:

    binaryFile scan (one task per WARC file — files are ~1 GiB by
    Common Crawl convention, a natural task granule; gzip members
    chain so a mid-file split is impossible anyway)
        → mapInPandas parse (Arrow-batched, pure-Python kernel below)
        → (url, warc_ts, html) rows ready for pipeline.transform

Common Crawl WARCs are multi-member gzip (one member per record);
``gzip.decompress`` consumes concatenated members, so the same parser
serves .warc and .warc.gz. The parse kernel is a plain function over
bytes — unit-testable without Spark, and reusable from any runner.
"""

from __future__ import annotations

import gzip as _gzip
from datetime import datetime, timezone
from typing import Iterator

_GZIP_MAGIC = b'\x1f\x8b'
_CRLF2 = b'\r\n\r\n'


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, block) per WARC record in a raw or gzipped
    stream. Header names are lower-cased; malformed trailing bytes end
    iteration rather than raising (truncated fetches are routine at
    crawl scale — the caller sees every complete record)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gzip.decompress(data)  # multi-member: reads all members
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b'WARC/', pos):
            nxt = data.find(b'WARC/', pos)
            if nxt < 0:
                return
            pos = nxt
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            return
        lines = data[pos:head_end].split(b'\r\n')
        headers: dict = {}
        for ln in lines[1:]:  # lines[0] is the WARC/x.y version line
            sep = ln.find(b':')
            if sep > 0:
                headers[ln[:sep].strip().lower().decode('latin-1')] = \
                    ln[sep + 1:].strip().decode('latin-1')
        try:
            length = int(headers.get('content-length', ''))
        except ValueError:
            return
        block_start = head_end + 4
        block = data[block_start:block_start + length]
        if len(block) < length:
            return  # truncated record
        yield headers, block
        pos = block_start + length
        if data.startswith(_CRLF2, pos):
            pos += 4


def _http_body(block: bytes) -> bytes:
    """Payload of an HTTP response block (body after the header
    section); a block with no header/body separator is returned whole
    (some writers store bare payloads)."""
    sep = block.find(_CRLF2)
    return block[sep + 4:] if sep >= 0 else block


def _parse_warc_date(s: str) -> 'datetime | None':
    try:
        return (datetime.strptime(s, '%Y-%m-%dT%H:%M:%SZ')
                .replace(tzinfo=timezone.utc).replace(tzinfo=None))
    except ValueError:
        return None


def warc_response_rows(data: bytes) -> Iterator[tuple]:
    """(url, warc_ts, html) per *response* record of one WARC stream.
    Request/metadata/warcinfo records are skipped, as is any response
    without a target URI."""
    for headers, block in iter_warc_records(data):
        if headers.get('warc-type') != 'response':
            continue
        url = headers.get('warc-target-uri')
        if not url:
            continue
        yield (url, _parse_warc_date(headers.get('warc-date', '')),
               _http_body(block))


def read_warc(spark, path: str):
    """``*.warc(.gz)`` files under ``path`` → DataFrame(url string,
    warc_ts timestamp, html binary, lang string) — the engine's input
    shape minus the fixture-only ground-truth column. ``lang`` is NULL
    (WARC carries no language; run ``textstats.with_lang_id`` on the
    extracted text to fill it). One scan task per file (binaryFile
    source); parsing is an Arrow-batched mapInPandas over whole-file
    payloads, so the DataFrame feeds ``pipeline.transform`` directly."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = (spark.read.format('binaryFile')
             .option('pathGlobFilter', '*.warc*')
             .load(path)
             .select('content'))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for content in pdf['content']
                    for r in warc_response_rows(bytes(content))]
            yield pd.DataFrame(rows, columns=['url', 'warc_ts', 'html'])

    return (files.mapInPandas(
        parse, schema='url string, warc_ts timestamp, html binary')
        .withColumn('lang', F.lit(None).cast('string')))
