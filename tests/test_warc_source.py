"""WARC source (sources/warc.py) vs the write-side twin fixture."""

import datetime as dt

from pyspark.sql import functions as F

from pdf_ai_mapper_spark.fixtures.webpages import (
    build_html, build_warc, url_of, warc_ts_of)
from pdf_ai_mapper_spark.sources.warc import (
    iter_warc_records, read_warc, warc_response_rows)


def _rows(n=6):
    out = []
    for i in range(n):
        html, truth = build_html(i)
        out.append((url_of(i), warc_ts_of(i), html, truth))
    return out


def test_roundtrip_plain_and_gzip():
    rows = _rows()
    for gz in (False, True):
        data = build_warc([(u, t, h) for u, t, h, _ in rows],
                          gzip_members=gz)
        got = list(warc_response_rows(data))
        assert [g[0] for g in got] == [r[0] for r in rows]
        assert [g[1] for g in got] == [r[1] for r in rows]
        assert [g[2] for g in got] == [r[2] for r in rows]


def test_non_response_records_skipped():
    rows = _rows(3)
    data = build_warc([(u, t, h) for u, t, h, _ in rows])
    # splice in a warcinfo record up front
    info = (b'WARC/1.0\r\nWARC-Type: warcinfo\r\n'
            b'Content-Length: 9\r\n\r\nfields...\r\n\r\n')
    got = list(warc_response_rows(info + data))
    assert len(got) == 3
    assert len(list(iter_warc_records(info + data))) == 4


def test_truncated_tail_keeps_complete_records():
    rows = _rows(4)
    data = build_warc([(u, t, h) for u, t, h, _ in rows])
    assert len(list(warc_response_rows(data[:len(data) - 40]))) == 3


def test_spark_read_and_extract_byte_identity(spark, tmp_path):
    """End-to-end: WARC files on disk → read_warc → the real extraction
    transform → byte-identical main text per url."""
    from pdf_ai_mapper_spark.pipeline import transform
    rows = _rows(10)
    (tmp_path / 'seg1.warc').write_bytes(
        build_warc([(u, t, h) for u, t, h, _ in rows[:5]]))
    (tmp_path / 'seg2.warc.gz').write_bytes(
        build_warc([(u, t, h) for u, t, h, _ in rows[5:]],
                   gzip_members=True))
    pages = read_warc(spark, str(tmp_path))
    assert pages.count() == 10
    out = {r['url']: r['extracted_text']
           for r in transform(pages, run_id='warc-test').collect()}
    for u, _, _, truth in rows:
        assert out[u] == truth
