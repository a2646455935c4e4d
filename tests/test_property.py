"""Property-based tests (hypothesis): the engine kernels agree with the
vendored reference transcription on arbitrary inputs, and the
extraction dispatch never raises."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import reference_extractor as ref
from pdf_ai_mapper_spark.kernels.extract import extract_text
from pdf_ai_mapper_spark.kernels.preprocess import (preprocess_text,
                                                    simple_categories)
from pdf_ai_mapper_spark.kernels.relevance import (generate_snippet,
                                                   relevance_score)

# text alphabet spanning every branch of the preprocess chain: latin,
# Greek/Cyrillic/CJK/Arabic (script stripping), digits, punctuation,
# hyphens, whitespace variants
_ALPHABET = st.sampled_from(
    list('abcdefghij klmnopqrstuvwxyz ABCDEFG ') +
    list('αβγδ ЖЗИ 哲学史 مرح 0123456789 .,!?;:-_()[]"\'\t\n\r') +
    ['the ', 'and ', 'data ', 'running ', 'Error', '-', '--', '  '])

_TEXT = st.lists(_ALPHABET, min_size=0, max_size=120).map(''.join)


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_preprocess_agrees_with_reference(text):
    assert preprocess_text(text) == ref.preprocess_text(text)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_simple_categories_agree_with_reference(text):
    pre = preprocess_text(text)
    assert simple_categories(pre) == ref.simple_category(pre)


_TOKENS = st.lists(
    st.text(alphabet='abcdefghij', min_size=1, max_size=8),
    min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(_TOKENS, _TEXT)
def test_relevance_agrees_with_reference(tokens, text):
    assert relevance_score(tokens, text) == ref.calculate_relevance(tokens, text)


@settings(max_examples=150, deadline=None)
@given(_TOKENS, _TEXT)
def test_snippet_agrees_with_reference(tokens, text):
    assert generate_snippet(tokens, text) == ref.generate_snippet(tokens, text)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_extract_text_total_on_arbitrary_bytes(data):
    """Extraction is a total function: any byte payload → a string,
    never an exception (errors become reference-style error strings)."""
    out = extract_text(data)
    assert isinstance(out, str)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_extract_pdf_prefix_total(data):
    out = extract_text(b'%PDF-' + data)
    assert isinstance(out, str)


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_extract_html_total_on_text(text):
    out = extract_text(('<html><body>' + text + '</body></html>').encode())
    assert isinstance(out, str)
