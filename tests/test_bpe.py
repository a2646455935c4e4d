"""Exact BPE token counting (kernels/bpe.py): hand-derived goldens,
hypothesis parity against the independent GPT-2-loop transcription
(tests/reference_bpe.py), and the Spark operator."""

from __future__ import annotations

import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, '/root/repo/tests')

from pyspark.sql.functions import lit as F_lit  # noqa: E402
from reference_bpe import reference_bpe, reference_count  # noqa: E402

from pdf_ai_mapper_spark.kernels.bpe import (  # noqa: E402
    BPE_MERGES, bpe_token_count, encode_word, make_ranks)

RANKS = make_ranks()


def test_hand_derived_goldens():
    """Derived by hand from the pinned table, NOT by running either
    implementation: e.g. 'the' = t+h (rank 0) → th+e (rank 1) → 1
    symbol; 'query': (e,r) rank 3 wins before (q,u) rank 13, so
    q,u,er,y → qu,er,y → 3 symbols."""
    assert encode_word('the') == ('the',)
    assert encode_word('key') == ('key',)
    assert encode_word('query') == ('qu', 'er', 'y')
    assert encode_word('a') == ('a',)
    assert encode_word('agg') == ('a', 'gg')
    assert encode_word('scan') == ('scan',)       # s+c → sc+an chain
    assert encode_word('xyz') == ('x', 'y', 'z')  # no merges apply
    assert bpe_token_count('the query key') == 1 + 3 + 1
    assert bpe_token_count('') == 0
    assert bpe_token_count('   ') == 0


def test_ranks_are_unique_and_total():
    """'lowest rank' must be a total order — duplicate pairs in the
    table would silently shadow later ranks."""
    assert len(RANKS) == len(BPE_MERGES)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='abcdefghijklmnopqrstuvwxyz', min_size=1,
               max_size=16))
def test_word_parity_with_reference_transcription(w):
    assert encode_word(w) == reference_bpe(w, RANKS)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet='abcdehilmnorstuw', min_size=1,
                        max_size=10), max_size=8))
def test_text_parity_with_reference_transcription(words):
    text = ' '.join(words)
    assert bpe_token_count(text) == reference_count(text, RANKS)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet='abcdefghijklmnopqrstuvwxyz', min_size=1,
               max_size=16))
def test_count_bounds(w):
    n = len(encode_word(w))
    assert 1 <= n <= len(w)
    # merges only concatenate: symbols re-join to the original word
    assert ''.join(encode_word(w)) == w


def test_spark_operator_matches_kernel(spark):
    from pdf_ai_mapper_spark.operators.textstats import (
        with_exact_token_counts)
    rows = [(0, 'the query key'), (1, 'scan scan scan'),
            (2, 'xyz unmapped words'), (3, ''), (4, None)]
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    got = {r['doc_id']: r['bpe_tokens']
           for r in with_exact_token_counts(df).collect()}
    assert got[0] == bpe_token_count('the query key')
    assert got[1] == 3
    assert got[2] == bpe_token_count('xyz unmapped words')
    assert got[3] == 0
    assert got[4] is None


def test_spark_plan_single_arrow_stage(spark):
    from pdf_ai_mapper_spark.operators.textstats import (
        with_exact_token_counts)
    df = spark.range(5).withColumn('text', F_lit('the query'))
    plan = (with_exact_token_counts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count('ArrowEvalPython') == 1
    assert 'Exchange' not in plan

