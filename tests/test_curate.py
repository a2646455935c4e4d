"""End-to-end corpus curation composition (operators/curate.py)."""

from __future__ import annotations

from pdf_ai_mapper_spark.operators.curate import curate_corpus

BOILER = 'cookie banner accept all'
BODY_A = 'alpha research article with substantive findings here today'
BODY_B = 'beta analysis report containing different material entirely now'


def _corpus(spark):
    rows = [
        # 1+2: same body wrapped in different chrome -> byte-equal only
        #      AFTER the chrome is stripped (stage-4 dedup catches them)
        (1, f'{BOILER}\n{BODY_A}', 'src1'),
        (2, f'{BODY_A}\n{BOILER}', 'src1'),
        # 3: distinct body, same chrome
        (3, f'{BOILER}\n{BODY_B}', 'src1'),
        # 4: numeric garbage -> quality-gated (alpha_ratio 0)
        (4, '111 222 333 444 555 666 777 888', 'src1'),
        # 5: all-boilerplate -> empty after line dedup
        (5, BOILER, 'src1'),
        # 6: byte-identical re-crawl of 3 -> stage-2 exact dedup;
        #    CRITICAL: removed BEFORE line dedup so it cannot push
        #    BODY_B's line frequency over the boilerplate threshold
        (7, f'{BOILER}\n{BODY_B}', 'src1'),
        # 8: clean doc on another source
        (6, 'gamma standalone document with unique prose content inside',
         'src2'),
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string, source string')


def test_curate_corpus_stage_composition(spark):
    # BOILER df after stage-2 dedup = 4 (docs 1,2,3,5) -> min_df=3
    # removes it; bodies (df<=2) survive
    out = curate_corpus(_corpus(spark), line_min_df=3).collect()
    ids = sorted(r['doc_id'] for r in out)
    # 4 quality-gated; 7 byte-dup of 3; 5 emptied; {1,2} chrome-dedup
    assert ids == [1, 3, 6]
    rows = {r['doc_id']: r for r in out}
    assert rows[1]['cleaned_text'] == BODY_A        # chrome stripped
    assert rows[3]['cleaned_text'] == BODY_B
    assert rows[1]['n_removed'] == 1
    assert all(r['split'] in ('train', 'val', 'test') for r in out)
    assert all(r['dup_frac'] == 0.0 for r in out)   # k=8 > body len-7


def test_curate_corpus_byte_dup_cannot_erase_content(spark):
    """The footgun the stage order prevents: a doc crawled twice must
    survive curation (as ONE copy), not have all its lines erased by
    line dedup seeing df=2."""
    rows = [(1, 'unique prose content alpha beta gamma delta', 's'),
            (2, 'unique prose content alpha beta gamma delta', 's'),
            (3, 'другой wholly different words entirely here too', 's')]
    out = curate_corpus(
        __import__('pyspark.sql', fromlist=['x']) and
        spark.createDataFrame(rows, 'doc_id long, text string, source string'),
        line_min_df=3).collect()
    ids = sorted(r['doc_id'] for r in out)
    assert 1 in ids and 2 not in ids        # one survivor, not zero


def test_curate_corpus_source_cap(spark):
    import string
    rows = [(i, 'document with plenty of distinct prose '
             + ' '.join(f'w{string.ascii_lowercase[i]}x{string.ascii_lowercase[j]}'
                        for j in range(10)), 'big')
            for i in range(20)]
    rows += [(100, 'small source doc with its own unique words here',
              'tiny')]
    df = spark.createDataFrame(rows, 'doc_id long, text string, source string')
    out = curate_corpus(df, line_min_df=5, source_cap=5).collect()
    per = {}
    for r in out:
        per[r['source']] = per.get(r['source'], 0) + 1
    assert per == {'big': 5, 'tiny': 1}


def test_curate_corpus_split_stable_across_runs(spark):
    df = _corpus(spark)
    a = {r['doc_id']: r['split'] for r in
         curate_corpus(df, line_min_df=3).collect()}
    b = {r['doc_id']: r['split'] for r in
         curate_corpus(df.repartition(4), line_min_df=3).collect()}
    assert a == b


def test_curate_corpus_model_gate_filters(spark):
    """The optional frozen-model gate (round 5) drops low-margin docs
    before any dedup stage; None (default) keeps behavior identical."""
    rows = [
        # analytic lexicon, clears the frozen model's -4700 intercept
        (0, ' '.join(['query merge vector stream scan sort'] * 6), 's'),
        # filler lexicon: negative margin, heuristics alone pass it
        (1, ' '.join(['slow dup the a small slow dup the a word'] * 6), 's'),
        # 770 units/repeat × 7 = 5390 > 4700 intercept
        (2, ' '.join(['window table column batch filter join'] * 7), 's'),
    ]
    df = spark.createDataFrame(rows, 'doc_id long, text string, source string')
    base = {r['doc_id'] for r in
            curate_corpus(df, line_min_df=99).collect()}
    gated = {r['doc_id'] for r in
             curate_corpus(df, line_min_df=99,
                           model_gate_units=0).collect()}
    assert base == {0, 1, 2}
    assert gated == {0, 2}          # the filler doc is gated out
