"""Incremental MinHash index (dedup.minhash_index_update).

Contract: on a corpus without oversized buckets, the incremental pair
set for a batch equals the full-recompute pair set restricted to pairs
touching that batch — and batches are idempotent under retry.
"""

from pdf_ai_mapper_spark.operators.dedup import (
    minhash_index_update, minhash_lsh_pairs, release)


def _docs(spark, ids):
    # clusters of near-identical docs: ids 3k/3k+1 share a template,
    # 3k+2 is distinct filler
    rows = []
    for i in ids:
        base = i // 3
        words = [f'w{base}x{j}' for j in range(30)]
        if i % 3 == 1:
            words[-1] = 'tail'  # 29/31 shingle overlap → J ≈ 0.87
        elif i % 3 == 2:
            words = [f'solo{i}y{j}' for j in range(30)]
        rows.append((i, ' '.join(words)))
    return spark.createDataFrame(rows, 'doc_id long, text string')


def _pairs(df):
    got = {(r['id_a'], r['id_b'], r['jaccard_est']) for r in df.collect()}
    release(df)
    return got


def test_incremental_equals_full_restricted(spark, tmp_path):
    idx = str(tmp_path / 'mh_index')
    a_ids = list(range(0, 30))
    b_ids = list(range(30, 60))
    batch_a, batch_b = _docs(spark, a_ids), _docs(spark, b_ids)

    inc_a = {(r['id_a'], r['id_b'], r['jaccard_est'])
             for r in minhash_index_update(
                 spark, batch_a, idx, 'doc_id', 'text', 'batch-a').collect()}
    inc_b = {(r['id_a'], r['id_b'], r['jaccard_est'])
             for r in minhash_index_update(
                 spark, batch_b, idx, 'doc_id', 'text', 'batch-b').collect()}

    full = _pairs(minhash_lsh_pairs(_docs(spark, a_ids + b_ids),
                                    'doc_id', 'text'))
    bset = set(b_ids)
    full_a = {p for p in full if p[0] not in bset and p[1] not in bset}
    full_b = {p for p in full if p[0] in bset or p[1] in bset}
    assert inc_a == full_a
    assert inc_b == full_b
    assert len(full) > 0 and len(inc_b) > 0


def test_retry_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / 'mh_index')
    batch = _docs(spark, range(0, 30))
    first = {tuple(r) for r in minhash_index_update(
        spark, batch, idx, 'doc_id', 'text', 'b0').collect()}
    again = {tuple(r) for r in minhash_index_update(
        spark, batch, idx, 'doc_id', 'text', 'b0').collect()}
    assert first == again
    # index rows not duplicated: one (id, band) row per doc-band
    stored = spark.read.parquet(idx)
    assert stored.count() == stored.select('id', 'band').distinct().count()


def test_cross_batch_pairs_found(spark, tmp_path):
    idx = str(tmp_path / 'mh_index')
    # doc 0 in batch 1; its near-twin 1 arrives in batch 2
    b1 = _docs(spark, [0, 5])
    b2 = _docs(spark, [1, 8])
    minhash_index_update(spark, b1, idx, 'doc_id', 'text', 'b1').collect()
    got = {(r['id_a'], r['id_b']) for r in minhash_index_update(
        spark, b2, idx, 'doc_id', 'text', 'b2').collect()}
    assert (0, 1) in got


def test_recrawl_uses_latest_batch_signature(spark, tmp_path):
    """Same id re-indexed with different text (re-crawl): stored-sig
    collapse must deterministically keep the LATEST batch's signature
    (max_by batch_id — ADVICE r3; F.first was run-to-run dependent)."""
    idx = str(tmp_path / 'mh_index')
    text_v1 = ' '.join(f'old{j}' for j in range(30))
    text_v2 = ' '.join(f'new{j}' for j in range(30))
    b1 = spark.createDataFrame([(0, text_v1)], 'doc_id long, text string')
    b2 = spark.createDataFrame([(0, text_v2)], 'doc_id long, text string')
    minhash_index_update(spark, b1, idx, 'doc_id', 'text', 'b1').collect()
    minhash_index_update(spark, b2, idx, 'doc_id', 'text', 'b2').collect()

    # a near-twin of the v2 text must match doc 0 with a HIGH estimate
    # (vs ~0 against the v1 signature) on every run
    twin = ' '.join(f'new{j}' for j in range(29)) + ' tail'
    b3 = spark.createDataFrame([(99, twin)], 'doc_id long, text string')
    for _ in range(3):
        got = {(r['id_a'], r['id_b']): r['jaccard_est']
               for r in minhash_index_update(
                   spark, b3, idx, 'doc_id', 'text', 'b3').collect()}
        assert (0, 99) in got
        assert got[(0, 99)] > 0.5
