"""Graded-window pin (ADVICE r4): the external driver hashes only the
FIRST 50 entries of __spark_entry__.queries(), so catalog() ordering is
load-bearing — an innocent dict insertion can silently push a query out
of the graded window. This test makes every window change EXPLICIT: the
list below is the intended window; edit it deliberately when swapping
queries in or out (and say why in the commit).

Queries outside the window are still value-graded every CI run by
tests/test_oracle_parity.py, which executes the FULL catalog against
every oracle_sql() entry — the window only controls what the external
driver re-verifies.
"""

from __future__ import annotations

import sys

sys.path.insert(0, '/root/repo')

# The intended graded window, in order. Round-7 state (VERDICT r6 #4:
# swap the thinnest slots for the strongest new oracles): IN — the
# planted MinHash/SimHash value oracles (q_minhash_planted,
# q_simhash_planted — the last two pairwise ops previously rows-only),
# q_gopher_dup_ngrams, q_learn_bpe, q_stupid_backoff,
# q_quality_cascade.
# OUT this round (all remain oracled at 51+, in-window cover named in
# the catalog comment): q_w1_relevance_topk, q_w5_first_event_per_user,
# q_f2_lang_filter_counts, q_a1_wordfreq_top3, q_j2_broadcast_join,
# q_emb_cosine_topk.
# Late round-7 swaps (each IN entry SUBSUMES or outweighs its OUT):
# q_cluster_keep_best IN for q_neardup_clusters (same pairs +
# recursive closure, PLUS the keep policy and a full-corpus kept-set
# md5); q_temperature_mix IN for q_token_budget_mix (derives the
# weights the latter hardcodes, then runs the same budgets + fill);
# q_script_id IN for q_f4_category_overlap (new operator family vs a
# thin arrays_overlap filter; F4 stays oracled at 51+).
# Earlier demotions (rounds 4-6) unchanged: q_stream_windowed_counts,
# q_tpch_q1_pricing_summary, q_emb_centroid_per_label,
# q_pii_redaction, q_repetition_stats, q_source_quality_gate,
# q_doc_chunking, q_hash_split.
GRADED_WINDOW = [
    'q_bloom_incremental_ingest',
    'q_cluster_keep_best',
    'q_decontamination',
    'q_unigram_logprob',
    'q_pagerank_centrality',
    'q_semantic_decontamination',
    'q_dsir_select',
    'q_model_auc',
    'q_t2_t5_normalize',
    'q_t7_meaningful_tokens',
    'q_line_dedup',
    'q_d2_dedup_first_seen',
    'q_minhash_planted',
    'q_pack_sequences',
    'q_encode_pack',
    'q_simhash_planted',
    'q_gopher_dup_ngrams',
    'q_learn_bpe',
    'q_a3_term_document_frequency',
    'q_semantic_dedup',
    'q_stupid_backoff',
    'q_substring_duplication',
    'q_substring_removal',
    'q_gopher_repetition',
    'q_ppl_buckets',
    'q_temperature_mix',
    'q_curation_pipeline',
    'q_model_quality_gate',
    'q_quality_cascade',
    'q_token_counts_bpe',
    'q_w2_search_snippets',
    'q_stream_dedup',
    'q_group_quota',
    'q_ngram_jaccard_exact',
    'q_emb_cosine_dups',
    'q_skew_salted_agg',
    'q_recrawl_upsert',
    'q_bucketed_join',
    'q_script_id',
    'q_f5_structured_semi_join',
    'q_a6_topic_type',
    'q_error_taxonomy',
    'q_search_pipeline',
    'q_tfidf_top_terms',
    'q_asof_join',
    'q_lda_categories',
    'q_bigram_lm',
    'q_sessionization',
    'q_multimodal_metadata',
    'q_ivf_ann_exact',
]


def test_graded_window_is_exactly_the_intended_50():
    import __spark_entry__ as e
    names = list(e.queries())
    assert names[:50] == GRADED_WINDOW


def test_every_windowed_query_has_a_value_oracle():
    """A window slot spent on a rows-only query is a wasted grade."""
    import __spark_entry__ as e
    oracles = set(e.oracle_sql())
    missing = [n for n in GRADED_WINDOW if n not in oracles]
    assert not missing, missing


def test_out_of_window_oracles_still_covered_internally():
    """Relocated oracles must keep their oracle_sql entries so the
    internal parity suite (full catalog) keeps value-grading them."""
    import __spark_entry__ as e
    names = list(e.queries())
    oracled_outside = [n for n in names[50:] if n in e.oracle_sql()]
    # the known residents: the oracles moved out in rounds 4-6
    for demoted in ('q_token_counts', 'q_fingerprint',
                    'q_skew_salted_counts', 'q_j1_anti_join',
                    'q_w3_topk_events', 'q_event_percentiles',
                    'q_lang_id', 'q_quality_scores', 'q_rollup_orders',
                    # round-6 demotions
                    'q_stream_windowed_counts',
                    'q_tpch_q1_pricing_summary',
                    'q_emb_centroid_per_label', 'q_pii_redaction',
                    'q_repetition_stats', 'q_source_quality_gate',
                    'q_doc_chunking', 'q_hash_split',
                    # round-7 demotions
                    'q_w1_relevance_topk', 'q_w5_first_event_per_user',
                    'q_f2_lang_filter_counts', 'q_a1_wordfreq_top3',
                    'q_j2_broadcast_join', 'q_emb_cosine_topk'):
        assert demoted in oracled_outside, demoted
    assert len(oracled_outside) >= 15
