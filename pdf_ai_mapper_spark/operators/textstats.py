"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All four are pure native-Catalyst column expressions — no Python in the
hot path, fully whole-stage-codegen'd, and each has an exact ANSI-SQL
equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker function words per language for the n-gram-heuristic language
# ID (public-knowledge stopword-profile approach). Deliberately small
# and pinned so the SQL oracle can repeat it verbatim.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    'en': ('the', 'and', 'of', 'to', 'is'),
    'de': ('der', 'die', 'und', 'nicht', 'das'),
    'fr': ('le', 'la', 'les', 'et', 'est'),
    'es': ('el', 'los', 'las', 'una', 'es'),
}


def _count_token(text_col: Column, word: str) -> Column:
    """Whole-word occurrence count via split-by-regex (codegen-friendly;
    identical semantics to the SQL oracle's split-based count)."""
    return F.size(F.split(F.concat(F.lit(' '), F.lower(text_col), F.lit(' ')),
                          f'[^a-z]{word}[^a-z]')) - 1


def lang_scores(text_col: Column) -> dict[str, Column]:
    return {
        lang: sum((_count_token(text_col, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def with_lang_id(df: DataFrame, text_col: str = 'text',
                 out_col: str = 'lang_pred') -> DataFrame:
    """Predicted language = argmax marker-hit count, 'und' when all
    zero. Ties break by the fixed order en > de > fr > es."""
    scores = lang_scores(F.col(text_col))
    best_lang = F.lit('und')
    best_score = F.lit(0)
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return df.withColumn(out_col, best_lang)


def with_quality(df: DataFrame, text_col: str = 'text') -> DataFrame:
    """Quality heuristics: length, alpha ratio, digit ratio, stopword
    ratio, mean word length — the standard web-corpus filters
    (C4/Gopher-style rules, public literature)."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, '[^A-Za-z]', ''))
    digit = F.length(F.regexp_replace(t, '[^0-9]', ''))
    toks = F.split(F.trim(t), r'\s+')
    n_tok = F.size(toks)
    stop_hits = sum((_count_token(t, w) for w in LANG_MARKERS['en']), F.lit(0))
    return (df
            .withColumn('n_chars_q', n)
            .withColumn('n_tokens', n_tok)
            .withColumn('alpha_ratio', F.round(alpha / F.greatest(n, F.lit(1)), 6))
            .withColumn('digit_ratio', F.round(digit / F.greatest(n, F.lit(1)), 6))
            .withColumn('stop_ratio', F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6))
            .withColumn('mean_word_len',
                        F.round((n - n_tok + 1) / F.greatest(n_tok, F.lit(1)), 6))
            .withColumn('quality_ok',
                        (F.col('alpha_ratio') > 0.6)
                        & (F.col('digit_ratio') < 0.2)
                        & (F.col('n_tokens') >= 5)))


def with_token_counts(df: DataFrame, text_col: str = 'text') -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate: count of
    alternating letter/digit/punct runs (regexp_count), a standard
    cheap proxy for tokenizer token counts."""
    t = F.col(text_col)
    return (df
            .withColumn('ws_tokens', F.size(F.split(F.trim(t), r'\s+')))
            .withColumn('bpe_ish_tokens',
                        F.regexp_count(t, F.lit(r'[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))))


def with_fingerprint(df: DataFrame, text_col: str = 'text') -> DataFrame:
    """Two content fingerprints: md5 of the whitespace-normalized
    lowercase text (robust exact-dup key, survives reflow), and a
    64-bit xxhash of the same (cheap join key)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r'\s+', ' ')
    return (df
            .withColumn('fp_md5', F.md5(F.encode(norm, 'UTF-8')))
            .withColumn('fp_xx64', F.xxhash64(norm)))
