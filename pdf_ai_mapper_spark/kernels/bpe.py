"""Byte-pair-encoding token counting — tokenizer-faithful budgets for
chunking/quota stages (VERDICT r4 #5: `bpe_ish_tokens` is a regex
heuristic, but training-time budgets are measured in REAL tokenizer
tokens).

Algorithm: the published BPE merge procedure (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
same loop ships in the public GPT-2 encoder): a word starts as its
character sequence, and while any adjacent symbol pair appears in the
merge table, the LOWEST-rank (earliest-learned) pair is merged at all
its occurrences. The token count of a text is the sum of final symbol
counts over its whitespace words.

The merge table here is PINNED IN-REPO (like kernels/stopwords.py):
a small character-level table over common English letter pairs and
the corpus lexicon, chosen so kernels stay dependency-free. The
counter is table-agnostic — on a real deployment, load a published
``merges.txt`` (e.g. GPT-2's 50k merges) into ``make_ranks`` and
nothing else changes. Divergences from GPT-2 proper, documented:
character-level (not byte-level with the Ġ space marker) and
whitespace pre-tokenization (not GPT-2's contraction regex) — the
merge LOOP, which is the part budgets depend on, is exact.

Determinism contract: pure per-row function of (text, table); the
per-word memo is an optimization only. Tie-break note: ranks are
unique by construction (dict position), so "lowest rank" is total —
no tie nondeterminism.

Parity: tests/reference_bpe.py carries an INDEPENDENT transcription
of the public GPT-2 ``bpe()`` loop shape; hypothesis drives both on
random strings (tests/test_bpe.py), and the SQL oracle for
q_token_counts_bpe uses per-word counts computed by that reference,
not by this kernel.
"""

from __future__ import annotations

from functools import lru_cache

# Pinned merge table, rank = list position (earlier = merged first).
# One changed/reordered pair changes counts corpus-wide.
BPE_MERGES: 'tuple[tuple[str, str], ...]' = (
    ('t', 'h'), ('th', 'e'), ('i', 'n'), ('e', 'r'), ('a', 'n'),
    ('o', 'n'), ('a', 't'), ('o', 'r'), ('s', 't'), ('a', 'r'),
    ('l', 'e'), ('r', 'o'), ('c', 'o'), ('q', 'u'), ('qu', 'e'),
    ('d', 'a'), ('da', 't'), ('dat', 'a'), ('k', 'e'), ('ke', 'y'),
    ('u', 'e'), ('g', 'g'), ('o', 'w'), ('a', 's'), ('u', 'p'),
    ('l', 'u'), ('in', 'e'), ('b', 'le'), ('al', 'l'), ('a', 'l'),
    ('m', 'er'), ('mer', 'g'), ('s', 'm'), ('b', 'at'), ('bat', 'c'),
    ('p', 'ar'), ('s', 'c'), ('sc', 'an'), ('f', 'il'), ('i', 'l'),
)


def make_ranks(merges=BPE_MERGES) -> 'dict[tuple[str, str], int]':
    return {pair: i for i, pair in enumerate(merges)}

_RANKS = make_ranks()


def encode_word(word: str, ranks: 'dict[tuple[str, str], int]' = _RANKS
                ) -> 'tuple[str, ...]':
    """Apply the BPE merge loop to one word; returns the final symbol
    tuple. Rank-scan shape: repeatedly find the best-ranked adjacent
    pair and splice all its occurrences (left-to-right)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        a, b = best_pair
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def learn_merges(word_counts: 'dict[str, int]',
                 num_merges: int) -> 'tuple[tuple[str, str], ...]':
    """The published BPE LEARNING step (Sennrich et al. 2016 §3.2,
    public algorithm): repeatedly find the adjacent symbol pair with
    the highest frequency-weighted count over the vocabulary and merge
    it everywhere. Operates on a word-frequency dict — the algorithm
    never needs the corpus itself, only its Zipf vocabulary, which is
    what makes the Spark wrapper one aggregate at any scale.

    Determinism pinned (the published code leaves ties arbitrary):
    highest count first, then LEXICOGRAPHICALLY SMALLEST pair. Stops
    early when the best pair's count is < 2 (merging a once-seen pair
    buys nothing and would make goldens input-order-fragile)."""
    vocab: 'dict[str, tuple[tuple[str, ...], int]]' = {
        w: (tuple(w), int(c)) for w, c in word_counts.items() if w}
    merges: 'list[tuple[str, str]]' = []
    for _ in range(num_merges):
        pairs: 'dict[tuple[str, str], int]' = {}
        for syms, c in vocab.values():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for w, (syms, c) in vocab.items():
            if len(syms) > 1:
                out = []
                i = 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            new_vocab[w] = (syms, c)
        vocab = new_vocab
    return tuple(merges)


# ---- encode-to-ids (round 6) ----
#
# Vocabulary rule, deterministic and total: a single-character symbol's
# id is its Unicode code point (so ANY character — including the zh
# fixtures' Han text — encodes without an <unk>); each merge's output
# symbol gets MERGE_ID_BASE + its first-forming rank. MERGE_ID_BASE
# sits just past the Unicode range (0x110000), so the two id spaces
# cannot collide. Table-agnostic like the counter: loading a published
# merges.txt changes the table, not the rule.
MERGE_ID_BASE = 0x110000


def make_vocab(merges=BPE_MERGES) -> 'dict[str, int]':
    """Multi-char symbol-string → id (single chars map via ord()).
    setdefault keeps the FIRST forming rank if two merges concatenate
    to the same string — deterministic under any table."""
    vocab: 'dict[str, int]' = {}
    for i, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, MERGE_ID_BASE + i)
    return vocab

_VOCAB = make_vocab()


def symbol_id(sym: str, vocab: 'dict[str, int]' = _VOCAB) -> int:
    """Total by construction: every multi-char symbol a merge loop can
    emit is some merge's concatenation, so the lookup cannot miss."""
    if len(sym) == 1:
        return ord(sym)
    return vocab[sym]


@lru_cache(maxsize=1 << 16)
def _word_ids(word: str) -> 'tuple[int, ...]':
    return tuple(symbol_id(s) for s in encode_word(word))


def bpe_encode_ids(text: str) -> 'list[int]':
    """Exact token-ID sequence of ``text`` under the pinned table —
    the loader-facing twin of ``bpe_token_count`` (same merge loop,
    same whitespace pre-tokenization, ids instead of counts; no space
    marker, the documented divergence from GPT-2's byte-level Ġ).
    ``len(bpe_encode_ids(t)) == bpe_token_count(t)`` by construction."""
    if not text:
        return []
    out: 'list[int]' = []
    for w in text.split():
        out.extend(_word_ids(w))
    return out


@lru_cache(maxsize=1 << 16)
def _count_word(word: str) -> int:
    return len(encode_word(word))


def bpe_token_count(text: str) -> int:
    """Exact token count of ``text`` under the pinned table. Per-word
    memo: web corpora follow Zipf, so the cache hit rate is ~the mass
    of the head vocabulary (the closed-lexicon fixtures hit ~100%)."""
    if not text:
        return 0
    return sum(_count_word(w) for w in text.split())
