"""Independent transcription of the PUBLIC GPT-2 ``bpe()`` merge loop
(openai/gpt-2 ``src/encoder.py``, MIT-released; the same procedure as
Sennrich et al. 2016) — the parity oracle for kernels/bpe.py, kept in
the released code's shape (min-over-pair-set + index-splice) on
purpose so the two implementations share no structure, only the spec.
Per-word counts pasted into q_token_counts_bpe's SQL oracle are
computed by THIS module, never by the production kernel."""

from __future__ import annotations


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def reference_bpe(token: str, ranks) -> 'tuple[str, ...]':
    word = tuple(token)
    if len(word) <= 1:
        return word
    pairs = get_pairs(word)
    while True:
        bigram = min(pairs, key=lambda p: ranks.get(p, float('inf')))
        if bigram not in ranks:
            break
        first, second = bigram
        new_word = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            else:
                new_word.extend(word[i:j])
                i = j
            if (word[i] == first and i < len(word) - 1
                    and word[i + 1] == second):
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = tuple(new_word)
        if len(word) == 1:
            break
        pairs = get_pairs(word)
    return word


def reference_count(text: str, ranks) -> int:
    return sum(len(reference_bpe(w, ranks)) for w in text.split())
