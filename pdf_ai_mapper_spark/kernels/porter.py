"""Vendored Porter stemmer — M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980. Implemented from the published
algorithm (public knowledge), dependency-free.

The reference stems *query* tokens with ``nltk.stem.PorterStemmer``
(``app/core/search/query_processor.py:21,44-48``). NLTK's class adds
small "NLTK_EXTENSIONS" tweaks on top of the 1980 algorithm; we
implement the classic algorithm, which agrees with NLTK on ordinary
English query terms. Documents are never stemmed (reference asymmetry,
SURVEY.md §2.3), so stemming only shapes query token strings.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == 'y':
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m in [C](VC){m}[V]."""
    forms = []
    for i in range(len(stem)):
        forms.append('c' if _is_cons(stem, i) else 'v')
    s = ''.join(forms)
    m = 0
    i = 0
    # skip initial consonant run
    while i < len(s) and s[i] == 'c':
        i += 1
    while i < len(s):
        # vowel run
        while i < len(s) and s[i] == 'v':
            i += 1
        if i >= len(s):
            break
        # consonant run → one VC
        while i < len(s) and s[i] == 'c':
            i += 1
        m += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if (_is_cons(word, len(word) - 3) and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)):
        return word[-1] not in 'wxy'
    return False


_STEP2 = [
    ('ational', 'ate'), ('tional', 'tion'), ('enci', 'ence'), ('anci', 'ance'),
    ('izer', 'ize'), ('abli', 'able'), ('alli', 'al'), ('entli', 'ent'),
    ('eli', 'e'), ('ousli', 'ous'), ('ization', 'ize'), ('ation', 'ate'),
    ('ator', 'ate'), ('alism', 'al'), ('iveness', 'ive'), ('fulness', 'ful'),
    ('ousness', 'ous'), ('aliti', 'al'), ('iviti', 'ive'), ('biliti', 'ble'),
]

_STEP3 = [
    ('icate', 'ic'), ('ative', ''), ('alize', 'al'), ('iciti', 'ic'),
    ('ical', 'ic'), ('ful', ''), ('ness', ''),
]

_STEP4 = [
    'al', 'ance', 'ence', 'er', 'ic', 'able', 'ible', 'ant', 'ement',
    'ment', 'ent', 'ion', 'ou', 'ism', 'ate', 'iti', 'ous', 'ive', 'ize',
]


def stem(word: str) -> str:
    """Stem one lowercase word with the classic Porter algorithm."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith('sses'):
        w = w[:-2]
    elif w.endswith('ies'):
        w = w[:-2]
    elif w.endswith('ss'):
        pass
    elif w.endswith('s'):
        w = w[:-1]

    # Step 1b
    if w.endswith('eed'):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith('ed') and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith('ing') and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(('at', 'bl', 'iz')):
                w += 'e'
            elif _ends_double_cons(w) and not w.endswith(('l', 's', 'z')):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += 'e'

    # Step 1c
    if w.endswith('y') and _has_vowel(w[:-1]):
        w = w[:-1] + 'i'

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem_part = w[:-len(suf)]
            if _measure(stem_part) > 1:
                if suf == 'ion' and not stem_part.endswith(('s', 't')):
                    pass
                else:
                    w = stem_part
            break

    # Step 5a
    if w.endswith('e'):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith('l'):
        w = w[:-1]

    return w
