"""Vendored Porter stemmer — M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980 — plus the publicly documented
"NLTK_EXTENSIONS" behavior tweaks, implemented from their published
descriptions (public knowledge), dependency-free.

The reference stems *query* tokens with ``nltk.stem.PorterStemmer``
(``app/core/search/query_processor.py:21,44-48``), whose DEFAULT mode
is NLTK_EXTENSIONS — so that mode is our default too; pass
``mode=ORIGINAL`` for the classic 1980 algorithm. The extensions that
change outputs on query-like words:

- an irregular-forms pool (``skies→sky``, ``dying→die``, ``news→news``
  …) checked before the rule steps;
- step 1a: 4-letter ``-ies`` words keep the e (``dies→die``, vs
  classic ``di``);
- step 1b: ``-ied`` handled directly (``died→die``, ``spied→spi``),
  skipping the at/bl/iz fixups;
- step 1c: ``y→i`` only when the y follows a consonant and the stem
  is longer than one letter (``say→say``, ``play→play``, vs classic
  ``sai``/``plai``; ``cry→cri`` in both);
- step 2: ``alli→al`` applied first with re-application of the step
  (``formally→formal``), ``bli→ble`` replacing the paper's
  ``abli→able`` (``possibly→possibl``), plus ``fulli→ful``
  (``carefully→care``) and ``logi→log`` measured with the ``l`` kept
  on the stem (``geology→geolog``).

Documents are never stemmed (reference asymmetry, SURVEY.md §2.3), so
stemming only shapes query token strings.
"""

from __future__ import annotations

NLTK_EXTENSIONS = 'nltk'
ORIGINAL = 'original'

# nltk.stem.porter.PorterStemmer.pool (irregular forms), NLTK_EXTENSIONS
_POOL = {
    'sky': 'sky', 'skies': 'sky',
    'dying': 'die', 'lying': 'lie', 'tying': 'tie',
    'news': 'news',
    'innings': 'inning', 'inning': 'inning',
    'outings': 'outing', 'outing': 'outing',
    'cannings': 'canning', 'canning': 'canning',
    'howe': 'howe',
    'proceed': 'proceed', 'exceed': 'exceed', 'succeed': 'succeed',
}

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


def _ends_cvc(word: str, nltk: bool = False) -> bool:
    if (len(word) >= 3
            and _is_cons(word, len(word) - 3) and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)):
        return word[-1] not in 'wxy'
    # NLTK_EXTENSIONS: a 2-letter vowel+consonant stem counts as CVC
    # (nltk.stem.porter._ends_cvc), so step 5a keeps the e in 'use'
    return (nltk and len(word) == 2
            and not _is_cons(word, 0) and _is_cons(word, 1))


_STEP2 = [
    ('ational', 'ate'), ('tional', 'tion'), ('enci', 'ence'), ('anci', 'ance'),
    ('izer', 'ize'), ('abli', 'able'), ('alli', 'al'), ('entli', 'ent'),
    ('eli', 'e'), ('ousli', 'ous'), ('ization', 'ize'), ('ation', 'ate'),
    ('ator', 'ate'), ('alism', 'al'), ('iveness', 'ive'), ('fulness', 'ful'),
    ('ousness', 'ous'), ('aliti', 'al'), ('iviti', 'ive'), ('biliti', 'ble'),
]

# NLTK_EXTENSIONS step-2 rule list (nltk.stem.porter._step2): the
# published ('abli'→'able') is swapped for ('bli'→'ble'), and
# ('fulli'→'ful') + ('logi'→'log') are appended; 'logi' measures the
# stem WITH the l (word[:-3]) so 'geo'/'theo' stems behave like
# 'archaeo'/'philo'. First matching suffix wins; a failed measure
# condition on a matched suffix stops the step (no later rule runs).
_STEP2_NLTK = [
    ('ational', 'ate'), ('tional', 'tion'), ('enci', 'ence'), ('anci', 'ance'),
    ('izer', 'ize'), ('bli', 'ble'), ('alli', 'al'), ('entli', 'ent'),
    ('eli', 'e'), ('ousli', 'ous'), ('ization', 'ize'), ('ation', 'ate'),
    ('ator', 'ate'), ('alism', 'al'), ('iveness', 'ive'), ('fulness', 'ful'),
    ('ousness', 'ous'), ('aliti', 'al'), ('iviti', 'ive'), ('biliti', 'ble'),
    ('fulli', 'ful'), ('logi', 'log'),
]


def _step2_nltk(w: str) -> str:
    """NLTK-mode step 2: the ALLI→AL rule is applied FIRST and, when it
    fires, the result runs through step 2 again (nltk.stem.porter's
    documented deviation from the 1980 paper)."""
    if w.endswith('alli') and _measure(w[:-4]) > 0:
        return _step2_nltk(w[:-4] + 'al')
    for suf, rep in _STEP2_NLTK:
        if w.endswith(suf):
            stem_part = w[:-3] if suf == 'logi' else w[:-len(suf)]
            if _measure(stem_part) > 0:
                return w[:-len(suf)] + rep
            return w
    return w

_STEP3 = [
    ('icate', 'ic'), ('ative', ''), ('alize', 'al'), ('iciti', 'ic'),
    ('ical', 'ic'), ('ful', ''), ('ness', ''),
]

_STEP4 = [
    'al', 'ance', 'ence', 'er', 'ic', 'able', 'ible', 'ant', 'ement',
    'ment', 'ent', 'ion', 'ou', 'ism', 'ate', 'iti', 'ous', 'ive', 'ize',
]


def stem(word: str, mode: str = NLTK_EXTENSIONS) -> str:
    """Stem one lowercase word. Default mode matches
    nltk.stem.PorterStemmer's default (NLTK_EXTENSIONS), which is what
    the reference's query path runs; ``mode=ORIGINAL`` is the classic
    1980 algorithm."""
    nltk = (mode == NLTK_EXTENSIONS)
    if nltk and word in _POOL:
        return _POOL[word]
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if nltk and w.endswith('ies') and len(w) == 4:
        w = w[:-1]  # dies → die
    elif w.endswith('sses'):
        w = w[:-2]
    elif w.endswith('ies'):
        w = w[:-2]
    elif w.endswith('ss'):
        pass
    elif w.endswith('s'):
        w = w[:-1]

    # Step 1b
    if nltk and w.endswith('ied'):
        w = w[:-1] if len(w) == 4 else w[:-2]  # died → die, spied → spi
    elif w.endswith('eed'):
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
            elif _measure(w) == 1 and _ends_cvc(w, nltk):
                w += 'e'

    # Step 1c
    if w.endswith('y'):
        s = w[:-1]
        if nltk:
            if len(s) > 1 and _is_cons(s, len(s) - 1):
                w = s + 'i'
        elif _has_vowel(s):
            w = s + 'i'

    # Step 2
    if nltk:
        w = _step2_nltk(w)
    else:
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
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1], nltk)):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith('l'):
        w = w[:-1]

    return w
