"""Query-side preprocessing (runs on the driver — one short string).

Mirrors ``app/core/search/query_processor.py:24-50``: lowercase (:35),
strip punctuation ``[^\\w\\s]`` (:38), tokenize (:41, deterministic
fallback = whitespace split), drop stopwords + Porter-stem (:44-48).

The reference's documented asymmetry (SURVEY.md §2.3): documents are
NOT stemmed; stemmed query tokens are substring-matched against raw
lowercased text. Reproduced, not fixed.
"""

from __future__ import annotations

import re

from .porter import stem
from .stopwords import QUERY_STOP_WORDS

_RE_PUNCT = re.compile(r'[^\w\s]')


def preprocess_query(query: str) -> list[str]:
    query = query.lower()
    query = _RE_PUNCT.sub(' ', query)
    tokens = query.split()
    return [stem(tok) for tok in tokens if tok not in QUERY_STOP_WORDS]


def is_valid_query(tokens: list[str]) -> bool:
    """reference query_processor.py:52-62"""
    return len(tokens) > 0
