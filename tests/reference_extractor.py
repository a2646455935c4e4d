"""Vendored single-node reference implementation — the parity oracle.

A deliberately *independent*, near-verbatim transcription of the
reference's deterministic code paths (SURVEY.md §5.2 item 1), kept
separate from the engine's kernels so tests compare two
implementations, not one with itself:

- ``preprocess_text``: ``/root/reference/app/core/text_processing/
  text_preprocessor.py:95-177`` with the NLTK-absent fallbacks
  (:29-39 stopwords, :125-129 tokenize).
- ``calculate_relevance``: ``relevance_calculator.py:14-41``.
- ``generate_snippet``: ``snippet_generator.py:16-62``.
"""

from __future__ import annotations

import re
from collections import Counter

_BASIC = {
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you', 'your', 'yours',
    'yourself', 'yourselves', 'he', 'him', 'his', 'himself', 'she', 'her', 'hers',
    'herself', 'it', 'its', 'itself', 'they', 'them', 'their', 'theirs', 'themselves',
    'what', 'which', 'who', 'whom', 'this', 'that', 'these', 'those', 'am', 'is', 'are',
    'was', 'were', 'be', 'been', 'being', 'have', 'has', 'had', 'having', 'do', 'does',
    'did', 'doing', 'a', 'an', 'the', 'and', 'but', 'if', 'or', 'because', 'as', 'until',
    'while', 'of', 'at', 'by', 'for', 'with', 'through', 'during', 'before', 'after',
    'above', 'below', 'up', 'down', 'in', 'out', 'on', 'off', 'over', 'under', 'again',
    'further', 'then', 'once',
}

_ADDITIONAL = {
    'said', 'says', 'would', 'could', 'should', 'might', 'may', 'must', 'shall', 'will',
    'can', 'cannot', 'couldnt', 'wouldnt', 'shouldnt', 'dont', 'doesnt', 'didnt', 'wont', 'cant',
    'shant', 'aint', 'arent', 'isnt', 'wasnt', 'werent', 'havent', 'hasnt', 'hadnt',
    'do', 'does', 'did', 'done', 'doing', 'go', 'goes', 'went', 'gone', 'going',
    'get', 'gets', 'got', 'gotten', 'getting', 'come', 'comes', 'came', 'coming',
    'see', 'sees', 'saw', 'seen', 'seeing', 'know', 'knows', 'knew', 'known', 'knowing',
    'think', 'thinks', 'thought', 'thinking', 'make', 'makes', 'made', 'making',
    'take', 'takes', 'took', 'taken', 'taking', 'give', 'gives', 'gave', 'given', 'giving',
    'find', 'finds', 'found', 'finding', 'look', 'looks', 'looked', 'looking',
    'use', 'uses', 'used', 'using', 'work', 'works', 'worked', 'working',
    'call', 'calls', 'called', 'calling', 'try', 'tries', 'tried', 'trying',
    'ask', 'asks', 'asked', 'asking', 'need', 'needs', 'needed', 'needing',
    'feel', 'feels', 'felt', 'feeling', 'become', 'becomes', 'became', 'becoming',
    'leave', 'leaves', 'left', 'leaving', 'put', 'puts', 'putting',
    'tell', 'tells', 'told', 'telling', 'seem', 'seems', 'seemed', 'seeming',
    'let', 'lets', 'letting', 'help', 'helps', 'helped', 'helping',
    'keep', 'keeps', 'kept', 'keeping', 'turn', 'turns', 'turned', 'turning',
    'start', 'starts', 'started', 'starting', 'show', 'shows', 'showed', 'showing',
    'hear', 'hears', 'heard', 'hearing', 'play', 'plays', 'played', 'playing',
    'run', 'runs', 'ran', 'running', 'move', 'moves', 'moved', 'moving',
    'live', 'lives', 'lived', 'living', 'believe', 'believes', 'believed', 'believing',
    'hold', 'holds', 'held', 'holding', 'bring', 'brings', 'brought', 'bringing',
    'happen', 'happens', 'happened', 'happening', 'write', 'writes', 'wrote', 'written', 'writing',
    'provide', 'provides', 'provided', 'providing', 'sit', 'sits', 'sat', 'sitting',
    'stand', 'stands', 'stood', 'standing', 'lose', 'loses', 'lost', 'losing',
    'pay', 'pays', 'paid', 'paying', 'meet', 'meets', 'met', 'meeting',
    'include', 'includes', 'included', 'including', 'continue', 'continues', 'continued', 'continuing',
    'set', 'sets', 'setting', 'learn', 'learns', 'learned', 'learning',
    'change', 'changes', 'changed', 'changing', 'lead', 'leads', 'led', 'leading',
    'understand', 'understands', 'understood', 'understanding',
    'watch', 'watches', 'watched', 'watching', 'follow', 'follows', 'followed', 'following',
    'stop', 'stops', 'stopped', 'stopping', 'create', 'creates', 'created', 'creating',
    'speak', 'speaks', 'spoke', 'spoken', 'speaking', 'read', 'reads', 'reading',
    'allow', 'allows', 'allowed', 'allowing', 'add', 'adds', 'added', 'adding',
    'spend', 'spends', 'spent', 'spending', 'grow', 'grows', 'grew', 'grown', 'growing',
    'open', 'opens', 'opened', 'opening', 'walk', 'walks', 'walked', 'walking',
    'win', 'wins', 'won', 'winning', 'offer', 'offers', 'offered', 'offering',
    'remember', 'remembers', 'remembered', 'remembering', 'love', 'loves', 'loved', 'loving',
    'consider', 'considers', 'considered', 'considering', 'appear', 'appears', 'appeared', 'appearing',
    'buy', 'buys', 'bought', 'buying', 'wait', 'waits', 'waited', 'waiting',
    'serve', 'serves', 'served', 'serving', 'die', 'dies', 'died', 'dying',
    'send', 'sends', 'sent', 'sending', 'expect', 'expects', 'expected', 'expecting',
    'build', 'builds', 'built', 'building', 'stay', 'stays', 'stayed', 'staying',
    'fall', 'falls', 'fell', 'fallen', 'falling', 'cut', 'cuts', 'cutting',
    'reach', 'reaches', 'reached', 'reaching', 'kill', 'kills', 'killed', 'killing',
    'remain', 'remains', 'remained', 'remaining', 'suggest', 'suggests', 'suggested', 'suggesting',
    'raise', 'raises', 'raised', 'raising', 'pass', 'passes', 'passed', 'passing',
    'sell', 'sells', 'sold', 'selling', 'require', 'requires', 'required', 'requiring',
    'report', 'reports', 'reported', 'reporting', 'decide', 'decides', 'decided', 'deciding',
    'pull', 'pulls', 'pulled', 'pulling', 'like', 'ofthe', 'things', 'posterior', 'anterior', 'surface',
}

STOP_WORDS = _BASIC | _ADDITIONAL


def preprocess_text(text: str) -> str:
    """Transcription of text_preprocessor.py:95-153 (fallback paths)."""
    if text.startswith("Error:"):
        return text
    text = text.lower()
    text = re.sub(r'[Ͱ-Ͽἀ-῿]', ' ', text)
    text = re.sub(r'[Ѐ-ӿ]', ' ', text)
    text = re.sub(r'[一-鿿]', ' ', text)
    text = re.sub(r'[؀-ۿ]', ' ', text)
    text = re.sub(r'[^\w\s-]', ' ', text)
    text = re.sub(r'\d+', ' ', text)
    text = re.sub(r'\s+', ' ', text).strip()
    tokens = text.split()
    pos_tags = [(token, 'NN') for token in tokens]
    meaningful_tokens = []
    for token, pos in pos_tags:
        if (pos.startswith('NN') or pos.startswith('JJ') or pos.startswith('VB')) and \
           len(token) >= 3 and \
           token not in STOP_WORDS and \
           not token.isdigit():
            meaningful_tokens.append(token)
    key_phrases = _extract_key_phrases(meaningful_tokens)
    all_terms = meaningful_tokens + key_phrases
    return ' '.join(all_terms)


def _extract_key_phrases(tokens):
    """Transcription of text_preprocessor.py:155-177."""
    bigram_phrases = []
    for i in range(len(tokens) - 1):
        bigram = (tokens[i], tokens[i + 1])
        if len(bigram[0]) >= 3 and len(bigram[1]) >= 3:
            bigram_phrases.append(' '.join(bigram))
    trigram_phrases = []
    for i in range(len(tokens) - 2):
        trigram = (tokens[i], tokens[i + 1], tokens[i + 2])
        if all(len(word) >= 3 for word in trigram):
            trigram_phrases.append(' '.join(trigram))
    all_phrases = bigram_phrases + trigram_phrases
    phrase_counts = Counter(all_phrases)
    return [phrase for phrase, count in phrase_counts.most_common(20) if count >= 2]


def calculate_relevance(query_tokens, document_text) -> int:
    """Transcription of relevance_calculator.py:14-41."""
    document_text = document_text.lower()
    score = 0
    for token in query_tokens:
        count = document_text.count(token)
        score += count
        if len(query_tokens) > 1:
            phrase = ' '.join(query_tokens)
            if phrase in document_text:
                score += 10
    return score


def generate_snippet(query_tokens, text, snippet_length=200) -> str:
    """Transcription of snippet_generator.py:16-62."""
    text = text.lower()
    best_pos = 0
    highest_count = 0
    for i in range(0, len(text) - snippet_length, 50):
        window = text[i:i + snippet_length]
        count = sum(window.count(token) for token in query_tokens)
        if count > highest_count:
            highest_count = count
            best_pos = i
    if highest_count == 0:
        snippet = text[:snippet_length]
        best_pos = 0
    else:
        snippet = text[best_pos:best_pos + snippet_length]
    snippet = snippet.replace('\n', ' ')
    snippet = re.sub(r'\s+', ' ', snippet).strip()
    if best_pos > 0:
        snippet = f"...{snippet}"
    if best_pos + snippet_length < len(text):
        snippet = f"{snippet}..."
    return snippet


def simple_category(preprocessed_text: str) -> list:
    """Transcription of category_manager.py:89-114 (_create_simple_category)."""
    words = preprocessed_text.split()
    common_words = [word for word in words if len(word) >= 4]
    if common_words:
        word_counts = Counter(common_words)
        top_words = [word for word, count in word_counts.most_common(3)]
        if top_words:
            return [f"Topic: {', '.join(top_words)}"]
    return ["Uncategorized"]
