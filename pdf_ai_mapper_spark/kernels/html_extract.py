"""HTML main-content extraction: DOM tokenizer + boilerplate classifier.

This is the new capability the north rule mandates (the reference only
handles PDF/images; its extraction stage is
``app/core/text_extraction/*``).  Design follows the published
readability / boilerplate-detection literature (Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010; the
arc90 Readability heuristic): parse the element tree, compute per-block
text length / link density, score candidate containers by the text mass
of their low-link-density paragraph blocks, emit the winning
container's paragraphs.

Deterministic and pure: same bytes in → same text out, independent of
partitioning.  Implemented on stdlib ``html.parser`` only (lxml/bs4
absent in the runtime).
"""

from __future__ import annotations

import re
from html import unescape as _unescape_ref
from html.parser import HTMLParser

# Elements whose entire subtree is dropped before analysis.
_STRIP_TAGS = frozenset({'script', 'style', 'noscript', 'template', 'svg', 'iframe', 'form', 'button'})
# Void elements (never pushed on the open-element stack).
_VOID_TAGS = frozenset({'br', 'img', 'hr', 'meta', 'link', 'input', 'area', 'base', 'col', 'embed', 'source', 'track', 'wbr'})
# Paragraph-level text blocks that can contribute content.
_BLOCK_TAGS = frozenset({'p', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6', 'li', 'pre', 'blockquote', 'td', 'dd', 'dt', 'figcaption'})
# Containers that can be elected as the main-content root.
_CANDIDATE_TAGS = frozenset({'div', 'article', 'section', 'main', 'td', 'body', 'html'})
# Semantic boost/penalty (readability-style class/tag weighting).
_POSITIVE_TAGS = frozenset({'article', 'main'})
_NEGATIVE_TAGS = frozenset({'nav', 'aside', 'header', 'footer', 'menu'})

_MIN_BLOCK_CHARS = 25       # blocks shorter than this score nothing
_MAX_LINK_DENSITY = 0.33    # blocks more linky than this are boilerplate


class _Node:
    __slots__ = ('tag', 'parent', 'children', 'order')

    def __init__(self, tag: str, parent: '_Node | None', order: int):
        self.tag = tag
        self.parent = parent
        self.children: list = []  # _Node | str
        self.order = order


class _TreeBuilder(HTMLParser):
    """Tokenize HTML into a lightweight element tree, dropping
    _STRIP_TAGS subtrees and comments."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node('#root', None, 0)
        self._stack = [self.root]
        self._skip_depth = 0
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in _STRIP_TAGS:
                self._skip_depth += 1
            return
        if tag in _STRIP_TAGS:
            self._skip_depth = 1
            return
        if tag in _VOID_TAGS:
            return
        self._order += 1
        node = _Node(tag, self._stack[-1], self._order)
        self._stack[-1].children.append(node)
        self._stack.append(node)

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in _STRIP_TAGS:
                self._skip_depth -= 1
            return
        if tag in _VOID_TAGS or tag in _STRIP_TAGS:
            return
        # close the nearest matching open element (tolerates misnesting)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._stack[-1].children.append(data)


_TAG_RE = re.compile(
    r'<(?:'
    r'(?P<end>/)?(?P<name>[a-zA-Z][a-zA-Z0-9-]*)'
    r'(?P<attrs>(?:"[^"]*"|\'[^\']*\'|[^>"\'])*)'
    r'|(?P<bang>![^>]*)'
    r'|(?P<pi>\?[^>]*)'
    r')>')
_COMMENT_END = '-->'
# match html.parser semantics: CDATA_CONTENT_ELEMENTS = script, style
_RAWTEXT_TAGS = ('script', 'style')


_NAME_CHARS = frozenset(
    'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-')
# Per-worker memo tables: pages reuse a small tag vocabulary, so the
# per-tag string parse collapses to one dict hit. Bounded (reset at
# 4096 entries) so exotic corpora can't grow them without limit.
_END_SEG_CACHE: dict[str, 'str | None'] = {}
_START_SEG_CACHE: dict[str, 'tuple[str, bool] | None'] = {}


def _end_seg_tag(seg: str) -> 'str | None':
    """``</{seg}>`` → tag when seg is exactly a valid name (the common
    case); None falls back to the regex path. Mirrors _TAG_RE: name =
    alpha then [a-zA-Z0-9-]*; a pure name has no attrs part."""
    try:
        return _END_SEG_CACHE[seg]
    except KeyError:
        pass
    tag = None
    if seg and seg[0].isalpha() and all(c in _NAME_CHARS for c in seg):
        tag = seg.lower()
    if len(_END_SEG_CACHE) > 4096:
        _END_SEG_CACHE.clear()
    _END_SEG_CACHE[seg] = tag
    return tag


def _start_seg_parse(seg: str) -> 'tuple[str, bool] | None':
    """``<{seg}>`` → (tag, self_closing) for QUOTE-FREE segs starting
    with a letter. Provably equivalent to _TAG_RE on such segs: the
    attrs class ``(?:"…"|'…'|[^>"'])*`` excludes only quotes and '>',
    so with no quotes present the regex consumes name + rest exactly
    to the first '>' — which is how seg was sliced. Quote-bearing
    tags (a '>' may hide inside) return None → regex path."""
    out = _START_SEG_CACHE.get(seg)
    if out is not None:
        return out
    if '"' in seg or "'" in seg:
        # a '>' may hide inside quotes → regex path. NOT cached:
        # href/src-bearing segs are near-unique per page, and caching
        # them churned the memo past its reset bound, evicting the hot
        # pure-name entries every few pages (measured on link-heavy
        # corpora: the cache hit rate collapsed to ~0)
        return None
    i = 1
    m = len(seg)
    while i < m and seg[i] in _NAME_CHARS:
        i += 1
    out = (seg[:i].lower(), seg.rstrip().endswith('/'))
    if i >= m - 1:
        # pure name (or name + '/'): finite tag vocabulary → memoize.
        # Quote-free attr-bearing segs are parsed each time instead —
        # the char loop is cheap and they are unbounded-variety.
        if len(_START_SEG_CACHE) > 4096:
            _START_SEG_CACHE.clear()
        _START_SEG_CACHE[seg] = out
    return out


def _fast_tree(html: str) -> _Node:
    """Regex-scanner tokenizer building the same element tree as
    _TreeBuilder, ~4× faster than stdlib html.parser on typical pages
    (plus memoized string fast paths for the quote-free tags that
    dominate real markup — see tests/test_kernels.py's fast-vs-stdlib
    equivalence suite). Handles comments, doctype, raw-text elements
    (script/style consume until their end tag), void/self-closing
    tags, misnested end tags, and character references (html.unescape
    on '&'-bearing text). Raises on structures it cannot scan — caller
    falls back to the stdlib tokenizer."""
    root = _Node('#root', None, 0)
    stack = [root]
    order = 0
    pos = 0
    n = len(html)
    find = html.find
    low = None  # html.lower(), computed at most once (was once PER
    #             script/style tag — O(tags·n) on script-heavy pages)
    while pos < n:
        lt = find('<', pos)
        if lt < 0:
            text = html[pos:]
            if text:
                stack[-1].children.append(
                    _unescape(text) if '&' in text else text)
            break
        if lt > pos:
            text = html[pos:lt]
            stack[-1].children.append(
                _unescape(text) if '&' in text else text)

        tag = None
        self_closing = False
        c = html[lt + 1:lt + 2]
        if c == '/':
            gt = find('>', lt + 2)
            if gt >= 0:
                etag = _end_seg_tag(html[lt + 2:gt])
                if etag is not None:
                    for i in range(len(stack) - 1, 0, -1):
                        if stack[i].tag == etag:
                            del stack[i:]
                            break
                    pos = gt + 1
                    continue
            nxt = html[lt + 2:lt + 3]
            if not (nxt.isascii() and nxt.isalpha()):
                # html.parser: '</>' is silently consumed and '</' +
                # any other non-ASCII-letter ('</中文>', '</123>') is a
                # bogus comment eaten through the next '>' — neither
                # emits text. A '</'-garbage tail with no '>' at all is
                # parser-state-dependent: raise → stdlib fallback.
                if gt >= 0:
                    pos = gt + 1
                    continue
                raise ValueError('unterminated </ at end of input')
        elif c.isascii() and c.isalpha():
            # ASCII guard required: _TAG_RE and stdlib html.parser only
            # accept [a-zA-Z] tag names, but str.isalpha() is Unicode-
            # aware — '<中文>' must stay text, not become an element

            gt = find('>', lt + 1)
            if gt >= 0:
                parsed = _start_seg_parse(html[lt + 1:gt])
                if parsed is not None:
                    tag, self_closing = parsed
                    pos = gt + 1
        if tag is None:
            if html.startswith('<!--', lt):
                end = find(_COMMENT_END, lt + 4)
                pos = (end + 3) if end >= 0 else n
                continue
            m = _TAG_RE.match(html, lt)
            if m is None:
                # stray '<' — treat as text, as html.parser does
                stack[-1].children.append('<')
                pos = lt + 1
                continue
            pos = m.end()
            name = m.group('name')
            if name is None:  # <!doctype>, <?pi>
                continue
            tag = name.lower()
            if m.group('end'):
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == tag:
                        del stack[i:]
                        break
                continue
            attrs = m.group('attrs') or ''
            self_closing = attrs.rstrip().endswith('/')
        if tag in _RAWTEXT_TAGS and not self_closing:
            if low is None:
                low = html.lower()
            close = low.find(f'</{tag}', pos)
            raw = html[pos:close] if close >= 0 else html[pos:]
            if close >= 0:
                gt = find('>', close)
                pos = (gt + 1) if gt >= 0 else n
            else:
                pos = n
            if tag not in _STRIP_TAGS:
                order += 1
                node = _Node(tag, stack[-1], order)
                node.children.append(raw)
                stack[-1].children.append(node)
            continue
        if tag in _STRIP_TAGS:
            # non-rawtext stripped subtree (nav-like strip tags are not
            # in _STRIP_TAGS; these are all rawtext or empty-ish) —
            # scan to the matching end tag at depth 1
            depth = 1
            scan = pos
            if low is None:
                low = html.lower()
            while depth and scan < n:
                nxt_open = low.find(f'<{tag}', scan)
                nxt_close = low.find(f'</{tag}', scan)
                if nxt_close < 0:
                    scan = n
                    break
                if 0 <= nxt_open < nxt_close:
                    depth += 1
                    scan = nxt_open + len(tag) + 1
                else:
                    depth -= 1
                    scan = nxt_close + len(tag) + 2
            gt = find('>', scan)
            pos = (gt + 1) if gt >= 0 else n
            continue
        if tag in _VOID_TAGS or self_closing:
            continue
        order += 1
        node = _Node(tag, stack[-1], order)
        stack[-1].children.append(node)
        stack.append(node)
    return root


_unescape = _unescape_ref


def _collect_text(node: _Node, out: list[str], link_out: list[str], in_link: bool) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(child)
            if in_link:
                link_out.append(child)
        else:
            _collect_text(child, out, link_out, in_link or child.tag == 'a')


def _block_stats(node: _Node) -> tuple[str, int, float]:
    """(normalized text, text_len, link_density) for one block element."""
    parts: list[str] = []
    link_parts: list[str] = []
    _collect_text(node, parts, link_parts, False)
    text = ' '.join(''.join(parts).split()) if parts else ''
    n = len(text)
    if not n or not link_parts:  # link-free blocks skip the second pass
        return text, n, 0.0
    link_text = ' '.join(''.join(link_parts).split())
    return text, n, len(link_text) / n


def _iter_blocks(node: _Node, blocks: list) -> None:
    """Document-order traversal collecting paragraph-level block nodes.
    A block element's subtree is not descended further (its inline
    content belongs to it)."""
    for child in node.children:
        if isinstance(child, str):
            continue
        if child.tag in _BLOCK_TAGS:
            blocks.append(child)
        else:
            _iter_blocks(child, blocks)


def _candidate_of(block: _Node) -> '_Node | None':
    """Nearest enclosing candidate container (grandparent fallback,
    readability-style: score the parent; divs directly holding text
    score themselves)."""
    anc = block.parent
    while anc is not None:
        if anc.tag in _CANDIDATE_TAGS or anc.tag in _POSITIVE_TAGS:
            return anc
        if anc.tag in _NEGATIVE_TAGS:
            return anc  # keeps boilerplate mass out of real candidates
        anc = anc.parent
    return None


def _block_score(text: str, n: int, link_density: float) -> float:
    if n < _MIN_BLOCK_CHARS or link_density > _MAX_LINK_DENSITY:
        return 0.0
    # readability-style: base + commas + capped length bonus
    return (1.0 + text.count(',') + min(n / 100.0, 3.0)) * (1.0 - link_density)


def extract_main_text(html: str) -> str:
    """Extract main-content text from an HTML document.

    Returns block texts (whitespace-normalized) of the best-scoring
    container, joined with ``"\\n\\n"``; empty string when no content
    block survives the classifier.
    """
    try:
        root = _fast_tree(html)
    except Exception:
        # fast scanner choked — fall back to the tolerant stdlib parser
        builder = _TreeBuilder()
        try:
            builder.feed(html)
            builder.close()
        except Exception:
            return ""
        root = builder.root

    blocks: list[_Node] = []
    _iter_blocks(root, blocks)
    if not blocks:
        return ""

    stats = {id(b): _block_stats(b) for b in blocks}
    cands = {id(b): _candidate_of(b) for b in blocks}  # ancestor walk once

    # Score candidate containers by the mass of their good blocks.
    scores: dict[int, float] = {}
    cand_nodes: dict[int, _Node] = {}
    for b in blocks:
        text, n, ld = stats[id(b)]
        s = _block_score(text, n, ld)
        if s <= 0.0:
            continue
        cand = cands[id(b)]
        if cand is None:
            continue
        key = id(cand)
        cand_nodes[key] = cand
        bonus = 1.0
        if cand.tag in _POSITIVE_TAGS:
            bonus = 1.5
        elif cand.tag in _NEGATIVE_TAGS:
            bonus = 0.0
        scores[key] = scores.get(key, 0.0) + s * bonus

    best = None
    best_score = 0.0
    for key, sc in scores.items():
        node = cand_nodes[key]
        if sc > best_score or (sc == best_score and best is not None and node.order < best.order):
            best, best_score = node, sc
    if best is None or best_score <= 0.0:
        return ""

    # Emit the winner's own good blocks in document order.
    out: list[str] = []
    for b in blocks:
        if cands[id(b)] is not best:
            continue
        text, n, ld = stats[id(b)]
        if n == 0:
            continue
        if ld > _MAX_LINK_DENSITY:
            continue
        if n < _MIN_BLOCK_CHARS and b.tag not in ('h1', 'h2', 'h3', 'h4', 'h5', 'h6'):
            continue
        out.append(text)
    return '\n\n'.join(out)
