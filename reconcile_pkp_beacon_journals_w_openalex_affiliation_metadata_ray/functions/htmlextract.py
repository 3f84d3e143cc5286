"""From-scratch HTML parsing + mention extraction.

Reimplements, without bs4, the reference's landing-page extractor
(`parse_landing_page_html.py`):

- M11 meta-tag state machine (`:54-81`): iterate ``<meta>`` tags in
  document order; a non-empty ``citation_author`` content starts a new
  author; subsequent non-empty ``citation_author_institution`` contents
  attach to the current author; the last open author is flushed at EOF;
  the ``name`` attribute is compared case-insensitively; ``content`` is
  stripped and empty content skipped.
- M12 ``ul.authors`` DOM path (`:83-97`): the FIRST ``<ul>`` whose class
  list contains ``authors``; its DIRECT ``<li>`` children only
  (recursive=False); per item the first descendant ``span.name`` /
  ``span.affiliation``; author required, affiliation defaults to ``""``;
  text via get_text(strip=True) semantics (stripped strings joined with
  no separator).
- D2 merge (`:189-228`): key = (author.strip(), institution.strip());
  meta rows first (an author with no institutions produces one row with
  institution ""), then ul rows; sources accumulate as a set joined
  ";"-sorted; a ul row OVERWRITES the stored original text even when the
  key already exists ("ul original wins").

Also defines the engine's frozen text-extraction spec (the
byte-identical-per-url invariant target, BASELINE.json input_hint):
pre-order traversal of the DOM, skipping ``script/style/noscript/
template/head/title``, each text node whitespace-collapsed and
non-empty nodes joined with a single ``\\n``. The reference never
extracts full page text (its fetcher stores raw HTML,
`retrieve_landing_pages.py:119-135`), so this spec — implemented once
here and used by both the Ray stage and the single-threaded oracle —
IS the invariant's definition.

The DOM builder is a minimal, deterministic tree parser on stdlib
``html.parser.HTMLParser``: void elements, ``li``/``p``/``tr``/``td``
implied end tags, unmatched end tags ignored. It is not a full HTML5
tree constructor; the fixture generator only emits constructs this
parser and a browser agree on.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "meta br img link input hr area base col embed source track wbr param".split()
)

# tag -> set of open tags it implicitly closes (scanning up to a boundary)
_IMPLIED_CLOSE = {
    "li": ("li",),
    "p": ("p",),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "option": ("option",),
}
_CLOSE_BOUNDARY = frozenset("ul ol table body html div section article".split())

_TEXT_SKIP = frozenset("script style noscript template head title".split())


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs=None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children = []  # Node | str
        self.parent = parent

    def classes(self):
        return self.attrs.get("class", "").split()

    def iter_nodes(self):
        """Pre-order traversal of element nodes (excluding self)."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_nodes()

    def find(self, tag, cls=None):
        """First descendant with tag (and class containing cls), like
        bs4 ``find`` (recursive)."""
        for node in self.iter_nodes():
            if node.tag == tag and (cls is None or cls in node.classes()):
                return node
        return None

    def find_direct(self, tag):
        """Direct children with tag (bs4 find_all(recursive=False))."""
        return [c for c in self.children if isinstance(c, Node) and c.tag == tag]

    def get_text_stripped(self):
        """bs4 get_text(strip=True) parity: all descendant strings,
        stripped, empties dropped, joined with no separator."""
        parts = []

        def walk(node):
            for child in node.children:
                if isinstance(child, str):
                    s = child.strip()
                    if s:
                        parts.append(s)
                else:
                    walk(child)

        walk(self)
        return "".join(parts)


class _TreeBuilder(HTMLParser):
    text_precomputed = None  # fast-path trees carry the text spec inline

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]
        self.meta_tags = []  # document-order <meta> nodes

    def handle_starttag(self, tag, attrs):
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:  # first occurrence wins
                attr_dict[k] = v if v is not None else ""
        if tag in VOID_ELEMENTS:
            node = Node(tag, attr_dict, self.stack[-1])
            self.stack[-1].children.append(node)
            if tag == "meta":
                self.meta_tags.append(node)
            return
        closes = _IMPLIED_CLOSE.get(tag)
        if closes:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in _CLOSE_BOUNDARY:
                    break
                if t in closes:
                    del self.stack[i:]
                    break
        node = Node(tag, attr_dict, self.stack[-1])
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


# ---------------------------------------------------------------------------
# Fast tokenizer path.
#
# stdlib HTMLParser spends ~80% of extract_page in goahead/parse_starttag
# regex gauntlets (measured: 0.34 ms/page on the fixture corpus, the
# single biggest stage of the flagship e2e). Well-formed lowercase HTML
# without charrefs/comments/declarations — i.e. every page the fixture
# generator and typical OJS landing pages emit — needs none of that
# tolerance machinery. `_fast_parse` tokenizes with ONE strict regex per
# tag and builds the exact same Node tree `_TreeBuilder` would;
# anything the strict shapes don't cover (a `&` anywhere, `<!`/`<?`,
# uppercase or exotic tag/attr names, attrs on end tags, stray `<`)
# aborts to the stdlib path for the WHOLE document, so the fast path can
# never be subtly wrong — it either reproduces `_TreeBuilder` exactly
# (equivalence-tested DOM-deep-equal on the full fixture corpus +
# hypothesis fuzz) or it isn't used. It also accumulates the frozen
# text-extraction spec inline (one pass instead of a post-hoc DOM walk).

# any charref (stdlib would unescape; we must not see one on the fast path)
_HAZARD_RE = re.compile(r"&")

_TAG_RE = re.compile(
    r"<(/?)([a-z][a-z0-9-]*)"
    r"((?:\s+[a-z][a-z0-9_:.-]*(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>'\"=`]+))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"([a-z][a-z0-9_:.-]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>'\"=`]+)))?"
)
# CDATA content end, exactly stdlib set_cdata_mode's pattern + the
# strict end-tag consume (stdlib: r'</\s*script\s*>' re.I)
_CDATA_END = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}


class _FastTree:
    """Duck-typed stand-in for `_TreeBuilder`: same `.root` /
    `.meta_tags`, plus the text-spec string accumulated during the one
    tokenizer pass (`extract_text` uses it when present)."""

    __slots__ = ("root", "meta_tags", "text_precomputed")

    def __init__(self):
        self.root = Node("[document]")
        self.meta_tags = []
        self.text_precomputed = None


def _fast_extract(html: str):
    """Tier-1 extractor: ONE `_TAG_RE.split` pass that computes
    :func:`extract_page`'s result directly — no DOM, no Node
    allocations, attrs parsed only for the three tags whose attributes
    the extractors read (``meta`` always, ``ul``/``span`` only while
    the ul.authors state machine needs them). Returns the page dict or
    None when any token falls outside the proven strict shapes — the
    same gate as `_fast_parse` plus one extra: a raw-text element
    (script/style) whose content contains markup, which only the
    CDATA-aware tiers below can tokenize. Aborted documents fall to
    `_fast_parse` (tier 2) and then stdlib (tier 3); all three are
    equivalence-gated, so the answer is identical on every tier.

    Parity argument (each point mirrors a `_TreeBuilder` invariant):
    pre-order of the final tree = start-tag token order, so "first
    ul.authors" / "first descendant span" = first matching start tag;
    a node's subtree = the token interval while it is on the stack, so
    span text = data tokens seen while the span's stack slot is live;
    text nodes are exactly the inter-tag runs, so get_text_stripped's
    per-child strip/join is reproduced per data token."""
    if _HAZARD_RE.search(html) is not None:
        return None
    parts = _TAG_RE.split(html)
    stack = ["[document]"]  # open tag NAMES; index 0 = root sentinel
    cum = [0]  # cumulative _TEXT_SKIP count per slot (pop = O(1) restore)
    sd = 0     # == cum[-1]; 0 -> text-spec collects
    metas = []  # attr dicts, document order
    text_parts = []
    attr_memo: dict = {}
    # ul.authors state machine (extract_ul_pairs semantics)
    ul_found = False
    ul_idx = -1   # stack index of the OPEN target ul, -1 when closed/absent
    li_idx = -1   # stack index of the current DIRECT li of the target ul
    # span collector states: None = not found yet; [parts, start_idx] =
    # collecting; str = finalized text
    li_name = None
    li_aff = None
    ul_items = []  # finalized (author_text_or_None, affiliation_text)
    cdata_close = None  # script/style open: next tag token MUST close it

    def _parse_attrs(attrtext):
        attrs = {}
        for am in _ATTR_RE.finditer(attrtext):
            ak = am.group(1)
            if ak not in attrs:
                v = am.group(2)
                if v is None:
                    v = am.group(3)
                    if v is None:
                        v = am.group(4) or ""
                attrs[ak] = v
        attr_memo[attrtext] = attrs
        return attrs

    def _pops(newlen):
        """Pop stack to newlen, finalizing span collectors, the open
        direct li, and the target ul — innermost first. Only called
        while the target ul is open (the hot path inlines plain pops)."""
        nonlocal sd, ul_idx, li_idx, li_name, li_aff
        del stack[newlen:]
        del cum[newlen:]
        sd = cum[-1]
        if type(li_name) is list and li_name[1] >= newlen:
            li_name = "".join(li_name[0])
        if type(li_aff) is list and li_aff[1] >= newlen:
            li_aff = "".join(li_aff[0])
        if li_idx >= newlen:
            ul_items.append((li_name if type(li_name) is str else None,
                             li_aff if type(li_aff) is str else ""))
            li_idx = -1
            li_name = None
            li_aff = None
        if ul_idx >= newlen:
            ul_idx = -1

    data = parts[0]
    if data:
        if "<" in data:
            return None
        s = " ".join(data.split())
        if s:
            text_parts.append(s)
    # locals for the hot loop
    voids = VOID_ELEMENTS
    implied = _IMPLIED_CLOSE
    boundary = _CLOSE_BOUNDARY
    tskip = _TEXT_SKIP
    memo_get = attr_memo.get
    it = iter(parts)
    next(it)
    for close, tag, attrtext, selfclose, data in zip(it, it, it, it, it):
        if close:
            if cdata_close is not None:
                # stdlib CDATA mode: the only token shape the split
                # stream can represent is an immediate plain close tag;
                # markup inside script/style needs tier 2
                if tag != cdata_close or attrtext or selfclose:
                    return None
                cdata_close = None
            if attrtext or selfclose:
                return None  # attrs on an end tag: tolerance territory
            for j in range(len(stack) - 1, 0, -1):
                if stack[j] == tag:
                    if ul_idx < 0:
                        del stack[j:]
                        del cum[j:]
                        sd = cum[-1]
                    else:
                        _pops(j)
                    break
        elif cdata_close is not None:
            return None
        elif tag in voids:
            if tag == "meta":
                metas.append((memo_get(attrtext) or _parse_attrs(attrtext))
                             if attrtext else {})
        else:
            closes = implied.get(tag)
            if closes:
                for j in range(len(stack) - 1, 0, -1):
                    t = stack[j]
                    if t in boundary:
                        break
                    if t in closes:
                        if ul_idx < 0:
                            del stack[j:]
                            del cum[j:]
                            sd = cum[-1]
                        else:
                            _pops(j)
                        break
            if tag == "ul":
                if not ul_found:
                    attrs = (memo_get(attrtext) or _parse_attrs(attrtext)) \
                        if attrtext else {}
                    if "authors" in attrs.get("class", "").split():
                        ul_found = True
                        if not selfclose:
                            ul_idx = len(stack)
            elif tag == "li":
                # direct child of the target ul (post implied-close)
                if ul_idx >= 0 and len(stack) == ul_idx + 1 and not selfclose:
                    li_idx = len(stack)
                    li_name = None
                    li_aff = None
                # a self-closed li has no children: author None, skipped
            elif tag == "span" and li_idx >= 0 and (li_name is None
                                                    or li_aff is None):
                attrs = (memo_get(attrtext) or _parse_attrs(attrtext)) \
                    if attrtext else {}
                cl = attrs.get("class", "").split()
                if li_name is None and "name" in cl:
                    li_name = "" if selfclose else [[], len(stack)]
                if li_aff is None and "affiliation" in cl:
                    li_aff = "" if selfclose else [[], len(stack)]
            if not selfclose:
                stack.append(tag)
                if tag in tskip:
                    sd += 1
                cum.append(sd)
                if tag == "script" or tag == "style":
                    if type(li_name) is list or type(li_aff) is list:
                        # raw-text content inside an ACTIVE span
                        # collector: stdlib drops unterminated CDATA,
                        # which the split stream can't always see —
                        # tier 2 resolves it exactly
                        return None
                    cdata_close = tag
        if data:
            if "<" in data:
                return None
            if not sd:
                s = " ".join(data.split())
                if s:
                    text_parts.append(s)
            if li_idx >= 0:
                if type(li_name) is list:
                    s2 = data.strip()
                    if s2:
                        li_name[0].append(s2)
                if type(li_aff) is list:
                    s2 = data.strip()
                    if s2:
                        li_aff[0].append(s2)
    _pops(1)  # EOF: finalize everything still open (open li still counts)

    ul_pairs = [(a, aff, "ul.authors") for a, aff in ul_items if a]
    # meta state machine (extract_meta_pairs semantics, over attr dicts)
    pairs = []
    current_author = None
    current_insts: list = []
    has_author_tag = False
    has_inst_tag = False
    doi = ""
    for attrs in metas:
        content = attrs.get("content")
        if not content:
            continue
        content = content.strip()
        if not content:
            continue
        name = (attrs.get("name") or "").lower()
        if name == "citation_author":
            has_author_tag = True
            if current_author is not None:
                pairs.append((current_author, current_insts, "meta"))
            current_author = content
            current_insts = []
        elif name == "citation_author_institution":
            has_inst_tag = True
            if current_author is not None:
                current_insts.append(content)
        elif name == "citation_doi" and not doi:
            doi = content
    if current_author is not None:
        pairs.append((current_author, current_insts, "meta"))
    return {
        "mentions": merge_mentions(pairs, ul_pairs),
        "doi": doi,
        "text": "\n".join(text_parts),
        "has_author_tag": has_author_tag,
        "has_inst_tag": has_inst_tag,
        "has_ul_authors": bool(ul_pairs),
    }


def _fast_parse(html: str):
    """Strict-shape tokenizer; returns a `_FastTree` or None when any
    token falls outside the shapes stdlib parity is proven for."""
    if _HAZARD_RE.search(html) is not None:
        return None
    tree = _FastTree()
    root = tree.root
    metas = tree.meta_tags
    stack = [root]
    skipflags = [False]  # aligned with stack: tag in _TEXT_SKIP
    skip_depth = 0
    text_parts = []
    tag_match = _TAG_RE.match
    find = html.find
    n = len(html)
    i = 0
    # attr-dict memo: class-carrying tags repeat the same attrtext
    # constantly (` class="name"`, ` class="authors"` ...). Values are
    # shared dicts — Node attrs are treated as immutable everywhere.
    attr_memo: dict = {}
    while i < n:
        lt = find("<", i)
        if lt < 0:
            data = html[i:]
            if data:
                stack[-1].children.append(data)
                if not skip_depth:
                    s = " ".join(data.split())
                    if s:
                        text_parts.append(s)
            break
        if lt > i:
            data = html[i:lt]
            stack[-1].children.append(data)
            if not skip_depth:
                s = " ".join(data.split())
                if s:
                    text_parts.append(s)
        m = tag_match(html, lt)
        if m is None:
            return None  # comment/decl/charref-ish/malformed: stdlib path
        close, tag, attrtext, selfclose = m.groups()
        i = m.end()
        if close:
            if attrtext or selfclose:
                return None  # attrs on an end tag: tolerance territory
            for j in range(len(stack) - 1, 0, -1):
                if stack[j].tag == tag:
                    for f in skipflags[j:]:
                        if f:
                            skip_depth -= 1
                    del stack[j:]
                    del skipflags[j:]
                    break
            continue
        if attrtext:
            attr_dict = attr_memo.get(attrtext)
            if attr_dict is None:
                attr_dict = {}
                for am in _ATTR_RE.finditer(attrtext):
                    k = am.group(1)
                    if k not in attr_dict:
                        v = am.group(2)
                        if v is None:
                            v = am.group(3)
                            if v is None:
                                v = am.group(4) or ""
                        attr_dict[k] = v
                attr_memo[attrtext] = attr_dict
        else:
            attr_dict = {}
        if tag in VOID_ELEMENTS:
            node = Node(tag, attr_dict, stack[-1])
            stack[-1].children.append(node)
            if tag == "meta":
                metas.append(node)
            continue
        closes = _IMPLIED_CLOSE.get(tag)
        if closes:
            for j in range(len(stack) - 1, 0, -1):
                t = stack[j].tag
                if t in _CLOSE_BOUNDARY:
                    break
                if t in closes:
                    for f in skipflags[j:]:
                        if f:
                            skip_depth -= 1
                    del stack[j:]
                    del skipflags[j:]
                    break
        node = Node(tag, attr_dict, stack[-1])
        stack[-1].children.append(node)
        if selfclose:
            continue  # startendtag: appended, never pushed
        cdata_end = _CDATA_END.get(tag)
        if cdata_end is not None:
            # stdlib CDATA mode: raw data until a full `</script\s*>`
            m2 = cdata_end.search(html, i)
            if m2 is None:
                # stdlib parity: unterminated CDATA content is dropped
                # (goahead breaks waiting for more data; close() discards)
                break
            data = html[i : m2.start()]
            if data:
                node.children.append(data)
            i = m2.end()
            continue  # node closed by its end tag; never pushed
        stack.append(node)
        flag = tag in _TEXT_SKIP
        skipflags.append(flag)
        if flag:
            skip_depth += 1
    tree.text_precomputed = "\n".join(text_parts)
    return tree


def parse_html(html):
    """Parse HTML (str or utf-8/replace-decoded bytes) into a DOM tree;
    never raises on malformed input. Uses the strict fast tokenizer when
    the document fits its shapes, the tolerant stdlib parser otherwise —
    identical trees either way (equivalence-tested)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="ignore")
    if isinstance(html, str):
        try:
            tree = _fast_parse(html)
        except Exception:
            tree = None
        if tree is not None:
            return tree
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # salvage whatever tree was built; record-level errors never fatal
    return builder


def extract_meta_pairs(builder: _TreeBuilder):
    """M11: [(author, [institutions], 'meta')...] in document order, plus
    tag-presence flags and the first citation_doi content."""
    pairs = []
    current_author = None
    current_insts = []
    has_author_tag = False
    has_inst_tag = False
    doi = ""
    for tag in builder.meta_tags:
        name = (tag.attrs.get("name") or "").lower()
        content = tag.attrs.get("content")
        if not content:
            continue
        content = content.strip()
        if not content:
            continue
        if name == "citation_author":
            has_author_tag = True
            if current_author is not None:
                pairs.append((current_author, list(current_insts), "meta"))
            current_author = content
            current_insts = []
        elif name == "citation_author_institution":
            has_inst_tag = True
            if current_author is not None:
                current_insts.append(content)
        elif name == "citation_doi" and not doi:
            doi = content
    if current_author is not None:
        pairs.append((current_author, list(current_insts), "meta"))
    return pairs, has_author_tag, has_inst_tag, doi


def extract_ul_pairs(builder: _TreeBuilder):
    """M12: [(author, affiliation, 'ul.authors')...] from the first
    ul.authors, direct li children only."""
    out = []
    authors_ul = builder.root.find("ul", cls="authors")
    if authors_ul is None:
        return out
    for item in authors_ul.find_direct("li"):
        name_tag = item.find("span", cls="name")
        aff_tag = item.find("span", cls="affiliation")
        author = name_tag.get_text_stripped() if name_tag else None
        affiliation = aff_tag.get_text_stripped() if aff_tag else ""
        if author:
            out.append((author, affiliation, "ul.authors"))
    return out


def merge_mentions(meta_pairs, ul_pairs):
    """D2 merge: returns [(author, institution, source)] in insertion
    order, source = ';'.join(sorted(set)). 'ul original wins' on key
    collision."""
    combined = {}
    for author, institutions, source in meta_pairs:
        author_stripped = author.strip() if author else ""
        if not institutions:
            key = (author_stripped, "")
            if key not in combined:
                combined[key] = {"sources": set(), "original": [author, ""]}
            combined[key]["sources"].add(source)
        else:
            for institution in institutions:
                inst_stripped = institution.strip() if institution else ""
                key = (author_stripped, inst_stripped)
                if key not in combined:
                    combined[key] = {"sources": set(), "original": [author, institution]}
                combined[key]["sources"].add(source)
    for author, institution, source in ul_pairs:
        author_stripped = author.strip() if author else ""
        inst_stripped = institution.strip() if institution else ""
        key = (author_stripped, inst_stripped)
        if key not in combined:
            combined[key] = {"sources": set(), "original": [author, institution]}
        combined[key]["sources"].add(source)
        combined[key]["original"] = [author, institution]
    rows = []
    for data in combined.values():
        original_author, original_institution = data["original"]
        rows.append((original_author, original_institution, ";".join(sorted(data["sources"]))))
    return rows


def extract_text(builder) -> str:
    """Frozen text-extraction spec (the byte-identical invariant): each
    text node outside script/style/noscript/template/head/title is
    whitespace-collapsed; non-empty results joined with '\\n'. Fast-path
    trees accumulated this during tokenizing (same spec, one pass —
    equivalence-tested against this walk)."""
    if builder.text_precomputed is not None:
        return builder.text_precomputed
    parts = []

    def walk(node):
        for child in node.children:
            if isinstance(child, str):
                s = " ".join(child.split())
                if s:
                    parts.append(s)
            elif child.tag not in _TEXT_SKIP:
                walk(child)

    walk(builder.root)
    return "\n".join(parts)


def extract_page(html):
    """Full per-page extraction: returns a dict with
    ``mentions``: [(author, institution, source)], ``doi``, ``text``,
    ``has_author_tag``, ``has_inst_tag``, ``has_ul_authors``.

    This single function is the unit of determinism: the Ray stage maps
    it over rows, the oracle calls it in a plain loop — outputs must be
    identical at any parallelism (whole document always in one row)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="ignore")
    if isinstance(html, str):
        try:
            page = _fast_extract(html)
        except Exception:
            page = None
        if page is not None:
            return page
    builder = parse_html(html)
    meta_pairs, has_author, has_inst, doi = extract_meta_pairs(builder)
    ul_pairs = extract_ul_pairs(builder)
    return {
        "mentions": merge_mentions(meta_pairs, ul_pairs),
        "doi": doi,
        "text": extract_text(builder),
        "has_author_tag": has_author,
        "has_inst_tag": has_inst,
        "has_ul_authors": bool(ul_pairs),
    }
