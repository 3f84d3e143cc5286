"""Equivalence gate for the strict fast HTML tokenizer
(functions/htmlextract._fast_parse).

The fast path must either produce the EXACT tree `_TreeBuilder`
(stdlib html.parser) would — attrs, child order, text nodes, meta
list, text spec — or return None and let the stdlib path run. These
tests pin both halves: deep DOM equality on the whole sf0.001 fixture
corpus plus structured fuzz, and explicit fallback triggers for every
tolerance feature the strict shapes exclude.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions import (
    htmlextract as hx,
)

SF = "/root/testdata/sf0.001"


def stdlib_tree(html: str) -> hx._TreeBuilder:
    b = hx._TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    return b


def dom_eq(a, b, path="root"):
    if isinstance(a, str) or isinstance(b, str):
        assert a == b, (path, repr(a)[:80], repr(b)[:80])
        return
    assert a.tag == b.tag, (path, a.tag, b.tag)
    assert a.attrs == b.attrs, (path, a.tag, a.attrs, b.attrs)
    assert len(a.children) == len(b.children), (
        path, a.tag, len(a.children), len(b.children))
    for i, (ca, cb) in enumerate(zip(a.children, b.children)):
        dom_eq(ca, cb, f"{path}/{a.tag}[{i}]")


def assert_fast_equivalent(html: str):
    """If the fast path accepts the document, its tree and text spec
    must equal the stdlib build exactly."""
    ft = hx._fast_parse(html)
    if ft is None:
        return False
    st_ = stdlib_tree(html)
    dom_eq(ft.root, st_.root)
    assert [m.attrs for m in ft.meta_tags] == [m.attrs for m in st_.meta_tags]
    walk_only = hx._FastTree()
    walk_only.root = ft.root
    assert ft.text_precomputed == hx.extract_text(walk_only) == hx.extract_text(st_)
    return True


def test_fixture_corpus_all_fast_and_identical():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.sources.fixtures import (
        ensure_fixtures,
    )
    import os
    import pyarrow.parquet as pq

    fdir = ensure_fixtures(SF)
    t = pq.read_table(os.path.join(fdir, "pages.parquet"), columns=["html"])
    n_fast = 0
    for h in t["html"].to_pylist():
        if isinstance(h, bytes):
            h = h.decode()
        n_fast += assert_fast_equivalent(h)
    # the generator emits strict-shape HTML: the fast path must cover it
    assert n_fast == t.num_rows


FALLBACK_DOCS = [
    "a &amp; b",                      # charref: stdlib unescapes
    "<!-- comment --><p>x</p>",        # declaration/comment
    "<?php echo ?>",                   # processing instruction
    "<DIV>x</DIV>",                    # uppercase tag name
    '<p CLASS="x">y</p>',              # uppercase attr name
    "</p junk>",                       # attrs on an end tag
    "<p",                              # unterminated tag
    "a < b",                           # stray '<' as text
    '<meta name="citation_author" content="A &quot;Q&quot;">',
]


@pytest.mark.parametrize("doc", FALLBACK_DOCS)
def test_tolerance_features_fall_back(doc):
    assert hx._fast_parse(doc) is None
    # and the public entry still parses them (stdlib path)
    page = hx.extract_page(doc)
    assert isinstance(page["text"], str)


def test_charref_fallback_unescapes():
    page = hx.extract_page("<p>a &amp; b</p>")
    assert page["text"] == "a & b"


STRICT_OK_DOCS = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",                          # implied closes
    "<ul><li>one<li>two</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<script>var x = 1 < no, wait</script><p>t</p>",  # CDATA keeps raw '<'
    "<script>never closed...",
    "<style>.a{}</style><p>s</p>",
    "<br/><img src='x.png'/><p a b c>flags</p>",
    "<p class='sq' id=unq data-x=\"dq\">mix</p>",
    "<div><span>deep</span></div></div></div>",       # unmatched ends
    "<meta name='citation_author' content='X'><meta name='citation_author_institution' content='U'>",
    "<ul class='authors'><li><span class='name'>N</span><span class='affiliation'>A</span></ul>",
    "<p>line\none</p>\n\n<p>  spaced   out  </p>",
    "<script/>not cdata<p>y</p>",                     # self-closed script
    "<sCript>mixed case gate</sCript>",               # falls back (uppercase)
    "<p>trailing text after last tag</p> tail ",
]


@pytest.mark.parametrize("doc", STRICT_OK_DOCS)
def test_strict_docs_equivalent(doc):
    # equivalence required whenever the fast path accepts; acceptance
    # itself isn't asserted (the gate may legitimately refuse)
    assert_fast_equivalent(doc)


_tag_names = st.sampled_from(["p", "li", "ul", "div", "span", "meta", "script",
                              "td", "tr", "table", "title", "head", "b"])
_attr_vals = st.text(
    alphabet=st.characters(blacklist_characters='&<>"\'`=', min_codepoint=32,
                           max_codepoint=122),
    max_size=8)
_words = st.text(alphabet=st.characters(blacklist_characters="&<",
                                        min_codepoint=32, max_codepoint=122),
                 max_size=12)


@st.composite
def _html_docs(draw):
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 3))
        tag = draw(_tag_names)
        if kind == 0:
            parts.append(draw(_words))
        elif kind == 1:
            attrs = ""
            for _ in range(draw(st.integers(0, 2))):
                attrs += f' class="{draw(_attr_vals)}"' if draw(st.booleans()) \
                    else f" name={draw(st.integers(0, 9))}"
            parts.append(f"<{tag}{attrs}>")
        elif kind == 2:
            parts.append(f"</{tag}>")
        else:
            parts.append(f"<{tag}/>")
    return "".join(parts)


@given(_html_docs())
@settings(max_examples=300, deadline=None)
def test_fuzz_fast_matches_stdlib(doc):
    assert_fast_equivalent(doc)


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_fuzz_arbitrary_text_public_api_consistent(doc):
    """extract_page through the public entry (fast-or-fallback) must
    equal a forced-stdlib extraction for ANY input."""
    fast = hx.extract_page(doc)
    b = stdlib_tree(doc)
    meta_pairs, has_author, has_inst, doi = hx.extract_meta_pairs(b)
    ul_pairs = hx.extract_ul_pairs(b)
    slow = {
        "mentions": hx.merge_mentions(meta_pairs, ul_pairs),
        "doi": doi,
        "text": hx.extract_text(b),
        "has_author_tag": has_author,
        "has_inst_tag": has_inst,
        "has_ul_authors": bool(ul_pairs),
    }
    assert fast == slow


# ---------------------------------------------------------------------------
# Tier-1 `_fast_extract` (no-DOM one-pass extractor): whenever it accepts
# a document, its page dict must equal the DOM-path extraction exactly.


def dom_extract(html: str) -> dict:
    b = stdlib_tree(html)
    meta_pairs, has_author, has_inst, doi = hx.extract_meta_pairs(b)
    ul_pairs = hx.extract_ul_pairs(b)
    return {
        "mentions": hx.merge_mentions(meta_pairs, ul_pairs),
        "doi": doi,
        "text": hx.extract_text(b),
        "has_author_tag": has_author,
        "has_inst_tag": has_inst,
        "has_ul_authors": bool(ul_pairs),
    }


def assert_extract_equivalent(html: str):
    fe = hx._fast_extract(html)
    if fe is None:
        return False
    assert fe == dom_extract(html), html[:200]
    return True


def test_fast_extract_fixture_corpus_all_fast_and_identical():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.sources.fixtures import (
        ensure_fixtures,
    )
    import os
    import pyarrow.parquet as pq

    fdir = ensure_fixtures(SF)
    t = pq.read_table(os.path.join(fdir, "pages.parquet"), columns=["html"])
    n_fast = 0
    for h in t["html"].to_pylist():
        if isinstance(h, bytes):
            h = h.decode()
        n_fast += assert_extract_equivalent(h)
    assert n_fast == t.num_rows


EXTRACT_EDGE_DOCS = [
    # ul.authors structural edges
    "<ul class='authors'><li><span class='name'>N1</span>"
    "<span class='affiliation'>A1</span><li><span class='name'>N2</span></ul>",
    "<ul class='authors'><li><div><span class='name'>deep</span></div></ul>",
    "<ul class='authors'><li><span class='name'/></ul>",       # empty author
    "<ul class='authors'><li><span class='name affiliation'>both</span></ul>",
    "<ul class='authors'><li><span class='name'>outer"
    "<span class='affiliation'>inner</span>tail</span></ul>",   # nested spans
    "<ul class='authors'/><ul class='authors'><li>"
    "<span class='name'>late</span></ul>",  # first (empty) ul wins
    "<ul class='authors'><li><span class='name'>eof",           # open at EOF
    "<ul><li><ul class='authors'><li><span class='name'>n</span></ul></ul>",
    "<ul class='authors'><li><ul><li><span class='name'>nested-li</span>"
    "</ul><span class='affiliation'>aff</span></ul>",  # span in non-direct li
    "<div><ul class='authors'><li><span class='name'>x</span></li></ul>"
    "</div><ul class='authors'><li><span class='name'>y</span></ul>",
    # li implied-close separating items
    "<ul class='authors'><li><span class='name'>a</span>"
    "<li><span class='affiliation'>only-aff</span></ul>",
    # script/style interactions
    "<script>var x=1;</script><p>t</p>",
    "<style>.a{color:red}</style><p>s</p>",
    "<p><script>hidden</script>shown</p>",
    "<ul class='authors'><li><span class='name'>n<script>js</script>m"
    "</span></ul>",  # CDATA inside an active collector -> tier 2
    "<script>unterminated",
    "<script></script>",
    "<title>skipped title</title><p>kept</p>",
    # meta edges
    "<meta name='citation_author' content=' pad '>"
    "<meta name='citation_author_institution' content='U1'>"
    "<meta name='citation_author_institution' content='U2'>"
    "<meta name='citation_author' content='B'>",
    "<meta name='citation_doi' content='10.1/x'>"
    "<meta name='citation_doi' content='10.2/y'>",  # first doi wins
    "<meta name='citation_author_institution' content='orphan'>",
    "<meta content='no-name'><meta name='citation_author'>",
    # text-spec edges
    "a  b\n\n c<p> d   e </p>",
    "<head><p>inside head</p></head>after",
    "tail after last tag</p> trailing ",
]


@pytest.mark.parametrize("doc", EXTRACT_EDGE_DOCS)
def test_fast_extract_edges_equivalent(doc):
    # acceptance not asserted (the gate may refuse); equivalence is
    assert_extract_equivalent(doc)
    # and the public entry agrees with the forced DOM path regardless
    assert hx.extract_page(doc) == dom_extract(doc)


@given(_html_docs())
@settings(max_examples=300, deadline=None)
def test_fuzz_fast_extract_matches_dom(doc):
    assert_extract_equivalent(doc)


_ul_tags = st.sampled_from(["ul", "li", "span", "div", "script", "p"])
_ul_classes = st.sampled_from(
    ["authors", "name", "affiliation", "name affiliation", "x", ""])


@st.composite
def _ul_docs(draw):
    """Tag soup biased toward the ul.authors state machine: the magic
    class names appear constantly, in valid and invalid nestings."""
    parts = []
    for _ in range(draw(st.integers(0, 16))):
        kind = draw(st.integers(0, 3))
        tag = draw(_ul_tags)
        if kind == 0:
            parts.append(draw(_words))
        elif kind == 1:
            cls = draw(_ul_classes)
            parts.append(f'<{tag} class="{cls}">' if cls else f"<{tag}>")
        elif kind == 2:
            parts.append(f"</{tag}>")
        else:
            cls = draw(_ul_classes)
            parts.append(f'<{tag} class="{cls}"/>' if cls else f"<{tag}/>")
    return "".join(parts)


@given(_ul_docs())
@settings(max_examples=500, deadline=None)
def test_fuzz_ul_state_machine_matches_dom(doc):
    assert_extract_equivalent(doc)
