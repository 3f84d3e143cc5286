"""Unit + property tests for the pure function library (SURVEY.md §2.8)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions import (
    doi as doi_fns,
    htmlextract,
    minhash,
    similarity,
    textnorm,
    timestamps,
    urlkeys,
)


# ---------- textnorm (M14) ----------

def test_normalize_basic():
    assert textnorm.normalize_text("  José  García-Pérez ") == "jose garciaperez"
    assert textnorm.normalize_text("Müller, Straße") == "muller strasse"
    assert textnorm.normalize_text("ŁÓDŹ øre Æon") == "lodz ore aeon"
    assert textnorm.normalize_text(None) == ""
    assert textnorm.normalize_text(123) == ""
    assert textnorm.normalize_text("A.B.  C!!") == "ab c"


@given(st.text(max_size=80))
def test_normalize_idempotent(s):
    once = textnorm.normalize_text(s)
    assert textnorm.normalize_text(once) == once
    assert re.fullmatch(r"[a-z0-9 ]*", once)
    assert once == once.strip()


def test_safe_parsers():
    assert textnorm.safe_bool(" True ") and not textnorm.safe_bool("1")
    assert textnorm.safe_float("3.5") == 3.5
    assert textnorm.safe_float("x", 7.0) == 7.0


# ---------- similarity ----------

def _lcs_dp(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
    return dp[m][n]


@settings(max_examples=200)
@given(st.text(alphabet="abcdef ", max_size=30), st.text(alphabet="abcdef ", max_size=30))
def test_lcs_bitparallel_vs_dp(a, b):
    assert similarity.lcs_length(a, b) == _lcs_dp(a, b)


def test_indel_ratio_reference_cases():
    # parity with rapidfuzz fuzz.ratio definition
    assert similarity.indel_ratio("", "") == 100.0
    assert similarity.indel_ratio("abc", "abc") == 100.0
    assert similarity.indel_ratio("abc", "") == 0.0
    # fuzz.ratio("kitten","sitting") = 100*(1 - (3+4-2*4)... lcs("kitten","sitting")=4 ("ittn")
    assert similarity.lcs_length("kitten", "sitting") == 4
    assert similarity.indel_ratio("kitten", "sitting") == pytest.approx(100 * (1 - 5 / 13))


@given(st.text(max_size=40), st.text(max_size=40))
def test_indel_ratio_bounds_symmetry(a, b):
    r = similarity.indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == similarity.indel_ratio(b, a)
    assert similarity.indel_ratio(a, a) == 100.0


def _lev_dp(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@settings(max_examples=150)
@given(st.text(alphabet="abcde", max_size=25), st.text(alphabet="abcde", max_size=25))
def test_levenshtein_vs_dp(a, b):
    assert similarity.levenshtein(a, b) == _lev_dp(a, b)


def test_jaro_winkler_known_values():
    assert similarity.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert similarity.jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert similarity.jaro_winkler("abc", "abc") == 1.0
    assert similarity.jaro_winkler("abc", "xyz") == 0.0


def test_jaccard():
    assert similarity.token_jaccard("a b c", "b c d") == pytest.approx(0.5)
    assert similarity.token_jaccard("", "") == 1.0
    assert similarity.ngram_jaccard("abcd", "abcd") == 1.0
    assert 0 < similarity.ngram_jaccard("abcdef", "abcxef") < 1


# ---------- urlkeys (M1-M3) ----------

def test_strip_oai_suffix():
    f = urlkeys.strip_oai_suffix
    assert f("https://x.org/index.php/index/oai") == "https://x.org"
    assert f("https://x.org/journal/index.php/index/oai") == "https://x.org"
    assert f("https://x.org/oai") == "https://x.org"
    assert f("https://x.org/other") == "https://x.org/other"
    # first matching suffix wins, then stop (reference behavior)
    assert f("https://x.org/index.php/index/oai/oai") == "https://x.org/index.php/index/oai"
    assert f(None) == ""
    assert f(123) == ""


def test_url_key_default_ports():
    assert urlkeys.url_key("https://X.Org/path") == ("https", "x.org", 443)
    assert urlkeys.url_key("http://x.org:8080/a") == ("http", "x.org", 8080)
    assert urlkeys.url_key("http://x.org") == ("http", "x.org", 80)
    assert urlkeys.url_key("not a url") is None
    assert urlkeys.url_key("") is None
    assert urlkeys.host_key("https://x.org/a/b") == "https://x.org:443"


def test_ensure_scheme():
    assert urlkeys.ensure_scheme("example.org/path") == "http://example.org/path"
    assert urlkeys.ensure_scheme("https://example.org") == "https://example.org"
    assert urlkeys.ensure_scheme("   ") == ""


# ---------- doi (M4, M5, M13) ----------

def test_doi_prefix_regex_variant():
    assert doi_fns.doi_prefix("10.1234/abc") == "10.1234"
    assert doi_fns.doi_prefix("https://doi.org/10.999/x") == "10.999"
    assert doi_fns.doi_prefix("10.1234") == "10.1234"
    assert doi_fns.doi_prefix("10.%31234/abc") == "10.1234"  # percent-decode first
    assert doi_fns.doi_prefix("10%2E1234/a") == "10.1234"  # %2E -> '.'
    assert doi_fns.doi_prefix("junk") == ""
    assert doi_fns.doi_prefix("10.abc/x") == ""


def test_doi_prefix_partition_rust_variant():
    f = doi_fns.doi_prefix_partition
    assert f("https://doi.org/10.5555/j.123") == "10.5555"
    assert f("10.1/x") == "10.1"  # len > 3 after '10.'? '10.1' length 4 > 3 -> valid
    assert f("") == "_unknown_"
    assert f("no doi here") == "_unknown_"
    assert f("10.x/abc") == "_unknown_"  # next char not digit or '/'
    assert f("prefix 10.88") == "10.88"


def test_doi_record_id_roundtrip():
    doi = "10.1234/ab+c/d?e"
    rid = doi_fns.doi_to_record_id(doi)
    assert doi_fns.record_id_to_doi(rid) == doi
    assert doi_fns.record_id_to_doi("!!!notb64") == ""


def test_clean_doi():
    assert doi_fns.clean_doi("https://doi.org/10.1/x") == "10.1/x"
    assert doi_fns.clean_doi("doi:10.1/x") == "10.1/x"
    assert doi_fns.clean_doi("10.1/x") == "10.1/x"


# ---------- timestamps (M18) ----------

def test_timestamp_format():
    assert timestamps.format_epoch_ms(1577836800000) == "20200101000000"
    assert timestamps.format_epoch_ms(-5) == ""
    assert timestamps.format_epoch_ms("x") == ""
    assert timestamps.format_epoch_ms(1) == ""  # year 1970 < 1990


# ---------- minhash / simhash / fingerprints ----------

def test_minhash_estimates_jaccard():
    mh = minhash.MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumped over the lazy dog"
    c = "completely different content entirely here"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    true_ab = similarity.ngram_jaccard(a, b)
    assert abs(minhash.estimate_jaccard(sa, sb) - true_ab) < 0.15
    assert minhash.estimate_jaccard(sa, sc) < 0.2
    assert minhash.estimate_jaccard(sa, sa) == 1.0


def test_band_keys_lsh():
    mh = minhash.MinHasher(num_perm=64)
    sig = mh.signature("hello world document text")
    keys = minhash.band_keys(sig, 16)
    assert len(keys) == 16 and len(set(keys)) == 16  # distinct band ids
    # identical docs share all band keys
    assert minhash.band_keys(mh.signature("hello world document text"), 16) == keys


def test_simhash_hamming():
    a = minhash.simhash64("the quick brown fox jumps over the lazy dog")
    b = minhash.simhash64("the quick brown fox jumped over the lazy dog")
    c = minhash.simhash64("totally unrelated stuff qwertyuiop zxcvbnm")
    assert minhash.hamming64(a, b) < minhash.hamming64(a, c)
    assert minhash.hamming64(a, a) == 0


@given(st.lists(st.text(alphabet="abcdef ghé", max_size=60), max_size=20))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_matches_scalar(texts):
    batch = minhash.simhash_batch(texts)
    assert [int(h) for h in batch] == [minhash.simhash64(t) for t in texts]


def test_simhash_batch_edges():
    edge = ["", "ab", "abc", "abcd", "aaaaaa"]
    out = minhash.simhash_batch(edge)
    assert [int(h) for h in out] == [minhash.simhash64(t) for t in edge]
    assert len(minhash.simhash_batch([])) == 0


def test_batch_kernels_nul_safe():
    # pandas' object hashtable truncates strings at embedded \x00
    # (khash C-string semantics), so a plain pd.factorize interning
    # pass merges these DISTINCT shingles; hypothesis found exactly
    # this with ['\x00', '\x000'] — pin it deterministically for both
    # batch kernels and for factorize_exact itself.
    texts = ["\x00", "\x000", "ab\x00cd", "ab\x00ce", "ab", "plain text"]
    sims = minhash.simhash_batch(texts)
    assert [int(h) for h in sims] == [minhash.simhash64(t) for t in texts]
    mh = minhash.MinHasher(8)
    sigs = minhash.MinHasher(8).signatures(texts)
    for i, t in enumerate(texts):
        assert (sigs[i] == mh.signature(t)).all()
    codes, uniq = minhash.factorize_exact(["x\x00a", "x\x00b", "x\x00a"])
    assert len(uniq) == 2 and list(codes) == [0, 1, 0]
    # NUL-free fast path unchanged
    codes, uniq = minhash.factorize_exact(["p", "q", "p"], has_nul=False)
    assert uniq == ["p", "q"] and list(codes) == [0, 1, 0]


def test_rolling_fingerprints_deterministic():
    t = "some reasonably long document text for fingerprinting purposes " * 4
    f1 = minhash.rolling_fingerprints(t)
    assert f1 == minhash.rolling_fingerprints(t)
    assert f1  # at least one fingerprint
    assert minhash.rolling_fingerprints("") == []


# ---------- htmlextract (M11, M12, D2) ----------

META_HTML = """<html><head>
<meta name="citation_doi" content="10.1234/x1">
<meta NAME="Citation_Author" content=" Alice Smith ">
<meta name="citation_author_institution" content="Uni A">
<meta name="citation_author_institution" content="Uni B">
<meta name="citation_author" content="Bob Jones">
<meta name="citation_author_institution" content="">
<meta name="citation_author" content="">
</head><body><p>Hello  world</p></body></html>"""


def test_meta_state_machine():
    page = htmlextract.extract_page(META_HTML)
    assert page["doi"] == "10.1234/x1"
    assert page["mentions"] == [
        ("Alice Smith", "Uni A", "meta"),
        ("Alice Smith", "Uni B", "meta"),
        ("Bob Jones", "", "meta"),
    ]
    assert page["has_author_tag"] and page["has_inst_tag"]
    assert not page["has_ul_authors"]


def test_institution_before_any_author_dropped():
    html = """<meta name="citation_author_institution" content="Orphan U">
    <meta name="citation_author" content="Carol">"""
    page = htmlextract.extract_page(html)
    assert page["mentions"] == [("Carol", "", "meta")]


UL_HTML = """<html><body><ul class="item authors">
<li><span class="name"> Dana  Lee </span><span class="affiliation">Inst X</span></li>
<li><span class="name">Evan</span></li>
<li><div><span class="name">Nested Kid</span></div></li>
<li><ul><li><span class="name">TooDeep</span></li></ul></li>
</ul>
<ul class="authors"><li><span class="name">SecondUL ignored</span></li></ul>
</body></html>"""


def test_ul_authors_extraction():
    page = htmlextract.extract_page(UL_HTML)
    authors = [m[0] for m in page["mentions"]]
    # direct li children only; spans found recursively inside each li;
    # nested ul's li contributes its own li at depth -> the nested li is
    # NOT a direct child of ul.authors, but its span IS a descendant of
    # the outer li -> bs4 find would pick it up for that outer li
    assert "DanaLee" == page["mentions"][0][0].replace(" ", "") or authors[0] == "Dana  Lee".strip()
    assert page["mentions"][0][1] == "Inst X"
    assert ("Evan", "", "ul.authors") in page["mentions"]
    assert "SecondUL ignored" not in authors  # only first ul.authors


def test_merge_ul_original_wins():
    html = """<meta name="citation_author" content="Frank  Ocean">
<meta name="citation_author_institution" content="MIT">
<ul class="authors"><li><span class="name">Frank  Ocean</span>
<span class="affiliation">MIT</span></li></ul>"""
    page = htmlextract.extract_page(html)
    # same stripped key, sources union sorted, ul original text kept
    assert page["mentions"] == [("Frank  Ocean", "MIT", "meta;ul.authors")]


def test_merge_meta_content_stripped_at_tag_time():
    # the reference strips meta content when reading the tag
    # (parse_landing_page_html.py:62), so originals are stored stripped
    html = """<meta name="citation_author" content="G. Host ">
<meta name="citation_author_institution" content=" Pad U ">"""
    page = htmlextract.extract_page(html)
    assert page["mentions"] == [("G. Host", "Pad U", "meta")]


def test_text_extraction_deterministic_and_skips_script():
    html = """<html><head><title>T</title><script>var x=1;</script>
<style>.a{}</style></head><body><h1>Header</h1>
<p>Some   text
here</p><div>More</div></body></html>"""
    page = htmlextract.extract_page(html)
    assert page["text"] == "Header\nSome text here\nMore"
    assert htmlextract.extract_page(html)["text"] == page["text"]


def test_malformed_html_never_raises():
    for bad in ["<html><ul class='authors'><li><span class='name'>X",
                "<<<>>><meta name='citation_author' content='Y'>",
                b"\xff\xfe garbage <meta name='citation_author' content='Z'>",
                ""]:
        page = htmlextract.extract_page(bad)
        assert isinstance(page["mentions"], list)
        assert isinstance(page["text"], str)


# ---------- additional property coverage ----------

@given(st.text(max_size=30), st.text(max_size=30))
def test_jaro_winkler_bounds_symmetry(a, b):
    v = similarity.jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert similarity.jaro_winkler(b, a) == pytest.approx(v)
    if a == b and a:
        assert v == 1.0


@given(st.text(alphabet="abcd ", max_size=25), st.text(alphabet="abcd ", max_size=25))
def test_indel_triangle_inequality_via_lengths(a, b):
    # indel distance is a metric: d(a,b) <= len(a)+len(b); d(a,a)=0
    d = similarity.indel_distance(a, b)
    assert 0 <= d <= len(a) + len(b)
    assert similarity.indel_distance(a, a) == 0


def test_path_key_variants():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.records import (
        path_key,
    )

    assert path_key("https://h/index.php/rev1/article/view/42") == "rev1/article/view/42"
    assert path_key("http://x/index.php/REV1/article/view/42/version/1") == "rev1/article/view/42"
    assert path_key("https://h/index.php/misc/issue/view/9") == "misc/issue/view/9"
    assert path_key("https://h/other/shape") == ""
    assert path_key(None) == ""


def test_merge_mentions_order_and_provenance_invariants():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.htmlextract import (
        merge_mentions,
    )

    meta = [("A", ["X", "Y"], "meta"), ("B", [], "meta")]
    ul = [("B", "Z", "ul.authors"), ("A", "X", "ul.authors")]
    rows = merge_mentions(meta, ul)
    # meta keys first in insertion order, new ul keys appended
    assert [r[0] for r in rows] == ["A", "A", "B", "B"]
    by_key = {(r[0], r[1]): r[2] for r in rows}
    assert by_key[("A", "X")] == "meta;ul.authors"  # provenance union, sorted
    assert by_key[("B", "Z")] == "ul.authors"
    assert by_key[("B", "")] == "meta"


@given(st.integers(min_value=-10**15, max_value=10**15))
def test_timestamp_never_raises(ms):
    out = timestamps.format_epoch_ms(ms)
    assert isinstance(out, str)
    if out:
        assert len(out) == 14 and out.isdigit()


@given(st.integers(min_value=1, max_value=(1 << 61) - 2),
       st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=200)
def test_mulmod_p_exact(a, x):
    """The numpy limb-split (a*x) mod 2^61-1 must match Python bigints
    (a bare uint64 multiply wraps mod 2^64 first — the bug ADVICE'd)."""
    import numpy as np

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.minhash import (
        _MERSENNE, _mulmod_p,
    )

    x_mod = x % _MERSENNE
    got = _mulmod_p(np.array([a], dtype=np.uint64), np.array([x_mod], dtype=np.uint64))
    assert int(got[0]) == (a * x_mod) % _MERSENNE


def test_format_elapsed_tiers():
    assert timestamps.format_elapsed(3723.5) == "1h 2m 3s"
    assert timestamps.format_elapsed(62.9) == "1m 2s"
    assert timestamps.format_elapsed(1.234) == "1.234s"
    assert timestamps.format_elapsed(0.0) == "0.000s"
    assert timestamps.format_elapsed(0.9996) == "0.999s"   # truncation parity
    assert timestamps.format_elapsed(59.9996) == "59.999s"
    assert timestamps.format_elapsed(60.9996) == "1m 0s"
    assert timestamps.format_elapsed(3600.9996) == "1h 0m 0s"


def test_bounded_cache_caps():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.similarity import (
        BoundedCache,
    )

    c = BoundedCache(max_items=3, max_cost=100)
    for i in range(3):
        assert c.get_or_build(f"k{i}", lambda i=i: i, cost=10) == i
    assert len(c) == 3
    c.get_or_build("k3", lambda: 3, cost=10)  # item cap -> wholesale clear
    assert len(c) == 1 and c["k3"] == 3
    c.get_or_build("big", lambda: "x", cost=95)
    c.get_or_build("next", lambda: "y", cost=1)  # cost cap tripped
    assert "big" not in c and c["next"] == "y"
    # cached value is returned without rebuilding
    calls = []
    c.get_or_build("next", lambda: calls.append(1), cost=1)
    assert not calls


def test_indel_ratios_bulk_bit_exact_with_scalar():
    """The vectorized batch InDel kernel must be BIT-identical to the
    scalar bit-parallel kernel on every input class: empty strings,
    equal strings, ASCII fast path, non-ASCII fallback, >63-char
    fallback, ragged lengths."""
    import random

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.similarity import (
        indel_ratio,
        indel_ratios_bulk,
    )

    rng = random.Random(99)
    alphabet = "abcdefghij xyz,."
    cases = [("", ""), ("a", ""), ("", "b"), ("same str", "same str"),
             ("café au lait", "cafe du lait"),
             ("日本語テキスト", "日本語のテキスト"),
             ("x" * 70, "x" * 40 + "y" * 40),
             ("x" * 64, "x" * 64 + "y")]
    for _ in range(3000):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 70)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 90)))
        cases.append((a, b))
    got = indel_ratios_bulk(cases)
    for (a, b), s in zip(cases, got):
        assert s == indel_ratio(a, b), (a, b, s)


def test_levenshtein_bulk_bit_exact_with_scalar():
    """The Myers bit-parallel batch kernel must equal the scalar DP on
    every input class: empties, equal strings, ASCII fast path,
    non-ASCII fallback, >63-char pattern fallback, ragged lengths."""
    import random

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.similarity import (
        levenshtein,
        levenshtein_bulk,
    )

    rng = random.Random(41)
    alphabet = "abcdef xy,."
    cases = [("", ""), ("a", ""), ("", "b"), ("same str", "same str"),
             ("café au lait", "cafe du lait"),
             ("日本語テキスト", "日本語のテキスト"),
             ("x" * 70, "x" * 40 + "y" * 40),
             ("x" * 63, "x" * 63 + "y"),
             ("kitten", "sitting")]
    for _ in range(3000):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 70)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 90)))
        cases.append((a, b))
    got = levenshtein_bulk(cases)
    for (a, b), d in zip(cases, got):
        assert d == levenshtein(a, b), (a, b, d)


def test_phonetic_key_known_values():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.textnorm import (
        phonetic_key,
    )

    # classic Soundex values where our simplification agrees
    assert phonetic_key("Robert") == "R163"
    assert phonetic_key("Rupert") == "R163"
    assert phonetic_key("robert") == "R163"          # case-insensitive
    assert phonetic_key("Ashcraft") == "A261"        # S+C collapse across H
    assert phonetic_key("Pfister") == "P236"         # P,F same code -> strip run
    # documented deliberate divergence: dropped letters do not separate
    # runs, so Tymczak's Z/K collapse across the vowel (archival: T522)
    assert phonetic_key("Tymczak") == "T520"
    # the fixture misspelling pair blocks together
    assert phonetic_key("petrov") == phonetic_key("petrof") == "P361"
    # short names zero-pad; vowel-only keeps the letter
    assert phonetic_key("Lee") == "L000"
    assert phonetic_key("A") == "A000"
    # non-letters ignored; degenerate inputs
    assert phonetic_key("o'brien-2") == phonetic_key("obrien")
    assert phonetic_key("") == ""
    assert phonetic_key("123") == ""
    assert phonetic_key(None) == ""


def test_phonetic_key_matches_sql_derivation():
    """The DuckDB re-derivation used by the q_phonetic_blocks oracle
    (translate + six per-digit run-collapses + first-code strip) must be
    bit-identical to the Python kernel on random strings."""
    import random

    import duckdb

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.textnorm import (
        phonetic_key,
    )

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyzBCXZ '-."
    names = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
             for _ in range(500)] + ["Robert", "Tymczak", "aeiou", "hwy"]
    con = duckdb.connect()
    got = con.execute(r"""
        WITH s AS (
          SELECT name,
                 regexp_replace(upper(name), '[^A-Z]', '', 'g') AS letters
          FROM (SELECT unnest($1) AS name)),
        p AS (
          SELECT name, substr(letters, 1, 1) AS first,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(regexp_replace(
                     translate(letters, 'BFPVCGJKQSXZDTLMNRAEIOUHWY',
                               '111122222222334556'),
                     '1+', '1', 'g'), '2+', '2', 'g'), '3+', '3', 'g'),
                   '4+', '4', 'g'), '5+', '5', 'g'), '6+', '6', 'g') AS coll
          FROM s)
        SELECT name,
               CASE WHEN first = '' THEN '' ELSE first || substr(
                 CASE WHEN coll <> '' AND substr(coll, 1, 1) =
                           translate(first, 'BFPVCGJKQSXZDTLMNRAEIOUHWY',
                                     '111122222222334556')
                      THEN substr(coll, 2) ELSE coll END || '000', 1, 3)
               END AS k
        FROM p
    """, [names]).fetchall()
    for name, k in got:
        assert k == phonetic_key(name), name


def test_minhash_batch_bit_identical_to_scalar():
    """signatures() (factorize + gather + one reduceat, duplicates kept
    since min is idempotent) must be BIT-identical to per-row
    signature() for arbitrary unicode/empty/short texts, with shared
    and fresh caches."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.minhash import (
        MinHasher,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(max_size=40), max_size=12))
    def check(texts):
        import numpy as np

        fresh = MinHasher(8).signatures(texts)
        warm = MinHasher(8)
        per_row = [warm.signature(t) for t in texts]
        again = warm.signatures(texts)  # warm-cache path
        assert fresh.shape == (len(texts), 8)
        for i, sig in enumerate(per_row):
            assert (fresh[i] == sig).all()
            assert (again[i] == sig).all()

    check()
