"""M6/M7 parser tests: fallback chain, status enum, never-throw, path
ids, and the Ray stage vs a serial replay of the same fixture tree."""

import gzip
import json
import os

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions import (
    recordparse,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import (
    parse_records,
)


def _oa(line, **kw):
    return recordparse.parse_openalex_line(line, **kw)


def test_openalex_fallback_chain():
    rec = {"id": "https://openalex.org/W1",
           "primary_location": {"landing_page_url": None, "pdf_url": None},
           "best_oa_location": {"landing_page_url": "https://x.org/a",
                                "pdf_url": "https://x.org/a.pdf",
                                "doi": "https://doi.org/10.99/z"}}
    row = _oa(json.dumps(rec))
    assert row["parse_status"] == "OK"
    assert row["url"] == "https://x.org/a"
    assert row["pdf_url"] == "https://x.org/a.pdf"
    assert row["doi"] == "https://doi.org/10.99/z"
    assert row["prefix"] == "10.99"


def test_openalex_statuses():
    assert _oa("") is None  # empty line skipped, no row
    assert _oa("   \n") is None
    r = _oa("{bad json")
    assert r["parse_status"] == "JSON_DECODE_ERROR"
    assert r["parse_error_details"].startswith("Invalid JSON: ")
    assert "Line snippet" in r["parse_error_details"]
    r = _oa("[1, 2]")
    assert r["parse_status"] == "JSON_INVALID_STRUCTURE"
    assert r["parse_error_details"] == "Parsed JSON is not a dictionary/object."
    r = _oa(json.dumps({"id": 123, "primary_location":
                        {"landing_page_url": "https://x.org/a"}}))
    assert r["parse_status"] == "ID_INVALID_TYPE"
    assert r["openalex_id"] == "123"  # still extracted, stringified
    assert r["url"] == "https://x.org/a"  # still extracted
    r = _oa(json.dumps({"id": "W", "primary_location":
                        {"landing_page_url": "not a url"}}))
    assert r["parse_status"] == "URL_INVALID"
    assert r["url"] == ""
    assert "Landing Page URL Invalid:" in r["parse_error_details"]
    r = _oa(json.dumps({"id": "W"}))
    assert r["parse_status"] == "URL_MISSING"
    r = _oa(json.dumps({"id": "W",
                        "primary_location": {"landing_page_url": "https://x.org/a",
                                             "pdf_url": "nope"}}))
    assert r["parse_status"] == "PDF_URL_INVALID"
    assert r["url"] == "https://x.org/a"


def test_crossref_timestamp_and_statuses():
    base = {"DOI": "10.5/x", "resource": {"primary": {"URL": "https://c.org/1"}}}
    r = recordparse.parse_crossref_line(
        json.dumps({**base, "deposited": {"timestamp": 1577836800000}}))
    assert r["parse_status"] == "OK"
    assert r["deposit_timestamp_yyyymmddhhmmss"] == "20200101000000"
    assert r["prefix"] == "10.5"  # DOI fallback when no path prefix

    r = recordparse.parse_crossref_line(
        json.dumps({**base, "deposited": {"timestamp": -5}}))
    assert r["parse_status"] == "TIMESTAMP_FORMAT_ERROR"
    assert "Non-positive timestamp value: -5" in r["parse_error_details"]
    # reference appends with ' | ' even onto empty details (no strip)
    assert r["parse_error_details"].startswith(" | ")

    r = recordparse.parse_crossref_line(
        json.dumps({**base, "deposited": {"timestamp": 33000000000000}}))
    assert r["parse_status"] == "TIMESTAMP_FORMAT_ERROR"
    assert "unreasonable year" in r["parse_error_details"]

    r = recordparse.parse_crossref_line("[1, 2]")
    assert r["parse_status"] == "UNEXPECTED_PARSE_ERROR"
    assert "AttributeError" in r["parse_error_details"]

    # URL_INVALID keeps the raw reason as the full details (no prefix)
    r = recordparse.parse_crossref_line(
        json.dumps({"DOI": "10.5/x",
                    "resource": {"primary": {"URL": "://broken"}}}))
    assert r["parse_status"] == "URL_INVALID"
    assert r["parse_error_details"].startswith("Invalid structure")


def test_crossref_path_ids():
    assert parse_records.crossref_path_ids("501/10.2000/d.jsonl.gz") == ("501", "10.2000")
    m, p = parse_records.crossref_path_ids("abc/9.99/d.jsonl.gz")
    assert m == "INVALID_PATH_MEMBER (abc)"
    assert p == "INVALID_PATH_PREFIX (9.99)"
    assert parse_records.crossref_path_ids("flat.jsonl.gz") == (None, None)


def test_parse_stage_matches_serial(ray_session, tmp_path):
    """The Ray fan-out over files must equal a serial replay line by
    line (order-insensitively) — including line numbers that skip over
    empty lines without renumbering."""
    d = tmp_path / "tree"
    lines0 = [json.dumps({"id": f"W{i}", "primary_location":
                          {"landing_page_url": f"https://h.org/{i}"}})
              for i in range(7)]
    lines0.insert(2, "")          # empty line: skipped, burns a line number
    lines0.insert(4, "{oops")     # decode error
    (d / "a").mkdir(parents=True)
    with gzip.open(d / "a" / "x.jsonl.gz", "wt") as f:
        f.write("\n".join(lines0) + "\n")
    with gzip.open(d / "y.jsonl.gz", "wt") as f:
        f.write(json.dumps({"id": "Wz"}) + "\n")

    ds = parse_records.parse_record_files(str(d), "openalex")
    got = sorted((r["source_file_relative"], r["line_number"], r["parse_status"],
                  r["url"]) for r in ds.take_all())

    want = []
    for rel in parse_records.discover_jsonl_gz(str(d)):
        for row in parse_records._parse_file(str(d), rel, "openalex"):
            want.append((row["source_file_relative"], row["line_number"],
                         row["parse_status"], row["url"]))
    assert got == sorted(want)
    # the empty line occupied line number 3: no row has it, successor kept 4
    nums = [n for rel, n, *_ in got if rel == os.path.join("a", "x.jsonl.gz")]
    assert 3 not in nums and 4 in nums


def test_enrich_url_status_branches(ray_session):
    """M17 columns follow the reference's exact branch/message flow
    (`retrieve_pkp_work_url_download_pdf.py:105-163`) under the fake
    checker."""
    import pandas as pd
    import ray.data as rds

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import (
        enrich,
    )

    df = pd.DataFrame({
        "pdf_url": ["https://h.org/article/download/1", "", "", "https://dead.org/x.pdf", ""],
        "url": ["", "https://h.org/article/view/2", "", "", "https://h.org/a/download/5"],
        "openalex_id": ["https://openalex.org/W11", "https://openalex.org/W22", "W33",
                        "https://openalex.org/W44", "12345"],
    })
    out = enrich.enrich_url_status(rds.from_pandas(df)).to_pandas()
    # pdf_url wins; valid id -> downloaded
    assert out.loc[0, "url_to_check"] == "https://h.org/article/download/1"
    assert bool(out.loc[0, "url_resolves"]) and bool(out.loc[0, "url_is_pdf"])
    assert out.loc[0, "downloaded_filename"] == "W11.pdf"
    assert out.loc[0, "processing_error"] == ""
    # landing page: resolves, not a pdf, double-message accumulation
    assert bool(out.loc[1, "url_resolves"]) and not bool(out.loc[1, "url_is_pdf"])
    assert out.loc[1, "processing_error"] == (
        "Content-Type: text/html; Not PDF based on Content-Type (Content-Type: text/html)")
    # no url at all
    assert out.loc[2, "processing_error"] == "No URL available in pdf_url or url fields"
    # dead host: does not resolve
    assert not bool(out.loc[3, "url_resolves"])
    assert out.loc[3, "processing_error"] == "HTTP Status: 404"
    # pdf but id not W+digits -> filename error (M16 shape validation)
    assert bool(out.loc[4, "url_is_pdf"])
    assert out.loc[4, "downloaded_filename"] == ""
    assert out.loc[4, "processing_error"] == "Cannot generate filename from OpenAlex ID"


def test_extract_filename_from_openalex_id():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.enrich import (
        extract_filename_from_openalex_id as f,
    )

    assert f("https://openalex.org/W123") == "W123.pdf"
    assert f("W9") == "W9.pdf"
    assert f("https://openalex.org/A123") is None
    assert f("") is None and f(None) is None and f(123) is None
    assert f("https://openalex.org/Wabc") is None


def test_parse_records_per_file_resume(ray_session, tmp_path):
    """S10: the gzip shard is the resume unit — a rerun parses nothing,
    touching one file reparses only that file."""
    d = tmp_path / "in"
    (d / "sub").mkdir(parents=True)
    for i, rel in enumerate(["a.jsonl.gz", "sub/b.jsonl.gz"]):
        with gzip.open(d / rel, "wt") as f:
            for j in range(3):
                f.write(json.dumps({"id": f"W{i}{j}", "primary_location":
                                    {"landing_page_url": f"https://h.org/{i}{j}"}}) + "\n")
    wd = str(tmp_path / "ckpt")

    ds1, parsed1, skipped1 = parse_records.parse_record_files_checkpointed(
        str(d), "openalex", wd)
    assert (parsed1, skipped1) == (2, 0)
    assert ds1.count() == 6

    ds2, parsed2, skipped2 = parse_records.parse_record_files_checkpointed(
        str(d), "openalex", wd)
    assert (parsed2, skipped2) == (0, 2)
    assert sorted(r["openalex_id"] for r in ds2.take_all()) == \
           sorted(r["openalex_id"] for r in ds1.take_all())

    # modify one file -> only it is reparsed
    import time
    time.sleep(1.1)  # mtime granularity
    with gzip.open(d / "a.jsonl.gz", "wt") as f:
        f.write(json.dumps({"id": "Wnew", "primary_location":
                            {"landing_page_url": "https://h.org/new"}}) + "\n")
    ds3, parsed3, skipped3 = parse_records.parse_record_files_checkpointed(
        str(d), "openalex", wd)
    assert (parsed3, skipped3) == (1, 1)
    ids = sorted(r["openalex_id"] for r in ds3.take_all())
    assert ids == ["W10", "W11", "W12", "Wnew"]


def test_falsy_id_not_flagged():
    """Reference truthiness parity (parse_record_data_from_files.py:
    210-215): a FALSY non-string id (0, 0.0, false, [], "") is NOT
    ID_INVALID_TYPE — `if not id: ... elif not isinstance(id, str)`.
    The DuckDB oracle's id_truthy CASE encodes the same rule; this
    test locks the Python side so a well-meaning `is not None`
    "fix" can't silently break cross-engine parity (ADVICE r3
    adjudicated: declined, reference behavior wins)."""
    for falsy in (0, 0.0, False, [], ""):
        r = _oa(json.dumps({"id": falsy, "primary_location":
                            {"landing_page_url": "https://x.org/a"}}))
        assert r["parse_status"] == "OK", falsy
        assert r["openalex_id"] == ""
    # truthy non-strings ARE flagged, and the id is stringified
    for truthy, rendered in ((123, "123"), (True, "True"), ([1], "[1]")):
        r = _oa(json.dumps({"id": truthy, "primary_location":
                            {"landing_page_url": "https://x.org/a"}}))
        assert r["parse_status"] == "ID_INVALID_TYPE", truthy
        assert r["openalex_id"] == rendered
