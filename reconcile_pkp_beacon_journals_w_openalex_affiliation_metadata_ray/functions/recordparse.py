"""Raw JSONL record parsers (M6/M7): nested OpenAlex / Crossref lines
-> the flat 11-column work-metadata row contract.

Parity targets (all in the public reference tree):
- column contract + status accounting:
  `parse_record_data_from_files/parse_record_data_from_files.py:15-27,421-433`
- OpenAlex extractor with the primary_location -> best_oa_location
  fallback chain for landing/pdf URL and DOI, the parse_status enum and
  never-throw semantics: same file `:189-312`
- Crossref extractor (resource.primary.URL, DOI, deposited.timestamp):
  same file `:116-186`
- URL validation with the http:// repair branch: same file `:84-102`
- DOI-prefix extraction: same file `:29,105-113`

Everything here is a pure per-line function — the distributed execution
lives in ``stages/parse_records.py``.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone
from urllib.parse import unquote, urlparse

ROW_COLUMNS = [
    "member_id",
    "prefix",
    "doi",
    "url",
    "pdf_url",
    "deposit_timestamp_yyyymmddhhmmss",
    "openalex_id",
    "source_file_relative",
    "line_number",
    "parse_status",
    "parse_error_details",
]

DOI_PREFIX_REGEX = re.compile(r"^(?:https?://doi\.org/)?(10\.[0-9]+)(?:/|$)")

# reference uses [1970, now().year + 5]; frozen upper bound keeps results
# wall-clock independent (same policy as functions/timestamps.py)
_MIN_YEAR = 1970
_MAX_YEAR = 2036


def validate_url(url_str):
    """(is_valid, info) — info is the repaired URL on the repair path,
    else the reason string. Message strings mirror the reference
    (`parse_record_data_from_files.py:84-102`) because they feed
    parse_error_details verbatim."""
    if not url_str or not isinstance(url_str, str):
        return False, "URL is missing or not a string"
    try:
        parsed = urlparse(url_str)
        if parsed.scheme and parsed.netloc:
            return True, ""
        if not parsed.scheme and parsed.netloc:
            fixed_url = f"http://{url_str}"
            parsed_fixed = urlparse(fixed_url)
            if parsed_fixed.scheme and parsed_fixed.netloc:
                return True, fixed_url
            return False, f"Invalid structure (even after adding http://): {url_str}"
        return False, f"Invalid structure (missing scheme or netloc): {url_str}"
    except ValueError:
        return False, f"Parsing error for URL: {url_str}"


def extract_prefix_from_doi(doi_str):
    """'10.123/abc' / 'https://doi.org/10.123/abc' -> '10.123' or None."""
    if not doi_str or not isinstance(doi_str, str):
        return None
    match = DOI_PREFIX_REGEX.match(unquote(doi_str))
    return match.group(1) if match else None


def format_deposit_timestamp(deposited_ms):
    """epoch-ms -> ('YYYYMMDDHHMMSS', '') or ('', error-detail). Error
    messages mirror the reference's raised-ValueError texts
    (`parse_record_data_from_files.py:150-169`)."""
    if not deposited_ms or not isinstance(deposited_ms, (int, float)) \
            or isinstance(deposited_ms, bool):
        return None, None  # missing: no status change, no detail
    try:
        ts_seconds = deposited_ms / 1000.0
        if ts_seconds > 0:
            deposited_dt = datetime.fromtimestamp(ts_seconds, tz=timezone.utc)
            if _MIN_YEAR <= deposited_dt.year <= _MAX_YEAR:
                return deposited_dt.strftime("%Y%m%d%H%M%S"), None
            raise ValueError(
                f"Timestamp {deposited_ms} resulted in unreasonable year {deposited_dt.year}")
        raise ValueError(f"Non-positive timestamp value: {deposited_ms}")
    except (ValueError, OSError, TypeError) as dt_err:
        return "", f"Could not format deposit timestamp {deposited_ms}: {dt_err}"


_ID_CLASS_RE = re.compile(r"not a string: <class '(\w+)'>")


def error_class(parse_status: str, parse_error_details: str) -> str:
    """Normalize the free-text ``parse_error_details`` into a stable
    error-class enum that a SQL engine can re-derive INDEPENDENTLY from
    the raw JSON (the driver-facing 11th column; the Python-specific
    message strings themselves stay unit-tested only). Subtypes carry
    the information parse_status lacks: the offending id's Python type
    and the timestamp failure reason."""
    if parse_status == "OK":
        return ""
    if parse_status == "JSON_DECODE_ERROR":
        return "json_decode"
    if parse_status == "JSON_INVALID_STRUCTURE":
        return "not_object"
    if parse_status == "ID_INVALID_TYPE":
        m = _ID_CLASS_RE.search(parse_error_details)
        return f"id_type:{m.group(1) if m else '?'}"
    if parse_status == "URL_INVALID":
        return "url_invalid"
    if parse_status == "URL_MISSING":
        return "url_missing"
    if parse_status == "PDF_URL_INVALID":
        return "pdf_url_invalid"
    if parse_status == "TIMESTAMP_FORMAT_ERROR":
        if "Non-positive" in parse_error_details:
            return "timestamp:non_positive"
        if "unreasonable year" in parse_error_details:
            return "timestamp:bad_year"
        return "timestamp:error"
    return "unexpected"


def _blank_row(source_file: str, line_number: int) -> dict:
    return {
        "member_id": "", "prefix": "", "doi": "", "url": "", "pdf_url": "",
        "deposit_timestamp_yyyymmddhhmmss": "", "openalex_id": "",
        "source_file_relative": source_file, "line_number": line_number,
        "parse_status": "OK", "parse_error_details": "",
    }


def parse_openalex_line(line: str, source_file: str = "", line_number: int = 0):
    """One raw OpenAlex JSONL line -> contract row dict, or None for an
    empty line (the reference skips those without emitting a row,
    `parse_record_data_from_files.py:417-419`). Never raises."""
    row = _blank_row(source_file, line_number)
    status = "OK"
    error_details = ""
    try:
        line_stripped = line.strip()
        if not line_stripped:
            return None
        record = json.loads(line_stripped)
        if not isinstance(record, dict):
            row["parse_status"] = "JSON_INVALID_STRUCTURE"
            row["parse_error_details"] = "Parsed JSON is not a dictionary/object."
            return row

        openalex_id = record.get("id")
        # TRUTHINESS on purpose (not `is not None`): the reference's
        # `if not id: ... elif not isinstance(id, str)` chain
        # (parse_record_data_from_files.py:210-215) means falsy
        # non-string ids (0, 0.0, false, []) are NOT ID_INVALID_TYPE;
        # the DuckDB oracle's id_truthy CASE reproduces the same rule.
        # Locked by tests/test_parse_records.py::test_falsy_id_not_flagged.
        if openalex_id and not isinstance(openalex_id, str):
            if status == "OK":
                status = "ID_INVALID_TYPE"
            error_details += f" | OpenAlex ID field is not a string: {type(openalex_id)}"

        primary_loc = record.get("primary_location")
        if not isinstance(primary_loc, dict):
            primary_loc = None
        best_oa_loc = record.get("best_oa_location")
        if not isinstance(best_oa_loc, dict):
            best_oa_loc = None

        # landing URL: primary_location -> best_oa_location fallback
        url_str = primary_loc.get("landing_page_url") if primary_loc else None
        if not url_str and best_oa_loc:
            url_str = best_oa_loc.get("landing_page_url") or url_str
        is_valid, url_info = validate_url(url_str)
        url = None
        if is_valid:
            url = url_info if isinstance(url_info, str) and url_info.startswith("http") else url_str
        elif url_str:
            if status == "OK":
                status = "URL_INVALID"
            error_details += f" | Landing Page URL Invalid: {url_info}"
        else:
            if status == "OK":
                status = "URL_MISSING"
            error_details += " | Primary and best_oa landing page URL not found or invalid in record."

        # pdf URL: same fallback chain; only flags status when still OK
        pdf_url_str = primary_loc.get("pdf_url") if primary_loc else None
        if not pdf_url_str and best_oa_loc:
            pdf_url_str = best_oa_loc.get("pdf_url") or pdf_url_str
        is_pdf_valid, pdf_info = validate_url(pdf_url_str)
        pdf_url = None
        if is_pdf_valid:
            pdf_url = pdf_info if isinstance(pdf_info, str) and pdf_info.startswith("http") else pdf_url_str
        elif pdf_url_str:
            if status == "OK":
                status = "PDF_URL_INVALID"
            error_details += f" | PDF URL Invalid: {pdf_info}"

        # DOI: top-level -> primary_location -> best_oa_location
        doi_str = record.get("doi")
        if not doi_str and primary_loc:
            doi_str = primary_loc.get("doi")
        if not doi_str and best_oa_loc:
            doi_str = best_oa_loc.get("doi")
        doi = prefix = None
        if doi_str and isinstance(doi_str, str) and doi_str.strip():
            doi = doi_str.strip()
            prefix = extract_prefix_from_doi(doi)

        row.update({
            "doi": doi or "", "url": url or "", "pdf_url": pdf_url or "",
            "prefix": prefix or "",
            "openalex_id": str(openalex_id) if openalex_id else "",
            "parse_status": status,
            "parse_error_details": error_details.strip(" | "),
        })
        return row
    except json.JSONDecodeError as e:
        row["parse_status"] = "JSON_DECODE_ERROR"
        row["parse_error_details"] = f"Invalid JSON: {e} - Line snippet: {line[:100]}..."
        return row
    except Exception as e:  # never-throw contract
        row["parse_status"] = "UNEXPECTED_PARSE_ERROR"
        row["parse_error_details"] = (
            f"Unexpected error parsing line ({type(e).__name__}): {e}"
            f" - Line snippet: {line[:100]}...")
        return row


def parse_crossref_line(line: str, source_file: str = "", line_number: int = 0,
                        path_member_id=None, path_prefix=None):
    """One raw Crossref JSONL line -> contract row dict, or None for an
    empty line. member_id/prefix come from the directory layout
    (<member>/<prefix>/file.jsonl.gz, `parse_record_data_from_files.py:363-375`);
    prefix falls back to the DOI when the path gave none. Never raises."""
    row = _blank_row(source_file, line_number)
    # path-derived fields survive even a JSON decode error
    # (`parse_record_data_from_files.py:396-402` assigns them after parse)
    row["member_id"] = path_member_id or ""
    row["prefix"] = path_prefix or ""
    status = "OK"
    error_details = ""
    try:
        line_stripped = line.strip()
        if not line_stripped:
            return None
        record = json.loads(line_stripped)

        # no dict guard on purpose: the reference calls record.get
        # directly, so a non-dict line raises AttributeError and lands
        # in the UNEXPECTED_PARSE_ERROR branch (`:178-182`)
        url_str = record.get("resource", {}).get("primary", {}).get("URL")
        is_valid, url_info = validate_url(url_str)
        url = None
        if is_valid:
            url = url_info if isinstance(url_info, str) and url_info.startswith("http") else url_str
        elif url_str:
            status = "URL_INVALID"
            error_details = url_info
        else:
            status = "URL_MISSING"
            error_details = "Primary resource URL not found in record."

        doi_str = record.get("DOI")
        doi = doi_str.strip() if doi_str and isinstance(doi_str, str) and doi_str.strip() else None

        deposited_ms = record.get("deposited", {}).get("timestamp")
        deposit_ts, ts_err = format_deposit_timestamp(deposited_ms)
        if ts_err:
            if status == "OK":
                status = "TIMESTAMP_FORMAT_ERROR"
            error_details += f" | {ts_err}"

        prefix = path_prefix or (extract_prefix_from_doi(doi) if doi else None)
        row.update({
            "doi": doi or "", "url": url or "",
            "deposit_timestamp_yyyymmddhhmmss": deposit_ts or "",
            "prefix": prefix or "",
            "parse_status": status, "parse_error_details": error_details,
        })
        return row
    except json.JSONDecodeError as e:
        row["parse_status"] = "JSON_DECODE_ERROR"
        row["parse_error_details"] = f"Invalid JSON: {e} - Line snippet: {line[:100]}..."
        return row
    except Exception as e:
        row["parse_status"] = "UNEXPECTED_PARSE_ERROR"
        row["parse_error_details"] = (
            f"Unexpected error parsing line ({type(e).__name__}): {e}"
            f" - Line snippet: {line[:100]}...")
        return row
