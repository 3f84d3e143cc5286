"""DOI parsing / keys.

Two DOI-prefix extractors exist in the reference with different
semantics; both are reimplemented:
- regex variant (`parse_record_data_from_files.py:29,105-113`):
  percent-decode then ``^(?:https?://doi\\.org/)?(10\\.[0-9]+)(?:/|$)``.
- rust variant (`get-openalex...src/main.rs:289-315`): rfind("10."),
  next char must be digit or '/', prefix must be '10.'-led and >3 chars;
  failures classify as '_unknown_' (the partition-key fallback,
  `main.rs:714-720`).
Plus the cleaner that strips 'https://doi.org/' / 'doi:' prefixes
(`check...openalex.py:93-98`) and the base64url filename convention
(`retrieve_landing_pages.py:125-128` / `parse_landing_page_html.py:38-48`).
"""

from __future__ import annotations

import base64
import binascii
import re
from urllib.parse import unquote

DOI_PREFIX_RE = re.compile(r"^(?:https?://doi\.org/)?(10\.[0-9]+)(?:/|$)")

UNKNOWN_PREFIX = "_unknown_"


def doi_prefix(doi_or_url) -> str:
    """Regex variant: returns '10.NNNN' or '' when not found."""
    if not doi_or_url or not isinstance(doi_or_url, str):
        return ""
    m = DOI_PREFIX_RE.match(unquote(doi_or_url.strip()))
    return m.group(1) if m else ""


def doi_prefix_partition(doi) -> str:
    """Rust variant used for output partitioning; '_unknown_' fallback."""
    if not doi or not isinstance(doi, str):
        return UNKNOWN_PREFIX
    s = doi.strip()
    if not s:
        return UNKNOWN_PREFIX
    idx = s.rfind("10.")
    if idx == -1:
        return UNKNOWN_PREFIX
    if len(s) > idx + 3:
        nxt = s[idx + 3]
        if not (nxt.isdigit() or nxt == "/"):
            return UNKNOWN_PREFIX
    part = s[idx:]
    if "/" in part:
        pfx = part.split("/", 1)[0].strip()
    else:
        pfx = part.strip()
    if pfx and pfx.startswith("10.") and len(pfx) > 3:
        return pfx
    return UNKNOWN_PREFIX


def clean_doi(doi) -> str:
    """Strip 'https://doi.org/' or 'doi:' prefix (first occurrence only)."""
    if not doi or not isinstance(doi, str):
        return ""
    if doi.startswith("https://doi.org/"):
        return doi.replace("https://doi.org/", "", 1)
    if doi.startswith("doi:"):
        return doi.replace("doi:", "", 1)
    return doi


def doi_to_record_id(doi: str) -> str:
    """base64url(doi) without padding — the reference's landing-page
    filename convention, kept as our record-id convention."""
    return base64.urlsafe_b64encode(doi.encode("utf-8")).decode("ascii").rstrip("=")


def record_id_to_doi(record_id: str) -> str:
    """Inverse of doi_to_record_id; '' on decode failure (the reference
    logs and continues, `parse_landing_page_html.py:45-48`)."""
    pad = len(record_id) % 4
    if pad:
        record_id += "=" * (4 - pad)
    try:
        return base64.b64decode(record_id, altchars=b"-_").decode("utf-8")
    except (binascii.Error, UnicodeDecodeError, ValueError):
        return ""
