"""URL key derivation for blocking.

Reimplements the reference's URL semantics from scratch:
- OAI-suffix stripping (`get_journal_base_urls_from_pkp_beacon_file.py:22-36`):
  strip the FIRST matching suffix of the fixed table, then stop.
- (scheme, host, port) equality key with known default ports
  (`get-openalex...src/main.rs:235-243` uses rust Url's
  port_or_known_default; here: http->80, https->443).
- scheme/netloc validation with http:// prefix repair
  (`parse_record_data_from_files.py:84-102`).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

OAI_SUFFIXES = (
    "/journal/index.php/index/oai",
    "/index.php/index/oai",
    "/oai",
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}


def strip_oai_suffix(oai_url) -> str:
    """OAI endpoint URL -> journal base URL. First matching suffix wins;
    non-strings/empty -> ''."""
    if not oai_url or not isinstance(oai_url, str):
        return ""
    for suffix in OAI_SUFFIXES:
        if oai_url.endswith(suffix):
            return oai_url[: -len(suffix)]
    return oai_url


def ensure_scheme(url) -> str:
    """Require scheme+netloc; a bare netloc gets 'http://' prepended;
    otherwise '' (invalid)."""
    if not url or not isinstance(url, str):
        return ""
    url = url.strip()
    if not url:
        return ""
    parts = urlsplit(url)
    if parts.scheme and parts.netloc:
        return url
    if not parts.scheme and not parts.netloc and parts.path:
        candidate = "http://" + url
        p2 = urlsplit(candidate)
        if p2.netloc:
            return candidate
    return ""


def url_key(url):
    """URL -> (scheme, host, port) equality key, or None if unparseable.

    Host is lowercased (like rust's Url), port falls back to the scheme's
    known default (port_or_known_default parity); unknown scheme with no
    explicit port -> port 0.
    """
    if not url or not isinstance(url, str):
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    try:
        host = parts.hostname
        port = parts.port
    except ValueError:
        return None
    if not scheme or not host:
        return None
    if port is None:
        port = _DEFAULT_PORTS.get(scheme, 0)
    return (scheme, host, port)


_AUTHORITY_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+")


def canonical_url(url) -> str:
    """Crawl-dedup canonical form of a URL. Deliberately defined by
    three string rules (each expressible verbatim in SQL, so the op is
    oracle-checkable bit-for-bit):

    1. drop the fragment  (everything from the first ``#``),
    2. lowercase the ``scheme://authority`` prefix when present,
    3. strip one trailing ``/``.

    Non-strings/empty -> ''. This is the equality key for
    keep-latest-crawl dedup, not a validator — rule 2 only fires when
    the prefix parses, otherwise the string passes through."""
    if not url or not isinstance(url, str):
        return ""
    u = url.split("#", 1)[0]
    m = _AUTHORITY_RE.match(u)
    if m:
        u = u[: m.end()].lower() + u[m.end():]
    if u.endswith("/"):
        u = u[:-1]
    return u


def host_key(url) -> str:
    """String form of url_key for use as a blocking-key column:
    'scheme://host:port', or '' when invalid."""
    key = url_key(url)
    if key is None:
        return ""
    return f"{key[0]}://{key[1]}:{key[2]}"
