"""M17 — per-row URL-status enrichment (the 5 derived columns).

Parity target: `download_sample_pkp_pdfs/retrieve_pkp_work_url_download_pdf/
retrieve_pkp_work_url_download_pdf.py` — `get_url_to_check` (`:24-28`),
`extract_filename_from_openalex_id` (`:67-76`, which is also the
OpenAlex-ID shape validation M16: last path segment must be 'W'+digits),
and the row enrichment contract + error-message flow (`:94-163`):
appended columns url_to_check, url_resolves, url_is_pdf,
downloaded_filename, processing_error.

The reference's checker is a live HTTP HEAD + GET download — network is
out of scope here by design, so the checker is pluggable:
``checker="fake"`` is a deterministic, SQL-expressible stand-in
(resolves = url does not contain 'dead'; pdf = path contains
'/download/' or ends '.pdf'; no bytes are written) and
``checker="real"`` raises NotImplementedError where requests would be
used. The branch structure, message strings and column contract are the
real, tested parts — swap the checker for requests.head/get on a
networked deployment.
"""

from __future__ import annotations

import pandas as pd


def get_url_to_check(pdf_url, url) -> str:
    """pdf_url wins when non-blank, else url (`:24-28`)."""
    p = (pdf_url or "").strip()
    if p:
        return p
    return (url or "").strip()


def extract_filename_from_openalex_id(openalex_id_url):
    """'https://openalex.org/W123' -> 'W123.pdf'; None when the last
    path segment is not 'W'+digits (`:67-76`)."""
    if not openalex_id_url or not isinstance(openalex_id_url, str):
        return None
    try:
        name_part = openalex_id_url.strip().split("/")[-1]
        if name_part.startswith("W") and name_part[1:].isdigit():
            return f"{name_part}.pdf"
    except Exception:
        pass
    return None


def fake_check_url_status(url_to_check):
    """Deterministic stand-in for the HTTP HEAD (`:31-49`): same return
    contract (resolves, is_pdf_by_content_type, err_msg)."""
    if not url_to_check:
        return False, False, "No URL provided"
    if "dead" in url_to_check:
        return False, False, "HTTP Status: 404"
    path = url_to_check.split("?")[0]
    if "/download/" in path or path.endswith(".pdf"):
        return True, True, None
    return True, False, "Content-Type: text/html"


def _check(checker: str, url_to_check: str):
    if checker == "fake":
        return fake_check_url_status(url_to_check)
    raise NotImplementedError(
        "real URL checking requires network access (requests.head), "
        "not available in this environment")


def enrich_batch(batch: pd.DataFrame, checker: str = "fake",
                 pdf_url_col: str = "pdf_url", url_col: str = "url",
                 id_col: str = "openalex_id") -> pd.DataFrame:
    """Append the 5 derived columns to every row, mirroring the
    reference's control flow and message strings (`:105-163`) minus the
    actual download (the fake checker 'downloads' nothing; a valid
    filename is recorded as downloaded_filename exactly as a successful
    download would)."""
    to_check, resolves_c, is_pdf_c, fname_c, err_c = [], [], [], [], []
    for pdf_url, url, oid in zip(batch[pdf_url_col], batch[url_col], batch[id_col]):
        url_to_check = get_url_to_check(pdf_url, url)
        resolves = is_pdf = False
        fname = ""
        err = ""
        if not url_to_check:
            err = "No URL available in pdf_url or url fields"
        else:
            resolves, is_pdf_ct, err_msg = _check(checker, url_to_check)
            err = err_msg if err_msg else ""
            if resolves:
                filename_base = extract_filename_from_openalex_id((oid or "").strip())
                if is_pdf_ct:
                    is_pdf = True
                    if filename_base:
                        fname = filename_base
                    else:
                        err = "Cannot generate filename from OpenAlex ID"
                else:
                    if err:
                        err += f"; Not PDF based on Content-Type ({err_msg})"
                    else:
                        err = f"Not PDF based on Content-Type ({err_msg})"
        to_check.append(url_to_check)
        resolves_c.append(resolves)
        is_pdf_c.append(is_pdf)
        fname_c.append(fname)
        err_c.append(err)
    out = batch.copy()
    out["url_to_check"] = to_check
    out["url_resolves"] = pd.Series(resolves_c, index=batch.index, dtype=bool)
    out["url_is_pdf"] = pd.Series(is_pdf_c, index=batch.index, dtype=bool)
    out["downloaded_filename"] = fname_c
    out["processing_error"] = err_c
    return out


def enrich_url_status(ds, checker: str = "fake", **cols):
    """Stateless map_batches stage appending the 5 M17 columns."""
    return ds.map_batches(lambda b: enrich_batch(b, checker=checker, **cols),
                          batch_format="pandas")
