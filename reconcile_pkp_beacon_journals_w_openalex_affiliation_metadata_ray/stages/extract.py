"""Stage 1 — EXTRACT: pages(html) -> per-page text + mentions.

Ray-Data-native reimplementation of the reference's extractor
(`parse_landing_page_html.py:25-110,189-228`): a stateless
``map_batches`` over zero-copy Arrow batches. The whole document always
lives in one row, so M11's tag-order state machine and D2's
order-sensitive merge are independent of batch boundaries and
parallelism — that is what makes the extracted ``text`` byte-identical
per url at any ``num_cpus`` (BASELINE.json input_hint invariant).

Output is page-granular with Arrow list columns for the mentions
(explode to the flat mention table with :func:`mentions_from_extracted`
— the reference's ``author_affiliation_doi_merged_*.csv`` contract).
HTML parse errors never fail the task; they land in ``parse_error``
status columns (pattern from `parse_record_data_from_files.py:421-433`).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.htmlextract import extract_page

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("doi", pa.string()),
        ("text", pa.string()),
        ("mention_authors", pa.list_(pa.string())),
        ("mention_insts", pa.list_(pa.string())),
        ("mention_sources", pa.list_(pa.string())),
        ("has_author_tag", pa.bool_()),
        ("has_inst_tag", pa.bool_()),
        ("has_ul_authors", pa.bool_()),
        ("parse_error", pa.string()),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Per-batch kernel: parse every page's HTML. The per-document loop
    is irreducible (HTML parsing is per-document work, like model
    inference); everything around it stays Arrow."""
    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    htmls = batch["html"].to_pylist()
    out = {name: [] for name in EXTRACTED_SCHEMA.names}
    for url, lang, html in zip(urls, langs, htmls):
        err = ""
        try:
            page = extract_page(html)
        except Exception as exc:  # record-level never-fatal contract
            page = {"mentions": [], "doi": "", "text": "", "has_author_tag": False,
                    "has_inst_tag": False, "has_ul_authors": False}
            err = f"extract error: {exc}"
        out["url"].append(url)
        out["lang"].append(lang or "")
        out["doi"].append(page["doi"])
        out["text"].append(page["text"])
        out["mention_authors"].append([m[0] for m in page["mentions"]])
        out["mention_insts"].append([m[1] for m in page["mentions"]])
        out["mention_sources"].append([m[2] for m in page["mentions"]])
        out["has_author_tag"].append(page["has_author_tag"])
        out["has_inst_tag"].append(page["has_inst_tag"])
        out["has_ul_authors"].append(page["has_ul_authors"])
        out["parse_error"].append(err)
    return pa.Table.from_pydict(out, schema=EXTRACTED_SCHEMA)


def extract_pages(pages_ds, batch_size: int = 256):
    """pages Dataset -> extracted Dataset (one row per page).

    batch_size is modest because html payloads are large (keep
    batch x concurrency within worker heap; SURVEY.md §4 memory row)."""
    return pages_ds.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Vectorized explode of the list columns to flat mention rows
    (url, doi, author, institution, source) — the reference's merged
    CSV shape (`parse_landing_page_html.py:241-245`)."""
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table(
            {"url": pa.array([], pa.string()), "doi": pa.array([], pa.string()),
             "author": pa.array([], pa.string()), "institution": pa.array([], pa.string()),
             "source": pa.array([], pa.string())}
        )

    def _col(name):
        col = batch[name]
        return col.chunk(0) if isinstance(col, pa.ChunkedArray) else col

    n_per_row = pa.compute.list_value_length(_col("mention_authors")).fill_null(0)
    idx = _repeat_indices(n_per_row)
    return pa.table(
        {
            "url": _col("url").take(idx),
            "doi": _col("doi").take(idx),
            "author": _col("mention_authors").flatten(),
            "institution": _col("mention_insts").flatten(),
            "source": _col("mention_sources").flatten(),
        }
    )


def _repeat_indices(counts: pa.Array) -> pa.Array:
    """[2,0,3] -> [0,0,2,2,2] (row index repeated by its list length)."""
    import numpy as np

    c = counts.to_numpy(zero_copy_only=False).astype("int64")
    return pa.array(np.repeat(np.arange(len(c), dtype="int64"), c))


def mentions_from_extracted(extracted_ds):
    """Flat mention table (one row per merged (author, institution))."""
    return extracted_ds.map_batches(explode_mentions, batch_format="pyarrow", zero_copy_batch=True)


def oracle_extract(pages_table: pa.Table) -> dict:
    """Single-threaded oracle: url -> (text, mentions, doi). The Ray
    stage's output must equal this byte-for-byte per url at any
    parallelism (SURVEY.md §5 item 2)."""
    out = {}
    for i in range(pages_table.num_rows):
        url = pages_table["url"][i].as_py()
        page = extract_page(pages_table["html"][i].as_py())
        out[url] = {"text": page["text"], "mentions": page["mentions"], "doi": page["doi"]}
    return out
