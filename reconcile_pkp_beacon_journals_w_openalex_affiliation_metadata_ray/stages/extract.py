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

import os

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


def _rowgroup_items(pages_path: str, target_rows: int, min_tasks: int):
    """Balanced (file, row-group-list) task descriptors for a parquet
    file or a per-shard directory. Chunks never span files; each chunk
    carries ~target_rows rows so per-task decompressed HTML stays
    bounded at any corpus size."""
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(pages_path):
        files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    else:
        files = [pages_path]
    total_rows = 0
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        per_file.append((f, rows))
        total_rows += sum(rows)
    # enough tasks to keep every CPU busy, small enough rows per task
    # that batch x concurrency fits in worker heap
    target = max(1, min(target_rows, -(-total_rows // max(1, min_tasks))))
    items = []
    for f, rows in per_file:
        cur: list[int] = []
        cur_rows = 0
        for i, r in enumerate(rows):
            cur.append(i)
            cur_rows += r
            if cur_rows >= target:
                items.append({"path": f, "rgs": cur})
                cur, cur_rows = [], 0
        if cur:
            items.append({"path": f, "rgs": cur})
    return items


def _read_extract_task(batch: pa.Table) -> pa.Table:
    import pyarrow.parquet as pq

    out = []
    for path, rgs in zip(batch["path"].to_pylist(), batch["rgs"].to_pylist()):
        tbl = pq.ParquetFile(path).read_row_groups(
            rgs, columns=["url", "lang", "html"])
        out.append(extract_batch(tbl))
    return pa.concat_tables(out) if out else extract_batch(
        pa.table({"url": pa.array([], pa.string()),
                  "lang": pa.array([], pa.string()),
                  "html": pa.array([], pa.binary())}))


def read_extract_pages(pages_path: str, target_rows: int = 16384):
    """pages parquet (file or shard directory) -> extracted Dataset,
    with the read FUSED into the extract task.

    Ray 2.49 never fuses a Read operator with a downstream map, so
    ``read_parquet(...) |> extract_pages`` ships every raw HTML block
    through the object store (serialize + plasma write + read) just to
    parse it once and drop it — measured 9.5-10.6 s for the sf0.1
    extract-only leg vs 2.7-4.0 s fused (the html column is ~3x the
    extracted output). Here each task reads its own row groups
    (columns pruned to the EXTRACT_COLUMNS contract) and emits
    extracted rows directly; the html bytes never leave the task. Row
    order equals read_parquet order (row-group order), and the
    per-row extraction is the same `extract_batch`, so output is
    byte-identical to the unfused path (equivalence-tested)."""
    import ray
    import ray.data as rd

    try:
        min_tasks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)
    except Exception:
        min_tasks = 32
    items = _rowgroup_items(pages_path, target_rows, min_tasks)
    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        _read_extract_task, batch_size=1, batch_format="pyarrow")


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
