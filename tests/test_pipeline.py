"""End-to-end pipeline gates (SURVEY.md §5):

- byte-identical extracted text per url vs the single-threaded oracle,
  at two parallelism levels (the input_hint invariant);
- pairwise F1 >= 0.99 vs labeled pairs (the BASELINE.json gate);
- distributed connected components vs union-find oracle;
- mention-scorer parity with an independent per-row oracle.
"""

import os

import pyarrow.parquet as pq
import pytest

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.sources import fixtures
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import cluster as cluster_mod
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
    extract_pages,
    mentions_from_extracted,
    oracle_extract,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fdir(ray_session):
    return fixtures.ensure_fixtures(SF)


def test_extraction_byte_identical_two_parallelism_levels(ray_session, fdir):
    import ray.data as rd

    pages_tbl = pq.read_table(os.path.join(fdir, "pages.parquet"))
    oracle = oracle_extract(pages_tbl)

    for num_blocks in (1, 8):
        ds = rd.read_parquet(os.path.join(fdir, "pages.parquet"),
                             override_num_blocks=num_blocks)
        extracted = extract_pages(ds, batch_size=32 if num_blocks == 8 else 256)
        got = {}
        for batch in extracted.iter_batches(batch_size=512, batch_format="pyarrow"):
            for row in batch.select(["url", "text", "doi"]).to_pylist():
                got[row["url"]] = row
        assert set(got) == set(oracle)
        for url, o in oracle.items():
            assert got[url]["text"] == o["text"], f"text differs for {url} at blocks={num_blocks}"
            assert got[url]["doi"] == o["doi"]


def test_mentions_match_oracle(ray_session, fdir):
    import ray.data as rd

    pages_tbl = pq.read_table(os.path.join(fdir, "pages.parquet"))
    oracle = oracle_extract(pages_tbl)
    want = set()
    for url, o in oracle.items():
        for author, inst, source in o["mentions"]:
            want.add((url, o["doi"], author, inst, source))

    ds = rd.read_parquet(os.path.join(fdir, "pages.parquet"))
    mentions = mentions_from_extracted(extract_pages(ds))
    got = set()
    for batch in mentions.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for row in batch.to_pylist():
            got.add((row["url"], row["doi"], row["author"], row["institution"], row["source"]))
    assert got == want


def test_reconcile_f1_gate(ray_session, fdir):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import reconcile

    out = reconcile.run_reconcile(SF)
    clusters = out["clusters"].materialize()
    res = reconcile.pairwise_f1(clusters, os.path.join(fdir, "labeled_pairs.parquet"))
    assert res["f1"] >= 0.99, res
    assert res["precision"] >= 0.99, res
    assert res["recall"] >= 0.99, res
    # the no-collect two-hash-join scale path must produce the IDENTICAL
    # confusion matrix
    via_join = reconcile.pairwise_f1_join(
        clusters, os.path.join(fdir, "labeled_pairs.parquet"))
    assert via_join == res, (via_join, res)


def test_connected_components_vs_union_find(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    # random clusters: partition nodes into chains + extra random intra-cluster edges
    k = 12
    for ci in range(k):
        members = nodes[ci::k]
        for a, b in zip(members, members[1:]):
            edges.append((a, b))
        for _ in range(3):
            i, j = rng.randint(len(members), size=2)
            edges.append((members[i], members[j]))
    oracle = cluster_mod.union_find(edges, nodes)

    edges_ds = rd.from_arrow(pa.table({
        "left_id": [e[0] for e in edges],
        "right_id": [e[1] for e in edges],
    }))
    nodes_ds = rd.from_arrow(pa.table({"record_id": nodes}))
    got_ds = cluster_mod.connected_components(edges_ds, nodes_ds=nodes_ds)
    got = {}
    for batch in got_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for row in batch.to_pylist():
            got[row["record_id"]] = row["cluster_id"]
    assert got == oracle


def _mention_oracle(mention_rows, works_by_doi):
    """Independent reimplementation of `check...openalex.py` semantics
    using the brute-force DP ratio (distinct code path from the
    bit-parallel production kernel)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.textnorm import (
        normalize_text,
    )

    def dp_ratio(a, b):
        # indel distance via classic DP
        m, n = len(a), len(b)
        if m + n == 0:
            return 100.0
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i]
            for j in range(1, n + 1):
                if a[i - 1] == b[j - 1]:
                    cur.append(prev[j - 1])
                else:
                    cur.append(min(prev[j], cur[j - 1]) + 1)
            prev = cur
        return 100.0 * (1 - prev[n] / (m + n))

    out = []
    for rec in mention_rows:
        doi = (rec["doi"] or "").strip()
        if not doi.startswith("10."):
            continue
        auths = works_by_doi.get(doi.lower(), [])
        a_raw, i_raw = rec["author"] or "", rec["institution"] or ""
        a_norm, i_norm = normalize_text(a_raw), normalize_text(i_raw)
        best, best_idx = -1.0, -1
        if a_norm and auths:
            for idx, au in enumerate(auths):
                cur = dp_ratio(a_norm, normalize_text(au.get("raw_author_name") or ""))
                if cur > best:
                    best, best_idx = cur, idx
                    if best == 100.0:
                        break
        row = {"author_similarity_score": 0.0, "institution_similarity_score": 0.0,
               "exact_author_match": False, "normalized_author_match": False,
               "exact_institution_match": False, "normalized_institution_match": False}
        if best_idx != -1:
            au = auths[best_idx]
            api_name = au.get("raw_author_name") or ""
            row["author_similarity_score"] = round(best, 2)
            row["exact_author_match"] = a_raw == api_name
            row["normalized_author_match"] = a_norm == normalize_text(api_name)
            raw_affs = au.get("raw_affiliation_strings") or []
            norm_affs = [normalize_text(x) for x in raw_affs if x]
            norm_affs = [x for x in norm_affs if x]
            if not i_raw:
                row["exact_institution_match"] = not bool(raw_affs)
            elif raw_affs:
                row["exact_institution_match"] = any(i_raw.lower() == x.lower() for x in raw_affs)
            if not i_norm:
                row["normalized_institution_match"] = not bool(norm_affs)
            elif norm_affs:
                row["normalized_institution_match"] = i_norm in norm_affs
            if not i_norm:
                row["institution_similarity_score"] = 100.0 if not norm_affs else 0.0
            elif norm_affs:
                row["institution_similarity_score"] = round(
                    max(dp_ratio(i_norm, x) for x in norm_affs), 2)
        out.append(((rec["url"], doi, a_raw, i_raw), row))
    return dict(out)


def test_mention_scorer_parity(ray_session, fdir):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import reconcile

    _, scored = reconcile.run_mention_scoring(SF)
    got = {}
    for batch in scored.iter_batches(batch_size=1024, batch_format="pandas"):
        for rec in batch.to_dict("records"):
            got[(rec["url"], rec["doi"], rec["author"], rec["institution"])] = rec

    works = pq.read_table(os.path.join(fdir, "reference_works.parquet")).to_pylist()
    works_by_doi = {w["doi"].strip().lower(): w["authorships"] for w in works if w["doi"]}

    import ray.data as rd

    pages_tbl = pq.read_table(os.path.join(fdir, "pages.parquet"))
    oracle_pages = oracle_extract(pages_tbl)
    mention_rows = []
    for url, o in oracle_pages.items():
        for author, inst, source in o["mentions"]:
            mention_rows.append({"url": url, "doi": o["doi"], "author": author,
                                 "institution": inst})
    oracle = _mention_oracle(mention_rows, works_by_doi)

    assert set(got) == set(oracle)
    for key, orow in oracle.items():
        grow = got[key]
        for col, val in orow.items():
            assert grow[col] == pytest.approx(val) if isinstance(val, float) else grow[col] == val, (
                key, col, grow[col], val)


def test_shuffle_scoring_equals_broadcast(ray_session, fdir):
    """The big-big (shuffle-join) scoring path must produce exactly the
    broadcast path's scored rows."""
    import ray

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import (
        reconcile,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import (
        block, records, score,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
        extract_pages,
    )

    _, pages, works = reconcile.load_tables(SF)
    recs = records.build_records(extract_pages(pages), works).materialize()
    pairs = block.candidate_pairs(recs).materialize()

    rec_ref = score.broadcast_records(recs)
    via_broadcast = score.score_pairs(pairs, rec_ref).to_pandas()
    via_shuffle = score.score_pairs_shuffle(pairs, recs).to_pandas()

    key = ["left_id", "right_id"]
    a = via_broadcast.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = via_shuffle.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_parsing_stats_vs_serial_oracle(ray_session, fdir):
    """A4 parity: the distributed parsing statistics equal a serial
    recomputation over the oracle extraction (reference semantics,
    `parse_landing_page_html.py:250-363`)."""
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.functions.htmlextract import (
        extract_page,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import stats

    pages_tbl = pq.read_table(os.path.join(fdir, "pages.parquet"))
    # serial oracle
    counters = dict(found=0, ok=0, a=0, i=0, both=0, ul=0)
    rows = []
    for idx in range(pages_tbl.num_rows):
        page = extract_page(pages_tbl["html"][idx].as_py())
        counters["found"] += 1
        counters["ok"] += 1
        counters["a"] += page["has_author_tag"]
        counters["i"] += page["has_inst_tag"]
        counters["both"] += page["has_author_tag"] and page["has_inst_tag"]
        counters["ul"] += page["has_ul_authors"]
        for author, inst, src in page["mentions"]:
            rows.append((author, inst, src, page["has_inst_tag"]))

    ds = rd.read_parquet(os.path.join(fdir, "pages.parquet"))
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
        extract_pages as ep,
    )

    got = stats.parsing_stats(ep(ds))
    assert got["Total HTML files found"] == counters["found"]
    assert got["Files containing citation_author meta tag"] == counters["a"]
    assert got["Files containing both meta tags"] == counters["both"]
    assert got["Files containing ul.authors structure"] == counters["ul"]
    assert got["Total unique DOI/author/institution rows extracted (merged)"] == len(rows)
    assert got["Total valid author-institution pairs extracted (non-empty institution)"] == \
        sum(1 for r in rows if r[1])
    assert got["Rows sourced ONLY from meta tags"] == sum(1 for r in rows if r[2] == "meta")
    assert got["Rows sourced from BOTH meta and ul.authors"] == \
        sum(1 for r in rows if "meta" in r[2] and "ul.authors" in r[2])
    assert got["Unique authors found (merged)"] == len({r[0] for r in rows})
    assert got["Unique institutions found (non-empty, merged)"] == \
        len({r[1] for r in rows if r[1]})
    assert got["Author rows missing institution from files with institution meta tags"] == \
        sum(1 for r in rows if not r[1] and r[3])


def test_distributed_cc_equals_driver_path(ray_session, fdir):
    """Forcing the fully-distributed CC (driver_edge_limit=0) must give
    the same clustering as the hybrid auto path on the real pipeline
    edges."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import (
        reconcile,
    )

    out = reconcile.run_reconcile(SF)
    edges = out["scored"].map_batches(
        lambda t: t.filter(t["is_match"]).select(["left_id", "right_id"]),
        batch_format="pyarrow").materialize()

    def as_partition_sets(ds):
        clusters = {}
        for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            for r, c in zip(b["record_id"].to_pylist(), b["cluster_id"].to_pylist()):
                clusters.setdefault(c, set()).add(r)
        return {frozenset(v) for v in clusters.values()}

    auto = cluster_mod.connected_components_auto(edges, nodes_ds=out["records"])
    dist = cluster_mod.connected_components_auto(edges, nodes_ds=out["records"],
                                                 driver_edge_limit=0)
    assert as_partition_sets(auto) == as_partition_sets(dist)


def test_actor_pool_scorer_equals_task_path(ray_session, fdir):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import (
        reconcile,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages import score

    out = reconcile.run_reconcile(SF)
    rec_ref = score.broadcast_records(out["records"])
    via_tasks = score.score_pairs(out["pairs"], rec_ref).to_pandas()
    via_actors = score.score_pairs(out["pairs"], rec_ref, use_actors=True,
                                   concurrency=(1, 2)).to_pandas()
    key = ["left_id", "right_id"]
    a = via_tasks.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = via_actors.sort_values(key, kind="mergesort").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_connected_components_large_batches(ray_session):
    """Regression: _fingerprint summed per-row 56-bit digests into one
    Python int and built a pa.int64 — OverflowError past ~256 rows per
    batch. 1500 nodes in one block exercises large fingerprint batches
    and checks the distributed labeling against union-find."""
    import pyarrow as pa
    import ray.data as rd

    nodes = [f"m{i:04d}" for i in range(1500)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(0, 1498, 2)]  # 750 pairs
    oracle = cluster_mod.union_find(edges, nodes)

    edges_ds = rd.from_arrow(pa.table({
        "left_id": [e[0] for e in edges],
        "right_id": [e[1] for e in edges],
    }))
    nodes_ds = rd.from_arrow(pa.table({"record_id": nodes}))
    got_ds = cluster_mod.connected_components(edges_ds, nodes_ds=nodes_ds)
    got = {r["record_id"]: r["cluster_id"] for r in got_ds.take_all()}
    assert got == oracle


def test_connected_components_long_chain_converges(ray_session):
    """A 100-hop path needs ~100 rounds under plain neighborhood-min;
    with label shortcutting it must finish inside a 10-round budget
    (O(log diameter))."""
    import pyarrow as pa
    import ray.data as rd

    nodes = [f"c{i:04d}" for i in range(100)]
    edges = list(zip(nodes, nodes[1:]))  # one long chain
    edges_ds = rd.from_arrow(pa.table({
        "left_id": [e[0] for e in edges],
        "right_id": [e[1] for e in edges],
    }))
    got_ds = cluster_mod.connected_components(edges_ds, max_rounds=10)
    got = {r["record_id"]: r["cluster_id"] for r in got_ds.take_all()}
    assert set(got.values()) == {nodes[0]}
    assert len(got) == 100


def test_choose_scoring_path_auto_switch(ray_session, monkeypatch):
    """shuffle_scoring=None picks broadcast below the object-store
    budget fraction and the bucketed-join path above it; forcing the
    threshold to ~0 must flip the decision on the same table."""
    import pandas as pd
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.pipelines import (
        reconcile,
    )

    recs = rd.from_pandas(pd.DataFrame({
        "record_id": [f"r{i}" for i in range(50)],
        "x": list(range(50))})).materialize()
    assert reconcile.choose_scoring_path(recs) is False  # tiny table
    monkeypatch.setattr(reconcile, "BROADCAST_OBJECT_STORE_FRACTION", 0.0)
    assert reconcile.choose_scoring_path(recs) is True


def test_connected_components_no_edges_all_singletons(ray_session):
    # post-refactor regression guard: propagation runs over edge
    # endpoints only, so with ZERO edges every node must still surface
    # through the final singleton min-merge with its own id
    import pandas as pd
    import ray.data as rds

    edges_ds = rds.from_pandas(pd.DataFrame({"left_id": pd.Series(dtype=str),
                                             "right_id": pd.Series(dtype=str)}))
    nodes_ds = rds.from_pandas(pd.DataFrame({"record_id": ["a", "b", "c"]}))
    got = cluster_mod.connected_components(edges_ds, nodes_ds=nodes_ds).to_pandas()
    got = got.sort_values("record_id").reset_index(drop=True)
    assert got["record_id"].tolist() == ["a", "b", "c"]
    assert got["cluster_id"].tolist() == ["a", "b", "c"]


def test_read_extract_pages_equals_unfused_path(ray_session, fdir):
    """The fused row-group source (read inside the extract task) must
    produce exactly the rows of read_parquet |> extract_pages — same
    urls, same bytes, at more tasks than row groups and fewer alike."""
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
        read_extract_pages,
    )

    path = os.path.join(fdir, "pages.parquet")
    base = extract_pages(rd.read_parquet(path)).to_pandas()
    base = base.sort_values("url").reset_index(drop=True)
    for target_rows in (100, 10**9):  # many tiny tasks / one big task
        got = read_extract_pages(path, target_rows=target_rows).to_pandas()
        got = got.sort_values("url").reset_index(drop=True)
        assert got.equals(base), f"fused != unfused at target_rows={target_rows}"


def test_read_extract_pages_shard_directory(ray_session, fdir, tmp_path):
    """Big tiers (sf1) write pages.parquet as a per-shard DIRECTORY of
    parquet files; the fused source must read it identically to a
    read_parquet over the same directory (chunks never span files)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.stages.extract import (
        read_extract_pages,
    )

    src = pq.read_table(os.path.join(fdir, "pages.parquet"))
    shard_dir = tmp_path / "pages.parquet"
    shard_dir.mkdir()
    n = src.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        pq.write_table(src.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       shard_dir / f"shard-{i:05d}.parquet",
                       row_group_size=64)
    base = extract_pages(rd.read_parquet(str(shard_dir))).to_pandas()
    base = base.sort_values("url").reset_index(drop=True)
    got = read_extract_pages(str(shard_dir), target_rows=100).to_pandas()
    got = got.sort_values("url").reset_index(drop=True)
    assert got.equals(base)
