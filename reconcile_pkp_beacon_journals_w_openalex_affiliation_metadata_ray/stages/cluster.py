"""Stage 4 — CLUSTER: matched pairs -> entity clusters.

Distributed transitive closure via iterative hash-partitioned min-label
propagation (the explicit generalization of the reference's implicit
per-DOI grouping, `check...openalex.py:72-74`): every node starts
labeled with its own id; each round every node takes the min label in
its closed neighborhood; convergence when the label assignment's
deterministic fingerprint stops changing (a tiny tree-reduce aggregate
— no extra shuffle). Each round costs exactly two keyed shuffles
(message delivery + min-reduction), both partitioned on node id — the
same key every round, so a multi-node scheduler keeps partitions
sticky. Rounds are materialized to keep lineage bounded
(SURVEY.md §7.3). Converges in O(component diameter) rounds.

A driver-side union-find (`union_find`) is the small-input oracle for
tests; the Dataset implementation is the scale path.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def union_find(edges, nodes=()):
    """In-memory union-find oracle: returns dict node -> min-id root."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    for n in nodes:
        parent.setdefault(n, n)
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    return {n: find(n) for n in parent}


def _deliver(g: pd.DataFrame) -> pd.DataFrame:
    """Per-node group of label row(s) + edge rows: deliver this node's
    label to every neighbor and to itself."""
    lbls = g.loc[g["other"].isna(), "label"]
    if lbls.empty:
        return pd.DataFrame({"node": pd.Series(dtype=str), "label": pd.Series(dtype=str)})
    label = lbls.min()
    nbrs = g.loc[g["other"].notna(), "other"].tolist()
    return pd.DataFrame({"node": [g["node"].iloc[0]] + nbrs,
                         "label": [label] * (1 + len(nbrs))})


def _fingerprint(labels_ds) -> int:
    from ray.data.aggregate import Sum

    parts = labels_ds.map_batches(
        lambda t: pa.table({"fp": pa.array(
            [sum(int.from_bytes(hashlib.blake2b(f"{n}\x00{l}".encode(), digest_size=7).digest(),
                                "little")
                 for n, l in zip(t["node"].to_pylist(), t["label"].to_pylist()))],
            pa.int64())}),
        batch_format="pyarrow")
    out = parts.aggregate(Sum("fp", alias_name="fp"))
    return int(out["fp"] or 0)


def connected_components(edges_ds, nodes_ds=None, max_rounds: int = 25):
    """edges (left_id, right_id) [+ optional extra nodes (record_id)]
    -> Dataset (record_id, cluster_id). Singleton nodes keep their own
    id as cluster_id."""
    from ray.data.aggregate import Min

    edges_bidir = edges_ds.map_batches(
        lambda df: pd.DataFrame(
            {"node": pd.concat([df["left_id"], df["right_id"]], ignore_index=True),
             "other": pd.concat([df["right_id"], df["left_id"]], ignore_index=True)}),
        batch_format="pandas",
    ).materialize()

    node_sources = edges_bidir.map_batches(
        lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow")
    if nodes_ds is not None:
        node_sources = node_sources.union(
            nodes_ds.map_batches(lambda t: pa.table({"node": t["record_id"]}),
                                 batch_format="pyarrow"))
    labels = node_sources.groupby("node").aggregate(Min("node", alias_name="label")).materialize()
    prev_fp = _fingerprint(labels)

    for _ in range(max_rounds):
        tagged_labels = labels.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "other": pa.nulls(t.num_rows, pa.string()),
                                "label": t["label"]}),
            batch_format="pyarrow")
        tagged_edges = edges_bidir.map_batches(
            lambda t: pa.table({"node": t["node"], "other": t["other"],
                                "label": pa.nulls(t.num_rows, pa.string())}),
            batch_format="pyarrow")
        msgs = tagged_labels.union(tagged_edges).groupby("node").map_groups(
            _deliver, batch_format="pandas")
        labels = msgs.groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        fp = _fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp

    return labels.map_batches(
        lambda t: pa.table({"record_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow")
