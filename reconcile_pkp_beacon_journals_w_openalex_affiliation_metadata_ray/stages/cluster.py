"""Stage 4 — CLUSTER: matched pairs -> entity clusters.

Distributed transitive closure via iterative hash-partitioned min-label
propagation (the explicit generalization of the reference's implicit
per-DOI grouping, `check...openalex.py:72-74`): every node starts
labeled with its own id; each round every node takes the min label in
its neighborhood; convergence when no label changes (checked with a
tiny aggregate, not a driver scan). Rounds are
``groupby(node).map_groups`` shuffles keyed on node id — the same
partitioning key every round, so a multi-node scheduler can keep
partitions sticky. Converges in O(graph diameter) rounds; the fixture
chains have diameter <= 4. Each round's label set is re-materialized to
keep lineage bounded (SURVEY.md §7.3).

A driver-side union-find (`union_find`) is provided as the small-input
oracle for tests; the Dataset implementation is the scale path.
"""

from __future__ import annotations

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


def _propagate_round(labels_ds, edges_bidir_ds):
    """One round: every node receives the labels of its neighbors and
    itself; new label = min. Returns the new labels Dataset."""
    import ray.data  # noqa: F401  (Dataset methods)

    # message rows: (node, label). Self-messages carry the node's own
    # current label; neighbor messages are produced by attaching each
    # node's label to its outgoing edges.
    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lbl_rows = g[g["kind"] == "label"]
        if lbl_rows.empty:
            return pd.DataFrame({"node": [], "label": []})
        label = lbl_rows["label"].min()
        nbrs = g[g["kind"] == "edge"]["other"].tolist()
        return pd.DataFrame({"node": [g["node"].iloc[0]] + nbrs,
                             "label": [label] * (1 + len(nbrs))})

    tagged_labels = labels_ds.map_batches(
        lambda t: pa.table({"node": t["node"], "other": pa.nulls(t.num_rows, pa.string()),
                            "label": t["label"],
                            "kind": pa.array(["label"] * t.num_rows)}),
        batch_format="pyarrow")
    tagged_edges = edges_bidir_ds.map_batches(
        lambda t: pa.table({"node": t["node"], "other": t["other"],
                            "label": pa.nulls(t.num_rows, pa.string()),
                            "kind": pa.array(["edge"] * t.num_rows)}),
        batch_format="pyarrow")
    msgs = tagged_labels.union(tagged_edges).groupby("node").map_groups(
        attach, batch_format="pandas")

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": [g["node"].iloc[0]], "label": [g["label"].min()]})

    return msgs.groupby("node").map_groups(take_min, batch_format="pandas")


def _count_changed(old_ds, new_ds) -> int:
    def tag(ds, kind):
        return ds.map_batches(
            lambda t, k=kind: pa.table({"node": t["node"], "label": t["label"],
                                        "kind": pa.array([k] * t.num_rows)}),
            batch_format="pyarrow")

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["kind"] == "old"]["label"]
        new = g[g["kind"] == "new"]["label"]
        changed = int(old.min() != new.min()) if len(old) and len(new) else 1
        return pd.DataFrame({"changed": [changed]})

    both = tag(old_ds, "old").union(tag(new_ds, "new"))
    res = both.groupby("node").map_groups(diff, batch_format="pandas")
    from ray.data.aggregate import Sum

    out = res.aggregate(Sum("changed", alias_name="n"))
    return int(out["n"]) if out and out.get("n") is not None else 0


def connected_components(edges_ds, nodes_ds=None, max_rounds: int = 25,
                         check_every: int = 1):
    """edges (left_id, right_id) [+ optional extra nodes (record_id)]
    -> Dataset (record_id, cluster_id).

    Singleton nodes (present in nodes_ds but in no edge) keep their own
    id as cluster_id."""
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
    labels = node_sources.groupby("node").map_groups(
        lambda g: pd.DataFrame({"node": [g["node"].iloc[0]], "label": [g["node"].iloc[0]]}),
        batch_format="pandas").materialize()

    for _ in range(max_rounds):
        new_labels = _propagate_round(labels, edges_bidir).materialize()
        if _count_changed(labels, new_labels) == 0:
            labels = new_labels
            break
        labels = new_labels

    return labels.map_batches(
        lambda t: pa.table({"record_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow")
