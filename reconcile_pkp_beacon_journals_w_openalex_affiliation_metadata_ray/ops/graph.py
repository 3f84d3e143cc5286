"""Distributed graph analytics over edge-list Datasets.

Connected components live in ``stages/cluster.py`` (they are the
linkage pipeline's third stage); this module holds the generic
beyond-reference graph operators. Design rule shared with the sketches
(ops/sketch.py): APPROXIMATE or ITERATIVE algorithms are formulated in
integer fixed-point arithmetic so every intermediate — and therefore
the final answer — is bit-exact across engines and summation orders,
making even an iterative computation value-hash oracle-able in SQL.
"""

from __future__ import annotations

import pandas as pd


def pagerank_fixedpoint(edges_ds, iters: int = 3,
                        init: int = 1_000_000_000,
                        num_buckets: int = 32):
    """Fixed-point integer PageRank (damping 0.85) over an UNDIRECTED
    edge list (left_id, right_id). Per round, with all arithmetic in
    int64 floor division (positive throughout, so Python ``//`` and
    SQL ``//`` agree bit-for-bit):

        contrib(u)   = s_t(u) // deg(u)
        s_{t+1}(v)   = (init * 15) // 100
                       + (85 * sum_{u in N(v)} contrib(u)) // 100

    Integer sums are order-independent, so the distributed reduce and a
    SQL GROUP BY produce identical values — the oracle simply unrolls
    the rounds as chained CTEs. Overflow bound: 85 * n_nodes * init
    must stay under 2^63 (scale ``init`` down for graphs beyond ~1e8
    nodes at the default).

    Scale shape per round: ONE bucketed join of the (bidirectional)
    edge stream against the score table on the source node + ONE
    combiner-reduced sum per destination — no driver state beyond the
    loop counter; the score table never materializes on the driver.
    Nodes are the edge endpoints (an isolated node has no edges and no
    rank mass to receive; deg >= 1 by construction).
    """
    from .relational import bucket_join, pre_aggregated

    base = (init * 15) // 100

    bidir = edges_ds.map_batches(
        lambda b: pd.DataFrame(
            {"src": pd.concat([b["left_id"], b["right_id"]],
                              ignore_index=True),
             "dst": pd.concat([b["right_id"], b["left_id"]],
                              ignore_index=True)}),
        batch_format="pandas").materialize()

    deg = pre_aggregated(
        bidir.map_batches(lambda b: b[["src"]].rename(columns={"src": "node"}),
                          batch_format="pandas"),
        "node", counts=True, num_buckets=num_buckets).map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "deg": b["n"].astype("int64")}),
        batch_format="pandas").materialize()

    scores = deg.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "s": pd.Series([init] * len(b),
                                               dtype="int64"),
                                "deg": b["deg"].astype("int64")}),
        batch_format="pandas").materialize()

    for _ in range(iters):
        contrib = bucket_join(
            bidir, scores.map_batches(
                lambda b: pd.DataFrame(
                    {"src": b["node"],
                     "c": (b["s"] // b["deg"]).astype("int64")}),
                batch_format="pandas"),
            on="src", num_buckets=num_buckets).map_batches(
            lambda b: pd.DataFrame({"node": b["dst"],
                                    "c": b["c"].astype("int64")}),
            batch_format="pandas")
        sums = pre_aggregated(contrib, "node", sums=["c"], counts=False,
                              num_buckets=num_buckets)
        scores = bucket_join(
            sums.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"],
                     "s": (base + (85 * b["sum_c"].astype("int64")) // 100
                           ).astype("int64")}),
                batch_format="pandas"),
            deg, on="node", num_buckets=num_buckets).materialize()

    return scores.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "pagerank_fp": b["s"].astype("int64")}),
        batch_format="pandas")
