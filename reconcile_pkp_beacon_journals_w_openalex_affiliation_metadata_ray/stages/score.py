"""Stage 3 — SCORE: candidate pairs -> scored pairs; plus the
reference-parity mention scorer.

Two scorers:

1. :class:`PairScorer` — record-vs-record scoring for the linkage
   pipeline. Actor-pool ``map_batches`` stage (T5 pattern): actor state
   holds the broadcast record-attribute lookup (``ray.put`` once on the
   driver, ``ray.get`` once per actor in ``__init__`` — never
   re-shipped per batch). Semantics generalize the reference's
   per-mention comparison (J2 argmax-with-early-exit,
   `check...openalex.py:153-170`; J3 institution membership,
   `:203-237`) to record pairs:
   - equal non-empty DOIs  -> match (score 100);
   - different non-empty DOIs -> non-match (score 0);
   - else fuzzy: per-author best InDel ratio (both directions,
     averaged over the smaller side), institution max-ratio with the
     reference's empty-semantics, combined = 0.75*author + 0.25*inst
     when either side has institutions. Match iff combined >= 90.

   NOTE ON SCALE: the broadcast lookup is the small-side path (same
   trade the reference's Rust filter makes with its Arc'd base-URL
   list, `main.rs:597-603`). When the record table itself is huge the
   pipeline instead co-partitions pairs and records by bucketed id
   (ops.relational.bucket_join) — same scoring kernel either way.

2. :func:`score_mentions` — byte-level parity with the reference's
   comparison stage output columns (`check...openalex.py:285-289`):
   flat mentions joined to authority works by DOI, per-mention
   argmax over authorships, 8 added columns with identical names,
   rounding (`:254-259`) and empty-institution edge semantics
   (`:215-228`).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.similarity import (
    BoundedCache,
    indel_ratio,
    indel_ratio_cached,
    jaro_winkler,
    set_jaccard,
)
from ..functions.textnorm import normalize_text

MATCH_THRESHOLD = 90.0
INST_MATCH_THRESHOLD = 90.0  # name-only tier: institutions must MATCH
AUTHOR_WEIGHT = 0.75
INST_WEIGHT = 0.25

# Default scored-pair contract. DOI-decided pairs carry decision-implied
# scores (100/0) rather than fuzzy-kernel outputs: their is_match is
# determined by the DOI alone, so running the O(n^2) author/institution
# kernels on them spends the scoring stage's dominant share of CPU on
# columns that cannot change any decision. This also makes every column
# of a DOI-decided row SQL-derivable (the q_scored_pairs oracle exploits
# that). Pass aux_metrics=True for the diagnostic variant that runs the
# fuzzy kernels on every pair and adds jw/jaccard columns.
SCORED_PAIR_SCHEMA = pa.schema(
    [
        ("left_id", pa.string()),
        ("right_id", pa.string()),
        ("block_key", pa.string()),
        ("author_score", pa.float64()),
        ("inst_score", pa.float64()),
        ("combined_score", pa.float64()),
        ("doi_equal", pa.bool_()),
        ("doi_conflict", pa.bool_()),
        ("is_match", pa.bool_()),
    ]
)

SCORED_PAIR_SCHEMA_AUX = pa.schema(
    [
        ("left_id", pa.string()),
        ("right_id", pa.string()),
        ("block_key", pa.string()),
        ("author_score", pa.float64()),
        ("inst_score", pa.float64()),
        ("jw_score", pa.float64()),
        ("jaccard_score", pa.float64()),
        ("combined_score", pa.float64()),
        ("doi_equal", pa.bool_()),
        ("doi_conflict", pa.bool_()),
        ("is_match", pa.bool_()),
    ]
)


def pair_schema(aux_metrics: bool) -> pa.Schema:
    return SCORED_PAIR_SCHEMA_AUX if aux_metrics else SCORED_PAIR_SCHEMA


def _round2(x: float) -> float:
    """Round to 2 decimals half-AWAY-from-zero (SQL/DuckDB semantics;
    Python's round() is half-to-even and disagrees at .5 boundaries)."""
    import math

    return math.copysign(math.floor(abs(x) * 100.0 + 0.5) / 100.0, x)


def _best_author_score(a_norm: list, b_norm: list) -> float:
    """Average over the smaller side of best InDel ratio vs the other
    side (argmax with early exit at 100.0, O4 semantics)."""
    if not a_norm or not b_norm:
        return 0.0
    small, large = (a_norm, b_norm) if len(a_norm) <= len(b_norm) else (b_norm, a_norm)
    total = 0.0
    for name in small:
        best = 0.0
        for other in large:
            score = indel_ratio_cached(name, other)
            if score > best:
                best = score
                if best == 100.0:
                    break
        total += best
    return total / len(small)


def _inst_score(a_norm: list, b_norm: list) -> float:
    """Reference empty-institution semantics (`check...openalex.py:215-228`)
    lifted to record level: both empty -> 100, one empty -> 0, else max
    pairwise ratio."""
    if not a_norm and not b_norm:
        return 100.0
    if not a_norm or not b_norm:
        return 0.0
    best = 0.0
    for x in a_norm:
        for y in b_norm:
            s = indel_ratio_cached(x, y)
            if s > best:
                best = s
                if best == 100.0:
                    return best
    return best


# per-worker blob -> token set (blobs recur ~20x); byte-aware cap
_TOK_CACHE = BoundedCache(max_items=500_000, max_cost=256 << 20)

# per-worker ATTR-PAIR score memos: 40% of candidate pairs at sf0.1
# share their (authors_packed_l, authors_packed_r) combination with an
# earlier pair (measured: 178k distinct / 300k pairs), so the whole
# per-name best/avg computation for such a pair is a dict hit instead
# of a combo emission + kernel pass. Keys are canonical unordered
# packed-string pairs; values are the raw (pre-_round2) scores, so a
# hit is bit-identical to recomputation.
_AUTH_PAIR_CACHE = BoundedCache(max_items=500_000, max_cost=192 << 20)
_INST_PAIR_CACHE = BoundedCache(max_items=500_000, max_cost=192 << 20)


def _blob_tokens(s: str) -> frozenset:
    return _TOK_CACHE.get_or_build(s, lambda: frozenset(s.split()),
                                   cost=len(s) * 3)


def _score_tuple(doi_l, authors_l, insts_l, blob_l,
                 doi_r, authors_r, insts_r, blob_r,
                 structural: bool = True, aux_metrics: bool = False) -> tuple:
    """Scoring kernel over positional record attributes; returns the
    scored-pair value tuple in pair_schema(aux_metrics) column order
    (after the three id columns).

    DOI-decided pairs (equal or conflicting DOIs) short-circuit: every
    score is decision-implied (100/0) and NO fuzzy kernel runs — the
    decision cannot change, and at corpus scale DOI blocks contribute a
    large pair share, so this is the scoring stage's main perf lever.
    """
    doi_equal = bool(doi_l) and doi_l == doi_r
    doi_conflict = bool(doi_l) and bool(doi_r) and doi_l != doi_r
    if doi_equal or doi_conflict:
        v = 100.0 if doi_equal else 0.0
        if aux_metrics:
            return (v, v, v, v, v, doi_equal, doi_conflict, doi_equal)
        return (v, v, v, doi_equal, doi_conflict, doi_equal)
    # scores are rounded half-AWAY-from-zero (SQL round semantics, not
    # Python's half-even) BEFORE combining, so every derived column
    # (combined_score, is_match) is bit-reproducible by a SQL engine
    # reading the persisted author/inst scores — the q_scored_pairs
    # oracle recomputes them in DuckDB
    author = _round2(_best_author_score(authors_l, authors_r))
    inst = _round2(_inst_score(insts_l, insts_r))
    # institutions only discriminate when BOTH sides carry them;
    # a missing-inst side must not cap the score (the record-level
    # analog of the reference's empty-inst edge case,
    # `check...openalex.py:215-228`)
    if insts_l and insts_r:
        combined = _round2(AUTHOR_WEIGHT * author + INST_WEIGHT * inst)
    else:
        combined = author
    if structural:
        is_match = combined >= MATCH_THRESHOLD
    else:
        # name-only evidence (the pair co-blocked solely via author
        # name / LSH keys): author similarity alone cannot separate
        # distinct people who share a name, and affiliation strings
        # share so much boilerplate ("University of ...") that a
        # 70-85 inst similarity is NOISE, not corroboration. Demand
        # institutions on both sides that actually match. Prevents
        # same-name bridges from avalanching clusters at scale.
        is_match = (bool(insts_l) and bool(insts_r)
                    and author >= MATCH_THRESHOLD
                    and inst >= INST_MATCH_THRESHOLD)
    if aux_metrics:
        # JW over the primary author names (bounded-length strings);
        # token Jaccard over the full name blobs (linear set op).
        # Diagnostic-only: neither feeds is_match.
        a0 = authors_l[0] if authors_l else ""
        b0 = authors_r[0] if authors_r else ""
        jw = jaro_winkler(a0, b0) * 100.0
        jac = set_jaccard(_blob_tokens(blob_l), _blob_tokens(blob_r)) * 100.0
        return (author, inst, _round2(jw), _round2(jac),
                combined, doi_equal, doi_conflict, is_match)
    return (author, inst, combined, doi_equal, doi_conflict, is_match)


def _ratios_for_combos(xs: list, ys: list) -> "np.ndarray":
    """InDel ratios for parallel combo lists, float64 array. Distinct
    (unordered) string pairs are dict-interned in ONE pass that also
    consults the per-worker ratio memo (tuple keys: both member strings
    carry memoized hashes, where a freshly concatenated key string paid
    a full re-hash per occurrence — and pd.factorize is out entirely,
    its khash table truncates at embedded NULs); only the misses run
    the bulk numpy kernel, whose results scatter back via one fancy
    assignment. Replaces both the per-batch pre-warm scan AND the
    per-pair cached-lookup loop of the old row kernel."""
    import numpy as np

    from ..functions.similarity import _RATIO_CACHE, indel_ratios_bulk

    if not xs:
        return np.zeros(0, dtype=np.float64)
    seen: dict = {}
    codes = np.empty(len(xs), dtype=np.int64)
    uniq_vals: list = []
    miss_slots: list = []
    miss_keys: list = []
    miss_pairs: list = []
    sget = seen.get
    cache = _RATIO_CACHE
    cache_get = cache.get
    for i, (x, y) in enumerate(zip(xs, ys)):
        k = (x, y) if x <= y else (y, x)
        c = sget(k)
        if c is None:
            c = len(uniq_vals)
            seen[k] = c
            v = cache_get(k)
            if v is None:
                miss_slots.append(c)
                miss_keys.append(k)
                miss_pairs.append((x, y))
                v = 0.0  # placeholder, overwritten below
            uniq_vals.append(v)
        codes[i] = c
    dist = np.array(uniq_vals, dtype=np.float64)
    if miss_pairs:
        got = indel_ratios_bulk(miss_pairs)
        dist[np.array(miss_slots, dtype=np.int64)] = got
        # one bulk insert under one cap check (a per-item .set loop
        # measured 2.8 s per 6 sf0.3 batches); the cap discipline is
        # identical — wholesale clear when the batch would overflow —
        # and cache CONTENT only ever affects speed, never results
        add_cost = sum(len(x) + len(y) + 48 for x, y in miss_keys)
        if (len(cache) + len(miss_keys) >= cache.max_items
                or cache.cost + add_cost >= cache.max_cost):
            cache.clear()
            cache.cost = 0
        if len(miss_keys) < cache.max_items:
            cache.update(zip(miss_keys, got))
            cache.cost += add_cost
    return np.take(dist, codes)


def score_vectors(ldoi, rdoi, lauth, rauth, linst, rinst, fams, sep: str):
    """Vectorized scoring core over PACKED attribute columns (lists
    joined with ``sep``): returns (author, inst, combined, doi_equal,
    doi_conflict, is_match) numpy arrays, bit-identical to a per-row
    :func:`_score_tuple` loop (equivalence-tested). The old row loop
    measured ~90-119 us/pair of UDF time at sf0.1 — dominated by
    per-pair Python (function frames, list appends, cached-ratio dict
    scans), not the ratio kernel; here the per-pair Python is one
    combo-emission pass and everything else is reduceat/gather."""
    import numpy as np

    n = len(ldoi)
    ld = np.asarray(ldoi, dtype=object)
    rd_ = np.asarray(rdoi, dtype=object)
    has_l = np.fromiter((bool(x) for x in ld), dtype=bool, count=n)
    has_r = np.fromiter((bool(x) for x in rd_), dtype=bool, count=n)
    eq = has_l & (ld == rd_)
    conflict = has_l & has_r & ~eq
    decided = eq | conflict

    author = np.where(eq, 100.0, 0.0)
    inst = author.copy()
    combined = author.copy()
    is_match = eq.copy()

    und = np.flatnonzero(~decided)
    if len(und):
        # one combo-emission pass (the only per-pair Python left):
        # author combos in (small-side name, large-side other) order —
        # exactly the old loop's iteration order, so the sequential
        # reduceat sums below are bit-identical to its accumulation
        a_xs, a_ys = [], []
        a_name_counts = []          # large-side length per small name
        a_names_per_pair = np.zeros(len(und), dtype=np.int64)
        a_cached = np.full(len(und), np.nan)
        a_keys = [None] * len(und)
        i_xs, i_ys = [], []
        i_counts = np.zeros(len(und), dtype=np.int64)
        i_cached = np.full(len(und), np.nan)
        i_keys = [None] * len(und)
        both_inst = np.zeros(len(und), dtype=bool)
        none_inst = np.zeros(len(und), dtype=bool)
        for k, j in enumerate(und.tolist()):
            la_s = lauth[j] or ""
            ra_s = rauth[j] or ""
            if la_s and ra_s:
                # ORDERED key: _best_author_score averages over the
                # smaller side with a first-argument tie-break at equal
                # lengths, so f(a, b) != f(b, a) in general — an
                # unordered key would serve the swapped pair's value
                akey = la_s + "\x01" + ra_s
                hit = _AUTH_PAIR_CACHE.get(akey)
                if hit is not None:
                    a_cached[k] = hit
                else:
                    a_keys[k] = akey
                    la = la_s.split(sep)
                    ra = ra_s.split(sep)
                    small, large = (la, ra) if len(la) <= len(ra) \
                        else (ra, la)
                    a_names_per_pair[k] = len(small)
                    # exact-equal shortcut (the old kernel's early exit
                    # at 100): a name present on the other side
                    # contributes best=100 regardless of the remaining
                    # combos — emit one (name, name) combo (a==b
                    # resolves without the DP kernel) instead of its
                    # whole cross-product row. Near-dup pairs share
                    # most names, so this collapses the dominant combo
                    # mass.
                    large_set = set(large)
                    for name in small:
                        if name in large_set:
                            a_name_counts.append(1)
                            a_xs.append(name)
                            a_ys.append(name)
                        else:
                            a_name_counts.append(len(large))
                            for other in large:
                                a_xs.append(name)
                                a_ys.append(other)
            li_s = linst[j] or ""
            ri_s = rinst[j] or ""
            if li_s and ri_s:
                both_inst[k] = True
                ikey = (li_s + "\x01" + ri_s) if li_s <= ri_s \
                    else (ri_s + "\x01" + li_s)
                hit = _INST_PAIR_CACHE.get(ikey)
                if hit is not None:
                    i_cached[k] = hit
                else:
                    i_keys[k] = ikey
                    li = li_s.split(sep)
                    ri = ri_s.split(sep)
                    common = set(li) & set(ri)
                    if common:
                        # any shared institution string -> max is 100
                        c0 = next(iter(common))
                        i_counts[k] = 1
                        i_xs.append(c0)
                        i_ys.append(c0)
                    else:
                        i_counts[k] = len(li) * len(ri)
                        for x in li:
                            for y in ri:
                                i_xs.append(x)
                                i_ys.append(y)
            elif not li_s and not ri_s:
                none_inst[k] = True

        # author: best ratio per small name (max.reduceat), then the
        # old loop's sequential sum over names (add.reduceat) / count
        a_ratios = _ratios_for_combos(a_xs, a_ys)
        a_und = np.zeros(len(und), dtype=np.float64)
        pair_has = a_names_per_pair > 0
        if a_ratios.size:
            name_counts = np.asarray(a_name_counts, dtype=np.int64)
            name_off = np.concatenate(([0], np.cumsum(name_counts)[:-1]))
            bests = np.maximum.reduceat(a_ratios, name_off)
            pair_off = np.concatenate(
                ([0], np.cumsum(a_names_per_pair[pair_has])[:-1]))
            sums = np.add.reduceat(bests, pair_off)
            a_und[pair_has] = sums / a_names_per_pair[pair_has]
        a_hit = ~np.isnan(a_cached)
        a_und[a_hit] = a_cached[a_hit]
        for k in np.flatnonzero(pair_has).tolist():
            _AUTH_PAIR_CACHE.set(a_keys[k], a_und[k],
                                 cost=len(a_keys[k]) + 32)

        # institutions: both empty -> 100, one empty -> 0, else max
        i_ratios = _ratios_for_combos(i_xs, i_ys)
        i_und = np.where(none_inst, 100.0, 0.0)
        i_emit = i_counts > 0
        if i_ratios.size:
            i_off = np.concatenate(([0], np.cumsum(i_counts[i_emit])[:-1]))
            i_und[i_emit] = np.maximum.reduceat(i_ratios, i_off)
        i_hit = ~np.isnan(i_cached)
        i_und[i_hit] = i_cached[i_hit]
        for k in np.flatnonzero(i_emit).tolist():
            _INST_PAIR_CACHE.set(i_keys[k], i_und[k],
                                 cost=len(i_keys[k]) + 32)

        def _r2(x):
            return np.copysign(np.floor(np.abs(x) * 100.0 + 0.5) / 100.0, x)

        a_r = _r2(a_und)
        i_r = _r2(i_und)
        comb = np.where(both_inst,
                        _r2(AUTHOR_WEIGHT * a_r + INST_WEIGHT * i_r), a_r)
        fam_und = np.asarray(fams, dtype=np.int64)[und]
        structural = (fam_und & 3) != 0
        m = np.where(structural, comb >= MATCH_THRESHOLD,
                     both_inst & (a_r >= MATCH_THRESHOLD)
                     & (i_r >= INST_MATCH_THRESHOLD))
        author[und] = a_r
        inst[und] = i_r
        combined[und] = comb
        is_match[und] = m
    return author, inst, combined, eq, conflict, is_match


def score_pair(left: dict, right: dict, structural: bool = True,
               aux_metrics: bool = False) -> dict:
    """Dict-interface wrapper over the kernel (used by tests/callers)."""
    vals = _score_tuple(left["doi_norm"], left["authors_norm"], left["insts_norm"],
                        left["name_blob"], right["doi_norm"], right["authors_norm"],
                        right["insts_norm"], right["name_blob"],
                        structural=structural, aux_metrics=aux_metrics)
    names = list(pair_schema(aux_metrics).names)[3:]
    return dict(zip(names, vals))


_RECORDS_CACHE: dict = {}


def _get_records(records_ref):
    """Per-worker cache of the plasma-mapped Arrow broadcast: the
    attribute columns (kept as Arrow) plus a ``pd.Index`` over the
    record ids. The id lookup is the scoring stage's per-worker fixed
    startup cost — every fresh worker pays it before its first batch,
    which is exactly what erodes 4->16-CPU scaling efficiency — so the
    three candidate structures were measured head-to-head (282k ids,
    8192-row batches, 23 batches/worker): python dict = 0.34 s build +
    9.6 ms/batch; per-batch ``pc.index_in`` = 0 build + 45 ms/batch
    (it re-hashes the value set every call); ``pd.Index.get_indexer``
    = 0.16 s build + 3.1 ms/batch — 2.4x/4.5x better per worker than
    the alternatives."""
    key = records_ref.hex() if hasattr(records_ref, "hex") else id(records_ref)
    if key not in _RECORDS_CACHE:
        import ray

        _RECORDS_CACHE.clear()
        tbl = ray.get(records_ref)
        ids_index = pd.Index(tbl["record_id"].to_pandas())
        attrs = tbl.select(["doi_norm", "authors_packed", "insts_packed",
                            "name_blob"]).combine_chunks()
        _RECORDS_CACHE[key] = (attrs, ids_index)
    return _RECORDS_CACHE[key]


def score_batch(batch: pa.Table, records_ref=None,
                aux_metrics: bool = False) -> pa.Table:
    """Stateless scoring task. Attribute rows for the batch's ids are
    gathered with one vectorized ``take`` per side and scored through
    :func:`score_vectors` (the aux-metrics variant keeps the per-row
    kernel — it is diagnostic-only and off the pipeline hot path)."""
    schema = pair_schema(aux_metrics)
    attrs, ids_index = _get_records(records_ref)

    import numpy as np

    # vectorized C-hash id lookup (see _get_records for the measured
    # dict / index_in / pd.Index trade-off), then one vectorized take
    # per side, decoded COLUMN-wise
    li_np = ids_index.get_indexer(batch["left_id"].to_pandas())
    ri_np = ids_index.get_indexer(batch["right_id"].to_pandas())
    keep = np.flatnonzero((li_np >= 0) & (ri_np >= 0))
    lt = attrs.take(pa.array(li_np[keep], pa.int64()))
    rt = attrs.take(pa.array(ri_np[keep], pa.int64()))
    if "families" in batch.column_names:
        fams = batch["families"].to_numpy(zero_copy_only=False)
    else:
        fams = np.full(batch.num_rows, 3)  # unknown provenance -> structural

    if aux_metrics:
        return _score_batch_rows(batch, lt, rt, keep.tolist(), fams, schema)

    author, inst, combined, eq, conflict, m = score_vectors(
        lt["doi_norm"].to_pylist(), rt["doi_norm"].to_pylist(),
        lt["authors_packed"].to_pylist(), rt["authors_packed"].to_pylist(),
        lt["insts_packed"].to_pylist(), rt["insts_packed"].to_pylist(),
        fams[keep], _SEP2)
    keep_pa = pa.array(keep, pa.int64())
    return pa.Table.from_pydict({
        "left_id": batch["left_id"].take(keep_pa),
        "right_id": batch["right_id"].take(keep_pa),
        "block_key": batch["block_key"].take(keep_pa),
        "author_score": author,
        "inst_score": inst,
        "combined_score": combined,
        "doi_equal": eq,
        "doi_conflict": conflict,
        "is_match": m,
    }, schema=schema)


def _score_batch_rows(batch: pa.Table, lt: pa.Table, rt: pa.Table,
                      keep: list, fams, schema: pa.Schema) -> pa.Table:
    """Per-row scoring path (aux_metrics diagnostics)."""
    lefts = batch["left_id"].to_pylist()
    rights = batch["right_id"].to_pylist()
    blocks = batch["block_key"].to_pylist()

    def _unpack(col):
        return [s.split(_SEP2) if s else [] for s in col.to_pylist()]

    ldois, lblobs = lt["doi_norm"].to_pylist(), lt["name_blob"].to_pylist()
    rdois, rblobs = rt["doi_norm"].to_pylist(), rt["name_blob"].to_pylist()
    lauths, linsts = _unpack(lt["authors_packed"]), _unpack(lt["insts_packed"])
    rauths, rinsts = _unpack(rt["authors_packed"]), _unpack(rt["insts_packed"])

    n_val = len(schema.names) - 3
    cols = [[] for _ in range(len(schema.names))]
    for j, k in enumerate(keep):
        vals = _score_tuple(ldois[j], lauths[j], linsts[j], lblobs[j],
                            rdois[j], rauths[j], rinsts[j], rblobs[j],
                            structural=bool(fams[k] & 3), aux_metrics=True)
        cols[0].append(lefts[k])
        cols[1].append(rights[k])
        cols[2].append(blocks[k])
        for v in range(n_val):
            cols[3 + v].append(vals[v])
    return pa.Table.from_pydict(dict(zip(schema.names, cols)), schema=schema)


class PairScorer:
    """Actor-pool variant of the batch scorer; state = broadcast record
    lookup fetched once in __init__ (T5 pattern). The pipeline default
    uses the stateless-task path (score_batch) because its per-worker
    cache amortizes identically while reusing already-warm workers."""

    def __init__(self, records_ref, aux_metrics: bool = False):
        self.records_ref = records_ref
        self.aux_metrics = aux_metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_batch(batch, records_ref=self.records_ref,
                           aux_metrics=self.aux_metrics)


def broadcast_records(records_ds):
    """Broadcast the record-attribute table as ONE Arrow table in the
    object store: workers map it zero-copy (no per-worker unpickle of a
    Python dict — that was measured to serialize the scoring stage) and
    build only a small record_id -> row-index dict each. The author /
    institution LISTS are packed into \\x1e-joined flat strings:
    gathering a flat string column (one take + to_pylist) measured ~3x
    cheaper per row than a list<string> column, and the per-row split
    is a fraction of that."""
    import ray

    def _pack_batch(t: pa.Table) -> pa.Table:
        return pa.table({
            "record_id": t["record_id"],
            "doi_norm": t["doi_norm"],
            "authors_packed": pa.array(
                [_SEP2.join(x or []) for x in t["authors_norm"].to_pylist()],
                pa.string()),
            "insts_packed": pa.array(
                [_SEP2.join(x or []) for x in t["insts_norm"].to_pylist()],
                pa.string()),
            "name_blob": t["name_blob"],
        })

    # pack DISTRIBUTED (the to_pylist + join loop is linear in records
    # — at sf1's 3.2M records it pinned the driver single-threaded for
    # minutes when run driver-side); the driver only concatenates the
    # already-packed Arrow blocks (memcpy, no per-row Python)
    packed = records_ds.map_batches(_pack_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    tbl = pa.concat_tables(
        [b for b in packed.iter_batches(batch_size=65536,
                                        batch_format="pyarrow")]
    ).combine_chunks()
    return ray.put(tbl)


def _auto_pool():
    """Autoscaling pool bounds sized to the session: min=1 guarantees
    progress under contention (no starvation deadlock), max leaves a
    few CPUs for the surrounding read/shuffle stages."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # scale the pool with the cluster: each actor pays one zero-copy
    # plasma map of the broadcast table (cheap), so on a real multi-node
    # cluster a small fixed cap would leave scoring CPUs idle; leave a
    # couple of CPUs for the surrounding read/shuffle stages
    return (1, max(4, cpus - 2))


def score_pairs(pairs_ds, records_ref, concurrency=None, batch_size=8192,
                use_actors: bool = False, aux_metrics: bool = False):
    if use_actors:
        return pairs_ds.map_batches(
            PairScorer,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            fn_constructor_kwargs={"records_ref": records_ref,
                                   "aux_metrics": aux_metrics},
            concurrency=concurrency or _auto_pool(),
        )
    return pairs_ds.map_batches(
        score_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"records_ref": records_ref, "aux_metrics": aux_metrics},
    )


_SEP = "\x1f"
_SEP2 = "\x1e"  # list packing inside the broadcast attrs table


def _pack_records(records_ds, id_name: str):
    """records -> compact string-packed attr rows keyed as id_name.
    List columns are joined with an unlikely separator so every column
    survives pandas<->arrow round trips inside the shuffle."""
    def _pack(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_name: batch["record_id"],
            f"{id_name}_doi": batch["doi_norm"],
            f"{id_name}_auth": pa.array(
                [_SEP.join(x or []) for x in batch["authors_norm"].to_pylist()]),
            f"{id_name}_inst": pa.array(
                [_SEP.join(x or []) for x in batch["insts_norm"].to_pylist()]),
            f"{id_name}_blob": batch["name_blob"],
        })

    return records_ds.map_batches(_pack, batch_format="pyarrow", zero_copy_batch=True)


def score_pairs_shuffle(pairs_ds, records_ds, num_buckets: int = 32,
                        batch_size: int = 8192, aux_metrics: bool = False):
    """The 10^12-row-corpus scoring path: when the record-attribute
    table is too large to broadcast to every node, pairs are joined to
    their two sides' attributes with two bucketed hash joins
    (ops.relational.bucket_join — each side ships only its OWN columns
    into the exchange; the old homogenized-union attach pre-padded four
    empty attr columns onto every pair row, doubling the shuffle width)
    and scored statelessly. Produces EXACTLY the same scored rows as
    the broadcast path (asserted in tests)."""
    from ..ops.relational import bucket_join

    def _ensure_families(b: pd.DataFrame) -> pd.DataFrame:
        if "families" not in b.columns:
            b = b.assign(families=3)
        return b

    pairs_ds = pairs_ds.map_batches(_ensure_families, batch_format="pandas")
    keep = ["left_id", "right_id", "block_key", "families"]
    pairs_ds = pairs_ds.map_batches(lambda b: b[keep], batch_format="pandas")
    left = bucket_join(pairs_ds, _pack_records(records_ds, "left_id"),
                       on="left_id", num_buckets=num_buckets).materialize()
    both = bucket_join(left, _pack_records(records_ds, "right_id"),
                       on="right_id", num_buckets=num_buckets)

    schema = pair_schema(aux_metrics)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as _pa

        if aux_metrics:
            cols = {name: [] for name in schema.names}
            for rec in batch.itertuples(index=False):
                vals = _score_tuple(
                    rec.left_id_doi,
                    rec.left_id_auth.split(_SEP) if rec.left_id_auth else [],
                    rec.left_id_inst.split(_SEP) if rec.left_id_inst else [],
                    rec.left_id_blob,
                    rec.right_id_doi,
                    rec.right_id_auth.split(_SEP) if rec.right_id_auth else [],
                    rec.right_id_inst.split(_SEP) if rec.right_id_inst else [],
                    rec.right_id_blob,
                    structural=bool(int(rec.families) & 3),
                    aux_metrics=True,
                )
                cols["left_id"].append(rec.left_id)
                cols["right_id"].append(rec.right_id)
                cols["block_key"].append(rec.block_key)
                for k, name in enumerate(schema.names[3:]):
                    cols[name].append(vals[k])
            return _pa.Table.from_pydict(cols, schema=schema).to_pandas()

        author, inst, combined, eq, conflict, m = score_vectors(
            batch["left_id_doi"].tolist(), batch["right_id_doi"].tolist(),
            batch["left_id_auth"].tolist(), batch["right_id_auth"].tolist(),
            batch["left_id_inst"].tolist(), batch["right_id_inst"].tolist(),
            batch["families"].to_numpy(), _SEP)
        return _pa.Table.from_pydict({
            "left_id": batch["left_id"].to_numpy(),
            "right_id": batch["right_id"].to_numpy(),
            "block_key": batch["block_key"].to_numpy(),
            "author_score": author, "inst_score": inst,
            "combined_score": combined, "doi_equal": eq,
            "doi_conflict": conflict, "is_match": m,
        }, schema=schema).to_pandas()

    return both.map_batches(_score, batch_format="pandas", batch_size=batch_size)


# ---------------------------------------------------------------------------
# Reference-parity mention scorer (the 8 comparison columns)
# ---------------------------------------------------------------------------

ADDED_COLUMNS = [
    "exact_author_match", "normalized_author_match", "author_similarity_score",
    "exact_institution_match", "normalized_institution_match",
    "institution_similarity_score", "openalex_matched_author_name",
    "openalex_matched_institution_strings",
]


class MentionScorer:
    """Parity port of `check...openalex.py:123-269` as an actor-pool
    stage. State: the works authority table broadcast as ONE zero-copy
    Arrow table (the local stand-in for the per-DOI API lookup, J2/S7);
    each actor builds only a doi -> row-index dict in __init__ and
    materializes a doi's authorships lazily, caching per-actor."""

    def __init__(self, works_by_doi_ref):
        import ray

        self.works_tbl = ray.get(works_by_doi_ref)  # arrow, plasma-mapped
        dois = self.works_tbl["doi"].to_pylist()
        self.idx = {d.strip().lower(): i for i, d in enumerate(dois) if d and d.strip()}
        self._auth_cache: dict = {}

    def _authorships(self, doi_lower: str):
        got = self._auth_cache.get(doi_lower)
        if got is None:
            i = self.idx.get(doi_lower)
            got = (self.works_tbl["authorships"][i].as_py() or []) if i is not None else []
            self._auth_cache[doi_lower] = got
        return got

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rec in batch.to_dict("records"):
            doi = (rec.get("doi") or "").strip()
            # the reference skips rows whose DOI doesn't start '10.'
            # (`check...openalex.py:67-69`); mirrored as a status skip
            if not doi.startswith("10."):
                continue
            authorships = self._authorships(doi.lower())
            author_raw = rec.get("author", "") or ""
            inst_raw = rec.get("institution", "") or ""
            author_norm = normalize_text(author_raw)
            inst_norm = normalize_text(inst_raw)

            # reference falls back to author.display_name when
            # raw_author_name is empty (`check...openalex.py:155-158,184-190`)
            def _api_name(auth):
                return (auth.get("raw_author_name")
                        or (auth.get("author") or {}).get("display_name", "")
                        or "")

            best_score, best_idx = -1.0, -1
            if author_norm and authorships:
                for idx, auth in enumerate(authorships):
                    api_name = _api_name(auth)
                    cur = indel_ratio(author_norm, normalize_text(api_name))
                    if cur > best_score:
                        best_score, best_idx = cur, idx
                        if best_score == 100.0:
                            break

            exact_author = norm_author = False
            author_sim = 0.0
            exact_inst = norm_inst = False
            inst_sim = 0.0
            matched_name = ""
            matched_insts = ""
            if best_idx != -1:
                best = authorships[best_idx]
                api_name = _api_name(best)
                matched_name = api_name
                author_sim = best_score
                exact_author = author_raw == api_name
                norm_author = author_norm == normalize_text(api_name)
                raw_affs = best.get("raw_affiliation_strings") or []
                matched_insts = "; ".join(raw_affs)
                norm_affs = [normalize_text(a) for a in raw_affs if a]
                norm_affs = [a for a in norm_affs if a]
                if not inst_raw:
                    exact_inst = not bool(raw_affs)
                elif raw_affs:
                    exact_inst = any(inst_raw.lower() == a.lower() for a in raw_affs)
                if not inst_norm:
                    norm_inst = not bool(norm_affs)
                elif norm_affs:
                    norm_inst = inst_norm in norm_affs
                if not inst_norm:
                    inst_sim = 100.0 if not norm_affs else 0.0
                elif norm_affs:
                    inst_sim = max(indel_ratio(inst_norm, a) for a in norm_affs)
            rec_out = dict(rec)
            rec_out["exact_author_match"] = exact_author
            rec_out["normalized_author_match"] = norm_author
            rec_out["author_similarity_score"] = round(author_sim if best_idx != -1 else 0.0, 2)
            rec_out["exact_institution_match"] = exact_inst
            rec_out["normalized_institution_match"] = norm_inst
            rec_out["institution_similarity_score"] = round(inst_sim, 2)
            rec_out["openalex_matched_author_name"] = matched_name
            rec_out["openalex_matched_institution_strings"] = matched_insts
            rows.append(rec_out)
        cols = list(batch.columns) + ADDED_COLUMNS
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        return pd.DataFrame(rows, columns=cols)


def broadcast_works_by_doi(works_ds):
    """Broadcast the (doi, authorships) authority table as one Arrow
    table — zero-copy mapped by every scorer actor, no per-actor
    unpickling of nested Python structures."""
    import ray

    tbl = pa.concat_tables(
        [b.select(["doi", "authorships"])
         for b in works_ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    ).combine_chunks()
    return ray.put(tbl)


def score_mentions(mentions_ds, works_by_doi_ref, concurrency=None, batch_size=1024):
    return mentions_ds.map_batches(
        MentionScorer,
        batch_format="pandas",
        batch_size=batch_size,
        fn_constructor_kwargs={"works_by_doi_ref": works_by_doi_ref},
        concurrency=concurrency or (1, 8),
    )
