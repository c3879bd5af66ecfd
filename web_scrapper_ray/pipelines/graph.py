"""Iterative graph algorithms over relational edge sources.

PageRank (q67) demonstrates the engine's iterative-computation shape:
a fixed number of synchronous power-iteration rounds where each round
is one distributed pass over the (static) edge partitions with a
broadcast rank vector — the standard "small mutable state, big
immutable edges" layout:

* the edge set is built ONCE and never transits the driver heap:
  per-block distinct (part, supplier) pairs (combiner) → the raw-task
  ``hash_shuffle`` dedups globally with ``gather=False`` (per-bucket
  ObjectRefs, not driver arrays) → a chained task per bucket
  factorizes its edges to dense node indices in the object store;
* the node space IS factorized: the driver holds only the sorted
  node-code table (one int64 per node — the broadcast-rank bound that
  every PageRank formulation shares) and every dense vector (degree,
  rank, bincount partials) is sized by the node COUNT, not by the
  maximum key value;
* per round, one Ray task per edge bucket scatters rank/degree
  contributions with ``np.bincount`` over dense indices and returns a
  node-count-sized partial; the driver sums P small vectors and
  rebroadcasts r/deg.

When the rank vector itself outgrows a single broadcast (≳10⁹ nodes),
the same rounds run with rank shards co-partitioned with the edge
buckets — the edge-side layout here is already bucketed to make that
swap local.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .pairs import hash_shuffle, mix64

_KEY_BITS = 32  # (partkey << 32) | suppkey packing — guarded below


def _read(sf_dir: str, table: str, columns=None):
    from .relational import _read as _rread

    return _rread(sf_dir, table, columns)  # memoized materialized read


def _unpack_edges(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Packed (partkey<<32)|suppkey codes → even/odd node codes."""
    lim = np.uint64(1) << np.uint64(_KEY_BITS)
    u = keys.view(np.uint64)
    pn = (u >> np.uint64(_KEY_BITS)).astype(np.int64) * 2
    sn = (u & (lim - np.uint64(1))).astype(np.int64) * 2 + 1
    return pn, sn


def _edge_buckets(sf_dir: str, P: int = 32):
    """Shared scaffolding for the part–supplier graph family (q67 /
    q126): distinct (l_partkey, l_suppkey) edge buckets built once in
    the object store, factorized to dense node indices.

    Returns ``(dense_refs, nodes)``: per-bucket ObjectRefs each holding
    BOTH undirected directions as dense-index arrays, plus the sorted
    node-code table (the only node-space object the driver ever holds).
    ``nodes`` may be empty — callers early-return their own schema.
    """
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    def split(block: pa.Table) -> pa.Table:
        if block.num_rows == 0 or "l_partkey" not in block.schema.names:
            keys = np.empty(0, np.uint64)
        else:
            import pyarrow.compute as pc
            keep = pc.and_kleene(pc.is_valid(block.column("l_partkey")),
                                 pc.is_valid(block.column("l_suppkey")))
            block = block.filter(pc.fill_null(keep, False))
            p = block.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            s = block.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            if len(p) and (p.max() >= lim or s.max() >= lim):
                # loud, not silent: packed keys would alias distinct
                # edges. The wide-key continuation is a two-column
                # distinct through the same exchange.
                raise ValueError("part/supp key >= 2^32 — pack overflow")
            keys = np.unique((p << np.uint64(_KEY_BITS)) | s)
        return pa.table({
            "key": pa.array(keys.view(np.int64), pa.int64()),
            "bucket": pa.array((mix64(keys) % np.uint64(P)).astype(np.int64)),
        })

    def merge(*tabs) -> np.ndarray:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(
            [t.column("key").to_numpy(zero_copy_only=False) for t in live]))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    # gather=False: the distinct edge buckets stay in the object store
    # as refs — only node-code uniques and node-count-sized partials
    # ever reach the driver
    pair_refs = hash_shuffle([(r, ()) for r in li.to_arrow_refs()],
                             split, merge, P=P, gather=False)

    @ray.remote
    def bucket_nodes(keys: np.ndarray) -> np.ndarray:
        if not len(keys):
            return np.empty(0, np.int64)
        pn, sn = _unpack_edges(keys)
        return np.unique(np.concatenate([pn, sn]))

    # merge bucket node-uniques INCREMENTALLY (one part in flight) so
    # the driver peak stays O(N) — a batched ray.get would transiently
    # hold up to P near-N-sized arrays before the final unique
    node_refs = [bucket_nodes.remote(r) for r in pair_refs]
    nodes = np.empty(0, np.int64)
    part_sizes = []
    for nr in node_refs:
        part = ray.get(nr)
        part_sizes.append(len(part))
        if len(part):
            nodes = np.union1d(nodes, part)
    if len(nodes) == 0:
        return [], nodes
    nref = ray.put(nodes)

    @ray.remote
    def to_dense(keys: np.ndarray, node_tab: np.ndarray):
        """Both undirected edge directions as dense node indices."""
        pn, sn = _unpack_edges(keys)
        pi = np.searchsorted(node_tab, pn)
        si = np.searchsorted(node_tab, sn)
        return (np.concatenate([pi, si]), np.concatenate([si, pi]))

    dense_refs = [to_dense.remote(r, nref)
                  for r, sz in zip(pair_refs, part_sizes) if sz]
    # pair_refs/node_refs fall out of scope on return — the dense tasks
    # hold the packed-key buckets only as long as they need them, so
    # only ONE edge representation stays pinned through the rounds
    return dense_refs, nodes


def _minlabel_fixpoint(dense_refs: list, N: int) -> np.ndarray:
    """Shared min-label-propagation loop behind :func:`cc_min_label`
    and :func:`cc_min_label_refs`. ``dense_refs`` are ObjectRefs (or
    pending task futures) of ``(src_idx, dst_idx)`` int64 index-array
    pairs — BOTH undirected directions included, indices into the
    sorted node table. Each round: one label broadcast + one
    scatter-min task per edge bucket (node-count-sized partial),
    driver-side pointer jumping on the O(N) index-valued label vector
    (``label[label]`` until stable), then EDGE CONTRACTION — one task
    per bucket rewrites its edges onto the current labels and drops
    self-loops (Shiloach–Vishkin supernode contraction). Contraction
    is what makes the round count logarithmic: jumping alone only
    compresses label chains, while the minimum still walks the GRAPH
    one edge per round (measured: a 20k-node random-id path took
    ~10.8k rounds without contraction, 5 with). Edge volume falls
    monotonically; converged buckets go empty. Labels are INDICES
    into the node table (the table is sorted, so the min index IS the
    min id). Returns the fixpoint label vector."""
    import ray

    _SENT = np.iinfo(np.int64).max

    @ray.remote
    def min_partial(edges, lab: np.ndarray, n: int) -> np.ndarray:
        src, dst = edges
        out = np.full(n, _SENT, np.int64)
        np.minimum.at(out, dst, lab[src])
        return out

    @ray.remote
    def contract(edges, lab: np.ndarray):
        src, dst = edges
        s = lab[src]
        d = lab[dst]
        m = s != d
        if not m.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        s, d = s[m], d[m]
        n = np.int64(len(lab))
        if n < np.int64(1) << np.int64(31):
            uk = np.unique(s * n + d)  # in-bucket dedupe, n² < 2^62
            return uk // n, uk % n
        return s, d

    label = np.arange(N, dtype=np.int64)
    while True:
        lref = ray.put(label)
        parts = ray.get([min_partial.remote(r, lref, N)
                         for r in dense_refs])
        new = (np.minimum(label, np.minimum.reduce(parts))
               if parts else label)
        while True:  # pointer jumping: halve chain depth per step
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, label):
            break
        label = new
        cref = ray.put(label)
        dense_refs = [contract.remote(r, cref) for r in dense_refs]
    return label


def cc_min_label(a: np.ndarray, b: np.ndarray, P: int = 16):
    """Distributed connected components over an explicit DRIVER-side
    edge list, run to the FIXPOINT: returns ``(nodes, roots)`` — the
    sorted unique node ids and, aligned, the MIN node id of each
    node's component.

    Scale shape (q126's layout generalized to unbounded diameter):
    edges are bucketed by source index and ``ray.put`` into the object
    store ONCE, then resolved by :func:`_minlabel_fixpoint` (label
    broadcast + scatter-min partials + pointer jumping, O(log n)
    rounds). The driver never holds more than the label vector and P
    node-count partials beyond the input arrays themselves. Callers
    whose pair list is corpus-scale should hand bucket ObjectRefs
    straight from their pair-generation shuffle to
    :func:`cc_min_label_refs` instead — then no edge representation
    ever transits the driver heap."""
    import ray

    nodes = np.unique(np.concatenate([
        np.asarray(a, np.int64), np.asarray(b, np.int64)]))
    N = len(nodes)
    if N == 0:
        return nodes, nodes.copy()
    ia = np.searchsorted(nodes, a).astype(np.int64)
    ib = np.searchsorted(nodes, b).astype(np.int64)
    s = np.concatenate([ia, ib])
    d = np.concatenate([ib, ia])
    bkt = s % P
    refs = []
    for p in range(P):
        m = bkt == p
        if m.any():
            refs.append(ray.put((s[m], d[m])))

    label = _minlabel_fixpoint(refs, N)
    return nodes, nodes[label]


def _pair_arrays(part):
    """(a, b) int64 arrays from one per-bucket pair container — a
    pa.Table or DataFrame whose first two columns are the endpoints
    (doc_a/doc_b by convention); empty- and None-safe."""
    empty = np.empty(0, np.int64)
    if part is None:
        return empty, empty
    if isinstance(part, pa.Table):
        if part.num_rows == 0:
            return empty, empty
        a = part.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        b = part.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        return a, b
    if len(part) == 0:
        return empty, empty
    cols = list(part.columns)
    return (part[cols[0]].to_numpy(np.int64),
            part[cols[1]].to_numpy(np.int64))


def cc_min_label_refs(pair_refs: list):
    """:func:`cc_min_label` for EDGE BUCKETS already in the object
    store — the scale-safe handoff from a candidate-pair shuffle: the
    pair list NEVER transits the driver. ``pair_refs`` are ObjectRefs
    of per-bucket pair tables ((doc_a, doc_b) leading int64 columns;
    extra columns ignored). Duplicate pairs ACROSS buckets are fine —
    scatter-min is idempotent over replicas, so banding shuffles can
    hand their buckets over without a global dedup pass.

    Driver footprint: the O(|nodes|) sorted node table + label vector
    and per-bucket node-id partials — never an edge list. Edge buckets
    are converted to dense-index form by one task per bucket (the
    original pair refs are released when those tasks finish), then
    resolved by the shared :func:`_minlabel_fixpoint` rounds."""
    import ray

    empty = np.empty(0, np.int64)
    if not pair_refs:
        return empty, empty.copy()

    @ray.remote
    def part_nodes(part) -> np.ndarray:
        a, b = _pair_arrays(part)
        return np.unique(np.concatenate([a, b]))

    nodes = empty
    for p in ray.get([part_nodes.remote(r) for r in pair_refs]):
        if len(p):
            nodes = np.union1d(nodes, p)
    if len(nodes) == 0:
        return nodes, nodes.copy()
    nref = ray.put(nodes)

    @ray.remote
    def to_dense(part, node_tab: np.ndarray):
        a, b = _pair_arrays(part)
        ia = np.searchsorted(node_tab, a).astype(np.int64)
        ib = np.searchsorted(node_tab, b).astype(np.int64)
        return (np.concatenate([ia, ib]), np.concatenate([ib, ia]))

    dense_refs = [to_dense.remote(r, nref) for r in pair_refs]
    label = _minlabel_fixpoint(dense_refs, len(nodes))
    return nodes, nodes[label]


def q_pagerank_part_supplier(sf_dir: str, iters: int = 3,
                             damping: float = 0.85) -> pd.DataFrame:
    """PageRank over the bipartite part–supplier graph: nodes are the
    parts and suppliers that appear in ``lineitem``, with an undirected
    edge for every DISTINCT (l_partkey, l_suppkey) pair; ``iters``
    synchronous rounds of r ← (1−d)/N + d·Σ r(u)/deg(u), uniform init.
    Every node in the edge set has degree ≥ 1 (no dangling mass) and
    the oracle unrolls the same rounds as chained SQL CTEs, so the
    result is SQL-checkable to 6dp."""
    import ray

    dense_refs, nodes = _edge_buckets(sf_dir)
    N = len(nodes)
    if N == 0:
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "pr": pd.Series(dtype="float64")})

    @ray.remote
    def degree_partial(edges, n: int) -> np.ndarray:
        src, _ = edges
        return np.bincount(src, minlength=n)

    deg = sum(ray.get([degree_partial.remote(r, N) for r in dense_refs]))
    deg = deg.astype(np.float64)  # every node has deg >= 1 by construction

    @ray.remote
    def contrib_partial(edges, r_over_d: np.ndarray, n: int) -> np.ndarray:
        # args arrive auto-dereferenced; passing the SAME rank ref to
        # every task keeps it one object-store fetch per node
        src, dst = edges
        return np.bincount(dst, weights=r_over_d[src], minlength=n)

    rank = np.full(N, 1.0 / N)
    base = (1.0 - damping) / N
    for _ in range(iters):
        # ship r/deg (not r) so each task does one gather, no division
        rref = ray.put(rank / deg)
        parts = ray.get([contrib_partial.remote(r, rref, N)
                         for r in dense_refs])
        rank = base + damping * sum(parts)

    names = [("p" if c % 2 == 0 else "s") + str(c // 2) for c in nodes]
    out = pd.DataFrame({"node": names, "pr": np.round(rank, 6)})
    return out.sort_values("node").reset_index(drop=True)


def q_connected_components(sf_dir: str, rounds: int = 4) -> pd.DataFrame:
    """Connected components of the part–supplier bipartite graph by
    synchronous min-label propagation: ``rounds`` fixed Jacobi rounds
    of lab'[v] = min(lab[v], min over neighbors lab[u]), labels
    initialized to each node's own packed code. A FIXED round count is
    the SQL-checkable contract (the oracle unrolls the same rounds as
    chained CTEs): both sides emit identical labels whether or not the
    propagation has converged, exactly like q67's unrolled PageRank.
    Layout is q67's (shared ``_edge_buckets``): distinct-edge buckets
    built once in the object store, per-round np.minimum scatter
    partials sized by node count, broadcast label vector."""
    import ray

    dense_refs, nodes = _edge_buckets(sf_dir)
    N = len(nodes)
    if N == 0:
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "component": pd.Series(dtype="int64")})

    _SENT = np.iinfo(np.int64).max

    @ray.remote
    def min_partial(edges, lab: np.ndarray, n: int) -> np.ndarray:
        src, dst = edges
        out = np.full(n, _SENT, np.int64)
        np.minimum.at(out, dst, lab[src])
        return out

    # labels ARE the node codes — the component id ends up the smallest
    # packed code reachable in `rounds` hops, on both sides identically
    label = nodes.astype(np.int64).copy()
    for _ in range(rounds):
        lref = ray.put(label)
        parts = ray.get([min_partial.remote(r, lref, N)
                         for r in dense_refs])
        incoming = np.minimum.reduce(parts) if parts else label
        label = np.minimum(label, incoming)

    names = [("p" if c % 2 == 0 else "s") + str(c // 2) for c in nodes]
    out = pd.DataFrame({"node": names, "component": label})
    return out.sort_values("node").reset_index(drop=True)


def q_bfs_hops(sf_dir: str, rounds: int = 4) -> pd.DataFrame:
    """BFS hop distance from the seed set {parts with p_size = 1} over
    the part–supplier bipartite graph, capped at ``rounds`` synchronous
    frontier rounds (the SQL twin unrolls the same rounds as chained
    min-aggregating CTEs, q126's contract). Same layout as q67/q126
    (shared ``_edge_buckets``): static edge buckets, one np.minimum
    scatter task per bucket per round, broadcast hop vector sized by
    node count. Seeds that have NO edges still emit their h=0 row
    (SQL's seed CTE doesn't require graph membership); unreachable
    nodes within the cap emit nothing."""
    import pyarrow.compute as pc
    import ray

    # seeds first: a world with no p_size=1 parts skips the whole
    # multi-exchange edge-bucket build
    part = _read(sf_dir, "part", columns=["p_partkey", "p_size"])

    def seed_codes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_partkey" not in t.schema.names:
            return pa.table({"c": pa.array([], pa.int64())})
        keep = pc.and_kleene(pc.is_valid(t.column("p_partkey")),
                             pc.equal(t.column("p_size"), 1))
        t = t.filter(pc.fill_null(keep, False))
        g = pa.table({"c": pc.multiply(pc.cast(t.column("p_partkey"),
                                               pa.int64()), 2)}) \
            .group_by(["c"]).aggregate([])
        return g

    seeds_df = part.map_batches(
        seed_codes, batch_format="pyarrow").to_pandas()
    seeds = (np.unique(seeds_df["c"].to_numpy(np.int64))
             if "c" in seeds_df.columns else np.empty(0, np.int64))

    _EMPTY = pd.DataFrame({"node": pd.Series(dtype="object"),
                           "hops": pd.Series(dtype="int64")})
    if len(seeds) == 0:
        return _EMPTY

    dense_refs, nodes = _edge_buckets(sf_dir)

    _SENT = np.iinfo(np.int64).max
    N = len(nodes)
    in_graph = np.searchsorted(nodes, seeds)
    mask = (in_graph < N)
    if N:
        mask &= nodes[np.clip(in_graph, 0, N - 1)] == seeds
    lone_seeds = seeds[~mask]  # edgeless: emit h=0 rows directly

    dist = np.full(N, _SENT, np.int64)
    if N:
        dist[in_graph[mask]] = 0

    @ray.remote
    def hop_partial(edges, d: np.ndarray, n: int) -> np.ndarray:
        src, dst = edges
        out = np.full(n, _SENT, np.int64)
        v = d[src]
        v = np.where(v == _SENT, _SENT, v + 1)
        np.minimum.at(out, dst, v)
        return out

    for _ in range(rounds if N else 0):
        dref = ray.put(dist)
        parts = ray.get([hop_partial.remote(r, dref, N)
                         for r in dense_refs])
        incoming = np.minimum.reduce(parts) if parts else dist
        dist = np.minimum(dist, incoming)

    reach = dist < _SENT
    codes = np.r_[nodes[reach], lone_seeds]
    hops = np.r_[dist[reach], np.zeros(len(lone_seeds), np.int64)]
    names = [("p" if c % 2 == 0 else "s") + str(c // 2) for c in codes]
    out = pd.DataFrame({"node": names, "hops": hops.astype(np.int64)})
    return out.sort_values("node").reset_index(drop=True)


def _pairs_by_shift(group_ids: np.ndarray, vals: np.ndarray):
    """All within-group ordered pairs (vals sorted within each group,
    groups contiguous): for shift s = 1..max_run, pair rows i and i+s
    sharing a group — vectorized per shift, never a per-group loop.
    Returns (left, right) value arrays."""
    n = len(vals)
    if n == 0:
        return (np.empty(0, vals.dtype),) * 2
    ls, rs = [], []
    s = 1
    while True:
        same = group_ids[s:] == group_ids[:-s]
        if not same.any():
            break
        ls.append(vals[:-s][same])
        rs.append(vals[s:][same])
        s += 1
        if s >= n:
            break
    if not ls:
        return (np.empty(0, vals.dtype),) * 2
    return np.concatenate(ls), np.concatenate(rs)


_COORDER_MEMO: dict = {}


def _coorder_edge_refs(sf_dir: str, P: int = 32,
                       with_counts: bool = False,
                       on: str = "l_orderkey",
                       val: str = "l_suppkey",
                       sample_val_p: float | None = None) -> list:
    """Distinct supplier co-occurrence edges as P object-store bucket
    refs of packed ``(min<<32)|max`` int64 keys — the shared first two
    exchanges of the co-order graph family (triangles q140, k-core
    q200, SSSP q210): (1) orderkey exchange dedups (order, supplier)
    and emits per-order pairs by vectorized shift-pairing, (2)
    edge-hash exchange dedups edges globally. With ``with_counts``
    each bucket table also carries ``n`` = the pair's distinct-shared-
    order support (summed across stage-1 buckets). ``on`` picks the
    co-occurrence key and ``val`` the paired node column — the
    co-order supplier graph by default; (on='l_orderkey',
    val='l_partkey') gives the sparse co-order PART graph (link
    prediction q291).
    ``gather=False`` everywhere: the edge set never transits the
    driver heap."""
    import pyarrow.compute as pc

    from .pairs import mix64

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    ds = _read(sf_dir, "lineitem", columns=[on, val])
    if sample_val_p is not None:
        # sampled-oracle contract: induced subgraph on the md5-coin
        # sample of node VALUES (both endpoints of a surviving edge
        # pass the coin) — identical predicate in the SQL twin
        from .pairs import coin_filter

        ds = ds.map_batches(coin_filter(val, sample_val_p),
                            batch_format="pyarrow")

    _E1 = pa.table({"okey": pa.array([], pa.int64()),
                    "supp": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.schema.names:
            return _E1
        keep = pc.and_kleene(pc.is_valid(t.column(on)),
                             pc.is_valid(t.column(val)))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E1
        g = (pa.table({"okey": pc.cast(t.column(on), pa.int64()),
                       "supp": pc.cast(t.column(val), pa.int64())})
             .group_by(["okey", "supp"]).aggregate([]))
        return pa.table({"okey": g.column("okey"), "supp": g.column("supp"),
                         "bucket": pc.bit_wise_and(g.column("okey"),
                                                   P - 1)})

    def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        # range-check BEFORE the uint64 cast: a negative key would wrap
        # to all-ones high bits and silently ALIAS distinct edges (the
        # _edge_buckets cast-first guard raises; so do we)
        if len(u) and (u.min() < 0 or v.min() < 0
                       or u.max() >= int(lim) or v.max() >= int(lim)):
            raise ValueError("suppkey outside [0, 2^32) packing domain")
        return ((u.astype(np.uint64) << np.uint64(_KEY_BITS))
                | v.astype(np.uint64)).view(np.int64)

    _EDGE = pa.table({"key": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})

    _EDGEN = pa.table({"key": pa.array([], pa.int64()),
                       "n": pa.array([], pa.int64()),
                       "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EDGEN if with_counts else _EDGE
        df = (pa.concat_tables(live).to_pandas()
              .drop_duplicates().sort_values(["okey", "supp"]))
        ok = df["okey"].to_numpy(np.int64)
        sp = df["supp"].to_numpy(np.int64)
        a, b = _pairs_by_shift(ok, sp)  # a < b (sorted within order)
        if with_counts:
            key, cnt = np.unique(_pack(a, b), return_counts=True)
            return pa.table({"key": pa.array(key),
                             "n": pa.array(cnt.astype(np.int64)),
                             "bucket": pa.array(
                                 (mix64(key) & np.uint64(P - 1))
                                 .astype(np.int64))})
        key = np.unique(_pack(a, b))
        return pa.table({"key": pa.array(key),
                         "bucket": pa.array(
                             (mix64(key) & np.uint64(P - 1))
                             .astype(np.int64))})

    def split_pass(t: pa.Table) -> pa.Table:
        return t if t.num_rows else (_EDGEN if with_counts else _EDGE)

    def merge_edges(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pa.table({"key": pa.array([], pa.int64())}) \
                if not with_counts else \
                pa.table({"key": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if with_counts:
            g = (pa.concat_tables(live).to_pandas()
                 .groupby("key", as_index=False).agg(n=("n", "sum")))
            return pa.table({"key": pa.array(
                                 g["key"].to_numpy(np.int64)),
                             "n": pa.array(g["n"].to_numpy(np.int64))})
        key = np.unique(np.concatenate(
            [x.column("key").to_numpy() for x in live]))
        return pa.table({"key": pa.array(key)})

    # MEMOIZED like relational._read: the distinct edge set is a pure
    # function of the on-disk lineitem table, and the co-order graph
    # family (q140/q200/q210/q228/q260/q262/q291/q310) each paid the
    # two exchanges again (~0.3–0.5 s at sf0.1, ~1.7 s at sf1). Keyed
    # on file identity incl. mtime/size; FIFO-capped — the pinned
    # bucket refs are the (small) distinct edge set, not the fact
    # table.
    try:
        st = os.stat(os.path.join(sf_dir, "lineitem.parquet"))
        memo_key = (os.path.abspath(sf_dir), P, with_counts, on, val,
                    sample_val_p, st.st_mtime_ns, st.st_size)
    except OSError:
        memo_key = None
    if memo_key is not None and memo_key in _COORDER_MEMO:
        return _COORDER_MEMO[memo_key]
    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    s1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)
    refs = hash_shuffle([(r, ()) for r in s1], split_pass,
                        merge_edges, P=P, gather=False)
    if memo_key is not None:
        if len(_COORDER_MEMO) >= 8:
            _COORDER_MEMO.pop(next(iter(_COORDER_MEMO)))
        _COORDER_MEMO[memo_key] = refs
    return refs


def q_triangle_count(sf_dir: str, P: int = 32,
                     dense_limit: int = 32768) -> pd.DataFrame:
    """Triangles in the supplier co-occurrence graph (suppliers sharing
    an order are adjacent) — the MapReduce NodeIterator++ plan, NO
    adjacency broadcast: (1) orderkey exchange builds per-order
    supplier pairs (vectorized shift-pairing, never a per-order loop),
    (2) edge-hash exchange dedups edges globally; each bucket ALSO
    receives (3) the wedges keyed to it — every edge bucket emits its
    u-side wedge candidates... concretely: edges are re-exchanged on
    their SMALLEST node u, each u-bucket generates the wedges (v, w)
    over u's sorted higher neighbors, and (4) the wedge stream joins
    the edge buckets under the SAME packed-key partition function, so
    each triangle (u<v<w) is counted exactly once where its closing
    edge (v, w) lives. Driver folds P counts. Wedge volume Σ d(u)² is
    the standard cost of this plan; skewed hubs pay it there, not on a
    broadcast."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    edge_refs = _coorder_edge_refs(sf_dir, P)

    _EDGE = pa.table({"key": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})

    def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        if len(u) and (u.min() < 0 or v.min() < 0
                       or u.max() >= int(lim) or v.max() >= int(lim)):
            raise ValueError("suppkey outside [0, 2^32) packing domain")
        return ((u.astype(np.uint64) << np.uint64(_KEY_BITS))
                | v.astype(np.uint64)).view(np.int64)

    def split_pass(t: pa.Table) -> pa.Table:
        return t if t.num_rows else _EDGE

    # ---- dense-domain fast path -----------------------------------
    # The node domain here is the SUPPLIER DIM — bounded — and order
    # co-occurrence makes the graph near-complete, where the wedge
    # plan's Σd(u)² blows up quadratically (measured: ~2e9 wedges /
    # 44 s at sf0.1 vs 0.6 s on this path). When the distinct node
    # count and edge count fit a broadcastable bitset adjacency
    # (n ≤ 32768 → ≤ 128 MB), count each triangle at its closing edge
    # (v, w) as popcount(adj[v] & adj[w] & bits<v) — per-bucket tasks
    # over the same edge partition, vectorized byte ops, no wedge
    # stream. Larger/sparser graphs fall through to the wedge plan.
    @ray.remote
    def bucket_nodes(t: pa.Table):
        if t.num_rows == 0:
            return np.empty(0, np.int64), 0
        k = t.column("key").to_numpy()
        u = (k.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (k.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        return np.unique(np.concatenate([u, v])), len(k)

    nsets = ray.get([bucket_nodes.remote(r) for r in edge_refs])
    nodes = np.unique(np.concatenate([x[0] for x in nsets])) if nsets \
        else np.empty(0, np.int64)
    m_edges = sum(x[1] for x in nsets)
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pd.DataFrame({"n_triangles": np.array([0], np.int64)})
    if n_nodes <= dense_limit and m_edges <= 20_000_000:
        W = (n_nodes + 7) // 8
        edge_tabs = ray.get(list(edge_refs))
        keys = np.concatenate(
            [t.column("key").to_numpy() for t in edge_tabs
             if t.num_rows] or [np.empty(0, np.int64)])
        eu = (keys.view(np.uint64)
              >> np.uint64(_KEY_BITS)).astype(np.int64)
        ev = (keys.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)
        iu = np.searchsorted(nodes, eu)
        iv = np.searchsorted(nodes, ev)
        A = np.zeros((n_nodes, W), np.uint8)
        # little-endian bit layout: node j lives at byte j>>3, bit j&7
        np.bitwise_or.at(A, (iu, iv >> 3),
                         (1 << (iv & 7)).astype(np.uint8))
        np.bitwise_or.at(A, (iv, iu >> 3),
                         (1 << (iu & 7)).astype(np.uint8))
        aref = ray.put(A)
        POP = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None],
            axis=1).sum(axis=1).astype(np.int64)

        @ray.remote
        def close_dense(t: pa.Table, adj) -> int:
            if t.num_rows == 0:
                return 0
            k = t.column("key").to_numpy()
            v = np.searchsorted(nodes, (k.view(np.uint64)
                                        >> np.uint64(_KEY_BITS))
                                .astype(np.int64))
            w = np.searchsorted(nodes, (k.view(np.uint64)
                                        & (lim - np.uint64(1)))
                                .astype(np.int64))
            both = adj[v] & adj[w]
            # keep only common-neighbor bits u < v: full bytes below
            # v>>3, plus the partial byte at v>>3
            byte_idx = np.arange(W, dtype=np.int64)[None, :]
            vb = (v >> 3)[:, None]
            both = np.where(byte_idx < vb, both, 0).astype(np.uint8)
            partial = adj[v, v >> 3] & adj[w, v >> 3] & (
                (1 << (v & 7)) - 1).astype(np.uint8)
            return int(POP[both].sum() + POP[partial].sum())

        counts = ray.get([close_dense.remote(r, aref)
                          for r in edge_refs])
        return pd.DataFrame({"n_triangles": np.array(
            [int(sum(counts))], np.int64)})

    # stage 3: re-key distinct edges on their smallest node u and
    # generate wedges over each u's sorted higher neighbors
    def split_u(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EDGE
        key = t.column("key").to_numpy()
        u = (key.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        return pa.table({"key": t.column("key"),
                         "bucket": pa.array(
                             (mix64(u) & np.uint64(P - 1))
                             .astype(np.int64))})

    def merge_wedges(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EDGE
        key = np.sort(np.concatenate(
            [x.column("key").to_numpy() for x in live]))
        u = (key.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (key.view(np.uint64)
             & (lim - np.uint64(1))).astype(np.int64)
        # neighbors v are sorted within each u run (packed-key sort)
        wv, ww = _pairs_by_shift(u, v)
        wkey = _pack(wv, ww)
        return pa.table({"key": pa.array(wkey),
                         "bucket": pa.array(
                             (mix64(wkey) & np.uint64(P - 1))
                             .astype(np.int64))})

    wedge_refs = hash_shuffle([(r, ()) for r in edge_refs], split_u,
                              merge_wedges, P=P, gather=False)

    # merge_wedges' outputs carry the CLOSING-EDGE bucket column but
    # still live in their generating u-bucket — one more pass-through
    # exchange routes each wedge to the bucket holding its (v, w) edge
    def merge_concat(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pa.table({"key": pa.array([], pa.int64())})
        return pa.concat_tables(live)

    routed = hash_shuffle([(r, ()) for r in wedge_refs], split_pass,
                          merge_concat, P=P, gather=False)

    # stage 4: wedges meet the closing-edge bucket (same partition fn)
    @ray.remote
    def close_count(edges: pa.Table, wedges: pa.Table) -> int:
        if edges.num_rows == 0 or wedges.num_rows == 0:
            return 0
        return int(np.isin(wedges.column("key").to_numpy(),
                           edges.column("key").to_numpy()).sum())

    counts = ray.get([close_count.remote(e, w)
                      for e, w in zip(edge_refs, routed)])
    return pd.DataFrame({"n_triangles": np.array([int(sum(counts))],
                                                 np.int64)})


def q_k_core(sf_dir: str, k: int = 3, rounds: int = 6,
             P: int = 32) -> pd.DataFrame:
    """Bounded k-core peeling of the supplier co-occurrence graph:
    ``rounds`` synchronous rounds of "drop every node whose degree in
    the surviving subgraph is < k", then report survivors with their
    induced degree. CONTRACT: exactly ``rounds`` peel rounds on BOTH
    sides — the oracle unrolls them as chained CTEs (true k-core is
    the fixpoint; on dense co-order graphs peeling converges in 2-3
    rounds and the engine early-exits once a round removes nothing,
    which IS the fixpoint of every later round).

    Distributed shape (same layout discipline as PageRank above): the
    distinct edge set is built once by ``_coorder_edge_refs`` and
    stays pinned in the object store; each round broadcasts the alive
    bool vector (``ray.put``, O(#suppliers)) and runs one degree task
    per edge bucket (bincount over edges with both endpoints alive);
    the driver folds P dense count vectors. Rows never move after the
    edge build — per-round traffic is O(P·nodes), not O(edges)."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    edge_refs = _coorder_edge_refs(sf_dir, P)
    empty = pd.DataFrame({"l_suppkey": pd.Series(dtype="int64"),
                          "deg": pd.Series(dtype="int64")})

    @ray.remote
    def bucket_nodes(t: pa.Table) -> np.ndarray:
        if t.num_rows == 0:
            return np.empty(0, np.int64)
        kk = t.column("key").to_numpy()
        u = (kk.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (kk.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        return np.unique(np.concatenate([u, v]))

    nsets = ray.get([bucket_nodes.remote(r) for r in edge_refs])
    live_sets = [x for x in nsets if x.size]
    if not live_sets:
        return empty
    nodes = np.unique(np.concatenate(live_sets))
    n = nodes.size

    @ray.remote
    def degree_task(t: pa.Table, nodes: np.ndarray,
                    alive: np.ndarray) -> np.ndarray:
        if t.num_rows == 0:
            return np.zeros(len(nodes), np.int64)
        kk = t.column("key").to_numpy()
        u = (kk.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (kk.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        iu = np.searchsorted(nodes, u)
        iv = np.searchsorted(nodes, v)
        keep = alive[iu] & alive[iv]
        deg = np.bincount(iu[keep], minlength=len(nodes))
        deg += np.bincount(iv[keep], minlength=len(nodes))
        return deg.astype(np.int64)

    nodes_ref = ray.put(nodes)
    alive = np.ones(n, bool)
    deg = np.zeros(n, np.int64)
    for _ in range(rounds):
        alive_ref = ray.put(alive)
        deg = np.sum(ray.get([degree_task.remote(r, nodes_ref, alive_ref)
                              for r in edge_refs]), axis=0)
        nxt = alive & (deg >= k)
        if (nxt == alive).all():
            break  # fixpoint: every later round is identical
        alive = nxt
    # survivors' degree within the FINAL surviving subgraph
    alive_ref = ray.put(alive)
    deg = np.sum(ray.get([degree_task.remote(r, nodes_ref, alive_ref)
                          for r in edge_refs]), axis=0)
    keep = alive & (deg >= k)
    if not keep.any():
        return empty
    return pd.DataFrame({"l_suppkey": nodes[keep],
                         "deg": deg[keep].astype(np.int64)})


def q_sssp_bounded(sf_dir: str, rounds: int = 4,
                   P: int = 32) -> pd.DataFrame:
    """Bounded single-source shortest paths (Bellman-Ford, ``rounds``
    synchronous relaxation rounds) over the WEIGHTED supplier co-order
    graph: edge weight = 1/support (support = distinct shared orders),
    source = the smallest supplier key in the edge set. CONTRACT:
    exactly ``rounds`` rounds on both sides — the oracle unrolls the
    identical min-relaxation recurrence as chained CTEs, and every
    candidate distance is the same float64 expression (d[u] + 1.0/c)
    on both sides, so the min is bit-deterministic. The engine
    early-exits once a round changes nothing (the fixpoint of every
    later round).

    Distributed shape (q67's layout): counted edge buckets stay pinned
    in the object store; each round broadcasts the distance vector and
    runs one ``np.minimum.at`` relaxation task per bucket; the driver
    folds P node-sized vectors."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    edge_refs = _coorder_edge_refs(sf_dir, P, with_counts=True)
    empty = pd.DataFrame({"l_suppkey": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="float64")})

    @ray.remote
    def bucket_nodes(t: pa.Table) -> np.ndarray:
        if t.num_rows == 0:
            return np.empty(0, np.int64)
        kk = t.column("key").to_numpy()
        u = (kk.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (kk.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        return np.unique(np.concatenate([u, v]))

    nsets = ray.get([bucket_nodes.remote(r) for r in edge_refs])
    live = [x for x in nsets if x.size]
    if not live:
        return empty
    nodes = np.unique(np.concatenate(live))
    n = nodes.size
    nodes_ref = ray.put(nodes)

    @ray.remote
    def relax(t: pa.Table, nodes: np.ndarray,
              dist: np.ndarray) -> np.ndarray:
        out = np.full(len(nodes), np.inf)
        if t.num_rows == 0:
            return out
        kk = t.column("key").to_numpy()
        w = 1.0 / t.column("n").to_numpy().astype(np.float64)
        u = (kk.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (kk.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        iu = np.searchsorted(nodes, u)
        iv = np.searchsorted(nodes, v)
        np.minimum.at(out, iv, dist[iu] + w)
        np.minimum.at(out, iu, dist[iv] + w)
        return out

    dist = np.full(n, np.inf)
    dist[0] = 0.0  # nodes sorted: index 0 IS the smallest supplier
    for _ in range(rounds):
        dref = ray.put(dist)
        cand = np.minimum.reduce(
            ray.get([relax.remote(r, nodes_ref, dref)
                     for r in edge_refs]))
        nxt = np.minimum(dist, cand)
        if (nxt == dist).all():
            break  # fixpoint: later rounds are identical
        dist = nxt
    keep = np.isfinite(dist)
    from .pairs import round_away
    return pd.DataFrame({"l_suppkey": nodes[keep],
                         "dist": round_away(dist[keep], 6)})


def q_clustering_coefficient(sf_dir: str, P: int = 32,
                             dense_limit: int = 32768,
                             sample_p: float | None = None
                             ) -> pd.DataFrame:
    """Per-node LOCAL clustering coefficient over the supplier
    co-occurrence graph — q140's global triangle count refined to the
    node level: cc(x) = 2·tri(x) / (deg(x)·(deg(x)−1)) for deg ≥ 2,
    the "how clique-like is my neighborhood" scores that community
    detection thresholds on.

    Per-node triangle counts come from the closing-edge bitset scan
    (q140's dense path): for each distinct edge (v, w), every common
    neighbor u closes the triangle {u, v, w} — and crediting ONLY u at
    edge (v, w) credits each node exactly once per triangle (a node is
    the common neighbor of exactly its OPPOSITE edge). Each edge
    bucket unpacks its adj[v] & adj[w] rows into a dense bit matrix
    and folds one node-count-sized credit vector; the driver sums P
    partials — O(P·nodes) traffic after the one-time edge build, the
    same dim-bounded layout as q200/q67 (the node domain is the
    SUPPLIER DIMENSION; a >32k-node graph needs q140's wedge plan
    carrying the wedge center, the documented continuation)."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)
    edge_refs = _coorder_edge_refs(sf_dir, P, sample_val_p=sample_p)
    empty = pd.DataFrame({"l_suppkey": pd.Series(dtype="int64"),
                          "degree": pd.Series(dtype="int64"),
                          "n_tri": pd.Series(dtype="int64"),
                          "cc": pd.Series(dtype="float64")})

    @ray.remote
    def bucket_nodes(t: pa.Table) -> np.ndarray:
        if t.num_rows == 0:
            return np.empty(0, np.int64)
        kk = t.column("key").to_numpy()
        u = (kk.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (kk.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        return np.unique(np.concatenate([u, v]))

    nsets = ray.get([bucket_nodes.remote(r) for r in edge_refs])
    nodes = (np.unique(np.concatenate(nsets)) if nsets
             else np.empty(0, np.int64))
    n_nodes = len(nodes)
    if n_nodes == 0:
        return empty
    if n_nodes > dense_limit:
        raise NotImplementedError(
            "clustering coefficient beyond the dim-bounded bitset "
            "path: carry the wedge center through q140's wedge plan")
    W = (n_nodes + 7) // 8
    edge_tabs = ray.get(list(edge_refs))
    keys = np.concatenate(
        [t.column("key").to_numpy() for t in edge_tabs
         if t.num_rows] or [np.empty(0, np.int64)])
    eu = (keys.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
    ev = (keys.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
    iu = np.searchsorted(nodes, eu)
    iv = np.searchsorted(nodes, ev)
    A = np.zeros((n_nodes, W), np.uint8)
    np.bitwise_or.at(A, (iu, iv >> 3), (1 << (iv & 7)).astype(np.uint8))
    np.bitwise_or.at(A, (iv, iu >> 3), (1 << (iu & 7)).astype(np.uint8))
    aref = ray.put(A)

    @ray.remote
    def credit(t: pa.Table, adj) -> np.ndarray:
        if t.num_rows == 0:
            return np.zeros(n_nodes, np.int64)
        k = t.column("key").to_numpy()
        v = np.searchsorted(nodes, (k.view(np.uint64)
                                    >> np.uint64(_KEY_BITS))
                            .astype(np.int64))
        w = np.searchsorted(nodes, (k.view(np.uint64)
                                    & (lim - np.uint64(1)))
                            .astype(np.int64))
        both = adj[v] & adj[w]
        bits = np.unpackbits(both, axis=1, count=n_nodes,
                             bitorder="little")
        return bits.sum(axis=0, dtype=np.int64)

    partials = ray.get([credit.remote(r, aref) for r in edge_refs])
    tri = np.sum(partials, axis=0).astype(np.int64)
    pop = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.int64)
    deg = pop[A].sum(axis=1)
    keep = deg >= 2
    d = deg[keep].astype(np.float64)
    cc = 2.0 * tri[keep] / (d * (d - 1.0))
    from .pairs import round_away

    return pd.DataFrame({"l_suppkey": nodes[keep],
                         "degree": deg[keep],
                         "n_tri": tri[keep],
                         "cc": round_away(cc, 6)})


def _bipartite_edge_refs(sf_dir: str, P: int = 32) -> list:
    """Distinct (part, supplier) edges as per-bucket packed-key
    ObjectRefs, KEEPING the two node spaces separate (unlike
    ``_edge_buckets``, which unions them into one undirected space).
    Each distinct edge lands in exactly one bucket, so per-bucket
    degree/contribution partials fold without double counting."""
    import pyarrow.compute as pc

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    def split(block: pa.Table) -> pa.Table:
        if block.num_rows == 0 or "l_partkey" not in block.schema.names:
            keys = np.empty(0, np.uint64)
        else:
            keep = pc.and_kleene(pc.is_valid(block.column("l_partkey")),
                                 pc.is_valid(block.column("l_suppkey")))
            block = block.filter(pc.fill_null(keep, False))
            p = block.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            s = block.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            if len(p) and (p.max() >= lim or s.max() >= lim):
                raise ValueError("part/supp key >= 2^32 — pack overflow")
            keys = np.unique((p << np.uint64(_KEY_BITS)) | s)
        return pa.table({
            "key": pa.array(keys.view(np.int64), pa.int64()),
            "bucket": pa.array((mix64(keys) % np.uint64(P))
                               .astype(np.int64))})

    def merge(*tabs) -> np.ndarray:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(
            [t.column("key").to_numpy(zero_copy_only=False)
             for t in live]))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return hash_shuffle([(r, ()) for r in li.to_arrow_refs()],
                        split, merge, P=P, gather=False)


def q_degree_assortativity(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Bipartite degree assortativity of the part–supplier graph: the
    Pearson correlation, over DISTINCT (part, supplier) edges, between
    the part's supplier-degree and the supplier's part-degree — the
    standard mixing diagnostic (negative = hubs attach to leaves).
    One packed-key hash exchange dedups edges globally (each distinct
    edge lands in exactly ONE bucket); per-bucket partial degree
    counts fold into two dimension-sized degree tables (parts and
    suppliers are the small side of this graph at any lineitem scale —
    the same broadcast bound as q67's rank vector); a second task wave
    over the SAME bucket refs joins degrees locally via searchsorted
    and emits centered Chan moment partials, so the driver merges P
    tiny rows. corr = Sxy/√(Sxx·Syy) with EXACT min==max constancy
    flags (q92's rule) → NULL like DuckDB's corr on a constant side or
    n < 2; an ungrouped SQL aggregate emits exactly one row even on
    empty input (q136's rule), mirrored here."""
    import ray

    from .pairs import round_away

    edge_refs = _bipartite_edge_refs(sf_dir, P)

    @ray.remote
    def degree_partial(keys: np.ndarray):
        if not len(keys):
            e = np.empty(0, np.int64)
            return (e, e), (e, e)
        pn, sn = _unpack_edges(keys)
        up, cp = np.unique(pn, return_counts=True)
        us, cs = np.unique(sn, return_counts=True)
        return (up, cp.astype(np.int64)), (us, cs.astype(np.int64))

    one = lambda n, a: pd.DataFrame(  # noqa: E731
        {"n_edges": pd.array([n], "int64"),
         "assort": pd.array([a], "float64")})

    dp: dict = {}
    ds: dict = {}
    deg_parts = ray.get([degree_partial.remote(r) for r in edge_refs])
    for (up, cp), (us, cs) in deg_parts:
        for k, c in zip(up.tolist(), cp.tolist()):
            dp[k] = dp.get(k, 0) + c
        for k, c in zip(us.tolist(), cs.tolist()):
            ds[k] = ds.get(k, 0) + c
    if not dp:
        return one(0, np.nan)
    pk = np.fromiter(dp.keys(), np.int64, len(dp))
    po = np.argsort(pk)
    pk, pv = pk[po], np.fromiter(dp.values(), np.int64, len(dp))[po]
    sk = np.fromiter(ds.keys(), np.int64, len(ds))
    so = np.argsort(sk)
    sk, sv = sk[so], np.fromiter(ds.values(), np.int64, len(ds))[so]
    pref, sref = ray.put((pk, pv)), ray.put((sk, sv))

    @ray.remote
    def moment_partial(keys: np.ndarray, ptab, stab):
        if not len(keys):
            return None
        pn, sn = _unpack_edges(keys)
        pk, pv = ptab
        sk, sv = stab
        x = pv[np.searchsorted(pk, pn)].astype(np.float64)
        y = sv[np.searchsorted(sk, sn)].astype(np.float64)
        mx, my = x.mean(), y.mean()
        dx, dy = x - mx, y - my
        return (float(len(x)), mx, my, float(dx @ dx),
                float(dx @ dy), float(dy @ dy),
                float(x.min()), float(x.max()),
                float(y.min()), float(y.max()))

    moms = [m for m in ray.get(
        [moment_partial.remote(r, pref, sref) for r in edge_refs])
        if m is not None]
    n = mx = my = sxx = sxy = syy = 0.0
    xmin = ymin = np.inf
    xmax = ymax = -np.inf
    for nb, bmx, bmy, bxx, bxy, byy, bx0, bx1, by0, by1 in moms:
        xmin, xmax = min(xmin, bx0), max(xmax, bx1)
        ymin, ymax = min(ymin, by0), max(ymax, by1)
        if n == 0.0:
            n, mx, my, sxx, sxy, syy = nb, bmx, bmy, bxx, bxy, byy
            continue
        tot = n + nb
        dx, dy = bmx - mx, bmy - my
        w = n * nb / tot
        sxx += bxx + dx * dx * w
        sxy += bxy + dx * dy * w
        syy += byy + dy * dy * w
        mx += dx * nb / tot
        my += dy * nb / tot
        n = tot
    if n < 2.0 or xmin == xmax or ymin == ymax:
        return one(int(n), np.nan)
    assort = sxy / np.sqrt(sxx * syy)
    return one(int(n), round_away(np.array([assort]), 6)[0])


def q_hits_hubs(sf_dir: str, rounds: int = 6, P: int = 32
                ) -> pd.DataFrame:
    """HITS hub scores of parts in the bipartite part–supplier graph —
    the link-analysis complement to q67's PageRank (hubs point at good
    authorities; 6 alternating rounds of hub = E·auth, auth = Eᵀ·hub
    from hub₀ ≡ 1). Same layout discipline as PageRank: distinct edge
    buckets stay in the object store, each round is one task wave per
    bucket scattering np.bincount partials over dense node indices,
    and the driver holds only the two dimension-sized score vectors
    (parts/suppliers are the small side at any lineitem scale). No
    per-round normalization — leak-free growth is linear, so the
    single final L1 normalization is exactly the per-round-normalized
    direction, and it keeps every intermediate INTEGER-valued (exact
    on both sides until 2^53; beyond that the normalized round(…, 6)
    absorbs the last-ulp summation-order drift vs the oracle's
    recursive join-aggregate)."""
    import ray

    from .pairs import round_away

    cols = {"partkey": pd.Series(dtype="int64"),
            "hub": pd.Series(dtype="float64")}
    edge_refs = _bipartite_edge_refs(sf_dir, P)

    @ray.remote
    def bucket_nodes(keys: np.ndarray):
        if not len(keys):
            e = np.empty(0, np.int64)
            return e, e
        pn, sn = _unpack_edges(keys)
        return np.unique(pn), np.unique(sn)

    parts = np.empty(0, np.int64)
    supps = np.empty(0, np.int64)
    for ref in [bucket_nodes.remote(r) for r in edge_refs]:
        up, us = ray.get(ref)
        if len(up):
            parts = np.union1d(parts, up)
        if len(us):
            supps = np.union1d(supps, us)
    if not len(parts):
        return pd.DataFrame(cols)
    pref, sref = ray.put(parts), ray.put(supps)

    @ray.remote
    def dense(keys: np.ndarray, ptab, stab):
        pn, sn = _unpack_edges(keys)
        return (np.searchsorted(ptab, pn).astype(np.int64),
                np.searchsorted(stab, sn).astype(np.int64))

    dense_refs = [dense.remote(r, pref, sref) for r in edge_refs]

    @ray.remote
    def scatter(idx, vec: np.ndarray, n: int, side: int) -> np.ndarray:
        pi, si = idx
        src, dst = (pi, si) if side == 0 else (si, pi)
        out = np.zeros(n, np.float64)
        np.add.at(out, dst, vec[src])
        return out

    hub = np.ones(len(parts), np.float64)
    for _ in range(rounds):
        aref = ray.put(hub)
        auth = sum(ray.get([scatter.remote(d, aref, len(supps), 0)
                            for d in dense_refs]))
        bref = ray.put(auth)
        hub = sum(ray.get([scatter.remote(d, bref, len(parts), 1)
                           for d in dense_refs]))
    tot = float(hub.sum())
    # parts holds _unpack_edges' even node codes (2·partkey) — decode
    return pd.DataFrame({"partkey": parts >> 1,
                         "hub": round_away(hub / tot, 6)})


def _common_neighbors_blocked(edge_refs: list, k: int) -> pd.DataFrame:
    """Exact common-neighbors top-k via broadcast-CSR row blocks — the
    shuffle-free plan for graphs whose adjacency fits a broadcast (the
    caller gates on edge count): one task builds the dense-coded CSR
    in the object store; B independent tasks each expand the second
    hop for a contiguous row block (vectorized two-level CSR gather,
    sort + run-length = the exact A² row slice), drop adjacent pairs
    with a block-local sorted-key anti-join, and emit their local
    top-k; the driver folds B·k rows. Pair (v, w) with v < w is
    counted once — and completely — inside v's block (the count sums
    over ALL centers u regardless of where u lives), so no cross-block
    combine exists. The wedge work Σd(u)² is unchanged vs the wave
    plan; what disappears is the two-exchange object-store traffic
    (~24 B/wedge), which dominated its wall time (sf1: measured
    ~100–130 s waves vs ~26 s blocked at 2.98e9 wedges). Blocks are
    cut by CUMULATIVE wedge cost, not row count, so skewed rows can't
    blow a task's memory; per-block transient ≈ WSR_CN_BLOCK_WEDGES ×
    ~50 B (keep target × concurrency under worker heap: 64M × 32
    tasks OOM-killed workers on this 128 GB box; 16M is safe)."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)
    cols = {"p1": pd.Series(dtype="int64"),
            "p2": pd.Series(dtype="int64"),
            "n_common": pd.Series(dtype="int64")}
    target = int(os.environ.get("WSR_CN_BLOCK_WEDGES", 16_000_000))

    @ray.remote(num_returns=2)
    def build_csr(*tabs):
        keys = [t.column("key").to_numpy() for t in tabs if t.num_rows]
        if not keys:
            return None, np.zeros(1, np.int64)
        key = np.concatenate(keys)
        u = (key.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (key.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        iu = np.searchsorted(nodes, u).astype(np.int64)
        iv = np.searchsorted(nodes, v).astype(np.int64)
        src = np.concatenate([iu, iv])
        dst = np.concatenate([iv, iu])
        N = len(nodes)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        deg = np.bincount(src, minlength=N)
        indptr = np.zeros(N + 1, np.int64)
        np.cumsum(deg, out=indptr[1:])
        # cut row blocks by cumulative wedge cost Σ_{u∈N(v)} d(u)
        roww = (np.add.reduceat(deg[dst], indptr[:-1])
                if len(dst) else np.zeros(N, np.int64))
        roww[deg == 0] = 0  # reduceat repeats on empty slices
        cw = np.cumsum(roww, dtype=np.float64)
        # adaptive target: small graphs split into ~64 blocks so every
        # core works (2 waves at 32 CPUs); big graphs keep the memory
        # bound (target × concurrency under worker heap)
        eff_target = min(target, max(2e6, cw[-1] / 64.0))
        nblk = max(1, int(np.ceil(cw[-1] / eff_target))) if cw[-1] \
            else 1
        cuts = [int(np.searchsorted(cw, cw[-1] * i / nblk))
                for i in range(nblk)] + [N]
        bounds = np.unique(np.array(cuts, np.int64))
        return (nodes, indptr, dst.astype(np.int32)), bounds

    csr_ref, bounds_ref = build_csr.remote(*edge_refs)
    bounds = ray.get(bounds_ref)
    if len(bounds) < 2:
        return pd.DataFrame(cols)

    @ray.remote
    def block_topk(csr, lo: int, hi: int):
        E = (np.empty(0, np.int64),) * 3
        if csr is None:
            return E
        nodes, indptr, indices = csr
        N = np.int64(len(nodes))
        deg = np.diff(indptr)
        first = indices[indptr[lo]:indptr[hi]].astype(np.int64)
        d2 = deg[first]
        total = int(d2.sum())
        if total == 0:
            return E
        # two-level CSR gather: all neighbors-of-neighbors of the block
        starts = indptr[first]
        offs = np.cumsum(d2) - d2
        gidx = (np.arange(total, dtype=np.int64)
                - np.repeat(offs, d2) + np.repeat(starts, d2))
        w = indices[gidx].astype(np.int64)
        row1 = np.repeat(np.arange(lo, hi, dtype=np.int64) - lo,
                         deg[lo:hi])
        rowloc = np.repeat(row1, d2)
        key = rowloc * N + w
        key.sort()
        bnd = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]]))
        uk = key[bnd]
        cnt = np.diff(np.concatenate(
            [bnd, [len(key)]])).astype(np.int64)
        vloc = uk // N
        wn = uk - vloc * N
        vglob = vloc + lo
        keep = wn > vglob                 # v < w once, and drops w == v
        uk, cnt, vglob, wn = uk[keep], cnt[keep], vglob[keep], wn[keep]
        # anti-join against the block rows' own adjacency (CSR holds
        # both directions, rows and in-row neighbors both ascending →
        # e_key is globally sorted)
        e_key = row1 * N + first
        if len(e_key) and len(uk):
            pos = np.clip(np.searchsorted(e_key, uk), 0,
                          len(e_key) - 1)
            non_edge = e_key[pos] != uk
            cnt, vglob, wn = cnt[non_edge], vglob[non_edge], \
                wn[non_edge]
        if not len(cnt):
            return E
        o = np.lexsort((wn, vglob, -cnt))[:k]
        return cnt[o], nodes[vglob[o]], nodes[wn[o]]

    outs = ray.get([block_topk.remote(csr_ref, int(lo), int(hi))
                    for lo, hi in zip(bounds[:-1], bounds[1:])])
    c = np.concatenate([o[0] for o in outs])
    p1 = np.concatenate([o[1] for o in outs])
    p2 = np.concatenate([o[2] for o in outs])
    if not len(c):
        return pd.DataFrame(cols)
    o = np.lexsort((p2, p1, -c))[:k]
    return pd.DataFrame({"p1": p1[o], "p2": p2[o], "n_common": c[o]})


def q_common_neighbors(sf_dir: str, k: int = 50,
                       P: int = 32) -> pd.DataFrame:
    """Common-neighbors link prediction over the co-order PART graph
    (parts appearing in the same order are adjacent): the top-k
    NON-adjacent part pairs ranked by how many neighbors they share —
    the classic "predict the missing co-purchase" scoring that
    market-basket completion starts from.

    Plan — the wedge layout of triangle counting (q140), counted
    instead of closed: common-neighbors(v, w) is exactly the number
    of wedges v–u–w, so (1) ``_coorder_edge_refs(val='l_partkey')``
    builds the distinct edge set in the object store (order exchange →
    per-order pairs → edge-hash dedup), (2) a center-node exchange
    routes BOTH directions of each edge to their center u's bucket and
    pairs each u's sorted neighbors by vectorized shift-pairing, (3)
    the wedge stream is re-exchanged under the SAME packed-key
    partition function as the edge buckets, so each bucket counts its
    wedge keys globally (same key ⇒ same bucket), anti-joins the
    co-located edge slice with one sorted ``searchsorted`` membership
    test, and emits only its local top-k — the driver folds P·k rows.
    Zero-overlap pairs never form a wedge, matching SQL's inner join.
    Tie order matches the oracle exactly: n_common DESC, (p1, p2)
    ASC. Wedge volume Σ d(u)² is the standard cost of this plan;
    skewed hubs pay it inside their bucket, never on the driver."""
    import ray

    lim = np.uint64(1) << np.uint64(_KEY_BITS)
    cols = {"p1": pd.Series(dtype="int64"),
            "p2": pd.Series(dtype="int64"),
            "n_common": pd.Series(dtype="int64")}

    edge_refs = _coorder_edge_refs(sf_dir, P, on="l_orderkey",
                                   val="l_partkey")

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    n_edges = sum(ray.get([_nrows.remote(r) for r in edge_refs])) \
        if edge_refs else 0
    if n_edges <= int(os.environ.get("WSR_CN_BLOCK_MAX_EDGES",
                                     60_000_000)):
        # default plan: adjacency fits a broadcast (≤ ~1 GB CSR) →
        # shuffle-free blocked A² (same exact result; sf1 measured
        # ~26 s vs ~100–130 s for the wave plan, ~4×). The
        # wave-exchange plan below remains the out-of-broadcast path.
        return _common_neighbors_blocked(edge_refs, k)

    def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        if len(u) and (u.min() < 0 or v.min() < 0
                       or u.max() >= int(lim) or v.max() >= int(lim)):
            raise ValueError("partkey outside [0, 2^32) packing domain")
        return ((u.astype(np.uint64) << np.uint64(_KEY_BITS))
                | v.astype(np.uint64)).view(np.int64)

    _EDGE = pa.table({"key": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
    _WEDGE = pa.table({"key": pa.array([], pa.int64()),
                       "n": pa.array([], pa.int64()),
                       "bucket": pa.array([], pa.int64())})

    # stage 2: route both edge directions to their center node u and
    # pair each u's sorted neighbors — one wedge per common neighbor.
    # Centers are processed in W WAVES (filter by center-bucket mod W):
    # the full Σd(u)² wedge stream at 10× data overflowed the object
    # store when materialized at once (measured: ~1.6e9 wedges → >50 GB
    # in flight at 32 CPUs); waves bound in-flight wedges to ~1/W while
    # per-output-bucket accumulators fold counts incrementally.
    def split_center(t: pa.Table, wave: int, W: int) -> pa.Table:
        if t.num_rows == 0:
            return _EDGE
        key = t.column("key").to_numpy()
        u = (key.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (key.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        c = np.concatenate([u, v])          # center
        o = np.concatenate([v, u])          # the other endpoint
        cb = (mix64(c) & np.uint64(P - 1)).astype(np.int64)
        m = (cb % W) == wave
        return pa.table({"key": pa.array(_pack(c[m], o[m])),
                         "bucket": pa.array(cb[m])})

    def merge_wedges(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _WEDGE
        key = np.sort(np.concatenate(
            [x.column("key").to_numpy() for x in live]))
        c = (key.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(np.int64)
        o = (key.view(np.uint64) & (lim - np.uint64(1))).astype(np.int64)
        # neighbors o are sorted within each center run (packed sort)
        wv, ww = _pairs_by_shift(c, o)
        wkey, wn = np.unique(_pack(wv, ww), return_counts=True)
        # combiner: same (v, w) from different centers in this bucket
        # collapses to one (key, n) row before the re-exchange
        return pa.table({"key": pa.array(wkey),
                         "n": pa.array(wn.astype(np.int64)),
                         "bucket": pa.array(
                             (mix64(wkey) & np.uint64(P - 1))
                             .astype(np.int64))})

    _ACC = pa.table({"key": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())})

    def split_pass(t: pa.Table) -> pa.Table:
        return t if t.num_rows else _WEDGE

    def merge_sum(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _ACC
        key = np.concatenate([x.column("key").to_numpy()
                              for x in live])
        n = np.concatenate([x.column("n").to_numpy() for x in live])
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({"key": pa.array(uk), "n": pa.array(cnt)})

    import ray as _ray

    @_ray.remote
    def add_acc(old, new: pa.Table) -> pa.Table:
        if old is None or old.num_rows == 0:
            return new
        if new.num_rows == 0:
            return old
        key = np.concatenate([old.column("key").to_numpy(),
                              new.column("key").to_numpy()])
        n = np.concatenate([old.column("n").to_numpy(),
                            new.column("n").to_numpy()])
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({"key": pa.array(uk), "n": pa.array(cnt)})

    # adaptive wave count: one cheap degree pass prices the wedge
    # volume Σd(u)²; ~4e8 wedges (~6 GB of (key,n) rows) per wave
    # keeps the object store flat while W=1 at small scale avoids
    # paying extra exchange rounds (measured 36% overhead at sf0.1)
    @_ray.remote
    def degree_counts(t: pa.Table):
        key = t.column("key").to_numpy()
        u = (key.view(np.uint64)
             >> np.uint64(_KEY_BITS)).astype(np.int64)
        v = (key.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)
        return np.unique(np.concatenate([u, v]), return_counts=True)

    w_env = os.environ.get("WSR_WEDGE_WAVES")
    if w_env:
        W = max(1, int(w_env))
    elif _read(sf_dir, "lineitem", ["l_orderkey"]).count() < 2_000_000:
        # small input can't produce store-threatening wedge volume —
        # skip the pricing pass entirely (it costs ~1 s of task
        # round-trips, a 30% overhead on the sf0.1 runtime)
        W = 1
    else:
        degs = _ray.get([degree_counts.remote(r) for r in edge_refs])
        if degs:
            ids = np.concatenate([d[0] for d in degs])
            cts = np.concatenate([d[1] for d in degs])
            uk, inv = np.unique(ids, return_inverse=True)
            dvec = np.bincount(inv, weights=cts)
            wedges = float((dvec * dvec).sum())
            # 8e8 wedges ≈ 13 GB of (key,n) rows per wave — safe now
            # that the barrier makes the bound real
            W = max(1, min(P, int(np.ceil(wedges / 8e8))))
        else:
            W = 1
    acc: list = [None] * P
    for wave in range(W):
        wave_refs = hash_shuffle([(r, (wave, W)) for r in edge_refs],
                                 split_center, merge_wedges, P=P,
                                 gather=False)
        slices = hash_shuffle([(r, ()) for r in wave_refs],
                              split_pass, merge_sum, P=P,
                              gather=False)
        for b in range(P):
            acc[b] = (slices[b] if acc[b] is None
                      else add_acc.remote(acc[b], slices[b]))
        if W > 1:
            # BARRIER: gather=False hands back futures, so without a
            # wait every wave's tasks submit at once and the full
            # wedge volume is in flight again — exactly what waves
            # exist to prevent. Completing acc also drops this wave's
            # intermediate refs for eviction.
            _ray.wait(list(acc), num_returns=len(acc))
    bucket_refs = acc

    @ray.remote
    def topk_bucket(wtab: pa.Table, etab: pa.Table):
        if wtab.num_rows == 0:
            return (np.empty(0, np.int64),) * 3
        raw = wtab.column("key").to_numpy()
        wkey, inv = np.unique(raw, return_inverse=True)
        cnt = np.bincount(inv, weights=wtab.column("n").to_numpy()
                          ).astype(np.int64)
        ekey = etab.column("key").to_numpy()  # sorted (np.unique)
        if len(ekey):
            pos = np.clip(np.searchsorted(ekey, wkey), 0,
                          len(ekey) - 1)
            m = ekey[pos] != wkey  # keep NON-edges only
        else:
            m = np.ones(len(wkey), bool)
        wkey, cnt = wkey[m], cnt[m].astype(np.int64)
        if not len(wkey):
            return (np.empty(0, np.int64),) * 3
        p1 = (wkey.view(np.uint64)
              >> np.uint64(_KEY_BITS)).astype(np.int64)
        p2 = (wkey.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)
        o = np.lexsort((p2, p1, -cnt))[:k]
        return cnt[o], p1[o], p2[o]

    outs = ray.get([topk_bucket.remote(w, e)
                    for w, e in zip(bucket_refs, edge_refs)])
    c = np.concatenate([o[0] for o in outs])
    p1 = np.concatenate([o[1] for o in outs])
    p2 = np.concatenate([o[2] for o in outs])
    if not len(c):
        return pd.DataFrame(cols)
    o = np.lexsort((p2, p1, -c))[:k]
    return pd.DataFrame({"p1": p1[o], "p2": p2[o], "n_common": c[o]})


def q_item_cf(sf_dir: str, k: int = 50, P: int = 32) -> pd.DataFrame:
    """Item–item collaborative-filtering similarity over order
    baskets — the recommender primitive: sim(p, q) = |O(p) ∩ O(q)| /
    √(|O(p)|·|O(q)|), the cosine of the parts' order-incidence
    vectors, top-k pairs. Pair intersection counts come from
    ``_coorder_edge_refs(with_counts=True)`` (order exchange →
    per-order pairs → edge exchange summing distinct-shared-order
    support); per-part order degrees from one more packed-key
    exchange whose buckets hold globally-distinct (order, part) keys,
    so per-bucket part counts are exact and the driver folds only the
    dimension-sized part domain. Scoring fans out per edge bucket
    with the broadcast degree table: ONE double division of exact
    ints per pair (n / sqrt(dp·dq), the oracle's own op order),
    rounded to 6dp BEFORE ranking so the (sim DESC, p1, p2) order is
    bit-deterministic, local top-k per bucket, driver folds P·k
    rows."""
    import pyarrow.compute as pc

    import ray

    from .pairs import round_away

    lim = np.uint64(1) << np.uint64(_KEY_BITS)
    cols = {"p1": pd.Series(dtype="int64"),
            "p2": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "sim": pd.Series(dtype="float64")}

    edge_refs = _coorder_edge_refs(sf_dir, P, with_counts=True,
                                   on="l_orderkey", val="l_partkey")

    # ---- per-part order degree: distinct (order, part) exchange ----
    _E = pa.table({"o": pa.array([], pa.int64()),
                   "p": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split_op(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_partkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        o = t2.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        p = t2.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # two-column pair dedup — orderkeys are NOT in the dense
        # packing domain (fuzz plants >2^53 surrogates; 100-TB order
        # counts pass 2^32): lexsort-mask instead of bit packing
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.ones(len(o), bool)
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        return pa.table({"o": pa.array(o), "p": pa.array(p),
                         "bucket": pa.array(
                             (mix64(mix64(o) ^ p.astype(np.uint64))
                              & np.uint64(P - 1)).astype(np.int64))})

    def merge_deg(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"p": pd.Series(dtype="int64"),
                                 "dp": pd.Series(dtype="int64")})
        o = np.concatenate([x.column("o").to_numpy() for x in live])
        p = np.concatenate([x.column("p").to_numpy() for x in live])
        order = np.lexsort((p, o))   # same pair → same bucket ⇒
        o, p = o[order], p[order]    # lexsort-mask dedup is global
        keep = np.ones(len(o), bool)
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        u, c = np.unique(p[keep], return_counts=True)
        return pd.DataFrame({"p": u, "dp": c.astype(np.int64)})

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    degs = [d for d in hash_shuffle([(r, ()) for r in
                                     li.to_arrow_refs()],
                                    split_op, merge_deg, P=P)
            if len(d)]
    if not degs:
        return pd.DataFrame(cols)
    dg = (pd.concat(degs, ignore_index=True)
          .groupby("p", as_index=False)["dp"].sum())
    ptab = dg["p"].to_numpy(np.int64)          # sorted (groupby key)
    dtab = dg["dp"].to_numpy(np.int64)
    dref = ray.put((ptab, dtab))

    @ray.remote
    def topk_bucket(etab: pa.Table, deg):
        if etab.num_rows == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64), np.empty(0, np.float64))
        ptab_, dtab_ = deg
        key = etab.column("key").to_numpy()
        n = etab.column("n").to_numpy()
        p1 = (key.view(np.uint64)
              >> np.uint64(_KEY_BITS)).astype(np.int64)
        p2 = (key.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)
        d1 = dtab_[np.searchsorted(ptab_, p1)]
        d2 = dtab_[np.searchsorted(ptab_, p2)]
        sim = round_away(n.astype(np.float64)
                         / np.sqrt((d1 * d2).astype(np.float64)), 6)
        o = np.lexsort((p2, p1, -sim))[:k]
        return n[o], p1[o], p2[o], sim[o]

    outs = ray.get([topk_bucket.remote(r, dref) for r in edge_refs])
    n = np.concatenate([o[0] for o in outs])
    if not len(n):
        return pd.DataFrame(cols)
    p1 = np.concatenate([o[1] for o in outs])
    p2 = np.concatenate([o[2] for o in outs])
    sim = np.concatenate([o[3] for o in outs])
    o = np.lexsort((p2, p1, -sim))[:k]
    return pd.DataFrame({"p1": p1[o], "p2": p2[o],
                         "n": n[o].astype(np.int64), "sim": sim[o]})


def q_brand_homophily(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Attribute homophily of the co-order part graph — do baskets
    mix brands, or do same-brand parts cluster? Coleman-style index
    H = (obs − exp) / (1 − exp), with obs the share of edges joining
    same-brand endpoints and exp the chance share under the
    endpoint-brand distribution, computed from EXACT integers: exp =
    Σ_b cnt_b² / (2m)², so the float work is two divisions and one
    ratio in the oracle's literal op order (never a float sum over
    brands). Edges come from q291's distinct-edge exchange (object
    store); the brand lookup is the deduplicated part DIMENSION
    (min-brand per key — fuzz worlds plant duplicate part rows)
    broadcast once via ``ray.put``; per-bucket tasks return (m,
    same, brand-count partial) and the driver folds P small rows.
    Endpoints missing from part (FK orphans) carry a NULL brand,
    which IS a brand value (NULL-equals-NULL, SQL IS NOT
    DISTINCT)."""
    import pyarrow.compute as pc

    import ray

    from .pairs import factorize_strings, round_away

    lim = np.uint64(1) << np.uint64(_KEY_BITS)

    edge_refs = _coorder_edge_refs(sf_dir, P, on="l_orderkey",
                                   val="l_partkey")

    # dedup'd part dimension: min non-NULL brand per key (SQL min
    # ignores NULLs; all-NULL stays NULL)
    from .relational import _read_pd

    pt = _read_pd(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pt = pt[pt["p_partkey"].notna()]
    pt["p_partkey"] = pt["p_partkey"].astype(np.int64)
    grp = pt.groupby("p_partkey", sort=True)["p_brand"] \
            .agg(lambda s: None if s.dropna().empty
                 else s.dropna().min())
    keys = grp.index.to_numpy(np.int64)
    codes, uniq = factorize_strings(
        pd.Series(grp.to_numpy(object), dtype=object),
        use_na_sentinel=False)
    # NULL brand gets its own code; endpoints missing from part get
    # code len(uniq) (a distinct NULL-brand slot ONLY when no part
    # row has a NULL brand — merge them when both mean NULL)
    null_code = None
    for i, uv in enumerate(uniq):
        if uv is None or (isinstance(uv, float) and np.isnan(uv)):
            null_code = i
    miss = null_code if null_code is not None else len(uniq)
    n_codes = max(len(uniq), miss + 1)
    bref = ray.put((keys, codes.astype(np.int64), miss, n_codes))

    @ray.remote
    def bucket_stats(etab, lookup):
        keys_, codes_, miss_, n_codes_ = lookup
        if etab.num_rows == 0:
            return 0, 0, np.zeros(n_codes_, np.int64)
        k = etab.column("key").to_numpy()
        u = (k.view(np.uint64) >> np.uint64(_KEY_BITS)).astype(
            np.int64)
        v = (k.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)

        def code_of(x):
            if len(keys_) == 0:
                # np.take on an empty axis raises even when hit would
                # be all-False — part-empty world, every edge endpoint
                # is a missing-dim node
                return np.full(len(x), miss_, np.int64)
            pos = np.searchsorted(keys_, x)
            pos_c = np.clip(pos, 0, len(keys_) - 1)
            hit = np.take(keys_, pos_c) == x
            return np.where(hit, np.take(codes_, pos_c), miss_)

        cu, cv = code_of(u), code_of(v)
        cnt = np.bincount(np.concatenate([cu, cv]),
                          minlength=n_codes_).astype(np.int64)
        return len(k), int((cu == cv).sum()), cnt

    outs = ray.get([bucket_stats.remote(r, bref) for r in edge_refs])
    m = sum(o[0] for o in outs)
    same = sum(o[1] for o in outs)
    cols = {"m_edges": pd.Series(dtype="int64"),
            "same_brand": pd.Series(dtype="int64"),
            "obs": pd.Series(dtype="float64"),
            "exp": pd.Series(dtype="float64"),
            "homophily": pd.Series(dtype="float64")}
    if m == 0:
        return pd.DataFrame(cols)
    cnt = sum((o[2] for o in outs), np.zeros(1, np.int64))
    s2 = sum(int(c) * int(c) for c in cnt)       # exact Σ cnt_b²
    obs = float(same) / m
    exp = float(s2) / float(4 * m * m)
    h = (obs - exp) / (1.0 - exp) if exp != 1.0 else np.nan
    return pd.DataFrame({
        "m_edges": pd.array([m], "int64"),
        "same_brand": pd.array([same], "int64"),
        "obs": round_away(np.array([obs]), 6),
        "exp": round_away(np.array([exp]), 6),
        "homophily": round_away(np.array([h]), 6)})


def q_eccentricity_sample(sf_dir: str, n_seeds: int = 4,
                          rounds: int = 8) -> pd.DataFrame:
    """Eccentricity sample — BFS depth to exhaustion (capped at 8
    bipartite hops, mirrored by the oracle's recursion bound) from
    ``n_seeds`` deterministically-chosen parts (lowest md5, the
    engine's cross-language coin): per seed, the farthest reachable
    node's distance and the reachable-set size — the cheap diameter /
    connectivity probe for the part–supplier graph. All seeds run
    SIMULTANEOUSLY: the hop state is one N×seeds matrix broadcast per
    round, one min-scatter task per edge bucket (q138's layout
    column-extended), so the edge set streams once per round
    regardless of seed count. Seeds outside the graph report
    (0, 1) — themselves."""
    import hashlib

    import pyarrow.compute as pc

    import ray

    li = _read(sf_dir, "lineitem", columns=["l_partkey",
                                            "l_suppkey"])

    def dparts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return pa.table({"p": pa.array([], pa.int64())})
        keep = pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                             pc.is_valid(t.column("l_suppkey")))
        v = t.filter(pc.fill_null(keep, False)).column("l_partkey")
        return (pa.table({"p": pc.cast(v, pa.int64())})
                .group_by(["p"]).aggregate([]))

    ps_df = li.map_batches(dparts, batch_format="pyarrow").to_pandas()
    ps = (np.unique(ps_df["p"].to_numpy(np.int64))
          if "p" in ps_df.columns else np.empty(0, np.int64))
    cols = {"seed_part": pd.Series(dtype="int64"),
            "ecc": pd.Series(dtype="int64"),
            "n_reached": pd.Series(dtype="int64")}
    if not len(ps):
        return pd.DataFrame(cols)
    hs = [hashlib.md5(str(x).encode()).hexdigest() for x in ps]
    o = np.lexsort((ps, np.array(hs, dtype=object)))[:n_seeds]
    seeds = np.sort(ps[o])

    dense_refs, nodes = _edge_buckets(sf_dir)
    N = len(nodes)
    SENT = np.iinfo(np.int64).max
    k = len(seeds)
    codes = seeds * 2                      # parts are even codes
    pos = np.searchsorted(nodes, codes) if N else np.zeros(k, int)
    ing = (pos < N)
    if N:
        ing &= nodes[np.clip(pos, 0, max(N - 1, 0))] == codes
    D = np.full((N, k), SENT, np.int64)
    for j in np.flatnonzero(ing):
        D[pos[j], j] = 0

    @ray.remote
    def scatter(edges, d: np.ndarray) -> np.ndarray:
        src, dst = edges
        n, kk = d.shape
        out = np.full((n, kk), np.iinfo(np.int64).max, np.int64)
        v = d[src]
        live = v != np.iinfo(np.int64).max
        v = np.where(live, v + 1, v)       # no SENT+1 overflow
        np.minimum.at(out, dst, v)
        return out

    if N and ing.any():
        for _ in range(rounds):
            ref = ray.put(D)
            parts = ray.get([scatter.remote(e, ref)
                             for e in dense_refs])
            nd = D
            for p_ in parts:
                nd = np.minimum(nd, p_)
            if np.array_equal(nd, D):
                break
            D = nd
    out = []
    for j, sp in enumerate(seeds):
        if not ing[j]:
            out.append((int(sp), 0, 1))
            continue
        fin = D[:, j] != SENT
        out.append((int(sp), int(D[fin, j].max()),
                    int(fin.sum())))
    return pd.DataFrame(out, columns=["seed_part", "ecc",
                                      "n_reached"]
                        ).astype({"seed_part": "int64",
                                  "ecc": "int64",
                                  "n_reached": "int64"})
