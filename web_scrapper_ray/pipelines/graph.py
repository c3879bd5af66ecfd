"""Iterative graph algorithms over relational edge sources.

PageRank (q67) demonstrates the engine's iterative-computation shape:
a fixed number of synchronous power-iteration rounds where each round
is one distributed pass over the (static) edge partitions with a
broadcast rank vector — the standard "small mutable state, big
immutable edges" layout:

* the edge set is built ONCE: per-block distinct (part, supplier)
  pairs (combiner) → the raw-task ``hash_shuffle`` dedups globally →
  per-bucket edge arrays go straight back into the object store
  (``ray.put`` per bucket) and are never re-shipped;
* per round, one Ray task per edge bucket scatters rank/degree
  contributions with ``np.bincount`` and returns a dense node-indexed
  partial vector; the driver sums P small vectors and rebroadcasts the
  new rank vector.

Node state is a dense float64 vector over integer node codes
(part → 2k, supplier → 2k+1); at web scale the node space is
factorized to dense codes first and, when the rank vector outgrows a
single broadcast (≳10⁹ nodes), the same rounds run with rank shards
co-partitioned with the edge buckets — the edge-side layout here is
already bucketed by src to make that swap local.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .pairs import hash_shuffle, mix64


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


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

    P = 32

    def split(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            keys = np.empty(0, np.int64)
        else:
            p = block.column("l_partkey").to_numpy(zero_copy_only=False)
            s = block.column("l_suppkey").to_numpy(zero_copy_only=False)
            keys = np.unique((p.astype(np.int64) << np.int64(32))
                             | s.astype(np.int64))
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "bucket": pa.array(
                (mix64(keys.view(np.uint64)) % np.uint64(P)).astype(np.int64)),
        })

    def merge(*tabs) -> np.ndarray:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(
            [t.column("key").to_numpy(zero_copy_only=False) for t in live]))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pair_parts = hash_shuffle([(r, ()) for r in li.to_arrow_refs()],
                              split, merge, P=P)

    # per-bucket (src, dst) node-code arrays, both edge directions;
    # stored once in the object store and reused by every round
    edge_refs, M = [], 0
    for keys in pair_parts:
        if not len(keys):
            continue
        pk = (keys >> np.int64(32)).astype(np.int64)
        sk = (keys & np.int64(0xFFFFFFFF)).astype(np.int64)
        pn, sn = pk * 2, sk * 2 + 1
        src = np.concatenate([pn, sn])
        dst = np.concatenate([sn, pn])
        M = max(M, int(src.max()) + 1)
        edge_refs.append(ray.put((src, dst)))
    if not edge_refs:
        return pd.DataFrame({"node": pd.Series(dtype="object"),
                             "pr": pd.Series(dtype="float64")})

    @ray.remote
    def degree_partial(eref, m: int) -> np.ndarray:
        src, _ = eref
        return np.bincount(src, minlength=m)

    deg = sum(ray.get([degree_partial.remote(r, M) for r in edge_refs]))
    in_graph = deg > 0
    n_nodes = int(in_graph.sum())
    safe_deg = np.where(in_graph, deg, 1).astype(np.float64)

    @ray.remote
    def contrib_partial(eref, r_over_d: np.ndarray, m: int) -> np.ndarray:
        # both args arrive auto-dereferenced; passing the SAME rank ref
        # to every task keeps it one object-store fetch per node
        src, dst = eref
        return np.bincount(dst, weights=r_over_d[src], minlength=m)

    rank = np.where(in_graph, 1.0 / n_nodes, 0.0)
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # ship r/deg (not r) so each task does one gather, no division
        rref = ray.put(rank / safe_deg)
        parts = ray.get([contrib_partial.remote(r, rref, M)
                         for r in edge_refs])
        rank = np.where(in_graph, base + damping * sum(parts), 0.0)

    codes = np.nonzero(in_graph)[0]
    names = [("p" if c % 2 == 0 else "s") + str(c // 2) for c in codes]
    out = pd.DataFrame({"node": names, "pr": np.round(rank[codes], 6)})
    return out.sort_values("node").reset_index(drop=True)
