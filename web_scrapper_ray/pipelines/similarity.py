"""Similarity search over the ``embeddings`` table (list<float> column).

* brute-force cosine top-k: the query matrix is broadcast (``ray.put``
  once, read per batch), each batch does one numpy matmul and emits its
  local top-k; a tiny driver-side merge finishes — the canonical
  map_batches + partial top-k pattern.
* LSH-bucketed ANN (random-hyperplane signatures): the scale path —
  candidates only within matching buckets, then exact re-rank.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_DIM_CACHE: dict = {}


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    col = batch.column("embedding")
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    return ids, mat


def q_knn_bruteforce(sf_dir: str, query_ids: tuple = (0, 1, 2, 3), k: int = 5) -> pd.DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).
    Returns (query_id, rank, neighbor_id); ties broken by neighbor_id."""
    import ray

    ds = _emb(sf_dir)
    qset = set(int(q) for q in query_ids)
    qrows = ds.filter(lambda r: r["vec_id"] in qset).to_pandas()
    qrows = qrows.sort_values("vec_id")
    qids = qrows["vec_id"].to_numpy()
    qmat = np.stack(qrows["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(qref)
        ids, mat = _batch_matrix(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ qmat_.T  # (n, nq)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for j, q in enumerate(qids_):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk]
            for i in top:
                out_q.append(int(q))
                out_n.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


def q_neardup_cosine(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, vec_a < vec_b.
    Batch-vs-broadcast-matrix matmul; at larger scale swap the broadcast
    side for the LSH buckets below."""
    import ray

    ds = _emb(sf_dir)
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids, bmat = _batch_matrix(batch)
        bn = np.linalg.norm(bmat, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (bmat / bn) @ all_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < all_ids[jj]
        return pa.table({
            "vec_a": pa.array(bids[ii][keep].astype("int64")),
            "vec_b": pa.array(all_ids[jj][keep].astype("int64")),
        })

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def q_knn_ivf(sf_dir: str, query_ids: tuple = (0, 1, 2, 3), k: int = 5,
              n_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF ANN (the coarse-quantizer scale path): deterministic k-means
    centroids (seeded sample, 5 Lloyd iterations) → per-batch assignment
    via map_batches → queries scan only the n_probe nearest lists.
    Approximate → rows-only driver check; recall pytest'd."""
    import ray

    ds = _emb(sf_dir)
    sample = ds.random_sample(min(1.0, 2000 / max(ds.count(), 1)), seed=42).to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(42)
    centroids = smat[rng.choice(len(smat), size=min(n_lists, len(smat)), replace=False)]
    for _ in range(5):  # Lloyd iterations on the sample
        assign = np.argmax(smat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = smat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    cref = ray.put(centroids)

    def assign_batch(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        unit = mat / norms
        lists = np.argmax(unit @ cents.T, axis=1)
        return pa.table({
            "vec_id": pa.array(ids.astype("int64")),
            "list_id": pa.array(lists.astype("int32")),
            "unit": pa.array([u.tolist() for u in unit], pa.list_(pa.float64())),
        })

    assigned = ds.map_batches(assign_batch, batch_format="pyarrow").to_pandas()
    units = np.stack(assigned["unit"].to_numpy())
    ids = assigned["vec_id"].to_numpy()
    lists = assigned["list_id"].to_numpy()
    id_to_idx = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for q in query_ids:
        qi = id_to_idx[int(q)]
        probe = np.argsort(-(centroids @ units[qi]))[:n_probe]
        cand = np.nonzero(np.isin(lists, probe))[0]
        cand = cand[ids[cand] != q]
        if cand.size == 0:
            continue
        sims = units[cand] @ units[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, oi in enumerate(order, 1):
            rows.append((int(q), rank, int(ids[cand[oi]])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])


N_PLANES = 6  # 64 buckets; multi-probe on 1-bit flips → ~11% of space scanned


def _planes(dim: int) -> np.ndarray:
    key = ("planes", dim)
    if key not in _DIM_CACHE:
        rng = np.random.default_rng(42)
        _DIM_CACHE[key] = rng.normal(size=(N_PLANES, dim))
    return _DIM_CACHE[key]


def q_knn_lsh(sf_dir: str, query_ids: tuple = (0, 1, 2, 3), k: int = 5) -> pd.DataFrame:
    """LSH-bucketed ANN: random-hyperplane signature → groupby bucket →
    exact re-rank within the query's bucket (multi-probe on 1-bit flips).
    Approximate by design → rows-only driver check; recall is pytest'd
    against the brute-force result."""
    ds = _emb(sf_dir)
    full = ds.to_pandas()  # bucket assignment demo; the groupby path is
    ids = full["vec_id"].to_numpy()  # exercised in q_minhash_lsh_pairs
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    planes = _planes(mat.shape[1])
    sigs = (mat @ planes.T > 0).astype(np.uint32)
    codes = (sigs << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    id_to_idx = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for q in query_ids:
        qi = id_to_idx[int(q)]
        c0 = int(codes[qi])
        # multi-probe: exact bucket + 1- and 2-bit flips (random 64-dim
        # embeddings have no cluster structure, so deeper probing is the
        # recall lever; still scans ~1/3 of buckets, not all-pairs)
        probe = {c0} | {c0 ^ (1 << b) for b in range(N_PLANES)} | {
            c0 ^ (1 << a) ^ (1 << b)
            for a in range(N_PLANES) for b in range(a + 1, N_PLANES)
        }
        cand = np.nonzero(np.isin(codes, list(probe)))[0]
        cand = cand[ids[cand] != q]
        if cand.size == 0:
            continue
        sims = unit[cand] @ unit[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, oi in enumerate(order, 1):
            rows.append((int(q), rank, int(ids[cand[oi]])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])
