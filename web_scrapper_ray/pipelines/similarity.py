"""Similarity search over the ``embeddings`` table (list<float> column).

All four operators follow the same scale discipline: the *query* side is
tiny by definition (a handful of vectors, or a sketch of the corpus) and
is broadcast once (``ray.put``, read per batch); the *corpus* side only
ever streams through ``map_batches`` — no ``to_pandas()`` of the table,
no driver-side scans. Driver code touches only final small results
(top-k partials, pair lists, seeded samples).

* brute-force cosine top-k  — per-batch matmul against the broadcast
  query matrix + local top-k; tiny driver merge (canonical pattern).
* LSH ANN                   — random-hyperplane codes computed per batch;
  a batch row is a candidate iff its code is in the query's multiprobe
  set (broadcast); re-rank inside the batch. Equivalent to the
  groupby(code) formulation but with zero shuffle: the probe set is
  query-side metadata, so membership is a broadcast filter.
* IVF ANN                   — coarse centroids trained on a seeded
  distributed sample; per-batch assignment + probe-list membership
  filter + local re-rank. The inverted lists are never materialized:
  ``list_id`` exists only transiently inside each batch.
* exact cosine near-dup     — inherently all-pairs (it has an exact SQL
  oracle), done as a *blocked self-cross-join*: corpus blocks stay in
  the object store (``to_arrow_refs``), the driver only groups block
  refs into ~G chunks and launches one Ray task per chunk pair
  (G·(G+1)/2 tasks, each one matmul). O(N²/G²) memory per task, zero
  driver materialization. The sub-quadratic scale path is
  ``q_neardup_cosine_lsh`` (bucketed candidates, exact verify).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import pyarrow.dataset as pads

from .pairs import mix64
from .relational import _with_cols

_DIM_CACHE: dict = {}


def _emb(sf_dir: str):
    """Embedding table with NULL vectors dropped AT THE READ (pushdown
    filter — no extra map stage, so no schema-less empty blocks for
    downstream ``to_arrow_refs`` consumers): every SQL twin unnests the
    list column, which drops NULLs, and a NULL entry trips Ray's
    tensor-extension cast in any downstream to_pandas/sample."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"],
                           filter=pads.field("embedding").is_valid())


_EMPTY_TOPK = pa.table({"query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64())})
_EMPTY_KNN = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                           "rank": pd.Series(dtype="int64"),
                           "neighbor_id": pd.Series(dtype="int64")})


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    # drop NULL-embedding rows first: flatten() silently omits null list
    # slots, so reshape would either raise or SHIFT every later row's
    # coordinates; the SQL oracles' unnest skips those vec_ids the same
    # way this filter does
    valid = pc.is_valid(batch.column("embedding"))
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        # reshape(0, -1) raises; callers short-circuit on len(ids) == 0
        # before any matmul, so the placeholder width never matters
        return ids.astype(np.int64), np.zeros((0, 1), np.float64)
    col = batch.column("embedding")
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    return ids, mat


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _query_matrix(sf_dir: str, query_ids) -> tuple[np.ndarray, np.ndarray]:
    """Fetch the query vectors with a predicate-pushdown read (a few rows
    — the one place a driver-side read is the right call)."""
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=pc.field("vec_id").isin([int(q) for q in query_ids]),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    ids, mat = _batch_matrix(t)
    return ids, _unit(mat)


def _topk_idx(sims: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Top-k indices by (sim DESC, id ASC). The tie-break matters: a
    plain argpartition on sim drops an arbitrary member of a tied group
    at the k boundary, diverging from the oracle's row_number ORDER BY
    sim DESC, neighbor_id when duplicate vectors share one batch.
    O(n) argpartition selects the boundary; only the ≥threshold slice
    (k plus its ties) pays the lexsort — not the whole batch."""
    n = len(sims)
    if k >= n:
        order = np.lexsort((ids, -sims))
        return order[:n]
    part = np.argpartition(-sims, k - 1)
    thresh = sims[part[k - 1]]
    cand = np.nonzero(sims >= thresh)[0]  # top-k plus boundary ties
    order = np.lexsort((ids[cand], -sims[cand]))
    return cand[order[:k]]


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final merge of per-batch top-k partials (tiny: ≤ k·n_batches rows)."""
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


def q_knn_bruteforce(sf_dir: str, query_ids: tuple = (0, 1, 2, 3),
                     k: int = 5, dim_slice: int = 0) -> pd.DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).
    Returns (query_id, rank, neighbor_id); ties broken by neighbor_id.
    ``dim_slice`` > 0 keeps only the first d coordinates (renormalized
    on BOTH sides) — the Matryoshka-truncation eval hook (q255)."""
    import ray

    qids, qmat = _query_matrix(sf_dir, query_ids)
    if len(qids) == 0:  # none of the requested ids exist
        return _EMPTY_KNN.copy()
    if dim_slice and dim_slice < qmat.shape[1]:
        qmat = _unit(qmat[:, :dim_slice])
    qref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(qref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY_TOPK
        if dim_slice and dim_slice < mat.shape[1]:
            mat = mat[:, :dim_slice]
        sims = _unit(mat) @ qmat_.T  # (n, nq)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for j, q in enumerate(qids_):
            col = sims[:, j]
            for i in _topk_idx(col, ids, kk):
                out_q.append(int(q))
                out_n.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# exact near-dup (blocked self-cross-join)
# ---------------------------------------------------------------------------

N_CHUNKS = 8  # chunk groups per side → G(G+1)/2 pair tasks


def q_neardup_cosine(sf_dir: str, threshold: float = 0.95,
                     auto_lsh_rows: int | None = 200_000,
                     sample_p: float | None = None) -> pd.DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, vec_a < vec_b.

    Exact all-pairs (matches the SQL oracle) as a distributed blocked
    cross product: corpus blocks remain object-store refs; each Ray task
    loads one chunk pair and emits only the qualifying (a, b) rows.
    At 100 TB the same layout holds per-task memory at |chunk|²-free
    (two chunk matrices + a boolean mask); the driver sees refs and the
    final (small) pair list only.

    SIZE GATE (the 100-TB default): above ``auto_lsh_rows`` rows the
    O(N²) exact plan auto-switches to the sub-quadratic hyperplane-LSH
    candidate path (:func:`q_neardup_cosine_lsh`, widened to 16 tables
    × 12 planes → P(detect | cos=.95) ≈ 1−(1−(1−θ/π)^12)^16 ≈ 0.997
    per pair, exact-cosine verify on candidates only). Oracle-scale
    inputs stay under the gate, so the SQL twin keeps comparing
    against the exact plan; pass ``auto_lsh_rows=None`` to force
    exact at any size."""
    import ray

    emb = _emb(sf_dir)
    if sample_p is not None:
        # bounded sf1 oracle contract (q230's sampled twin): the same
        # deterministic md5-coin sample of vec_ids on both sides
        from .pairs import coin_filter

        emb = emb.map_batches(coin_filter("vec_id", sample_p),
                              batch_format="pyarrow")
    if auto_lsh_rows is not None:
        n_rows = emb.count()
        if n_rows > auto_lsh_rows:
            # no silent caps: the result becomes approximate here —
            # say so at runtime instead of switching plans silently
            import warnings
            warnings.warn(
                f"q_neardup_cosine: {n_rows} rows > auto_lsh_rows="
                f"{auto_lsh_rows}; switching to the approximate "
                "16-table hyperplane-LSH plan (per-pair recall ~0.997 "
                "at cos=0.95). Pass auto_lsh_rows=None to force the "
                "exact all-pairs plan.", stacklevel=2)
            return q_neardup_cosine_lsh(sf_dir, threshold,
                                        n_tables=16, n_planes=12)
    refs = emb.to_arrow_refs()  # refs only — blocks stay put
    if not refs:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64")})
    groups: list[list] = [[] for _ in range(min(N_CHUNKS, len(refs)))]
    for i, r in enumerate(refs):
        groups[i % len(groups)].append(r)

    _EMPTY_PAIRS = pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})

    @ray.remote
    def chunk_pairs(same: bool, refs_a: list, refs_b: list) -> pa.Table:
        def load(rs):
            # refs are nested in a list → resolve explicitly (zero-copy
            # object-store reads on whichever node runs the task);
            # zero-row blocks (empty tables read as one degenerate
            # block) are dropped before column access
            tabs = [t for t in (ray.get(r) for r in rs) if t.num_rows]
            if not tabs:
                return np.array([], dtype=np.int64), np.zeros((0, 1))
            ids, mat = _batch_matrix(pa.concat_tables(tabs))
            return ids, _unit(mat)

        ids_a, ua = load(refs_a)
        ids_b, ub = (ids_a, ua) if same else load(refs_b)
        if not len(ids_a) or not len(ids_b):
            return _EMPTY_PAIRS
        sims = ua @ ub.T
        ii, jj = np.nonzero(sims >= threshold)
        left, right = ids_a[ii], ids_b[jj]
        if same:
            # self-pairs and mirror duplicates exist only here
            keep = left < right
            left, right = left[keep], right[keep]
        else:
            # each unordered chunk pair runs in exactly ONE task, so
            # every qualifying pair must be EMITTED (normalized to
            # (min, max)) — filtering on id order would silently drop
            # pairs whose group-A member has the larger vec_id
            lo = np.minimum(left, right)
            right = np.maximum(left, right)
            left = lo
        return pa.table({
            "vec_a": pa.array(left.astype("int64")),
            "vec_b": pa.array(right.astype("int64")),
        })

    futs = []
    for i in range(len(groups)):
        futs.append(chunk_pairs.remote(True, groups[i], []))
        for j in range(i + 1, len(groups)):
            futs.append(chunk_pairs.remote(False, groups[i], groups[j]))
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64")})
    out = pa.concat_tables(tables).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def q_neardup_cosine_lsh(sf_dir: str, threshold: float = 0.95,
                         n_tables: int = 8, n_planes: int = 10) -> pd.DataFrame:
    """Sub-quadratic near-dup (the 100-TB path): n_tables independent
    random-hyperplane codes per vector; candidate pairs = same code in
    ≥1 table; exact cosine verify on candidates only. Recall is
    probabilistic: P(detect | cos=t) = 1-(1-(1-θ/π)^p)^T ≈ 0.996 for
    t=.95, p=10, T=8. Approximate by design → no SQL oracle;
    planted-pair recall is pytest'd.

    Scale shape: the candidate-generation shuffle carries ONLY
    (table_id, code, vec_id) — 3 ints/row, never the vectors (shipping
    unit vectors through the ×n_tables explosion would 8× the corpus
    through the all-to-all). Code buckets are coarsened into ~P hash
    partitions and paired with one vectorized pandas self-merge per
    partition; the verify stage re-reads ONLY the candidate vectors via
    a pushdown read, replicated into per-pair-bucket groups, and
    computes exact cosine inside map_groups. Work/memory everywhere
    scale with |candidates|, not the corpus."""
    import ray.data as rd

    ds = _emb(sf_dir)
    P = 64

    _EMPTY_CODES = pa.table({"table_id": pa.array([], pa.int32()),
                             "code": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})

    def codes(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY_CODES
        planes = _nd_planes(mat.shape[1], n_tables, n_planes)
        n = len(ids)
        code_mat = np.empty((n_tables, n), dtype=np.int64)
        for t in range(n_tables):
            bits = (mat @ planes[t].T > 0).astype(np.uint64)
            code_mat[t] = (bits << np.arange(n_planes, dtype=np.uint64)) \
                .sum(axis=1).astype(np.int64)
        out_tab = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        out_code = code_mat.reshape(-1)
        out_id = np.tile(ids.astype(np.int64), n_tables)
        key = (out_tab.astype(np.uint64) << np.uint64(48)) \
            | out_code.view(np.uint64)
        bucket = (mix64(key) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "table_id": pa.array(out_tab),
            "code": pa.array(out_code),
            "vec_id": pa.array(out_id),
            "bucket": pa.array(bucket),
        })

    _EMPTY = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                           "vec_b": pd.Series(dtype="int64")})

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(["table_id", "code"], keep=False)]
        if dup.empty:
            return _EMPTY
        mm = dup.merge(dup, on=["table_id", "code"])
        mm = mm[mm["vec_id_x"] < mm["vec_id_y"]]
        if mm.empty:
            return _EMPTY
        mm = mm.drop_duplicates(["vec_id_x", "vec_id_y"])
        return pd.DataFrame({"vec_a": mm["vec_id_x"].to_numpy(),
                             "vec_b": mm["vec_id_y"].to_numpy()})

    # candidate generation on the raw-task hash exchange — the Dataset
    # sort-based groupby(bucket) costs ~4s of fixed local-mode latency
    # for this small int-keyed intermediate (CLAUDE.md round-3 rule)
    from .pairs import hash_shuffle

    def merge(*tabs) -> pd.DataFrame:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return _EMPTY
        return partition_pairs(pa.concat_tables(live).to_pandas())

    code_refs = (ds.map_batches(codes, batch_format="pyarrow")
                 .materialize().to_arrow_refs())
    parts = hash_shuffle(
        [(r, ()) for r in code_refs],
        # a skipped-empty block arrives SCHEMA-LESS (CLAUDE.md rule)
        lambda block: (block if "bucket" in block.schema.names
                       else _EMPTY_CODES),
        merge, P=P)
    cand = pd.concat(parts, ignore_index=True)
    if cand.empty:
        return _EMPTY.copy()
    cand = cand.drop_duplicates(["vec_a", "vec_b"])
    out = _verify_pairs_cosine(sf_dir, cand, threshold)
    if out.empty:
        return _EMPTY.copy()
    return (out.drop_duplicates(["vec_a", "vec_b"])
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))


def _verify_pairs_cosine(sf_dir: str, cand: pd.DataFrame,
                         threshold: float) -> pd.DataFrame:
    """Distributed exact-cosine verify over a candidate id-pair list
    (shared pairs.verify_pairs scaffolding): candidate vectors stream
    through a pushdown read into per-pair-bucket groups; each bucket
    resolves its pairs with one vectorized row-gather + dot product.
    Scales with |candidates|, not the corpus."""
    import ray.data as rd

    from .pairs import verify_pairs

    need = sorted(set(int(x) for x in cand["vec_a"])
                  | set(int(x) for x in cand["vec_b"]))
    emb_ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(need),
    )

    def payload(batch: pa.Table) -> tuple:
        ids, mat = _batch_matrix(batch)
        unit = _unit(mat)
        return ids, [unit[i].tolist() for i in range(len(ids))]

    empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                          "vec_b": pd.Series(dtype="int64")})

    def verify(vecs: dict, prs: np.ndarray) -> pd.DataFrame:
        idx = {v: i for i, v in enumerate(vecs)}
        mat = np.array(list(vecs.values()), dtype=np.float64)
        ia = np.array([idx[int(a)] for a, _ in prs], dtype=np.int64)
        ib = np.array([idx[int(b)] for _, b in prs], dtype=np.int64)
        sims = np.einsum("ij,ij->i", mat[ia], mat[ib])
        keep = sims >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame({"vec_a": prs[keep, 0], "vec_b": prs[keep, 1]})

    return verify_pairs(emb_ds, cand[["vec_a", "vec_b"]].to_numpy(),
                        payload, verify, empty,
                        payload_type=pa.list_(pa.float64()),
                        pairs_per_bucket=256)


def _nd_planes(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    key = ("nd_planes", dim, n_tables, n_planes)
    if key not in _DIM_CACHE:
        rng = np.random.default_rng(4242)
        _DIM_CACHE[key] = rng.normal(size=(n_tables, n_planes, dim))
    return _DIM_CACHE[key]


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def _train_centroids(ds, n_lists: int, n_rows: int) -> np.ndarray:
    """Seeded distributed sample → tiny driver-side Lloyd refinement.
    The sample (≤2000 rows) is the only data the driver touches;
    ``n_rows`` comes from parquet metadata so no extra Dataset
    execution is spent on a count."""
    sample = ds.random_sample(min(1.0, 2000 / max(n_rows, 1)), seed=42).to_pandas()
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
    return centroids


def q_knn_ivf(sf_dir: str, query_ids: tuple = (0, 1, 2, 3), k: int = 5,
              n_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF ANN: coarse centroids (seeded sample + Lloyd) → each query
    probes its n_probe nearest lists. Distributed shape: centroids +
    per-query probe lists are broadcast; every corpus batch assigns its
    own rows (argmax over centroids), keeps rows whose list is probed by
    a query, re-ranks locally, emits per-batch top-k. The inverted index
    never materializes — assignment is recomputed per batch, which at
    scale is one small matmul against the cached centroid matrix.
    Approximate → rows-only driver check; recall pytest'd."""
    import ray

    import pyarrow.parquet as pq

    ds = _emb(sf_dir)
    n_rows = pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    if n_rows == 0:
        return _EMPTY_KNN.copy()
    qids, qmat = _query_matrix(sf_dir, query_ids)
    if len(qids) == 0:  # before centroid training — don't spend a
        return _EMPTY_KNN.copy()  # sample pass on an empty query set
    centroids = _train_centroids(ds, n_lists, n_rows)
    # probe lists per query (n_probe nearest centroids)
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    bref = ray.put((centroids, qids, qmat, probes))

    def local_topk(batch: pa.Table) -> pa.Table:
        cents, qids_, qmat_, probes_ = ray.get(bref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY_TOPK
        unit = _unit(mat)
        lists = np.argmax(unit @ cents.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for j, q in enumerate(qids_):
            mask = np.isin(lists, probes_[j]) & (ids != q)
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            sims = unit[cand] @ qmat_[j]
            for i in _topk_idx(sims, ids[cand], min(k, cand.size)):
                out_q.append(int(q))
                out_n.append(int(ids[cand[i]]))
                out_s.append(float(sims[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "neighbor_id": pd.Series(dtype="int64")})
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# LSH ANN
# ---------------------------------------------------------------------------

N_PLANES = 6  # 64 buckets; multi-probe on 1- and 2-bit flips


def _planes(dim: int) -> np.ndarray:
    key = ("planes", dim)
    if key not in _DIM_CACHE:
        rng = np.random.default_rng(42)
        _DIM_CACHE[key] = rng.normal(size=(N_PLANES, dim))
    return _DIM_CACHE[key]


def _probe_set(c0: int) -> set[int]:
    # exact bucket + 1- and 2-bit flips (random 64-dim embeddings have no
    # cluster structure, so deeper probing is the recall lever; still
    # scans ~1/3 of buckets, not all-pairs)
    return {c0} | {c0 ^ (1 << b) for b in range(N_PLANES)} | {
        c0 ^ (1 << a) ^ (1 << b)
        for a in range(N_PLANES) for b in range(a + 1, N_PLANES)
    }


def q_knn_lsh(sf_dir: str, query_ids: tuple = (0, 1, 2, 3), k: int = 5) -> pd.DataFrame:
    """LSH-bucketed ANN: random-hyperplane code per vector; a corpus row
    is a candidate for query q iff its code lies in q's multiprobe set.
    The probe sets are query-side metadata (≤22 codes each) broadcast to
    every batch, so bucket membership is a vectorized filter inside
    map_batches — same candidates as a groupby(code) join, zero shuffle.
    Approximate by design → rows-only driver check; recall pytest'd."""
    import ray

    qids, qmat = _query_matrix(sf_dir, query_ids)
    if len(qids) == 0:
        return _EMPTY_KNN.copy()
    planes = _planes(qmat.shape[1])
    qsigs = (qmat @ planes.T > 0).astype(np.uint32)
    qcodes = (qsigs << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
    probe_lists = [np.fromiter(_probe_set(int(c)), dtype=np.int64) for c in qcodes]
    bref = ray.put((qids, qmat, probe_lists))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_, probes_ = ray.get(bref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY_TOPK
        pl = _planes(mat.shape[1])
        sigs = (mat @ pl.T > 0).astype(np.uint32)
        codes = (sigs << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1).astype(np.int64)
        unit = _unit(mat)
        out_q, out_n, out_s = [], [], []
        for j, q in enumerate(qids_):
            mask = np.isin(codes, probes_[j]) & (ids != q)
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            sims = unit[cand] @ qmat_[j]
            for i in _topk_idx(sims, ids[cand], min(k, cand.size)):
                out_q.append(int(q))
                out_n.append(int(ids[cand[i]]))
                out_s.append(float(sims[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "neighbor_id": pd.Series(dtype="int64")})
    return _merge_topk(partials, k)


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (the training-data "class centroid"
    aggregate). Scale shape: each batch pre-combines to one
    (label, count, sum-vector) row per label — the vector-valued
    combiner — so the shuffle/merge sees n_labels×n_batches tiny rows,
    never the embeddings. Output exploded to (label, pos, c) rows to
    match the SQL oracle's unnest."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb_ok = pc.is_valid(batch.column("embedding"))
        if not pc.all(emb_ok).as_py():
            batch = batch.filter(emb_ok)  # unnest skips null lists
        lab = batch.column("label")
        if batch.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.list_(pa.float64()))})
        flat = batch.column("embedding").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        mat = flat.reshape(batch.num_rows, -1).astype(np.float64)
        null_mask = np.asarray(pc.is_null(lab))
        labels = lab.to_numpy(zero_copy_only=False)
        out_l, out_n, out_s = [], [], []
        for lb in np.unique(labels[~null_mask]):
            rows = mat[(labels == lb) & ~null_mask]
            out_l.append(int(lb))
            out_n.append(int(len(rows)))
            out_s.append(rows.sum(axis=0).tolist())
        if null_mask.any():
            # the oracle's GROUP BY keeps NULL as its own group
            out_l.append(None)
            out_n.append(int(null_mask.sum()))
            out_s.append(mat[null_mask].sum(axis=0).tolist())
        return pa.table({"label": pa.array(out_l, pa.int32()),
                         "n": pa.array(out_n, pa.int64()),
                         "vsum": pa.array(out_s, pa.list_(pa.float64()))})

    parts = _with_cols(
        ds.map_batches(partial, batch_format="pyarrow").to_pandas(),
        {"label": "int64", "n": "int64", "vsum": "object"})
    rows = []
    for lb, grp in parts.groupby("label", dropna=False):
        total = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
        n = grp["n"].sum()
        lb_out = None if pd.isna(lb) else int(lb)
        for pos, v in enumerate(total / n, start=1):
            rows.append((lb_out, pos, round(float(v), 6)))
    out = pd.DataFrame(rows, columns=["label", "pos", "c"])
    if not len(out):  # typed empty (object dtypes otherwise)
        return pd.DataFrame({"label": pd.Series(dtype="int32"),
                             "pos": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="float64")})
    # match the parquet dtype (nullable only when a NULL group exists)
    out["label"] = out["label"].astype(
        "int32" if out["label"].notna().all() else "Int32")
    out["pos"] = out["pos"].astype("int64")
    out["c"] = out["c"].astype("float64")
    return out


def q_quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """Symmetric per-vector int8 quantization (the storage/serving
    compression step for embedding tables): q = round(127·x / max|x|),
    half-away-from-zero like SQL ``round``, zero vectors quantize to
    zeros. Embarrassingly parallel — one vectorized map over batches,
    no shuffle; output exploded to (vec_id, pos, q) rows to match the
    oracle's unnest. Arithmetic runs in float64 on BOTH sides (the SQL
    casts the float32 elements to DOUBLE) so the rounding boundary is
    bit-identical."""
    _EMPTY_Q = pa.table({"vec_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "q": pa.array([], pa.int64())})

    def quant(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY_Q
        maxabs = np.abs(mat).max(axis=1, keepdims=True)
        # association order matters at exact-half boundaries: the oracle
        # computes round((127*x)/m), and x*(127/m) differs by 1 ulp for
        # ~13% of magnitudes (e.g. x = m/2 with non-power-of-two m) —
        # multiply first, divide second, exactly like the SQL
        num = 127.0 * mat
        v = np.divide(num, maxabs, out=np.zeros_like(num),
                      where=maxabs > 0)
        q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        n, d = mat.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), d)),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "q": pa.array(q.reshape(-1)),
        })

    out = _with_cols(
        _emb(sf_dir).map_batches(quant,
                                 batch_format="pyarrow").to_pandas(),
        {"vec_id": "int64", "pos": "int64", "q": "int64"})
    return out.sort_values(["vec_id", "pos"]).reset_index(drop=True)


def q_embedding_gram(sf_dir: str) -> pd.DataFrame:
    """Distributed Gram matrix G = Σ x·xᵀ over the embedding corpus —
    the covariance/PCA/whitening building block. Classic distributed
    linear algebra shape: each batch contributes ``mat.T @ mat``
    (float64, d×d), and only the d²-sized accumulators cross the wire —
    the embeddings themselves never leave their blocks, Ray tree-merges
    the accumulators (``tree_sum`` — no process ever holds all
    per-block partials), and the driver receives exactly one d×d
    matrix, corpus-size-independent. Output is the upper triangle as
    (i, j, g) rows (1-based, i ≤ j) rounded to 6dp to survive
    float-sum association differences vs the SQL oracle."""
    from .pairs import tree_sum

    def block_gram(block: pa.Table):
        ids, mat = _batch_matrix(block)
        if len(ids) == 0:
            return None
        g = mat.T @ mat  # float64 (see _batch_matrix)
        return g.reshape(-1)

    total = tree_sum(_emb(sf_dir), block_gram, name="gram")
    if total is None:
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "g": pd.Series(dtype="float64")})
    d = math.isqrt(len(total))
    total = total.reshape(d, d)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({"i": (iu + 1).astype(np.int64),
                         "j": (ju + 1).astype(np.int64),
                         "g": np.round(total[iu, ju], 6)})


def q_kmeans(sf_dir: str, k: int = 4, iters: int = 2) -> pd.DataFrame:
    """Distributed k-means (Lloyd), the canonical iterative-ML shape:
    centroids are the small broadcast state (k×d floats via
    ``ray.put``), each round is ONE streaming pass where every batch
    assigns its vectors to the nearest centroid (vectorized squared-L2
    against the broadcast matrix, ties to the lowest centroid id) and
    pre-combines to per-cluster (count, sum-vector) partials — the
    k×d-sized combiner crosses the wire, never the corpus — and the
    driver reduces n_batches×k tiny rows into the next centroids.
    Deterministic contract (SQL-checkable): init = the embeddings of
    vec_id 0..k−1, fixed ``iters`` rounds, a cluster that receives no
    members keeps its previous centroid. Output = final centroids
    exploded to (cluster, pos, c) rows rounded to 6dp.

    Parity caveat (inherent to discrete iterative algorithms): the
    engine's fused distance and the oracle's per-dim sum agree only to
    float rounding, so a vector within ~1 ulp of exactly equidistant
    between two centroids could assign differently and desynchronize
    later rounds. On continuous-valued embeddings that is a
    measure-zero event (distance gaps are O(1), float error ~1e-13);
    duplicate-heavy integer-valued inputs would need an epsilon-aware
    tie rule instead."""
    init_ids, cent = _lloyd_centroids(sf_dir, k, iters)
    if len(init_ids) == 0:
        return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="float64")})
    k = len(init_ids)
    d = cent.shape[1]
    cl = np.repeat(init_ids.astype(np.int64), d)
    pos = np.tile(np.arange(1, d + 1, dtype=np.int64), k)
    return pd.DataFrame({"cluster": cl, "pos": pos,
                         "c": np.round(cent.reshape(-1), 6)})


def _lloyd_centroids(sf_dir: str, k: int, iters: int) -> tuple[np.ndarray, np.ndarray]:
    """The Lloyd loop behind q71/q80: returns (init_ids, centroids) —
    cluster LABELS are the init vec_ids, centroid row r corresponds to
    init_ids[r] (both in sorted-vec_id order, so argmin's first-index
    tie-break equals the oracle's ORDER BY d2, cluster)."""
    import ray

    _EMPTY = pa.table({"cluster": pa.array([], pa.int64()),
                       "cnt": pa.array([], pa.int64()),
                       "vsum": pa.array([], pa.list_(pa.float64()))})

    init_ids, init_mat = _query_matrix_raw(sf_dir, range(k))
    if len(init_ids) == 0:
        return init_ids.astype(np.int64), np.zeros((0, 1), np.float64)
    # cluster LABELS are the init vec_ids (like the oracle's
    # `vec_id AS cluster`); rows of `cent` are indexed 0..k-1 in the
    # same sorted order, so argmin's first-index tie-break equals the
    # oracle's ORDER BY d2, cluster
    k = len(init_ids)
    cent = init_mat.copy()

    def assign_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _EMPTY
        # ||x-c||² = ||x||² - 2x·c + ||c||²; the ||x||² term is common
        # per row, so argmin over (-2x·c + ||c||²) suffices — one
        # matmul per batch, no n×k×d temporaries
        d2 = -2.0 * (mat @ c.T) + (c * c).sum(axis=1)
        best = np.argmin(d2, axis=1)  # np.argmin takes the FIRST min → lowest cid
        cl, inv = np.unique(best, return_inverse=True)
        cnt = np.bincount(inv)
        vsum = np.zeros((len(cl), mat.shape[1]))
        np.add.at(vsum, inv, mat)
        return pa.table({
            "cluster": pa.array(cl.astype(np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
            "vsum": pa.array(list(vsum), pa.list_(pa.float64())),
        })

    for _ in range(iters):
        cref = ray.put(cent)
        parts = (_emb(sf_dir).map_batches(assign_partial,
                                          batch_format="pyarrow").to_pandas())
        new = cent.copy()  # empty clusters keep their previous centroid
        if len(parts):
            for cl, grp in parts.groupby("cluster"):
                n = grp["cnt"].sum()
                s = np.sum(np.stack([np.asarray(v) for v in grp["vsum"]]),
                           axis=0)
                new[int(cl)] = s / n
        cent = new

    return init_ids.astype(np.int64), cent


def _query_matrix_raw(sf_dir: str, ids) -> tuple[np.ndarray, np.ndarray]:
    """Pushdown fetch of specific vectors WITHOUT unit-normalizing
    (k-means wants raw coordinates; _query_matrix normalizes for
    cosine search)."""
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=pc.field("vec_id").isin([int(q) for q in ids]),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    return _batch_matrix(t)


def q_normalize_by_label(sf_dir: str) -> pd.DataFrame:
    """Per-label z-score normalization of the embedding table (the
    per-class feature-standardization step): z = (x − μ)/σ per
    (label, dimension), with σ² = E[v²] − E[v]² computed by the SAME
    explicit formula the oracle SQL uses (stddev_pop's internal
    algorithm would differ at more ulps than the 6dp rounding absorbs).
    Two streaming passes: a per-batch per-label (n, Σv, Σv²) combiner
    (n_labels×d floats cross the wire), the tiny (μ, σ) table
    broadcasts via ``ray.put``, and the z pass is one vectorized map.
    Zero-variance dimensions normalize to 0 (both sides guard).

    Parity caveat: for a NEAR-constant dimension (true variance below
    the float64 summation error, ~1e-16 relative) the two sides' var
    can round onto opposite sides of the ≤0 guard — z=0 vs z=O(1).
    Exactly-constant dimensions are safe (the numerator is exactly 0
    on both sides); continuous-valued embeddings make the adversarial
    case measure-zero, like q71's equidistance caveat."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "label", "embedding"])

    _EMPTY_ST = pa.table({"label": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "vsum": pa.array([], pa.list_(pa.float64())),
                          "vsq": pa.array([], pa.list_(pa.float64()))})

    def _label_mat(batch: pa.Table):
        # NULL-label rows never match the oracle's JOIN USING (label,
        # pos) — drop them up front (int(NaN) would crash the combiner
        # otherwise); matrix extraction (incl. the NULL-embedding
        # filter) delegates to the shared _batch_matrix
        lab_ok = pc.is_valid(batch.column("label"))
        if not pc.all(lab_ok).as_py():
            batch = batch.filter(lab_ok)
        emb_ok = pc.is_valid(batch.column("embedding"))
        if not pc.all(emb_ok).as_py():
            batch = batch.filter(emb_ok)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        ids, mat = _batch_matrix(batch)
        return labels, ids, mat

    def stats_partial(batch: pa.Table) -> pa.Table:
        labels, _, mat = _label_mat(batch)
        if len(labels) == 0:
            return _EMPTY_ST
        out_l, out_n, out_s, out_q = [], [], [], []
        for lb in np.unique(labels):
            rows = mat[labels == lb]
            out_l.append(int(lb))
            out_n.append(len(rows))
            out_s.append(rows.sum(axis=0).tolist())
            out_q.append((rows * rows).sum(axis=0).tolist())
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "n": pa.array(out_n, pa.int64()),
                         "vsum": pa.array(out_s, pa.list_(pa.float64())),
                         "vsq": pa.array(out_q, pa.list_(pa.float64()))})

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64"),
                             "z": pd.Series(dtype="float64")})
    mus, sigs = {}, {}
    for lb, grp in parts.groupby("label"):
        n = grp["n"].sum()
        s = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
        q = np.sum(np.stack(grp["vsq"].to_numpy()), axis=0)
        mu = s / n
        var = q / n - mu * mu  # the oracle's avg(v*v) - avg(v)*avg(v)
        sig = np.sqrt(np.maximum(var, 0.0))
        mus[int(lb)], sigs[int(lb)] = mu, np.where(var <= 0, np.inf, sig)
    sref = ray.put((mus, sigs))

    def zmap(batch: pa.Table) -> pa.Table:
        mus_, sigs_ = ray.get(sref)
        labels, ids, mat = _label_mat(batch)
        if len(labels) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "z": pa.array([], pa.float64())})
        z = np.empty_like(mat)
        for lb in np.unique(labels):
            m = labels == lb
            z[m] = (mat[m] - mus_[int(lb)]) / sigs_[int(lb)]  # inf → 0
        n, d = mat.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), d)),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "z": pa.array(np.round(z.reshape(-1), 6)),
        })

    out = ds.map_batches(zmap, batch_format="pyarrow").to_pandas()
    return out.sort_values(["vec_id", "pos"]).reset_index(drop=True)


def q_semdedup(sf_dir: str, k: int = 8, iters: int = 2,
               threshold: float = 0.9) -> pd.DataFrame:
    """SemDeDup (Abbas et al. 2023) — semantic dedup of an embedding
    corpus: k-means-cluster the vectors, then within each cluster drop
    every vector whose cosine similarity to ANY earlier (lower vec_id)
    cluster member reaches ``threshold`` (keep-first, matching the
    oracle's NOT EXISTS over j < i). The quadratic compare never
    crosses clusters — that is the whole point of the clustering
    stage: pair work drops from O(N²) to O(Σ|cluster|²), and k is the
    scale dial (SemDeDup's paper setting is k ≈ √N·const; here the
    SQL-checkable contract pins k=8, iters=2, init = vec_id 0..k−1,
    shared with q71 via ``_lloyd_centroids``).

    Shape: Lloyd rounds are streaming broadcast-centroid passes (see
    q71); the final pass is ONE ``hash_shuffle`` raw-task exchange —
    split tasks assign each block's vectors to their nearest centroid
    (bucket = cluster index) carrying (vec_id, embedding) only, and
    each per-cluster merge task runs the block-wise keep-first scan
    (row-block × earlier-columns matmul, 1024-row tiles, so a hot
    cluster never materializes its full n×n sim matrix). NULL
    embeddings drop like the oracle's unnest; zero-norm vectors get
    cos = 0 against everything on both sides (engine: _unit keeps the
    zero vector; oracle: 0/0 = NaN, NaN >= t is false) → kept."""
    import ray

    from .pairs import hash_shuffle

    _empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                           "cluster": pd.Series(dtype="int64"),
                           "keep": pd.Series(dtype="bool")})
    init_ids, cent = _lloyd_centroids(sf_dir, k, iters)
    if len(init_ids) == 0:
        return _empty
    labels = init_ids.astype(np.int64)
    P = len(labels)
    csq = (cent * cent).sum(axis=1)

    def split(block: pa.Table) -> pa.Table:
        valid = pc.is_valid(block.column("embedding"))
        if not pc.all(valid).as_py():
            block = block.filter(valid)
        ids, mat = _batch_matrix(block)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))})
        d2 = -2.0 * (mat @ cent.T) + csq
        best = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({"vec_id": block.column("vec_id"),
                         "bucket": pa.array(best),
                         "embedding": block.column("embedding")})

    def merge(*tables: pa.Table) -> pd.DataFrame:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return _empty
        t = pa.concat_tables(parts).combine_chunks().sort_by("vec_id")
        cluster = labels[t.column("bucket")[0].as_py()]
        ids, mat = _batch_matrix(t)
        u = _unit(mat)
        n = len(ids)
        keep = np.ones(n, bool)
        B = 1024
        for s in range(0, n, B):
            e = min(s + B, n)
            sims = u[s:e] @ u[:e].T  # rows s..e vs every column < e
            earlier = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            keep[s:e] = ~((sims >= threshold) & earlier).any(axis=1)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "cluster": np.full(n, cluster, np.int64),
                             "keep": keep})

    parts = hash_shuffle([(r, ()) for r in _emb(sf_dir).to_arrow_refs()],
                         split, merge, P=P)
    out = pd.concat([p for p in parts if len(p)], ignore_index=True) \
        if any(len(p) for p in parts) else _empty
    return out.sort_values("vec_id").reset_index(drop=True)


def q_pca_power(sf_dir: str, iters: int = 3) -> pd.DataFrame:
    """Top principal component of the embedding table by power
    iteration — the dimensionality-reduction prelude (whitening,
    low-rank compression) done the distributed-linear-algebra way:
    ONE streaming pass computes per-block second-moment partials
    (count, Σx, XᵀX — a flat additive [n | Σx | XᵀX] vector of
    1 + d + d² floats, never the corpus), Ray tree-merges them
    (``tree_sum``), and the driver receives the single reduced vector,
    unpacks the d×d population covariance C = E[xxᵀ] − μμᵀ, and runs
    the power iterations (v ← Cv/‖Cv‖ from v₀ = e₁, fixed ``iters``
    rounds — deterministic, so SQL-checkable like q71) on that tiny
    matrix. NULL embeddings drop like the oracle's unnest."""
    from .pairs import tree_sum

    _empty = pd.DataFrame({"pos": pd.Series(dtype="int64"),
                           "v": pd.Series(dtype="float64")})

    def block_moments(block: pa.Table):
        ids, mat = _batch_matrix(block)
        if len(ids) == 0:
            return None
        return np.concatenate(([float(len(ids))], mat.sum(axis=0),
                               (mat.T @ mat).reshape(-1)))

    total = tree_sum(_emb(sf_dir), block_moments, name="moments")
    if total is None:
        return _empty
    # len = 1 + d + d²  →  4·len − 3 = (2d+1)², exact under isqrt
    d = (math.isqrt(4 * len(total) - 3) - 1) // 2
    n = float(total[0])
    s = total[1:1 + d]
    m = total[1 + d:]
    mu = s / n
    cov = m.reshape(d, d) / n - np.outer(mu, mu)

    v = np.zeros(d)
    v[0] = 1.0
    for _ in range(iters):
        w = cov @ v
        v = w / np.linalg.norm(w)
    return pd.DataFrame({"pos": np.arange(1, d + 1, dtype=np.int64),
                         "v": np.round(v, 6)})


def q_topk_similar_pairs(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """GLOBAL top-k most-similar embedding pairs — the 'find the worst
    near-duplicates' curation op. Same blocked self-cross-product as
    :func:`q_neardup_cosine` (chunk-pair tasks over object-store refs,
    no threshold known in advance), but each task keeps only its LOCAL
    top-k rows, so the driver folds G(G+1)/2 · k rows instead of the
    O(N²) similarity matrix. Selection happens on the similarity
    ROUNDED to 6 digits with (vec_a, vec_b) tie-breaks — the same
    ordering the SQL oracle's ORDER BY uses — so a last-ulp dot-product
    divergence between numpy's blocked matmul and DuckDB's sequential
    list_cosine_similarity cannot flip the boundary."""
    import ray

    from .pairs import round_away

    EMPTY = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                          "vec_b": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})
    refs = _emb(sf_dir).to_arrow_refs()
    if not refs:
        return EMPTY
    groups: list[list] = [[] for _ in range(min(N_CHUNKS, len(refs)))]
    for i, r in enumerate(refs):
        groups[i % len(groups)].append(r)

    _E = pa.table({"vec_a": pa.array([], pa.int64()),
                   "vec_b": pa.array([], pa.int64()),
                   "sim": pa.array([], pa.float64())})

    @ray.remote
    def chunk_topk(same: bool, refs_a: list, refs_b: list) -> pa.Table:
        def load(rs):
            tabs = [t for t in (ray.get(r) for r in rs) if t.num_rows]
            if not tabs:
                return np.array([], dtype=np.int64), np.zeros((0, 1))
            ids, mat = _batch_matrix(pa.concat_tables(tabs))
            return ids, _unit(mat)

        ids_a, ua = load(refs_a)
        ids_b, ub = (ids_a, ua) if same else load(refs_b)
        if not len(ids_a) or not len(ids_b):
            return _E
        sims = ua @ ub.T
        left = np.repeat(ids_a, len(ids_b))
        right = np.tile(ids_b, len(ids_a))
        s = sims.ravel()
        if same:
            keep = left < right
        else:
            keep = np.ones(len(left), bool)
            lo = np.minimum(left, right)
            right = np.maximum(left, right)
            left = lo
        left, right, s = left[keep], right[keep], s[keep]
        if len(s) == 0:
            return _E
        sr = round_away(s, 6)
        # local top-k by (rounded sim DESC, vec_a, vec_b)
        order = np.lexsort((right, left, -sr))[:k]
        return pa.table({"vec_a": pa.array(left[order].astype("int64")),
                         "vec_b": pa.array(right[order].astype("int64")),
                         "sim": pa.array(sr[order])})

    futs = []
    for i in range(len(groups)):
        futs.append(chunk_topk.remote(True, groups[i], []))
        for j in range(i + 1, len(groups)):
            futs.append(chunk_topk.remote(False, groups[i], groups[j]))
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return EMPTY
    out = pa.concat_tables(tables).to_pandas()
    order = np.lexsort((out["vec_b"].to_numpy(np.int64),
                        out["vec_a"].to_numpy(np.int64),
                        -out["sim"].to_numpy(np.float64)))[:k]
    return out.iloc[order].reset_index(drop=True)


def q_reverse_top1_counts(sf_dir: str) -> pd.DataFrame:
    """Reverse nearest-neighbor in-degree: for every vector, how many
    OTHER vectors choose it as their single most-similar neighbor (hub
    detection for embedding QA). Blocked cross-product tasks keep a
    per-row LOCAL best over each chunk pair (both directions — a chunk
    pair task is each side's only view of the other); the per-row
    global best folds through one row-id exchange with (rounded-sim
    DESC, neighbor-id ASC) tie-breaks — the same ordering the SQL
    window uses, so last-ulp matmul divergence cannot flip a winner.
    Rows sharing a vec_id (duplicate ids) form ONE ranking partition,
    like SQL's PARTITION BY, and equal-id pairs never match."""
    import ray

    from .pairs import round_away

    EMPTY = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "rnn_count": pd.Series(dtype="int64")})
    refs = _emb(sf_dir).to_arrow_refs()
    if not refs:
        return EMPTY
    groups: list[list] = [[] for _ in range(min(N_CHUNKS, len(refs)))]
    for i, r in enumerate(refs):
        groups[i % len(groups)].append(r)

    _E = pa.table({"qid": pa.array([], pa.int64()),
                   "nid": pa.array([], pa.int64()),
                   "sim": pa.array([], pa.float64())})

    @ray.remote
    def chunk_best(same: bool, refs_a: list, refs_b: list) -> pa.Table:
        def load(rs):
            tabs = [t for t in (ray.get(r) for r in rs) if t.num_rows]
            if not tabs:
                return np.array([], dtype=np.int64), np.zeros((0, 1))
            ids, mat = _batch_matrix(pa.concat_tables(tabs))
            return ids, _unit(mat)

        ids_a, ua = load(refs_a)
        ids_b, ub = (ids_a, ua) if same else load(refs_b)
        if not len(ids_a) or not len(ids_b):
            return _E

        def bests(ids_q, uq, ids_n, un):
            sims = round_away(uq @ un.T, 6)
            # equal ids never match (SQL a.vec_id <> b.vec_id)
            eq = ids_q[:, None] == ids_n[None, :]
            sims[eq] = -np.inf
            # argmax with neighbor-id tie-break: order columns by id
            order = np.argsort(ids_n, kind="stable")
            s2 = sims[:, order]
            j = np.argmax(s2, axis=1)  # first max = smallest nid
            best = s2[np.arange(len(ids_q)), j]
            ok = np.isfinite(best)
            return (ids_q[ok], ids_n[order][j[ok]], best[ok])

        qa, na, sa = bests(ids_a, ua, ids_b, ub)
        if same:
            return pa.table({"qid": pa.array(qa.astype("int64")),
                             "nid": pa.array(na.astype("int64")),
                             "sim": pa.array(sa)})
        qb, nb, sb = bests(ids_b, ub, ids_a, ua)
        return pa.table({
            "qid": pa.array(np.concatenate([qa, qb]).astype("int64")),
            "nid": pa.array(np.concatenate([na, nb]).astype("int64")),
            "sim": pa.array(np.concatenate([sa, sb]))})

    futs = []
    for i in range(len(groups)):
        futs.append(chunk_best.remote(True, groups[i], []))
        for j in range(i + 1, len(groups)):
            futs.append(chunk_best.remote(False, groups[i], groups[j]))
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return EMPTY
    df = pa.concat_tables(tables).to_pandas()
    # global per-qid best: sim DESC, nid ASC (rounded sims — exact)
    df = df.sort_values(["qid", "sim", "nid"],
                        ascending=[True, False, True], kind="stable")
    win = df.drop_duplicates("qid", keep="first")
    out = (win.groupby("nid", as_index=False).size()
           .rename(columns={"nid": "vec_id", "size": "rnn_count"}))
    out["vec_id"] = out["vec_id"].astype(np.int64)
    out["rnn_count"] = out["rnn_count"].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def q_knn_classify(sf_dir: str, split_id: int = 50,
                   k: int = 3) -> pd.DataFrame:
    """k-NN classification — the supervised layer over q24's search
    primitive: every probe vector (vec_id < split_id) gets the
    majority label of its k nearest cosine neighbors from the labeled
    pool (vec_id >= split_id); label-count ties break on the smallest
    label (so a 1-1-1 vote is deterministic). Same broadcast-probe
    discipline as q24: the probe matrix rides one ``ray.put``, the
    pool only streams through map_batches emitting k-row local top-k
    partials per probe, the driver folds P·k·n_probe rows and votes.
    Contract (oracle WHERE): NULL embeddings and NULL labels are out
    of the pool; output label keeps the column's int32 dtype."""
    import ray
    import ray.data as rd

    empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "pred_label": pd.Series(dtype="int32")})
    qt = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=(pc.field("vec_id") < split_id)
        & pc.field("embedding").is_valid()
        & pc.field("vec_id").is_valid(),
        columns=["vec_id", "embedding"]).sort_by("vec_id")
    qids, qmat = _batch_matrix(qt)
    if len(qids) == 0:
        return empty
    qref = ray.put((qids.astype(np.int64), _unit(qmat)))

    pool = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("embedding").is_valid()
                & pads.field("label").is_valid()
                & (pads.field("vec_id") >= split_id)))

    _E = pa.table({"qid": pa.array([], pa.int64()),
                   "sim": pa.array([], pa.float64()),
                   "vid": pa.array([], pa.int64()),
                   "label": pa.array([], pa.int64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.schema.names:
            return _E
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        ids, mat = _batch_matrix(batch.select(["vec_id", "embedding"]))
        if len(ids) == 0:
            return _E
        qids_, qu = ray.get(qref)
        sims = _unit(mat) @ qu.T  # (n_pool, n_probe)
        rows_q, rows_s, rows_v, rows_l = [], [], [], []
        for j in range(sims.shape[1]):
            pick = _topk_idx(sims[:, j], ids, k)
            rows_q.append(np.full(pick.size, qids_[j], np.int64))
            rows_s.append(sims[pick, j])
            rows_v.append(ids[pick].astype(np.int64))
            rows_l.append(np.asarray(labels, np.int64)[pick])
        return pa.table({"qid": pa.array(np.concatenate(rows_q)),
                         "sim": pa.array(np.concatenate(rows_s)),
                         "vid": pa.array(np.concatenate(rows_v)),
                         "label": pa.array(np.concatenate(rows_l))})

    parts = pool.map_batches(local_topk,
                             batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    # global top-k per probe by (sim DESC, vid), then majority vote
    # with (count DESC, label ASC)
    order = np.lexsort((parts["vid"].to_numpy(np.int64),
                        -parts["sim"].to_numpy(np.float64),
                        parts["qid"].to_numpy(np.int64)))
    s = parts.iloc[order]
    top = s.groupby("qid", sort=True).head(k)
    out_ids, out_lab = [], []
    for qid, g in top.groupby("qid", sort=True):
        vc = (g.groupby("label").size().reset_index(name="c")
              .sort_values(["c", "label"], ascending=[False, True]))
        out_ids.append(int(qid))
        out_lab.append(int(vc["label"].iloc[0]))
    return pd.DataFrame({"vec_id": pd.array(out_ids, "int64"),
                         "pred_label": np.asarray(out_lab, np.int32)})


def q_dbscan(sf_dir: str, threshold: float = 0.35, min_pts: int = 3,
             rounds: int = 8,
             sample_p: float | None = None) -> pd.DataFrame:
    """Density-based clustering (DBSCAN) over the embedding corpus
    with cosine similarity ≥ ``threshold`` as the ε-neighborhood — the
    noise-aware alternative to q71's k-means for corpus curation:
    CORE points (≥ min_pts neighbors) cluster transitively through
    other cores, BORDER points (non-core touching a core) join their
    smallest core neighbor's cluster, everything else is noise and
    emits no row. cluster_id = min vec_id of the cluster's cores.

    CONTRACT: exactly ``rounds`` min-label rounds over the core-core
    graph on both sides (q220 discipline — the oracle unrolls them;
    the engine early-exits only at the fixpoint). Scale shape: the
    ε-graph comes from q27's blocked exact pair scan (swap in
    q_neardup_cosine_lsh for the sub-quadratic candidate path at
    corpus scale); degrees/labels/border votes are all vectorized
    folds over the output-bounded pair list, never the corpus."""
    pairs = q_neardup_cosine(sf_dir, threshold, sample_p=sample_p)
    empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "role": pd.Series(dtype="object"),
                          "cluster_id": pd.Series(dtype="int64")})
    if pairs.empty:
        return empty
    a = pairs["vec_a"].to_numpy(np.int64)
    b = pairs["vec_b"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    deg = np.bincount(ia, minlength=nodes.size) \
        + np.bincount(ib, minlength=nodes.size)
    is_core = deg >= min_pts
    # bounded synchronous min-label propagation over core-core edges
    lbl = np.where(is_core, nodes, np.int64(np.iinfo(np.int64).max))
    cc_m = is_core[ia] & is_core[ib]
    ca, cb = ia[cc_m], ib[cc_m]
    for _ in range(rounds):
        new = lbl.copy()
        if ca.size:
            m = np.minimum(lbl[ca], lbl[cb])
            np.minimum.at(new, ca, m)
            np.minimum.at(new, cb, m)
        if (new == lbl).all():
            break  # fixpoint
        lbl = new
    rows = [pd.DataFrame({"vec_id": nodes[is_core],
                          "role": "core",
                          "cluster_id": lbl[is_core]})]
    # border: non-core endpoint adjacent to a core — min core label
    bm_a = (~is_core[ia]) & is_core[ib]   # a is border via core b
    bm_b = (~is_core[ib]) & is_core[ia]
    bn = np.concatenate([ia[bm_a], ib[bm_b]])
    bl = np.concatenate([lbl[ib[bm_a]], lbl[ia[bm_b]]])
    if bn.size:
        blbl = np.full(nodes.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(blbl, bn, bl)
        bsel = np.unique(bn)
        rows.append(pd.DataFrame({"vec_id": nodes[bsel],
                                  "role": "border",
                                  "cluster_id": blbl[bsel]}))
    out = pd.concat(rows, ignore_index=True)
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q_ann_recall_eval(sf_dir: str, query_ids: tuple = tuple(range(8)),
                      k: int = 10) -> pd.DataFrame:
    """ANN quality evaluation — the recall@k harness every approximate
    index needs before it replaces the exact path in production: run
    the same probe set through brute-force (q24, the ground truth),
    LSH (q25) and IVF (q26), and report each method's mean recall@k =
    |approx top-k ∩ exact top-k| / k averaged over probes. Approximate
    recall is data/seed-dependent by design → no SQL twin; the
    planted-recall pytest pins the floor. All three searches stream
    the corpus through map_batches with broadcast probes (their own
    documented scale shapes); the eval fold sees only 3·|probes|·k id
    rows."""
    truth = q_knn_bruteforce(sf_dir, query_ids=query_ids, k=k)
    gt = {q: set(g["neighbor_id"]) for q, g in
          truth.groupby("query_id", sort=True)}
    rows = []
    for method, fn in (("bruteforce", q_knn_bruteforce),
                       ("lsh", q_knn_lsh), ("ivf", q_knn_ivf)):
        res = (truth if method == "bruteforce"
               else fn(sf_dir, query_ids=query_ids, k=k))
        got = {q: set(g["neighbor_id"]) for q, g in
               res.groupby("query_id", sort=True)}
        recalls = [len(got.get(q, set()) & s) / max(len(s), 1)
                   for q, s in sorted(gt.items())]
        rows.append((method, len(recalls),
                     float(np.mean(recalls)) if recalls else np.nan))
    out = pd.DataFrame(rows, columns=["method", "n_probes",
                                      "mean_recall"])
    out["n_probes"] = out["n_probes"].astype("int64")
    out["mean_recall"] = out["mean_recall"].round(6)
    return out


def q_silhouette(sf_dir: str) -> pd.DataFrame:
    """Clustering-quality evaluation: mean cosine-distance SILHOUETTE
    per label — the metric layer over q71/q40 that says whether the
    label structure is real. Exact in O(n·L), never O(n²): with unit
    vectors, the mean cosine distance from x to cluster c is a CLOSED
    FORM over the label SUM vector (1 − (x·S_c − [x∈c])/(n_c − [x∈c])),
    so pass 1 folds per-batch (label, count, Σunit) combiners (q40's
    shape) and pass 2 streams the corpus once against the broadcast
    label-sum matrix. s(x) = (b−a)/max(a,b) with a = own-cluster mean
    distance (labels with n=1 drop — silhouette undefined), b = min
    over other labels. Zero vectors and NULL label/embedding are out
    on both sides; ±ulp float drift vs the SQL twin's unnest-sum dots
    is absorbed by round6 (continuous data, no knife edges)."""
    import ray
    import ray.data as rd

    empty = pd.DataFrame({"label": pd.Series(dtype="int32"),
                          "n": pd.Series(dtype="int64"),
                          "mean_silhouette": pd.Series(dtype="float64")})

    pool = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("embedding").is_valid()
                & pads.field("label").is_valid()
                & pads.field("vec_id").is_valid())).materialize()

    def _mat(batch: pa.Table):
        labels = np.asarray(batch.column("label").to_numpy(
            zero_copy_only=False), np.int64)
        _ids, mat = _batch_matrix(batch.select(["vec_id", "embedding"]))
        mat = np.asarray(mat, np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        keep = nrm > 0
        return labels[keep], mat[keep] / nrm[keep, None]

    @ray.remote
    def partial(batch: pa.Table):
        if batch.num_rows == 0 or "label" not in batch.schema.names:
            return None
        labels, u = _mat(batch)
        if not len(labels):
            return None
        ul, inv = np.unique(labels, return_inverse=True)
        cnt = np.bincount(inv)
        sums = np.zeros((ul.size, u.shape[1]))
        np.add.at(sums, inv, u)
        return ul, cnt.astype(np.int64), sums

    refs = pool.to_arrow_refs()
    parts = [p for p in ray.get([partial.remote(r) for r in refs]) if p]
    if not parts:
        return empty
    all_labels = np.unique(np.concatenate([p[0] for p in parts]))
    L = all_labels.size
    dim = parts[0][2].shape[1]
    n_c = np.zeros(L, np.int64)
    S = np.zeros((L, dim))
    for ul, cnt, sums in parts:
        ix = np.searchsorted(all_labels, ul)
        n_c[ix] += cnt
        S[ix] += sums
    if L < 2:
        return empty
    bref = ray.put((all_labels, n_c, S))

    @ray.remote
    def score(batch: pa.Table):
        if batch.num_rows == 0 or "label" not in batch.schema.names:
            return None
        labels, u = _mat(batch)
        if not len(labels):
            return None
        al, nc, Sm = ray.get(bref)
        ci = np.searchsorted(al, labels)
        ok = nc[ci] > 1  # singleton clusters: silhouette undefined
        if not ok.any():
            return None
        u, ci = u[ok], ci[ok]
        dots = u @ Sm.T                       # (m, L)
        m = len(ci)
        own = dots[np.arange(m), ci]
        a = 1.0 - (own - 1.0) / (nc[ci] - 1)
        d_all = 1.0 - dots / nc[None, :]
        d_all[np.arange(m), ci] = np.inf      # exclude own label
        b = d_all.min(axis=1)
        s = (b - a) / np.maximum(a, b)
        lab = al[ci]
        ul, inv = np.unique(lab, return_inverse=True)
        return (ul, np.bincount(inv).astype(np.int64),
                np.bincount(inv, weights=s))

    outs = [p for p in ray.get([score.remote(r) for r in refs]) if p]
    if not outs:
        return empty
    n_out = np.zeros(L, np.int64)
    s_sum = np.zeros(L)
    for ul, cnt, ssum in outs:
        ix = np.searchsorted(all_labels, ul)
        n_out[ix] += cnt
        s_sum[ix] += ssum
    keep = n_out > 0
    from .pairs import round_away
    return pd.DataFrame({
        "label": all_labels[keep].astype(np.int32),
        "n": n_out[keep],
        "mean_silhouette": round_away(s_sum[keep] / n_out[keep], 6)})


def q_matryoshka_recall(sf_dir: str, query_ids: tuple = tuple(range(8)),
                        k: int = 10,
                        dims: tuple = (64, 32, 16, 8)) -> pd.DataFrame:
    """Matryoshka / truncated-dimension retrieval eval — how much
    recall@k survives keeping only the first d coordinates of every
    embedding (the memory-for-recall trade hierarchical-embedding
    deployments make): for each d, brute-force top-k on the truncated
    renormalized vectors vs the full-dimension ground truth. One
    streamed scan per d with broadcast probes (q24's discipline — the
    corpus crosses nothing, per-batch top-k partials fold on the
    driver). Deterministic → rows-only + monotonicity pytest."""
    rows = []
    gt = None
    for d in dims:
        res = q_knn_bruteforce(sf_dir, query_ids=query_ids, k=k,
                               dim_slice=int(d))
        got = {q: set(g["neighbor_id"]) for q, g in
               res.groupby("query_id", sort=True)}
        if gt is None:
            gt = got          # first (largest) d IS the ground truth
        recalls = [len(got.get(q, set()) & s) / max(len(s), 1)
                   for q, s in sorted(gt.items())]
        rows.append((int(d), len(recalls),
                     round(float(np.mean(recalls)), 6)
                     if recalls else np.nan))
    return pd.DataFrame({
        "dim": pd.array([r[0] for r in rows], "int64"),
        "n_probes": pd.array([r[1] for r in rows], "int64"),
        "mean_recall": [r[2] for r in rows]})


def q_cluster_ari(sf_dir: str, k: int = 4,
                  iters: int = 2) -> pd.DataFrame:
    """Clustering-agreement eval: Adjusted Rand Index between q71's
    k-means assignment and the embedding LABELS — the
    external-validity twin of q237's internal silhouette (does the
    unsupervised structure recover the known classes?). The centroids
    come from q71's deterministic contract; ONE more streaming pass
    assigns vectors and pre-combines per-batch (cluster, label, n)
    contingency partials — k×L×batches rows fold on the driver, and
    ARI is exact-int pair counting with two float divisions. No SQL
    twin (k-means is iterative); the planted-blob pytest pins ARI=1
    and label-permutation invariance."""
    cents = q_kmeans(sf_dir, k=k, iters=iters)
    empty = pd.DataFrame({"n": pd.array([0], "int64"),
                          "ari": pd.array([np.nan], "float64")})
    if cents.empty:
        return empty
    d = int(cents["pos"].max())  # q71's pos is 1-based
    C = np.zeros((k, d))
    C[cents["cluster"].to_numpy(np.int64),
      cents["pos"].to_numpy(np.int64) - 1] = cents["c"].to_numpy(
        np.float64)
    import ray
    import ray.data as rd

    cref = ray.put(C)
    pool = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("embedding").is_valid()
                & pads.field("label").is_valid()
                & pads.field("vec_id").is_valid()))

    def contingency(t: pa.Table) -> pa.Table:
        E = pa.table({"cl": pa.array([], pa.int64()),
                      "lab": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "label" not in t.schema.names:
            return E
        labels = np.asarray(t.column("label").to_numpy(
            zero_copy_only=False), np.int64)
        _ids, mat = _batch_matrix(t.select(["vec_id", "embedding"]))
        if not len(labels):
            return E
        cm = ray.get(cref)
        d2 = ((mat[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        key = assign * (labels.max() + 1) + labels
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cl": pa.array((u // (labels.max() + 1)).astype(np.int64)),
            "lab": pa.array((u % (labels.max() + 1)).astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    parts = pool.map_batches(contingency,
                             batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    g = parts.groupby(["cl", "lab"], as_index=False).agg(n=("n", "sum"))
    nij = g["n"].to_numpy(np.int64)
    n = int(nij.sum())
    if n < 2:
        return pd.DataFrame({"n": pd.array([n], "int64"),
                             "ari": pd.array([np.nan], "float64")})
    a = g.groupby("cl")["n"].sum().to_numpy(np.int64)
    b = g.groupby("lab")["n"].sum().to_numpy(np.int64)
    sum_ij = int((nij * (nij - 1) // 2).sum())
    sum_a = int((a * (a - 1) // 2).sum())
    sum_b = int((b * (b - 1) // 2).sum())
    n2 = n * (n - 1) // 2
    exp = sum_a * sum_b / n2
    mx = (sum_a + sum_b) / 2.0
    ari = (sum_ij - exp) / (mx - exp) if mx != exp else np.nan
    return pd.DataFrame({"n": pd.array([n], "int64"),
                         "ari": np.round([ari], 6)})


def q_whitening_eval(sf_dir: str, eps: float = 1e-6) -> pd.DataFrame:
    """ZCA whitening of the embedding table with a self-certifying
    eval — the preprocessing step dense-retrieval stacks run so no
    principal direction dominates the dot products: (1) ONE streamed
    pass of per-batch covariance partials (n, Σx, centered outer-
    product Chan merge is unnecessary — dim is small, raw Σxxᵀ over
    mean-magnitude embeddings is well-conditioned, and both passes
    use the same accumulators so the eval is against the pipeline's
    own output); (2) driver eigendecomposition of the dim×dim matrix
    (the only non-distributed step — O(dim³), dim ≪ corpus);
    (3) a second streamed pass applies the broadcast W = V·diag(
    1/√(λ+eps))·Vᵀ and accumulates the whitened covariance. Reports
    how close that lands to identity (mean |diag−1|, max |off-diag|).
    Deterministic → rows-only; near-identity floor pinned by pytest."""
    ds = _emb(sf_dir)

    def cov_partial(t: pa.Table, W=None) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "sxx": pa.array([], pa.list_(pa.float64()))})
        X = np.asarray(t.column("embedding").to_pylist(), np.float64)
        if W is not None:
            X = X @ W
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "sxx": pa.array([(X.T @ X).ravel().tolist()],
                            pa.list_(pa.float64()))})

    def fold(parts: pd.DataFrame):
        n = int(parts["n"].sum())
        sx = np.sum(np.stack(parts["sx"].to_numpy()), axis=0)
        sxx = np.sum(np.stack(parts["sxx"].to_numpy()), axis=0)
        d = sx.size
        mu = sx / n
        cov = sxx.reshape(d, d) / n - np.outer(mu, mu)
        return n, cov

    p1 = ds.map_batches(cov_partial, batch_format="pyarrow").to_pandas()
    one = pd.DataFrame({"n": pd.array([0], "int64"),
                        "dim": pd.array([0], "int64"),
                        "diag_err": pd.array([np.nan], "float64"),
                        "offdiag_max": pd.array([np.nan], "float64")})
    if p1.empty:
        return one
    n, cov = fold(p1)
    lam, V = np.linalg.eigh(cov)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)) @ V.T

    p2 = ds.map_batches(cov_partial, batch_format="pyarrow",
                        fn_kwargs={"W": W}).to_pandas()
    _, cov_w = fold(p2)
    d = cov_w.shape[0]
    diag_err = float(np.abs(np.diag(cov_w) - 1.0).mean())
    off = cov_w - np.diag(np.diag(cov_w))
    return pd.DataFrame({
        "n": pd.array([n], "int64"),
        "dim": pd.array([d], "int64"),
        "diag_err": pd.array([round(diag_err, 6)], "float64"),
        "offdiag_max": pd.array([round(float(np.abs(off).max()), 6)],
                                "float64")})


def q_mmr_select(sf_dir: str, query_id: int = 0, pool: int = 50,
                 k: int = 10, lam: float = 0.7) -> pd.DataFrame:
    """Maximal Marginal Relevance selection — the diversity-aware
    re-ranker used to assemble eval/demo sets (greedy pick maximizing
    λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)): stage 1 streams the
    corpus once, each batch emitting its local top-``pool`` by cosine
    WITH the candidate unit vectors (pool×dim ≪ corpus — q24's
    broadcast-query discipline plus a small payload); the driver folds
    blocks×pool rows into the exact global pool (sim DESC, vec_id tie
    break) and runs the inherently sequential k-step greedy on the
    pool×pool similarity matrix. Deterministic → rows-only; diversity
    vs plain top-k pinned by pytest. The query vector itself is
    excluded from candidates."""
    qids, Q = _query_matrix(sf_dir, [query_id])
    empty = pd.DataFrame({"rank": pd.Series(dtype="int64"),
                          "vec_id": pd.Series(dtype="int64"),
                          "relevance": pd.Series(dtype="float64"),
                          "mmr_score": pd.Series(dtype="float64")})
    if not len(qids):
        return empty
    q = Q[0]

    _E = pa.table({"vec_id": pa.array([], pa.int64()),
                   "sim": pa.array([], pa.float64()),
                   "vec": pa.array([], pa.list_(pa.float64()))})

    def local_pool(t: pa.Table, qv: np.ndarray) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return _E
        ids, mat = _batch_matrix(t)
        if not len(ids):
            return _E
        keep = ids != query_id
        ids, mat = ids[keep], _unit(mat[keep])
        if not len(ids):
            return _E
        sims = mat @ qv
        idx = _topk_idx(sims, ids, pool)
        return pa.table({"vec_id": pa.array(ids[idx], pa.int64()),
                         "sim": pa.array(sims[idx], pa.float64()),
                         "vec": pa.array([v.tolist() for v in mat[idx]],
                                         pa.list_(pa.float64()))})

    parts = (_emb(sf_dir)
             .map_batches(local_pool, batch_format="pyarrow",
                          fn_kwargs={"qv": q}).to_pandas())
    if parts.empty:
        return empty
    order = np.lexsort((parts["vec_id"].to_numpy(np.int64),
                        -parts["sim"].to_numpy(np.float64)))[:pool]
    ids = parts["vec_id"].to_numpy(np.int64)[order]
    sims = parts["sim"].to_numpy(np.float64)[order]
    V = np.stack(parts["vec"].to_numpy()[order])
    S = V @ V.T  # pool×pool candidate similarities
    chosen: list = []
    picked_scores: list = []
    avail = np.ones(ids.size, bool)
    for _ in range(min(k, ids.size)):
        if chosen:
            red = S[:, chosen].max(axis=1)
        else:
            red = np.zeros(ids.size)
        score = lam * sims - (1.0 - lam) * red
        # deterministic: best marginal score, then smaller vec_id
        cand = np.flatnonzero(avail)
        best = cand[np.lexsort((ids[cand], -score[cand]))[0]]
        chosen.append(int(best))
        picked_scores.append(float(score[best]))  # at-selection value
        avail[best] = False
    return pd.DataFrame({
        "rank": pd.array(np.arange(1, len(chosen) + 1), "int64"),
        "vec_id": ids[chosen],
        "relevance": np.round(sims[chosen], 6),
        "mmr_score": np.round(np.array(picked_scores), 6)})


def q_hard_negatives(sf_dir: str, query_ids: tuple = (0, 1, 2, 3),
                     k: int = 5) -> pd.DataFrame:
    """Hard-negative mining — for each query embedding, the top-k most
    cosine-similar vectors whose LABEL differs (the contrastive-
    training staple: negatives the model most confuses). q24's
    broadcast-query streamed scan with a label mask per query; the
    exchange never carries more than k·batches candidate rows. A query
    with a NULL label emits no rows (SQL ``label <> NULL`` is NULL);
    NULL-label candidates are excluded the same way. The chosen
    neighbors' labels ride through the partials (int32, the parquet
    dtype — CLAUDE.md cast rule)."""
    import ray

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=(pc.field("vec_id").isin([int(q) for q in query_ids])
                & pc.field("embedding").is_valid()
                & pc.field("label").is_valid()),
        columns=["vec_id", "embedding", "label"]).sort_by("vec_id")
    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "rank": pd.Series(dtype="int64"),
                          "neighbor_id": pd.Series(dtype="int64"),
                          "neighbor_label": pd.Series(dtype="int32")})
    if t.num_rows == 0:
        return empty
    qids, qmat = _batch_matrix(t)
    qmat = _unit(qmat)
    qlab = t.column("label").to_numpy(zero_copy_only=False)
    qref = ray.put((qids, qmat, qlab))

    _E = pa.table({"query_id": pa.array([], pa.int64()),
                   "neighbor_id": pa.array([], pa.int64()),
                   "neighbor_label": pa.array([], pa.int32()),
                   "sim": pa.array([], pa.float64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qlab_ = ray.get(qref)
        lab_valid = pc.is_valid(batch.column("label"))
        if not pc.all(lab_valid).as_py():
            batch = batch.filter(lab_valid)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return _E
        lab = batch.filter(pc.is_valid(batch.column("embedding"))) \
                   .column("label").to_numpy(zero_copy_only=False)
        sims = _unit(mat) @ qmat_.T
        out_q, out_n, out_l, out_s = [], [], [], []
        for j, q in enumerate(qids_):
            neg = np.flatnonzero((lab != qlab_[j]) & (ids != q))
            if not len(neg):
                continue
            col = sims[neg, j]
            for i in _topk_idx(col, ids[neg], min(k, len(neg))):
                out_q.append(int(q))
                out_n.append(int(ids[neg][i]))
                out_l.append(int(lab[neg][i]))
                out_s.append(float(col[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "neighbor_label": pa.array(out_l, pa.int32()),
                         "sim": pa.array(out_s, pa.float64())})

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("embedding").is_valid())
    partials = ds.map_batches(local_topk,
                              batch_format="pyarrow").to_pandas()
    if partials.empty:
        return empty
    p = partials.sort_values(["query_id", "sim", "neighbor_id"],
                             ascending=[True, False, True])
    top = p.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(
        np.int64)
    out = top[["query_id", "rank", "neighbor_id",
               "neighbor_label"]].reset_index(drop=True)
    out["neighbor_label"] = out["neighbor_label"].astype(np.int32)
    return out


def q_label_mrr(sf_dir: str, query_ids: tuple = (0, 1, 2, 3, 4, 5, 6,
                                                 7)) -> pd.DataFrame:
    """Mean-reciprocal-rank retrieval eval with labels as relevance —
    for each probe, the rank of the FIRST same-label neighbor in
    cosine order (the standard leave-one-out retrieval metric when
    labels are the only ground truth). Exact at any scale WITHOUT a
    global sort: pass 1 streams per-batch best-same-label candidates
    (one row per query per batch); pass 2 counts, per query, the
    candidates ordered strictly before that winner ((sim, id)
    lexicographic — q24's tie rule), so first_rank = count + 1.
    Probes or candidates with NULL embedding/label drop on both
    sides; a probe with no same-label candidate emits no row."""
    import ray
    import ray.data as rd

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=(pc.field("vec_id").isin([int(q) for q in query_ids])
                & pc.field("embedding").is_valid()
                & pc.field("label").is_valid()),
        columns=["vec_id", "embedding", "label"]).sort_by("vec_id")
    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "first_rank": pd.Series(dtype="int64"),
                          "rr": pd.Series(dtype="float64")})
    if t.num_rows == 0:
        return empty
    qids, qmat = _batch_matrix(t)
    qmat = _unit(qmat)
    qlab = t.column("label").to_numpy(zero_copy_only=False)
    qref = ray.put((qids, qmat, qlab))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("embedding").is_valid()
                & pads.field("label").is_valid())).materialize()
    refs = ds.to_arrow_refs()

    def prep(batch: pa.Table):
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return None
        lab = batch.filter(pc.is_valid(batch.column("embedding"))) \
                   .column("label").to_numpy(zero_copy_only=False)
        return ids, _unit(mat), lab

    def best_same(batch: pa.Table):
        got = prep(batch)
        if got is None:
            return {}
        ids, mat, lab = got
        qids_, qmat_, qlab_ = ray.get(qref)
        sims = mat @ qmat_.T
        out = {}
        for j, q in enumerate(qids_):
            m = np.flatnonzero((lab == qlab_[j]) & (ids != q))
            if not len(m):
                continue
            col = sims[m, j]
            i = m[np.lexsort((ids[m], -col))[0]]
            out[int(q)] = (float(sims[i, j]), int(ids[i]))
        return out

    best: dict = {}
    for part in ray.get([ray.remote(best_same).remote(r)
                         for r in refs]):
        for q, (s, i) in part.items():
            if q not in best or (s, -i) > (best[q][0], -best[q][1]):
                best[q] = (s, i)
    if not best:
        return empty
    bref = ray.put(best)

    def count_before(batch: pa.Table):
        got = prep(batch)
        if got is None:
            return {}
        ids, mat, lab = got
        qids_, qmat_, _ = ray.get(qref)
        winners = ray.get(bref)
        sims = mat @ qmat_.T
        out = {}
        for j, q in enumerate(qids_):
            if int(q) not in winners:
                continue
            s_star, id_star = winners[int(q)]
            col = sims[:, j]
            mask = ids != q
            before = ((col > s_star)
                      | ((col == s_star) & (ids < id_star))) & mask
            out[int(q)] = int(before.sum())
        return out

    totals: dict = {q: 0 for q in best}
    for part in ray.get([ray.remote(count_before).remote(r)
                         for r in refs]):
        for q, c in part.items():
            totals[q] += c
    from .pairs import round_away

    rows = sorted((q, totals[q] + 1) for q in totals)
    return pd.DataFrame({
        "query_id": pd.array([q for q, _ in rows], "int64"),
        "first_rank": pd.array([r for _, r in rows], "int64"),
        "rr": round_away(np.array([1.0 / r for _, r in rows]), 6)})


def q_mahalanobis_outliers(sf_dir: str, k: int = 10,
                           eps: float = 1e-6) -> pd.DataFrame:
    """Top-k multivariate outliers by Mahalanobis distance — the
    covariance-aware anomaly screen (a point far along a LOW-variance
    direction outranks one equally far along a high-variance one,
    which plain L2 can't see). Same two-pass layout as the q269
    whitening eval: streamed covariance partials → dim×dim driver
    inverse via eigendecomposition → broadcast (μ, Σ⁻¹) second pass
    emitting per-batch local top-k (d², vec_id); the driver folds
    blocks×k rows. Deterministic → rows-only; a planted off-manifold
    point pins rank 1 in pytest."""
    import ray

    ds = _emb(sf_dir)

    def cov_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "sxx": pa.array([], pa.list_(pa.float64()))})
        X = np.asarray(t.column("embedding").to_pylist(), np.float64)
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "sxx": pa.array([(X.T @ X).ravel().tolist()],
                            pa.list_(pa.float64()))})

    p1 = ds.map_batches(cov_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"rank": pd.Series(dtype="int64"),
                          "vec_id": pd.Series(dtype="int64"),
                          "dist2": pd.Series(dtype="float64")})
    if p1.empty:
        return empty
    n = int(p1["n"].sum())
    sx = np.sum(np.stack(p1["sx"].to_numpy()), axis=0)
    sxx = np.sum(np.stack(p1["sxx"].to_numpy()), axis=0)
    d = sx.size
    mu = sx / n
    cov = sxx.reshape(d, d) / n - np.outer(mu, mu)
    lam, V = np.linalg.eigh(cov)
    Minv = V @ np.diag(1.0 / (np.maximum(lam, 0.0) + eps)) @ V.T
    bref = ray.put((mu, Minv))

    _E = pa.table({"vec_id": pa.array([], pa.int64()),
                   "dist2": pa.array([], pa.float64())})

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return _E
        mu_, M_ = ray.get(bref)
        ids, mat = _batch_matrix(t)
        if not len(ids):
            return _E
        Xc = mat - mu_
        d2 = np.einsum("ij,jk,ik->i", Xc, M_, Xc)
        idx = _topk_idx(d2, ids, min(k, len(ids)))
        return pa.table({"vec_id": pa.array(ids[idx], pa.int64()),
                         "dist2": pa.array(d2[idx], pa.float64())})

    parts = ds.map_batches(local_topk,
                           batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    order = np.lexsort((parts["vec_id"].to_numpy(np.int64),
                        -parts["dist2"].to_numpy(np.float64)))[:k]
    return pd.DataFrame({
        "rank": pd.array(np.arange(1, len(order) + 1), "int64"),
        "vec_id": parts["vec_id"].to_numpy(np.int64)[order],
        "dist2": np.round(parts["dist2"].to_numpy(np.float64)[order],
                          6)})


def q_pq_recall_eval(sf_dir: str,
                     query_ids: tuple = (0, 1, 2, 3, 4, 5, 6, 7),
                     k: int = 10, m: int = 8, ksub: int = 16
                     ) -> pd.DataFrame:
    """Product-quantization recall eval — the memory/recall trade of
    the standard ANN compression (split each unit vector into ``m``
    subspaces, k-means each to ``ksub`` codes → m bytes per vector):
    PQ-ADC retrieval (per-query lookup tables over the broadcast
    codebooks, asymmetric distance = Σ subspace table entries) scored
    against the exact q24 ground truth. The corpus streams twice —
    codebook training reads only the q26 seeded ≤2000-row sample;
    the eval pass quantizes AND scores each batch in one go, emitting
    per-batch top-k partials, so codes never materialize corpus-wide.
    Deterministic (seeded) → rows-only; determinism + sanity floor
    pinned by pytest."""
    import ray

    import pyarrow.parquet as pq_

    ds = _emb(sf_dir)
    n_rows = pq_.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    empty = pd.DataFrame({"n_probes": pd.Series(dtype="int64"),
                          "m_subspaces": pd.Series(dtype="int64"),
                          "mean_recall": pd.Series(dtype="float64")})
    if n_rows == 0:
        return empty
    gt = q_knn_bruteforce(sf_dir, query_ids=query_ids, k=k)
    if gt.empty:
        return empty
    qids, qmat = _query_matrix(sf_dir, query_ids)
    # deterministic hash sample, NOT ds.random_sample: Ray's sampler
    # is seeded per block, so dynamic block-split decisions under load
    # change WHICH rows it picks (observed flake) — a vec_id-hash
    # filter is block-layout-independent
    mod = max(1, n_rows // 2000)

    def pick(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        if not len(ids):
            return pa.table({"embedding": pa.array(
                [], pa.list_(pa.float64()))})
        keep = mix64(ids.view(np.uint64)) % np.uint64(mod) == 0
        return pa.table({"embedding": pa.array(
            [v.tolist() for v in mat[keep]],
            pa.list_(pa.float64()))})

    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    smat = _unit(smat)
    d = smat.shape[1]
    sub = d // m
    rng = np.random.default_rng(42)
    books = []
    for s in range(m):
        X = smat[:, s * sub:(s + 1) * sub]
        C = X[rng.choice(len(X), size=min(ksub, len(X)),
                         replace=False)].copy()
        for _ in range(5):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                mem = X[assign == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books.append(C)
    bref = ray.put((books, qids, _unit(qmat)))

    def local_topk(batch: pa.Table) -> pa.Table:
        books_, qids_, qmat_ = ray.get(bref)
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return _EMPTY_TOPK
        unit = _unit(mat)
        # quantize the batch once
        codes = np.empty((len(ids), len(books_)), np.int64)
        for s, C in enumerate(books_):
            X = unit[:, s * sub:(s + 1) * sub]
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        out_q, out_n, out_s = [], [], []
        for j, q in enumerate(qids_):
            # ADC tables: −||q_sub − c||² so larger = closer (reuse
            # the (sim DESC, id) top-k rule)
            score = np.zeros(len(ids))
            for s, C in enumerate(books_):
                qsub = qmat_[j, s * sub:(s + 1) * sub]
                tab = -((C - qsub) ** 2).sum(axis=1)
                score += tab[codes[:, s]]
            mask = ids != q
            cand = np.flatnonzero(mask)
            for i in _topk_idx(score[cand], ids[cand],
                               min(k, cand.size)):
                out_q.append(int(q))
                out_n.append(int(ids[cand][i]))
                out_s.append(float(score[cand][i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk,
                              batch_format="pyarrow").to_pandas()
    approx = _merge_topk(partials, k)
    gset = {q: set(g["neighbor_id"]) for q, g in
            gt.groupby("query_id", sort=True)}
    aset = {q: set(g["neighbor_id"]) for q, g in
            approx.groupby("query_id", sort=True)}
    recalls = [len(aset.get(q, set()) & s) / max(len(s), 1)
               for q, s in sorted(gset.items())]
    return pd.DataFrame({
        "n_probes": pd.array([len(recalls)], "int64"),
        "m_subspaces": pd.array([m], "int64"),
        "mean_recall": pd.array(
            [round(float(np.mean(recalls)), 6)], "float64")})


def q_ndcg_eval(sf_dir: str, query_ids: tuple = (0, 1, 2, 3, 4, 5, 6,
                                                 7),
                k: int = 10) -> pd.DataFrame:
    """NDCG-style ranking eval with labels as binary relevance: for
    each probe, the top-k cosine neighbors (q24's exact tie rule —
    sim DESC, id ASC), each row carrying rel = (label match), gain =
    rel / log2(rank + 1) and the running DCG — the per-rank form of
    the retrieval metric, emitted as ROWS so every float is a
    deterministic function of exact integers (rank, rel) and the
    cumulative sum runs ascending rank exactly like the oracle's
    sequential window. One streamed pass of per-batch local top-k
    partials with labels riding along; the driver merges
    k·n_batches·n_queries tiny rows. Probes or candidates with NULL
    embedding/label drop on both sides."""
    import ray
    import ray.data as rd

    from .pairs import round_away

    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "rank": pd.Series(dtype="int64"),
                          "neighbor_id": pd.Series(dtype="int64"),
                          "rel": pd.Series(dtype="int64"),
                          "gain": pd.Series(dtype="float64"),
                          "running_dcg": pd.Series(dtype="float64")})
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=(pc.field("vec_id").isin([int(q) for q in query_ids])
                & pc.field("embedding").is_valid()
                & pc.field("label").is_valid()),
        columns=["vec_id", "embedding", "label"]).sort_by("vec_id")
    if t.num_rows == 0:
        return empty
    qids, qmat = _batch_matrix(t)
    qmat = _unit(qmat)
    qlab = dict(zip(
        qids.tolist(),
        t.column("label").to_numpy(zero_copy_only=False).tolist()))
    qref = ray.put((qids, qmat))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("embedding").is_valid()
                & pads.field("label").is_valid())).materialize()

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(qref)
        valid = batch.filter(pc.is_valid(batch.column("embedding")))
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64()),
                             "lab": pa.array([], pa.int64())})
        lab = valid.column("label").to_numpy(zero_copy_only=False)
        sims = _unit(mat) @ qmat_.T
        out_q, out_n, out_s, out_l = [], [], [], []
        kk = min(k + 1, len(ids))
        for j, q in enumerate(qids_):
            col = sims[:, j]
            for i in _topk_idx(col, ids, kk):
                out_q.append(int(q))
                out_n.append(int(ids[i]))
                out_s.append(float(col[i]))
                out_l.append(int(lab[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64()),
                         "lab": pa.array(out_l, pa.int64())})

    partials = ds.map_batches(local_topk,
                              batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"]
                        != partials["neighbor_id"]]
    if not len(partials):
        return empty
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"],
        ascending=[True, False, True])
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    rel = (top["lab"].to_numpy(np.int64)
           == top["query_id"].map(qlab).to_numpy(np.int64))
    gain = np.where(rel,
                    1.0 / np.log2(top["rank"].to_numpy(np.int64) + 1),
                    0.0)
    dcg = (pd.Series(gain, index=top.index)
           .groupby(top["query_id"].to_numpy()).cumsum()
           .to_numpy())
    return pd.DataFrame({
        "query_id": top["query_id"].to_numpy(np.int64),
        "rank": top["rank"].to_numpy(np.int64),
        "neighbor_id": top["neighbor_id"].to_numpy(np.int64),
        "rel": rel.astype(np.int64),
        "gain": round_away(gain, 6),
        "running_dcg": round_away(dcg, 6)}).reset_index(drop=True)


def q_binary_hash_recall(sf_dir: str,
                         query_ids: tuple = tuple(range(8)),
                         k: int = 10) -> pd.DataFrame:
    """1-bit (sign) quantization eval — the most aggressive embedding
    compression in production use (32× smaller, Hamming-rankable with
    XOR+popcount): quantize every vector to its coordinate sign bits,
    rank candidates by Hamming distance to each probe's code (ties by
    id), and report recall@k against the exact cosine top-k (q24
    ground truth) plus the retrieved set's mean Hamming distance.
    Per-batch work is vectorized byte ops against the broadcast query
    codes (``np.packbits`` once per batch, XOR + POP-table popcount),
    local top-k partials only — the 8-byte-per-vector code path is
    exactly what scales to 10¹⁰ rows. Data-dependent by design → no
    SQL twin; the planted pytest pins perfect recall on sign-separable
    clusters."""
    import ray

    POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.int64)

    qids, qmat = _query_matrix(sf_dir, query_ids)
    empty = pd.DataFrame({"n_probes": pd.Series(dtype="int64"),
                          "mean_recall": pd.Series(dtype="float64"),
                          "mean_hamming": pd.Series(dtype="float64")})
    if len(qids) == 0:
        return empty
    qcodes = np.packbits(qmat > 0, axis=1)
    qref = ray.put((qids, qcodes))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qcodes_ = ray.get(qref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "ham": pa.array([], pa.int64())})
        codes = np.packbits(mat > 0, axis=1)
        out_q, out_n, out_h = [], [], []
        kk = min(k + 1, len(ids))
        for j, q in enumerate(qids_):
            ham = POP[codes ^ qcodes_[j][None, :]].sum(axis=1)
            order = np.lexsort((ids, ham))[:kk]
            for i in order:
                out_q.append(int(q))
                out_n.append(int(ids[i]))
                out_h.append(int(ham[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "ham": pa.array(out_h, pa.int64())})

    partials = _emb(sf_dir).map_batches(
        local_topk, batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"]
                        != partials["neighbor_id"]]
    if not len(partials):
        return empty
    partials = partials.sort_values(
        ["query_id", "ham", "neighbor_id"])
    top = partials.groupby("query_id", as_index=False).head(k)

    truth = q_knn_bruteforce(sf_dir, query_ids=query_ids, k=k)
    gt = {q: set(g["neighbor_id"]) for q, g in
          truth.groupby("query_id", sort=True)}
    got = {q: set(g["neighbor_id"]) for q, g in
           top.groupby("query_id", sort=True)}
    recalls = [len(got.get(q, set()) & s) / max(len(s), 1)
               for q, s in sorted(gt.items())]
    return pd.DataFrame({
        "n_probes": pd.array([len(recalls)], "int64"),
        "mean_recall": np.round([float(np.mean(recalls))], 6),
        "mean_hamming": np.round(
            [float(top["ham"].mean())], 6)})


def q_hubness(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Retrieval hubness census — the embedding-space pathology check
    (Radovanović et al.): with every point as a probe, N_k(x) = how
    many probes retrieve x in their exact top-k; a healthy space has
    a tight distribution, a hubby one grows heavy right tails (hubs)
    and a mass at zero (anti-hubs). Exact by construction: the probe
    set is the whole (valid) corpus run through q24's streamed
    brute-force scan (broadcast probe matrix, per-batch local top-k
    partials, q24's tie rule), then one occurrence fold and a
    histogram over exact ints. At 10¹⁰ rows the same op runs with a
    deterministic probe SAMPLE (md5 order) — the histogram is then an
    estimate; here the corpus is the embeddings DIM table, so the
    full quadratic scan is the documented contract."""
    t = pads.dataset(os.path.join(
        sf_dir, "embeddings.parquet")).to_table(
        filter=pc.field("embedding").is_valid(),
        columns=["vec_id"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    cols = {"k_occurrence": pd.Series(dtype="int64"),
            "n_points": pd.Series(dtype="int64")}
    if not len(ids):
        return pd.DataFrame(cols)
    res = q_knn_bruteforce(sf_dir, query_ids=tuple(int(i)
                                                   for i in ids),
                           k=k)
    occ = res.groupby("neighbor_id").size()
    kocc = occ.reindex(pd.Index(ids), fill_value=0).to_numpy(
        np.int64)
    u, n = np.unique(kocc, return_counts=True)
    return pd.DataFrame({"k_occurrence": u,
                         "n_points": n.astype(np.int64)})


def q_label_centroid_drift(sf_dir: str, P: int = 8) -> pd.DataFrame:
    """Per-label embedding centroid drift vs the global centroid —
    the segment-shift monitor a training-data pipeline runs per
    ingest batch (is one label's embedding mass moving away from the
    corpus?). Distributed moment shape: each block folds to per-label
    (count, Σvec) partials (np.add.at on label codes — embeddings
    never leave their block), one exchange keyed on label merges
    them, and the driver sees |labels| rows. The global centroid is
    the fold of the per-label sums (Σ_label Σvec / Σn — the oracle
    computes the same ratio from its per-label partials; float-sum
    association differs only in the last ulp, continuous-valued → 6dp
    round). Outputs cosine-to-global and L2 distance; zero-norm
    centroids yield NULL cosine. NULL embeddings are out of contract
    (flatten() would shift coordinates); NULL label is a group."""
    import ray

    from .pairs import hash_shuffle, round_away

    _LNULL = np.iinfo(np.int64).min

    _E = pa.table({"lab": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "s": pa.array([], pa.list_(pa.float64())),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"label", "embedding"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        valid = pc.is_valid(t.column("embedding"))
        t2 = t.filter(valid) if not pc.all(valid).as_py() else t
        if t2.num_rows == 0:
            return _E
        lab = pc.fill_null(t2.column("label").cast(pa.int64()),
                           _LNULL).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = t2.column("embedding").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(lab), -1).astype(np.float64)
        ul, codes = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), mat.shape[1]), np.float64)
        np.add.at(sums, codes, mat)
        cnt = np.bincount(codes, minlength=len(ul)).astype(np.int64)
        return pa.table({
            "lab": pa.array(ul),
            "n": pa.array(cnt),
            "s": pa.array(list(sums), pa.list_(pa.float64())),
            "bucket": pa.array(
                (ul.astype(np.uint64) % np.uint64(P))
                .astype(np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live)
        lab = df.column("lab").to_numpy(zero_copy_only=False)
        n = df.column("n").to_numpy(zero_copy_only=False)
        svecs = df.column("s").to_pylist()
        out: dict = {}
        for L, c, s in zip(lab, n, svecs):
            a = out.get(int(L))
            v = np.asarray(s, np.float64)
            if a is None:
                out[int(L)] = [int(c), v]
            else:
                a[0] += int(c)
                a[1] = a[1] + v
        return [(L, a[0], a[1]) for L, a in out.items()]

    from .relational import _read

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    rows = [r for p in parts for r in p]
    cols = {"label": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64"),
            "cos_to_global": pd.Series(dtype="float64"),
            "l2_to_global": pd.Series(dtype="float64")}
    if not rows:
        return pd.DataFrame(cols)
    rows.sort(key=lambda r: (r[0] == _LNULL, r[0]))
    gs = rows[0][2] * 0.0
    gn = 0
    for _, c, s in rows:
        gs = gs + s
        gn += c
    cg = gs / gn
    ng = float(np.dot(cg, cg))
    lab_o, n_o, cos_o, l2_o = [], [], [], []
    for L, c, s in rows:
        cl = s / c
        lab_o.append(np.nan if L == _LNULL else float(L))
        n_o.append(c)
        nl = float(np.dot(cl, cl))
        dot = float(np.dot(cl, cg))
        cos_o.append(dot / math.sqrt(nl * ng)
                     if nl > 0 and ng > 0 else np.nan)
        l2_o.append(math.sqrt(float(np.dot(cl - cg, cl - cg))))
    return pd.DataFrame({
        "label": np.array(lab_o, np.float64),
        "n": pd.array(n_o, "int64"),
        "cos_to_global": round_away(np.array(cos_o, np.float64), 6),
        "l2_to_global": round_away(np.array(l2_o, np.float64), 6)})


def q_mmr_rerank(sf_dir: str, pool: int = 20, k: int = 5,
                 lam: float = 0.7) -> pd.DataFrame:
    """Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    Goldstein) — the de-dup step between retrieval and an LLM context
    window: greedily pick k results maximizing λ·rel(q,d) −
    (1−λ)·max_{s∈S} sim(d,s). Two stages: (1) the candidate pool is
    a distributed cosine top-`pool` against the broadcast query (the
    q24 partial-top-k pattern — corpus streams, driver folds P·pool
    rows); (2) the greedy selection is inherently sequential over k
    steps × pool candidates — O(k·pool) on the driver by design,
    with the pool vectors fetched via one pushdown read. Query = the
    corpus's minimum vec_id (deterministic). No SQL twin (greedy
    sequential dependence); the planted-cluster pytest pins the
    diversification behavior. Ties break to the lower vec_id at both
    stages."""
    from ray.data.aggregate import Min

    ds = _emb(sf_dir)
    # deterministic query: the minimum vec_id (streamed min)
    agg = ds.aggregate(Min("vec_id"))
    qid = agg.get("min(vec_id)") if isinstance(agg, dict) else agg
    cols = {"rank": pd.Series(dtype="int64"),
            "vec_id": pd.Series(dtype="int64"),
            "rel": pd.Series(dtype="float64"),
            "mmr": pd.Series(dtype="float64")}
    if qid is None:
        return pd.DataFrame(cols)
    qids, qmat = _query_matrix(sf_dir, [int(qid)])
    if len(qids) == 0:
        return pd.DataFrame(cols)
    qv = _unit(qmat.astype(np.float64))[0]

    def topk_part(batch: pa.Table, q=None) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel": pa.array([], pa.float64())})
        um = _unit(mat)
        rel = um @ q
        keep = ids != int(qid)
        ids, rel = ids[keep], rel[keep]
        if len(ids) > pool:
            part = np.argpartition(-rel, pool - 1)[:pool]
            ids, rel = ids[part], rel[part]
        return pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                         "rel": pa.array(rel.astype(np.float64))})

    import functools
    parts = ds.map_batches(
        functools.partial(topk_part, q=qv),
        batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(cols)
    parts = (parts.sort_values("vec_id", kind="stable")
             .sort_values("rel", kind="stable", ascending=False)
             .head(pool))
    cand_ids = parts["vec_id"].to_numpy(np.int64)
    rels = parts["rel"].to_numpy(np.float64)
    vids, vmat = _query_matrix(sf_dir, [int(i) for i in cand_ids])
    lut = {int(v): i for i, v in enumerate(vids)}
    um = _unit(vmat.astype(np.float64))
    order = np.array([lut[int(i)] for i in cand_ids])
    um = um[order]
    sims = um @ um.T
    chosen: list = []
    avail = list(range(len(cand_ids)))
    out = []
    for step in range(min(k, len(avail))):
        best, best_s = None, -np.inf
        for i in avail:
            div = max((float(sims[i, j]) for j in chosen),
                      default=0.0)
            s = lam * float(rels[i]) - (1.0 - lam) * div
            if s > best_s or (s == best_s and best is not None
                              and cand_ids[i] < cand_ids[best]):
                best, best_s = i, s
        chosen.append(best)
        avail.remove(best)
        out.append((step + 1, int(cand_ids[best]),
                    float(rels[best]), float(best_s)))
    return pd.DataFrame({
        "rank": pd.array([r[0] for r in out], "int64"),
        "vec_id": pd.array([r[1] for r in out], "int64"),
        "rel": np.round([r[2] for r in out], 6),
        "mmr": np.round([r[3] for r in out], 6)})


def q_label_dispersion(sf_dir: str, P: int = 8) -> pd.DataFrame:
    """Within-label embedding dispersion: the mean pairwise cosine
    similarity of each label's vectors — the compactness/diversity
    diagnostic next to q371's centroid drift — computed WITHOUT pairs
    via the moment identity  mean_{i≠j} uᵢ·uⱼ = (‖Σu‖² − n)/(n(n−1))
    on unit-normalized vectors: each block contributes per-label
    (count, Σu) partials, one exchange on label, O(N·d) total work
    where the naive form is O(N²·d). Zero-norm vectors are excluded
    (not unit-normalizable; the oracle filters the same rows);
    singleton labels yield NULL. Float-vector sums are continuous-
    valued → 6dp round (q371 rule). NULL embedding out of contract;
    NULL label is a group."""
    from .pairs import hash_shuffle, round_away
    from .relational import _read

    _LNULL = np.iinfo(np.int64).min

    _E = pa.table({"lab": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "s": pa.array([], pa.list_(pa.float64())),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"label", "embedding"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        valid = pc.is_valid(t.column("embedding"))
        t2 = t.filter(valid) if not pc.all(valid).as_py() else t
        if t2.num_rows == 0:
            return _E
        lab = pc.fill_null(t2.column("label").cast(pa.int64()),
                           _LNULL).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = t2.column("embedding").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(lab), -1).astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        keep = norms > 0
        if not keep.any():
            return _E
        lab = lab[keep]
        um = mat[keep] / norms[keep][:, None]
        ul, codes = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), um.shape[1]), np.float64)
        np.add.at(sums, codes, um)
        cnt = np.bincount(codes, minlength=len(ul)).astype(np.int64)
        return pa.table({
            "lab": pa.array(ul),
            "n": pa.array(cnt),
            "s": pa.array(list(sums), pa.list_(pa.float64())),
            "bucket": pa.array(
                (ul.astype(np.uint64) % np.uint64(P))
                .astype(np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live)
        lab = df.column("lab").to_numpy(zero_copy_only=False)
        n = df.column("n").to_numpy(zero_copy_only=False)
        svecs = df.column("s").to_pylist()
        acc: dict = {}
        for L, c, s in zip(lab, n, svecs):
            a = acc.get(int(L))
            v = np.asarray(s, np.float64)
            if a is None:
                acc[int(L)] = [int(c), v]
            else:
                a[0] += int(c)
                a[1] = a[1] + v
        return [(L, a[0], a[1]) for L, a in acc.items()]

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    rows = [r for p in parts for r in p]
    cols = {"label": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64"),
            "mean_pairwise_cos": pd.Series(dtype="float64")}
    if not rows:
        return pd.DataFrame(cols)
    rows.sort(key=lambda r: (r[0] == _LNULL, r[0]))
    lab_o, n_o, d_o = [], [], []
    for L, c, s in rows:
        lab_o.append(np.nan if L == _LNULL else float(L))
        n_o.append(c)
        if c < 2:
            d_o.append(np.nan)
        else:
            ss = float(np.dot(s, s))
            d_o.append((ss - c) / (float(c) * (c - 1)))
    return pd.DataFrame({
        "label": np.array(lab_o, np.float64),
        "n": pd.array(n_o, "int64"),
        "mean_pairwise_cos": round_away(np.array(d_o, np.float64),
                                        6)})
