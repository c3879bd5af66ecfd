"""Data-layout operators: multi-dimensional clustering for pruned reads.

At 100 TB the dominant cost of a selective query is how many files its
predicate has to OPEN, not how fast each batch maps: a table laid out in
single-column order answers range predicates on that column with
near-perfect file pruning but touches EVERY file for a predicate on any
other column. Z-ORDER (Morton) interleaving spreads locality across two
dimensions, so a (user range × time range) box intersects O(√P) of P
partitions instead of all of them — the same layout trick Delta/Iceberg
``OPTIMIZE ZORDER BY`` applies, expressed here Ray-Data-first: one
vectorized key computation (``map_batches``), ONE ``Dataset.sort``
all-to-all (the documented, unavoidable exchange — layout IS a sort),
and a partitioned parquet write whose per-file min/max stats are exactly
what a reader prunes on.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_ZBITS = 16


def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave 16-bit lane: abcd… → a0b0c0d0… (uint64 in/out)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton/Z-order interleave of two 16-bit quantized dims."""
    return (_spread16(a) << np.uint64(1)) | _spread16(b)


def _quantize(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Map [lo, hi] → [0, 2^16) uniformly (constant column → 0)."""
    if hi <= lo:
        return np.zeros(len(v), np.uint64)
    q = ((v - lo) / (hi - lo) * float((1 << _ZBITS) - 1))
    return np.clip(q, 0, (1 << _ZBITS) - 1).astype(np.uint64)


def q_zorder_layout(sf_dir: str, partitions: int = 64) -> pd.DataFrame:
    """Re-cluster events by the Z-order of (user_id, hour) and report
    the per-partition [min, max] envelopes of BOTH dimensions — the
    exact metadata a reader prunes files on. Shape: parquet row-group
    stats give the global quantization bounds when present (one
    metadata read, no data pass; a distributed two-column min/max
    scan is the stats-less fallback), ``map_batches`` computes Morton
    keys vectorized, ONE
    ``Dataset.sort`` lays the table out (the one all-to-all this
    operator exists to spend), and the envelope stats come from a
    second vectorized pass over the sorted row index — the data itself
    is never collected. The pruning win is pinned by a pytest that
    runs a (user × hour) box over this layout vs a time-sorted one
    (z-order touches a small fraction of partitions, time-sort touches
    ~all). NULL user/ts rows are out of contract (dropped — a layout
    key needs both dims)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    path = os.path.join(sf_dir, "events.parquet")
    md = pq.read_metadata(path)
    cols = {"partition": pd.Series(dtype="int64"),
            "rows": pd.Series(dtype="int64"),
            "user_min": pd.Series(dtype="int64"),
            "user_max": pd.Series(dtype="int64"),
            "hour_min": pd.Series(dtype="int64"),
            "hour_max": pd.Series(dtype="int64")}
    if md.num_rows == 0:
        return pd.DataFrame(cols)

    ds = rd.read_parquet(path, columns=["user_id", "ts"])

    def keyed(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "hour": pa.array([], pa.int64()),
                          "z": pa.array([], pa.uint64())})
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return empty
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        if not pc.all(keep).as_py():
            t = t.filter(keep)
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        hrs = (t.column("ts").to_numpy(zero_copy_only=False)
               .astype("datetime64[s]").astype(np.int64) // 3600)
        return pa.table({"user_id": pa.array(u.astype(np.int64)),
                         "hour": pa.array(hrs),
                         "z": pa.array(morton2(
                             _quantize(u.astype(np.float64), *_UB),
                             _quantize(hrs.astype(np.float64), *_HB)))})

    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({c: pa.array([], pa.float64())
                             for c in ("ulo", "uhi", "hlo", "hhi")})
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        if not pc.all(keep).as_py():
            t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.float64())
                             for c in ("ulo", "uhi", "hlo", "hhi")})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        hrs = (t.column("ts").to_numpy(zero_copy_only=False)
               .astype("datetime64[s]").astype(np.int64) // 3600)
        return pa.table({"ulo": pa.array([float(u.min())]),
                         "uhi": pa.array([float(u.max())]),
                         "hlo": pa.array([float(hrs.min())]),
                         "hhi": pa.array([float(hrs.max())])})

    # quantization bounds: prefer the row-group statistics already in
    # hand — zero data movement; min/max commute with the monotone
    # floor hour derivation, and per-column stats (which exclude only
    # their OWN column's NULLs) can only WIDEN the bounds vs keyed()'s
    # both-valid filter, costing resolution, never correctness
    def _col_stats(name):
        rg0 = md.row_group(0)
        idx = next((i for i in range(rg0.num_columns)
                    if rg0.column(i).path_in_schema == name), None)
        if idx is None:
            return None
        ss = [md.row_group(g).column(idx).statistics
              for g in range(md.num_row_groups)]
        if not all(s is not None and s.has_min_max for s in ss):
            return None
        return min(s.min for s in ss), max(s.max for s in ss)

    ust, tst = _col_stats("user_id"), _col_stats("ts")
    if ust is not None and tst is not None:
        _UB = (float(ust[0]), float(ust[1]))
        _HB = tuple(float(pd.Timestamp(v).value // 3_600_000_000_000)
                    for v in tst)
    else:
        mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
        if mm.empty:
            return pd.DataFrame(cols)
        _UB = (float(mm["ulo"].min()), float(mm["uhi"].max()))
        _HB = (float(mm["hlo"].min()), float(mm["hhi"].max()))

    # materialize the sorted layout ONCE (it is this operator's whole
    # product — count() and the envelope pass would otherwise each
    # re-run the sort); blocks live in the object store, not the driver
    laid = ds.map_batches(keyed, batch_format="pyarrow").sort("z") \
        .materialize()

    # per-partition envelopes: equal-count row slices over the sorted
    # order — each batch reduces to (slice id, min/max per dim) rows
    n_total = laid.count()
    if n_total == 0:
        return pd.DataFrame(cols)
    per = max(1, -(-n_total // partitions))

    # NO drop_columns here: any map between materialize and
    # to_arrow_refs re-executes through the streaming executor, whose
    # default preserve_order=False can emit blocks in task-completion
    # order — the cumsum offsets below would then label z-sorted rows
    # with the wrong partition. Refs off the materialized dataset keep
    # the stored (sorted) bundle order zero-copy; envelope just
    # ignores the z column.
    def envelope(t: pa.Table, start: int) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                              ("partition", "rows", "user_min",
                               "user_max", "hour_min", "hour_max")})
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        h = t.column("hour").to_numpy(zero_copy_only=False)
        idx = np.arange(start, start + len(u))
        p = idx // per
        df = pd.DataFrame({"partition": p, "u": u, "h": h})
        g = df.groupby("partition").agg(
            rows=("u", "size"), user_min=("u", "min"),
            user_max=("u", "max"), hour_min=("h", "min"),
            hour_max=("h", "max"))
        return g.reset_index()

    # row offsets per block: walk block metadata driver-side (counts
    # only), then one task per block computes its slice envelopes
    import ray

    refs = laid.to_arrow_refs()
    nrows_r = ray.remote(lambda t: t.num_rows)
    counts = ray.get([nrows_r.remote(r) for r in refs])
    starts = np.concatenate(([0], np.cumsum(counts[:-1]).astype(np.int64)))
    env_r = ray.remote(envelope)
    parts = ray.get([env_r.remote(r, int(s))
                     for r, s in zip(refs, starts)])
    out = pd.concat([p for p in parts if len(p)], ignore_index=True)
    out = out.groupby("partition", as_index=False).agg(
        rows=("rows", "sum"), user_min=("user_min", "min"),
        user_max=("user_max", "max"), hour_min=("hour_min", "min"),
        hour_max=("hour_max", "max"))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("partition").reset_index(drop=True)
