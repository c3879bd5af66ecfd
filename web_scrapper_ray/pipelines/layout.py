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


def q_range_partitioner(sf_dir: str, P: int = 8,
                        sample_k: int = 256) -> pd.DataFrame:
    """TeraSort-style sampled range partitioner over order totals —
    the layout primitive behind every distributed total-order sort:
    (1) a DETERMINISTIC sample (the sample_k orders with the lowest
    md5(orderkey) — per-batch local top-k partials, driver merge;
    q244's cross-language coin, so the splitters are identical on any
    partitioning), (2) splitters = the sample's P−1 quantile_disc
    cut points, (3) one range exchange routing every row to its
    splitter interval (searchsorted right), (4) per-partition
    manifests (n, exact min/max cents). The manifest IS the proof of
    global order: max(part i) ≤ min(part i+1). Non-finite prices and
    NULL keys are out of contract."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import _read
    from .pairs import hash_shuffle

    ds = _read(sf_dir, "orders", columns=["o_orderkey",
                                          "o_totalprice"])
    cols = {"part": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "mn_cents": pd.Series(dtype="int64"),
            "mx_cents": pd.Series(dtype="int64")}

    def prep(t: pa.Table):
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_orderkey")),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                         False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return None
        k = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        return k, cents

    # pass 1: deterministic md5 sample — per-batch local top-k
    def sample_partial(t: pa.Table) -> pa.Table:
        E = pa.table({"h": pa.array([], pa.string()),
                      "cents": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return E
        got = prep(t)
        if got is None:
            return E
        k, cents = got
        h = [hashlib.md5(str(x).encode()).hexdigest() for x in k]
        # tie-break by cents (duplicate orderkeys share the md5)
        o = np.lexsort((cents, np.array(h, dtype=object)))[:sample_k]
        return pa.table({"h": pa.array([h[i] for i in o],
                                       pa.string()),
                         "cents": pa.array(cents[o])})

    sm = ds.map_batches(sample_partial,
                        batch_format="pyarrow").to_pandas()
    if not len(sm):
        return pd.DataFrame(cols)
    sm = sm.sort_values(["h", "cents"]).head(sample_k)
    sv = np.sort(sm["cents"].to_numpy(np.int64))
    ns = len(sv)
    # splitters: quantile_disc(i/P) of the sample, i = 1..P-1
    cuts = np.array(sorted({int(sv[int(np.ceil(i / P * ns)) - 1])
                            for i in range(1, P)}), np.int64)

    def split(t: pa.Table) -> pa.Table:
        E = pa.table({"cents": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return E
        got = prep(t)
        if got is None:
            return E
        _, cents = got
        b = np.searchsorted(cuts, cents, side="right")
        return pa.table({"cents": pa.array(cents),
                         "bucket": pa.array(b.astype(np.int64))})

    def merge(*tabs) -> tuple:
        live = [x for x in tabs if x.num_rows]
        if not live:
            return (-1, 0, 0, 0)
        bid = int(live[0].column("bucket")[0].as_py())
        c = np.concatenate([x.column("cents").to_numpy()
                            for x in live])
        return (bid, len(c), int(c.min()), int(c.max()))

    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=len(cuts) + 1)
    rows = sorted(p for p in parts if p[0] >= 0)
    return pd.DataFrame({
        "part": pd.array([r[0] for r in rows], "int64"),
        "n": pd.array([r[1] for r in rows], "int64"),
        "mn_cents": pd.array([r[2] for r in rows], "int64"),
        "mx_cents": pd.array([r[3] for r in rows], "int64")})


def q_skew_advisor(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Shuffle-skew advisor for the user_id grouping key — before a
    32-way hash exchange, see exactly what each bucket would carry:
    rows, distinct keys and load share per bucket under the
    md5-prefix partitioner (the engine's cross-language deterministic
    hash, q297/q300). A hot key shows up as a bucket whose rows
    dwarf its key count — the signal to salt it. Per-batch
    (bucket, user, count) combiners → one bucket-keyed exchange
    (distinct users per bucket are global there) → the driver folds
    P three-int rows. Exact ints; one division per bucket. NULL
    user_id rows are out of contract."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pairs import hash_shuffle
    from .relational import _read

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("user_id")))
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uu, cc = np.unique(u, return_counts=True)
        b = np.array([int(hashlib.md5(str(x).encode())
                          .hexdigest()[:13], 16) % P for x in uu],
                     np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "c": pa.array(cc.astype(np.int64)),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> tuple:
        live = [x for x in tabs if x.num_rows]
        if not live:
            return (-1, 0, 0)
        bid = int(live[0].column("bucket")[0].as_py())
        df = pa.concat_tables(
            [x.drop_columns(["bucket"]) for x in live]).to_pandas()
        g = df.groupby("user_id")["c"].sum()
        return (bid, int(g.sum()), len(g))

    ds = _read(sf_dir, "events", columns=["user_id"])
    parts = sorted(p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if p[0] >= 0)
    cols = {"bucket": pd.Series(dtype="int64"),
            "n_rows": pd.Series(dtype="int64"),
            "n_keys": pd.Series(dtype="int64"),
            "load_share": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    tot = sum(p[1] for p in parts)
    from .pairs import round_away

    return pd.DataFrame({
        "bucket": pd.array([p[0] for p in parts], "int64"),
        "n_rows": pd.array([p[1] for p in parts], "int64"),
        "n_keys": pd.array([p[2] for p in parts], "int64"),
        "load_share": round_away(np.array(
            [float(p[1]) / tot for p in parts], np.float64), 6)})
