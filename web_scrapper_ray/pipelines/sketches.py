"""Distributed sketches (SURVEY.md §2.5 "novel sketch" slot).

HyperLogLog distinct-count over a Ray Data custom ``AggregateFn``: each
block folds into a 2^p-register accumulator (vectorized ``maximum.at``),
Ray tree-merges accumulators across blocks (elementwise max — the
fixed-size sketch, not the data, crosses the wire), and ``finalize``
applies the classic bias/small-range corrections. At any corpus size the
shuffle payload is 2^p bytes per block — there is no driver-side scan
and no groupby materialization.

Hashing is ``mix64`` (pipelines/pairs.py) — deterministic across
workers/runs, unlike Python's per-process-salted ``hash()``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .pairs import factorize_strings, mix64

_P = 14                      # 2^14 = 16384 registers → ~0.8% typical error
_M = 1 << _P
_Q = 64 - _P


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0) via binary search —
    float log2 would misround near 2^53."""
    w = w.copy()
    bl = np.zeros(w.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        w[m] >>= np.uint64(s)
    return bl + (w != 0)


def hll_accumulate(regs: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Fold int64 keys into the register array (mutates + returns)."""
    h = mix64(keys.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(_Q)).astype(np.int64)
    w = h & np.uint64((1 << _Q) - 1)
    rho = (_Q - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if est <= 2.5 * _M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = _M * math.log(_M / zeros)
    return float(est)


def q_distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) over events via HLL(p=14).
    Deterministic (fixed hash), ~0.8% typical relative error — pinned by
    the error-bound pytest rather than a SQL oracle (a sketch can't
    value-match ``count(DISTINCT ...)``)."""
    import os

    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])

    def acc_block(regs: np.ndarray, block: pa.Table) -> np.ndarray:
        keys = block.column("user_id").to_numpy(zero_copy_only=False)
        return hll_accumulate(regs, keys)

    agg = AggregateFn(
        init=lambda _: np.zeros(_M, np.uint8),
        merge=np.maximum,
        accumulate_block=acc_block,
        finalize=lambda regs: int(round(hll_estimate(regs))),
        name="n_users_hll",
    )
    row = ds.aggregate(agg)
    return pd.DataFrame({"n_users_hll": [int(row["n_users_hll"])]})


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (bounded-state global top-k)
# ---------------------------------------------------------------------------

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5], np.uint64)


def _token_hash64(words) -> np.ndarray:
    """Stable 64-bit token hashes (blake2b — Python's hash() is
    per-process salted and must never cross workers)."""
    import hashlib

    return np.array([int.from_bytes(
        hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        for w in words], dtype=np.uint64)


def q_heavy_hitters_cms(sf_dir: str, k: int = 20, width: int = 8192,
                        depth: int = 4, cand: int = 64) -> pd.DataFrame:
    """Approximate global top-k keywords with BOUNDED state — the
    100 TB alternative to q13's exact top-k (whose shuffle carries one
    row per distinct word per batch, i.e. O(vocabulary)): each batch
    folds its token counts into a depth×width count-min sketch and
    nominates its local top-``cand`` words; merged state is the
    elementwise SUM of sketches plus the candidate union, so what
    crosses the wire is O(depth·width + cand) per batch regardless of
    vocabulary. Estimates = min over sketch rows (CMS never
    underestimates; overestimate ≤ e·N/width w.h.p.), top-k by
    (estimate DESC, word ASC). Tokenization matches q13 (ASCII \\w,
    lowered, len>2, non-stopword) so the two operators rank the same
    corpus identically when no sketch collision bites; approximate by
    design → rows-only driver check, exactness-vs-q13 and
    shard-mergeability are pytest'd. The cross-block merge is a Ray
    ``AggregateFn`` tree reduce — accumulator = (summed sketch,
    candidate-word union), so no process ever holds all per-block
    partials (the old driver-side ``to_pandas`` merge ingested
    O(blocks) × depth·width·8 bytes)."""
    from ray.data.aggregate import AggregateFn

    from .textops import _docs, keyword_counter

    ds = _docs(sf_dir, ["text"])

    def acc_block(acc, block: pa.Table):
        if block.num_rows == 0 or "text" not in block.schema.names:
            return acc
        counter = keyword_counter(block.column("text").to_pylist())
        if not counter:
            return acc
        words = list(counter)
        cnts = np.fromiter(counter.values(), np.int64, len(counter))
        base = _token_hash64(words)
        cms = np.empty((depth, width), np.int64)
        for i in range(depth):
            idx = (mix64(base ^ _CMS_SEEDS[i]) % np.uint64(width)).astype(np.int64)
            # counts stay far below 2^53 → bincount's float64 path is exact
            cms[i] = np.bincount(idx, weights=cnts, minlength=width).astype(np.int64)
        top = {w for w, _ in counter.most_common(cand)}
        # dict accumulator with a FLAT sketch, NOT a (2-D ndarray, set)
        # tuple: tuples and 2-D arrays trip a per-task
        # ArrowConversionError + pandas fallback (correct but noisy).
        # The dict DOES round-trip through an Arrow struct between map
        # and reduce, which hands merge plain LISTS back (set → list,
        # int64 array → list — where bare `+` would CONCATENATE) —
        # hence the np.asarray/set coercions in merge.
        cms = cms.reshape(-1)
        if acc is None:
            return {"cms": cms, "cand": top}
        return {"cms": np.asarray(acc["cms"], np.int64) + cms,
                "cand": set(acc["cand"]) | top}

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return {"cms": np.asarray(a["cms"], np.int64)
                       + np.asarray(b["cms"], np.int64),
                "cand": set(a["cand"]) | set(b["cand"])}

    agg = AggregateFn(init=lambda _: None, merge=merge,
                      accumulate_block=acc_block,
                      finalize=lambda acc: acc, name="cms")
    acc = (ds.aggregate(agg) or {}).get("cms")
    out_cols = {"word": pd.Series(dtype="object"),
                "est_n": pd.Series(dtype="int64")}
    if acc is None:
        return pd.DataFrame(out_cols)
    total = np.asarray(acc["cms"], np.int64).reshape(depth, width)
    cands = acc["cand"]
    cand_list = sorted(cands)
    base = _token_hash64(cand_list)
    est = np.full(len(cand_list), np.iinfo(np.int64).max, np.int64)
    for i in range(depth):
        idx = (mix64(base ^ _CMS_SEEDS[i]) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, total[i][idx])
    out = pd.DataFrame({"word": cand_list, "est_n": est})
    out = out.sort_values(["est_n", "word"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Histogram quantile sketch (bounded-state distributed percentiles)
# ---------------------------------------------------------------------------

_HIST_BINS = 8192


def q_value_quantile_sketch(sf_dir: str,
                            qs: tuple = (0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Approximate percentiles of ``events.value`` from a fixed-size
    histogram sketch — the third mergeable-sketch shape next to HLL
    (q59) and CMS (q65): bin bounds come from parquet column
    statistics (one metadata read; distributed min/max fallback when a
    writer omitted stats), each block folds into an int64 bin-count
    vector, Ray tree-merges by elementwise ADD, and finalize walks the
    cumulative histogram with linear interpolation inside the landing
    bin. Deterministic; value error ≤ one bin width = (max−min)/8192
    of the FINITE data range (pinned by the error-bound pytest —
    rank-exact answers live in q57's distributed selection). NULLs,
    NaNs and ±inf all drop (the sketch estimates the finite mass; a
    non-finite bound from parquet stats triggers one distributed
    finite-min/max pass); a constant column collapses to that
    constant."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    path = os.path.join(sf_dir, "events.parquet")
    md = pq.read_metadata(path)
    empty = pd.DataFrame({"q": pd.Series(dtype="float64"),
                          "value_est": pd.Series(dtype="float64")})
    if md.num_rows == 0:
        return empty
    idx = next(i for i in range(md.row_group(0).num_columns)
               if md.row_group(0).column(i).path_in_schema == "value")
    stats = [md.row_group(g).column(idx).statistics
             for g in range(md.num_row_groups)]
    ds = rd.read_parquet(path, columns=["value"])
    lo = hi = None
    if all(s is not None and s.has_min_max for s in stats):
        lo = float(min(s.min for s in stats))
        hi = float(max(s.max for s in stats))
    if lo is None or not (np.isfinite(lo) and np.isfinite(hi)):
        # stats absent, or ±inf in the data (stats bounds include inf
        # while the bins only hold the finite mass) — one distributed
        # pass for the FINITE min/max
        def finite_minmax(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            v = v[np.isfinite(v)]
            if not len(v):
                return pa.table({"lo": pa.array([], pa.float64()),
                                 "hi": pa.array([], pa.float64())})
            return pa.table({"lo": pa.array([float(v.min())]),
                             "hi": pa.array([float(v.max())])})

        mm = ds.map_batches(finite_minmax, batch_format="pyarrow").to_pandas()
        if mm.empty:  # no finite mass at all
            return empty
        lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    if hi <= lo:  # constant column — every quantile IS the constant
        return pd.DataFrame({"q": np.asarray(qs, np.float64),
                             "value_est": np.full(len(qs), lo)})
    width = (hi - lo) / _HIST_BINS

    def acc_block(h: np.ndarray, block: pa.Table) -> np.ndarray:
        v = block.column("value").to_numpy(zero_copy_only=False)
        v = v[np.isfinite(v)]
        if len(v):
            b = np.clip(((v - lo) / width).astype(np.int64),
                        0, _HIST_BINS - 1)
            h = h + np.bincount(b, minlength=_HIST_BINS)
        return h

    def finalize(h: np.ndarray) -> list:
        n = h.sum()
        if n == 0:
            return []
        cum = np.cumsum(h)
        out = []
        for q in qs:
            target = q * n
            # cum[-1] == n ≥ target for q ≤ 1, so b < _HIST_BINS
            b = int(np.searchsorted(cum, target))
            prev = cum[b - 1] if b else 0
            frac = (target - prev) / h[b] if h[b] else 0.0
            out.append(lo + (b + frac) * width)
        return out

    agg = AggregateFn(
        init=lambda _: np.zeros(_HIST_BINS, np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        finalize=finalize,
        name="quantiles",
    )
    vals = ds.aggregate(agg)["quantiles"]
    if not len(vals):
        return empty
    return pd.DataFrame({"q": np.asarray(qs, np.float64),
                         "value_est": np.asarray(vals, np.float64)})


def q_users_per_type_hll(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT user_id) — the grouped
    twin of q59: the ``AggregateFn`` accumulator is a {event_type →
    register array} dict, each block folds its (event_type, user_id)
    pairs into the per-type registers (vectorized: one ``maximum.at``
    per type seen in the block), and Ray TREE-merges accumulators
    across blocks (per-key elementwise max — types × 16 KB crosses the
    wire, never user ids, and never all blocks' partials in one
    process). NULL keys are out of contract (the exact-side comparison
    drops them). Deterministic (fixed mix64 hash); pinned by an
    error-bound pytest against the exact per-type distinct counts
    rather than a SQL oracle."""
    import os

    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])

    def acc_block(acc: dict, t: pa.Table) -> dict:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return acc
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(t.column("event_type")),
                       pc.is_valid(t.column("user_id")))
        if not pc.all(keep).as_py():
            t = t.filter(keep)
        if t.num_rows == 0:
            return acc
        codes, uniq = factorize_strings(t.column("event_type").to_pandas())
        keys = t.column("user_id").to_numpy(zero_copy_only=False)
        for ci, name in enumerate(uniq):
            regs = acc.get(name)
            if regs is None:
                regs = acc[name] = np.zeros(_M, np.uint8)
            hll_accumulate(regs, keys[codes == ci])
        return acc

    def merge(a: dict, b: dict) -> dict:
        # np.asarray: a dict accumulator can round-trip through an
        # Arrow struct block between map and reduce, handing back
        # plain lists for the register arrays
        for name, regs in b.items():
            regs = np.asarray(regs, np.uint8)
            cur = a.get(name)
            a[name] = regs if cur is None else np.maximum(
                np.asarray(cur, np.uint8), regs)
        return a

    agg = AggregateFn(
        init=lambda _: {},
        merge=merge,
        accumulate_block=acc_block,
        finalize=lambda acc: {n: int(round(hll_estimate(
            np.asarray(r, np.uint8)))) for n, r in acc.items()},
        name="per_type",
    )
    row = ds.aggregate(agg)
    ests = (row or {}).get("per_type") or {}
    names = sorted(ests)
    return pd.DataFrame({
        "event_type": names,
        "n_users_hll": np.array([ests[n] for n in names], np.int64)})


def q_sketch_accuracy(sf_dir: str) -> pd.DataFrame:
    """Sketch-accuracy evaluation — the error report a pipeline runs
    before trusting an approximate operator in production (q231's
    recall harness, applied to cardinality sketches): per event_type,
    the HLL estimate (q101) against the EXACT distinct user count, and
    the signed relative error. The exact side is one (type, user)
    exchange of per-batch deduped pairs (distinct pairs × batches
    cross the wire, never events); a pair's global dedup lives in one
    bucket, so per-type counts are additive bucket partials. Both
    sides are deterministic (fixed mix64 hash) → rows-only driver
    check + the error-bound pytest. Contract: NULL user/type out."""
    import pyarrow.compute as pc

    from .pairs import factorize_strings, hash_shuffle, round_away
    from .relational import _read

    P = 16

    _E = pa.table({"typ": pa.array([], pa.string()),
                   "user": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("event_type")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        df = pd.DataFrame({
            "typ": pd.Series(t2.column("event_type").to_pylist(),
                             dtype=object),
            "user": t2.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)})
        codes, uniq = factorize_strings(df["typ"])
        key = pd.DataFrame({"c": codes, "user": df["user"]})
        g = key.drop_duplicates()
        u = g["user"].to_numpy(np.int64)
        return pa.table({
            "typ": pa.array([uniq[c] for c in g["c"]], pa.string()),
            "user": pa.array(u),
            "bucket": pa.array((mix64(u.view(np.uint64))
                                & np.uint64(P - 1)).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"typ": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        from .pairs import coded_keys

        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["typ"])
        g = restore(cj.drop_duplicates()
                    .groupby("typ", as_index=False)
                    .agg(n=("user", "size")))
        g["n"] = g["n"].astype("int64")
        return g

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "user_id"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_exact": pd.Series(dtype="int64"),
                          "n_hll": pd.Series(dtype="int64"),
                          "rel_err": pd.Series(dtype="float64")})
    if not parts:
        return empty
    exact = (pd.concat(parts, ignore_index=True)
             .groupby("typ", as_index=False).agg(n=("n", "sum")))
    est = q_users_per_type_hll(sf_dir)
    # Python-dict lookup keyed by the FULL string — pandas merge on
    # object columns rides the NUL-terminated C-string hash
    # (CLAUDE.md rule; fuzz plants 'fz' / 'fz\x00nul' event types)
    emap = dict(zip(est["event_type"], est["n_users_hll"]))
    m = exact.rename(columns={"typ": "event_type", "n": "n_exact"})
    m["n_hll"] = np.array([int(emap.get(t, 0))
                           for t in m["event_type"]], np.int64)
    m["n_exact"] = m["n_exact"].astype("int64")
    m["rel_err"] = round_away(
        (m["n_hll"].to_numpy(np.float64)
         - m["n_exact"].to_numpy(np.float64))
        / m["n_exact"].to_numpy(np.float64), 6)
    return (m[["event_type", "n_exact", "n_hll", "rel_err"]]
            .sort_values("event_type").reset_index(drop=True))
