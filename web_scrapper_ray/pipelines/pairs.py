"""Shared candidate-pair verification scaffolding for the near-dup
operators (MinHash-LSH Jaccard verify, cosine-LSH verify).

Shape: the (small) candidate id-pair list is bucketed round-robin and
broadcast; candidate payload rows stream out of a pushdown read and are
replicated into each pair-bucket that references them (replication
factor = the id's distinct-bucket degree, ~1-2); every bucket verifies
its own pairs inside ``map_groups``. Work and memory scale with
|candidates|, never with the corpus.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def mix64(key: np.ndarray) -> np.ndarray:
    """Deterministic splitmix64-style integer mix (no Python hash() —
    per-process salting would break cross-worker bucketing)."""
    key = key.astype(np.uint64)
    key = (key ^ (key >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    key = (key ^ (key >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return key ^ (key >> np.uint64(31))


def round_away(a, ndigits: int) -> np.ndarray:
    """SQL/DuckDB ``round()``: half AWAY from zero. np.round / builtin
    round are half-to-even, which flips any value sitting exactly on
    the half boundary at the target precision (seen live: q86's
    35281.1282745 µs-grid mean and q91's 33.48125 Flesch score round
    DOWN under banker's rounding, UP in DuckDB). Mirrors DuckDB's
    ``std::round(x * 10^d) / 10^d`` op-for-op; NaN/±inf pass through,
    and values whose |x|·10^d overflows pass through UNCHANGED like
    DuckDB (probed: round(1e308::DOUBLE, 2) = 1e308, not inf)."""
    a = np.asarray(a, dtype=np.float64)
    f = 10.0 ** ndigits
    with np.errstate(over="ignore", invalid="ignore"):
        ax = np.abs(a) * f
        fl = np.floor(ax)
        r = np.where(ax - fl >= 0.5, fl + 1.0, fl)
        out = np.sign(a) * r / f
    return np.where(np.isfinite(ax), out, a)


def str_u64(s: str) -> int:
    """Stable 64-bit string hash (blake2b, big-endian) for cross-worker
    bucketing — Python's ``hash()`` is per-process salted and pandas'
    string hash table truncates at embedded NULs."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                        digest_size=8).digest(), "big")


def md5_coin_mask(values, p: float) -> np.ndarray:
    """Deterministic per-key Bernoulli(p) coin, the house pattern:
    ``int(md5(str(v))[:13], 16) < floor(p·2^52)`` — SQL twin
    ``('0x'||substr(md5(v::VARCHAR),1,13))::BIGINT < floor(p·2^52)``
    (probed identical; BIGINT::VARCHAR prints the same decimal string
    str() does). 52-bit thresholds stay exact in both float worlds;
    NULL/NaN keys draw False (SQL: md5(NULL) is NULL → predicate
    NULL → row out). Used by the sampled-oracle contracts (bounded
    sf1 twins of the quadratic-oracle queries)."""
    import hashlib

    thr = int(p * (1 << 52))
    out = np.zeros(len(values), bool)
    for i, v in enumerate(values):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        out[i] = int(hashlib.md5(
            str(v).encode()).hexdigest()[:13], 16) < thr
    return out


def coin_filter(col: str, p: float, drop: bool = False):
    """``map_batches`` stage keeping rows whose ``col`` passes
    :func:`md5_coin_mask` (the sampled-oracle input restriction);
    ``drop=True`` removes the coin column afterwards when it is not
    part of the query's own contract."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows and col in t.schema.names:
            m = md5_coin_mask(t.column(col).to_pylist(), p)
            t = t.filter(pa.array(m))
        if drop and col in t.schema.names:
            t = t.drop_columns([col])
        return t
    return fn


def sql_coin(expr: str, p: float) -> str:
    """SQL twin of :func:`md5_coin_mask` for ``expr`` (a VARCHAR-
    castable column): exact-integer 52-bit threshold compare."""
    thr = int(p * (1 << 52))
    return (f"('0x' || substr(md5(({expr})::VARCHAR), 1, 13))::BIGINT"
            f" < {thr}")


def factorize_strings(values, use_na_sentinel: bool = True):
    """``pd.factorize`` twin that keys on FULL string bytes.

    pandas' StringHashTable hashes object strings as NUL-terminated C
    strings, so ``factorize(['a\\x00b', 'a'])`` silently merges the two
    keys (probed; same for groupby / drop_duplicates on string
    columns). DuckDB keys exactly on the bytes ('a' < 'a\\x00b' as
    distinct groups, probed) — parity-relevant wherever a group key can
    carry a NUL. Fast path is plain pd.factorize; only when a NUL is
    actually present does the escape path factorize a hex encoding and
    map codes back to the ORIGINAL first-occurrence uniques."""
    s = values if isinstance(values, pd.Series) else pd.Series(values,
                                                               dtype=object)
    mask = s.notna()
    has_nul = bool(mask.any()) and bool(
        s[mask].str.contains("\x00", regex=False).any())
    if not has_nul:
        return pd.factorize(s, use_na_sentinel=use_na_sentinel)
    trans = s.where(~mask, s[mask].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()))
    codes, _ = pd.factorize(trans, use_na_sentinel=use_na_sentinel)
    ucodes, first_idx = np.unique(codes, return_index=True)
    if use_na_sentinel:
        first_idx = first_idx[ucodes >= 0]
    # codes are assigned in first-appearance order, so code i's first
    # occurrence position recovers the original string for slot i
    uniques = pd.Index(s.to_numpy(dtype=object)[first_idx], dtype=object)
    return codes, uniques


def coded_keys(df: pd.DataFrame, cols: list[str]):
    """NUL-safe pandas groupby adapter: returns ``(df2, restore)`` where
    ``df2`` has each string key column in ``cols`` replaced by full-byte
    int codes (``factorize_strings``, NULL keys keep their own code) and
    ``restore(out)`` maps those code columns in a result frame back to
    the original strings (``None`` for the NULL key).

    Use this for ANY driver-side groupby/drop_duplicates on a string
    key: pandas' StringHashTable hashes object strings as NUL-terminated
    C strings and silently merges ``'a'`` with ``'a\\x00b'`` (CLAUDE.md
    parity trap) — grouping on int codes sidesteps it."""
    df2 = df.copy()
    luts: dict[str, np.ndarray] = {}
    for c in cols:
        codes, uniq = factorize_strings(df[c], use_na_sentinel=False)
        df2[c] = codes
        lut = np.array(
            [None if u is None or (isinstance(u, float) and np.isnan(u))
             else u for u in np.asarray(uniq, dtype=object)], dtype=object)
        luts[c] = lut

    def restore(out: pd.DataFrame) -> pd.DataFrame:
        out = out.copy()
        for c, lut in luts.items():
            if c in out.columns and len(out):
                out[c] = pd.Series(
                    lut[out[c].to_numpy().astype(np.int64)],
                    index=out.index, dtype=object)
            elif c in out.columns:
                out[c] = out[c].astype(object)
        return out

    return df2, restore


def hash_shuffle(inputs: list, split_fn: Callable, merge_fn: Callable,
                 P: int = 32, gather: bool = True) -> list:
    """Raw-task hash exchange shared by the near-dup/set-op operators:
    one split task per input block computes its rows and an int
    ``bucket`` column in [0, P) (``split_fn(block, *extra) →
    pa.Table``), the scaffold sorts/slices them into P bucket slices
    (``ray.remote(num_returns=P)``), and one merge task per bucket
    gathers its slices (``merge_fn(*tables) → result``). Identical data
    movement to ``Dataset.groupby(bucket)`` without the sort-based
    all-to-all's fixed coordination latency (~4s in local mode at any
    size — see CLAUDE.md); at cluster scale it is the same one-exchange
    pattern the wave crawl uses for its refs layout.

    ``inputs``: list of (block_ref, extra_args_tuple). Returns the list
    of merge results (small by contract — pair lists / membership rows)
    — or, with ``gather=False``, the list of per-bucket ObjectRefs so a
    caller whose merge outputs are NOT small (e.g. q67's distinct edge
    set) can chain further tasks without the data ever transiting the
    driver heap.
    """
    import ray

    def split_task(block: pa.Table, *extra) -> tuple:
        tbl = split_fn(block, *extra)
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(P + 1))
        parts = tuple(
            tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
               .combine_chunks()
            for i in range(P)
        )
        # num_returns=1 stores the whole return value as ONE object —
        # return the bare table so the merge task sees a pa.Table
        return parts[0] if P == 1 else parts

    split_r = ray.remote(num_returns=P)(split_task)
    merge_r = ray.remote(merge_fn)
    per_block = [split_r.remote(ref, *extra) for ref, extra in inputs]
    if P == 1:  # num_returns=1 yields a bare ObjectRef, not a 1-tuple
        per_block = [(pb,) for pb in per_block]
    futs = [merge_r.remote(*[pb[b] for pb in per_block]) for b in range(P)]
    return ray.get(futs) if gather else futs


def verify_pairs(ds, pairs: np.ndarray,
                 payload_fn: Callable[[pa.Table], tuple],
                 verify_fn: Callable[[dict, np.ndarray], pd.DataFrame],
                 empty: pd.DataFrame,
                 payload_type: pa.DataType,
                 pairs_per_bucket: int = 64) -> pd.DataFrame:
    """Distributed verify of an (n, 2) int64 candidate id-pair array.

    ``ds``          — Ray Dataset of the candidate rows only (caller
                      applies the pushdown id filter and column prune).
    ``payload_fn``  — pa.Table batch → (ids ndarray, list of payload
                      objects) e.g. texts or unit vectors; never called
                      on empty blocks.
    ``verify_fn``   — ({id: payload}, bucket's pair array) → DataFrame
                      of surviving pairs (typed; may be empty).
    ``empty``       — the typed empty result frame.
    ``payload_type``— arrow type of a payload element, so empty and
                      non-empty replicate outputs share one schema
                      (a pushdown-filtered read can yield zero-row
                      blocks whose inferred null type would otherwise
                      lean on version-fragile concat promotion).
    """
    import ray

    pairs = pairs.astype(np.int64)
    P = max(1, min(64, (len(pairs) + pairs_per_bucket - 1) // pairs_per_bucket))
    pbucket = np.arange(len(pairs), dtype=np.int64) % P  # balanced
    id_buckets: dict[int, list] = {}
    for (a, b), p in zip(pairs, pbucket):
        for v in (int(a), int(b)):
            lst = id_buckets.setdefault(v, [])
            if int(p) not in lst:
                lst.append(int(p))
    pairs_by_bucket = {p: pairs[pbucket == p] for p in range(P)}
    bref = ray.put((id_buckets, pairs_by_bucket))

    def replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "pair_id": pa.array([], pa.int64()),
                             "payload": pa.array([], payload_type)})
        ib, _ = ray.get(bref)
        ids, payloads = payload_fn(batch)
        out_b, out_id, out_p = [], [], []
        for i, v in enumerate(ids):
            for p in ib.get(int(v), ()):
                out_b.append(p)
                out_id.append(int(v))
                out_p.append(payloads[i])
        return pa.table({"bucket": pa.array(out_b, pa.int32()),
                         "pair_id": pa.array(out_id, pa.int64()),
                         "payload": pa.array(out_p, payload_type)})

    def verify(g: pa.Table) -> pd.DataFrame:
        _, pb = ray.get(bref)
        payload = dict(zip(
            (int(v) for v in g.column("pair_id").to_pylist()),
            g.column("payload").to_pylist()))
        out = verify_fn(payload, pb[g.column("bucket")[0].as_py()])
        return out if len(out) else empty

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
        .to_pandas()
    )


def tree_sum(ds, block_to_vec: Callable, name: str = "total"):
    """Ungrouped ``Dataset.aggregate`` that TREE-merges additive numpy
    accumulators: each block folds to one float64 vector via
    ``block_to_vec`` (return None for a no-contribution block — empty
    or schema-less), merge is elementwise ``+``, so only the
    fixed-size vector crosses the wire and no process ever holds all
    per-block partials at once (the driver-side ``to_pandas`` merge
    this replaces ingests O(blocks) partials — real memory at 10^5
    blocks × a d² Gram partial). Association order may differ run to
    run; callers round oracle-compared floats (6dp) as usual. Returns
    the summed vector, or None when nothing contributed."""
    from ray.data.aggregate import AggregateFn

    def acc(a, block):
        v = block_to_vec(block)
        if v is None:
            return a
        v = np.asarray(v, np.float64)
        return v if a is None else a + v

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        # np.asarray: accumulators can round-trip through Arrow blocks
        # between map and reduce; a plain-list round-trip would make
        # bare `+` CONCATENATE instead of add
        return np.asarray(a, np.float64) + np.asarray(b, np.float64)

    agg = AggregateFn(init=lambda _: None, merge=merge,
                      accumulate_block=acc, finalize=lambda a: a,
                      name=name)
    row = ds.aggregate(agg)
    out = (row or {}).get(name)
    return None if out is None else np.asarray(out, np.float64)
