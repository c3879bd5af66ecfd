"""Distributed rank statistics: Spearman correlation, Mann-Whitney U,
two-sample Kolmogorov-Smirnov — classical nonparametric tests whose
common primitive is the GLOBAL mid-rank with ties.

The shared exchange is counts-per-distinct-value (``pairs.hash_shuffle``
on the value's bit pattern): every block emits (value, per-side counts)
partials, buckets fold them, and the driver sorts the distinct values
once.  Mid-ranks, CDFs and tie corrections are then pure prefix-sum
arithmetic over the distinct array — rows never leave their blocks, so
the exchange volume is O(#distinct values), not O(rows).  Partitioning
assumption: the distinct-value set fits on the driver (monetary 2dp
grids, timestamps, bounded sensor ranges).  For an unbounded continuous
column at 100 TB the same plan holds with the driver fold replaced by a
range-partitioned prefix pass (q143's sorted-prefix-sum machinery).

Parity contracts (CLAUDE.md): values are filtered to finite on BOTH
sides (DuckDB corr/stddev RAISE on NaN/inf); -0.0 is normalized to
+0.0 (SQL groups them together, float bit-keys don't); mid-ranks are
kept as 2·rank integers so centered products are exact; `round_away`
on every oracle-compared float.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .pairs import hash_shuffle, round_away
from .relational import _read

_U64 = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(v: np.ndarray, P: int) -> np.ndarray:
    """Deterministic bucket of a float64 value's bit pattern (zeros
    pre-normalized) — never Python hash() (per-process salt)."""
    bits = v.view(np.uint64)
    h = (bits ^ (bits >> np.uint64(33))) * _U64
    return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)


def _norm_zero(v: np.ndarray) -> np.ndarray:
    """-0.0 -> +0.0 so bit-pattern keys group like SQL equality."""
    v = np.asarray(v, np.float64)
    if (v == 0.0).any():
        v = np.where(v == 0.0, 0.0, v)
    return v


_E2 = pa.table({"v": pa.array([], pa.float64()),
                "c1": pa.array([], pa.int64()),
                "c2": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64())})


def _count_split(v: np.ndarray, g1: np.ndarray, P: int) -> pa.Table:
    """Per-block (value, side counts) partial over finite values."""
    if v.size == 0:
        return _E2
    u, inv = np.unique(v, return_inverse=True)
    c1 = np.bincount(inv, weights=g1.astype(np.float64),
                     minlength=u.size).astype(np.int64)
    call = np.bincount(inv, minlength=u.size).astype(np.int64)
    return pa.table({"v": pa.array(u),
                     "c1": pa.array(c1),
                     "c2": pa.array(call - c1),
                     "bucket": pa.array(_bucket_of(u, P))})


def _count_merge(*tabs) -> pd.DataFrame:
    live = [t.drop_columns(["bucket"]) for t in tabs if t.num_rows]
    if not live:
        return pd.DataFrame({"v": pd.Series(dtype="float64"),
                             "c1": pd.Series(dtype="int64"),
                             "c2": pd.Series(dtype="int64")})
    df = pa.concat_tables(live).to_pandas()
    # float64 group keys: exact (bit patterns already zero-normalized,
    # NaN excluded upstream) — no string hashing involved
    return df.groupby("v", as_index=False).agg(c1=("c1", "sum"),
                                               c2=("c2", "sum"))


def _fold_counts(parts: list) -> pd.DataFrame:
    live = [p for p in parts if len(p)]
    if not live:
        return pd.DataFrame({"v": pd.Series(dtype="float64"),
                             "c1": pd.Series(dtype="int64"),
                             "c2": pd.Series(dtype="int64")})
    return (pd.concat(live, ignore_index=True)
            .sort_values("v").reset_index(drop=True))


def _two_type_extract(t: pa.Table, a: str, b: str):
    """events rows of type a/b with finite values -> (v, is_a)."""
    if t.num_rows == 0 or "event_type" not in t.schema.names:
        return None
    et = t.column("event_type")
    keep = pc.and_kleene(
        pc.or_kleene(pc.equal(et, a), pc.equal(et, b)),
        pc.fill_null(pc.is_finite(t.column("value")), False))
    t2 = t.filter(pc.fill_null(keep, False))
    if t2.num_rows == 0:
        return None
    v = _norm_zero(t2.column("value").to_numpy(zero_copy_only=False))
    g1 = pc.equal(t2.column("event_type"), a).to_numpy(
        zero_copy_only=False)
    return v, np.asarray(g1, bool)


def q_mannwhitney(sf_dir: str, a: str = "click",
                  b: str = "purchase") -> pd.DataFrame:
    """Mann-Whitney U rank-sum test: does 'click' value stochastically
    dominate 'purchase' value?  One counts-per-distinct exchange; the
    rank sum R1 = Σ_v c1(v)·midrank(v) and the tie correction
    Σ(t³−t) are prefix-sum arithmetic on the distinct array.  2·midrank
    is an integer (2·#less + #equal + 1) so R1 is exact in int64.
    z uses the tie-corrected normal approximation; a fully-tied sample
    (variance 0) or n<2 yields SQL NULL (division by zero) — mirrored
    as NaN."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        ex = _two_type_extract(t, a, b)
        return _E2 if ex is None else _count_split(*ex, P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    n1 = int(c["c1"].sum())
    n2 = int(c["c2"].sum())
    n = n1 + n2
    if n == 0:
        return pd.DataFrame({"n1": pd.array([0], "int64"),
                             "n2": pd.array([0], "int64"),
                             "u1": [np.nan], "z": [np.nan]})
    cnt = (c["c1"] + c["c2"]).to_numpy(np.float64)
    less = np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
    mr2 = 2.0 * less + cnt + 1.0  # 2·midrank, exact integers
    r1 = 0.5 * float((c["c1"].to_numpy(np.float64) * mr2).sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    tsum = float((cnt ** 3 - cnt).sum())
    z = np.nan
    if n > 1:
        var = n1 * n2 / 12.0 * ((n + 1) - tsum / (n * (n - 1.0)))
        if var > 0:
            z = (u1 - n1 * n2 / 2.0) / np.sqrt(var)
    return pd.DataFrame({
        "n1": pd.array([n1], "int64"),
        "n2": pd.array([n2], "int64"),
        "u1": round_away(np.array([u1]), 6),
        "z": round_away(np.array([z]), 6)})


def q_ks_distance(sf_dir: str, a: str = "click",
                  b: str = "purchase") -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types: D = max over the pooled distinct
    values of |F̂_a − F̂_b|.  Same counts-per-distinct exchange; both
    empirical CDFs are cumsums over the sorted distinct array.  Empty
    sides give SQL NULL (0/NULL division) — mirrored as NaN."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        ex = _two_type_extract(t, a, b)
        return _E2 if ex is None else _count_split(*ex, P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    n1 = int(c["c1"].sum())
    n2 = int(c["c2"].sum())
    d = np.nan
    if n1 > 0 and n2 > 0:
        f1 = np.cumsum(c["c1"].to_numpy(np.float64)) / n1
        f2 = np.cumsum(c["c2"].to_numpy(np.float64)) / n2
        d = float(np.abs(f1 - f2).max())
    return pd.DataFrame({
        "n1": pd.array([n1], "int64"),
        "n2": pd.array([n2], "int64"),
        "d": round_away(np.array([d]), 6)})


def q_spearman_orders(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between order total price and order
    date (is spend drifting over time?).  Two stages:

    1. counts-per-distinct exchange for EACH axis (one hash_shuffle,
       the dim tag rides along) → driver builds sorted distinct arrays
       with 2·midrank prefix integers;
    2. broadcast both rank maps (``ray.put`` once) and stream the rows
       again — each batch searchsorted-maps its values to centered
       integer ranks aₓ = 2rₓ−(n+1) and emits 3 scalar partials
       (Σaₓa_y, Σaₓ², Σa_y²).  ρ = Σaₓa_y / √(Σaₓ²·Σa_y²), exact
       centering because mid-rank sums are always n(n+1)/2.

    Timestamps ride as epoch µs in float64 (exact below 2^53 —
    pre-1970 included); ties get identical mid-ranks on both sides.
    Constant axes (variance 0) yield SQL NULL → NaN."""
    import ray

    P = 8
    # column order must match the real split output (v,c1,c2,bucket,
    # then the appended dim) — pa.concat_tables in the merge is
    # order-sensitive across split tasks
    _E = pa.table({"v": pa.array([], pa.float64()),
                   "c1": pa.array([], pa.int64()),
                   "c2": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64()),
                   "dim": pa.array([], pa.int8())})

    def extract(t: pa.Table):
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return None
        keep = pc.and_kleene(
            pc.fill_null(pc.is_finite(t.column("o_totalprice")), False),
            pc.is_valid(t.column("o_orderdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return None
        x = _norm_zero(t2.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        y = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return x, y

    def split(t: pa.Table) -> pa.Table:
        ex = extract(t)
        if ex is None:
            return _E
        outs = []
        for dim, v in enumerate(ex):
            p = _count_split(v, np.zeros(v.size, bool), P)
            outs.append(p.append_column(
                "dim", pa.array(np.full(p.num_rows, dim, np.int8))))
        return pa.concat_tables(outs)

    def merge(*tabs) -> pd.DataFrame:
        live = [t.drop_columns(["bucket"]) for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({"v": pd.Series(dtype="float64"),
                                 "c2": pd.Series(dtype="int64"),
                                 "dim": pd.Series(dtype="int8")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby(["dim", "v"], as_index=False).agg(
            c2=("c2", "sum"))

    refs = _read(sf_dir, "orders",
                 columns=["o_totalprice", "o_orderdate"]).to_arrow_refs()
    tagged = [(r, ()) for r in refs]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"n": pd.array([0], "int64"),
                          "rho": [np.nan]})
    if not parts:
        return empty
    c = pd.concat(parts, ignore_index=True)

    maps = {}
    n = 0
    for dim in (0, 1):
        g = (c[c["dim"] == dim].groupby("v", as_index=False)
             .agg(cnt=("c2", "sum")).sort_values("v"))
        u = g["v"].to_numpy(np.float64)
        cnt = g["cnt"].to_numpy(np.float64)
        less = np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
        maps[dim] = (u, 2.0 * less + cnt + 1.0)  # 2·midrank
        n = int(cnt.sum())
    if n == 0:
        return empty
    ux, mrx = maps[0]
    uy, mry = maps[1]
    ref = ray.put((ux, mrx, uy, mry, float(n)))

    def partials(t: pa.Table) -> pa.Table:
        E = pa.table({"sxy": pa.array([], pa.float64()),
                      "sxx": pa.array([], pa.float64()),
                      "syy": pa.array([], pa.float64())})
        ex = extract(t)
        if ex is None:
            return E
        gx, gmx, gy, gmy, gn = ray.get(ref) \
            if isinstance(ref, ray.ObjectRef) else ref
        ax = gmx[np.searchsorted(gx, ex[0])] - (gn + 1.0)
        ay = gmy[np.searchsorted(gy, ex[1])] - (gn + 1.0)
        return pa.table({"sxy": pa.array([float((ax * ay).sum())]),
                         "sxx": pa.array([float((ax * ax).sum())]),
                         "syy": pa.array([float((ay * ay).sum())])})

    p = _read(sf_dir, "orders",
              columns=["o_totalprice", "o_orderdate"]).map_batches(
        partials, batch_format="pyarrow").to_pandas()
    sxx = float(p["sxx"].sum())
    syy = float(p["syy"].sum())
    rho = (float(p["sxy"].sum()) / np.sqrt(sxx * syy)
           if sxx > 0 and syy > 0 else np.nan)
    return pd.DataFrame({"n": pd.array([n], "int64"),
                         "rho": round_away(np.array([rho]), 6)})


def q_kruskal_wallis(sf_dir: str) -> pd.DataFrame:
    """Kruskal-Wallis H (rank one-way ANOVA) of ``events.value``
    across ALL event types (NULL type IS a group, like GROUP BY):
    H = (12/(N(N+1))) Σ R_g²/n_g − 3(N+1), divided by the tie
    correction 1 − Σ(t³−t)/(N³−N). Same counts-per-distinct exchange
    as q195, but each distinct value carries per-GROUP counts: split
    emits (value, type, count) rows, buckets fold them, and the driver
    pivots on ``factorize_strings`` codes (pandas' NUL-terminated
    string hash would merge 'fz' with 'fz\\x00...'). Rank sums use the
    exact 2·midrank integers, so R_g is exact below 2^53. All-tied
    input (correction 0) or N<2 yields SQL NULL -> NaN."""
    from .pairs import factorize_strings

    P = 8

    _E = pa.table({"v": pa.array([], pa.float64()),
                   "g": pa.array([], pa.string()),
                   "gnull": pa.array([], pa.bool_()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_finite(t.column("value")),
                                   False))
        if t2.num_rows == 0:
            return _E
        v = _norm_zero(t2.column("value").to_numpy(
            zero_copy_only=False))
        gs = t2.column("event_type").to_pandas()
        codes, uniq = factorize_strings(gs, use_na_sentinel=False)
        # per-(value, local group) counts via sorted run boundaries
        # (a packed v-bits×k+code key could overflow int64 and ALIAS
        # distinct pairs)
        bits = v.view(np.int64)
        order = np.lexsort((codes, bits))
        b_s, c_s = bits[order], codes[order]
        newg = np.empty(b_s.size, bool)
        newg[0] = True
        newg[1:] = (b_s[1:] != b_s[:-1]) | (c_s[1:] != c_s[:-1])
        idx = np.nonzero(newg)[0]
        cnt = np.diff(np.append(idx, b_s.size)).astype(np.int64)
        rep = order[idx]
        vv = v[rep]
        gg = codes[rep]
        names = [None if x is None or (isinstance(x, float)
                                       and np.isnan(x)) else str(x)
                 for x in uniq]
        gname = [names[i] for i in gg]
        return pa.table({"v": pa.array(vv),
                         "g": pa.array(gname, pa.string()),
                         "gnull": pa.array([x is None for x in gname]),
                         "c": pa.array(cnt),
                         "bucket": pa.array(_bucket_of(vv, P))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"v": pd.Series(dtype="float64"),
                                 "g": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        key = df["g"].where(~df["gnull"].to_numpy(bool), None)
        codes, uniq = factorize_strings(key, use_na_sentinel=False)
        df = df.assign(gc=codes)
        gr = df.groupby(["v", "gc"], as_index=False).agg(c=("c", "sum"))
        gr["g"] = pd.Series([uniq[i] for i in gr["gc"]], dtype=object)
        return gr[["v", "g", "c"]]

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "h": pd.Series(dtype="float64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["g"], use_na_sentinel=False)
    df = df.assign(gc=codes).sort_values("v")
    # pooled per-value totals -> 2·midrank prefix integers
    vt = df.groupby("v", as_index=True)["c"].sum().sort_index()
    u = vt.index.to_numpy(np.float64)
    cnt = vt.to_numpy(np.float64)
    less = np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
    mr2 = 2.0 * less + cnt + 1.0
    pos = np.searchsorted(u, df["v"].to_numpy(np.float64))
    # R2_g = Σ c·2·midrank (exact ints); n_g = Σ c
    k = len(uniq)
    r2 = np.zeros(k)
    ng = np.zeros(k)
    np.add.at(r2, df["gc"].to_numpy(), df["c"].to_numpy(np.float64)
              * mr2[pos])
    np.add.at(ng, df["gc"].to_numpy(), df["c"].to_numpy(np.float64))
    N = float(cnt.sum())
    tsum = float((cnt ** 3 - cnt).sum())
    h = np.nan
    if N > 1:
        corr = 1.0 - tsum / (N ** 3 - N)
        if corr != 0.0:
            srg = float(((r2 / 2.0) ** 2 / ng).sum())
            h = ((12.0 / (N * (N + 1.0))) * srg - 3.0 * (N + 1.0)) \
                / corr
    return pd.DataFrame({"k": pd.array([k], "int64"),
                         "n": pd.array([int(N)], "int64"),
                         "h": round_away(np.array([h]), 6)})


def q_best_split(sf_dir: str, target: str = "purchase") -> pd.DataFrame:
    """Depth-1 decision-tree split finder: the threshold on
    ``events.value`` minimizing weighted Gini impurity for predicting
    event_type == target — the ML-preprocessing primitive behind
    feature binning and tree induction. Same counts-per-distinct
    exchange as q195 (per-value [target, other] counts); every
    candidate split is then a prefix-sum row, and the arg-min runs on
    a Gini expression built from EXACT integer counts with the same
    operation order as the oracle (int squares → one double division
    per side), so the (gini, threshold) ordering is bit-deterministic.
    Rows with NULL type count as non-target (CASE ELSE 0); non-finite
    values are excluded on both sides; a constant value column yields
    zero rows (no valid split)."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E2
        keep = pc.fill_null(pc.is_finite(t.column("value")), False)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E2
        v = _norm_zero(t2.column("value").to_numpy(
            zero_copy_only=False))
        g1 = pc.fill_null(pc.equal(t2.column("event_type"), target),
                          False).to_numpy(zero_copy_only=False)
        return _count_split(v, np.asarray(g1, bool), P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    empty = pd.DataFrame({"threshold": pd.Series(dtype="float64"),
                          "n_left": pd.Series(dtype="int64"),
                          "n_right": pd.Series(dtype="int64"),
                          "gini": pd.Series(dtype="float64")})
    if len(c) < 2:
        return empty
    v = c["v"].to_numpy(np.float64)
    n = (c["c1"] + c["c2"]).to_numpy(np.int64)
    p = c["c1"].to_numpy(np.int64)
    nl = np.cumsum(n)[:-1]          # split AFTER each distinct value
    pl = np.cumsum(p)[:-1]
    nt = int(n.sum())
    pt = int(p.sum())
    nr = nt - nl
    pr = pt - pl
    ql = nl - pl
    qr = nr - pr
    # same op order as the oracle: exact-int squares/sums, ONE double
    # division per side, weighted by 1/nt
    gini = (nl - (pl * pl + ql * ql).astype(np.float64)
            / nl.astype(np.float64)
            + nr - (pr * pr + qr * qr).astype(np.float64)
            / nr.astype(np.float64)) / nt
    # the oracle's ORDER BY gini binds to the ROUNDED alias — 6dp
    # ties (real at sf≥1) break by v ASC on the rounded value, not
    # the raw one
    gini_r = round_away(gini, 6)
    best = np.lexsort((v[:-1], gini_r))[0]
    return pd.DataFrame({
        "threshold": np.array([v[best]]),
        "n_left": pd.array([int(nl[best])], "int64"),
        "n_right": pd.array([int(nr[best])], "int64"),
        "gini": np.array([gini_r[best]])})


def q_bootstrap_ci(sf_dir: str, B: int = 200,
                   alpha: float = 0.05) -> pd.DataFrame:
    """Poisson-bootstrap confidence interval for the per-type mean of
    ``events.value`` — THE distributed bootstrap: classical resampling
    needs global multinomial draws, but Poisson(1) row weights are
    independent per row, so every block draws its own weights and
    replicate partials just add. Weights are DETERMINISTIC —
    w(row, b) = Poisson⁻¹(u) with u from ``mix64(event_id ⊕ b·φ)`` —
    so the result is partition-invariant and reproducible (pinned by
    pytest, including split-invariance). One pass over block refs
    emits (type, B sums, B weighted sums) partials; the driver folds
    T×B cells and takes the percentile CI of the replicate means.
    Contract: finite values, non-NULL event_type/event_id (the id
    seeds the draw). No SQL twin — the oracle can't reproduce the
    hash-uniform Poisson draws; rows-only driver check."""
    import ray

    from .pairs import factorize_strings, mix64

    import math

    # Poisson(1) inverse-CDF table (k ≤ 12 covers 1-1e-14 of the mass)
    pk = np.cumsum([np.exp(-1.0) / math.factorial(k)
                    for k in range(13)])
    golden = np.uint64(0x9E3779B97F4A7C15)

    @ray.remote
    def partial(t: pa.Table):
        if t.num_rows == 0 or "value" not in t.schema.names:
            return None
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_type")),
                          pc.is_valid(t.column("event_id"))),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return None
        typ = pd.Series(t2.column("event_type").to_pylist(),
                        dtype=object)
        codes, uniq = factorize_strings(typ)
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        ids = t2.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).view(np.uint64)
        T = len(uniq)
        sw = np.zeros((T, B))
        swx = np.zeros((T, B))
        n = np.bincount(codes, minlength=T).astype(np.int64)
        sx = np.zeros(T)
        np.add.at(sx, codes, v)
        for b in range(B):
            with np.errstate(over="ignore"):  # deliberate u64 wraparound
                salt = np.uint64(b + 1) * golden
            u = (mix64(ids ^ salt)
                 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            w = np.searchsorted(pk, u).astype(np.float64)
            np.add.at(sw[:, b], codes, w)
            np.add.at(swx[:, b], codes, w * v)
        return list(uniq), n, sx, sw, swx

    refs = _read(sf_dir, "events",
                 columns=["event_type", "event_id", "value"]
                 ).materialize().to_arrow_refs()
    parts = [p for p in ray.get([partial.remote(r) for r in refs]) if p]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64"),
                          "mean": pd.Series(dtype="float64"),
                          "ci_lo": pd.Series(dtype="float64"),
                          "ci_hi": pd.Series(dtype="float64")})
    if not parts:
        return empty
    types = sorted({u for p in parts for u in p[0]},
                   key=lambda s: s.encode("utf-8",
                                          "surrogatepass").hex())
    tix = {t: i for i, t in enumerate(types)}
    T = len(types)
    n = np.zeros(T, np.int64)
    sx = np.zeros(T)
    sw = np.zeros((T, B))
    swx = np.zeros((T, B))
    for uniq, pn, psx, psw, pswx in parts:
        ix = np.array([tix[u] for u in uniq])
        n[ix] += pn
        sx[ix] += psx
        sw[ix] += psw
        swx[ix] += pswx
    with np.errstate(invalid="ignore", divide="ignore"):
        rep_means = swx / sw          # (T, B); empty replicate → NaN
        lo = np.nanpercentile(rep_means, 100 * alpha / 2, axis=1)
        hi = np.nanpercentile(rep_means, 100 * (1 - alpha / 2), axis=1)
    return pd.DataFrame({"event_type": types, "n": n,
                         "mean": round_away(sx / n, 6),
                         "ci_lo": round_away(lo, 6),
                         "ci_hi": round_away(hi, 6)})


def q_auc(sf_dir: str, target: str = "purchase") -> pd.DataFrame:
    """Exact ROC AUC of ``value`` as a score for event_type == target
    — the binary-classifier eval metric, computed by the rank-sum
    identity AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₀) with MID-ranks under
    ties (the Mann-Whitney estimator q195 already distributes; AUC is
    its probabilistic normalization). Same counts-per-distinct
    exchange; mid-ranks ride as exact 2·rank integers and the one
    float division happens in the oracle's own op order, so the value
    is bit-identical. Rows with NULL type are non-target (CASE ELSE
    0); non-finite scores are excluded on both sides; an empty class
    → NULL AUC (one ungrouped-aggregate row either way)."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E2
        keep = pc.fill_null(pc.is_finite(t.column("value")), False)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E2
        v = _norm_zero(t2.column("value").to_numpy(
            zero_copy_only=False))
        g1 = pc.fill_null(pc.equal(t2.column("event_type"), target),
                          False).to_numpy(zero_copy_only=False)
        return _count_split(v, np.asarray(g1, bool), P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    if len(c) == 0:
        return pd.DataFrame({"n_pos": pd.array([0], "int64"),
                             "n_neg": pd.array([0], "int64"),
                             "auc": pd.array([np.nan], "float64")})
    c1 = c["c1"].to_numpy(np.int64)
    call = (c["c1"] + c["c2"]).to_numpy(np.int64)
    n1 = int(c1.sum())
    n0 = int(call.sum()) - n1
    if n1 == 0 or n0 == 0:
        return pd.DataFrame({"n_pos": pd.array([n1], "int64"),
                             "n_neg": pd.array([n0], "int64"),
                             "auc": pd.array([np.nan], "float64")})
    before = np.concatenate(([0], np.cumsum(call)[:-1]))
    two_mr = 2 * before + call + 1          # exact 2·mid-rank ints
    two_R1 = int((c1 * two_mr).sum())
    auc = ((two_R1 / 2.0 - n1 * (n1 + 1) / 2.0)
           / (n1 * float(n0)))
    return pd.DataFrame({"n_pos": pd.array([n1], "int64"),
                         "n_neg": pd.array([n0], "int64"),
                         "auc": round_away(np.array([auc]), 6)})


def q_kendall_tau(sf_dir: str,
                  sample_p: float | None = None) -> pd.DataFrame:
    """Kendall τ-b between order totalprice and order date — the
    third classical rank-association measure next to Spearman (q194)
    and the regression family: τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with
    full tie corrections. The exchange ships per-block (x, y, count)
    JOINT-distinct cells (the 2-D generalization of the module's
    counts-per-distinct contract); C − D is then an O(m log m) Fenwick
    sweep over the cells — ascending x groups, each cell counting
    already-inserted cells with smaller / larger y — never the O(n²)
    pair loop the SQL twin runs. All counts are exact int64; the
    denominator multiplies as double in the oracle's own op order.
    Contract: finite price, non-NULL date; n < 2 or an all-tied axis
    → NULL τ (zero denominator)."""
    P = 8

    _E = pa.table({"x": pa.array([], pa.float64()),
                   "y": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                         False),
            pc.is_valid(t.column("o_orderdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        x = _norm_zero(t2.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        y = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cells, inv = np.unique(np.stack([x.view(np.int64), y]),
                               axis=1, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        xs = cells[0].view(np.float64)
        return pa.table({"x": pa.array(xs),
                         "y": pa.array(cells[1]),
                         "n": pa.array(n),
                         "bucket": pa.array(_bucket_of(xs, P))})

    def merge(*tabs) -> pd.DataFrame:
        live = [t.drop_columns(["bucket"]) for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({"x": pd.Series(dtype="float64"),
                                 "y": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby(["x", "y"], as_index=False)
                .agg(n=("n", "sum")))

    src = _read(sf_dir, "orders",
                columns=(["o_totalprice", "o_orderdate"]
                         if sample_p is None else
                         ["o_orderkey", "o_totalprice", "o_orderdate"]))
    if sample_p is not None:
        # bounded sf1 oracle contract: same md5-coin row sample on
        # both sides makes the SQL twin's O(n²) sign-pair join
        # (p·n)²-sized (sampled_oracles)
        from .pairs import coin_filter

        src = src.map_batches(
            coin_filter("o_orderkey", sample_p, drop=True),
            batch_format="pyarrow")
    tagged = [(r, ()) for r in src.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    one = pd.DataFrame({"n": pd.array([0], "int64"),
                        "tau_b": pd.array([np.nan], "float64")})
    if not parts:
        return one
    c = pd.concat(parts, ignore_index=True)
    x = c["x"].to_numpy(np.float64)
    y = c["y"].to_numpy(np.int64)
    cnt = c["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    if n < 2:
        return pd.DataFrame({"n": pd.array([n], "int64"),
                             "tau_b": pd.array([np.nan], "float64")})
    order = np.lexsort((y, x))
    x, y, cnt = x[order], y[order], cnt[order]
    yr = np.searchsorted(np.unique(y), y)          # dense y ranks
    m = int(yr.max()) + 1
    bit = np.zeros(m + 1, np.int64)

    def bit_add(i: int, v: int) -> None:
        i += 1
        while i <= m:
            bit[i] += v
            i += i & (-i)

    def bit_sum(i: int) -> int:                    # counts with yr < i
        s = 0
        while i > 0:
            s += bit[i]
            i -= i & (-i)
        return s

    seg = np.flatnonzero(np.concatenate(
        ([True], x[1:] != x[:-1], [True])))
    C = D = 0
    inserted = 0
    for s, e in zip(seg[:-1], seg[1:]):
        for i in range(s, e):
            less = bit_sum(int(yr[i]))
            eq = bit_sum(int(yr[i]) + 1) - less
            C += int(cnt[i]) * less
            D += int(cnt[i]) * (inserted - less - eq)
        for i in range(s, e):
            bit_add(int(yr[i]), int(cnt[i]))
            inserted += int(cnt[i])
    n0 = n * (n - 1) // 2
    tx = np.bincount(np.searchsorted(np.unique(x), x),
                     weights=cnt.astype(np.float64)).astype(np.int64)
    ty = np.bincount(yr, weights=cnt.astype(np.float64)).astype(
        np.int64)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    tau = np.nan
    if n0 > n1 and n0 > n2:
        tau = (C - D) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    return pd.DataFrame({"n": pd.array([n], "int64"),
                         "tau_b": round_away(np.array([tau]), 6)})


def q_wasserstein_distance(sf_dir: str, a: str = "click",
                           b: str = "purchase") -> pd.DataFrame:
    """Two-sample Wasserstein-1 (earth-mover) distance between the
    value distributions of two event types: W₁ = ∫|F̂_a − F̂_b| dv —
    the magnitude-aware drift metric that q196's KS max can't express
    (KS sees only the worst single gap; W₁ integrates how far mass
    must move). Same counts-per-distinct exchange as KS: EDF steps
    are exact-integer cumsums over the sorted distinct pooled values,
    so both sides divide identical ints and only the final term-sum
    order differs (round 6). Fewer than 2 distinct values or an empty
    side → SQL NULL → NaN."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        ex = _two_type_extract(t, a, b)
        return _E2 if ex is None else _count_split(*ex, P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    n1 = int(c["c1"].sum())
    n2 = int(c["c2"].sum())
    w1 = np.nan
    if n1 > 0 and n2 > 0 and len(c) >= 2:
        f1 = np.cumsum(c["c1"].to_numpy(np.int64)) / n1
        f2 = np.cumsum(c["c2"].to_numpy(np.int64)) / n2
        v = c["v"].to_numpy(np.float64)
        w1 = float((np.abs(f1 - f2)[:-1] * np.diff(v)).sum())
    return pd.DataFrame({
        "n1": pd.array([n1], "int64"),
        "n2": pd.array([n2], "int64"),
        "w1": round_away(np.array([w1]), 6)})


def q_pr_curve(sf_dir: str, target: str = "purchase",
               limit: int = 200) -> pd.DataFrame:
    """Precision–recall curve points of ``value`` as a score for
    event_type == target — the eval companion to the exact ROC AUC
    (q247): one row per distinct POSITIVE score (the only thresholds
    where the PR curve bends), carrying the exact cumulative TP/FP at
    threshold ≥ v and the precision/recall ratios. Same
    counts-per-distinct exchange as q195/q218/q247; the prefix sums
    run over EXACT int64 counts descending value (the oracle's
    cumulative window in the same order) and each output ratio is ONE
    double division of those ints, so values are bit-identical. Rows
    with NULL type are non-target; non-finite scores are excluded on
    both sides. Top ``limit`` thresholds by value DESC."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E2
        keep = pc.fill_null(pc.is_finite(t.column("value")), False)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E2
        v = _norm_zero(t2.column("value").to_numpy(
            zero_copy_only=False))
        g1 = pc.fill_null(pc.equal(t2.column("event_type"), target),
                          False).to_numpy(zero_copy_only=False)
        return _count_split(v, np.asarray(g1, bool), P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    empty = pd.DataFrame({"threshold": pd.Series(dtype="float64"),
                          "tp": pd.Series(dtype="int64"),
                          "fp": pd.Series(dtype="int64"),
                          "prec": pd.Series(dtype="float64"),
                          "rec": pd.Series(dtype="float64")})
    if len(c) == 0:
        return empty
    v = c["v"].to_numpy(np.float64)[::-1]          # value DESC
    np_ = c["c1"].to_numpy(np.int64)[::-1]
    nn = c["c2"].to_numpy(np.int64)[::-1]
    tp = np.cumsum(np_)
    fp = np.cumsum(nn)
    ptot = int(np_.sum())
    keep = np_ > 0                                 # curve bends only
    if not keep.any():                             # at positives
        return empty
    v, tp, fp = v[keep][:limit], tp[keep][:limit], fp[keep][:limit]
    return pd.DataFrame({
        "threshold": v,
        "tp": tp,
        "fp": fp,
        "prec": round_away(tp.astype(np.float64) / (tp + fp), 6),
        "rec": round_away(tp.astype(np.float64) / ptot, 6)})


def q_exp_arrival_ks(sf_dir: str, B: int = 64) -> pd.DataFrame:
    """One-sample Kolmogorov–Smirnov test of inter-arrival
    exponentiality — the "is this traffic Poisson?" screen: per-user
    consecutive event gaps (µs), fitted rate 1/mean, and D = the max
    over distinct gap values of the EDF-vs-theory discrepancy taken
    on BOTH sides of each step. One user-keyed exchange sorts each
    bucket once (q116's layout) and emits (gap, count) partials; the
    driver folds the counts-per-distinct table (the module contract).
    The mean comes from exact integer sums, each theory value
    1 − e^(−gap/mean) is a single identical expression per distinct
    gap, EDF steps are exact-int divisions, and max() is
    order-insensitive — so D is bit-identical to the oracle's window
    form. Users with < 2 events contribute nothing; zero gaps → zero
    rows on both sides. NULL user/ts rows are out of contract."""
    _EG = pa.table({"gap": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _EG
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _EG
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(pc.fill_null(
                t2.column("event_id"),
                np.iinfo(np.int64).max), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"gap": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user_id", "ts", "event_id"],
                           kind="stable"))
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        if len(u) < 2:
            return pd.DataFrame(cols)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        if not len(gaps):
            return pd.DataFrame(cols)
        g, c = np.unique(gaps, return_counts=True)
        return pd.DataFrame({"gap": g, "c": c.astype(np.int64)})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"n_gaps": pd.Series(dtype="int64"),
            "mean_gap_us": pd.Series(dtype="float64"),
            "ks_d": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("gap", as_index=False)["c"].sum()
         .sort_values("gap").reset_index(drop=True))
    gap = g["gap"].to_numpy(np.int64)
    c = g["c"].to_numpy(np.int64)
    n = int(c.sum())
    S = sum(int(x) * int(y) for x, y in zip(gap, c))  # exact Σ gaps
    mean = float(S) / n
    F = 1.0 - np.exp(-(gap.astype(np.float64) / mean))
    cum = np.cumsum(c)
    hi = np.abs(cum.astype(np.float64) / n - F)
    lo = np.abs((cum - c).astype(np.float64) / n - F)
    d = float(np.maximum(hi, lo).max())
    return pd.DataFrame({
        "n_gaps": pd.array([n], "int64"),
        "mean_gap_us": round_away(np.array([mean]), 6),
        "ks_d": round_away(np.array([d]), 6)})


def q_fd_histogram(sf_dir: str, target: str = "purchase") -> pd.DataFrame:
    """Freedman–Diaconis histogram of purchase values — the
    data-driven binning every distribution report should use instead
    of a magic bin count: width w = 2·IQR/n^(1/3) with the IQR from
    EXACT discrete quartiles (quantile_disc rank rule ceil(p·n)−1 —
    actual data values, q99/q274's contract), bin = ⌊(v − min)/w⌋
    clamped into [0, ⌈(max−min)/w⌉−1] so the max lands in the last
    bin. Same counts-per-distinct exchange as q195: quartiles, edges
    AND the per-bin fold all come from the distinct-value counts —
    the raw rows are never re-scanned. Every float (w, the per-value
    bin quotient) is the same expression over identical doubles on
    both sides, so ⌊·⌋ is knife-edge-free. Non-finite values are
    excluded; zero IQR (w = 0) emits zero rows on both sides."""
    P = 8

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E2
        keep = pc.and_kleene(
            pc.equal(t.column("event_type"), target),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E2
        v = _norm_zero(t2.column("value").to_numpy(
            zero_copy_only=False))
        return _count_split(v, np.ones(len(v), bool), P)

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_type", "value"]).to_arrow_refs()]
    c = _fold_counts(hash_shuffle(tagged, split, _count_merge, P=P))
    cols = {"bin": pd.Series(dtype="int64"),
            "lo": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64")}
    if not len(c):
        return pd.DataFrame(cols)
    v = c["v"].to_numpy(np.float64)
    cnt = (c["c1"] + c["c2"]).to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    q1 = float(v[np.searchsorted(cum, int(np.ceil(0.25 * n)) - 1,
                                 side="right")])
    q3 = float(v[np.searchsorted(cum, int(np.ceil(0.75 * n)) - 1,
                                 side="right")])
    iqr = q3 - q1
    if iqr <= 0:
        return pd.DataFrame(cols)
    w = 2.0 * iqr / n ** (1.0 / 3.0)
    mn, mx = float(v[0]), float(v[-1])
    nbins = int(np.ceil((mx - mn) / w))
    b = np.minimum(np.floor((v - mn) / w).astype(np.int64),
                   max(nbins - 1, 0))
    g = np.zeros(max(nbins, 1), np.int64)
    np.add.at(g, b, cnt)
    keep = g > 0
    bins = np.flatnonzero(keep).astype(np.int64)
    return pd.DataFrame({
        "bin": bins,
        "lo": round_away(mn + bins.astype(np.float64) * w, 6),
        "n": g[keep]})


def q_split_balance_ks(sf_dir: str,
                       train_frac: float = 0.8) -> pd.DataFrame:
    """Split-balance audit: after the deterministic 80/20 md5 row
    split (q300's coin), does each language's TRAIN length
    distribution still match its TEST one? Per lang, the two-sample
    KS distance over n_chars — a big D means the split broke a
    stratum and eval numbers will lie. One exchange of per-batch
    (lang, length, train-count, test-count) combiners partitioned on
    the length value (q195's counts-per-distinct contract, lang
    riding NUL-safe codes); the driver folds per-lang distinct-length
    tables and takes exact-int EDF max-gaps. NULL doc_id/n_chars out
    of contract; NULL lang IS a group."""
    import hashlib

    from .pairs import factorize_strings

    P = 16
    TWO52 = 4503599627370496.0
    thr = int(np.floor(train_frac * TWO52))
    _NULL = "\x00NULLLANG"
    _EL = pa.table({"lang": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_chars" not in t.schema.names:
            return _EL
        keep = pc.and_kleene(pc.is_valid(t.column("doc_id")),
                             pc.is_valid(t.column("n_chars")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _EL
        ids = t2.column("doc_id").to_pylist()
        tr = np.array([int(hashlib.md5(str(i).encode())
                           .hexdigest()[:13], 16) < thr
                       for i in ids], bool)
        x = t2.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        lg = pd.Series(t2.column("lang").to_pylist(), dtype=object)
        keyed = lg.where(lg.isna(), "L" + lg).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        g = (pd.DataFrame({"lc": codes, "v": x, "tr": tr})
             .groupby(["lc", "v"], sort=False)
             .agg(c1=("tr", "sum"), c2=("tr", "size"))
             .reset_index())
        g["c2"] = g["c2"] - g["c1"]
        return pa.table({
            "lang": pa.array([uniq[i] for i in g["lc"]],
                             pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64)),
            "c1": pa.array(g["c1"].to_numpy(np.int64)),
            "c2": pa.array(g["c2"].to_numpy(np.int64)),
            "bucket": pa.array(np.abs(g["v"].to_numpy(np.int64))
                               % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="int64"),
                                 "c1": pd.Series(dtype="int64"),
                                 "c2": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        from .pairs import coded_keys

        cj, restore = coded_keys(df, ["lang"])
        return restore(cj.groupby(["lang", "v"], as_index=False)
                       [["c1", "c2"]].sum())

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"lang": pd.Series(dtype="object"),
            "n_train": pd.Series(dtype="int64"),
            "n_test": pd.Series(dtype="int64"),
            "ks_d": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["lang"],
                                    use_na_sentinel=False)
    df = df.assign(lc=codes)
    out = []
    for lc in sorted(set(codes), key=lambda i: (uniq[i] == _NULL,
                                                uniq[i])):
        sub = (df[df["lc"] == lc].groupby("v", as_index=False)
               [["c1", "c2"]].sum().sort_values("v"))
        n1 = int(sub["c1"].sum())
        n2 = int(sub["c2"].sum())
        d = np.nan
        if n1 > 0 and n2 > 0:
            f1 = np.cumsum(sub["c1"].to_numpy(np.float64)) / n1
            f2 = np.cumsum(sub["c2"].to_numpy(np.float64)) / n2
            d = float(np.abs(f1 - f2).max())
        key = uniq[lc]
        out.append((None if key == _NULL else key[1:], n1, n2, d))
    from .pairs import round_away as _ra

    return pd.DataFrame({
        "lang": pd.Series([o[0] for o in out], dtype=object),
        "n_train": pd.array([o[1] for o in out], "int64"),
        "n_test": pd.array([o[2] for o in out], "int64"),
        "ks_d": _ra(np.array([o[3] for o in out], np.float64), 6)})
