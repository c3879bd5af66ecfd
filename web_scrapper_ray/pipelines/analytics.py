"""Decision-support analytics operators (q121+): multi-stage join
plans, skyline/Pareto queries, first-touch attribution, robust stats
and rank-with-ties selection — each a distinct distributed shape over
the TPC-H-ish tables that the earlier operator families don't cover.

Shared machinery: ``pairs.hash_shuffle`` for raw-task exchanges (the
Dataset sort-based all-to-all costs ~4s fixed in local mode — CLAUDE.md
perf rule) and the relational module's NULL/dtype parity helpers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .pairs import hash_shuffle, round_away
from .relational import _IMAX, _read, _read_pd, _with_cols


def q_shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 twin: top-k unshipped 'BUILDING'-segment orders by
    revenue. A two-exchange plan — no three-way shuffle ever forms:

    1. customer(filtered to the segment) ⋈ orders(filtered to
       orderdate < cutoff) hash-partitioned on custkey; each bucket
       emits only (orderkey, orderdate) — the join's projection, not
       its payload. Duplicate customer rows fan out like SQL's join
       (np.repeat by per-key multiplicity).
    2. that small order list ⋈ lineitem(filtered to shipdate > cutoff)
       hash-partitioned on orderkey; each bucket groups revenue per
       order and keeps only its local top-k, so the driver folds
       P·k rows, never the joined table.

    Per-order revenue sums sit on ≤7-lineitem groups; ``round_away``
    (SQL half-away) on both sides before the ORDER BY keeps the rank
    comparison off the float knife edge."""
    import ray

    P = 32
    CUT = pa.scalar(pd.Timestamp("1998-06-01").to_pydatetime(),
                    pa.timestamp("us"))
    SEG = "BUILDING"

    _EO = pa.table({"orderkey": pa.array([], pa.int64()),
                    "odate": pa.array([], pa.int64())})

    # ---- stage 1: customer ⋈ orders on custkey --------------------
    def split_cust(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "orderkey": pa.array([], pa.int64()),
                             "odate": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        keep = pc.and_kleene(pc.equal(t.column("c_mktsegment"), SEG),
                             pc.is_valid(t.column("c_custkey")))
        t = t.filter(pc.fill_null(keep, False))
        key = t.column("c_custkey")
        n = t.num_rows
        return pa.table({"key": key,
                         "side": pa.array(np.zeros(n, np.int8)),
                         "orderkey": pa.array(np.full(n, -1, np.int64)),
                         "odate": pa.array(np.zeros(n, np.int64)),
                         "bucket": pc.bit_wise_and(key, P - 1)})

    def split_ord(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return split_cust(t)  # same empty-typed table
        od = t.column("o_orderdate")
        # NULL o_orderkey can never match a lineitem in SQL's inner
        # join downstream — drop here rather than sentinel-fill, else
        # a genuine l_orderkey == 2^63-1 would phantom-join it
        keep = pc.and_kleene(
            pc.and_kleene(pc.less(od, CUT),
                          pc.is_valid(t.column("o_custkey"))),
            pc.is_valid(t.column("o_orderkey")))
        t = t.filter(pc.fill_null(keep, False))
        key = t.column("o_custkey")
        n = t.num_rows
        odate_s = pc.cast(
            pc.multiply(pc.floor(pc.divide(pc.cast(pc.cast(
                t.column("o_orderdate"), pa.int64()), pa.float64()), 1e6)),
                1.0), pa.int64())
        return pa.table({"key": key,
                         "side": pa.array(np.ones(n, np.int8)),
                         "orderkey": pc.cast(t.column("o_orderkey"),
                                             pa.int64()),
                         "odate": odate_s,
                         "bucket": pc.bit_wise_and(key, P - 1)})

    def merge_co(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EO
        df = pa.concat_tables(live).to_pandas()
        cust = df[df["side"] == 0]
        if cust.empty:
            return _EO
        orders = df[df["side"] == 1]
        # SQL join fan-out: a custkey appearing m times in customer
        # duplicates each of its orders m times
        mult = cust["key"].value_counts()
        m = orders["key"].map(mult).fillna(0).to_numpy(np.int64)
        ok = np.repeat(orders["orderkey"].to_numpy(np.int64), m)
        od = np.repeat(orders["odate"].to_numpy(np.int64), m)
        return pa.table({"orderkey": pa.array(ok), "odate": pa.array(od)})

    def split_stage1(block: pa.Table, is_cust: bool) -> pa.Table:
        return split_cust(block) if is_cust else split_ord(block)

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split_stage1, merge_co, P=P,
                          gather=False)

    # ---- stage 2: ⋈ lineitem on orderkey, grouped top-k ------------
    _E2 = pa.table({"orderkey": pa.array([], pa.int64()),
                    "odate": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "rev": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64())})

    def split_stage2(block: pa.Table, is_orders: bool) -> pa.Table:
        if is_orders:
            if block.num_rows == 0:
                return _E2
            ok = block.column("orderkey")
            n = block.num_rows
            return pa.table({"orderkey": ok,
                             "odate": block.column("odate"),
                             "side": pa.array(np.zeros(n, np.int8)),
                             "rev": pa.array(np.zeros(n, np.float64)),
                             "bucket": pc.bit_wise_and(ok, P - 1)})
        if block.num_rows == 0 or "l_orderkey" not in block.schema.names:
            return _E2
        keep = pc.and_kleene(
            pc.greater(block.column("l_shipdate"), CUT),
            pc.is_valid(block.column("l_orderkey")))
        block = block.filter(pc.fill_null(keep, False))
        rev = pc.multiply(block.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      block.column("l_discount")))
        ok = pc.cast(block.column("l_orderkey"), pa.int64())
        n = block.num_rows
        return pa.table({"orderkey": ok,
                         "odate": pa.array(np.zeros(n, np.int64)),
                         "side": pa.array(np.ones(n, np.int8)),
                         "rev": rev,
                         "bucket": pc.bit_wise_and(ok, P - 1)})

    _EMPTY = pd.DataFrame({"orderkey": pd.Series(dtype="int64"),
                           "revenue": pd.Series(dtype="float64"),
                           "orderdate": pd.Series(dtype="int64")})

    def merge_ol(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EMPTY
        df = pa.concat_tables(live).to_pandas()
        orders = df[df["side"] == 0][["orderkey", "odate"]]
        li = df[df["side"] == 1][["orderkey", "rev"]]
        if orders.empty or li.empty:
            return _EMPTY
        j = li.merge(orders, on="orderkey", how="inner")
        if j.empty:
            return _EMPTY
        # min_count=1: all-NULL-revenue orders keep SQL's NULL sum (the
        # money columns are NaN-free by contract, so NaN == SQL NULL)
        g = (j.groupby(["orderkey", "odate"], as_index=False)["rev"]
             .sum(min_count=1))
        g["rev"] = round_away(g["rev"].to_numpy(np.float64), 2)
        g = g.sort_values(["rev", "orderkey"], ascending=[False, True],
                          na_position="last").head(k)
        return pd.DataFrame({"orderkey": g["orderkey"].astype("int64"),
                             "revenue": g["rev"],
                             "orderdate": g["odate"].astype("int64")})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged2, split_stage2, merge_ol,
                                     P=P) if len(p)]
    if not parts:
        return _EMPTY.copy()
    out = pd.concat(parts, ignore_index=True)
    out = out.sort_values(["revenue", "orderkey"],
                          ascending=[False, True],
                          na_position="last").head(k)
    return out.reset_index(drop=True)


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for the 2-D skyline (minimize price, maximize
    size). A row is dominated iff some other row has price ≤ AND size ≥
    with at least one strict. Vectorized: sort by (price asc, size
    desc); a row is dominated iff the running size-max over STRICTLY
    cheaper rows reaches its size, or its own price group's max size
    exceeds it. Equal (price, size) duplicates dominate nothing — both
    survive, like SQL NOT EXISTS with the strictness clause."""
    order = np.lexsort((-size, price))
    ps, ss = price[order], size[order]
    run = np.maximum.accumulate(ss)
    first = np.searchsorted(ps, ps, side="left")  # start of own group
    max_lt = np.where(first > 0, run[np.maximum(first - 1, 0)], -np.inf)
    grp_max = ss[first]  # size-desc within group → group max
    dominated = (max_lt >= ss) | (grp_max > ss)
    keep = np.zeros(len(ps), dtype=bool)
    keep[order] = ~dominated
    return keep


def q_pareto_parts(sf_dir: str) -> pd.DataFrame:
    """Pareto frontier (skyline) of parts: cheapest-for-their-size
    parts — no other part is both ≤ price and ≥ size with one strict.

    Mergeable-partial shape: each batch emits its LOCAL skyline (a
    skyline point of the union is a skyline point of its own batch, so
    the union of local skylines is a superset of the answer), the
    driver re-runs the same mask over the concatenated survivors.
    Frontier size grows ~log-ly with data, so the fold input is tiny
    regardless of corpus size; the corpus itself never moves."""
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])

    _E = pa.table({"p_partkey": pa.array([], pa.int64()),
                   "p_retailprice": pa.array([], pa.float64()),
                   "p_size": pa.array([], pa.int32())})

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_retailprice" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("p_retailprice")),
                             pc.is_valid(t.column("p_size")))
        # NaN price would poison the lexsort order; SQL comparisons
        # treat NaN as greater-than-everything so a NaN-price row is
        # dominated by any finite row anyway — drop via isnan guard
        keep = pc.and_kleene(
            keep, pc.invert(pc.is_nan(pc.cast(t.column("p_retailprice"),
                                              pa.float64()))))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.filter(pa.array(_skyline_mask(price, size)))

    parts = ds.map_batches(local_skyline, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                             "p_retailprice": pd.Series(dtype="float64"),
                             "p_size": pd.Series(dtype="int32")})
    mask = _skyline_mask(parts["p_retailprice"].to_numpy(np.float64),
                         parts["p_size"].to_numpy(np.int64))
    out = parts[mask]
    out = out.sort_values(["p_retailprice", "p_partkey"])
    out = out.reset_index(drop=True)
    out["p_size"] = out["p_size"].astype("int32")
    return out


def q_new_users_hourly(sf_dir: str) -> pd.DataFrame:
    """First-touch attribution: new users per hour (count of users
    whose FIRST event falls in that hour). Two-level aggregate — the
    per-user min can't pre-aggregate into the hour histogram directly,
    so: per-batch Arrow (user → min µs) partials, one user-keyed
    exchange, per-bucket exact min → hour histogram partial, and the
    driver folds only (hours × buckets) rows. Epoch-hour binning
    FLOOR-divides raw µs (CLAUDE.md: truncation bins pre-1970
    fractional timestamps one hour late)."""
    P = 32
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "mn": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        g = (pa.table({"user": t.column("user_id"),
                       "us": pc.cast(t.column("ts"), pa.int64())})
             .group_by(["user"]).aggregate([("us", "min")]))
        return pa.table({"user": g.column("user"),
                         "mn": g.column("us_min"),
                         "bucket": pc.bit_wise_and(g.column("user"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"hour_start": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        mn = df.groupby("user")["mn"].min()
        hour = (mn.to_numpy(np.int64) // 3_600_000_000) * 3600
        h, c = np.unique(hour, return_counts=True)
        return pd.DataFrame({"hour_start": h, "n": c.astype(np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"hour_start": pd.Series(dtype="int64"),
                             "n_new_users": pd.Series(dtype="int64")})
    out = (pd.concat(parts, ignore_index=True)
           .groupby("hour_start", as_index=False)["n"].sum()
           .rename(columns={"n": "n_new_users"}))
    out["n_new_users"] = out["n_new_users"].astype("int64")
    return out.sort_values("hour_start").reset_index(drop=True)


def q_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """5–95% trimmed mean of value per event_type (robust stats over a
    skewed metric). Shares q57's exact-order-statistics contract: one
    groupby shuffle carrying (event_type, value); the per-group task
    sorts once, takes the quantile_cont bounds in DuckDB's own op
    order, and means the in-range slice. NULL/NaN values are excluded
    on BOTH sides (NaN fails SQL BETWEEN; quantile_cont is
    implementation-defined under NaN — q57/q102 contract); ±inf stay
    as orderable extremes and propagate through the mean like SQL."""
    from .relational import (_null_safe_keys, _quantile_cont,
                             _restore_null_keys)

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    from .relational import _drop_null_nan_values as drop_nan

    _TE = pa.table({"event_type": pa.array([], pa.string()),
                    "trimmed_mean": pa.array([], pa.float64()),
                    "n_kept": pa.array([], pa.int64())})

    def trim(t: pa.Table) -> pa.Table:
        v = np.sort(t.column("value").to_numpy(
            zero_copy_only=False).astype(np.float64))
        if len(v) == 0:
            return _TE
        lo = _quantile_cont(v, 0.05)
        hi = _quantile_cont(v, 0.95)
        # DuckDB BETWEEN compares in its TOTAL order (NaN above +inf):
        # an inf−inf bracket interpolates a bound to NaN, and v≤NaN is
        # then TRUE for every (NaN-free) value while v≥NaN is FALSE —
        # numpy's NaN comparisons are all-False, so special-case both
        lo_m = np.zeros(len(v), bool) if np.isnan(lo) else (v >= lo)
        hi_m = np.ones(len(v), bool) if np.isnan(hi) else (v <= hi)
        kept = v[lo_m & hi_m]
        if len(kept) == 0:
            # NaN lo → every BETWEEN false → SQL's inner-join group
            # VANISHES
            return _TE
        return pa.table({
            "event_type": pa.array([t.column("event_type")[0].as_py()],
                                   pa.string()),
            "trimmed_mean": pa.array([float(round_away(
                np.array(kept.sum() / len(kept)), 4)[()])],
                pa.float64()),
            "n_kept": pa.array([len(kept)], pa.int64())})

    out = (_null_safe_keys(ds.map_batches(drop_nan,
                                          batch_format="pyarrow"),
                           ["event_type"])
           .groupby("event_type")
           .map_groups(trim, batch_format="pyarrow").to_pandas())
    out = _with_cols(out, {"event_type": "object",
                           "trimmed_mean": "float64",
                           "n_kept": "int64"})
    out = _restore_null_keys(out, ["event_type"])
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values("event_type",
                           na_position="last").reset_index(drop=True)


def q_top_orders_rank(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """RANK() ≤ k with ties kept — position-based top-k whose result
    can exceed k rows (every row tying the k-th value stays, and tied
    blocks share a rank with gaps after). Distributed selection in two
    streaming passes, no global sort:

    1. per-batch top-k VALUES (the global k-th row's value is the k-th
       of the merged per-batch top-k lists);
    2. filter pass keeping rows ≥ that threshold — by construction at
       most k-1 rows exceed it, so every survivor has rank ≤ k and the
       driver ranks the tiny survivor set exactly.

    DuckDB's float total order (NaN above +inf) rides an explicit
    nan-tier key so a dirty price column ranks identically."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    _E = pa.table({"nanf": pa.array([], pa.int8()),
                   "v": pa.array([], pa.float64())})

    def topk_vals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        v = t.column("o_totalprice")
        v = v.filter(pc.is_valid(v)).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(v) == 0:
            return _E
        nanf = np.isnan(v).astype(np.int8)
        order = np.lexsort((-np.where(nanf == 1, 0.0, v), -nanf))[:k]
        return pa.table({"nanf": pa.array(nanf[order]),
                         "v": pa.array(v[order])})

    cand = ds.map_batches(topk_vals, batch_format="pyarrow").to_pandas()
    _EMPTY = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                           "o_totalprice": pd.Series(dtype="float64"),
                           "rk": pd.Series(dtype="int64")})
    if cand.empty:
        return _EMPTY.copy()
    nanf = cand["nanf"].to_numpy(np.int8)
    v = cand["v"].to_numpy(np.float64)
    order = np.lexsort((-np.where(nanf == 1, 0.0, v), -nanf))
    if len(order) > k:
        order = order[:k]
    t_nan, t_val = int(nanf[order[-1]]), float(v[order[-1]])
    full = len(order) == k  # fewer than k rows total → keep everything

    def filt(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "o_totalprice": pa.array([], pa.float64())})
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return empty
        t = t.filter(pc.is_valid(t.column("o_totalprice")))
        if not full:
            return t.select(["o_orderkey", "o_totalprice"])
        val = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nf = np.isnan(val)
        if t_nan == 1:  # threshold is NaN → only NaN rows can tie it
            keep = nf
        else:  # NaN outranks any finite threshold (DuckDB total order)
            keep = nf | (val >= t_val)
        return t.filter(pa.array(keep)).select(
            ["o_orderkey", "o_totalprice"])

    rows = ds.map_batches(filt, batch_format="pyarrow").to_pandas()
    if rows.empty:
        return _EMPTY.copy()
    val = rows["o_totalprice"].to_numpy(np.float64)
    nf = np.isnan(val).astype(np.int8)
    vkey = np.where(nf == 1, 0.0, val)
    # rank of a row = 1 + rows with a strictly greater (nan-tier,
    # value) key: sort desc, tied blocks inherit their head's position
    order2 = np.lexsort((-vkey, -nf))
    snf, sv = nf[order2], vkey[order2]
    new_grp = np.ones(len(order2), dtype=bool)
    new_grp[1:] = (snf[1:] != snf[:-1]) | (sv[1:] != sv[:-1])
    pos = np.arange(1, len(order2) + 1, dtype=np.int64)
    head_rank = np.maximum.accumulate(np.where(new_grp, pos, 0))
    rk = np.empty(len(order2), np.int64)
    rk[order2] = head_rank
    rows = rows.assign(rk=rk)
    rows = rows[rows["rk"] <= k]
    rows = rows.sort_values("o_orderkey", na_position="last")
    rows = rows.sort_values("rk", kind="stable")
    if rows["o_orderkey"].notna().all():
        rows["o_orderkey"] = rows["o_orderkey"].astype("int64")
    return rows.reset_index(drop=True)


def q_grouping_sets_docs(sf_dir: str) -> pd.DataFrame:
    """GROUP BY GROUPING SETS ((lang), (source)) — q82's one-leaf-pass
    shape: the distributed pass computes only the (lang, source) LEAF
    partials; both requested sets derive from that tiny table
    driver-side, so two grouping sets still cost one streamed pass.
    ``lvl`` mirrors SQL GROUPING(lang, source): 1 = per-lang set
    (source bit high), 2 = per-source set (lang bit high)."""
    from .pairs import coded_keys

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "n_docs": g.column("count_all"),
                         "sum_chars": g.column("n_chars_sum")})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        # unlike ROLLUP, GROUPING SETS without the () set emits NOTHING
        # over an empty table (vacuously NULL-free sum → int64)
        return pd.DataFrame({"lang": pd.Series(dtype="object"),
                             "source": pd.Series(dtype="object"),
                             "lvl": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64"),
                             "sum_chars": pd.Series(dtype="int64")})
    parts, restore = coded_keys(parts, ["lang", "source"])
    # min_count=1 keeps an all-NULL-chars set as SQL NULL, not 0
    by_lang = (parts.groupby("lang", as_index=False)
               .agg(n_docs=("n_docs", "sum"),
                    sum_chars=("sum_chars", lambda s: s.sum(min_count=1))))
    by_lang = restore(by_lang)
    by_lang["source"] = None
    by_lang["lvl"] = 1
    by_src = (parts.groupby("source", as_index=False)
              .agg(n_docs=("n_docs", "sum"),
                   sum_chars=("sum_chars", lambda s: s.sum(min_count=1))))
    by_src = restore(by_src)
    by_src["lang"] = None
    by_src["lvl"] = 2
    out = pd.concat([by_lang, by_src], ignore_index=True)
    out["lvl"] = out["lvl"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    if not out["sum_chars"].isna().any():
        out["sum_chars"] = out["sum_chars"].astype("int64")
    cols = ["lang", "source", "lvl", "n_docs", "sum_chars"]
    out = out[cols].sort_values("source", na_position="last")
    out = out.sort_values("lang", kind="stable", na_position="last")
    return out.sort_values("lvl", kind="stable").reset_index(drop=True)


def q_first_number(sf_dir: str) -> pd.DataFrame:
    """regexp_extract twin: first digit run per document. The pattern
    is an explicit ASCII class (``[0-9]+``) so Python's re and
    DuckDB's RE2 agree byte-for-byte — no \\d/unicode-class semantics
    in the contract. '' when no match, NULL text stays NULL (DuckDB
    regexp_extract behavior); the scan is one vectorized
    pandas .str.extract per batch, nothing shuffles."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "first_num": pa.array([], pa.string())})
        txt = t.column("text")
        # RE2 kernel, same explicit ASCII class as the oracle; named
        # group because extract_regex returns a struct of captures
        m = pc.struct_field(
            pc.extract_regex(txt, r"(?P<num>[0-9]+)"), "num")
        # no-match → '' like DuckDB; NULL text stays NULL (is_valid
        # false routes to m, which is NULL there too)
        out = pc.if_else(pc.and_(pc.is_valid(txt), pc.is_null(m)),
                         pa.scalar("", pa.string()), m)
        return pa.table({"doc_id": t.column("doc_id"),
                         "first_num": out})

    out = ds.map_batches(extract, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "first_num": pd.Series(dtype="object")})
    out["first_num"] = out["first_num"].astype(object).where(
        out["first_num"].notna(), None)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_quiet_orders(sf_dir: str) -> pd.DataFrame:
    """ANTI range join (NOT EXISTS with an inequality): orders whose
    customer produced NO event within [orderdate, orderdate + 24h).
    Same one-exchange key partitioning as the q50 range join, but each
    bucket resolves existence with a single sorted ``merge_asof``
    (forward): the nearest event at-or-after the order time either
    falls inside the window (order is active → dropped) or proves the
    window empty — no within-key cross product ever forms, unlike the
    counting join."""
    P = 32
    DAY_US = 86_400_000_000

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "t": pa.array([], pa.int64()),
                   "orderkey": pa.array([], pa.int64()),
                   "oknull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_ev: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_ev:
            if "user_id" not in t.schema.names:
                return _E
            keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                                 pc.is_valid(t.column("ts")))
            t = t.filter(pc.fill_null(keep, False))
            key = t.column("user_id")
            n = t.num_rows
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "t": pc.cast(t.column("ts"), pa.int64()),
                "orderkey": pa.array(np.full(n, -1, np.int64)),
                "oknull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                             pc.is_valid(t.column("o_orderdate")))
        t = t.filter(pc.fill_null(keep, False))
        key = t.column("o_custkey")
        ok = t.column("o_orderkey")
        n = t.num_rows
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "t": pc.cast(t.column("o_orderdate"), pa.int64()),
            "orderkey": pc.fill_null(pc.cast(ok, pa.int64()), _IMAX),
            "oknull": pc.is_null(ok),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"orderkey": pd.Series(dtype="int64"),
                              "oknull": pd.Series(dtype="bool")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        odr = df[df["side"] == 1][["key", "t", "orderkey", "oknull"]] \
            .sort_values("t")
        if odr.empty:
            return empty
        evs = df[df["side"] == 0][["key", "t"]] \
            .rename(columns={"t": "ev_t"}).sort_values("ev_t")
        if evs.empty:
            return odr[["orderkey", "oknull"]]
        m = pd.merge_asof(odr, evs, left_on="t", right_on="ev_t",
                          by="key", direction="forward")
        quiet = m["ev_t"].isna() | (m["ev_t"] >= m["t"] + DAY_US)
        return m.loc[quiet, ["orderkey", "oknull"]]

    tagged = [(r, (True,)) for r in ev.to_arrow_refs()]
    tagged += [(r, (False,)) for r in od.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64")})
    out = pd.concat(parts, ignore_index=True)
    out = out.sort_values("orderkey").reset_index(drop=True)
    ok = out["orderkey"]
    if out["oknull"].any():
        ok = ok.astype("float64")
        ok[out["oknull"].to_numpy()] = np.nan
    return pd.DataFrame({"o_orderkey": ok.reset_index(drop=True)})


def q_monthly_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth — a window function ON TOP of an
    aggregate: per-batch Arrow (month → Σprice, valid-count) partials
    (months × batches rows), a driver fold, then lag()/pct-change over
    the tiny month series. Calendar months can't floor-divide from raw
    µs like hours, so the partial uses Arrow's floor_temporal.
    SQL division semantics: x/0 is NULL in DuckDB (probed), so a
    zero-revenue month yields NULL growth, and an all-NULL-price month
    keeps SQL's NULL sum via the sum-as-0 + valid-count carry."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    _E = pa.table({"mo": pa.array([], pa.int64()),
                   "s": pa.array([], pa.float64()),
                   "nv": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderdate" not in t.schema.names:
            return _E
        t = t.filter(pc.is_valid(t.column("o_orderdate")))
        if t.num_rows == 0:
            return _E
        mo = pc.cast(pc.floor_temporal(t.column("o_orderdate"),
                                       unit="month"), pa.int64())
        g = pa.table({"mo": mo, "v": t.column("o_totalprice")}) \
            .group_by(["mo"]).aggregate([("v", "sum"), ("v", "count")])
        return pa.table({
            "mo": g.column("mo"),
            "s": pc.cast(pc.fill_null(g.column("v_sum"), 0.0),
                         pa.float64()),
            "nv": pc.cast(g.column("v_count"), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    _EMPTY = pd.DataFrame({"month_start": pd.Series(dtype="int64"),
                           "revenue": pd.Series(dtype="float64"),
                           "pct_growth": pd.Series(dtype="float64")})
    if parts.empty:
        return _EMPTY.copy()
    g = (parts.groupby("mo", as_index=False)
         .agg(s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum"))
         .sort_values("mo").reset_index(drop=True))
    rev = g["s"].to_numpy(np.float64).copy()
    rev[g["nv"].to_numpy() == 0] = np.nan  # all-NULL month: SQL NULL
    prev = np.concatenate([[np.nan], rev[:-1]])
    with np.errstate(invalid="ignore", divide="ignore"):
        pct = 100.0 * (rev - prev) / prev
    pct[prev == 0.0] = np.nan  # DuckDB x/0 → NULL
    return pd.DataFrame({
        "month_start": g["mo"].to_numpy(np.int64) // 1_000_000,
        "revenue": round_away(rev, 2),
        "pct_growth": round_away(pct, 4)})


def q_activity_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: distribution of each user's LONGEST run of
    consecutive active calendar days (streak_days → n_users). The SQL
    twin is the row_number()-difference island trick; distributed it is
    a two-level aggregate like q123 — per-batch distinct (user, day)
    partials, one user-keyed exchange, and each bucket resolves its
    users' islands exactly (per-user day sets never straddle buckets),
    so the driver folds only (streak, count) histogram partials.
    Day = floored µs division (calendar floor, same as
    date_trunc('day') — int64 truncation would bin pre-1970 fractional
    timestamps one day late, CLAUDE.md hour-binning rule)."""
    P = 32
    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "d": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        us = t.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        day = us // DAY_US  # numpy int64 // is floored, not truncated
        g = (pa.table({"user": t.column("user_id"), "d": pa.array(day)})
             .group_by(["user", "d"]).aggregate([]))
        return pa.table({"user": g.column("user"), "d": g.column("d"),
                         "bucket": pc.bit_wise_and(g.column("user"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"streak": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = (pa.concat_tables(live).to_pandas()
              .drop_duplicates()             # int64 keys: hashing exact
              .sort_values(["user", "d"]))   # int64 multi-sort: exact
        u = df["user"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        new_run = np.ones(len(df), bool)
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        rid = np.cumsum(new_run) - 1
        run_len = np.bincount(rid).astype(np.int64)
        run_user = u[new_run]
        longest = pd.Series(run_len).groupby(
            pd.Series(run_user), sort=False).max()
        h, c = np.unique(longest.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"streak": h, "n": c.astype(np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"streak_days": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    out = (pd.concat(parts, ignore_index=True)
           .groupby("streak", as_index=False)["n"].sum()
           .rename(columns={"streak": "streak_days", "n": "n_users"}))
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("streak_days").reset_index(drop=True)


def q_interval_coverage(sf_dir: str, window_us: int = 1_800_000_000
                        ) -> pd.DataFrame:
    """Interval-union sweep: each event covers [ts, ts+30min); per user,
    the total covered µs after merging overlaps — the classic
    cumulative-max island sweep (SQL: max(f) OVER (… ROWS … 1
    PRECEDING) marks island breaks). One user-keyed exchange of (user,
    start) pairs; each bucket sorts its users once and resolves islands
    with a per-user running max — no within-user cross product, and tie
    rows (duplicate timestamps) are break-invariant because equal
    starts share an end. All-integer µs arithmetic end to end (a
    float64 leg would corrupt epochs past 2^53 — CLAUDE.md)."""
    P = 32
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "s": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        # duplicate (user, ts) rows are sweep-idempotent (f = s + const
        # shares an end) — distinct here shrinks the exchange for free
        g = (pa.table({"user": t.column("user_id"),
                       "s": pc.cast(t.column("ts"), pa.int64())})
             .group_by(["user", "s"]).aggregate([]))
        return pa.table({"user": g.column("user"), "s": g.column("s"),
                         "bucket": pc.bit_wise_and(g.column("user"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "covered_us": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user", "s"]))  # int64 multi-sort: exact
        u = df["user"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        f = s + window_us
        # per-user running max of f, shifted one row back: island break
        # where s exceeds every prior end (first row of a user always
        # breaks). cummax is per-user (pandas segment kernel).
        cm = df.assign(f=f).groupby("user", sort=False)["f"] \
               .cummax().to_numpy(np.int64)
        brk = np.ones(len(df), bool)
        brk[1:] = (u[1:] != u[:-1]) | (s[1:] > cm[:-1])
        starts = np.flatnonzero(brk)
        # island max end == per-user cummax at the island's last row
        # (every f in an island exceeds all prior islands' ends)
        last = np.r_[starts[1:] - 1, len(df) - 1]
        length = cm[last] - s[starts]
        per_user = pd.Series(length).groupby(
            pd.Series(u[starts]), sort=False).sum()
        return pd.DataFrame({
            "user_id": per_user.index.to_numpy(np.int64),
            "covered_us": per_user.to_numpy(np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "covered_us": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("user_id").reset_index(drop=True))


def q_welch_ttest(sf_dir: str, type_a: str = "click",
                  type_b: str = "purchase") -> pd.DataFrame:
    """Welch's two-sample t-test between two event types' values
    (unequal variances): t statistic + Welch–Satterthwaite dof. Moments
    stream as per-batch CENTERED (n, mean, M2) partials and Chan-merge
    driver-side (q92 contract — naive Σx² cancels catastrophically far
    from zero). Non-finite values are excluded on BOTH sides (DuckDB
    var_samp RAISES on NaN/±inf — q29 contract); x/0 → NULL like SQL
    (zero pooled variance, or n=1 making var_samp NULL)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    _E = pa.table({"side": pa.array([], pa.int8()),
                   "n": pa.array([], pa.float64()),
                   "m": pa.array([], pa.float64()),
                   "m2": pa.array([], pa.float64()),
                   "mn": pa.array([], pa.float64()),
                   "mx": pa.array([], pa.float64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        v = t.column("value")
        finite = pc.and_kleene(pc.is_valid(v),
                               pc.is_finite(v))
        rows = {"side": [], "n": [], "m": [], "m2": [], "mn": [], "mx": []}
        for side, name in ((0, type_a), (1, type_b)):
            sel = pc.fill_null(pc.and_kleene(
                pc.equal(t.column("event_type"), name), finite), False)
            x = v.filter(sel).to_numpy(zero_copy_only=False)
            if len(x) == 0:
                continue
            m = x.mean()
            d = x - m
            rows["side"].append(side)
            rows["n"].append(float(len(x)))
            rows["m"].append(m)
            rows["m2"].append(float(d @ d))
            rows["mn"].append(float(x.min()))
            rows["mx"].append(float(x.max()))
        return pa.table({"side": pa.array(rows["side"], pa.int8()),
                         "n": pa.array(rows["n"], pa.float64()),
                         "m": pa.array(rows["m"], pa.float64()),
                         "m2": pa.array(rows["m2"], pa.float64()),
                         "mn": pa.array(rows["mn"], pa.float64()),
                         "mx": pa.array(rows["mx"], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"n_a": pd.Series(dtype="int64"),
                          "n_b": pd.Series(dtype="int64"),
                          "t_stat": pd.Series(dtype="float64"),
                          "dof": pd.Series(dtype="float64")})
    if parts.empty:
        return empty

    def chan(g: pd.DataFrame):
        n = m = m2 = 0.0
        for r in g.itertuples(index=False):
            if n == 0.0:
                n, m, m2 = r.n, r.m, r.m2
                continue
            tot = n + r.n
            d = r.m - m
            m2 += r.m2 + d * d * (n * r.n / tot)
            m += d * r.n / tot
            n = tot
        return n, m, m2, g["mn"].min(), g["mx"].max()

    moms = {s: chan(g) for s, g in parts.groupby("side")}
    if 0 not in moms or 1 not in moms:
        return empty  # SQL inner cross join: either side absent → no row
    (na, ma, m2a, mna, mxa), (nb, mb, m2b, mnb, mxb) = moms[0], moms[1]
    # exact min==max constancy flags, not float-accumulated m2 ≈ 0:
    # per-batch means are inexact, so a CONSTANT column's d@d lands at
    # ~1e-31 and a naive se2>0 check emits a huge finite t where
    # DuckDB's var_samp is exactly 0 → x/0 → NULL (CLAUDE.md regr_r2
    # rule). n=1 still wins: var_samp(n=1) is NULL, not 0.
    va = np.nan if na <= 1.0 else (0.0 if mna == mxa else m2a / (na - 1.0))
    vb = np.nan if nb <= 1.0 else (0.0 if mnb == mxb else m2b / (nb - 1.0))
    se2 = va / na + vb / nb
    # DuckDB x/0 → NULL (probed, q130): zero pooled SE or zero dof
    # denominator yields NULL, never ±inf. A NaN se2 (either side has
    # n=1 → var_samp NULL) short-circuits before the dof denominator's
    # n−1 division can hit a Python-float ZeroDivisionError.
    if np.isnan(se2) or se2 <= 0.0:
        t = dof = np.nan
    else:
        t = (ma - mb) / np.sqrt(se2)
        dden = (va / na) ** 2 / (na - 1.0) + (vb / nb) ** 2 / (nb - 1.0)
        dof = se2 * se2 / dden if dden > 0.0 else np.nan
    return pd.DataFrame({
        "n_a": np.array([na], np.int64), "n_b": np.array([nb], np.int64),
        "t_stat": round_away(np.array([t]), 4),
        "dof": round_away(np.array([dof]), 4)})


def q_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                            year: int = 1996) -> pd.DataFrame:
    """TPC-H Q5 twin: revenue per nation where the CUSTOMER's and the
    SUPPLIER's nation coincide inside one region, for orders in one
    year. A three-exchange pipelined plan with ZERO broadcast of big
    sides: (1) customer⋈orders on custkey (customers pre-filtered to
    the region's nations — semi-join pushdown off the tiny dims), (2)
    that ⋈ lineitem on orderkey, pre-aggregated per (suppkey,
    cust-nation) before it leaves the bucket, (3) ⋈ supplier on suppkey
    with the cnation==snation equality resolved in-bucket. The driver
    folds only (nations × buckets) moment rows and applies the tiny
    nation/region dims (with SQL's duplicate-row fan-out multiplying
    like the join would). NULL revenue terms carry as sum-as-0 +
    valid-count so an all-NULL nation keeps SQL's NULL sum while a NaN
    price still poisons it (CLAUDE.md q85/q28 contract)."""
    P = 32
    lo = pa.scalar(pd.Timestamp(f"{year}-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{year + 1}-01-01").to_pydatetime(),
                   pa.timestamp("us"))

    # ---- tiny dims, driver-side: region ⋈ nation (duplicate rows of
    # either dim fan out multiplicatively, like the SQL join) ---------
    reg = _read_pd(sf_dir, "region", columns=["r_regionkey", "r_name"])
    reg = reg[(reg["r_name"] == region) & reg["r_regionkey"].notna()]
    rmult = reg.groupby("r_regionkey").size()
    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"])
    nat = nat[nat["n_nationkey"].notna() & nat["n_regionkey"].notna()]
    nat = nat.assign(w=nat["n_regionkey"].map(rmult).fillna(0)
                     .astype(np.int64))
    nat = nat[nat["w"] > 0]
    _EMPTY = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                           "revenue": pd.Series(dtype="float64")})
    if nat.empty:
        return _EMPTY
    asian = frozenset(nat["n_nationkey"].astype(np.int64).tolist())
    asian_arr = pa.array(sorted(asian), pa.int64())  # built once, not per block

    # ---- stage 1: customer ⋈ orders on custkey ----------------------
    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "orderkey": pa.array([], pa.int64()),
                    "cnat": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_cust: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_cust:
            if "c_custkey" not in t.schema.names:
                return _E1
            cn = pc.cast(t.column("c_nationkey"), pa.int64())
            keep = pc.and_kleene(
                pc.is_valid(t.column("c_custkey")),
                pc.is_in(cn, value_set=asian_arr))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            return pa.table({
                "key": t2.column("c_custkey"),
                "side": pa.array(np.zeros(n, np.int8)),
                "orderkey": pa.array(np.full(n, -1, np.int64)),
                "cnat": pc.cast(t2.column("c_nationkey"), pa.int64()),
                "bucket": pc.bit_wise_and(t2.column("c_custkey"), P - 1)})
        if "o_custkey" not in t.schema.names:
            return _E1
        od = t.column("o_orderdate")
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                          pc.is_valid(t.column("o_orderkey"))),
            pc.and_kleene(pc.greater_equal(od, lo), pc.less(od, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        return pa.table({
            "key": t2.column("o_custkey"),
            "side": pa.array(np.ones(n, np.int8)),
            "orderkey": pc.cast(t2.column("o_orderkey"), pa.int64()),
            "cnat": pa.array(np.zeros(n, np.int64)),
            "bucket": pc.bit_wise_and(t2.column("o_custkey"), P - 1)})

    _O1 = pa.table({"orderkey": pa.array([], pa.int64()),
                    "cnat": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        cust = df[df["side"] == 0][["key", "cnat"]]
        orders = df[df["side"] == 1][["key", "orderkey"]]
        if cust.empty or orders.empty:
            return _O1
        j = orders.merge(cust, on="key")  # int64 keys: hashing exact
        return pa.table({"orderkey": pa.array(
                             j["orderkey"].to_numpy(np.int64)),
                         "cnat": pa.array(j["cnat"].to_numpy(np.int64))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ lineitem on orderkey, pre-agg per (supp, cnat) --
    _E2 = pa.table({"okey": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "cnat": pa.array([], pa.int64()),
                    "suppkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.float64()),
                    "revnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E2
        if is_orders:
            if "orderkey" not in t.schema.names:
                return _E2
            n = t.num_rows
            return pa.table({
                "okey": t.column("orderkey"),
                "side": pa.array(np.zeros(n, np.int8)),
                "cnat": t.column("cnat"),
                "suppkey": pa.array(np.full(n, -1, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
                "revnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(t.column("orderkey"), P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E2
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_suppkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        # EXACT-INT money (CLAUDE.md sf>=1 rule, the q45 form):
        # price/discount sit on a 2dp grid, so the revenue term is
        # exact in 1e-4-dollar units — float sums flipped a half-cent
        # at the sf1 rounding boundary run-to-run
        cents = pc.round(pc.multiply(t2.column("l_extendedprice"),
                                     pa.scalar(100.0)))
        disc = pc.round(pc.multiply(t2.column("l_discount"),
                                    pa.scalar(100.0)))
        rev4 = pc.multiply(pc.cast(cents, pa.int64()),
                           pc.subtract(pa.scalar(100, pa.int64()),
                                       pc.cast(disc, pa.int64())))
        return pa.table({
            "okey": pc.cast(t2.column("l_orderkey"), pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
            "cnat": pa.array(np.zeros(n, np.int64)),
            "suppkey": pc.cast(t2.column("l_suppkey"), pa.int64()),
            "rev": pc.cast(pc.fill_null(rev4, 0), pa.int64()),
            "revnull": pc.is_null(rev4),
            "bucket": pc.bit_wise_and(pc.cast(t2.column("l_orderkey"),
                                              pa.int64()), P - 1)})

    _O2 = pa.table({"suppkey": pa.array([], pa.int64()),
                    "cnat": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64())})

    def merge2(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O2
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["okey", "cnat"]]
        line = df[df["side"] == 1][["okey", "suppkey", "rev", "revnull"]]
        if ords.empty or line.empty:
            return _O2
        j = line.merge(ords, on="okey")
        valid = ~j["revnull"].to_numpy()
        j = j.assign(rv=np.where(valid, j["rev"].to_numpy(),
                                 np.int64(0)),
                     nv=valid.astype(np.int64))
        g = j.groupby(["suppkey", "cnat"], as_index=False) \
             .agg(s=("rv", lambda x: x.to_numpy().sum()),
                  nv=("nv", "sum"))
        return pa.table({"suppkey": pa.array(g["suppkey"]
                                             .to_numpy(np.int64)),
                         "cnat": pa.array(g["cnat"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64)),
                         "nv": pa.array(g["nv"].to_numpy(np.int64))})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]
    ).to_arrow_refs()]
    stage2 = hash_shuffle(tagged2, split2, merge2, P=P, gather=False)

    # ---- stage 3: ⋈ supplier on suppkey, cnat==snat in-bucket -------
    _E3 = pa.table({"skey": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "cnat": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split3(t: pa.Table, is_partial: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E3
        if is_partial:
            if "suppkey" not in t.schema.names:
                return _E3
            n = t.num_rows
            return pa.table({
                "skey": t.column("suppkey"),
                "side": pa.array(np.zeros(n, np.int8)),
                "cnat": t.column("cnat"),
                "s": t.column("s"),
                "nv": t.column("nv"),
                "bucket": pc.bit_wise_and(t.column("suppkey"), P - 1)})
        if "s_suppkey" not in t.schema.names:
            return _E3
        sn = pc.cast(t.column("s_nationkey"), pa.int64())
        keep = pc.and_kleene(
            pc.is_valid(t.column("s_suppkey")),
            pc.is_in(sn, value_set=asian_arr))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        return pa.table({
            "skey": t2.column("s_suppkey"),
            "side": pa.array(np.ones(n, np.int8)),
            "cnat": pc.cast(t2.column("s_nationkey"), pa.int64()),
            "s": pa.array(np.zeros(n, np.int64)),
            "nv": pa.array(np.zeros(n, np.int64)),
            "bucket": pc.bit_wise_and(t2.column("s_suppkey"), P - 1)})

    def merge3(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"nat": pd.Series(dtype="int64"),
                              "s": pd.Series(dtype="int64"),
                              "nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["skey", "cnat", "s", "nv"]]
        supp = df[df["side"] == 1][["skey", "cnat"]] \
            .rename(columns={"cnat": "snat"})
        if part.empty or supp.empty:
            return empty
        # supplier multiplicity per (suppkey, nation): duplicate
        # supplier rows duplicate every joined lineitem row
        sm = supp.groupby(["skey", "snat"], as_index=False).size()
        j = part.merge(sm, left_on=["skey", "cnat"],
                       right_on=["skey", "snat"])
        if j.empty:
            return empty
        m = j["size"].to_numpy(np.int64)
        g = (j.assign(sw=j["s"].to_numpy() * m, nw=j["nv"].to_numpy() * m)
             .groupby("cnat", as_index=False)
             .agg(s=("sw", lambda x: x.to_numpy().sum()),
                  nv=("nw", "sum")))
        return pd.DataFrame({"nat": g["cnat"].to_numpy(np.int64),
                             "s": g["s"].to_numpy(np.int64),
                             "nv": g["nv"].to_numpy(np.int64)})

    tagged3 = [(r, (True,)) for r in stage2]
    tagged3 += [(r, (False,)) for r in _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged3, split3, merge3, P=P)
             if len(p)]
    if not parts:
        return _EMPTY
    tot = (pd.concat(parts, ignore_index=True)
           .groupby("nat", as_index=False)
           .agg(s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum")))
    # tiny-dim application: each nation row contributes weight w (its
    # region-join multiplicity); duplicate nationkeys fan out per row
    nn = nat.assign(nat=nat["n_nationkey"].astype(np.int64)) \
        .merge(tot, on="nat")
    if nn.empty:
        return _EMPTY
    # code-keyed groupby: pandas hashes object strings NUL-terminated
    # (would merge 'NAT' with 'NAT\x00x'), and default dropna=True
    # would drop a NULL n_name group SQL's GROUP BY keeps
    from .pairs import factorize_strings
    codes, uniq = factorize_strings(nn["n_name"], use_na_sentinel=False)
    g = (nn.assign(_c=codes,
                   sw=nn["s"].to_numpy() * nn["w"].to_numpy(),
                   nw=nn["nv"].to_numpy() * nn["w"].to_numpy())
         .groupby("_c", as_index=False)
         .agg(s=("sw", lambda x: x.to_numpy().sum()), nv=("nw", "sum")))
    names = pd.Series(uniq.to_numpy()[g["_c"].to_numpy()], dtype=object)
    # ONE division of the exact val4-int sum (~7e11 at sf1 — far
    # inside float64's exact-integer range)
    rev = g["s"].to_numpy(np.int64).astype(np.float64) / 10000.0
    rev[g["nv"].to_numpy() == 0] = np.nan  # all-NULL terms: SQL NULL sum
    # fast-path factorize hands a NULL unique back as float NaN
    out = pd.DataFrame({"n_name": names.where(names.notna(), None),
                        "revenue": round_away(rev, 2)})
    return out.sort_values("n_name",
                           na_position="last").reset_index(drop=True)


def q_all_priority_customers(sf_dir: str) -> pd.DataFrame:
    """Relational division: customers whose orders span ALL FIVE
    canonical priorities (÷ the full priority set), with their order
    count. Per-batch Arrow (cust, priority) group partials (full-byte
    string keys), one cust-keyed exchange, and the per-bucket distinct
    count runs on factorized int codes — pandas would silently merge
    NUL-containing priority strings (CLAUDE.md factorize rule)."""
    from .pairs import factorize_strings

    P = 32
    NEED = 5
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "prio": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                             pc.is_valid(t.column("o_orderpriority")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        g = (pa.table({"cust": t.column("o_custkey"),
                       "prio": t.column("o_orderpriority")})
             .group_by(["cust", "prio"]).aggregate([([], "count_all")]))
        return pa.table({"cust": g.column("cust"),
                         "prio": g.column("prio"),
                         "n": pc.cast(g.column("count_all"), pa.int64()),
                         "bucket": pc.bit_wise_and(g.column("cust"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                              "n_orders": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        codes, _ = factorize_strings(df["prio"], use_na_sentinel=False)
        g = (df.assign(_p=codes).groupby("cust")
             .agg(k=("_p", "nunique"), n=("n", "sum")))
        g = g[g["k"] == NEED]
        return pd.DataFrame({
            "c_custkey": g.index.to_numpy(np.int64),
            "n_orders": g["n"].to_numpy(np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "n_orders": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("c_custkey").reset_index(drop=True))


def q_chi2_independence(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-squared test of independence between event_type and
    hour-of-day: χ² = Σ_cells (o − e)²/e over the FULL r×c grid
    (zero-observed cells still contribute their expectation), dof =
    (r−1)(c−1). The contingency table streams as per-batch Arrow
    (type, hour) count partials — types × 24 rows per batch, nothing
    else shuffles — and the driver folds exact integer counts, so both
    sides derive χ² from identical margins. Hour-of-day floor-divides
    raw µs then takes a FLOORED mod 24 (numpy's %), which equals the
    calendar hour() for pre-1970 timestamps where a truncated C-style
    mod would go negative."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    _E = pa.table({"t": pa.array([], pa.string()),
                   "h": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("event_type")),
                             pc.is_valid(t.column("ts")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        us = t.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (us // 3_600_000_000) % 24  # floored // and % : calendar
        g = (pa.table({"t": t.column("event_type"), "h": pa.array(hr)})
             .group_by(["t", "h"]).aggregate([([], "count_all")]))
        return pa.table({"t": g.column("t"), "h": g.column("h"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    from .pairs import factorize_strings

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        # the oracle's ungrouped aggregate ALWAYS emits one row: on an
        # empty contingency table sum() is NULL and dof = (0−1)(0−1)=1
        return pd.DataFrame({"chi2": np.array([np.nan]),
                             "dof": np.array([1], np.int64)})
    codes, uniq = factorize_strings(parts["t"], use_na_sentinel=False)
    obs = (parts.assign(_c=codes)
           .groupby(["_c", "h"], as_index=False)["n"].sum())
    r = int(obs["_c"].max()) + 1
    grid = np.zeros((r, 24), np.float64)
    grid[obs["_c"].to_numpy(np.int64), obs["h"].to_numpy(np.int64)] = \
        obs["n"].to_numpy(np.float64)
    # only hours that actually occur form columns (SQL's margins come
    # from the observed table, not a synthetic 0–23 spine)
    col_live = grid.sum(axis=0) > 0
    grid = grid[:, col_live]
    rt = grid.sum(axis=1, keepdims=True)
    ct = grid.sum(axis=0, keepdims=True)
    tot = grid.sum()
    e = rt @ ct / tot
    chi2 = ((grid - e) ** 2 / e).sum()
    dof = np.int64((grid.shape[0] - 1) * (grid.shape[1] - 1))
    return pd.DataFrame({"chi2": round_away(np.array([chi2]), 4),
                         "dof": np.array([dof], np.int64)})


def q_top_session_paths(sf_dir: str, k: int = 20,
                        gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Sequence mining: the top-k most frequent session PATHS — the
    '>'-joined event_type sequence of each session (>30-min gap splits,
    q07's window), ordered (ts, event_type) so duplicate timestamps
    are deterministic on both sides. Two chained exchanges: (1) events
    hash-partition on user; each bucket sessionizes with one chained
    stable sort + vectorized gap/cumsum, builds one string per session
    (the output IS per-session strings — the joins run over contiguous
    slices), and pre-counts (path, n); (2) path-keyed exchange (blake2b
    bucket — never salted hash()) totals each path in exactly one
    bucket and keeps a local top-k, so the driver folds P·k rows.
    Path keys go through factorized codes everywhere (NUL rule)."""
    from .pairs import factorize_strings, str_u64

    P = 32
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    _E1 = pa.table({"user": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                    "typ": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.is_valid(t.column("ts"))),
            pc.is_valid(t.column("event_type")))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"user": t.column("user_id"),
                         "t": pc.cast(t.column("ts"), pa.int64()),
                         "typ": t.column("event_type"),
                         "bucket": pc.bit_wise_and(t.column("user_id"),
                                                   P - 1)})

    _O1 = pa.table({"path": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        # CHAINED stable single-column sorts (multi-key object sort
        # would hash NUL-terminated): type, then ts, then user
        df = (df.sort_values("typ", kind="stable")
              .sort_values("t", kind="stable")
              .sort_values("user", kind="stable"))
        u = df["user"].to_numpy(np.int64)
        tt = df["t"].to_numpy(np.int64)
        brk = np.ones(len(df), bool)
        brk[1:] = (u[1:] != u[:-1]) | (tt[1:] - tt[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(df)]
        types = df["typ"].to_numpy()
        paths = [">".join(types[a:b]) for a, b in zip(starts, ends)]
        codes, uniq = factorize_strings(pd.Series(paths, dtype=object))
        cnt = np.bincount(codes).astype(np.int64)
        upaths = uniq.to_numpy()
        bkt = np.fromiter((str_u64(s) & (P - 1) for s in upaths),
                          np.int64, len(upaths))
        return pa.table({"path": pa.array(upaths, pa.string()),
                         "n": pa.array(cnt),
                         "bucket": pa.array(bkt)})

    def split2(t: pa.Table) -> pa.Table:
        return t if t.num_rows else _O1

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"path": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["path"])
        tot = np.bincount(codes, weights=df["n"].to_numpy(np.float64)) \
            .astype(np.int64)
        g = pd.DataFrame({"path": uniq.to_numpy(), "n": tot})
        # local top-k: each path totals in exactly one bucket, so the
        # global top-k is a subset of the per-bucket top-k unions
        g = (g.sort_values("path", kind="stable")
             .sort_values("n", kind="stable", ascending=False))
        return g.head(k).reset_index(drop=True)

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)
    parts = [p for p in hash_shuffle([(r, ()) for r in stage1],
                                     split2, merge2, P=P) if len(p)]
    empty = pd.DataFrame({"path": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    out = (out.sort_values("path", kind="stable")
           .sort_values("n", kind="stable", ascending=False))
    out["n"] = out["n"].astype("int64")
    return out.head(k).reset_index(drop=True)


def q_type_jaccard(sf_dir: str) -> pd.DataFrame:
    """Pairwise set similarity: Jaccard between every two event types'
    USER sets (|A∩B| / |A∪B|). Per-batch distinct (user, type) partials
    → one user-keyed exchange → each bucket builds a users × types
    indicator matrix and gets ALL pairwise intersection counts from one
    Mᵀ·M matmul (no per-user pair loop); the driver folds T² pair
    partials and T singles. Pair orientation is byte order (UTF-8
    comparison matches DuckDB's VARCHAR '<'), and every string-keyed
    fold runs on factorized codes (NUL rule). Integer division mirrors
    DuckDB's int/int → DOUBLE."""
    from .pairs import factorize_strings

    P = 32
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("event_type")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        g = (pa.table({"user": t.column("user_id"),
                       "typ": t.column("event_type")})
             .group_by(["user", "typ"]).aggregate([]))
        return pa.table({"user": g.column("user"), "typ": g.column("typ"),
                         "bucket": pc.bit_wise_and(g.column("user"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"ta": pd.Series(dtype="object"),
                              "tb": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        # cross-batch duplicate (user, type) pairs dedup on FACTORIZED
        # codes only — a raw-string drop_duplicates hashes NUL-
        # terminated and silently merges 'a' with 'a\x00b'
        tcodes, tuniq = factorize_strings(df["typ"],
                                          use_na_sentinel=False)
        df = df.assign(_t=tcodes).drop_duplicates(subset=["user", "_t"])
        ucodes, _ = pd.factorize(df["user"])
        T = len(tuniq)
        M = np.zeros((int(ucodes.max()) + 1 if len(df) else 0, T),
                     np.int64)
        M[ucodes, df["_t"].to_numpy()] = 1
        inter = M.T @ M  # (T, T): diagonal = singles, off = pair ∩
        names = tuniq.to_numpy()
        rows = {"ta": [], "tb": [], "n": []}
        for i in range(T):
            rows["ta"].append(names[i])
            rows["tb"].append(names[i])
            rows["n"].append(int(inter[i, i]))
            for j in range(T):
                # zero-intersection pairs never exist in the SQL join
                # (it only produces rows for SHARED users) — emit the
                # positive cells only
                if i != j and inter[i, j] > 0 \
                        and str(names[i]) < str(names[j]):
                    rows["ta"].append(names[i])
                    rows["tb"].append(names[j])
                    rows["n"].append(int(inter[i, j]))
        return pd.DataFrame({"ta": pd.Series(rows["ta"], dtype=object),
                             "tb": pd.Series(rows["tb"], dtype=object),
                             "n": np.array(rows["n"], np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    empty = pd.DataFrame({"type_a": pd.Series(dtype="object"),
                          "type_b": pd.Series(dtype="object"),
                          "n_both": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    ca, ua = factorize_strings(allp["ta"], use_na_sentinel=False)
    cb, ub = factorize_strings(allp["tb"], use_na_sentinel=False)
    g = (allp.assign(_a=ca, _b=cb).groupby(["_a", "_b"], as_index=False)
         ["n"].sum())
    na = ua.to_numpy()[g["_a"].to_numpy()]
    nb = ub.to_numpy()[g["_b"].to_numpy()]
    singles = {str(a): int(n) for a, b, n in
               zip(na, nb, g["n"].to_numpy()) if str(a) == str(b)}
    pairs = [(str(a), str(b), int(n)) for a, b, n in
             zip(na, nb, g["n"].to_numpy()) if str(a) != str(b)]
    if not pairs:
        return empty
    pairs.sort()
    ta = [p[0] for p in pairs]
    tb = [p[1] for p in pairs]
    both = np.array([p[2] for p in pairs], np.int64)
    union = np.array([singles[a] + singles[b] for a, b, _ in pairs],
                     np.int64) - both
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = both.astype(np.float64) / union.astype(np.float64)
    return pd.DataFrame({
        "type_a": pd.Series(ta, dtype=object),
        "type_b": pd.Series(tb, dtype=object),
        "n_both": both,
        "jaccard": round_away(jac, 4)})


def q_unpivot_lineitem(sf_dir: str) -> pd.DataFrame:
    """Wide-to-long UNPIVOT: each lineitem row explodes into one
    (measure, val) row per non-NULL measure column — SQL's UNPIVOT
    NULL-exclusion semantics via the explicit UNION ALL twin. Pure
    per-batch reshape, zero shuffle; at scale this is the canonical
    'melt before a long-format aggregate' stage."""
    MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber"] + MEASURES)

    _E = pa.table({"l_orderkey": pa.array([], pa.int64()),
                   "l_linenumber": pa.array([], pa.int32()),
                   "measure": pa.array([], pa.string()),
                   "val": pa.array([], pa.float64())})

    def melt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return _E
        outs = []
        for m in MEASURES:
            keep = pc.is_valid(t.column(m))  # UNPIVOT drops NULL cells
            s = t.filter(keep)
            outs.append(pa.table({
                "l_orderkey": pc.cast(s.column("l_orderkey"), pa.int64()),
                "l_linenumber": pc.cast(s.column("l_linenumber"),
                                        pa.int32()),
                "measure": pa.array([m[2:]] * s.num_rows, pa.string()),
                "val": pc.cast(s.column(m), pa.float64())}))
        return pa.concat_tables(outs)

    out = ds.map_batches(melt, batch_format="pyarrow").to_pandas()
    if out.empty:
        return _E.to_pandas()
    # measure values are fixed ASCII literals — plain multi-sort is
    # exact here, but chain single-column stable sorts anyway (rule)
    out = (out.sort_values("measure", kind="stable")
           .sort_values("l_linenumber", kind="stable",
                        na_position="last")
           .sort_values("l_orderkey", kind="stable",
                        na_position="last"))
    return out.reset_index(drop=True)


def q_rolling_stddev(sf_dir: str, window: int = 5) -> pd.DataFrame:
    """Windowed second moment: per-type rolling stddev_samp over the
    last ``window`` rows ordered (ts, event_id) — the moving-volatility
    shape. One type-keyed exchange; each bucket computes every window
    EXACTLY from ``window`` shifted columns centered per row (never a
    cumsum-of-squares difference, which cancels catastrophically —
    CLAUDE.md q92 rule). Non-finite values and NULL keys are excluded
    on BOTH sides (DuckDB stddev raises on NaN/±inf); n=1 windows are
    NULL like var_samp."""
    from .pairs import factorize_strings, str_u64

    P = 32
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "ts", "value"])

    _E = pa.table({"eid": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "t": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_id")),
                          pc.is_valid(t.column("ts"))),
            pc.and_kleene(pc.is_valid(t.column("event_type")),
                          pc.fill_null(pc.is_finite(t.column("value")),
                                       False)))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        typ = t.column("event_type")
        codes, uniq = factorize_strings(typ.to_pandas())
        ub = np.array([str_u64(s) & (P - 1) for s in uniq], np.int64)
        return pa.table({"eid": pc.cast(t.column("event_id"), pa.int64()),
                         "typ": typ,
                         "t": pc.cast(t.column("ts"), pa.int64()),
                         "v": pc.cast(t.column("value"), pa.float64()),
                         "bucket": pa.array(ub[codes])})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "event_type": pd.Series(dtype="object"),
                              "mstd": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["typ"])
        df = (df.assign(_c=codes)
              .sort_values("eid", kind="stable")
              .sort_values("t", kind="stable")
              .sort_values("_c", kind="stable"))
        c = df["_c"].to_numpy()
        v = df["v"].to_numpy(np.float64)
        n = len(df)
        run_start = np.zeros(n, np.int64)
        new = np.ones(n, bool)
        new[1:] = c[1:] != c[:-1]
        run_start[new] = np.flatnonzero(new)
        run_start = np.maximum.accumulate(run_start)
        r = np.arange(n) - run_start  # index within type run
        # window rows as `window` shifted columns, masked to the run
        lags = np.full((window, n), np.nan)
        for j in range(window):
            ok = r >= j
            lags[j, ok] = v[np.flatnonzero(ok) - j]
        cnt = np.minimum(r + 1, window).astype(np.float64)
        m = np.nansum(lags, axis=0) / cnt
        dev = lags - m  # NaN rows stay NaN, excluded by nansum
        ss = np.nansum(dev * dev, axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.sqrt(ss / (cnt - 1.0))
        std[cnt < 2] = np.nan  # stddev_samp(n=1) is NULL
        return pd.DataFrame({
            "event_id": df["eid"].to_numpy(np.int64),
            "event_type": df["typ"].to_numpy(),
            "mstd": round_away(std, 4)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "event_type": pd.Series(dtype="object"),
                             "mstd": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


def q_revenue_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-customer revenue — the inequality
    statistic needs a GLOBAL sorted prefix-sum: (1) per-batch
    (custkey, Σprice) partials → one custkey exchange for exact
    per-customer totals, (2) ONE Dataset.sort all-to-all over the
    (rev, custkey) totals (the q108 pattern: refs come off the
    materialized sort, not a re-executed map), (3) per-block raw tasks
    return (n, Σx, Σ(local_i·x)); the driver converts local ranks to
    global with q60-style prefix offsets — Σ(i·x) = Σ_blocks
    [offset·Σx + Σ(local_i·x)] — and applies the closed form
    G = 2·Σ(i·x)/(n·Σx) − (n+1)/n. Ties in rev are Σ(i·x)-invariant,
    so the custkey tie-break only pins the sort, not the value.
    Contract: revenues are money (non-negative) — with mixed signs a
    total that cancels to ~0 is order-dependent in the last ulp, and
    the x/0→NULL boundary would be data-dependent on both sides."""
    import ray
    import ray.data as rd

    P = 32
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    _E = pa.table({"k": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                             pc.is_valid(t.column("o_totalprice")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        g = (pa.table({"k": t.column("o_custkey"),
                       "rev": t.column("o_totalprice")})
             .group_by(["k"]).aggregate([("rev", "sum")]))
        return pa.table({"k": g.column("k"),
                         "rev": pc.cast(g.column("rev_sum"),
                                        pa.float64()),
                         "bucket": pc.bit_wise_and(g.column("k"),
                                                   P - 1)})

    def merge(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pa.table({"k": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        df = pa.concat_tables(live).to_pandas()
        # factorize + np.add.at (q85 pattern): vectorized NaN-
        # propagating group sum — pandas' groupby.sum would skip NaN
        # and a per-group lambda dispatches Python once per customer
        codes, uniq = pd.factorize(df["k"])
        sums = np.zeros(len(uniq), np.float64)
        np.add.at(sums, codes, df["rev"].to_numpy(np.float64))
        return pa.table({"k": pa.array(uniq.to_numpy(np.int64)),
                         "rev": pa.array(sums)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    totals = hash_shuffle(tagged, split, merge, P=P, gather=False)

    empty = pd.DataFrame({"gini": pd.Series(dtype="float64"),
                          "n_customers": pd.Series(dtype="int64")})
    srt = (rd.from_arrow_refs(totals).sort(["rev", "k"])
           .materialize())
    refs = srt.to_arrow_refs()

    @ray.remote
    def block_part(t: pa.Table):
        if t.num_rows == 0 or "rev" not in t.schema.names:
            return 0, 0.0, 0.0
        x = t.column("rev").to_numpy(zero_copy_only=False)
        li = np.arange(1, len(x) + 1, dtype=np.float64)  # 1-based local
        return len(x), float(x.sum()), float((li * x).sum())

    parts = ray.get([block_part.remote(r) for r in refs])
    n = sum(p[0] for p in parts)
    if n == 0:
        return empty
    tot = sum(p[1] for p in parts)
    six = 0.0
    offset = 0
    for cnt, sx, slix in parts:
        six += offset * sx + slix
        offset += cnt
    if tot == 0.0:
        return pd.DataFrame({"gini": np.array([np.nan]),
                             "n_customers": np.array([n], np.int64)})
    gini = 2.0 * six / (n * tot) - (n + 1.0) / n
    return pd.DataFrame({"gini": round_away(np.array([gini]), 6),
                         "n_customers": np.array([n], np.int64)})


def _ntile_of_ranks(ranks: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL ntile(k) over 0-based global ranks: the first n%k tiles get
    ⌈n/k⌉ rows, the rest ⌊n/k⌋ (probed DuckDB tiling)."""
    big = n // k + 1
    n_big = n % k
    cut = n_big * big
    small = max(n // k, 1)
    return np.where(ranks < cut, ranks // big + 1,
                    n_big + (ranks - cut) // small + 1).astype(np.int64)


def q_rfm_segments(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """RFM customer segmentation: per-customer recency (last order
    date), frequency (order count) and monetary (revenue sum), each
    quartiled with SQL ntile(k) ORDER BY metric, custkey. One custkey
    exchange builds the exact per-customer triple; each metric then
    takes ONE Dataset.sort over (metric, custkey) and per-block raw
    tasks convert q60-style global rank offsets to tile ids — ranks
    are never collected, only (customer, tile) rows. NULL metrics sort
    LAST via the int64-max sentinel (q116 rule: a float64+NaN leg
    would corrupt ids past 2^53); an all-NULL-price customer's
    monetary is SQL NULL and ties after every real sum."""
    import ray
    import ray.data as rd

    P = 32
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "dt": pa.array([], pa.int64()),
                   "freq": pa.array([], pa.int64()),
                   "mon": pa.array([], pa.int64()),
                   "nv": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        t = t.filter(pc.is_valid(t.column("o_custkey")))
        if t.num_rows == 0:
            return _E
        dt = pc.fill_null(pc.cast(t.column("o_orderdate"), pa.int64()),
                          np.iinfo(np.int64).min)  # min: max() ignores
        price = t.column("o_totalprice")
        # EXACT integer cents (q45 rule): the ntile ORDER BY (mon, k)
        # is last-ulp-sensitive under float partial sums at sf>=1 —
        # adjacent near-equal monetary totals swapped order and moved
        # a quartile boundary
        mon_c = pc.cast(pc.round(pc.multiply(
            pc.fill_null(price, 0.0), pa.scalar(100.0))), pa.int64())
        g = (pa.table({"key": t.column("o_custkey"), "dt": dt,
                       "mon0": mon_c,
                       "nv": pc.cast(pc.is_valid(price), pa.int64())})
             .group_by(["key"])
             .aggregate([("dt", "max"), ([], "count_all"),
                         ("mon0", "sum"), ("nv", "sum")]))
        return pa.table({
            "key": g.column("key"),
            "dt": g.column("dt_max"),
            "freq": pc.cast(g.column("count_all"), pa.int64()),
            "mon": pc.cast(g.column("mon0_sum"), pa.int64()),
            "nv": pc.cast(g.column("nv_sum"), pa.int64()),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "dt": pa.array([], pa.int64()),
                          "freq": pa.array([], pa.int64()),
                          "mon": pa.array([], pa.int64()),
                          "mnull": pa.array([], pa.int8())})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = pd.factorize(df["key"])
        nc = len(uniq)
        dt = np.full(nc, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(dt, codes, df["dt"].to_numpy(np.int64))
        # all-NULL-date customer: sentinel min → NULL → sorts LAST
        dt[dt == np.iinfo(np.int64).min] = np.iinfo(np.int64).max
        freq = np.zeros(nc, np.int64)
        np.add.at(freq, codes, df["freq"].to_numpy(np.int64))
        mon = np.zeros(nc, np.int64)
        np.add.at(mon, codes, df["mon"].to_numpy(np.int64))
        nv = np.zeros(nc, np.int64)
        np.add.at(nv, codes, df["nv"].to_numpy(np.int64))
        return pa.table({"key": pa.array(uniq.to_numpy(np.int64)),
                         "dt": pa.array(dt), "freq": pa.array(freq),
                         "mon": pa.array(mon),
                         "mnull": pa.array((nv == 0).astype(np.int8))})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    cust_refs = hash_shuffle(tagged, split, merge, P=P, gather=False)
    base = rd.from_arrow_refs(cust_refs).materialize()
    n = base.count()
    empty = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                          "r_q": pd.Series(dtype="int64"),
                          "f_q": pd.Series(dtype="int64"),
                          "m_q": pd.Series(dtype="int64")})
    if n == 0:
        return empty

    @ray.remote
    def block_tiles(t: pa.Table, offset: int, total: int, kk: int):
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64())})
        ranks = np.arange(offset, offset + t.num_rows)
        return pa.table({"key": t.column("key"),
                         "tile": pa.array(_ntile_of_ranks(ranks, total,
                                                          kk))})

    def rank_pass(sort_cols: list) -> pd.DataFrame:
        srt = base.sort(sort_cols).materialize()
        refs = srt.to_arrow_refs()
        sizes = ray.get([ray.remote(lambda t: t.num_rows).remote(r)
                         for r in refs])
        outs, off = [], 0
        for r, sz in zip(refs, sizes):
            outs.append(block_tiles.remote(r, off, n, k))
            off += sz
        return pa.concat_tables(ray.get(outs)).to_pandas()

    rq = rank_pass(["dt", "key"]).rename(columns={"tile": "r_q"})
    fq = rank_pass(["freq", "key"]).rename(columns={"tile": "f_q"})
    mq = rank_pass(["mnull", "mon", "key"]).rename(columns={"tile": "m_q"})
    out = rq.merge(fq, on="key").merge(mq, on="key")
    out = out.rename(columns={"key": "c_custkey"})
    # driver-side 3-way merge is O(customers) — the cluster
    # continuation co-partitions the three tile passes on custkey
    return (out[["c_custkey", "r_q", "f_q", "m_q"]]
            .sort_values("c_custkey").reset_index(drop=True))


def q_daily_locf(sf_dir: str) -> pd.DataFrame:
    """Forward-fill (LOCF) onto a per-user DAILY spine: for each day
    from the user's first active day to their last event, the value of
    the latest event at-or-before that day's midnight — the
    time-series gap-fill shape. Ties on (user, ts) are collapsed to
    max(value) FIRST on both sides (DuckDB's ASOF pick among tied
    right rows is implementation-defined) — np.maximum.at, because a
    pandas groupby max would SKIP a NaN that SQL's total-order max
    propagates. One user-keyed exchange; each bucket dedups, builds
    its users' spines from int64 day arithmetic (floored division —
    calendar floor for pre-1970), and fills with one keyed
    merge_asof."""
    P = 32
    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "t": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.is_valid(t.column("ts"))),
            pc.is_valid(t.column("value")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        return pa.table({"user": t.column("user_id"),
                         "t": pc.cast(t.column("ts"), pa.int64()),
                         "v": pc.cast(t.column("value"), pa.float64()),
                         "bucket": pc.bit_wise_and(t.column("user_id"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "day_us": pd.Series(dtype="int64"),
                              "filled": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        u = df["user"].to_numpy(np.int64)
        ts = df["t"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((ts, u))
        u, ts, v = u[order], ts[order], v[order]
        new = np.ones(len(u), bool)
        new[1:] = (u[1:] != u[:-1]) | (ts[1:] != ts[:-1])
        gid = np.cumsum(new) - 1
        vmax = np.full(gid[-1] + 1, -np.inf)
        np.maximum.at(vmax, gid, v)  # NaN propagates like SQL's max
        du, dts = u[new], ts[new]
        # per-user spine: first day floor → last event ts, step 1 day
        ustart = np.flatnonzero(np.r_[True, du[1:] != du[:-1]])
        uend = np.r_[ustart[1:], len(du)]
        lo_day = dts[ustart] // DAY_US
        n_days = (dts[uend - 1] - lo_day * DAY_US) // DAY_US + 1
        off = np.r_[0, np.cumsum(n_days)]
        total = int(off[-1])
        day = (np.arange(total) - np.repeat(off[:-1], n_days)
               + np.repeat(lo_day, n_days))
        s_user = np.repeat(du[ustart], n_days)
        # merge_asof needs BOTH frames globally sorted on the `on` key
        # (by= only scopes the match, not the sort requirement)
        spine = pd.DataFrame({"user": s_user, "t": day * DAY_US}) \
            .sort_values("t", kind="stable")
        ev = pd.DataFrame({"user": du, "t": dts, "v": vmax}) \
            .sort_values("t", kind="stable")
        m = pd.merge_asof(spine, ev, on="t", by="user",
                          direction="backward")
        return pd.DataFrame({"user_id": m["user"].to_numpy(np.int64),
                             "day_us": m["t"].to_numpy(np.int64),
                             "filled": m["v"].to_numpy(np.float64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "day_us": pd.Series(dtype="int64"),
                             "filled": pd.Series(dtype="float64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values(["user_id", "day_us"]).reset_index(drop=True))


def q_entity_conflicts(sf_dir: str) -> pd.DataFrame:
    """Data-quality check: customer keys bound to MORE THAN ONE
    distinct name (entity-resolution conflicts). q135's division
    shape: per-batch Arrow (key, name) group partials (full-byte
    string keys), one key exchange, factorized distinct count per
    bucket — a NUL-suffixed name variant is a CONFLICT, which pandas'
    C-string hashing would silently hide."""
    from .pairs import factorize_strings

    P = 32
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "name": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("c_custkey")),
                             pc.is_valid(t.column("c_name")))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        g = (pa.table({"key": t.column("c_custkey"),
                       "name": t.column("c_name")})
             .group_by(["key", "name"]).aggregate([]))
        return pa.table({"key": g.column("key"), "name": g.column("name"),
                         "bucket": pc.bit_wise_and(g.column("key"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                              "n_names": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        codes, _ = factorize_strings(df["name"], use_na_sentinel=False)
        g = df.assign(_n=codes).groupby("key")["_n"].nunique()
        g = g[g > 1]
        return pd.DataFrame({"c_custkey": g.index.to_numpy(np.int64),
                             "n_names": g.to_numpy(np.int64)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "n_names": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("c_custkey").reset_index(drop=True))


def q_value_shape(sf_dir: str) -> pd.DataFrame:
    """Per-type distribution-shape stats: sample skewness + excess
    kurtosis of event values (SQL ``skewness()``/``kurtosis()`` twins —
    DuckDB's formulas probed as the bias-corrected G1/G2, i.e. pandas
    ``.skew()``/``.kurt()``). One streaming pass: each batch emits
    CENTERED (n, mean, M2, M3, M4) partials per event type — higher
    moments from a per-batch local mean never cancel like raw Σx³/Σx⁴
    would — and the driver folds them with Pébay's parallel update
    (the order-3/4 generalization of q92's Chan merge). Parity
    contracts carried over from the moment family: non-finite values
    masked to NULL INSIDE the aggregate on both sides (DuckDB raises
    'SKEW is out of range!' on ±inf, returns garbage on NaN — probed),
    var=0 detected with exact min==max flags (skew AND kurt are NULL
    for a constant group at any n — probed on [2,2,2,2]), n<3 → NULL
    skew, n<4 → NULL kurt, NULL event_type kept as a group, and
    full-byte string group keys via factorize_strings."""
    from .pairs import factorize_strings

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    _MOMS = ("n", "m", "m2", "m3", "m4", "vmin", "vmax")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          **{c: pa.array([], pa.float64())
                             for c in _MOMS}})
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return empty
        ok = pc.fill_null(pc.and_kleene(
            pc.is_valid(t.column("value")),
            pc.is_finite(t.column("value"))), False)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "v": t.column("value").to_numpy(zero_copy_only=False),
            "ok": ok.to_numpy(zero_copy_only=False)})

        def mom(g: pd.DataFrame) -> pd.Series:
            x = g.loc[g["ok"], "v"].to_numpy(np.float64)
            if not len(x):
                # all-NULL/non-finite type still surfaces its GROUP BY
                # row (n=0 marker), like q92's zero-valid partial
                return pd.Series({"n": 0.0, "m": 0.0, "m2": 0.0,
                                  "m3": 0.0, "m4": 0.0,
                                  "vmin": np.nan, "vmax": np.nan})
            m = x.mean()
            d = x - m
            d2 = d * d
            return pd.Series({"n": float(len(x)), "m": m,
                              "m2": float(d2.sum()),
                              "m3": float((d2 * d).sum()),
                              "m4": float((d2 * d2).sum()),
                              "vmin": float(x.min()),
                              "vmax": float(x.max())})

        codes, uniq = factorize_strings(df["event_type"],
                                        use_na_sentinel=False)
        g = (df.assign(_c=codes).groupby("_c")
             .apply(mom, include_groups=False).reset_index())
        g["event_type"] = uniq.to_numpy()[g["_c"].to_numpy()]
        return pa.table({"event_type": pa.Array.from_pandas(
                             g["event_type"], type=pa.string()),
                         **{c: pa.array(g[c].to_numpy()
                                        .astype(np.float64))
                            for c in _MOMS}})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "skew": pd.Series(dtype="float64"),
            "kurt": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)

    def pebay(g: pd.DataFrame) -> pd.Series:
        n = m = m2 = m3 = m4 = 0.0
        for r in g.itertuples(index=False):
            nb = r.n
            if nb == 0.0:
                continue
            if n == 0.0:
                n, m, m2, m3, m4 = nb, r.m, r.m2, r.m3, r.m4
                continue
            tot = n + nb
            d = r.m - m
            d2 = d * d
            # Pébay's pairwise update, order 4 before 3 before 2 so
            # each line reads the PRE-merge lower moments
            m4 += (r.m4
                   + d2 * d2 * n * nb * (n * n - n * nb + nb * nb)
                   / (tot * tot * tot)
                   + 6.0 * d2 * (n * n * r.m2 + nb * nb * m2)
                   / (tot * tot)
                   + 4.0 * d * (n * r.m3 - nb * m3) / tot)
            m3 += (r.m3 + d * d2 * n * nb * (n - nb) / (tot * tot)
                   + 3.0 * d * (n * r.m2 - nb * m2) / tot)
            m2 += r.m2 + d2 * (n * nb / tot)
            m += d * nb / tot
            n = tot
        return pd.Series({"n": n, "m": m, "m2": m2, "m3": m3, "m4": m4,
                          "vmin": g["vmin"].min(),
                          "vmax": g["vmax"].max()})

    pcodes, puniq = factorize_strings(parts["event_type"],
                                      use_na_sentinel=False)
    mt = (parts.assign(_c=pcodes).groupby("_c")
          .apply(pebay, include_groups=False).reset_index())
    mt["event_type"] = puniq.to_numpy()[mt["_c"].to_numpy()]
    n = mt["n"].to_numpy()
    m2 = mt["m2"].to_numpy()
    m3 = mt["m3"].to_numpy()
    m4 = mt["m4"].to_numpy()
    const = (mt["vmin"] == mt["vmax"]).to_numpy()  # exact var=0 flag
    with np.errstate(invalid="ignore", divide="ignore"):
        s2 = m2 / n                       # population variance
        g1 = (m3 / n) / (s2 ** 1.5)
        skew = np.where((n < 3.0) | const, np.nan,
                        g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0))
        g2 = (m4 / n) / (s2 * s2) - 3.0
        kurt = np.where((n < 4.0) | const, np.nan,
                        ((n + 1.0) * g2 + 6.0) * (n - 1.0)
                        / ((n - 2.0) * (n - 3.0)))
    out = pd.DataFrame({"event_type": mt["event_type"],
                        "n": n.astype(np.int64),
                        "skew": round_away(skew, 6),
                        "kurt": round_away(kurt, 6)})
    out["event_type"] = out["event_type"].astype(object).where(
        out["event_type"].notna(), None)
    return out.sort_values("event_type", na_position="last") \
        .reset_index(drop=True)


def q_order_percentiles(sf_dir: str) -> pd.DataFrame:
    """Per-customer relative standing of every order:
    ``percent_rank()`` + ``cume_dist()`` OVER (PARTITION BY o_custkey
    ORDER BY o_totalprice). One custkey exchange, then fully
    vectorized rank arithmetic per bucket (lexsort + boundary
    bincounts — no per-group dispatch). Window-order parity probed in
    DuckDB: ASC is NULLS LAST, and the total order is
    finite < +inf < NaN (all NaN are PEERS) < NULL (peers, last) —
    encoded as a (2·is_null + is_nan, value) composite key so NaN and
    NULL never collapse into one tie group. percent_rank of a
    single-row partition is 0.0 (probed), not NULL; pr/cd divisions
    are the same small-int IEEE divides DuckDB runs, so no rounding
    is needed. Nullable BIGINT ids follow the q43/q49 dtype contract
    (float64 only when a NULL is actually present)."""
    P = 32
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    _COLS = ("cust", "cnull", "okey", "onull", "vfill", "vclass")

    def _empty() -> pa.Table:
        return pa.table({"cust": pa.array([], pa.int64()),
                         "cnull": pa.array([], pa.int8()),
                         "okey": pa.array([], pa.int64()),
                         "onull": pa.array([], pa.int8()),
                         "vfill": pa.array([], pa.float64()),
                         "vclass": pa.array([], pa.int8()),
                         "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _empty()
        cust = t.column("o_custkey")
        okey = t.column("o_orderkey")
        v = t.column("o_totalprice")
        vnull = pc.is_null(v)
        vnan = pc.fill_null(pc.is_nan(v), False)
        vclass = pc.add(
            pc.multiply(pc.cast(vnull, pa.int8()), pa.scalar(2, pa.int8())),
            pc.cast(vnan, pa.int8()))
        return pa.table({
            "cust": pc.fill_null(cust, 0),
            "cnull": pc.cast(pc.is_null(cust), pa.int8()),
            "okey": pc.fill_null(okey, 0),
            "onull": pc.cast(pc.is_null(okey), pa.int8()),
            # NaN/NULL rows carry a 0.0 filler so lexsort never sees NaN
            "vfill": pc.if_else(pc.equal(vclass, 0),
                                pc.fill_null(v, 0.0), 0.0),
            "vclass": vclass,
            "bucket": pc.fill_null(
                pc.bit_wise_and(cust, P - 1), 0)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame()
        t = pa.concat_tables(live)
        a = {c: t.column(c).to_numpy(zero_copy_only=False) for c in _COLS}
        order = np.lexsort((a["vfill"], a["vclass"], a["cust"], a["cnull"]))
        cust = a["cust"][order]; cnull = a["cnull"][order]
        vf = a["vfill"][order]; vc = a["vclass"][order]
        n = len(order)
        new_grp = np.ones(n, bool)
        new_grp[1:] = (cust[1:] != cust[:-1]) | (cnull[1:] != cnull[:-1])
        new_tie = new_grp | np.concatenate(
            ([True], (vf[1:] != vf[:-1]) | (vc[1:] != vc[:-1])))
        gid = np.cumsum(new_grp) - 1
        gfirst = np.flatnonzero(new_grp)[gid]
        gcount = np.bincount(gid)[gid].astype(np.float64)
        tid = np.cumsum(new_tie) - 1
        tfirst = np.flatnonzero(new_tie)[tid]
        tcount = np.bincount(tid)[tid]
        rmin = (tfirst - gfirst + 1).astype(np.float64)
        rmax = (tfirst + tcount - 1 - gfirst + 1).astype(np.float64)
        with np.errstate(invalid="ignore"):
            pr = np.where(gcount > 1.0, (rmin - 1.0) / (gcount - 1.0), 0.0)
        cd = rmax / gcount
        return pd.DataFrame({
            "cust": cust, "cnull": cnull,
            "okey": a["okey"][order], "onull": a["onull"][order],
            "pr": pr, "cd": cd})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    cols = {"o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "pr": pd.Series(dtype="float64"),
            "cd": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)

    def _nullable(vals: np.ndarray, isnull: np.ndarray) -> pd.Series:
        # q43/q49 dtype contract: float64+NaN only when NULLs exist
        if isnull.any():
            out = vals.astype(np.float64)
            out[isnull.astype(bool)] = np.nan
            return pd.Series(out)
        return pd.Series(vals)

    out = pd.DataFrame({
        "o_orderkey": _nullable(df["okey"].to_numpy(np.int64),
                                df["onull"].to_numpy()),
        "o_custkey": _nullable(df["cust"].to_numpy(np.int64),
                               df["cnull"].to_numpy()),
        "pr": df["pr"].to_numpy(), "cd": df["cd"].to_numpy()})
    return out.sort_values(["o_custkey", "o_orderkey", "pr"],
                           na_position="last").reset_index(drop=True)


def q_brand_price_means(sf_dir: str) -> pd.DataFrame:
    """Geometric + harmonic mean retail price per brand — the
    log-domain / reciprocal-domain members of the mean family. One
    streaming pass: per-batch (brand, n, Σln x, Σ1/x) partials
    (factorize_strings keys), tiny driver fold, closed forms
    exp(Σln/n) and n/Σ(1/x). Both sides restrict to x > 0 in the WHERE
    (DuckDB ln() RAISES on zero and negative input — probed) which
    also drops NULL/NaN/-inf; +inf survives the filter on both sides
    (ln(+inf)=+inf → gm=+inf, 1/+inf=0). Results rounded half-away at
    6: the distributed Σln merge differs from DuckDB's sequential
    accumulator in the last ulp (continuous values, q133 contract)."""
    from .pairs import factorize_strings

    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"brand": pa.array([], pa.string()),
                          "n": pa.array([], pa.float64()),
                          "sln": pa.array([], pa.float64()),
                          "srec": pa.array([], pa.float64())})
        if t.num_rows == 0 or "p_brand" not in t.schema.names:
            return empty
        x0 = t.column("p_retailprice")
        keep = pc.fill_null(pc.and_kleene(pc.greater(x0, 0.0),
                                          pc.is_finite(x0)), False)
        t = t.filter(keep)
        if t.num_rows == 0:
            return empty
        df = pd.DataFrame({
            "brand": t.column("p_brand").to_pandas(),
            "x": t.column("p_retailprice").to_numpy(zero_copy_only=False)})
        codes, uniq = factorize_strings(df["brand"], use_na_sentinel=False)
        x = df["x"].to_numpy(np.float64)
        nb = len(uniq)
        cnt = np.bincount(codes, minlength=nb).astype(np.float64)
        sln = np.bincount(codes, weights=np.log(x), minlength=nb)
        srec = np.bincount(codes, weights=1.0 / x, minlength=nb)
        return pa.table({"brand": pa.Array.from_pandas(
                             pd.Series(uniq), type=pa.string()),
                         "n": pa.array(cnt), "sln": pa.array(sln),
                         "srec": pa.array(srec)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"p_brand": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "gm": pd.Series(dtype="float64"),
            "hm": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    pcodes, puniq = factorize_strings(parts["brand"], use_na_sentinel=False)
    nb = len(puniq)
    n = np.bincount(pcodes, weights=parts["n"].to_numpy(), minlength=nb)
    sln = np.bincount(pcodes, weights=parts["sln"].to_numpy(),
                      minlength=nb)
    srec = np.bincount(pcodes, weights=parts["srec"].to_numpy(),
                       minlength=nb)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        gm = np.exp(sln / n)
        hm = n / srec
    out = pd.DataFrame({"p_brand": pd.Series(puniq, dtype=object),
                        "n": n.astype(np.int64),
                        "gm": round_away(gm, 6),
                        "hm": round_away(hm, 6)})
    out["p_brand"] = out["p_brand"].astype(object).where(
        out["p_brand"].notna(), None)
    return out.sort_values("p_brand", na_position="last") \
        .reset_index(drop=True)


def q_bitwise_event_ids(sf_dir: str) -> pd.DataFrame:
    """Per-type ``bit_and``/``bit_or``/``bit_xor`` over event ids —
    exact-integer aggregates whose two's-complement numpy kernels are
    bit-identical to DuckDB's (probed on negative ids). All three are
    associative + commutative, so per-batch partials fold driver-side
    in any order with zero shuffle. NULL ids are ignored but an
    all-NULL type still emits its row with NULL aggregates; the
    oracle CASTs the BIGINT results to DOUBLE so the dtype stops
    depending on whether such a group exists (q103 contract), and the
    int64→float64 rounding is the same IEEE conversion on both
    sides."""
    from .pairs import factorize_strings

    ds = _read(sf_dir, "events", columns=["event_type", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "ba": pa.array([], pa.int64()),
                          "bo": pa.array([], pa.int64()),
                          "bx": pa.array([], pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return empty
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "ok": pc.is_valid(t.column("event_id"))
                    .to_numpy(zero_copy_only=False),
            # filler 0 rows are masked by ok before any fold below
            "i": pc.fill_null(t.column("event_id"), 0)
                   .to_numpy(zero_copy_only=False)})
        codes, uniq = factorize_strings(df["event_type"],
                                        use_na_sentinel=False)

        def fold(g: pd.DataFrame) -> pd.Series:
            x = g.loc[g["ok"], "i"].to_numpy(np.int64)
            if not len(x):
                return pd.Series({"n": 0, "ba": 0, "bo": 0, "bx": 0})
            return pd.Series({"n": len(x),
                              "ba": int(np.bitwise_and.reduce(x)),
                              "bo": int(np.bitwise_or.reduce(x)),
                              "bx": int(np.bitwise_xor.reduce(x))})

        g = (df.assign(_c=codes).groupby("_c")
             .apply(fold, include_groups=False).reset_index())
        g["event_type"] = uniq.to_numpy()[g["_c"].to_numpy()]
        return pa.table({"event_type": pa.Array.from_pandas(
                             g["event_type"], type=pa.string()),
                         **{c: pa.array(g[c].to_numpy(np.int64))
                            for c in ("n", "ba", "bo", "bx")}})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "ba": pd.Series(dtype="float64"),
            "bo": pd.Series(dtype="float64"),
            "bx": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)

    def fold2(g: pd.DataFrame) -> pd.Series:
        live = g[g["n"] > 0]
        if live.empty:
            return pd.Series({"n": 0, "ba": np.nan, "bo": np.nan,
                              "bx": np.nan})
        return pd.Series({
            "n": int(live["n"].sum()),
            "ba": float(np.bitwise_and.reduce(
                live["ba"].to_numpy(np.int64))),
            "bo": float(np.bitwise_or.reduce(
                live["bo"].to_numpy(np.int64))),
            "bx": float(np.bitwise_xor.reduce(
                live["bx"].to_numpy(np.int64)))})

    pcodes, puniq = factorize_strings(parts["event_type"],
                                      use_na_sentinel=False)
    m = (parts.assign(_c=pcodes).groupby("_c")
         .apply(fold2, include_groups=False).reset_index())
    m["event_type"] = puniq.to_numpy()[m["_c"].to_numpy()]
    out = pd.DataFrame({"event_type": m["event_type"],
                        "n": m["n"].to_numpy(np.int64),
                        "ba": m["ba"].to_numpy(np.float64),
                        "bo": m["bo"].to_numpy(np.float64),
                        "bx": m["bx"].to_numpy(np.float64)})
    out["event_type"] = out["event_type"].astype(object).where(
        out["event_type"].notna(), None)
    return out.sort_values("event_type", na_position="last") \
        .reset_index(drop=True)


def q_orderkey_gaps(sf_dir: str) -> pd.DataFrame:
    """Missing o_orderkey ranges (sequence-gap audit — the
    ``lead() OVER (ORDER BY k)`` adjacency query) WITHOUT a global
    sort: keys are RANGE-bucketed off the parquet column statistics
    (q60's contiguous-bucket layout; distributed min/max fallback),
    each bucket emits its internal gaps from one vectorized
    np.diff over its sorted distinct keys, and the driver stitches
    only the P (lo, hi) bucket envelopes — cross-bucket gaps fall out
    of consecutive envelopes because range buckets tile the key space
    in order (hash buckets could not do this). Assumes the id span
    fits int64 arithmetic (span · P < 2^63, the q60 density
    contract)."""
    import pyarrow.parquet as pq_
    import os as _os

    P = 32
    ds = _read(sf_dir, "orders", columns=["o_orderkey"])
    path = _os.path.join(sf_dir, "orders.parquet")
    cols = {"gap_start": pd.Series(dtype="int64"),
            "gap_end": pd.Series(dtype="int64"),
            "n_missing": pd.Series(dtype="int64")}
    try:
        md = pq_.read_metadata(path)
        idx = next(i for i in range(md.row_group(0).num_columns)
                   if md.row_group(0).column(i).path_in_schema
                   == "o_orderkey")
        stats = [md.row_group(g).column(idx).statistics
                 for g in range(md.num_row_groups)]
        assert stats and all(s is not None and s.has_min_max
                             for s in stats)
        kmin = min(s.min for s in stats)
        kmax = max(s.max for s in stats)
    except Exception:
        # writer omitted stats — one column-pruned distributed pass
        kmin = _read(sf_dir, "orders",
                     columns=["o_orderkey"]).min("o_orderkey")
        kmax = _read(sf_dir, "orders",
                     columns=["o_orderkey"]).max("o_orderkey")
    if kmin is None or kmax is None:
        return pd.DataFrame(cols)
    span = int(kmax) - int(kmin) + 1

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        k = pc.unique(t.column("o_orderkey").combine_chunks())
        k = k.filter(pc.is_valid(k))
        kn = k.to_numpy(zero_copy_only=False)
        b = (kn - kmin) * P // span
        return pa.table({"k": k, "bucket": pa.array(b, pa.int64())})

    def merge(*tabs):
        live = [x.column("k") for x in tabs if x.num_rows]
        if not live:
            return None
        u = np.unique(pa.concat_arrays(
            [c.combine_chunks() for c in live]).to_numpy(
                zero_copy_only=False))
        d = np.diff(u)
        i = np.flatnonzero(d > 1)
        gaps = pd.DataFrame({"gap_start": u[i] + 1,
                             "gap_end": u[i + 1] - 1,
                             "n_missing": d[i] - 1})
        return gaps, int(u[0]), int(u[-1])

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    outs = [o for o in hash_shuffle(tagged, split, merge, P=P)
            if o is not None]
    if not outs:
        return pd.DataFrame(cols)
    frames = [o[0] for o in outs]
    # range buckets tile the keyspace in bucket order: stitch the
    # inter-bucket gaps from consecutive (lo, hi) envelopes
    for (_, _, hi), (_, lo, _) in zip(outs, outs[1:]):
        if lo > hi + 1:
            frames.append(pd.DataFrame({"gap_start": [hi + 1],
                                        "gap_end": [lo - 1],
                                        "n_missing": [lo - hi - 1]}))
    frames = [f for f in frames if len(f)]
    if not frames:  # dense keyspace: zero gaps
        return pd.DataFrame(cols)
    out = pd.concat(frames, ignore_index=True)
    return (out.astype(np.int64).sort_values("gap_start")
            .reset_index(drop=True))


def q_user_drawdown(sf_dir: str) -> pd.DataFrame:
    """Per-user maximum drawdown of cumulative event value — the
    nested-window composition max(runmax − cum) where cum is a
    running sum and runmax its running max, both over
    (PARTITION BY user_id ORDER BY ts, event_id). One user-keyed
    exchange, then fully vectorized segmented scans per bucket.
    Exactness contracts: values become integer CENTS on both sides
    (CAST(round(value·100) AS BIGINT) — q95's exact-int trick; a
    float running sum would drift from DuckDB's sequential
    accumulator), non-finite values are WHERE-filtered on both sides
    (the cast raises on NaN/±inf), and the window's default RANGE
    frame makes (ts, event_id) TIES peers — every tied row gets the
    whole peer-group's sum, which the engine reproduces with
    tie-group cumsums, so duplicate timestamps stay deterministic.
    NULL user_id is its own partition; NULL ts/event_id order last
    (probed window NULLS LAST contract)."""
    P = 32
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def _empty() -> pa.Table:
        return pa.table({"user": pa.array([], pa.int64()),
                         "unull": pa.array([], pa.int8()),
                         "ts": pa.array([], pa.int64()),
                         "tnull": pa.array([], pa.int8()),
                         "eid": pa.array([], pa.int64()),
                         "enull": pa.array([], pa.int8()),
                         "cents": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _empty()
        v = t.column("value")
        keep = pc.fill_null(pc.is_finite(v), False)
        t = t.filter(keep)
        if t.num_rows == 0:
            return _empty()
        cents = pc.cast(pc.round(
            pc.multiply(t.column("value"), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        u, ts, e = t.column("user_id"), t.column("ts"), t.column("event_id")
        return pa.table({
            "user": pc.fill_null(u, 0),
            "unull": pc.cast(pc.is_null(u), pa.int8()),
            "ts": pc.fill_null(pc.cast(ts, pa.int64()), 0),
            "tnull": pc.cast(pc.is_null(ts), pa.int8()),
            "eid": pc.fill_null(e, 0),
            "enull": pc.cast(pc.is_null(e), pa.int8()),
            "cents": cents,
            "bucket": pc.fill_null(pc.bit_wise_and(u, P - 1), 0)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame()
        t = pa.concat_tables(live)
        cols = {c: t.column(c).to_numpy(zero_copy_only=False)
                for c in ("user", "unull", "ts", "tnull", "eid",
                          "enull", "cents")}
        # NULLS LAST on both window keys: the null flag is the major
        # component of each composite key
        order = np.lexsort((cols["eid"], cols["enull"], cols["ts"],
                            cols["tnull"], cols["user"], cols["unull"]))
        u = cols["user"][order]; un = cols["unull"][order]
        ts = cols["ts"][order]; tn = cols["tnull"][order]
        e = cols["eid"][order]; en = cols["enull"][order]
        c = cols["cents"][order]
        n = len(order)
        new_grp = np.ones(n, bool)
        new_grp[1:] = (u[1:] != u[:-1]) | (un[1:] != un[:-1])
        new_tie = new_grp | np.concatenate(
            ([True], (ts[1:] != ts[:-1]) | (tn[1:] != tn[:-1])
             | (e[1:] != e[:-1]) | (en[1:] != en[:-1])))
        gid = np.cumsum(new_grp) - 1
        tid = np.cumsum(new_tie) - 1
        # RANGE-frame ties: each row's cum covers its WHOLE peer group
        # (exact: cents magnitudes stay far below 2^53, so the float64
        # bincount weights round-trip losslessly)
        tie_sum = np.bincount(
            tid, weights=c.astype(np.float64)).astype(np.int64)
        # per-tie-group user-group id = gid at the tie group's first row
        tie_gid = gid[np.flatnonzero(new_tie)]
        # segmented cumsum of tie sums within each user group: subtract
        # each group's incoming global prefix
        cum_tie = np.cumsum(tie_sum)
        grp_start = np.concatenate(([True], tie_gid[1:] != tie_gid[:-1]))
        starts = np.flatnonzero(grp_start)
        base_per_grp = np.concatenate(
            ([0], cum_tie[starts[1:] - 1])).astype(np.int64)
        cum_seg = cum_tie - base_per_grp[tie_gid]
        # segmented running max of cum_seg within each group
        runmax = _segmented_running_max(cum_seg, tie_gid)
        dd_tie = runmax - cum_seg
        # fold per group: max drawdown + row count
        ng = int(gid[-1]) + 1
        dd = np.full(ng, 0, np.int64)
        np.maximum.at(dd, tie_gid, dd_tie)
        cnt = np.bincount(gid, minlength=ng)
        gfirstrow = np.flatnonzero(new_grp)
        return pd.DataFrame({
            "user": u[gfirstrow], "unull": un[gfirstrow],
            "n": cnt.astype(np.int64),
            "dd": dd.astype(np.float64) / 100.0})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    cols = {"user_id": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "max_drawdown": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    isnull = df["unull"].to_numpy().astype(bool)
    if isnull.any():
        uid = df["user"].to_numpy().astype(np.float64)
        uid[isnull] = np.nan
    else:
        uid = df["user"].to_numpy(np.int64)
    out = pd.DataFrame({"user_id": uid,
                        "n": df["n"].to_numpy(np.int64),
                        "max_drawdown": df["dd"].to_numpy()})
    return out.sort_values("user_id", na_position="last") \
        .reset_index(drop=True)


def _segmented_running_max(x: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """Running max of ``x`` restarting at each change of ``seg``
    (sorted segment ids), vectorized: offset each segment by a huge
    stride so a global maximum.accumulate cannot leak across
    boundaries, then remove the stride."""
    if not len(x):
        return x
    # stride must dominate the value range; cents magnitudes are far
    # below 2^40, segments below 2^20
    stride = np.int64(1) << np.int64(42)
    shifted = x + seg * stride
    return np.maximum.accumulate(shifted) - seg * stride


def q_price_outlier_fences(sf_dir: str) -> pd.DataFrame:
    """Tukey IQR outlier fences per brand: Q1/Q3 (quantile_cont), the
    1.5·IQR fences, and how many prices fall outside them. q124's
    exact-order-statistics shape — one groupby shuffle carrying
    (brand, price), per-group sort + interpolation in DuckDB's own op
    order, fence arithmetic written identically on both sides so the
    comparisons are bit-exact. NULL/NaN prices are excluded on both
    sides (q57 contract); ±inf remain orderable extremes, and when
    BOTH quantiles are the same infinity the IQR is inf−inf = NaN —
    DuckDB's comparison total order then calls x < NaN TRUE and
    x > NaN FALSE (probed), which the engine special-cases."""
    from .relational import (_null_safe_keys, _quantile_cont,
                             _restore_null_keys)

    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    _FE = pa.table({"p_brand": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "q1": pa.array([], pa.float64()),
                    "q3": pa.array([], pa.float64()),
                    "n_outliers": pa.array([], pa.int64())})

    def fences(t: pa.Table) -> pa.Table:
        v = np.sort(t.column("p_retailprice").to_numpy(
            zero_copy_only=False).astype(np.float64))
        if len(v) == 0:
            return _FE
        q1 = _quantile_cont(v, 0.25)
        q3 = _quantile_cont(v, 0.75)
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)
        lo_m = np.ones(len(v), bool) if np.isnan(lo) else (v < lo)
        hi_m = np.zeros(len(v), bool) if np.isnan(hi) else (v > hi)
        return pa.table({
            "p_brand": pa.array([t.column("p_brand")[0].as_py()],
                                pa.string()),
            "n": pa.array([len(v)], pa.int64()),
            "q1": pa.array([float(q1)], pa.float64()),
            "q3": pa.array([float(q3)], pa.float64()),
            "n_outliers": pa.array([int((lo_m | hi_m).sum())],
                                   pa.int64())})

    def drop_bad(t: pa.Table) -> pa.Table:
        # q57-family contract: drop NULL/NaN prices, keep ±inf;
        # fill_null because is_nan(NULL) is NULL, not False
        if t.num_rows == 0 or "p_retailprice" not in t.schema.names:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "p_retailprice": pa.array([], pa.float64())})
        v = t.column("p_retailprice")
        return t.filter(pc.fill_null(pc.invert(pc.is_nan(v)), False))

    out = (_null_safe_keys(ds.map_batches(drop_bad,
                                          batch_format="pyarrow"),
                           ["p_brand"])
           .groupby("p_brand")
           .map_groups(fences, batch_format="pyarrow").to_pandas())
    out = _with_cols(out, {"p_brand": "object", "n": "int64",
                           "q1": "float64", "q3": "float64",
                           "n_outliers": "int64"})
    out = _restore_null_keys(out, ["p_brand"])
    out["n"] = out["n"].astype("int64")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    return out.sort_values("p_brand",
                           na_position="last").reset_index(drop=True)


def q_returned_item_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 twin: revenue lost to returned items ('R' lineitems)
    per (customer, nation) for one order quarter. Two-exchange plan:
    (1) lineitem(R) ⋈ orders(quarter window) hash-partitioned on
    orderkey, pre-aggregated per custkey before leaving the bucket
    (sum-as-0 + valid-count so an all-NULL revenue group keeps SQL's
    NULL sum — q134 contract); (2) those per-custkey partials ⋈
    customer on custkey, duplicate customer rows fanning out like the
    SQL join. The tiny nation dim is applied driver-side with its own
    duplicate-row fan-out, and the final GROUP BY runs on full-byte
    string codes (pairs.coded_keys) because c_name / n_name can carry
    embedded NULs in the adversarial world."""
    from .pairs import coded_keys

    P = 32
    lo = pa.scalar(pd.Timestamp("1996-07-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-10-01").to_pydatetime(),
                   pa.timestamp("us"))
    _EMPTY = pd.DataFrame({
        "c_custkey": pd.Series(dtype="int64"),
        "c_name": pd.Series(dtype="object"),
        "revenue": pd.Series(dtype="float64"),
        "c_acctbal": pd.Series(dtype="float64"),
        "n_name": pd.Series(dtype="object")})

    # ---- stage 1: lineitem(R) ⋈ orders on orderkey ------------------
    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "cust": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.float64()),
                    "revnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E1
            od = t.column("o_orderdate")
            keep = pc.and_kleene(
                pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                              pc.is_valid(t.column("o_custkey"))),
                pc.and_kleene(pc.greater_equal(od, lo), pc.less(od, hi)))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            return pa.table({
                "key": pc.cast(t2.column("o_orderkey"), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
                "cust": pc.cast(t2.column("o_custkey"), pa.int64()),
                "rev": pa.array(np.zeros(n, np.float64)),
                "revnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(pc.cast(t2.column("o_orderkey"),
                                                  pa.int64()), P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(
            pc.is_valid(t.column("l_orderkey")),
            pc.equal(t.column("l_returnflag"), "R"))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        # exact-cents terms (1e-4 units): prices/discounts are 2dp
        # decimals, so the per-group sum is an exact integer on both
        # sides — a float-product sum once landed one ulp from a .xx5
        # half boundary and flipped the 2dp rounding vs the oracle
        rev = pc.multiply(
            pc.round(pc.multiply(t2.column("l_extendedprice"),
                                 pa.scalar(100.0, pa.float64()))),
            pc.subtract(pa.scalar(100.0, pa.float64()),
                        pc.round(pc.multiply(t2.column("l_discount"),
                                             pa.scalar(100.0,
                                                       pa.float64())))))
        return pa.table({
            "key": pc.cast(t2.column("l_orderkey"), pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
            "cust": pa.array(np.full(n, -1, np.int64)),
            "rev": pc.cast(pc.fill_null(rev, 0.0), pa.float64()),
            "revnull": pc.is_null(rev),
            "bucket": pc.bit_wise_and(pc.cast(t2.column("l_orderkey"),
                                              pa.int64()), P - 1)})

    _O1 = pa.table({"cust": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["key", "cust"]]
        line = df[df["side"] == 1][["key", "rev", "revnull"]]
        if ords.empty or line.empty:
            return _O1
        j = line.merge(ords, on="key")  # int64 keys: hashing exact
        valid = ~j["revnull"].to_numpy()
        g = (j.assign(rv=np.where(valid, j["rev"].to_numpy(), 0.0),
                      nv=valid.astype(np.int64))
             .groupby("cust", as_index=False)
             .agg(s=("rv", lambda x: x.to_numpy().sum()),
                  nv=("nv", "sum")))
        return pa.table({"cust": pa.array(g["cust"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.float64)),
                         "nv": pa.array(g["nv"].to_numpy(np.int64))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ customer on custkey -----------------------------
    _E2 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "acct": pa.array([], pa.float64()),
                    "acctnull": pa.array([], pa.bool_()),
                    "cnat": pa.array([], pa.int64()),
                    "cnatnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table, is_partial: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E2
        if is_partial:
            if "cust" not in t.schema.names:
                return _E2
            n = t.num_rows
            return pa.table({
                "key": t.column("cust"),
                "side": pa.array(np.zeros(n, np.int8)),
                "s": t.column("s"),
                "nv": t.column("nv"),
                "name": pa.array([None] * n, pa.string()),
                "acct": pa.array(np.zeros(n, np.float64)),
                "acctnull": pa.array(np.zeros(n, bool)),
                "cnat": pa.array(np.zeros(n, np.int64)),
                "cnatnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(t.column("cust"), P - 1)})
        if "c_custkey" not in t.schema.names:
            return _E2
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("c_custkey")),
                                   False))
        n = t2.num_rows
        acct = t2.column("c_acctbal")
        cnat = pc.cast(t2.column("c_nationkey"), pa.int64())
        return pa.table({
            "key": t2.column("c_custkey"),
            "side": pa.array(np.ones(n, np.int8)),
            "s": pa.array(np.zeros(n, np.float64)),
            "nv": pa.array(np.zeros(n, np.int64)),
            "name": t2.column("c_name"),
            "acct": pc.cast(pc.fill_null(acct, 0.0), pa.float64()),
            "acctnull": pc.is_null(acct),
            "cnat": pc.fill_null(cnat, -1),
            "cnatnull": pc.is_null(cnat),
            "bucket": pc.bit_wise_and(t2.column("c_custkey"), P - 1)})

    def merge2(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pa.table({"cust": pa.array([], pa.int64()),
                          "name": pa.array([], pa.string()),
                          "acct": pa.array([], pa.float64()),
                          "acctnull": pa.array([], pa.bool_()),
                          "cnat": pa.array([], pa.int64()),
                          "cnatnull": pa.array([], pa.bool_()),
                          "s": pa.array([], pa.float64()),
                          "nv": pa.array([], pa.int64())})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "s", "nv"]]
        cust = df[df["side"] == 1][["key", "name", "acct", "acctnull",
                                    "cnat", "cnatnull"]]
        if part.empty or cust.empty:
            return empty
        # fold the per-bucket partials to one row per custkey, THEN
        # fan out over (possibly duplicated) customer rows like SQL
        agg = part.groupby("key", as_index=False).agg(
            s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum"))
        j = cust.merge(agg, on="key")
        return pa.table({
            "cust": pa.array(j["key"].to_numpy(np.int64)),
            "name": pa.array(j["name"].to_numpy(object), pa.string()),
            "acct": pa.array(j["acct"].to_numpy(np.float64)),
            "acctnull": pa.array(j["acctnull"].to_numpy(bool)),
            "cnat": pa.array(j["cnat"].to_numpy(np.int64)),
            "cnatnull": pa.array(j["cnatnull"].to_numpy(bool)),
            "s": pa.array(j["s"].to_numpy(np.float64)),
            "nv": pa.array(j["nv"].to_numpy(np.int64))})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).to_arrow_refs()]
    import ray
    parts = [p.to_pandas() for p in
             ray.get(hash_shuffle(tagged2, split2, merge2, P=P,
                                  gather=False))]
    parts = [p for p in parts if len(p)]
    if not parts:
        return _EMPTY
    df = pd.concat(parts, ignore_index=True)

    # ---- tiny dim: ⋈ nation on nationkey (dup rows fan out) ---------
    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name"])
    nat = nat[nat["n_nationkey"].notna()]
    nat = nat.assign(cnat=nat["n_nationkey"].astype(np.int64))
    df = df[~df["cnatnull"].to_numpy()]  # inner join drops NULL keys
    j = df.merge(nat[["cnat", "n_name"]], on="cnat")
    if j.empty:
        return _EMPTY

    j2, restore = coded_keys(
        j.rename(columns={"name": "c_name"}), ["c_name", "n_name"])
    g = (j2.groupby(["cust", "c_name", "acct", "acctnull", "n_name"],
                    as_index=False, dropna=False)
         .agg(s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum")))
    rev = g["s"].to_numpy(np.float64) / 10000.0  # e4 units -> currency
    rev[g["nv"].to_numpy() == 0] = np.nan  # all-NULL terms: SQL NULL sum
    acct = g["acct"].to_numpy(np.float64).copy()
    acct[g["acctnull"].to_numpy(bool)] = np.nan
    out = restore(g)
    out = pd.DataFrame({"c_custkey": out["cust"].to_numpy(np.int64),
                        "c_name": out["c_name"],
                        "revenue": round_away(rev, 2),
                        "c_acctbal": acct,
                        "n_name": out["n_name"]})
    return out.sort_values(["c_custkey", "revenue"],
                           na_position="last").reset_index(drop=True)


def q_large_volume_orders(sf_dir: str, min_qty: float = 300.0) -> pd.DataFrame:
    """TPC-H Q18 twin: orders whose total lineitem quantity exceeds a
    threshold, with their customer. One orderkey exchange does BOTH the
    HAVING semi-join and the outer re-aggregation: lineitem blocks
    pre-aggregate (orderkey → qty-sum partial) per split task, the
    bucket merge folds partials, applies the threshold in DuckDB's
    comparison total order (``~(s <= T)`` so a NaN sum counts as
    greater, probed), and joins the surviving order rows. A second
    exchange on custkey attaches customer names; the driver's final
    GROUP BY (name, custkey, orderkey, odate, totalprice) reproduces
    SQL's duplicate-row fan-out arithmetic. Quantities in both worlds
    sit on a .5 grid, so the double sums are exact in any order."""
    from .pairs import coded_keys

    P = 32
    _EMPTY = pd.DataFrame({
        "c_name": pd.Series(dtype="object"),
        "c_custkey": pd.Series(dtype="int64"),
        "o_orderkey": pd.Series(dtype="int64"),
        "odate_us": pd.Series(dtype="float64"),
        "o_totalprice": pd.Series(dtype="float64"),
        "sum_qty": pd.Series(dtype="float64")})

    # ---- stage 1: lineitem qty partials ⋈ orders on orderkey --------
    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "cust": pa.array([], pa.int64()),
                    "od": pa.array([], pa.int64()),
                    "odnull": pa.array([], pa.bool_()),
                    "tp": pa.array([], pa.float64()),
                    "tpnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E1
            keep = pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                                 pc.is_valid(t.column("o_custkey")))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            od = t2.column("o_orderdate")
            tp = t2.column("o_totalprice")
            return pa.table({
                "key": pc.cast(t2.column("o_orderkey"), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
                "s": pa.array(np.zeros(n, np.float64)),
                "nv": pa.array(np.zeros(n, np.int64)),
                "cust": pc.cast(t2.column("o_custkey"), pa.int64()),
                "od": pc.fill_null(pc.cast(od, pa.int64()), 0),
                "odnull": pc.is_null(od),
                "tp": pc.cast(pc.fill_null(tp, 0.0), pa.float64()),
                "tpnull": pc.is_null(tp),
                "bucket": pc.bit_wise_and(pc.cast(t2.column("o_orderkey"),
                                                  pa.int64()), P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E1
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("l_orderkey")),
                                   False))
        if t2.num_rows == 0:
            return _E1
        qty = t2.column("l_quantity")
        g = (pa.table({"key": pc.cast(t2.column("l_orderkey"), pa.int64()),
                       "q": pc.cast(pc.fill_null(qty, 0.0), pa.float64()),
                       "v": pc.cast(pc.is_valid(qty), pa.int64())})
             .group_by("key").aggregate([("q", "sum"), ("v", "sum")]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "s": g.column("q_sum"),
            "nv": g.column("v_sum"),
            "cust": pa.array(np.full(n, -1, np.int64)),
            "od": pa.array(np.zeros(n, np.int64)),
            "odnull": pa.array(np.zeros(n, bool)),
            "tp": pa.array(np.zeros(n, np.float64)),
            "tpnull": pa.array(np.zeros(n, bool)),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    _O1 = pa.table({"cust": pa.array([], pa.int64()),
                    "okey": pa.array([], pa.int64()),
                    "od": pa.array([], pa.int64()),
                    "odnull": pa.array([], pa.bool_()),
                    "tp": pa.array([], pa.float64()),
                    "tpnull": pa.array([], pa.bool_()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        line = df[df["side"] == 1][["key", "s", "nv"]]
        ords = df[df["side"] == 0].drop(columns=["s", "nv"])
        if line.empty or ords.empty:
            return _O1
        agg = line.groupby("key", as_index=False).agg(
            s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum"))
        sv = agg["s"].to_numpy(np.float64)
        # HAVING sum(qty) > T in DuckDB's total order: NaN > T is TRUE
        big = (agg["nv"].to_numpy() > 0) & ~(sv <= min_qty)
        agg = agg[big]
        if agg.empty:
            return _O1
        j = ords.merge(agg, on="key")
        return pa.table({
            "cust": pa.array(j["cust"].to_numpy(np.int64)),
            "okey": pa.array(j["key"].to_numpy(np.int64)),
            "od": pa.array(j["od"].to_numpy(np.int64)),
            "odnull": pa.array(j["odnull"].to_numpy(bool)),
            "tp": pa.array(j["tp"].to_numpy(np.float64)),
            "tpnull": pa.array(j["tpnull"].to_numpy(bool)),
            "s": pa.array(j["s"].to_numpy(np.float64)),
            "nv": pa.array(j["nv"].to_numpy(np.int64)),
            "bucket": pc.bit_wise_and(
                pa.array(j["cust"].to_numpy(np.int64)), P - 1)})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ customer on custkey -----------------------------
    _E2 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "okey": pa.array([], pa.int64()),
                    "od": pa.array([], pa.int64()),
                    "odnull": pa.array([], pa.bool_()),
                    "tp": pa.array([], pa.float64()),
                    "tpnull": pa.array([], pa.bool_()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table, is_big: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E2
        if is_big:
            if "okey" not in t.schema.names:
                return _E2
            n = t.num_rows
            return pa.table({
                "key": t.column("cust"), "side": pa.array(np.zeros(n, np.int8)),
                "okey": t.column("okey"), "od": t.column("od"),
                "odnull": t.column("odnull"), "tp": t.column("tp"),
                "tpnull": t.column("tpnull"), "s": t.column("s"),
                "nv": t.column("nv"),
                "name": pa.array([None] * n, pa.string()),
                "bucket": t.column("bucket")})
        if "c_custkey" not in t.schema.names:
            return _E2
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("c_custkey")),
                                   False))
        n = t2.num_rows
        return pa.table({
            "key": t2.column("c_custkey"),
            "side": pa.array(np.ones(n, np.int8)),
            "okey": pa.array(np.zeros(n, np.int64)),
            "od": pa.array(np.zeros(n, np.int64)),
            "odnull": pa.array(np.zeros(n, bool)),
            "tp": pa.array(np.zeros(n, np.float64)),
            "tpnull": pa.array(np.zeros(n, bool)),
            "s": pa.array(np.zeros(n, np.float64)),
            "nv": pa.array(np.zeros(n, np.int64)),
            "name": t2.column("c_name"),
            "bucket": pc.bit_wise_and(t2.column("c_custkey"), P - 1)})

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"name": pd.Series(dtype="object"),
                              "cust": pd.Series(dtype="int64"),
                              "okey": pd.Series(dtype="int64"),
                              "od": pd.Series(dtype="int64"),
                              "odnull": pd.Series(dtype="bool"),
                              "tp": pd.Series(dtype="float64"),
                              "tpnull": pd.Series(dtype="bool"),
                              "s": pd.Series(dtype="float64"),
                              "nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        big = df[df["side"] == 0].drop(columns=["name"])
        cust = df[df["side"] == 1][["key", "name"]]
        if big.empty or cust.empty:
            return empty
        j = big.merge(cust, on="key")
        return j.rename(columns={"key": "cust"})[
            ["name", "cust", "okey", "od", "odnull", "tp", "tpnull",
             "s", "nv"]]

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey", "c_name"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged2, split2, merge2, P=P)
             if len(p)]
    if not parts:
        return _EMPTY
    df = pd.concat(parts, ignore_index=True)

    # final GROUP BY: duplicate order/customer rows collapse, sums scale
    df2, restore = coded_keys(df.rename(columns={"name": "c_name"}),
                              ["c_name"])
    g = (df2.groupby(["c_name", "cust", "okey", "od", "odnull",
                      "tp", "tpnull"], as_index=False, dropna=False)
         .agg(s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum")))
    sq = g["s"].to_numpy(np.float64).copy()
    sq[g["nv"].to_numpy() == 0] = np.nan
    od = g["od"].to_numpy(np.int64).astype(np.float64)
    od[g["odnull"].to_numpy(bool)] = np.nan
    tp = g["tp"].to_numpy(np.float64).copy()
    tp[g["tpnull"].to_numpy(bool)] = np.nan
    out = restore(g)
    out = pd.DataFrame({"c_name": out["c_name"],
                        "c_custkey": out["cust"].to_numpy(np.int64),
                        "o_orderkey": out["okey"].to_numpy(np.int64),
                        "odate_us": od,
                        "o_totalprice": tp,
                        "sum_qty": sq})
    return out.sort_values(["c_custkey", "o_orderkey"],
                           na_position="last").reset_index(drop=True)


def q_late_order_priorities(sf_dir: str, days: int = 60) -> pd.DataFrame:
    """TPC-H Q4 twin: per order priority, how many orders in a
    half-year window have at least ONE lineitem shipped more than
    ``days`` after the order date. The EXISTS decorrelates to
    ``max(l_shipdate) > o_orderdate + days`` because the threshold is
    per-order-row: lineitem blocks pre-aggregate per-orderkey max
    shipdate per split task (NULL shipdates dropped — their predicate
    is NULL, never TRUE), one orderkey exchange joins order rows, and
    priority counts fold over full-byte string codes (NULL and
    NUL-embedded priorities are real groups in the adversarial world).
    Timestamp arithmetic runs on raw int64 µs — the window filter
    bounds o_orderdate so ``+ days`` cannot overflow."""
    from .pairs import factorize_strings

    P = 32
    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-07-01").to_pydatetime(),
                   pa.timestamp("us"))
    delta_us = np.int64(days) * 86_400_000_000

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "prio": pa.array([], pa.string()),
                   "od": pa.array([], pa.int64()),
                   "maxship": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E
            od = t.column("o_orderdate")
            keep = pc.and_kleene(
                pc.is_valid(t.column("o_orderkey")),
                pc.and_kleene(pc.greater_equal(od, lo), pc.less(od, hi)))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            return pa.table({
                "key": pc.cast(t2.column("o_orderkey"), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
                "prio": t2.column("o_orderpriority"),
                "od": pc.cast(t2.column("o_orderdate"), pa.int64()),
                "maxship": pa.array(np.zeros(n, np.int64)),
                "bucket": pc.bit_wise_and(pc.cast(t2.column("o_orderkey"),
                                                  pa.int64()), P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_shipdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"key": pc.cast(t2.column("l_orderkey"), pa.int64()),
                       "sh": pc.cast(t2.column("l_shipdate"), pa.int64())})
             .group_by("key").aggregate([("sh", "max")]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "prio": pa.array([None] * n, pa.string()),
            "od": pa.array(np.zeros(n, np.int64)),
            "maxship": g.column("sh_max"),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"prio": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["key", "prio", "od"]]
        line = df[df["side"] == 1][["key", "maxship"]]
        if ords.empty or line.empty:
            return empty
        mx = line.groupby("key", as_index=False).agg(
            maxship=("maxship", "max"))
        j = ords.merge(mx, on="key")
        late = j[j["maxship"].to_numpy(np.int64) >
                 j["od"].to_numpy(np.int64) + delta_us]
        if late.empty:
            return empty
        codes, uniq = factorize_strings(late["prio"],
                                        use_na_sentinel=False)
        cnt = np.bincount(codes, minlength=len(uniq))
        names = pd.Series(np.asarray(uniq, dtype=object))
        return pd.DataFrame({"prio": names.where(names.notna(), None),
                             "n": cnt.astype(np.int64)})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                          "n_late_orders": pd.Series(dtype="int64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["prio"], use_na_sentinel=False)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, codes, df["n"].to_numpy(np.int64))
    names = pd.Series(np.asarray(uniq, dtype=object))
    out = pd.DataFrame({"o_orderpriority": names.where(names.notna(),
                                                       None),
                        "n_late_orders": tot})
    # presentation order only — the driver compare is order-insensitive
    return out.sort_values("o_orderpriority",
                           na_position="last").reset_index(drop=True)


def q_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 twin: per brand, the would-be yearly revenue of
    lineitems whose quantity is below 20% of their part's average
    quantity. The correlated scalar subquery decorrelates into the SAME
    partkey exchange that joins the part dim: per-partkey (Σqty, n)
    folds in-bucket, the threshold filter runs there, and only
    per-brand (Σprice, valid-count) partials reach the driver.
    Quantities sit on a .5 grid in both worlds, so Σqty is EXACT in any
    summation order and ``0.2 * (Σ/n)`` reproduces DuckDB's avg bit for
    bit — the filter comparison is never on a float knife edge. A NaN
    quantity makes the threshold NaN, and DuckDB's comparison total
    order calls ``x < NaN`` TRUE for every non-NaN x (probed) — the
    mask special-cases it."""
    from .pairs import factorize_strings

    P = 32
    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "qty": pa.array([], pa.float64()),
                   "qnull": pa.array([], pa.bool_()),
                   "price": pa.array([], pa.float64()),
                   "pnull": pa.array([], pa.bool_()),
                   "brand": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_part: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_part:
            if "p_partkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("p_partkey")),
                                       False))
            n = t2.num_rows
            return pa.table({
                "key": pc.cast(t2.column("p_partkey"), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
                "qty": pa.array(np.zeros(n, np.float64)),
                "qnull": pa.array(np.zeros(n, bool)),
                "price": pa.array(np.zeros(n, np.float64)),
                "pnull": pa.array(np.zeros(n, bool)),
                "brand": t2.column("p_brand"),
                "bucket": pc.bit_wise_and(pc.cast(t2.column("p_partkey"),
                                                  pa.int64()), P - 1)})
        if "l_partkey" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("l_partkey")),
                                   False))
        n = t2.num_rows
        qty = t2.column("l_quantity")
        pr = t2.column("l_extendedprice")
        return pa.table({
            "key": pc.cast(t2.column("l_partkey"), pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
            "qty": pc.cast(pc.fill_null(qty, 0.0), pa.float64()),
            "qnull": pc.is_null(qty),
            "price": pc.cast(pc.fill_null(pr, 0.0), pa.float64()),
            "pnull": pc.is_null(pr),
            "brand": pa.array([None] * n, pa.string()),
            "bucket": pc.bit_wise_and(pc.cast(t2.column("l_partkey"),
                                              pa.int64()), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"brand": pd.Series(dtype="object"),
                              "s": pd.Series(dtype="float64"),
                              "nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "brand"]]
        line = df[df["side"] == 1][["key", "qty", "qnull", "price",
                                    "pnull"]]
        if part.empty or line.empty:
            return empty
        qv = ~line["qnull"].to_numpy()
        ag = (line.assign(q=np.where(qv, line["qty"].to_numpy(), 0.0),
                          n=qv.astype(np.int64))
              .groupby("key").agg(q=("q", lambda x: x.to_numpy().sum()),
                                  n=("n", "sum")))
        cnt = line["key"].map(ag["n"]).to_numpy(np.float64)
        ssum = line["key"].map(ag["q"]).to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            thr = 0.2 * (ssum / cnt)  # DuckDB's own op order
        q = np.where(qv, line["qty"].to_numpy(), np.nan)
        # avg NULL (n=0) -> no rows; NaN threshold: x < NaN is TRUE
        # for non-NaN x in DuckDB's total order; NULL qty never passes
        pass_ = np.where(np.isnan(thr) & (cnt > 0), ~np.isnan(q) & qv,
                         q < thr)
        sel = line[pass_]
        if sel.empty:
            return empty
        j = sel.merge(part, on="key")  # dup part rows fan out like SQL
        if j.empty:
            return empty
        pv = ~j["pnull"].to_numpy()
        codes, uniq = factorize_strings(j["brand"], use_na_sentinel=False)
        s = np.zeros(len(uniq), np.float64)
        nv = np.zeros(len(uniq), np.int64)
        np.add.at(s, codes, np.where(pv, j["price"].to_numpy(), 0.0))
        np.add.at(nv, codes, pv.astype(np.int64))
        names = pd.Series(np.asarray(uniq, dtype=object))
        return pd.DataFrame({"brand": names.where(names.notna(), None),
                             "s": s, "nv": nv})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "part", columns=["p_partkey", "p_brand"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                          "avg_yearly": pd.Series(dtype="float64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["brand"], use_na_sentinel=False)
    s = np.zeros(len(uniq), np.float64)
    nv = np.zeros(len(uniq), np.int64)
    np.add.at(s, codes, df["s"].to_numpy(np.float64))
    np.add.at(nv, codes, df["nv"].to_numpy(np.int64))
    out_v = round_away(s / 7.0, 2)
    out_v[nv == 0] = np.nan  # all-NULL price terms: SQL NULL sum
    names = pd.Series(np.asarray(uniq, dtype=object))
    out = pd.DataFrame({"p_brand": names.where(names.notna(), None),
                        "avg_yearly": out_v})
    return out.sort_values("p_brand",
                           na_position="last").reset_index(drop=True)


def q_user_hour_window(sf_dir: str) -> pd.DataFrame:
    """RANGE-interval window frame: per user and event (ordered by
    ts), the count and value-sum of that user's events in the sliding
    [ts − 1h, ts] window. The value-range frame is the shape ROWS
    frames (q142) can't express: bounds come from searchsorted on the
    partition's own timestamps, and RANGE mode's CURRENT ROW means
    'last PEER' — rows tied on ts that appear later are IN the frame
    (probed), hence the side='right' upper bound. One user exchange;
    per-bucket lexsort (user, ts, event_id) then per-user vectorized
    prefix-sum frames. Non-finite values and NULL keys are filtered on
    BOTH sides (q142 contract); sums are rounded half-away at 4dp."""
    P = 32
    DELTA = np.int64(3_600_000_000)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    _E = pa.table({"eid": pa.array([], pa.int64()),
                   "uid": pa.array([], pa.int64()),
                   "t": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_id")),
                          pc.is_valid(t.column("ts"))),
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.fill_null(pc.is_finite(t.column("value")),
                                       False)))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        uid = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({"eid": pc.cast(t.column("event_id"), pa.int64()),
                         "uid": uid,
                         "t": pc.cast(t.column("ts"), pa.int64()),
                         "v": pc.cast(t.column("value"), pa.float64()),
                         "bucket": pc.bit_wise_and(uid, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "n_win": pd.Series(dtype="int64"),
                              "sum_win": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        eid = df["eid"].to_numpy(np.int64)
        uid = df["uid"].to_numpy(np.int64)
        ts = df["t"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((eid, ts, uid))
        eid, uid, ts, v = eid[order], uid[order], ts[order], v[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        n_out = np.empty(len(uid), np.int64)
        s_out = np.empty(len(uid), np.float64)
        for a, b in zip(starts, ends):
            seg_t = ts[a:b]
            lo = np.searchsorted(seg_t, seg_t - DELTA, side="left")
            hi = np.searchsorted(seg_t, seg_t, side="right")
            csum = np.r_[0.0, np.cumsum(v[a:b])]
            n_out[a:b] = hi - lo
            s_out[a:b] = csum[hi] - csum[lo]
        return pd.DataFrame({"event_id": eid, "n_win": n_out,
                             "sum_win": round_away(s_out, 4)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "n_win": pd.Series(dtype="int64"),
                             "sum_win": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


def q_idle_rich_customers(sf_dir: str,
                          since: str = "2000-01-01") -> pd.DataFrame:
    """TPC-H Q22 twin: customers with above-average positive balances
    and no RECENT orders (none since the cutoff), grouped by a
    custkey-derived code. Two stages: (1)
    a streaming (Σ, n) fold over customer blocks computes the global
    scalar threshold — broadcast, never a shuffle; (2) one custkey
    exchange anti-joins the date-filtered orders. SQL's ``%`` is
    TRUNCATED modulo
    (np.fmod, not ``%`` — negative custkeys diverge, CLAUDE.md rule);
    a NULL custkey row survives NOT EXISTS vacuously and lands in the
    NULL code group, so the code column is DOUBLE on both sides
    (nullable-BIGINT dtype contract)."""
    P = 32

    # ---- stage 1: global scalar threshold (streamed partials) ------
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_acctbal" not in t.schema.names:
            return pa.table({"s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        b = t.column("c_acctbal")
        # DuckDB's total order calls NaN > 0 TRUE, so a NaN balance
        # belongs in the avg (and poisons it to NaN -> zero rows)
        pos = t.filter(pc.fill_null(
            pc.or_kleene(pc.greater(b, 0.0), pc.is_nan(b)), False))
        sv = pos.column("c_acctbal")
        return pa.table({
            "s": pa.array([pc.sum(sv).as_py() or 0.0], pa.float64()),
            "n": pa.array([pos.num_rows], pa.int64())})

    agg = _with_cols(
        cust.map_batches(partial, batch_format="pyarrow").to_pandas(),
        {"s": "float64", "n": "int64"})
    n_pos = int(agg["n"].sum())
    thr = (agg["s"].to_numpy(np.float64).sum() / n_pos) if n_pos else None

    empty = pd.DataFrame({"cc": pd.Series(dtype="float64"),
                          "n_cust": pd.Series(dtype="int64"),
                          "total_bal": pd.Series(dtype="float64")})
    # avg NULL -> comparison NULL -> zero rows; avg NaN -> bal > NaN
    # is FALSE for every value in DuckDB's total order (NaN only
    # equals NaN) -> zero rows too
    if thr is None or np.isnan(thr):
        return empty

    # ---- stage 2: anti-join recent orders on custkey ----------------
    cut = pa.scalar(pd.Timestamp(since).to_pydatetime(),
                    pa.timestamp("us"))
    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "bal": pa.array([], pa.float64()),
                   "keynull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_cust: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_cust:
            if "c_custkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(
                pc.greater(t.column("c_acctbal"), thr), False))
            n = t2.num_rows
            key = t2.column("c_custkey")
            return pa.table({
                "key": pc.fill_null(key, _IMAX),
                "side": pa.array(np.zeros(n, np.int8)),
                "bal": pc.cast(t2.column("c_acctbal"), pa.float64()),
                "keynull": pc.is_null(key),
                "bucket": pc.bit_wise_and(pc.fill_null(key, _IMAX),
                                          P - 1)})
        if "o_custkey" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.and_kleene(
            pc.is_valid(t.column("o_custkey")),
            pc.greater_equal(t.column("o_orderdate"), cut)), False))
        g = (pa.table({"key": pc.cast(t2.column("o_custkey"), pa.int64())})
             .group_by("key").aggregate([([], "count_all")]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "bal": pa.array(np.zeros(n, np.float64)),
            "keynull": pa.array(np.zeros(n, bool)),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        out_empty = pd.DataFrame({"cc": pd.Series(dtype="float64"),
                                  "s": pd.Series(dtype="float64"),
                                  "n": pd.Series(dtype="int64")})
        if not live:
            return out_empty
        df = pa.concat_tables(live).to_pandas()
        cust = df[df["side"] == 0]
        if cust.empty:
            return out_empty
        # NULL custkey never matches an order: vacuous NOT EXISTS
        have = set(df[df["side"] == 1]["key"].to_numpy(np.int64))
        keyn = cust["keynull"].to_numpy(bool)
        keys = cust["key"].to_numpy(np.int64)
        keep = keyn | ~np.isin(keys, np.fromiter(have, np.int64,
                                                 len(have)))
        sel_keys = keys[keep]
        sel_null = keyn[keep]
        bal = cust["bal"].to_numpy(np.float64)[keep]
        # SQL truncated %, in INT64 (a float64 round-trip corrupts
        # custkeys past 2^53); the remainder is tiny, exact as double
        cc = np.fmod(sel_keys, np.int64(7)).astype(np.float64)
        cc[sel_null] = np.nan
        g = (pd.DataFrame({"cc": cc, "bal": bal})
             .groupby("cc", as_index=False, dropna=False)
             .agg(s=("bal", lambda x: x.to_numpy().sum()),
                  n=("bal", "size")))
        return g.rename(columns={"n": "n"}).astype({"n": np.int64})

    tagged = [(r, (True,)) for r in cust.to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    g = (df.groupby("cc", as_index=False, dropna=False)
         .agg(s=("s", lambda x: x.to_numpy().sum()), n=("n", "sum")))
    out = pd.DataFrame({"cc": g["cc"].to_numpy(np.float64),
                        "n_cust": g["n"].to_numpy(np.int64),
                        "total_bal": round_away(g["s"].to_numpy(), 2)})
    return out.sort_values("cc", na_position="last").reset_index(drop=True)


def _year_of_us(us: np.ndarray) -> np.ndarray:
    """Calendar year of int64 epoch-µs values, matching SQL ``year()``
    (including pre-1970 — datetime64 conversion, never epoch division)."""
    return (us.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970)


def q_two_nation_volume(sf_dir: str, nat_a: str = "NATION_3",
                        nat_b: str = "NATION_7") -> pd.DataFrame:
    """TPC-H Q7 twin: shipping volume between two nations by direction
    and ship year. Three pipelined exchanges — suppkey, then orderkey,
    then custkey — with the tiny nation dim broadcast into the split
    tasks (duplicate nation rows fan supplier/customer rows out like
    the SQL join) and per-(custkey, supp-nation, year) pre-aggregation
    before the last hop. The disjunctive nation predicate reduces to
    scode != ccode once both sides are semi-filtered to the two
    nations. Revenue keeps the q134 sum-as-0 + valid-count NULL
    contract and rounds half-away at 2dp."""
    from .pairs import factorize_strings

    P = 32
    lo = pa.scalar(pd.Timestamp("1995-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").to_pydatetime(),
                   pa.timestamp("us"))

    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name"])
    nat = nat[nat["n_nationkey"].notna()
              & nat["n_name"].isin([nat_a, nat_b])]
    ndim = pd.DataFrame({
        "nkey": nat["n_nationkey"].astype(np.int64).to_numpy(),
        "code": np.where(nat["n_name"].to_numpy() == nat_a, 0, 1)
        .astype(np.int8)})
    _EMPTY = pd.DataFrame({"supp_nation": pd.Series(dtype="object"),
                           "cust_nation": pd.Series(dtype="object"),
                           "l_year": pd.Series(dtype="int64"),
                           "revenue": pd.Series(dtype="float64")})
    if ndim.empty:
        return _EMPTY

    # ---- stage 1: supplier ⋈ lineitem on suppkey --------------------
    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "scode": pa.array([], pa.int8()),
                    "okey": pa.array([], pa.int64()),
                    "yr": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_supp: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_supp:
            if "s_suppkey" not in t.schema.names:
                return _E1
            df = t.to_pandas()
            df = df[df["s_suppkey"].notna() & df["s_nationkey"].notna()]
            df = df.assign(nkey=df["s_nationkey"].astype(np.int64)) \
                .merge(ndim, on="nkey")  # semi-filter + dup fan-out
            n = len(df)
            key = df["s_suppkey"].to_numpy(np.int64)
            return pa.table({
                "key": pa.array(key),
                "side": pa.array(np.zeros(n, np.int8)),
                "scode": pa.array(df["code"].to_numpy(np.int8)),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "yr": pa.array(np.zeros(n, np.int64)),
                "vol": pa.array(np.zeros(n, np.float64)),
                "volnull": pa.array(np.zeros(n, bool)),
                "bucket": pa.array(key & (P - 1))})
        if "l_suppkey" not in t.schema.names:
            return _E1
        sd = t.column("l_shipdate")
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("l_suppkey")),
                          pc.is_valid(t.column("l_orderkey"))),
            pc.and_kleene(pc.greater_equal(sd, lo), pc.less(sd, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        vol = pc.multiply(t2.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0, pa.float64()),
                                      t2.column("l_discount")))
        yr = _year_of_us(pc.cast(t2.column("l_shipdate"), pa.int64())
                         .to_numpy(zero_copy_only=False))
        key = pc.cast(t2.column("l_suppkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "scode": pa.array(np.zeros(n, np.int8)),
            "okey": pc.cast(t2.column("l_orderkey"), pa.int64()),
            "yr": pa.array(yr),
            "vol": pc.cast(pc.fill_null(vol, 0.0), pa.float64()),
            "volnull": pc.is_null(vol),
            "bucket": pc.bit_wise_and(key, P - 1)})

    _O1 = pa.table({"okey": pa.array([], pa.int64()),
                    "scode": pa.array([], pa.int8()),
                    "yr": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        supp = df[df["side"] == 0][["key", "scode"]]
        line = df[df["side"] == 1][["key", "okey", "yr", "vol",
                                    "volnull"]]
        if supp.empty or line.empty:
            return _O1
        j = line.merge(supp, on="key")
        ok = j["okey"].to_numpy(np.int64)
        return pa.table({"okey": pa.array(ok),
                         "scode": pa.array(j["scode"].to_numpy(np.int8)),
                         "yr": pa.array(j["yr"].to_numpy(np.int64)),
                         "vol": pa.array(j["vol"].to_numpy(np.float64)),
                         "volnull": pa.array(j["volnull"].to_numpy(bool)),
                         "bucket": pa.array(ok & (P - 1))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_orderkey", "l_shipdate",
                 "l_extendedprice", "l_discount"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ orders on orderkey, pre-agg per (cust,scode,yr) -
    _E2 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "scode": pa.array([], pa.int8()),
                    "yr": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "cust": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table, is_line: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E2
        if is_line:
            if "okey" not in t.schema.names:
                return _E2
            n = t.num_rows
            return pa.table({
                "key": t.column("okey"),
                "side": pa.array(np.zeros(n, np.int8)),
                "scode": t.column("scode"),
                "yr": t.column("yr"),
                "vol": t.column("vol"),
                "volnull": t.column("volnull"),
                "cust": pa.array(np.full(n, -1, np.int64)),
                "bucket": t.column("bucket")})
        if "o_orderkey" not in t.schema.names:
            return _E2
        keep = pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                             pc.is_valid(t.column("o_custkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        key = pc.cast(t2.column("o_orderkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "scode": pa.array(np.zeros(n, np.int8)),
            "yr": pa.array(np.zeros(n, np.int64)),
            "vol": pa.array(np.zeros(n, np.float64)),
            "volnull": pa.array(np.zeros(n, bool)),
            "cust": pc.cast(t2.column("o_custkey"), pa.int64()),
            "bucket": pc.bit_wise_and(key, P - 1)})

    _O2 = pa.table({"cust": pa.array([], pa.int64()),
                    "scode": pa.array([], pa.int8()),
                    "yr": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def merge2(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O2
        df = pa.concat_tables(live).to_pandas()
        line = df[df["side"] == 0]
        ords = df[df["side"] == 1][["key", "cust"]]
        if line.empty or ords.empty:
            return _O2
        j = line.drop(columns=["cust"]).merge(ords, on="key")
        valid = ~j["volnull"].to_numpy()
        g = (j.assign(v=np.where(valid, j["vol"].to_numpy(), 0.0),
                      nv=valid.astype(np.int64))
             .groupby(["cust", "scode", "yr"], as_index=False)
             .agg(s=("v", lambda x: x.to_numpy().sum()),
                  nv=("nv", "sum")))
        cu = g["cust"].to_numpy(np.int64)
        return pa.table({"cust": pa.array(cu),
                         "scode": pa.array(g["scode"].to_numpy(np.int8)),
                         "yr": pa.array(g["yr"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.float64)),
                         "nv": pa.array(g["nv"].to_numpy(np.int64)),
                         "bucket": pa.array(cu & (P - 1))})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
    ).to_arrow_refs()]
    stage2 = hash_shuffle(tagged2, split2, merge2, P=P, gather=False)

    # ---- stage 3: ⋈ customer on custkey, scode != ccode -------------
    _E3 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "scode": pa.array([], pa.int8()),
                    "ccode": pa.array([], pa.int8()),
                    "yr": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "nv": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split3(t: pa.Table, is_partial: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E3
        if is_partial:
            if "cust" not in t.schema.names:
                return _E3
            n = t.num_rows
            return pa.table({
                "key": t.column("cust"),
                "side": pa.array(np.zeros(n, np.int8)),
                "scode": t.column("scode"),
                "ccode": pa.array(np.zeros(n, np.int8)),
                "yr": t.column("yr"),
                "s": t.column("s"),
                "nv": t.column("nv"),
                "bucket": t.column("bucket")})
        if "c_custkey" not in t.schema.names:
            return _E3
        df = t.to_pandas()
        df = df[df["c_custkey"].notna() & df["c_nationkey"].notna()]
        df = df.assign(nkey=df["c_nationkey"].astype(np.int64)) \
            .merge(ndim, on="nkey")
        n = len(df)
        key = df["c_custkey"].to_numpy(np.int64)
        return pa.table({
            "key": pa.array(key),
            "side": pa.array(np.ones(n, np.int8)),
            "scode": pa.array(np.zeros(n, np.int8)),
            "ccode": pa.array(df["code"].to_numpy(np.int8)),
            "yr": pa.array(np.zeros(n, np.int64)),
            "s": pa.array(np.zeros(n, np.float64)),
            "nv": pa.array(np.zeros(n, np.int64)),
            "bucket": pa.array(key & (P - 1))})

    def merge3(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"scode": pd.Series(dtype="int8"),
                              "ccode": pd.Series(dtype="int8"),
                              "yr": pd.Series(dtype="int64"),
                              "s": pd.Series(dtype="float64"),
                              "nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0]
        cust = df[df["side"] == 1][["key", "ccode"]]
        if part.empty or cust.empty:
            return empty
        j = part.drop(columns=["ccode"]).merge(cust, on="key")
        j = j[j["scode"].to_numpy() != j["ccode"].to_numpy()]
        if j.empty:
            return empty
        return (j.groupby(["scode", "ccode", "yr"], as_index=False)
                .agg(s=("s", lambda x: x.to_numpy().sum()),
                     nv=("nv", "sum")))

    tagged3 = [(r, (True,)) for r in stage2]
    tagged3 += [(r, (False,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged3, split3, merge3, P=P)
             if len(p)]
    if not parts:
        return _EMPTY
    g = (pd.concat(parts, ignore_index=True)
         .groupby(["scode", "ccode", "yr"], as_index=False)
         .agg(s=("s", lambda x: x.to_numpy().sum()), nv=("nv", "sum")))
    rev = g["s"].to_numpy(np.float64).copy()
    rev[g["nv"].to_numpy() == 0] = np.nan
    names = np.array([nat_a, nat_b], dtype=object)
    out = pd.DataFrame({
        "supp_nation": names[g["scode"].to_numpy(np.int64)],
        "cust_nation": names[g["ccode"].to_numpy(np.int64)],
        "l_year": g["yr"].to_numpy(np.int64),
        "revenue": round_away(rev, 2)})
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def q_sole_late_shipper(sf_dir: str, days: int = 60) -> pd.DataFrame:
    """TPC-H Q21 twin: for finished orders, count the lineitems whose
    supplier was the ONLY late shipper on a multi-supplier order. The
    correlated EXISTS (another supplier participated) and NOT EXISTS
    (no other supplier was late) both decorrelate into per-order-row
    set statistics inside ONE orderkey exchange: distinct-supplier
    count and distinct-late-supplier count per joined order row; a
    late l1 row qualifies iff n_supp >= 2 and the late-supplier set is
    exactly its own supplier. A second suppkey exchange attaches
    supplier names (duplicate supplier rows fan counts out like SQL).
    NULL l_suppkey rows never match either correlated subquery
    (``<>`` against NULL is unknown) and are excluded from the set
    stats; NULL shipdate is never late."""
    from .pairs import factorize_strings

    P = 32
    delta_us = np.int64(days) * 86_400_000_000

    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "supp": pa.array([], pa.int64()),
                    "ship": pa.array([], pa.int64()),
                    "od": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E1
            # status='F' (NULL status never equal); NULL orderdate
            # makes every lateness predicate UNKNOWN -> no l1 row of
            # that order can qualify, drop the order row early
            keep = pc.and_kleene(
                pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                              pc.is_valid(t.column("o_orderdate"))),
                pc.equal(t.column("o_orderstatus"), "F"))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            key = pc.cast(t2.column("o_orderkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "supp": pa.array(np.zeros(n, np.int64)),
                "ship": pa.array(np.zeros(n, np.int64)),
                "od": pc.cast(t2.column("o_orderdate"), pa.int64()),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E1
        # only valid-suppkey lines participate in l1/l2/l3 (NULL
        # suppkey fails every <> comparison); NULL shipdate lines
        # still EXIST for l2 (no date predicate there) — keep them,
        # sentinel the ship µs to int64 min so they are never late
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_suppkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        ship = pc.fill_null(pc.cast(t2.column("l_shipdate"), pa.int64()),
                            np.iinfo(np.int64).min)
        key = pc.cast(t2.column("l_orderkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "supp": pc.cast(t2.column("l_suppkey"), pa.int64()),
            "ship": ship,
            "od": pa.array(np.zeros(n, np.int64)),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge1(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"supp": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["key", "od"]].reset_index(drop=True)
        line = df[df["side"] == 1][["key", "supp", "ship"]]
        if ords.empty or line.empty:
            return empty
        ords = ords.assign(orow=np.arange(len(ords), dtype=np.int64))
        j = line.merge(ords, on="key")  # fan out over dup order rows
        if j.empty:
            return empty
        late = j["ship"].to_numpy(np.int64) > \
            j["od"].to_numpy(np.int64) + delta_us
        j = j.assign(late=late)
        # per order row: distinct suppliers, distinct LATE suppliers
        stats = (j.groupby("orow")
                 .agg(n_supp=("supp", "nunique")))
        lstats = (j[j["late"]].groupby("orow")
                  .agg(n_late=("supp", "nunique")))
        stats = stats.join(lstats, how="left").fillna({"n_late": 0})
        j = j.merge(stats, left_on="orow", right_index=True)
        ok = (j["late"].to_numpy()
              & (j["n_supp"].to_numpy(np.int64) >= 2)
              & (j["n_late"].to_numpy(np.int64) == 1))
        sel = j[ok]
        if sel.empty:
            return empty
        g = sel.groupby("supp", as_index=False).size()
        return pd.DataFrame({"supp": g["supp"].to_numpy(np.int64),
                             "n": g["size"].to_numpy(np.int64)})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_arrow_refs()]
    import ray
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ supplier on suppkey for names -------------------
    _E2 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "n": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64())})

    def split2(block, is_partial: bool) -> pa.Table:
        if is_partial:
            df = block
            if len(df) == 0 or "supp" not in df.columns:
                return _E2
            key = df["supp"].to_numpy(np.int64)
            n = len(df)
            return pa.table({
                "key": pa.array(key),
                "side": pa.array(np.zeros(n, np.int8)),
                "n": pa.array(df["n"].to_numpy(np.int64)),
                "name": pa.array([None] * n, pa.string()),
                "bucket": pa.array(key & (P - 1))})
        t = block
        if t.num_rows == 0 or "s_suppkey" not in t.schema.names:
            return _E2
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("s_suppkey")),
                                   False))
        n = t2.num_rows
        key = pc.cast(t2.column("s_suppkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "n": pa.array(np.zeros(n, np.int64)),
            "name": t2.column("s_name"),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"name": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "n"]]
        supp = df[df["side"] == 1][["key", "name"]]
        if part.empty or supp.empty:
            return empty
        agg = part.groupby("key", as_index=False).agg(n=("n", "sum"))
        j = supp.merge(agg, on="key")  # dup supplier rows fan out
        if j.empty:
            return empty
        codes, uniq = factorize_strings(j["name"], use_na_sentinel=False)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, codes, j["n"].to_numpy(np.int64))
        names = pd.Series(np.asarray(uniq, dtype=object))
        return pd.DataFrame({"name": names.where(names.notna(), None),
                             "n": tot})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged2, split2, merge2, P=P)
             if len(p)]
    empty = pd.DataFrame({"s_name": pd.Series(dtype="object"),
                          "numwait": pd.Series(dtype="int64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["name"], use_na_sentinel=False)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, codes, df["n"].to_numpy(np.int64))
    names = pd.Series(np.asarray(uniq, dtype=object))
    out = pd.DataFrame({"s_name": names.where(names.notna(), None),
                        "numwait": tot})
    return out.sort_values("s_name",
                           na_position="last").reset_index(drop=True)


def q_nation_market_share(sf_dir: str, nation: str = "NATION_5",
                          region: str = "AMERICA",
                          ptype: str = "PROMO") -> pd.DataFrame:
    """TPC-H Q8 twin: one nation's share of a region's 'PROMO' order
    volume per year. Four pipelined exchanges (partkey → suppkey →
    orderkey → custkey), never a three-way shuffle: the part filter
    semi-joins lineitem at the first hop, supplier rows carry only an
    is-the-nation flag (the tiny nation dim is broadcast into the
    split, duplicate rows fanning out like SQL), and per-(custkey,
    year) CASE-split partials — numerator keeps the ELSE-0 validity
    (a non-matching row is a VALID 0 term, so the numerator sum is
    NULL only when every term is a NULL volume of the chosen nation)
    — shrink the stream before the last hop. Division follows DuckDB:
    x/0 and NULL operands yield NULL (probed), NaN flows through."""
    P = 32
    lo = pa.scalar(pd.Timestamp("1995-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").to_pydatetime(),
                   pa.timestamp("us"))

    # tiny dims, driver-side
    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"])
    nat = nat[nat["n_nationkey"].notna()]
    # supplier side: every nation row, flagged (dup rows fan out)
    sdim = pd.DataFrame({
        "nkey": nat["n_nationkey"].astype(np.int64).to_numpy(),
        "is_n": (nat["n_name"].to_numpy(object) == nation)})
    # customer side: region semi-join (dup region rows multiply)
    reg = _read_pd(sf_dir, "region",
                columns=["r_regionkey", "r_name"])
    reg = reg[(reg["r_name"] == region) & reg["r_regionkey"].notna()]
    rmult = reg.groupby("r_regionkey").size()
    natr = nat[nat["n_regionkey"].notna()]
    w = natr["n_regionkey"].astype(np.int64).map(
        rmult.rename(lambda k: int(k))).fillna(0).astype(np.int64)
    cdim = pd.DataFrame({
        "nkey": natr["n_nationkey"].astype(np.int64).to_numpy(),
        "w": w.to_numpy()})
    cdim = cdim[cdim["w"] > 0]
    _EMPTY = pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                           "mkt_share": pd.Series(dtype="float64")})
    if cdim.empty:
        return _EMPTY

    # ---- stage 1: part(type) ⋈ lineitem on partkey ------------------
    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "okey": pa.array([], pa.int64()),
                    "supp": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_part: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_part:
            if "p_partkey" not in t.schema.names:
                return _E1
            keep = pc.and_kleene(pc.is_valid(t.column("p_partkey")),
                                 pc.equal(t.column("p_type"), ptype))
            t2 = t.filter(pc.fill_null(keep, False))
            n = t2.num_rows
            key = pc.cast(t2.column("p_partkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "supp": pa.array(np.zeros(n, np.int64)),
                "vol": pa.array(np.zeros(n, np.float64)),
                "volnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_partkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                          pc.is_valid(t.column("l_orderkey"))),
            pc.is_valid(t.column("l_suppkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        vol = pc.multiply(t2.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0, pa.float64()),
                                      t2.column("l_discount")))
        key = pc.cast(t2.column("l_partkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "okey": pc.cast(t2.column("l_orderkey"), pa.int64()),
            "supp": pc.cast(t2.column("l_suppkey"), pa.int64()),
            "vol": pc.cast(pc.fill_null(vol, 0.0), pa.float64()),
            "volnull": pc.is_null(vol),
            "bucket": pc.bit_wise_and(key, P - 1)})

    _O1 = pa.table({"okey": pa.array([], pa.int64()),
                    "supp": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key"]]
        line = df[df["side"] == 1][["key", "okey", "supp", "vol",
                                    "volnull"]]
        if part.empty or line.empty:
            return _O1
        j = line.merge(part, on="key")  # dup part rows fan out
        su = j["supp"].to_numpy(np.int64)
        return pa.table({"okey": pa.array(j["okey"].to_numpy(np.int64)),
                         "supp": pa.array(su),
                         "vol": pa.array(j["vol"].to_numpy(np.float64)),
                         "volnull": pa.array(j["volnull"].to_numpy(bool)),
                         "bucket": pa.array(su & (P - 1))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "part", columns=["p_partkey", "p_type"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_orderkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: ⋈ supplier on suppkey (is-nation flag) ------------
    _E2 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "okey": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "is_n": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table, is_line: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E2
        if is_line:
            if "okey" not in t.schema.names:
                return _E2
            n = t.num_rows
            return pa.table({
                "key": t.column("supp"),
                "side": pa.array(np.zeros(n, np.int8)),
                "okey": t.column("okey"),
                "vol": t.column("vol"),
                "volnull": t.column("volnull"),
                "is_n": pa.array(np.zeros(n, bool)),
                "bucket": t.column("bucket")})
        if "s_suppkey" not in t.schema.names:
            return _E2
        df = t.to_pandas()
        df = df[df["s_suppkey"].notna() & df["s_nationkey"].notna()]
        df = df.assign(nkey=df["s_nationkey"].astype(np.int64)) \
            .merge(sdim, on="nkey")
        n = len(df)
        key = df["s_suppkey"].to_numpy(np.int64)
        return pa.table({
            "key": pa.array(key),
            "side": pa.array(np.ones(n, np.int8)),
            "okey": pa.array(np.full(n, -1, np.int64)),
            "vol": pa.array(np.zeros(n, np.float64)),
            "volnull": pa.array(np.zeros(n, bool)),
            "is_n": pa.array(df["is_n"].to_numpy(bool)),
            "bucket": pa.array(key & (P - 1))})

    _O2 = pa.table({"okey": pa.array([], pa.int64()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "is_n": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def merge2(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O2
        df = pa.concat_tables(live).to_pandas()
        line = df[df["side"] == 0][["key", "okey", "vol", "volnull"]]
        supp = df[df["side"] == 1][["key", "is_n"]]
        if line.empty or supp.empty:
            return _O2
        j = line.merge(supp, on="key")
        ok = j["okey"].to_numpy(np.int64)
        return pa.table({"okey": pa.array(ok),
                         "vol": pa.array(j["vol"].to_numpy(np.float64)),
                         "volnull": pa.array(j["volnull"].to_numpy(bool)),
                         "is_n": pa.array(j["is_n"].to_numpy(bool)),
                         "bucket": pa.array(ok & (P - 1))})

    tagged2 = [(r, (True,)) for r in stage1]
    tagged2 += [(r, (False,)) for r in _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).to_arrow_refs()]
    stage2 = hash_shuffle(tagged2, split2, merge2, P=P, gather=False)

    # ---- stage 3: ⋈ orders on orderkey, pre-agg per (cust, year) ----
    _E3 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "vol": pa.array([], pa.float64()),
                    "volnull": pa.array([], pa.bool_()),
                    "is_n": pa.array([], pa.bool_()),
                    "cust": pa.array([], pa.int64()),
                    "yr": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split3(t: pa.Table, is_line: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E3
        if is_line:
            if "okey" not in t.schema.names:
                return _E3
            n = t.num_rows
            return pa.table({
                "key": t.column("okey"),
                "side": pa.array(np.zeros(n, np.int8)),
                "vol": t.column("vol"),
                "volnull": t.column("volnull"),
                "is_n": t.column("is_n"),
                "cust": pa.array(np.full(n, -1, np.int64)),
                "yr": pa.array(np.zeros(n, np.int64)),
                "bucket": t.column("bucket")})
        if "o_orderkey" not in t.schema.names:
            return _E3
        od = t.column("o_orderdate")
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                          pc.is_valid(t.column("o_custkey"))),
            pc.and_kleene(pc.greater_equal(od, lo), pc.less(od, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        yr = _year_of_us(pc.cast(t2.column("o_orderdate"), pa.int64())
                         .to_numpy(zero_copy_only=False))
        key = pc.cast(t2.column("o_orderkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "vol": pa.array(np.zeros(n, np.float64)),
            "volnull": pa.array(np.zeros(n, bool)),
            "is_n": pa.array(np.zeros(n, bool)),
            "cust": pc.cast(t2.column("o_custkey"), pa.int64()),
            "yr": pa.array(yr),
            "bucket": pc.bit_wise_and(key, P - 1)})

    _O3 = pa.table({"cust": pa.array([], pa.int64()),
                    "yr": pa.array([], pa.int64()),
                    "num": pa.array([], pa.float64()),
                    "num_nv": pa.array([], pa.int64()),
                    "den": pa.array([], pa.float64()),
                    "den_nv": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def merge3(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O3
        df = pa.concat_tables(live).to_pandas()
        line = df[df["side"] == 0][["key", "vol", "volnull", "is_n"]]
        ords = df[df["side"] == 1][["key", "cust", "yr"]]
        if line.empty or ords.empty:
            return _O3
        j = line.merge(ords, on="key")
        vol = j["vol"].to_numpy(np.float64)
        vn = j["volnull"].to_numpy(bool)
        isn = j["is_n"].to_numpy(bool)
        # CASE WHEN is_n THEN volume ELSE 0: the ELSE-0 is a VALID
        # term; only (is_n AND volnull) is a skipped NULL
        num_v = np.where(isn & ~vn, vol, 0.0)
        num_ok = (~isn) | (~vn)
        den_v = np.where(~vn, vol, 0.0)
        g = (j.assign(num=num_v, num_nv=num_ok.astype(np.int64),
                      den=den_v, den_nv=(~vn).astype(np.int64))
             .groupby(["cust", "yr"], as_index=False)
             .agg(num=("num", lambda x: x.to_numpy().sum()),
                  num_nv=("num_nv", "sum"),
                  den=("den", lambda x: x.to_numpy().sum()),
                  den_nv=("den_nv", "sum")))
        cu = g["cust"].to_numpy(np.int64)
        return pa.table({"cust": pa.array(cu),
                         "yr": pa.array(g["yr"].to_numpy(np.int64)),
                         "num": pa.array(g["num"].to_numpy(np.float64)),
                         "num_nv": pa.array(g["num_nv"]
                                            .to_numpy(np.int64)),
                         "den": pa.array(g["den"].to_numpy(np.float64)),
                         "den_nv": pa.array(g["den_nv"]
                                            .to_numpy(np.int64)),
                         "bucket": pa.array(cu & (P - 1))})

    tagged3 = [(r, (True,)) for r in stage2]
    tagged3 += [(r, (False,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_arrow_refs()]
    stage3 = hash_shuffle(tagged3, split3, merge3, P=P, gather=False)

    # ---- stage 4: ⋈ customer (region semi-join) on custkey ----------
    _E4 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "yr": pa.array([], pa.int64()),
                    "num": pa.array([], pa.float64()),
                    "num_nv": pa.array([], pa.int64()),
                    "den": pa.array([], pa.float64()),
                    "den_nv": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split4(t: pa.Table, is_partial: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E4
        if is_partial:
            if "cust" not in t.schema.names:
                return _E4
            n = t.num_rows
            return pa.table({
                "key": t.column("cust"),
                "side": pa.array(np.zeros(n, np.int8)),
                "yr": t.column("yr"),
                "num": t.column("num"),
                "num_nv": t.column("num_nv"),
                "den": t.column("den"),
                "den_nv": t.column("den_nv"),
                "w": pa.array(np.zeros(n, np.int64)),
                "bucket": t.column("bucket")})
        if "c_custkey" not in t.schema.names:
            return _E4
        df = t.to_pandas()
        df = df[df["c_custkey"].notna() & df["c_nationkey"].notna()]
        df = df.assign(nkey=df["c_nationkey"].astype(np.int64)) \
            .merge(cdim, on="nkey")
        n = len(df)
        key = df["c_custkey"].to_numpy(np.int64)
        return pa.table({
            "key": pa.array(key),
            "side": pa.array(np.ones(n, np.int8)),
            "yr": pa.array(np.zeros(n, np.int64)),
            "num": pa.array(np.zeros(n, np.float64)),
            "num_nv": pa.array(np.zeros(n, np.int64)),
            "den": pa.array(np.zeros(n, np.float64)),
            "den_nv": pa.array(np.zeros(n, np.int64)),
            "w": pa.array(df["w"].to_numpy(np.int64)),
            "bucket": pa.array(key & (P - 1))})

    def merge4(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"yr": pd.Series(dtype="int64"),
                              "num": pd.Series(dtype="float64"),
                              "num_nv": pd.Series(dtype="int64"),
                              "den": pd.Series(dtype="float64"),
                              "den_nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0]
        cust = df[df["side"] == 1][["key", "w"]]
        if part.empty or cust.empty:
            return empty
        cw = cust.groupby("key")["w"].sum()
        j = part.drop(columns=["w"]).merge(
            cw.rename("w"), left_on="key", right_index=True)
        wv = j["w"].to_numpy(np.int64).astype(np.float64)
        return (j.assign(num=j["num"].to_numpy() * wv,
                         num_nv=j["num_nv"].to_numpy(np.int64)
                         * j["w"].to_numpy(np.int64),
                         den=j["den"].to_numpy() * wv,
                         den_nv=j["den_nv"].to_numpy(np.int64)
                         * j["w"].to_numpy(np.int64))
                .groupby("yr", as_index=False)
                .agg(num=("num", lambda x: x.to_numpy().sum()),
                     num_nv=("num_nv", "sum"),
                     den=("den", lambda x: x.to_numpy().sum()),
                     den_nv=("den_nv", "sum")))

    tagged4 = [(r, (True,)) for r in stage3]
    tagged4 += [(r, (False,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged4, split4, merge4, P=P)
             if len(p)]
    if not parts:
        return _EMPTY
    g = (pd.concat(parts, ignore_index=True)
         .groupby("yr", as_index=False)
         .agg(num=("num", lambda x: x.to_numpy().sum()),
              num_nv=("num_nv", "sum"),
              den=("den", lambda x: x.to_numpy().sum()),
              den_nv=("den_nv", "sum")))
    num = g["num"].to_numpy(np.float64).copy()
    den = g["den"].to_numpy(np.float64).copy()
    num[g["num_nv"].to_numpy() == 0] = np.nan
    den[g["den_nv"].to_numpy() == 0] = np.nan
    with np.errstate(invalid="ignore", divide="ignore"):
        share = num / den
    share[den == 0.0] = np.nan  # DuckDB x/0 -> NULL (probed)
    out = pd.DataFrame({"o_year": g["yr"].to_numpy(np.int64),
                        "mkt_share": round_away(share, 6)})
    return out.sort_values("o_year").reset_index(drop=True)


def q_top_revenue_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 twin: the supplier(s) whose quarterly revenue equals
    the GLOBAL maximum. Per-block Arrow group partials fold into one
    suppkey exchange that also joins supplier names; the driver sees
    only one row per supplier (the aggregate's own output size), takes
    the max, and keeps the ties — the classic two-pass argmax-by-
    equality. A supplier whose every revenue term is NULL has a NULL
    total: max() skips it and the equality can never hold (q134 NULL
    contract). Duplicate supplier rows fan the output out like SQL's
    join."""
    P = 32
    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01").to_pydatetime(),
                   pa.timestamp("us"))

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "s": pa.array([], pa.int64()),
                   "nv": pa.array([], pa.int64()),
                   "name": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_supp: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_supp:
            if "s_suppkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("s_suppkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("s_suppkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.ones(n, np.int8)),
                "s": pa.array(np.zeros(n, np.int64)),
                "nv": pa.array(np.zeros(n, np.int64)),
                "name": t2.column("s_name"),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_suppkey" not in t.schema.names:
            return _E
        sd = t.column("l_shipdate")
        keep = pc.and_kleene(
            pc.is_valid(t.column("l_suppkey")),
            pc.and_kleene(pc.greater_equal(sd, lo), pc.less(sd, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        # EXACT integer ten-thousandths (q45 rule): the max-equality
        # tie set is order-sensitive under float partial sums at sf>=1
        # (replicated suppliers with identical term multisets landed on
        # different last-ulp totals and fell out of the tie)
        cents = pc.cast(pc.round(pc.multiply(
            t2.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            t2.column("l_discount"), pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc))
        g = (pa.table({"key": pc.cast(t2.column("l_suppkey"), pa.int64()),
                       "r": pc.cast(pc.fill_null(rev, 0), pa.int64()),
                       "v": pc.cast(pc.is_valid(rev), pa.int64())})
             .group_by("key").aggregate([("r", "sum"), ("v", "sum")]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.zeros(n, np.int8)),
            "s": g.column("r_sum"),
            "nv": g.column("v_sum"),
            "name": pa.array([None] * n, pa.string()),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"key": pd.Series(dtype="int64"),
                              "name": pd.Series(dtype="object"),
                              "total": pd.Series(dtype="int64"),
                              "isnull": pd.Series(dtype="bool")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "s", "nv"]]
        supp = df[df["side"] == 1][["key", "name"]]
        if part.empty or supp.empty:
            return empty
        agg = part.groupby("key", as_index=False).agg(
            s=("s", "sum"), nv=("nv", "sum"))
        # nv==0 means SQL NULL total (all inputs NULL); totals are
        # exact int64 ten-thousandths (finite-price contract — the
        # Arrow cast raises loudly on a non-finite price)
        agg = agg.assign(total=agg["s"].to_numpy(np.int64),
                         isnull=agg["nv"].to_numpy() == 0)
        j = supp.merge(agg[["key", "total", "isnull"]], on="key")
        return j[["key", "name", "total", "isnull"]]

    tagged = [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]
    ).to_arrow_refs()]
    tagged += [(r, (True,)) for r in _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype="object"),
                          "total_revenue": pd.Series(dtype="float64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    df = df[~df["isnull"].to_numpy(bool)]  # NULL total: never equal
    vals = df["total"].to_numpy(np.int64)
    if len(vals) == 0:
        return empty
    sel = df[vals == vals.max()]  # exact-int tie set
    out = pd.DataFrame({"s_suppkey": sel["key"].to_numpy(np.int64),
                        "s_name": sel["name"],
                        "total_revenue": round_away(
                            sel["total"].to_numpy(np.float64)
                            / 10000.0, 2)})
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q_user_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average value: each event's value is
    held until the user's next event (lead() over (ts, event_id)) and
    integrated — Σ value·Δt / Σ Δt. The lead() decorrelates into one
    user exchange + per-bucket lexsort and np.diff; Δt is EXACT int64
    µs arithmetic, so only the final ratio is floating (rounded
    half-away at 6dp). A user with a single event has no interval —
    SQL's WHERE nts IS NOT NULL drops them on both sides; an all-zero
    Δt user divides by zero, which DuckDB turns into NULL (probed)."""
    P = 32
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    _E = pa.table({"eid": pa.array([], pa.int64()),
                   "uid": pa.array([], pa.int64()),
                   "t": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_id")),
                          pc.is_valid(t.column("ts"))),
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.fill_null(pc.is_finite(t.column("value")),
                                       False)))
        t = t.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return _E
        uid = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({"eid": pc.cast(t.column("event_id"), pa.int64()),
                         "uid": uid,
                         "t": pc.cast(t.column("ts"), pa.int64()),
                         "v": pc.cast(t.column("value"), pa.float64()),
                         "bucket": pc.bit_wise_and(uid, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "twa": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        eid = df["eid"].to_numpy(np.int64)
        uid = df["uid"].to_numpy(np.int64)
        ts = df["t"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, v = uid[order], ts[order], v[order]
        if len(uid) == 0:
            return empty
        same = uid[1:] == uid[:-1]          # row i pairs with i+1
        dt = (ts[1:] - ts[:-1]).astype(np.float64)
        num = v[:-1] * dt
        users, inv = np.unique(uid[:-1][same], return_inverse=True)
        nsum = np.zeros(len(users), np.float64)
        dsum = np.zeros(len(users), np.float64)
        np.add.at(nsum, inv, num[same])
        np.add.at(dsum, inv, dt[same])
        with np.errstate(invalid="ignore", divide="ignore"):
            twa = nsum / dsum
        twa[dsum == 0.0] = np.nan  # DuckDB x/0 -> NULL
        return pd.DataFrame({"user_id": users,
                             "twa": round_away(twa, 6)})

    tagged = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "twa": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("user_id").reset_index(drop=True)


def q_brand_size_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 twin: one UNGROUPED aggregate over a three-way
    disjunction of (brand, size-range, min-quantity) conjunctions —
    the multi-predicate pushdown shape. One partkey exchange joins the
    two predicate sides; the disjunction evaluates vectorized in the
    bucket with SQL three-valued logic (NULL size/quantity fail every
    comparison, EXCEPT that DuckDB's total order calls NaN >= q TRUE
    — encoded). An ungrouped SQL aggregate emits EXACTLY one row even
    on empty input (count 0, sum NULL) — the driver fold mirrors
    that."""
    P = 32
    RULES = [("Brand#1", 1, 15, 10.0),
             ("Brand#2", 10, 30, 20.0),
             ("Brand#3", 20, 50, 30.0)]

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "brand": pa.array([], pa.string()),
                   "size": pa.array([], pa.float64()),
                   "qty": pa.array([], pa.float64()),
                   "rev": pa.array([], pa.float64()),
                   "revnull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_part: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_part:
            if "p_partkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("p_partkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("p_partkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "brand": t2.column("p_brand"),
                # NULL size -> NaN fails every range check, like SQL
                "size": pc.cast(pc.fill_null(pc.cast(
                    t2.column("p_size"), pa.float64()), np.nan),
                    pa.float64()),
                "qty": pa.array(np.zeros(n, np.float64)),
                "rev": pa.array(np.zeros(n, np.float64)),
                "revnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_partkey" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("l_partkey")),
                                   False))
        n = t2.num_rows
        rev = pc.multiply(t2.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0, pa.float64()),
                                      t2.column("l_discount")))
        key = pc.cast(t2.column("l_partkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "brand": pa.array([None] * n, pa.string()),
            # NULL qty -> NaN here, but the flag separates it from a
            # GENUINE NaN (which DuckDB's total order passes >= with)
            "size": pc.cast(pc.is_null(t2.column("l_quantity")),
                            pa.float64()),
            "qty": pc.cast(pc.fill_null(t2.column("l_quantity"), np.nan),
                           pa.float64()),
            "rev": pc.cast(pc.fill_null(rev, 0.0), pa.float64()),
            "revnull": pc.is_null(rev),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"cnt": pd.Series(dtype="int64"),
                              "s": pd.Series(dtype="float64"),
                              "nv": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "brand", "size"]]
        line = df[df["side"] == 1].rename(columns={"size": "qnull"})[
            ["key", "qty", "qnull", "rev", "revnull"]]
        if part.empty or line.empty:
            return empty
        j = line.merge(part, on="key")
        if j.empty:
            return empty
        size = j["size"].to_numpy(np.float64)
        qty = j["qty"].to_numpy(np.float64)
        qnull = j["qnull"].to_numpy(np.float64) > 0.5
        brand = j["brand"].to_numpy(object)
        # SQL three-valued logic: NULL quantity fails >=, but a
        # GENUINE NaN quantity PASSES it (NaN >= q is TRUE in DuckDB's
        # comparison total order). revnull only affects the sum.
        qpass_nan = np.isnan(qty) & ~qnull
        mask = np.zeros(len(j), bool)
        for b, s_lo, s_hi, q_min in RULES:
            mask |= ((brand == b) & (size >= s_lo) & (size <= s_hi)
                     & ((qty >= q_min) | qpass_nan))
        sel_rev = j["rev"].to_numpy(np.float64)[mask]
        sel_nv = (~j["revnull"].to_numpy())[mask]
        return pd.DataFrame({
            "cnt": [np.int64(mask.sum())],
            "s": [np.where(sel_nv, sel_rev, 0.0).sum()],
            "nv": [np.int64(sel_nv.sum())]})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    cnt = np.int64(sum(int(p["cnt"].sum()) for p in parts))
    s = float(sum(float(p["s"].sum()) for p in parts))
    nv = int(sum(int(p["nv"].sum()) for p in parts))
    return pd.DataFrame({
        "n_items": [cnt],
        "revenue": [round_away(np.array([s]), 2)[0] if nv else np.nan]})


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 twin: the distribution of per-customer order counts
    (LEFT JOIN keeps zero-order customers), excluding one priority
    class via the ON clause. One custkey exchange carries per-block
    Arrow partials from both sides — customer row multiplicities and
    per-custkey non-NULL-orderkey counts — so a bucket sees one row
    per (block, custkey), never the join. SQL's GROUP BY c_custkey
    folds duplicate customer rows into ONE group whose joined count
    is multiplied by the row multiplicity (m·cnt); all NULL-custkey
    customer rows form a single group with count 0 (they join
    nothing). Each bucket emits its local histogram; the driver folds
    P small histograms."""
    P = 32
    EXCL = "4-NOT SPECIFIED"

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "cnt": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_cust: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_cust:
            if "c_custkey" not in t.schema.names:
                return _E
            ck = t.column("c_custkey")
            n_null = int(pc.sum(pc.cast(pc.is_null(ck),
                                        pa.int64())).as_py() or 0)
            t2 = t.filter(pc.fill_null(pc.is_valid(ck), False))
            key = pc.cast(t2.column("c_custkey"), pa.int64())
            parts = [pa.table({
                "key": key,
                "side": pa.array(np.zeros(t2.num_rows, np.int8)),
                "cnt": pa.array(np.zeros(t2.num_rows, np.int64)),
                "bucket": pc.bit_wise_and(key, P - 1)})]
            if n_null:
                # the single NULL-custkey group, routed to bucket 0
                parts.append(pa.table({
                    "key": pa.array([0], pa.int64()),
                    "side": pa.array([2], pa.int8()),
                    "cnt": pa.array([n_null], pa.int64()),
                    "bucket": pa.array([0], pa.int64())}))
            return pa.concat_tables(parts)
        if "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_custkey")),
            pc.not_equal(t.column("o_orderpriority"), EXCL))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"key": pc.cast(t2.column("o_custkey"), pa.int64()),
                       "c": pc.cast(pc.is_valid(t2.column("o_orderkey")),
                                    pa.int64())})
             .group_by("key").aggregate([("c", "sum")]))
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(g.num_rows, np.int8)),
            "cnt": g.column("c_sum"),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                              "custdist": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        side = df["side"].to_numpy()
        null_groups = int((side == 2).any())
        cust = df[side == 0]
        ords = df[side == 1]
        hist: dict[int, int] = {}
        if not cust.empty:
            key = cust["key"].to_numpy(np.int64)
            uk, mult = np.unique(key, return_counts=True)
            cnt = np.zeros(len(uk), np.int64)
            if not ords.empty:
                ok = ords["key"].to_numpy(np.int64)
                oc = ords["cnt"].to_numpy(np.int64)
                pos = np.searchsorted(uk, ok)
                inb = (pos < len(uk))
                pos2 = np.minimum(pos, len(uk) - 1)
                inb &= uk[pos2] == ok
                np.add.at(cnt, pos2[inb], oc[inb])
            cc = mult.astype(np.int64) * cnt
            uc, nd = np.unique(cc, return_counts=True)
            hist = dict(zip(uc.tolist(), nd.tolist()))
        if null_groups:
            hist[0] = hist.get(0, 0) + 1
        return pd.DataFrame({"c_count": list(hist.keys()),
                             "custdist": list(hist.values())})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "customer", columns=["c_custkey"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderpriority"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                             "custdist": pd.Series(dtype="int64")})
    out = (pd.concat(parts, ignore_index=True)
           .groupby("c_count", as_index=False)["custdist"].sum())
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return (out.sort_values(["custdist", "c_count"],
                            ascending=[False, False])
            .reset_index(drop=True))


def q_promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 twin: the percentage of one month's revenue from
    PROMO-type parts. One partkey exchange joins the month's lineitems
    to the part dim; each bucket emits three scalars (promo sum,
    total sum, total valid-count) and the driver folds P rows.
    SQL contracts encoded: the CASE's ELSE 0 keeps the numerator
    non-NULL whenever the join is non-empty (a NULL revenue inside
    the THEN branch is skipped by sum); the bare denominator sum IS
    NULL when every joined revenue is NULL; x/0.0 and x/NULL are NULL
    in DuckDB (probed); an ungrouped aggregate emits exactly one row
    even on empty input. NULL p_type fails LIKE, landing in ELSE."""
    P = 32
    lo = pa.scalar(pd.Timestamp("1996-09-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-10-01").to_pydatetime(),
                   pa.timestamp("us"))

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "promo": pa.array([], pa.bool_()),
                   "rev": pa.array([], pa.float64()),
                   "revnull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_part: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_part:
            if "p_partkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("p_partkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("p_partkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "promo": pc.fill_null(
                    pc.starts_with(t2.column("p_type"), "PROMO"), False),
                "rev": pa.array(np.zeros(n, np.float64)),
                "revnull": pa.array(np.zeros(n, bool)),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_partkey" not in t.schema.names:
            return _E
        sd = t.column("l_shipdate")
        keep = pc.and_kleene(
            pc.is_valid(t.column("l_partkey")),
            pc.and_kleene(pc.greater_equal(sd, lo), pc.less(sd, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        rev = pc.multiply(t2.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0, pa.float64()),
                                      t2.column("l_discount")))
        key = pc.cast(t2.column("l_partkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "promo": pa.array(np.zeros(n, bool)),
            "rev": pc.cast(pc.fill_null(rev, 0.0), pa.float64()),
            "revnull": pc.is_null(rev),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"ps": pd.Series(dtype="float64"),
                              "ts": pd.Series(dtype="float64"),
                              "tv": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "promo"]]
        line = df[df["side"] == 1][["key", "rev", "revnull"]]
        if part.empty or line.empty:
            return empty
        j = line.merge(part, on="key")
        if j.empty:
            return empty
        rev = j["rev"].to_numpy(np.float64)
        valid = ~j["revnull"].to_numpy()
        promo = j["promo"].to_numpy() & valid
        return pd.DataFrame({
            "ps": [rev[promo].sum()],
            "ts": [rev[valid].sum()],
            "tv": [np.int64(valid.sum())],
            "n": [np.int64(len(j))]})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "part", columns=["p_partkey", "p_type"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    n = sum(int(p["n"].sum()) for p in parts)
    tv = sum(int(p["tv"].sum()) for p in parts)
    if n == 0 or tv == 0:
        return pd.DataFrame({"promo_share": [np.nan]})
    ps = float(sum(float(p["ps"].sum()) for p in parts))
    ts = float(sum(float(p["ts"].sum()) for p in parts))
    if ts == 0.0:
        return pd.DataFrame({"promo_share": [np.nan]})
    return pd.DataFrame({
        "promo_share": [round_away(np.array([100.0 * ps / ts]), 6)[0]]})


def q_min_balance_supplier_per_part(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 twin (no partsupp table): for every part ever shipped,
    the supplier(s) whose account balance equals the per-part MINIMUM
    over its distinct shippers. Two exchanges: (1) distinct (partkey,
    suppkey) pairs — per-block Arrow-distinct, globally deduped in the
    suppkey bucket — join supplier rows there (duplicate supplier rows
    fan out like SQL); (2) re-partition on partkey, where each bucket
    takes min over VALID balances (an all-NULL part vanishes — the
    equality can never hold) and keeps the ties. No arithmetic touches
    the balance, so float equality is exact."""
    P = 32

    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "pk": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "bal": pa.array([], pa.float64()),
                    "balnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_supp: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_supp:
            if "s_suppkey" not in t.schema.names:
                return _E1
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("s_suppkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("s_suppkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "pk": pa.array(np.zeros(n, np.int64)),
                "name": t2.column("s_name"),
                "bal": pc.cast(pc.fill_null(t2.column("s_acctbal"), 0.0),
                               pa.float64()),
                "balnull": pc.is_null(t2.column("s_acctbal")),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_suppkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                             pc.is_valid(t.column("l_suppkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        g = (pa.table({"key": pc.cast(t2.column("l_suppkey"), pa.int64()),
                       "pk": pc.cast(t2.column("l_partkey"), pa.int64())})
             .group_by(["key", "pk"]).aggregate([]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "pk": g.column("pk"),
            "name": pa.array([None] * n, pa.string()),
            "bal": pa.array(np.zeros(n, np.float64)),
            "balnull": pa.array(np.zeros(n, bool)),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    _O1 = pa.table({"pk": pa.array([], pa.int64()),
                    "sk": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "bal": pa.array([], pa.float64()),
                    "balnull": pa.array([], pa.bool_())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        supp = df[df["side"] == 0][["key", "name", "bal", "balnull"]]
        pairs = (df[df["side"] == 1][["key", "pk"]]
                 .drop_duplicates())  # int64 keys: hashing exact
        if supp.empty or pairs.empty:
            return _O1
        j = pairs.merge(supp, on="key")
        return pa.table({
            "pk": pa.array(j["pk"].to_numpy(np.int64)),
            "sk": pa.array(j["key"].to_numpy(np.int64)),
            "name": pa.array(j["name"].to_numpy(object), pa.string()),
            "bal": pa.array(j["bal"].to_numpy(np.float64)),
            "balnull": pa.array(j["balnull"].to_numpy(bool))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "supplier",
        columns=["s_suppkey", "s_name", "s_acctbal"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey"]).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    # ---- stage 2: per-part min + tie keep over partkey --------------
    _E2 = pa.table({"pk": pa.array([], pa.int64()),
                    "sk": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "bal": pa.array([], pa.float64()),
                    "balnull": pa.array([], pa.bool_()),
                    "bucket": pa.array([], pa.int64())})

    def split2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.schema.names:
            return _E2
        return t.append_column(
            "bucket", pc.bit_wise_and(t.column("pk"), P - 1))

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({
            "p_partkey": pd.Series(dtype="int64"),
            "s_suppkey": pd.Series(dtype="int64"),
            "s_name": pd.Series(dtype="object"),
            "s_acctbal": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        valid = ~df["balnull"].to_numpy()
        dv = df[valid]
        if dv.empty:
            return empty
        mn = dv.groupby("pk")["bal"].min()
        j = dv.merge(mn.rename("mn"), left_on="pk", right_index=True)
        j = j[j["bal"].to_numpy() == j["mn"].to_numpy()]
        return pd.DataFrame({
            "p_partkey": j["pk"].to_numpy(np.int64),
            "s_suppkey": j["sk"].to_numpy(np.int64),
            "s_name": j["name"].to_numpy(object),
            "s_acctbal": j["bal"].to_numpy(np.float64)})

    parts = [p for p in hash_shuffle([(r, ()) for r in stage1],
                                     split2, merge2, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({
            "p_partkey": pd.Series(dtype="int64"),
            "s_suppkey": pd.Series(dtype="int64"),
            "s_name": pd.Series(dtype="object"),
            "s_acctbal": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    return (out.sort_values(["p_partkey", "s_suppkey"])
            .reset_index(drop=True))


def q_important_parts(sf_dir: str, mult: float = 1.5) -> pd.DataFrame:
    """TPC-H Q11 twin (no partsupp): parts whose total revenue exceeds
    ``mult``x the AVERAGE per-part revenue (Q11's fraction scaled by
    part count, so the predicate stays scale-invariant). One partkey exchange folds per-block
    Arrow partials into per-part totals that stay in the object store
    (``gather=False``); a scalar task per bucket returns its local
    (sum, valid-count) so the driver folds P pairs into the global
    threshold, and a filter task per bucket keeps only survivors — the
    driver never holds the per-part table, only the result. A part
    whose every revenue term is NULL has a NULL total: NULL > thr is
    never true, and it contributes nothing to the global sum."""
    import ray

    P = 32

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "s": pa.array([], pa.int64()),
                   "nv": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("l_partkey")),
                                   False))
        if t2.num_rows == 0:
            return _E
        # EXACT integer ten-thousandths (q45 rule): per-part sums land
        # on REAL x.xx5 half-boundaries (2dp-grid data), where a float
        # partial-sum order flips round() at sf>=1
        cents = pc.cast(pc.round(pc.multiply(
            t2.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            t2.column("l_discount"), pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc))
        g = (pa.table({"key": pc.cast(t2.column("l_partkey"), pa.int64()),
                       "r": pc.cast(pc.fill_null(rev, 0), pa.int64()),
                       "v": pc.cast(pc.is_valid(rev), pa.int64())})
             .group_by("key").aggregate([("r", "sum"), ("v", "sum")]))
        return pa.table({"key": g.column("key"),
                         "s": g.column("r_sum"),
                         "nv": g.column("v_sum"),
                         "bucket": pc.bit_wise_and(g.column("key"),
                                                   P - 1)})

    _O = pa.table({"key": pa.array([], pa.int64()),
                   "val": pa.array([], pa.int64())})

    def merge(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O
        df = pa.concat_tables(live).to_pandas()
        g = df.groupby("key", as_index=False).agg(
            s=("s", "sum"), nv=("nv", "sum"))
        g = g[g["nv"].to_numpy() > 0]  # all-NULL part: SQL NULL total
        return pa.table({"key": pa.array(g["key"].to_numpy(np.int64)),
                         "val": pa.array(g["s"].to_numpy(np.int64))})

    tagged = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).to_arrow_refs()]
    refs = hash_shuffle(tagged, split, merge, P=P, gather=False)

    @ray.remote
    def local_sum(t: pa.Table):
        if t.num_rows == 0 or "val" not in t.schema.names:
            return 0, 0
        v = t.column("val").to_numpy(zero_copy_only=False)
        return int(v.sum()), len(v)

    @ray.remote
    def keep_above(t: pa.Table, tot4: int, cnt: int,
                   num: int, den: int) -> pd.DataFrame:
        # exact-int predicate: val4 > tot4·(num/den)/cnt  ⇔
        # val4·den·cnt > tot4·num — object-int math sidesteps int64
        # overflow on the cross-multiplied terms
        if t.num_rows == 0 or "val" not in t.schema.names:
            return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                                 "value": pd.Series(dtype="float64")})
        v = t.column("val").to_numpy(zero_copy_only=False)
        k = t.column("key").to_numpy(zero_copy_only=False)
        m = (v.astype(object) * (den * cnt)) > (tot4 * num)
        m = m.astype(bool)
        return pd.DataFrame({"p_partkey": k[m],
                             "value": round_away(
                                 v[m].astype(np.float64) / 10000.0, 2)})

    partials = ray.get([local_sum.remote(r) for r in refs])
    n = sum(p[1] for p in partials)
    empty = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                          "value": pd.Series(dtype="float64")})
    if n == 0:
        return empty
    tot4 = sum(p[0] for p in partials)
    from fractions import Fraction

    frac = Fraction(mult).limit_denominator(1_000_000)
    parts = [p for p in ray.get(
        [keep_above.remote(r, tot4, n, frac.numerator,
                           frac.denominator) for r in refs])
             if len(p)]
    if not parts:
        return empty
    return (pd.concat(parts, ignore_index=True)
            .sort_values("p_partkey").reset_index(drop=True))


def q_brand_size_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 twin (no partsupp): distinct shippers per (brand,
    size), excluding negative-balance suppliers via a BROADCAST anti-
    set (supplier is the dim side — the exclusion set ships once per
    worker, not per batch). Exchange 1 joins lineitem to part on
    partkey and emits per-bucket DISTINCT (brand, size, suppkey)
    triples; exchange 2 re-buckets on the full-byte string hash of
    brand so one bucket owns each output group, dedups globally, and
    counts. NULL l_suppkey is dropped like SQL's NOT IN + COUNT
    (both reject NULLs); NULL brand/size are legitimate group keys
    (coded driver-independent grouping, NUL-safe). p_size is cast to
    DOUBLE on both sides — a NULL-able int32 would otherwise arrive
    float64 from DuckDB but int32 from a clean engine run."""
    from .pairs import coded_keys, str_u64

    P = 32

    bad = _read_pd(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]
                )
    bal = bad["s_acctbal"].to_numpy(np.float64)
    badset = np.unique(
        bad["s_suppkey"].to_numpy()[np.nan_to_num(bal, nan=0.0) < 0])
    badset = badset[~pd.isna(badset)].astype(np.int64)

    _E1 = pa.table({"key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "sk": pa.array([], pa.int64()),
                    "brand": pa.array([], pa.string()),
                    "size": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table, is_part: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E1
        if is_part:
            if "p_partkey" not in t.schema.names:
                return _E1
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("p_partkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("p_partkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "sk": pa.array(np.zeros(n, np.int64)),
                "brand": t2.column("p_brand"),
                "size": pc.cast(t2.column("p_size"), pa.float64()),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_partkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                             pc.is_valid(t.column("l_suppkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        sk = t2.column("l_suppkey").to_numpy(zero_copy_only=False)
        m = ~np.isin(sk.astype(np.int64), badset)
        t2 = t2.filter(pa.array(m))
        g = (pa.table({"key": pc.cast(t2.column("l_partkey"), pa.int64()),
                       "sk": pc.cast(t2.column("l_suppkey"), pa.int64())})
             .group_by(["key", "sk"]).aggregate([]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "sk": g.column("sk"),
            "brand": pa.array([None] * n, pa.string()),
            "size": pa.array(np.zeros(n, np.float64)),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    _O1 = pa.table({"brand": pa.array([], pa.string()),
                    "size": pa.array([], pa.float64()),
                    "sk": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        part = df[df["side"] == 0][["key", "brand", "size"]]
        line = (df[df["side"] == 1][["key", "sk"]]
                .drop_duplicates())  # int64 keys: hashing exact
        if part.empty or line.empty:
            return _O1
        j = line.merge(part, on="key")
        if j.empty:
            return _O1
        cj, restore = coded_keys(j, ["brand"])
        d = cj[["brand", "size", "sk"]].drop_duplicates()
        d = restore(d)
        b = d["brand"].map(
            lambda v: str_u64(v) if isinstance(v, str) else 0)
        return pa.table({
            "brand": pa.array(d["brand"].to_numpy(object), pa.string()),
            "size": pa.array(d["size"].to_numpy(np.float64)),
            "sk": pa.array(d["sk"].to_numpy(np.int64)),
            "bucket": pa.array((b.to_numpy(np.uint64) & np.uint64(P - 1))
                               .astype(np.int64))})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "part",
        columns=["p_partkey", "p_brand", "p_size"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey"]).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    def split2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sk" not in t.schema.names:
            return _O1
        return t  # bucket column already present

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                              "p_size": pd.Series(dtype="float64"),
                              "supplier_cnt": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["brand"])
        d = cj.drop_duplicates()
        g = (d.groupby(["brand", "size"], as_index=False, dropna=False)
             .agg(supplier_cnt=("sk", "size")))
        g = restore(g)
        return pd.DataFrame({
            "p_brand": g["brand"].to_numpy(object),
            "p_size": g["size"].to_numpy(np.float64),
            "supplier_cnt": g["supplier_cnt"].to_numpy(np.int64)})

    parts = [p for p in hash_shuffle([(r, ()) for r in stage1],
                                     split2, merge2, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "p_size": pd.Series(dtype="float64"),
                             "supplier_cnt": pd.Series(dtype="int64")})
    out = pd.concat(parts, ignore_index=True)
    return (out.sort_values(["supplier_cnt", "p_brand", "p_size"],
                            ascending=[False, True, True])
            .reset_index(drop=True))


def q_priority_line_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 twin (no shipmode column): per l_linestatus, how many
    1996-shipped lineitems belong to high-priority vs low-priority
    orders. One orderkey exchange; each bucket joins and emits partial
    (linestatus, high, low) counts, the driver folds a handful of
    rows on full-byte string codes (linestatus can carry NULs/NULLs).
    SQL's CASE three-valued logic: a NULL priority fails BOTH ``IN``
    and ``NOT IN``, counting in neither column; a NUL-variant like
    '1-URGENT\\x00z' is a DIFFERENT string that lands in low."""
    from .pairs import coded_keys

    HIGH = {"1-URGENT", "2-HIGH"}
    P = 32
    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").to_pydatetime(),
                   pa.timestamp("us"))

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "cls": pa.array([], pa.int8()),
                   "status": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("o_orderkey")),
                                       False))
            pri = t2.column("o_orderpriority").to_numpy(
                zero_copy_only=False)
            cls = np.full(len(pri), 0, np.int8)  # low
            for h in HIGH:
                cls[pri == h] = 1
            cls[pd.isna(pri)] = -1  # NULL: counts in NEITHER
            key = pc.cast(t2.column("o_orderkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(len(pri), np.int8)),
                "cls": pa.array(cls),
                "status": pa.array([None] * len(pri), pa.string()),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E
        sd = t.column("l_shipdate")
        keep = pc.and_kleene(
            pc.is_valid(t.column("l_orderkey")),
            pc.and_kleene(pc.greater_equal(sd, lo), pc.less(sd, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        n = t2.num_rows
        key = pc.cast(t2.column("l_orderkey"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(np.ones(n, np.int8)),
            "cls": pa.array(np.zeros(n, np.int8)),
            "status": t2.column("l_linestatus"),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"l_linestatus": pd.Series(dtype="object"),
                              "high": pd.Series(dtype="int64"),
                              "low": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["key", "cls"]]
        line = df[df["side"] == 1][["key", "status"]]
        if ords.empty or line.empty:
            return empty
        j = line.merge(ords, on="key")
        if j.empty:
            return empty
        cls = j["cls"].to_numpy(np.int8)
        j = j.assign(h=(cls == 1).astype(np.int64),
                     lw=(cls == 0).astype(np.int64))
        cj, restore = coded_keys(j, ["status"])
        g = (cj.groupby("status", as_index=False, dropna=False)
             .agg(high=("h", "sum"), lw=("lw", "sum")))
        g = restore(g)
        return pd.DataFrame({"l_linestatus": g["status"].to_numpy(object),
                             "high": g["high"].to_numpy(np.int64),
                             "low": g["lw"].to_numpy(np.int64)})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"l_linestatus": pd.Series(dtype="object"),
                          "high_line_count": pd.Series(dtype="int64"),
                          "low_line_count": pd.Series(dtype="int64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    cj, restore = coded_keys(allp, ["l_linestatus"])
    g = (cj.groupby("l_linestatus", as_index=False, dropna=False)
         .agg(high_line_count=("high", "sum"),
              low_line_count=("low", "sum")))
    g = restore(g)
    g["high_line_count"] = g["high_line_count"].astype(np.int64)
    g["low_line_count"] = g["low_line_count"].astype(np.int64)
    key = g["l_linestatus"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()
        if isinstance(v, str) else "￿")
    return (g.loc[key.sort_values().index]
            .reset_index(drop=True))


def q_dominant_red_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 twin (no partsupp): suppliers who shipped MORE THAN
    HALF of some red part's total 1996 volume. The red-part filter is
    a BROADCAST set (part is the dim side); one partkey exchange then
    computes per-(part, supplier) and per-part quantity sums in the
    same bucket, so the half-share predicate never shuffles twice.
    Quantities live on a 0.5 grid, so every partial sum is exactly
    representable and the strict > at exactly-half is bit-exact on
    both sides. The small qualifying-supplier set broadcasts into a
    supplier scan whose duplicate rows fan out like SQL's join. A
    part or pair whose every quantity is NULL has a NULL sum: the
    comparison is never true."""
    import ray

    P = 32
    lo = pa.scalar(pd.Timestamp("1996-01-01").to_pydatetime(),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01").to_pydatetime(),
                   pa.timestamp("us"))

    red = _read_pd(sf_dir, "part", columns=["p_partkey", "p_name"]
                )
    nm = red["p_name"]
    isred = nm.notna() & nm.str.startswith("red", na=False)
    redset = np.unique(red.loc[isred & red["p_partkey"].notna(),
                               "p_partkey"].to_numpy(np.int64))

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "sk": pa.array([], pa.int64()),
                   "q": pa.array([], pa.float64()),
                   "nv": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return _E
        sd = t.column("l_shipdate")
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                          pc.is_valid(t.column("l_suppkey"))),
            pc.and_kleene(pc.greater_equal(sd, lo), pc.less(sd, hi)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        pk = t2.column("l_partkey").to_numpy(zero_copy_only=False)
        t2 = t2.filter(pa.array(np.isin(pk.astype(np.int64), redset)))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"key": pc.cast(t2.column("l_partkey"), pa.int64()),
                       "sk": pc.cast(t2.column("l_suppkey"), pa.int64()),
                       "q": pc.cast(pc.fill_null(t2.column("l_quantity"),
                                                 0.0), pa.float64()),
                       "v": pc.cast(pc.is_valid(t2.column("l_quantity")),
                                    pa.int64())})
             .group_by(["key", "sk"]).aggregate([("q", "sum"),
                                                 ("v", "sum")]))
        return pa.table({"key": g.column("key"),
                         "sk": g.column("sk"),
                         "q": g.column("q_sum"),
                         "nv": g.column("v_sum"),
                         "bucket": pc.bit_wise_and(g.column("key"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"sk": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        g = df.groupby(["key", "sk"], as_index=False).agg(
            q=("q", "sum"), nv=("nv", "sum"))
        g = g[g["nv"].to_numpy() > 0]  # all-NULL pair: SQL NULL sum
        if g.empty:
            return pd.DataFrame({"sk": pd.Series(dtype="int64")})
        tot = g.groupby("key")["q"].sum()
        j = g.merge(tot.rename("tq"), left_on="key", right_index=True)
        j = j[j["q"].to_numpy() > 0.5 * j["tq"].to_numpy()]
        return pd.DataFrame({"sk": np.unique(j["sk"].to_numpy(np.int64))})

    tagged = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype="object")})
    if not parts:
        return empty
    qual = np.unique(np.concatenate(
        [p["sk"].to_numpy(np.int64) for p in parts]))
    qref = ray.put(qual)

    def pick(batch: pa.Table, q=qref) -> pa.Table:
        qs = ray.get(q) if isinstance(q, ray.ObjectRef) else q
        if batch.num_rows == 0 or "s_suppkey" not in batch.schema.names:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "s_name": pa.array([], pa.string())})
        sk = batch.column("s_suppkey").to_numpy(zero_copy_only=False)
        m = pd.notna(sk) & np.isin(
            np.nan_to_num(sk.astype(np.float64), nan=-1).astype(np.int64),
            qs)
        b = batch.filter(pa.array(m))
        return pa.table({"s_suppkey": pc.cast(b.column("s_suppkey"),
                                              pa.int64()),
                         "s_name": b.column("s_name")})

    out = (_read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
           .map_batches(pick, batch_format="pyarrow").to_pandas())
    if out.empty:
        return empty
    return out.sort_values(["s_suppkey", "s_name"]).reset_index(drop=True)


def q_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """percent_rank() and cume_dist() windows over per-user event
    values (the two rank-normalizing windows the battery lacked). One
    user exchange; each bucket sorts its users' finite values once and
    derives both functions from first/last positions of each tie run
    — pr = (min_rank-1)/(n-1) (0 for a single-row partition, probed),
    cd = max_rank/n. Both are single divisions of exact small ints, so
    engine and DuckDB doubles are bit-identical."""
    P = 32

    _E = pa.table({"eid": pa.array([], pa.int64()),
                   "uid": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_id")),
                          pc.is_valid(t.column("user_id"))),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        uid = pc.cast(t2.column("user_id"), pa.int64())
        return pa.table({"eid": pc.cast(t2.column("event_id"), pa.int64()),
                         "uid": uid,
                         "v": pc.cast(t2.column("value"), pa.float64()),
                         "bucket": pc.bit_wise_and(uid, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "pr": pd.Series(dtype="float64"),
                              "cd": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        eid = df["eid"].to_numpy(np.int64)
        uid = df["uid"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((v, uid))
        eid, uid, v = eid[order], uid[order], v[order]
        n = len(v)
        if n == 0:
            return empty
        # group boundaries per user, tie-run boundaries per (user, v)
        new_u = np.empty(n, bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        gstart = np.maximum.accumulate(np.where(new_u, np.arange(n), 0))
        gid = np.cumsum(new_u) - 1
        gsize = np.bincount(gid)
        new_run = new_u.copy()
        new_run[1:] |= v[1:] != v[:-1]
        run_first = np.maximum.accumulate(
            np.where(new_run, np.arange(n), 0))
        # last index of each run: reverse trick
        run_id = np.cumsum(new_run) - 1
        run_last = np.zeros(run_id[-1] + 1, np.int64)
        run_last[run_id] = np.arange(n)  # last write wins
        last_idx = run_last[run_id]
        rank_min = run_first - gstart + 1
        rank_max = last_idx - gstart + 1
        gn = gsize[gid].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = (rank_min - 1.0) / (gn - 1.0)
        pr[gn == 1.0] = 0.0
        cd = rank_max / gn
        return pd.DataFrame({"event_id": eid, "pr": pr, "cd": cd})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "value"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "pr": pd.Series(dtype="float64"),
                             "cd": pd.Series(dtype="float64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("event_id").reset_index(drop=True))


def q_zipf_slope(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Zipf's-law fit over the corpus: least-squares slope of
    ln(frequency) against ln(rank) for the top-``k`` words. The word
    counting is the q13 shuffle shape (per-batch counter partials →
    one vocab-bounded groupby-sum); only the k-row head reaches the
    driver's closed-form regression. Tokenization is the shared ASCII
    ``\\w+``-on-lowered-text contract (textops._TOKEN_RX ==
    regexp_extract_all(lower(text), '\\w+')), with NO stoplist/length
    filter — raw Zipf needs the function words. Empty corpus mirrors
    SQL's ungrouped-aggregate row: (NULL slope, 0 words)."""
    import re as _re

    from collections import Counter

    from ray.data.aggregate import Sum

    from .textops import _docs

    ds = _docs(sf_dir, ["text"])
    rx = _re.compile(r"\w+", _re.ASCII)

    def partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counter.update(rx.findall((t or "").lower()))
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*counter.items())
        return pa.table({"word": pa.array(list(words)),
                         "n": pa.array(list(ns), pa.int64())})

    agg = _with_cols((ds.map_batches(partial, batch_format="pyarrow")
                      .groupby("word")
                      .aggregate(Sum("n", alias_name="f"))
                      .to_pandas()),
                     {"word": "object", "f": "int64"})
    agg = agg[agg["f"].notna()]
    if agg.empty:
        return pd.DataFrame({"zipf_slope": [np.nan],
                             "n_words": np.array([0], np.int64)})
    head = (agg.sort_values(["f", "word"], ascending=[False, True])
            .head(k).reset_index(drop=True))
    f = head["f"].to_numpy(np.float64)
    n = len(f)
    if n < 2:
        return pd.DataFrame({"zipf_slope": [np.nan],
                             "n_words": np.array([n], np.int64)})
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(f)
    xm, ym = x.mean(), y.mean()
    slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
    return pd.DataFrame({"zipf_slope": round_away(np.array([slope]), 6),
                         "n_words": np.array([n], np.int64)})


def q_weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median extendedprice per returnflag: the
    smallest price whose cumulative weight reaches half the group
    total. Exchange 1 buckets on the PRICE (balanced even though the
    flag domain is tiny/skewed) and folds (flag, price, Σweight)
    partials; exchange 2 re-buckets the now value-distinct rows on the
    flag hash, sorts each group's distinct prices once and walks the
    cumulative weight. Weights sit on the 0.5 quantity grid, so every
    partial/cumulative sum is exactly representable and the >= at
    exactly-half is bit-exact against DuckDB's windowed sum. Only
    positive weights enter (a negative-weight median is ill-defined;
    DuckDB's NaN > 0 is TRUE under its total order but quantity is
    NULL-dirty, not NaN, by the fuzz contract). Scale note: stage 2
    holds DISTINCT (flag, price) rows — bounded for discrete-grid
    prices; a continuous unbounded domain would use q61's histogram
    refinement instead."""
    from .pairs import coded_keys, str_u64

    P = 32

    _E1 = pa.table({"rf": pa.array([], pa.string()),
                    "x": pa.array([], pa.float64()),
                    "w": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_quantity" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(
            pc.greater(t.column("l_quantity"), 0.0),
            pc.is_valid(t.column("l_extendedprice")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E1
        df = pd.DataFrame({
            "rf": t2.column("l_returnflag").to_numpy(zero_copy_only=False),
            "x": t2.column("l_extendedprice").to_numpy(
                zero_copy_only=False).astype(np.float64),
            "w": t2.column("l_quantity").to_numpy(
                zero_copy_only=False).astype(np.float64)})
        cj, restore = coded_keys(df, ["rf"])
        g = cj.groupby(["rf", "x"], as_index=False)["w"].sum()
        g = restore(g)
        xb = g["x"].to_numpy(np.float64) + 0.0  # -0.0 -> +0.0: one bucket
        return pa.table({
            "rf": pa.array(g["rf"].to_numpy(object), pa.string()),
            "x": pa.array(xb),
            "w": pa.array(g["w"].to_numpy(np.float64)),
            "bucket": pa.array(
                (xb.view(np.uint64) & np.uint64(P - 1)).astype(np.int64))})

    _O1 = pa.table({"rf": pa.array([], pa.string()),
                    "x": pa.array([], pa.float64()),
                    "w": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64())})

    def merge1(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _O1
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["rf"])
        g = cj.groupby(["rf", "x"], as_index=False)["w"].sum()
        g = restore(g)
        b = g["rf"].map(
            lambda v: str_u64(v) if isinstance(v, str) else 0)
        return pa.table({
            "rf": pa.array(g["rf"].to_numpy(object), pa.string()),
            "x": pa.array(g["x"].to_numpy(np.float64)),
            "w": pa.array(g["w"].to_numpy(np.float64)),
            "bucket": pa.array((b.to_numpy(np.uint64) & np.uint64(P - 1))
                               .astype(np.int64))})

    tagged = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    ).to_arrow_refs()]
    stage1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)

    def split2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rf" not in t.schema.names:
            return _O1
        return t

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                              "wmedian": pd.Series(dtype="float64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["rf"])
        g = cj.groupby(["rf", "x"], as_index=False)["w"].sum()
        out_rf, out_x = [], []
        for code, grp in g.groupby("rf"):
            grp = grp.sort_values("x")
            w = grp["w"].to_numpy(np.float64)
            cw = np.cumsum(w)
            tw = cw[-1]
            i = int(np.argmax(cw >= 0.5 * tw))
            out_rf.append(code)
            out_x.append(grp["x"].to_numpy(np.float64)[i])
        out = restore(pd.DataFrame({"rf": out_rf}))
        return pd.DataFrame({
            "l_returnflag": out["rf"].to_numpy(object),
            "wmedian": np.array(out_x, np.float64)})

    parts = [p for p in hash_shuffle([(r, ()) for r in stage1],
                                     split2, merge2, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                             "wmedian": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    key = out["l_returnflag"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()
        if isinstance(v, str) else "￿")
    return out.loc[key.sort_values().index].reset_index(drop=True)


def q_nation_theil_index(sf_dir: str) -> pd.DataFrame:
    """Theil-T inequality index of positive customer balances per
    nation NAME. Two broadcast-lut passes over customer (nation is the
    dim side, applied with ROW multiplicity so duplicate dim rows fan
    out like SQL's join, and two nationkeys sharing a name merge like
    SQL's GROUP BY n_name): pass 1 folds (n, Σx) per nationkey into
    per-name means; pass 2 broadcasts the means and sums the per-row
    terms (x/μ)·ln(x/μ) — the SAME per-row doubles DuckDB's window
    form produces, NOT the telescoped Σx·lnx/(Nμ)−lnμ closed form,
    whose subtraction of two ≈lnμ terms cancels catastrophically when
    inequality is near zero (q92 lesson). NaN balances are excluded
    explicitly: DuckDB's total order calls NaN > 0 TRUE, so the
    oracle needs isfinite() and the engine mirrors it."""
    import ray

    P = 32

    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name"])
    nat = nat[nat["n_nationkey"].notna()]

    def _cust_refs():
        return _read(sf_dir, "customer",
                     columns=["c_nationkey", "c_acctbal"]).to_arrow_refs()

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "sx": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split_p1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return _E
        x = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        x = np.asarray(x, np.float64)
        k = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        k = np.asarray(k, np.float64)
        m = np.isfinite(x) & (x > 0) & ~np.isnan(k)
        if not m.any():
            return _E
        kk = k[m].astype(np.int64)
        xx = x[m]
        uk, inv = np.unique(kk, return_inverse=True)
        n = np.bincount(inv)
        sx = np.zeros(len(uk), np.float64)
        np.add.at(sx, inv, xx)
        return pa.table({"key": pa.array(uk),
                         "n": pa.array(n.astype(np.int64)),
                         "sx": pa.array(sx),
                         "bucket": pc.bit_wise_and(pa.array(uk), P - 1)})

    def merge_p1(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "sx": pd.Series(dtype="float64")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby("key", as_index=False).agg(
            n=("n", "sum"), sx=("sx", lambda s: s.to_numpy().sum()))

    tagged = [(r, ()) for r in _cust_refs()]
    p1 = [p for p in hash_shuffle(tagged, split_p1, merge_p1, P=P)
          if len(p)]
    empty = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                          "theil": pd.Series(dtype="float64"),
                          "n_customers": pd.Series(dtype="int64")})
    if not p1:
        return empty
    per_key = pd.concat(p1, ignore_index=True)

    # fold per-KEY partials into per-NAME groups through the dim rows
    # (one contribution per dim ROW — duplicate rows fan out like SQL)
    from .pairs import coded_keys

    jn = nat.merge(per_key, left_on="n_nationkey", right_on="key")
    if jn.empty:
        return empty
    cj, restore = coded_keys(jn, ["n_name"])
    gname = cj.groupby("n_name", as_index=False).agg(
        n=("n", "sum"), sx=("sx", lambda s: s.to_numpy().sum()))
    gname["mu"] = gname["sx"].to_numpy() / gname["n"].to_numpy()
    # per-KEY mean lookup for pass 2: key -> (name_code, mu)
    key_mu: dict[int, float] = {}
    code_mu = dict(zip(gname["n_name"], gname["mu"]))
    for _, row in cj.iterrows():
        key_mu[int(row["key"])] = code_mu[row["n_name"]]
    muref = ray.put(key_mu)

    def split_p2(t: pa.Table) -> pa.Table:
        mus = ray.get(muref) if isinstance(muref, ray.ObjectRef) else muref
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return _E
        x = np.asarray(t.column("c_acctbal").to_numpy(
            zero_copy_only=False), np.float64)
        k = np.asarray(t.column("c_nationkey").to_numpy(
            zero_copy_only=False), np.float64)
        m = np.isfinite(x) & (x > 0) & ~np.isnan(k)
        if not m.any():
            return _E
        kk = k[m].astype(np.int64)
        xx = x[m]
        keep = np.isin(kk, np.fromiter(mus.keys(), np.int64,
                                       len(mus)) if mus else
                       np.empty(0, np.int64))
        kk, xx = kk[keep], xx[keep]
        if len(kk) == 0:
            return _E
        mu = np.array([mus[int(v)] for v in kk], np.float64)
        r = xx / mu
        term = r * np.log(r)
        uk, inv = np.unique(kk, return_inverse=True)
        st = np.zeros(len(uk), np.float64)
        np.add.at(st, inv, term)
        return pa.table({"key": pa.array(uk),
                         "n": pa.array(np.zeros(len(uk), np.int64)),
                         "sx": pa.array(st),
                         "bucket": pc.bit_wise_and(pa.array(uk), P - 1)})

    p2 = [p for p in hash_shuffle([(r, ()) for r in _cust_refs()],
                                  split_p2, merge_p1, P=P) if len(p)]
    per_key2 = (pd.concat(p2, ignore_index=True) if p2 else
                pd.DataFrame({"key": pd.Series(dtype="int64"),
                              "sx": pd.Series(dtype="float64")}))
    st_by_key = dict(zip(per_key2["key"].astype(np.int64),
                         per_key2["sx"].astype(np.float64)))
    # fold term sums per name through the SAME dim-row fan-out
    sums: dict = {}
    for _, row in cj.iterrows():
        code = row["n_name"]
        sums[code] = sums.get(code, 0.0) + st_by_key.get(
            int(row["key"]), 0.0)
    gname["theil"] = round_away(
        np.array([sums.get(c, 0.0) for c in gname["n_name"]])
        / gname["n"].to_numpy(np.float64), 6)
    out = restore(gname[["n_name", "theil", "n"]].rename(
        columns={"n": "n_customers"}))
    out["n_customers"] = out["n_customers"].astype(np.int64)
    key = out["n_name"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()
        if isinstance(v, str) else "￿")
    return out.loc[key.sort_values().index].reset_index(drop=True)


def q_user_type_signatures(sf_dir: str) -> pd.DataFrame:
    """Behavioral-set histogram: how many users saw each exact
    combination of (click, purchase, error) activity. Per-batch
    3-state partials per user (bool_or is NULL when every comparison
    input is NULL — a user whose event types are ALL NULL gets NULL
    flags, its own SQL group) OR-fold through one user exchange; each
    bucket groups its users by signature and the driver folds P tiny
    histograms. Output flag dtype follows the oracle's data-dependent
    convention: plain bool when NULL-free, object-with-None otherwise
    (q103 contract)."""
    P = 32
    TYPES = ["click", "purchase", "error"]

    _E = pa.table({"uid": pa.array([], pa.int64()),
                   "seen": pa.array([], pa.int8()),
                   "flags": pa.array([], pa.int8()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("user_id")),
                                   False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        valid = pd.notna(et)
        flags = np.zeros(len(uid), np.int8)
        for i, ty in enumerate(TYPES):
            flags |= ((et == ty).astype(np.int8) << i)
        uk, inv = np.unique(uid, return_inverse=True)
        fl = np.zeros(len(uk), np.int8)
        sv = np.zeros(len(uk), np.int8)
        np.bitwise_or.at(fl, inv, flags)
        np.bitwise_or.at(sv, inv, valid.astype(np.int8))
        return pa.table({"uid": pa.array(uk),
                         "seen": pa.array(sv),
                         "flags": pa.array(fl),
                         "bucket": pc.bit_wise_and(pa.array(uk), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"sig": pd.Series(dtype="int64"),
                              "n_users": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        uid = df["uid"].to_numpy(np.int64)
        uk, inv = np.unique(uid, return_inverse=True)
        fl = np.zeros(len(uk), np.int8)
        sv = np.zeros(len(uk), np.int8)
        np.bitwise_or.at(fl, inv, df["flags"].to_numpy(np.int8))
        np.bitwise_or.at(sv, inv, df["seen"].to_numpy(np.int8))
        # signature: -1 = NULL flags (no non-NULL type at all)
        sig = np.where(sv > 0, fl.astype(np.int64), -1)
        us, cnt = np.unique(sig, return_counts=True)
        return pd.DataFrame({"sig": us.astype(np.int64),
                             "n_users": cnt.astype(np.int64)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "event_type"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    cols = ["has_click", "has_purchase", "has_error"]
    empty = pd.DataFrame({**{c: pd.Series(dtype="bool") for c in cols},
                          "n_users": pd.Series(dtype="int64")})
    if not parts:
        return empty
    h = (pd.concat(parts, ignore_index=True)
         .groupby("sig", as_index=False)["n_users"].sum())
    sig = h["sig"].to_numpy(np.int64)
    out = {}
    has_null = bool((sig < 0).any())
    for i, c in enumerate(cols):
        vals = ((sig >> i) & 1).astype(bool)
        if has_null:
            col = np.array([None if s < 0 else bool(v)
                            for s, v in zip(sig, vals)], object)
            out[c] = col
        else:
            out[c] = vals
    out["n_users"] = h["n_users"].to_numpy(np.int64)
    res = pd.DataFrame(out)
    sk = pd.DataFrame(
        {c: res[c].map(lambda v: 2 if v is None else int(bool(v)))
         for c in cols})
    order = sk.sort_values(cols).index
    return res.loc[order].reset_index(drop=True)


def q_benford_totalprice(sf_dir: str) -> pd.DataFrame:
    """Benford's-law audit of order totals: observed share of each
    leading digit vs log10(1+1/d). The digit is extracted from the
    INTEGER part as a string on both sides (floor → BIGINT → first
    char) — never via log10, whose last-ulp at exact powers of ten
    would misbin boundary values. One pass of per-batch bincounts; the
    driver folds P nine-bin rows. Only finite totals >= 1 qualify
    (sub-unit and negative amounts have no leading digit in this
    scheme; NaN >= 1 is TRUE under DuckDB's total order, so the
    oracle carries an explicit isfinite)."""
    P = 8

    _E = pa.table({"digit": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        x = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        x = x[np.isfinite(x) & (x >= 1.0)]
        if len(x) == 0:
            return _E
        f = np.floor(x).astype(np.int64)
        # leading decimal digit without strings: strip trailing digits
        while True:
            big = f >= 10
            if not big.any():
                break
            f[big] //= 10
        cnt = np.bincount(f, minlength=10)[1:10]
        dig = np.arange(1, 10, dtype=np.int64)
        keep = cnt > 0
        return pa.table({"digit": pa.array(dig[keep]),
                         "n": pa.array(cnt[keep].astype(np.int64)),
                         "bucket": pa.array(dig[keep] % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby("digit", as_index=False)["n"].sum()

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders", columns=["o_totalprice"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"digit": pd.Series(dtype="int64"),
                          "observed": pd.Series(dtype="float64"),
                          "expected": pd.Series(dtype="float64"),
                          "n": pd.Series(dtype="int64")})
    if not parts:
        return empty
    h = (pd.concat(parts, ignore_index=True)
         .groupby("digit", as_index=False)["n"].sum())
    tot = float(h["n"].sum())
    d = h["digit"].to_numpy(np.int64).astype(np.float64)
    return pd.DataFrame({
        "digit": h["digit"].to_numpy(np.int64),
        "observed": round_away(h["n"].to_numpy(np.float64) / tot, 6),
        "expected": round_away(np.log10(1.0 + 1.0 / d), 6),
        "n": h["n"].to_numpy(np.int64)}).sort_values("digit").reset_index(
            drop=True)


def q_source_cosine_matrix(sf_dir: str) -> pd.DataFrame:
    """Pairwise cosine similarity between SOURCE-level term-frequency
    vectors (which corpora write alike). Counts are exact integers, so
    every dot/norm partial sums exactly in float64 regardless of
    association order — the final cosine is bit-identical to the SQL
    twin, no rounding gymnastics needed. The exchange is partitioned
    on the WORD hash: each bucket owns a vocabulary slice, forms the
    per-word source-count vectors, and emits per-pair partial dots and
    per-source partial norms; the driver folds O(sources²) rows.
    Tokenization is the shared ASCII lower-\\w+ contract."""
    import re as _re

    from collections import Counter

    from .pairs import str_u64

    P = 32
    rx = _re.compile(r"\w+", _re.ASCII)

    _E = pa.table({"src": pa.array([], pa.string()),
                   "word": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        keep = pc.is_valid(t.column("source"))
        t2 = t.filter(pc.fill_null(keep, False))
        counter: Counter = Counter()
        for src, txt in zip(t2.column("source").to_pylist(),
                            t2.column("text").to_pylist()):
            for w in rx.findall((txt or "").lower()):
                counter[(src, w)] += 1
        if not counter:
            return _E
        srcs, words = zip(*counter.keys())
        cs = list(counter.values())
        b = np.array([str_u64(w) & (P - 1) for w in words], np.int64)
        return pa.table({"src": pa.array(list(srcs), pa.string()),
                         "word": pa.array(list(words), pa.string()),
                         "c": pa.array(cs, pa.int64()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"src_a": pd.Series(dtype="object"),
                              "src_b": pd.Series(dtype="object"),
                              "dot": pd.Series(dtype="float64"),
                              "nn": pd.Series(dtype="float64"),
                              "is_norm": pd.Series(dtype="bool")})
        if not live:
            return empty
        from .pairs import coded_keys

        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["src", "word"])
        g = cj.groupby(["src", "word"], as_index=False)["c"].sum()
        gs = restore(g)  # src back to strings; word stays coded? no:
        # restore maps BOTH coded columns; re-code the word for the
        # per-word loop and keep the STRING src for byte-order pairing
        src_str = gs["src"].to_numpy(object)
        hexkey = np.array(
            [v.encode("utf-8", "surrogatepass").hex() for v in src_str],
            object)
        word_code = g["word"].to_numpy(np.int64)
        cc = g["c"].to_numpy(np.float64)
        # per-source norm partials over this vocab slice — NUL-safe
        # code-keyed groupby (plain pandas object groupby merges 'fz'
        # with 'fz\x00x' through its C-string hash, CLAUDE.md rule)
        from .pairs import factorize_strings
        scodes, suniq = factorize_strings(pd.Series(src_str))
        nnsum = np.bincount(scodes, weights=cc * cc,
                            minlength=len(suniq))
        nrm = pd.DataFrame({"src": pd.Series(list(suniq), dtype=object),
                            "nn": nnsum})
        # per-word cross products: sources per word are few; orient
        # every pair by the SQL a.source < b.source byte order
        order = np.lexsort((hexkey, word_code))
        wc, ss, hh, c2 = (word_code[order], src_str[order],
                          hexkey[order], cc[order])
        rows_a, rows_b, dots = [], [], []
        n = len(wc)
        i = 0
        while i < n:
            j = i + 1
            while j < n and wc[j] == wc[i]:
                j += 1
            for a in range(i, j - 1):
                for b in range(a + 1, j):
                    rows_a.append(ss[a])
                    rows_b.append(ss[b])
                    dots.append(c2[a] * c2[b])
            i = j
        res = pd.DataFrame({
            "src_a": np.array(rows_a, object),
            "src_b": np.array(rows_b, object),
            "dot": np.array(dots, np.float64),
            "nn": np.zeros(len(dots), np.float64),
            "is_norm": np.zeros(len(dots), bool)})
        nres = pd.DataFrame({
            "src_a": nrm["src"].to_numpy(object),
            "src_b": nrm["src"].to_numpy(object),
            "dot": np.zeros(len(nrm), np.float64),
            "nn": nrm["nn"].to_numpy(np.float64),
            "is_norm": np.ones(len(nrm), bool)})
        return pd.concat([res, nres], ignore_index=True)

    tagged = [(r, ()) for r in _read(
        sf_dir, "documents", columns=["source", "text"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"src_a": pd.Series(dtype="object"),
                          "src_b": pd.Series(dtype="object"),
                          "cosine": pd.Series(dtype="float64")})
    if not parts:
        return empty
    from .pairs import coded_keys

    allp = pd.concat(parts, ignore_index=True)
    cj, restore = coded_keys(allp, ["src_a", "src_b"])
    norms = restore(cj[cj["is_norm"]]
                    .groupby("src_a", as_index=False)["nn"].sum())
    dots = (cj[~cj["is_norm"]]
            .groupby(["src_a", "src_b"], as_index=False)["dot"].sum())
    if dots.empty:
        return empty
    out = restore(dots[["src_a", "src_b"]].copy())
    # Python-dict lookup keyed by the FULL string (the NUL trap is
    # pandas' C-string hash, not dict) — the two code LUTs differ
    nmap = dict(zip(norms["src_a"], norms["nn"]))
    na = np.array([nmap[v] for v in out["src_a"]], np.float64)
    nb = np.array([nmap[v] for v in out["src_b"]], np.float64)
    cos = dots["dot"].to_numpy(np.float64) / (np.sqrt(na) * np.sqrt(nb))
    out["cosine"] = round_away(cos, 6)
    k1 = out["src_a"].map(lambda v: v.encode("utf-8",
                                             "surrogatepass").hex())
    k2 = out["src_b"].map(lambda v: v.encode("utf-8",
                                             "surrogatepass").hex())
    order = pd.DataFrame({"a": k1, "b": k2}).sort_values(["a", "b"]).index
    return out.loc[order].reset_index(drop=True)


def q_last_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """Marketing-style last-touch attribution: each purchase event is
    credited to the user's most recent PRECEDING non-purchase event
    type (SQL: lag(CASE... END IGNORE NULLS) — the gappy LOCF window).
    One user exchange; each bucket sorts its users once by
    (user, ts, event_id) and forward-fills the carry vector with the
    standard maximum-accumulate index trick, then counts purchases per
    carried type on full-byte string codes. A purchase with no prior
    non-purchase credits the NULL bucket; NULL event_type rows are
    TRANSPARENT to the carry (the CASE yields NULL, IGNORE NULLS skips
    it) but are never credited themselves."""
    from .pairs import coded_keys

    P = 32

    _E = pa.table({"uid": pa.array([], pa.int64()),
                   "t": pa.array([], pa.int64()),
                   "eid": pa.array([], pa.int64()),
                   "etype": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.is_valid(t.column("ts"))),
            pc.is_valid(t.column("event_id")))
        t2 = t.filter(pc.fill_null(keep, False))
        uid = pc.cast(t2.column("user_id"), pa.int64())
        return pa.table({"uid": uid,
                         "t": pc.cast(t2.column("ts"), pa.int64()),
                         "eid": pc.cast(t2.column("event_id"), pa.int64()),
                         "etype": t2.column("event_type"),
                         "bucket": pc.bit_wise_and(uid, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"attr": pd.Series(dtype="object"),
                              "n_purchases": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        order = np.lexsort((df["eid"].to_numpy(np.int64),
                            df["t"].to_numpy(np.int64),
                            df["uid"].to_numpy(np.int64)))
        df = df.iloc[order].reset_index(drop=True)
        uid = df["uid"].to_numpy(np.int64)
        et = df["etype"].to_numpy(object)
        n = len(df)
        is_valid_type = pd.notna(et)
        is_purchase = np.zeros(n, bool)
        is_purchase[is_valid_type] = et[is_valid_type] == "purchase"
        carrier = is_valid_type & ~is_purchase  # CASE non-NULL values
        new_u = np.empty(n, bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        # carry index: last carrier STRICTLY BEFORE row i in its user.
        # Plain running max of carrier indices, then invalidate any
        # carry that precedes the row's own user segment start.
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_u, idx, 0))
        cand = np.where(carrier, idx, -1)
        acc = np.maximum.accumulate(cand)
        acc = np.where(acc >= seg_start, acc, -1)
        prev = np.empty(n, np.int64)
        prev[1:] = acc[:-1]
        prev[0] = -1
        prev = np.where(new_u, -1, prev)
        attr = np.array([None] * n, object)
        has = prev >= 0
        attr[has] = et[prev[has]]
        out = pd.DataFrame({"attr": attr[is_purchase]})
        if out.empty:
            return empty
        cj, restore = coded_keys(out, ["attr"])
        g = (cj.groupby("attr", as_index=False)
             .size().rename(columns={"size": "n_purchases"}))
        g = restore(g)
        return pd.DataFrame({"attr": g["attr"].to_numpy(object),
                             "n_purchases":
                                 g["n_purchases"].to_numpy(np.int64)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"attr": pd.Series(dtype="object"),
                          "n_purchases": pd.Series(dtype="int64")})
    if not parts:
        return empty
    from .pairs import coded_keys

    allp = pd.concat(parts, ignore_index=True)
    cj, restore = coded_keys(allp, ["attr"])
    g = cj.groupby("attr", as_index=False)["n_purchases"].sum()
    g = restore(g)
    g["n_purchases"] = g["n_purchases"].astype(np.int64)
    key = g["attr"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()
        if isinstance(v, str) else "￿")
    return g.loc[key.sort_values().index].reset_index(drop=True)


def q_order_total_audit(sf_dir: str, tol: float = 0.05) -> pd.DataFrame:
    """Cross-table reconciliation audit: does each order's recorded
    total match its lineitems' gross revenue within ``tol``? One
    orderkey exchange carries per-block (orderkey, Σrev, valid-count)
    partials against the order headers; each bucket emits three audit
    scalars and the driver folds P rows into the single summary SQL's
    ungrouped aggregate produces (exactly one row even on empty
    input). Rows where either side of the comparison is NULL (NULL
    total, all-NULL lineitem revenue) or the total is 0 are counted as
    checked-but-uncomparable, like the SQL filter's three-valued
    logic."""
    P = 32

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "tot": pa.array([], pa.float64()),
                   "totnull": pa.array([], pa.bool_()),
                   "s": pa.array([], pa.float64()),
                   "nv": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, is_orders: bool) -> pa.Table:
        if t.num_rows == 0:
            return _E
        if is_orders:
            if "o_orderkey" not in t.schema.names:
                return _E
            t2 = t.filter(pc.fill_null(pc.is_valid(t.column("o_orderkey")),
                                       False))
            n = t2.num_rows
            key = pc.cast(t2.column("o_orderkey"), pa.int64())
            return pa.table({
                "key": key,
                "side": pa.array(np.zeros(n, np.int8)),
                "tot": pc.cast(pc.fill_null(t2.column("o_totalprice"),
                                            0.0), pa.float64()),
                "totnull": pc.is_null(t2.column("o_totalprice")),
                "s": pa.array(np.zeros(n, np.float64)),
                "nv": pa.array(np.zeros(n, np.int64)),
                "bucket": pc.bit_wise_and(key, P - 1)})
        if "l_orderkey" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("l_orderkey")),
                                   False))
        if t2.num_rows == 0:
            return _E
        rev = pc.multiply(
            pc.multiply(t2.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0, pa.float64()),
                                    t2.column("l_discount"))),
            pc.add(pa.scalar(1.0, pa.float64()), t2.column("l_tax")))
        g = (pa.table({"key": pc.cast(t2.column("l_orderkey"), pa.int64()),
                       "r": pc.cast(pc.fill_null(rev, 0.0), pa.float64()),
                       "v": pc.cast(pc.is_valid(rev), pa.int64())})
             .group_by("key").aggregate([("r", "sum"), ("v", "sum")]))
        n = g.num_rows
        return pa.table({
            "key": g.column("key"),
            "side": pa.array(np.ones(n, np.int8)),
            "tot": pa.array(np.zeros(n, np.float64)),
            "totnull": pa.array(np.zeros(n, bool)),
            "s": g.column("r_sum"),
            "nv": g.column("v_sum"),
            "bucket": pc.bit_wise_and(g.column("key"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"nc": pd.Series(dtype="int64"),
                              "nm": pd.Series(dtype="int64"),
                              "sd": pd.Series(dtype="float64"),
                              "ndev": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        ords = df[df["side"] == 0][["key", "tot", "totnull"]]
        line = (df[df["side"] == 1]
                .groupby("key", as_index=False)
                .agg(s=("s", lambda x: x.to_numpy().sum()),
                     nv=("nv", "sum")))
        if ords.empty or line.empty:
            return empty
        j = ords.merge(line, on="key")
        if j.empty:
            return empty
        tot = j["tot"].to_numpy(np.float64)
        comparable = (~j["totnull"].to_numpy()
                      & (j["nv"].to_numpy() > 0) & (tot != 0.0))
        ls = j["s"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rel = np.abs(ls - tot) / np.abs(tot)
        mism = comparable & ~(rel <= tol)  # NaN rel -> mismatch
        return pd.DataFrame({
            "nc": [np.int64(comparable.sum())],
            "nm": [np.int64(mism.sum())],
            "sd": [rel[comparable].sum()],
            "ndev": [np.int64(len(j))]})

    tagged = [(r, (True,)) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_totalprice"]).to_arrow_refs()]
    tagged += [(r, (False,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_tax"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    nc = sum(int(p["nc"].sum()) for p in parts)
    nm = sum(int(p["nm"].sum()) for p in parts)
    sd = float(sum(float(p["sd"].sum()) for p in parts))
    return pd.DataFrame({
        "n_checked": np.array([nc], np.int64),
        "n_mismatch": np.array([nm], np.int64),
        "avg_rel_dev": [round_away(np.array([sd / nc]), 6)[0]
                        if nc else np.nan]})


def q_hourly_top_type(sf_dir: str) -> pd.DataFrame:
    """Per-hour leaderboard with ALL ties kept (dense_rank()=1): which
    event type(s) led each hour. Per-batch Arrow (hour, type) count
    partials — Arrow's group_by keys on full bytes AND keeps NULL type
    groups, sidestepping both pandas traps — one hour exchange, each
    bucket folds counts and keeps its hours' max-count rows. Hours are
    epoch-seconds BIGINT via the shared floor-div helper (int64
    truncation would bin pre-1970 fractional timestamps an hour late
    vs date_trunc)."""
    from .pairs import coded_keys
    from .relational import _hour_start

    P = 32

    _E = pa.table({"h": pa.array([], pa.int64()),
                   "etype": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"h": _hour_start(t2.column("ts")),
                       "etype": t2.column("event_type")})
             .group_by(["h", "etype"]).aggregate([([], "count_all")]))
        return pa.table({"h": g.column("h"),
                         "etype": g.column("etype"),
                         "n": pc.cast(g.column("count_all"), pa.int64()),
                         "bucket": pc.bit_wise_and(g.column("h"), P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"hour_start": pd.Series(dtype="int64"),
                              "event_type": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["etype"])
        g = cj.groupby(["h", "etype"], as_index=False)["n"].sum()
        mx = g.groupby("h")["n"].transform("max")
        g = restore(g[g["n"] == mx])
        return pd.DataFrame({
            "hour_start": g["h"].to_numpy(np.int64),
            "event_type": g["etype"].to_numpy(object),
            "n": g["n"].to_numpy(np.int64)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events", columns=["ts", "event_type"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"hour_start": pd.Series(dtype="int64"),
                             "event_type": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    out = pd.concat(parts, ignore_index=True)
    key = out["event_type"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex()
        if isinstance(v, str) else "￿")
    out = out.assign(_k=key).sort_values(["hour_start", "_k"])
    return out.drop(columns="_k").reset_index(drop=True)


def q_part_skyline(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto-optimal set): parts minimizing (retailprice,
    size) — kept iff NO other part is <= on both axes and < on one.
    Distributed shape: each block computes its LOCAL skyline (sort by
    price, strictly-decreasing-size scan over unique coordinates,
    duplicates of surviving coordinates re-attached — two equal points
    never dominate each other), and skyline(union of local skylines)
    == global skyline because strict dominance is transitive through
    coordinate ties. The driver's final scan touches only the local
    survivors. NULL and NaN coordinates are excluded on both sides
    (NaN compares TRUE under DuckDB's <= total order — the oracle
    filters isfinite)."""

    def _skyline(df: pd.DataFrame) -> pd.DataFrame:
        # unique coords, sorted by (price, size)
        u = (df[["price", "size"]].drop_duplicates()
             .sort_values(["price", "size"]))
        pr = u["price"].to_numpy(np.float64)
        sz = u["size"].to_numpy(np.int64)
        keep = np.zeros(len(u), bool)
        best = np.iinfo(np.int64).max
        for i in range(len(u)):
            if sz[i] < best:
                keep[i] = True
                best = sz[i]
        surv = u[keep]
        return df.merge(surv, on=["price", "size"])

    def local(t: pa.Table) -> pa.Table:
        E = pa.table({"p_partkey": pa.array([], pa.int64()),
                      "price": pa.array([], pa.float64()),
                      "size": pa.array([], pa.int64())})
        if t.num_rows == 0 or "p_partkey" not in t.schema.names:
            return E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("p_partkey")),
                          pc.is_valid(t.column("p_size"))),
            pc.fill_null(pc.is_finite(t.column("p_retailprice")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        df = pd.DataFrame({
            "p_partkey": t2.column("p_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "price": t2.column("p_retailprice").to_numpy(
                zero_copy_only=False).astype(np.float64),
            "size": t2.column("p_size").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        s = _skyline(df)
        return pa.table({"p_partkey": pa.array(s["p_partkey"].to_numpy(
                             np.int64)),
                         "price": pa.array(s["price"].to_numpy(
                             np.float64)),
                         "size": pa.array(s["size"].to_numpy(np.int64))})

    cand = (_read(sf_dir, "part",
                  columns=["p_partkey", "p_retailprice", "p_size"])
            .map_batches(local, batch_format="pyarrow").to_pandas())
    empty = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                          "price": pd.Series(dtype="float64"),
                          "size": pd.Series(dtype="int64")})
    if cand.empty:
        return empty
    out = _skyline(cand)
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_time_to_convert(sf_dir: str) -> pd.DataFrame:
    """Time-to-convert distribution: per user, seconds from FIRST
    signup to FIRST purchase (when the purchase follows), then the
    global exact median and p90 via the shared rank-refinement
    order-stats machinery (``relational._grouped_order_stats`` — no
    global sort, histogram passes over materialized block refs). One
    user exchange folds per-block (user, min-signup, min-purchase)
    partials; per-bucket diffs stay in the object store and feed the
    quantile passes as a Dataset. The µs→seconds division and the
    quantile interpolation replicate DuckDB op-for-op (q102's probed
    v_lo·(1−f)+v_hi·f form)."""
    import ray.data as rd

    from .relational import _grouped_order_stats

    P = 32
    IMAX = np.iinfo(np.int64).max

    _E = pa.table({"uid": pa.array([], pa.int64()),
                   "s": pa.array([], pa.int64()),
                   "p": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        out = []
        uk, inv = np.unique(uid, return_inverse=True)
        res = {"s": "signup", "p": "purchase"}
        mins = {}
        for col, ty in res.items():
            m = np.full(len(uk), IMAX, np.int64)
            sel = np.zeros(len(uid), bool)
            vmask = pd.notna(et)
            sel[vmask] = et[vmask] == ty
            np.minimum.at(m, inv[sel], ts[sel])
            mins[col] = m
        return pa.table({"uid": pa.array(uk),
                         "s": pa.array(mins["s"]),
                         "p": pa.array(mins["p"]),
                         "bucket": pc.bit_wise_and(pa.array(uk), P - 1)})

    def merge(*tabs) -> pa.Table:
        E = pa.table({"event_type": pa.array([], pa.string()),
                      "value": pa.array([], pa.float64())})
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return E
        df = pa.concat_tables(live).to_pandas()
        g = df.groupby("uid").agg(s=("s", "min"), p=("p", "min"))
        s = g["s"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        ok = (s != IMAX) & (p != IMAX) & (p >= s)
        dt = (p[ok] - s[ok]).astype(np.float64) / 1e6
        return pa.table({"event_type": pa.array(["all"] * len(dt)),
                         "value": pa.array(dt)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_type"]).to_arrow_refs()]
    refs = hash_shuffle(tagged, split, merge, P=P, gather=False)
    ds = rd.from_arrow_refs(refs)

    def ranks_of(name, c):
        n = c[0]
        if n == 0:
            return []
        want = set()
        for frac in (0.5, 0.9):
            rn = (n - 1) * frac
            want |= {int(np.floor(rn)), int(np.ceil(rn))}
        return sorted(want)

    counts, values = _grouped_order_stats(ds, ranks_of)
    if "all" not in counts or counts["all"][0] == 0:
        return pd.DataFrame({"n_converted": np.array([0], np.int64),
                             "median_sec": [np.nan],
                             "p90_sec": [np.nan]})
    n = counts["all"][0]
    out = {}
    for label, frac in (("median_sec", 0.5), ("p90_sec", 0.9)):
        rn = (n - 1) * frac
        i0, i1 = int(np.floor(rn)), int(np.ceil(rn))
        v0 = values[("all", i0)]
        if i0 == i1:
            out[label] = v0
        else:
            f = rn - i0
            out[label] = v0 * (1.0 - f) + values[("all", i1)] * f
    return pd.DataFrame({
        "n_converted": np.array([n], np.int64),
        "median_sec": round_away(np.array([out["median_sec"]]), 4),
        "p90_sec": round_away(np.array([out["p90_sec"]]), 4)})


def q_gram_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-document n-gram novelty: the share of a doc's DISTINCT
    word-trigrams appearing in NO other document (df == 1 across the
    corpus) — the inverse of q66's boilerplate detection. Each doc's
    distinct grams are computed locally (one doc = one row = one
    batch); the exchange is keyed on the gram hash, each bucket counts
    df over exact gram strings and emits per-doc (novel, total)
    partials; the driver folds doc-bounded rows and LEFT-join-fills
    docs too short to have a trigram (novelty NULL, like the SQL)."""
    import re as _re

    from .pairs import str_u64

    P = 32
    rx = _re.compile(r"\w+", _re.ASCII)

    _E = pa.table({"doc": pa.array([], pa.int64()),
                   "gram": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_valid(t.column("doc_id")),
                                   False))
        docs, grams = [], []
        for did, txt in zip(t2.column("doc_id").to_pylist(),
                            t2.column("text").to_pylist()):
            ws = rx.findall((txt or "").lower())
            if len(ws) < 3:
                continue
            gs = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
            docs.extend([did] * len(gs))
            grams.extend(gs)
        if not docs:
            return _E
        b = np.array([str_u64(g) & (P - 1) for g in grams], np.int64)
        return pa.table({"doc": pa.array(docs, pa.int64()),
                         "gram": pa.array(grams, pa.string()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        empty = pd.DataFrame({"doc": pd.Series(dtype="int64"),
                              "novel": pd.Series(dtype="int64"),
                              "total": pd.Series(dtype="int64")})
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        # doc-distinct already; df per gram = row count per gram.
        # factorize gram strings to int codes (full-byte) for speed
        from .pairs import factorize_strings

        codes, _u = factorize_strings(df["gram"])
        dfc = np.bincount(codes)
        novel = dfc[codes] == 1
        doc = df["doc"].to_numpy(np.int64)
        uk, inv = np.unique(doc, return_inverse=True)
        tot = np.bincount(inv)
        nov = np.zeros(len(uk), np.int64)
        np.add.at(nov, inv[novel], 1)
        return pd.DataFrame({"doc": uk,
                             "novel": nov.astype(np.int64),
                             "total": tot.astype(np.int64)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "documents", columns=["doc_id", "text"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    ids = _with_cols(_read_pd(sf_dir, "documents",
                           columns=["doc_id"]),
                     {"doc_id": "int64"})
    ids = ids[ids["doc_id"].notna()].astype({"doc_id": np.int64})
    if not parts:
        agg = pd.DataFrame({"doc": pd.Series(dtype="int64"),
                            "novel": pd.Series(dtype="int64"),
                            "total": pd.Series(dtype="int64")})
    else:
        agg = (pd.concat(parts, ignore_index=True)
               .groupby("doc", as_index=False)
               .agg(novel=("novel", "sum"), total=("total", "sum")))
    out = ids.merge(agg, left_on="doc_id", right_on="doc", how="left")
    n_grams = out["total"].fillna(0).astype(np.int64)
    n_novel = out["novel"].fillna(0).astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = n_novel.to_numpy(np.float64) / n_grams.to_numpy(
            np.float64)
    novelty = np.where(n_grams.to_numpy() > 0, round_away(ratio, 6),
                       np.nan)
    return (pd.DataFrame({"doc_id": out["doc_id"].to_numpy(np.int64),
                          "n_grams": n_grams.to_numpy(np.int64),
                          "n_novel": n_novel.to_numpy(np.int64),
                          "novelty": novelty})
            .sort_values("doc_id").reset_index(drop=True))


def q_quartile_bands(sf_dir: str) -> pd.DataFrame:
    """Classify every event into its OWN type's quartile band and
    count the bands — the two-pass broadcast-threshold shape: pass 1
    computes exact per-type quartiles with the shared rank-refinement
    machinery (no group ever sorts in one task), pass 2 broadcasts the
    tiny (type → q1,q2,q3) map and counts (type, band) per batch. The
    band comparisons reuse the EXACT same interpolated doubles the SQL
    computes, so the <= boundaries cannot drift. NaN values are
    excluded on both sides (q102 contract); a NaN QUARTILE (an
    inf-bracket interpolation) compares TRUE under DuckDB's total
    order, mirrored explicitly."""
    import ray

    from .relational import _drop_null_nan_values, _grouped_order_stats

    ds = (_read(sf_dir, "events", columns=["event_type", "value"])
          .map_batches(_drop_null_nan_values, batch_format="pyarrow"))

    FRACS = (0.25, 0.50, 0.75)

    def ranks_of(name, c):
        n = c[0]
        if n == 0:
            return []
        want = set()
        for frac in FRACS:
            rn = (n - 1) * frac
            want |= {int(np.floor(rn)), int(np.ceil(rn))}
        return sorted(want)

    counts, values = _grouped_order_stats(ds, ranks_of)
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "band": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64")})
    quarts: dict[str, tuple] = {}
    for name, c in counts.items():
        if name is None or c[0] == 0:
            continue  # NULL type: the SQL USING join drops it anyway
        n = c[0]
        qs = []
        for frac in FRACS:
            rn = (n - 1) * frac
            i0, i1 = int(np.floor(rn)), int(np.ceil(rn))
            v0 = values[(name, i0)]
            qs.append(v0 if i0 == i1 else
                      v0 * (1.0 - (rn - i0)) + values[(name, i1)]
                      * (rn - i0))
        quarts[name] = tuple(qs)
    if not quarts:
        return empty
    qref = ray.put(quarts)

    def classify(t: pa.Table) -> pa.Table:
        qmap = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        E = pa.table({"event_type": pa.array([], pa.string()),
                      "band": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "value" not in t.schema.names:
            return E
        keep = pc.and_kleene(pc.is_valid(t.column("event_type")),
                             pc.invert(pc.fill_null(
                                 pc.is_nan(t.column("value")), True)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        out: dict = {}
        for ty, (q1, q2, q3) in qmap.items():
            m = et == ty
            if not m.any():
                continue
            vv = v[m]
            # DuckDB total order: x <= NaN is TRUE
            b1 = vv <= q1 if not np.isnan(q1) else np.ones(len(vv), bool)
            b2 = vv <= q2 if not np.isnan(q2) else np.ones(len(vv), bool)
            b3 = vv <= q3 if not np.isnan(q3) else np.ones(len(vv), bool)
            band = np.where(b1, 1, np.where(b2, 2, np.where(b3, 3, 4)))
            bs, cnt = np.unique(band, return_counts=True)
            for b, c in zip(bs, cnt):
                out[(ty, int(b))] = out.get((ty, int(b)), 0) + int(c)
        if not out:
            return E
        keys = list(out)
        return pa.table({
            "event_type": pa.array([k[0] for k in keys], pa.string()),
            "band": pa.array([k[1] for k in keys], pa.int64()),
            "n": pa.array([out[k] for k in keys], pa.int64())})

    parts = (_read(sf_dir, "events", columns=["event_type", "value"])
             .map_batches(classify, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return empty
    from .pairs import coded_keys

    cj, restore = coded_keys(parts, ["event_type"])
    g = restore(cj.groupby(["event_type", "band"], as_index=False)
                ["n"].sum())
    g["band"] = g["band"].astype(np.int64)
    g["n"] = g["n"].astype(np.int64)
    key = g["event_type"].map(
        lambda v: v.encode("utf-8", "surrogatepass").hex())
    return (g.assign(_k=key).sort_values(["_k", "band"])
            .drop(columns="_k").reset_index(drop=True))


def q_type_pair_lift(sf_dir: str) -> pd.DataFrame:
    """Pointwise mutual information between event-type pairs over the
    user base (which behaviors co-occur beyond chance). One user
    exchange dedups (user, type) — each bucket then emits its local
    per-type user counts, per-PAIR co-user counts, and distinct-user
    count; the driver folds O(types²) rows. Every count is an exact
    integer, so the PMI argument (nab·nu)/(na·nb) is an exact-int
    ratio and ln() is the only inexact step (round 6 on both sides).
    Pairs are oriented by full-byte string order like the SQL's
    a.event_type < b.event_type."""
    from .pairs import coded_keys

    P = 32

    _E = pa.table({"uid": pa.array([], pa.int64()),
                   "etype": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("event_type")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"uid": pc.cast(t2.column("user_id"), pa.int64()),
                       "etype": t2.column("event_type")})
             .group_by(["uid", "etype"]).aggregate([]))
        return pa.table({"uid": g.column("uid"),
                         "etype": g.column("etype"),
                         "bucket": pc.bit_wise_and(g.column("uid"),
                                                   P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        empty = pd.DataFrame({"ta": pd.Series(dtype="object"),
                              "tb": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64"),
                              "kind": pd.Series(dtype="object")})
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["etype"])
        d = cj.drop_duplicates()  # global (user, type) distinct
        lut = restore(pd.DataFrame(
            {"etype": np.arange(
                cj["etype"].max() + 1 if len(cj) else 0)}))
        code2str = dict(zip(range(len(lut)), lut["etype"]))
        rows = []
        # distinct users
        rows.append((None, None, d["uid"].nunique(), "u"))
        # per-type user counts
        for code, grp in d.groupby("etype"):
            rows.append((code2str[code], None, len(grp), "a"))
        # per-pair co-occurrence: sort each user's types by BYTE order
        dd = d.copy()
        dd["hex"] = dd["etype"].map(
            lambda c: code2str[c].encode("utf-8",
                                         "surrogatepass").hex())
        dd = dd.sort_values(["uid", "hex"])
        uid = dd["uid"].to_numpy(np.int64)
        hx = dd["hex"].to_numpy(object)
        st = dd["etype"].to_numpy(np.int64)
        pair_n: dict = {}
        n = len(dd)
        i = 0
        while i < n:
            j = i + 1
            while j < n and uid[j] == uid[i]:
                j += 1
            for a in range(i, j - 1):
                for b in range(a + 1, j):
                    k = (st[a], st[b])
                    pair_n[k] = pair_n.get(k, 0) + 1
            i = j
        for (ca, cb), c in pair_n.items():
            rows.append((code2str[ca], code2str[cb], c, "p"))
        return pd.DataFrame(rows, columns=["ta", "tb", "n", "kind"])

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "event_type"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"type_a": pd.Series(dtype="object"),
                          "type_b": pd.Series(dtype="object"),
                          "pmi": pd.Series(dtype="float64"),
                          "n_both": pd.Series(dtype="int64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    nu = float(allp.loc[allp["kind"] == "u", "n"].sum())
    from .pairs import coded_keys as _ck

    sing = allp[allp["kind"] == "a"].copy()
    cs, rs = _ck(sing, ["ta"])
    na = rs(cs.groupby("ta", as_index=False)["n"].sum())
    namap = dict(zip(na["ta"], na["n"].astype(float)))
    pairs = allp[allp["kind"] == "p"].copy()
    cp, rp = _ck(pairs, ["ta", "tb"])
    g = rp(cp.groupby(["ta", "tb"], as_index=False)["n"].sum())
    if g.empty:
        return empty
    nab = g["n"].to_numpy(np.float64)
    sa = np.array([namap[v] for v in g["ta"]], np.float64)
    sb = np.array([namap[v] for v in g["tb"]], np.float64)
    pmi = np.log((nab * nu) / (sa * sb))
    out = pd.DataFrame({"type_a": g["ta"].to_numpy(object),
                        "type_b": g["tb"].to_numpy(object),
                        "pmi": round_away(pmi, 6),
                        "n_both": g["n"].to_numpy(np.int64)})
    k1 = out["type_a"].map(lambda v: v.encode("utf-8",
                                              "surrogatepass").hex())
    k2 = out["type_b"].map(lambda v: v.encode("utf-8",
                                              "surrogatepass").hex())
    order = pd.DataFrame({"a": k1, "b": k2}).sort_values(["a", "b"]).index
    return out.loc[order].reset_index(drop=True)


def q_asof_join_tolerance(sf_dir: str, minutes: int = 60) -> pd.DataFrame:
    """Backward AS-OF self-join WITH a freshness tolerance: each
    purchase event matches the same user's latest click at-or-before
    it, kept only when the click is at most ``minutes`` old — the
    click-to-buy attribution window (merge_asof tolerance semantics;
    SQL: ASOF JOIN + a WHERE on the matched distance). Clean-key
    contract: NULL keys/times/ids are excluded on both sides up front
    (q43 keeps the hairy NULL→+inf cases; this is the
    production-shaped variant). One user exchange; each bucket
    vectorizes the per-user searchsorted match over µs integers, so
    the distance comparison is exact int arithmetic."""
    P = 32
    TOL_US = minutes * 60_000_000

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "t": pa.array([], pa.int64()),
                   "eid": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.is_valid(t.column("ts"))),
            pc.is_valid(t.column("event_id")))
        t2 = t.filter(pc.fill_null(keep, False))
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        vmask = pd.notna(et)
        is_click = np.zeros(len(et), bool)
        is_click[vmask] = et[vmask] == "click"
        is_buy = np.zeros(len(et), bool)
        is_buy[vmask] = et[vmask] == "purchase"
        t2 = t2.filter(pa.array(is_click | is_buy))
        side = np.where(is_buy[is_click | is_buy], 1, 0).astype(np.int8)
        key = pc.cast(t2.column("user_id"), pa.int64())
        return pa.table({
            "key": key,
            "side": pa.array(side),
            "t": pc.cast(t2.column("ts"), pa.int64()),
            "eid": pc.cast(t2.column("event_id"), pa.int64()),
            "bucket": pc.bit_wise_and(key, P - 1)})

    def merge(*tabs) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "user_id": pd.Series(dtype="int64"),
                              "click_gap_sec": pd.Series(dtype="float64")})
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return empty
        df = pa.concat_tables(live).to_pandas()
        clicks = df[df["side"] == 0].sort_values(["key", "t"],
                                                 kind="stable")
        buys = df[df["side"] == 1]
        if clicks.empty or buys.empty:
            return empty
        ck = clicks["key"].to_numpy(np.int64)
        ct = clicks["t"].to_numpy(np.int64)
        out_eid, out_uid, out_gap = [], [], []
        for key, grp in buys.groupby("key"):
            lo = np.searchsorted(ck, key, side="left")
            hi = np.searchsorted(ck, key, side="right")
            if lo == hi:
                continue
            seg = ct[lo:hi]
            ts = grp["t"].to_numpy(np.int64)
            pos = np.searchsorted(seg, ts, side="right") - 1
            m = pos >= 0
            if not m.any():
                continue
            matched = seg[np.maximum(pos, 0)]
            m &= (ts - matched) <= TOL_US
            if not m.any():
                continue
            out_eid.append(grp["eid"].to_numpy(np.int64)[m])
            out_uid.append(np.full(int(m.sum()), key, np.int64))
            out_gap.append((ts[m] - matched[m]).astype(np.float64) / 1e6)
        if not out_eid:
            return empty
        return pd.DataFrame({
            "event_id": np.concatenate(out_eid),
            "user_id": np.concatenate(out_uid),
            "click_gap_sec": np.concatenate(out_gap)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type"]
    ).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "user_id": pd.Series(dtype="int64"),
                             "click_gap_sec": pd.Series(dtype="float64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("event_id").reset_index(drop=True))


def q_weekday_seasonality(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality of event values: per-weekday mean and
    its ratio to the global mean. Pure one-pass combiner — per-batch
    (dow, n, Σv) partials; the driver folds 7×P rows. The weekday is
    FLOOR-divided from raw epoch µs ((days + 4) mod 7, floored mod:
    1970-01-01 was a Thursday and DuckDB's dayofweek is 0=Sunday), so
    pre-1970 fractional timestamps land on the same calendar day as
    date-part arithmetic. Non-finite values are excluded on both
    sides (NaN would poison the means; NaN > x is TRUE under DuckDB's
    total order so the oracle needs an explicit isfinite)."""
    P = 8

    _E = pa.table({"dow": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "s": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("ts")),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        days = np.floor_divide(us, 86_400_000_000)
        dow = np.mod(days + 4, 7).astype(np.int64)
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        n = np.bincount(dow, minlength=7)
        s = np.zeros(7, np.float64)
        np.add.at(s, dow, v)
        keepm = n > 0
        d = np.arange(7, dtype=np.int64)[keepm]
        return pa.table({"dow": pa.array(d),
                         "n": pa.array(n[keepm].astype(np.int64)),
                         "s": pa.array(s[keepm]),
                         "bucket": pa.array(d % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"dow": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby("dow", as_index=False).agg(
            n=("n", "sum"), s=("s", lambda x: x.to_numpy().sum()))

    tagged = [(r, ()) for r in _read(
        sf_dir, "events", columns=["ts", "value"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"dow": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "avg_value": pd.Series(dtype="float64"),
                          "seasonal_idx": pd.Series(dtype="float64")})
    if not parts:
        return empty
    g = (pd.concat(parts, ignore_index=True)
         .groupby("dow", as_index=False)
         .agg(n=("n", "sum"), s=("s", lambda x: x.to_numpy().sum())))
    gn = float(g["n"].sum())
    gavg = float(g["s"].sum()) / gn
    avg = g["s"].to_numpy(np.float64) / g["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "dow": g["dow"].to_numpy(np.int64),
        "n": g["n"].to_numpy(np.int64),
        "avg_value": round_away(avg, 6),
        "seasonal_idx": round_away(avg / gavg, 6)}).sort_values(
            "dow").reset_index(drop=True)


def q_geometric_median_step(sf_dir: str) -> pd.DataFrame:
    """One Weiszfeld step toward the embeddings' geometric median (the
    robust centroid a mean-poisoning outlier can't drag): from the
    corpus mean m, re-weight every vector by 1/‖v−m‖ and emit the
    weighted mean, per dimension. Two broadcast passes, each a
    per-batch (Σ, n) vector combiner — the corpus never moves, the
    shuffle carries d-dim partials. Exact-zero distances are excluded
    on both sides (SQL's WHERE d > 0; 1/0 would poison the sums with
    inf)."""
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pass1(t: pa.Table) -> pa.Table:
        E = pa.table({"n": pa.array([], pa.int64()),
                      "s": pa.array([], pa.list_(pa.float64()))})
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return E
        t2 = t.filter(pc.is_valid(t.column("embedding")))
        if t2.num_rows == 0:
            return E
        col = t2.column("embedding")
        flat = np.asarray(col.combine_chunks().flatten().to_numpy(
            zero_copy_only=False), np.float64)
        mat = flat.reshape(t2.num_rows, -1)
        return pa.table({"n": pa.array([mat.shape[0]], pa.int64()),
                         "s": pa.array([mat.sum(axis=0)],
                                       pa.list_(pa.float64()))})

    p1 = emb.map_batches(pass1, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"pos": pd.Series(dtype="int64"),
                          "gm": pd.Series(dtype="float64")})
    if p1.empty or p1["n"].sum() == 0:
        return empty
    n = int(p1["n"].sum())
    svec = np.sum(np.stack([np.asarray(x, np.float64)
                            for x in p1["s"]]), axis=0)
    mean = svec / n
    mref = ray.put(mean)

    def pass2(t: pa.Table) -> pa.Table:
        m = ray.get(mref) if isinstance(mref, ray.ObjectRef) else mref
        E = pa.table({"sw": pa.array([], pa.float64()),
                      "swv": pa.array([], pa.list_(pa.float64()))})
        if t.num_rows == 0 or "embedding" not in t.schema.names:
            return E
        t2 = t.filter(pc.is_valid(t.column("embedding")))
        if t2.num_rows == 0:
            return E
        flat = np.asarray(t2.column("embedding").combine_chunks()
                          .flatten().to_numpy(zero_copy_only=False),
                          np.float64)
        mat = flat.reshape(t2.num_rows, -1)
        d = np.sqrt(((mat - m) ** 2).sum(axis=1))
        keep = d > 0.0
        if not keep.any():
            return E
        w = 1.0 / d[keep]
        return pa.table({
            "sw": pa.array([w.sum()], pa.float64()),
            "swv": pa.array([(mat[keep] * w[:, None]).sum(axis=0)],
                            pa.list_(pa.float64()))})

    p2 = emb.map_batches(pass2, batch_format="pyarrow").to_pandas()
    if p2.empty:
        return empty
    sw = float(p2["sw"].sum())
    swv = np.sum(np.stack([np.asarray(x, np.float64)
                           for x in p2["swv"]]), axis=0)
    gm = swv / sw
    return pd.DataFrame({"pos": np.arange(1, len(gm) + 1,
                                          dtype=np.int64),
                         "gm": round_away(gm, 6)})


def q_topband_orders_ties(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """FETCH FIRST k ROWS WITH TIES over orders banded into price
    hundreds (band = floor(o_totalprice/100)): the top-k rows by band
    plus every row tying with the k-th row's band — the WITH-TIES
    selection semantic (oracle: rank() <= k, the SQL-92 equivalent
    DuckDB parses).

    Plan: one counts-per-band exchange (bands are a small integer
    domain, so the shuffle volume is O(#bands), not O(rows)) finds the
    boundary band via a descending cumulative count; one vectorized
    filter pass emits every row in a qualifying band. No global sort —
    the selection state the driver holds is the band histogram.

    Contract (mirrored in the oracle): non-finite prices are excluded
    on both sides (DuckDB's total order ranks NaN above +inf, and a
    band of NaN/±inf is meaningless); floor-division is exact float
    IEEE on both sides, so band boundaries can't drift."""
    P = 8

    _E = pa.table({"band": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        v = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return _E
        band = np.floor(v / 100.0).astype(np.int64)
        u, cnt = np.unique(band, return_counts=True)
        return pa.table({"band": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"band": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby("band", as_index=False).agg(n=("n", "sum"))

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_totalprice"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                          "o_totalprice": pd.Series(dtype="float64"),
                          "band": pd.Series(dtype="int64")})
    if not parts:
        return empty
    hist = (pd.concat(parts, ignore_index=True)
            .sort_values("band", ascending=False))
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    # boundary band = band of the k-th row in descending band order;
    # fewer than k rows total -> every band qualifies
    idx = int(np.searchsorted(cum, min(k, int(cum[-1]))))
    bstar = int(hist["band"].to_numpy()[idx])

    def final(t: pa.Table) -> pa.Table:
        E = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "o_totalprice": pa.array([], pa.float64()),
                      "band": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return E
        v = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        with np.errstate(invalid="ignore"):
            band = np.where(np.isfinite(v),
                            np.floor(np.where(np.isfinite(v), v, 0.0)
                                     / 100.0), -np.inf)
        keepm = band >= bstar
        if not keepm.any():
            return E
        t2 = t.filter(pa.array(keepm))
        return pa.table({
            "o_orderkey": pc.cast(t2.column("o_orderkey"), pa.int64()),
            "o_totalprice": pc.cast(t2.column("o_totalprice"),
                                    pa.float64()),
            "band": pa.array(band[keepm].astype(np.int64))})

    out = _read(sf_dir, "orders",
                columns=["o_orderkey", "o_totalprice"]).map_batches(
        final, batch_format="pyarrow").to_pandas()
    if out.empty:
        return empty
    return (out.sort_values(["band", "o_orderkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def q_nation_balance_topshare(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """ratio_to_report pattern: each nation's top-k customers by
    account balance, with their share of the nation's TOTAL balance
    (sum() OVER (PARTITION BY n_name) in the oracle — the window
    denominator covers all customers, not just the top k).

    Plan: nation is a broadcast dict (key -> per-name multiplicities —
    duplicate nation rows fan an inner join out like SQL, CLAUDE.md
    q08 rule); each block emits per-name (count, exact-cents sum)
    partials PLUS its local top-k candidate rows through one
    hash_shuffle — a local top-k per name is a superset of the global
    one, so the exchange carries O(P·names·k) rows. Shares are
    exact-cents ratios (int64 numerator/denominator) so the 6dp
    rounding never sits on a float-sum knife edge.

    Contract: NULL/non-finite balances excluded on both sides; a
    duplicated nation row doubles both the denominator and the ranked
    row list (row_number ties between identical copies are output-
    identical); NULL n_name is a real partition (NULLS LAST in the
    ORDER BY only)."""
    import ray

    P = 8
    nat = _read_pd(sf_dir, "nation",
                columns=["n_nationkey", "n_name"])
    # key -> ragged [(name_id, mult)] as FLAT ARRAYS (sorted keys +
    # offsets) so blocks join via searchsorted, never a Python row
    # loop; names factorized driver-side so NUL-containing names ride
    # as int codes through the exchange
    names, codes = [], {}
    pairs_cnt: dict = {}
    for key, name in zip(nat["n_nationkey"].tolist(),
                         nat["n_name"].tolist()):
        if key is None or (isinstance(key, float) and np.isnan(key)):
            continue  # NULL key never inner-joins
        nm = None if (name is None or (isinstance(name, float)
                                       and np.isnan(name))) else name
        if nm not in codes:
            codes[nm] = len(names)
            names.append(nm)
        kk = (int(key), codes[nm])
        pairs_cnt[kk] = pairs_cnt.get(kk, 0) + 1
    flat = sorted((key, nid, m) for (key, nid), m in pairs_cnt.items())
    ent_key = np.asarray([f[0] for f in flat], np.float64)
    ent_name = np.asarray([f[1] for f in flat], np.int64)
    ent_mult = np.asarray([f[2] for f in flat], np.int64)
    lk = np.unique(ent_key)
    off = np.searchsorted(ent_key, lk, side="left")
    cnt_k = np.searchsorted(ent_key, lk, side="right") - off
    lut_ref = ray.put((lk, off, cnt_k, ent_name, ent_mult))

    _E = pa.table({"name_id": pa.array([], pa.int64()),
                   "kind": pa.array([], pa.int8()),
                   "custkey": pa.array([], pa.int64()),
                   "balc": pa.array([], pa.int64()),
                   "mult": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, lut) -> pa.Table:
        if isinstance(lut, ray.ObjectRef):  # inlined by ray.put size
            lut = ray.get(lut)
        if t.num_rows == 0 or "c_acctbal" not in t.schema.names:
            return _E
        keep = pc.fill_null(pc.is_finite(t.column("c_acctbal")), False)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E
        lk, off, cnt_k, ent_name, ent_mult = lut
        ck = np.asarray(t2.column("c_custkey").to_numpy(
            zero_copy_only=False), np.int64)
        bal = np.asarray(t2.column("c_acctbal").to_numpy(
            zero_copy_only=False), np.float64)
        balc = np.round(bal * 100.0).astype(np.int64)  # exact cents
        # nullable int comes back as float64+NaN; NaN searchsorts past
        # the end and fails the equality probe (NULL key never joins)
        nk = np.asarray(t2.column("c_nationkey").to_numpy(
            zero_copy_only=False), np.float64)
        idx = np.searchsorted(lk, nk)
        idx_c = np.minimum(idx, lk.size - 1) if lk.size else idx
        hit = np.zeros(nk.size, bool) if lk.size == 0 else \
            (lk[idx_c] == nk)
        if not hit.any():
            return _E
        rows = np.nonzero(hit)[0]
        starts = off[idx_c[rows]]
        lens = cnt_k[idx_c[rows]]
        # ragged repeat: row i contributes lens[i] fan-out entries
        rep = np.repeat(np.arange(rows.size), lens)
        base = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ent_pos = (starts[rep]
                   + (np.arange(rep.size) - base[rep])).astype(np.int64)
        name = ent_name[ent_pos]
        mv = ent_mult[ent_pos]
        ckv = ck[rows][rep]
        bcv = balc[rows][rep]
        # per-name totals (kind 0): count rides in custkey, cents sum
        # in balc — one row per name
        u, inv = np.unique(name, return_inverse=True)
        tot_n = np.bincount(inv, weights=mv.astype(np.float64))
        tot_s = np.bincount(inv, weights=(bcv * mv).astype(np.float64))
        agg = pa.table({"name_id": pa.array(u),
                        "kind": pa.array(np.zeros(u.size, np.int8)),
                        "custkey": pa.array(tot_n.astype(np.int64)),
                        "balc": pa.array(tot_s.astype(np.int64)),
                        "mult": pa.array(np.ones(u.size, np.int64)),
                        "bucket": pa.array(u % P)})
        # local top-k candidate rows per name (kind 1): order by
        # (balc desc, custkey asc); k distinct rows always cover the
        # global top-k expanded rows since mult >= 1
        order = np.lexsort((ckv, -bcv, name))
        name_s = name[order]
        first = np.searchsorted(name_s, u, side="left")
        pick = []
        for j, f in enumerate(first):
            end = first[j + 1] if j + 1 < len(first) else len(name_s)
            pick.extend(order[f:min(f + k, end)].tolist())
        pick = np.asarray(pick, np.int64)
        cand = pa.table({"name_id": pa.array(name[pick]),
                         "kind": pa.array(np.ones(pick.size, np.int8)),
                         "custkey": pa.array(ckv[pick]),
                         "balc": pa.array(bcv[pick]),
                         "mult": pa.array(mv[pick]),
                         "bucket": pa.array(name[pick] % P)})
        return pa.concat_tables([agg, cand])

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"name_id": pd.Series(dtype="int64"),
                "rnk": pd.Series(dtype="int64"),
                "custkey": pd.Series(dtype="int64"),
                "balc": pd.Series(dtype="int64"),
                "totc": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        tot = (df[df["kind"] == 0].groupby("name_id")["balc"].sum())
        cand = df[df["kind"] == 1]
        outs = []
        for name_id, g in cand.groupby("name_id"):
            g = g.sort_values(["balc", "custkey"],
                              ascending=[False, True])
            # expand multiplicity, take first k expanded rows
            reps = np.repeat(np.arange(len(g)),
                             g["mult"].to_numpy(np.int64))[:k]
            gg = g.iloc[reps]
            outs.append(pd.DataFrame({
                "name_id": name_id,
                "rnk": np.arange(1, len(gg) + 1, dtype=np.int64),
                "custkey": gg["custkey"].to_numpy(np.int64),
                "balc": gg["balc"].to_numpy(np.int64),
                "totc": int(tot.get(name_id, 0))}))
        if not outs:
            return pd.DataFrame(cols)
        return pd.concat(outs, ignore_index=True)

    tagged = [(r, (lut_ref,)) for r in _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])
        .to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                          "rnk": pd.Series(dtype="int64"),
                          "c_custkey": pd.Series(dtype="int64"),
                          "c_acctbal": pd.Series(dtype="float64"),
                          "share": pd.Series(dtype="float64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    totc = out["totc"].to_numpy(np.float64)
    balc = out["balc"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        share = np.where(totc == 0.0, np.nan, balc / totc)
    name_col = pd.Series([names[i] for i in out["name_id"]],
                         dtype="object")
    res = pd.DataFrame({"n_name": name_col,
                        "rnk": out["rnk"].astype("int64"),
                        "c_custkey": out["custkey"].astype("int64"),
                        "c_acctbal": balc / 100.0,
                        "share": round_away(share, 6)})
    # NULLS LAST single-key ordering on a possibly-NUL name: chained
    # stable sorts with a hex key (CLAUDE.md NUL rule)
    hexkey = res["n_name"].map(
        lambda s: "zz" if s is None
        else s.encode("utf-8", "surrogatepass").hex())
    res = res.iloc[np.lexsort((res["rnk"].to_numpy(),
                               hexkey.to_numpy()))]
    return res.reset_index(drop=True)


def _daily_rev_cents(sf_dir: str, P: int = 8) -> pd.DataFrame:
    """Shared counts-per-day exchange (q199 autocorrelation, q213
    CUSUM): exact-cents daily order revenue, day = floor-divided epoch
    µs (CLAUDE.md pre-1970 rule), non-finite prices excluded. Returns
    the day-sorted (day, revc) frame — O(#days) rows."""
    _E = pa.table({"day": pa.array([], pa.int64()),
                   "revc": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderdate" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_orderdate")),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        us = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, 86_400_000_000)
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(u.size, np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"day": pa.array(u),
                         "revc": pa.array(s),
                         "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "revc": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        return df.groupby("day", as_index=False).agg(
            revc=("revc", "sum"))

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_orderdate", "o_totalprice"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"day": pd.Series(dtype="int64"),
                             "revc": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("day").reset_index(drop=True))


def q_daily_autocorr(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Lag-1..max_lag autocorrelation of daily order revenue — the
    seasonality screen run before fitting any time-series model. One
    counts-per-day exchange (exact-cents sums; day = floor-divided
    epoch µs, CLAUDE.md pre-1970 rule) gives the driver the daily
    series (~#days rows); each lag's correlation is then computed over
    the (x_t, x_{t+L}) pairs where BOTH days exist (calendar join, not
    positional shift — gaps in the date range drop the pair, matching
    the oracle's day-interval self-join). Pearson r is centered
    two-pass over exact-integer cents. Lags with no pairs emit no row;
    n<2 or a zero-variance side yields SQL NULL -> NaN."""
    empty = pd.DataFrame({"lag": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "ac": pd.Series(dtype="float64")})
    d = _daily_rev_cents(sf_dir)
    if d.empty:
        return empty
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.float64)  # exact ints below 2^53
    lags, ns, acs = [], [], []
    for lag in range(1, max_lag + 1):
        j = np.searchsorted(days, days + lag)
        ok = (j < days.size) & (days[np.minimum(j, days.size - 1)]
                                == days + lag)
        a = rev[ok]
        b = rev[np.minimum(j, days.size - 1)[ok]]
        n = int(a.size)
        if n == 0:
            continue
        ac = np.nan
        if n >= 2:
            da = a - a.mean()
            db = b - b.mean()
            va = float((da * da).sum())
            vb = float((db * db).sum())
            if va > 0 and vb > 0:
                ac = float((da * db).sum()) / np.sqrt(va * vb)
        lags.append(lag)
        ns.append(n)
        acs.append(ac)
    if not lags:
        return empty
    return pd.DataFrame({"lag": pd.array(lags, "int64"),
                         "n": pd.array(ns, "int64"),
                         "ac": round_away(np.asarray(acs), 6)})


def q_moving_range(sf_dir: str) -> pd.DataFrame:
    """I-MR control-chart statistics per user: the mean of the
    time-ordered absolute successive differences (the "moving range",
    the SPC dispersion estimate that needs no distributional
    assumption) plus the plain mean. Window order is (ts, event_id,
    value) — NULLS LAST like every window ORDER BY (q144 rule), with
    NULL ts/event_id sentinel-filled to int64-max so the numeric
    lexsort is exact past 2^53 (q116 rule); a (ts, event_id) tie with
    differing values is ordered by value, so the lag sequence is
    deterministic on both sides. One hash_shuffle co-locates each
    user's rows; diffs are one vectorized masked-boundary pass per
    bucket. Non-finite values excluded on both sides; single-event
    users get SQL NULL mrbar -> NaN."""
    P = 16

    _E = pa.table({"user": pa.array([], pa.float64()),
                   "isnull": pa.array([], pa.bool_()),
                   "tsf": pa.array([], pa.int64()),
                   "idf": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_finite(t.column("value")),
                                   False))
        if t2.num_rows == 0:
            return _E
        uid = np.asarray(t2.column("user_id").to_numpy(
            zero_copy_only=False), np.float64)
        isnull = np.isnan(uid)
        ts = t2.column("ts")
        tsf = pc.fill_null(pc.cast(ts, pa.int64()), _IMAX).to_numpy(
            zero_copy_only=False)
        idf = pc.fill_null(pc.cast(t2.column("event_id"), pa.int64()),
                           _IMAX).to_numpy(zero_copy_only=False)
        bucket = np.where(isnull, 0,
                          np.abs(np.nan_to_num(uid)).astype(np.int64)
                          % P).astype(np.int64)
        return pa.table({"user": pa.array(uid),
                         "isnull": pa.array(isnull),
                         "tsf": pa.array(np.asarray(tsf, np.int64)),
                         "idf": pa.array(np.asarray(idf, np.int64)),
                         "v": pa.array(np.asarray(
                             t2.column("value").to_numpy(
                                 zero_copy_only=False), np.float64)),
                         "bucket": pa.array(bucket)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"user": pd.Series(dtype="float64"),
                "isnull": pd.Series(dtype="bool"),
                "n": pd.Series(dtype="int64"),
                "xbar": pd.Series(dtype="float64"),
                "mrbar": pd.Series(dtype="float64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        uid = df["user"].to_numpy(np.float64)
        # NULL users all hash to bucket 0 and sort together: key NaN
        # as -inf so they form one leading run
        ukey = np.where(df["isnull"].to_numpy(bool), -np.inf, uid)
        order = np.lexsort((df["v"].to_numpy(np.float64),
                            df["idf"].to_numpy(np.int64),
                            df["tsf"].to_numpy(np.int64), ukey))
        ukey_s = ukey[order]
        v_s = df["v"].to_numpy(np.float64)[order]
        newgrp = np.empty(len(ukey_s), bool)
        newgrp[0] = True
        newgrp[1:] = ukey_s[1:] != ukey_s[:-1]
        gid = np.cumsum(newgrp) - 1
        ng = gid[-1] + 1
        n = np.bincount(gid, minlength=ng)
        s = np.bincount(gid, weights=v_s, minlength=ng)
        mr = np.abs(np.diff(v_s))
        mr_gid = gid[1:][~newgrp[1:]]
        mr_vals = mr[~newgrp[1:]]
        mrs = np.bincount(mr_gid, weights=mr_vals, minlength=ng)
        mrn = np.bincount(mr_gid, minlength=ng)
        with np.errstate(invalid="ignore", divide="ignore"):
            mrbar = np.where(mrn > 0, mrs / np.maximum(mrn, 1), np.nan)
        firsts = np.nonzero(newgrp)[0]
        return pd.DataFrame({
            "user": ukey_s[firsts],
            "isnull": ~np.isfinite(ukey_s[firsts]),
            "n": n.astype(np.int64),
            "xbar": s / n,
            "mrbar": mrbar})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "value"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "xbar": pd.Series(dtype="float64"),
                          "mrbar": pd.Series(dtype="float64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    isnull = out["isnull"].to_numpy(bool)
    user = out["user"].to_numpy(np.float64).copy()
    user[isnull] = np.nan
    res = pd.DataFrame({"user_id": user,
                        "n": out["n"].astype("int64"),
                        "xbar": round_away(
                            out["xbar"].to_numpy(np.float64), 6),
                        "mrbar": round_away(
                            out["mrbar"].to_numpy(np.float64), 6)})
    if not isnull.any():
        res["user_id"] = res["user_id"].astype("int64")
    # NULLS LAST user ordering: NaN sorts last under argsort
    return (res.iloc[np.argsort(res["user_id"].to_numpy(np.float64))]
            .reset_index(drop=True))


def q_anova_f(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F across event types (k-group generalization of
    q133's Welch pair): F = (SSB/(k−1)) / (SSW/(N−k)) over
    ``events.value`` grouped by event_type (NULL type IS a group,
    like GROUP BY). Per-batch per-group CENTERED (n, mean, M2, min,
    max) partials — q92's contract, naive Σx² cancels — Chan-merged
    driver-side per group; group keys ride the exchange as exact
    strings and fold through ``factorize_strings`` (pandas' NUL-
    terminated string hash would merge 'fz' with 'fz\\x00...').
    Exact min==max constancy flags decide SSW=0, not float M2≈0.
    Non-finite values excluded on both sides (DuckDB var_samp raises);
    empty input / k<2 / SSW=0 / N<=k yield SQL NULL-or-no-row exactly
    as the oracle's WHERE + CASE do."""
    from .pairs import factorize_strings

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    _E = pa.table({"g": pa.array([], pa.string()),
                   "gnull": pa.array([], pa.bool_()),
                   "n": pa.array([], pa.float64()),
                   "m": pa.array([], pa.float64()),
                   "m2": pa.array([], pa.float64()),
                   "mn": pa.array([], pa.float64()),
                   "mx": pa.array([], pa.float64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_finite(t.column("value")),
                                   False))
        if t2.num_rows == 0:
            return _E
        gs = t2.column("event_type").to_pandas()
        codes, uniq = factorize_strings(gs, use_na_sentinel=False)
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.float64)
        s = np.zeros(k)
        np.add.at(s, codes, v)
        m = s / n
        d = v - m[codes]
        m2 = np.zeros(k)
        np.add.at(m2, codes, d * d)
        mn = np.full(k, np.inf)
        mx = np.full(k, -np.inf)
        np.minimum.at(mn, codes, v)
        np.maximum.at(mx, codes, v)
        names = [None if u is None or (isinstance(u, float)
                                       and np.isnan(u)) else str(u)
                 for u in uniq]
        return pa.table({
            "g": pa.array(names, pa.string()),
            "gnull": pa.array([x is None for x in names]),
            "n": pa.array(n), "m": pa.array(m), "m2": pa.array(m2),
            "mn": pa.array(mn), "mx": pa.array(mx)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "f": pd.Series(dtype="float64")})
    if parts.empty:
        return empty
    key = parts["g"].where(~parts["gnull"].to_numpy(bool), None)
    codes, uniq = factorize_strings(key, use_na_sentinel=False)
    stats = []  # per group: (n, mean, M2exact, const)
    for gi in range(len(uniq)):
        g = parts[codes == gi]
        n = m = m2 = 0.0
        for r in g.itertuples(index=False):
            if n == 0.0:
                n, m, m2 = r.n, r.m, r.m2
                continue
            tot = n + r.n
            dd = r.m - m
            m2 += r.m2 + dd * dd * (n * r.n / tot)
            m += dd * r.n / tot
            n = tot
        const = g["mn"].min() == g["mx"].max()
        stats.append((n, m, 0.0 if const else m2))
    karr = len(stats)
    N = sum(s[0] for s in stats)
    gm = sum(s[0] * s[1] for s in stats) / N
    ssb = sum(s[0] * (s[1] - gm) ** 2 for s in stats)
    ssw = sum(s[2] for s in stats)
    f = np.nan
    if N > karr and karr > 1 and ssw > 0:
        f = (ssb / (karr - 1)) / (ssw / (N - karr))
    return pd.DataFrame({"k": pd.array([karr], "int64"),
                         "n": pd.array([int(N)], "int64"),
                         "f": round_away(np.array([f]), 6)})


def q_repeat_purchase(sf_dir: str, days: int = 30) -> pd.DataFrame:
    """Repeat-purchase cohort rate: customers cohorted by the month of
    their FIRST order; per cohort, the share whose SECOND order landed
    within ``days`` days. The distributed primitive is "k smallest per
    group" with k=2: each block emits its two earliest (date, orderkey)
    pairs per customer — a bounded combiner, so the exchange carries
    ≤ 2 rows per (block, customer) — and each bucket resolves the true
    first/second from partials. Order-date ties break on o_orderkey
    (mirrored in the oracle's row_number ORDER BY). NULL o_orderdate
    rows are out of contract on both sides (the oracle's WHERE);
    months floor-divide epoch µs -> calendar month like q130."""
    P = 16

    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "us": pa.array([], pa.int64()),
                   "okey": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                             pc.is_valid(t.column("o_orderdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        cust = np.asarray(t2.column("o_custkey").to_numpy(
            zero_copy_only=False), np.int64)
        us = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        okey = np.asarray(t2.column("o_orderkey").to_numpy(
            zero_copy_only=False), np.int64)
        # two earliest per customer: lexsort + first-two-of-run mask
        order = np.lexsort((okey, us, cust))
        c_s, u_s, k_s = cust[order], us[order], okey[order]
        newg = np.empty(c_s.size, bool)
        newg[0] = True
        newg[1:] = c_s[1:] != c_s[:-1]
        second = np.zeros(c_s.size, bool)
        second[1:] = newg[:-1] & ~newg[1:]
        pick = newg | second
        return pa.table({"cust": pa.array(c_s[pick]),
                         "us": pa.array(u_s[pick]),
                         "okey": pa.array(k_s[pick]),
                         "bucket": pa.array(c_s[pick] % P)})

    DAY = 86_400_000_000

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"month": pd.Series(dtype="int64"),
                "n_customers": pd.Series(dtype="int64"),
                "n_repeat": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        cust = df["cust"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        okey = df["okey"].to_numpy(np.int64)
        order = np.lexsort((okey, us, cust))
        c_s, u_s = cust[order], us[order]
        newg = np.empty(c_s.size, bool)
        newg[0] = True
        newg[1:] = c_s[1:] != c_s[:-1]
        second = np.zeros(c_s.size, bool)
        second[1:] = newg[:-1] & ~newg[1:]
        first_us = u_s[newg]
        # month of the first order (floor-divide epoch days -> civil
        # month via the 1970-01 epoch month walk, q130 helper inline):
        days_e = np.floor_divide(first_us, DAY)
        d = pd.to_datetime(days_e * 86_400_000_000_000)
        month = (d.year * 100 + d.month).astype(np.int64)
        # repeat flag: customer has a second row AND it is within days
        has2 = np.zeros(newg.sum(), bool)
        gap_ok = np.zeros(newg.sum(), bool)
        gi = np.cumsum(newg) - 1
        s_idx = np.nonzero(second)[0]
        has2[gi[s_idx]] = True
        gap_ok[gi[s_idx]] = (u_s[s_idx] - first_us[gi[s_idx]]
                             <= days * DAY)
        rep = has2 & gap_ok
        out = pd.DataFrame({"month": month, "rep": rep})
        g = out.groupby("month", as_index=False).agg(
            n_customers=("rep", "size"), n_repeat=("rep", "sum"))
        g["n_customers"] = g["n_customers"].astype("int64")
        g["n_repeat"] = g["n_repeat"].astype("int64")
        return g

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])
        .to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"month": pd.Series(dtype="int64"),
                          "n_customers": pd.Series(dtype="int64"),
                          "n_repeat": pd.Series(dtype="int64"),
                          "rate": pd.Series(dtype="float64")})
    if not parts:
        return empty
    g = (pd.concat(parts, ignore_index=True)
         .groupby("month", as_index=False)
         .agg(n_customers=("n_customers", "sum"),
              n_repeat=("n_repeat", "sum")))
    g["rate"] = round_away(
        g["n_repeat"].to_numpy(np.float64)
        / g["n_customers"].to_numpy(np.float64), 6)
    g["n_customers"] = g["n_customers"].astype("int64")
    g["n_repeat"] = g["n_repeat"].astype("int64")
    return g.sort_values("month").reset_index(drop=True)


def q_duplicate_invoices(sf_dir: str, days: int = 7) -> pd.DataFrame:
    """Duplicate-invoice screen (the audit op behind double-payment
    detection): unordered order pairs of the SAME customer with an
    IDENTICAL total price at most ``days`` apart. Self band-join —
    one custkey exchange co-locates each customer's orders, runs of
    equal (customer, price-bits) sort by date, and each row's window
    partner range comes from one searchsorted + ragged expansion (no
    per-row loop, no quadratic blowup beyond true matches).

    Parity contracts: price equality is on exact float64 BITS with
    -0.0 normalized to +0.0 (SQL groups ±0 as equal; NaN is excluded
    by the isfinite filter because DuckDB's NaN = NaN is TRUE — a
    silent quadratic NaN clique otherwise); the window is raw epoch-µs
    arithmetic (epoch_us both sides, NOT date_diff's boundary count);
    duplicated rows pair with the multiset multiplicity of the SQL
    join; self-pairs on one orderkey are excluded like b.key > a.key."""
    P = 16
    W = days * 86_400_000_000

    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "pbits": pa.array([], pa.int64()),
                   "us": pa.array([], pa.int64()),
                   "okey": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("o_custkey")),
                          pc.is_valid(t.column("o_orderdate"))),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        cust = np.asarray(t2.column("o_custkey").to_numpy(
            zero_copy_only=False), np.int64)
        p = np.asarray(t2.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        p = np.where(p == 0.0, 0.0, p)  # -0.0 == 0.0 in SQL
        return pa.table({
            "cust": pa.array(cust),
            "pbits": pa.array(p.view(np.int64)),
            "us": pa.array(t2.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)),
            "okey": pa.array(np.asarray(
                t2.column("o_orderkey").to_numpy(zero_copy_only=False),
                np.int64)),
            "bucket": pa.array(cust % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"k1": pd.Series(dtype="int64"),
                "k2": pd.Series(dtype="int64"),
                "o_custkey": pd.Series(dtype="int64"),
                "pbits": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        cust = df["cust"].to_numpy(np.int64)
        pb = df["pbits"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        ok = df["okey"].to_numpy(np.int64)
        order = np.lexsort((ok, us, pb, cust))
        c_s, p_s, u_s, k_s = (cust[order], pb[order], us[order],
                              ok[order])
        newg = np.empty(c_s.size, bool)
        newg[0] = True
        newg[1:] = (c_s[1:] != c_s[:-1]) | (p_s[1:] != p_s[:-1])
        run_start = np.nonzero(newg)[0]
        run_len = np.diff(np.append(run_start, c_s.size))
        # only runs with >= 2 rows can pair — by the predicate (same
        # customer AND bit-identical price) those are exactly the
        # candidate duplicate groups, so iterating THEM is output-
        # bounded, not input-bounded; dates are sorted within a run,
        # one searchsorted per run gives every row's window end
        k1s, k2s, custs, pbs = [], [], [], []
        for rs, rl in zip(run_start[run_len >= 2],
                          run_len[run_len >= 2]):
            sl_u = u_s[rs:rs + rl]
            sl_k = k_s[rs:rs + rl]
            end = np.searchsorted(sl_u, sl_u + W, side="right")
            lens = end - np.arange(rl) - 1
            lens = np.maximum(lens, 0)
            tot = int(lens.sum())
            if tot == 0:
                continue
            rep = np.repeat(np.arange(rl), lens)
            base = np.concatenate(([0], np.cumsum(lens)[:-1]))
            j = (rep + 1 + (np.arange(tot) - base[rep])).astype(
                np.int64)
            a = sl_k[rep]
            b = sl_k[j]
            keepm = a != b  # b.okey > a.okey drops same-key dup rows
            if not keepm.any():
                continue
            k1s.append(np.minimum(a, b)[keepm])
            k2s.append(np.maximum(a, b)[keepm])
            custs.append(np.full(int(keepm.sum()), c_s[rs], np.int64))
            pbs.append(np.full(int(keepm.sum()), p_s[rs], np.int64))
        if not k1s:
            return pd.DataFrame(cols)
        return pd.DataFrame({"k1": np.concatenate(k1s),
                             "k2": np.concatenate(k2s),
                             "o_custkey": np.concatenate(custs),
                             "pbits": np.concatenate(pbs)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"k1": pd.Series(dtype="int64"),
                          "k2": pd.Series(dtype="int64"),
                          "o_custkey": pd.Series(dtype="int64"),
                          "o_totalprice": pd.Series(dtype="float64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    out["o_totalprice"] = out.pop("pbits").to_numpy(np.int64).view(
        np.float64)
    return (out.sort_values(["k1", "k2"])
            .reset_index(drop=True)[["k1", "k2", "o_custkey",
                                     "o_totalprice"]])


def q_basket_rules(sf_dir: str, topk: int = 20) -> pd.DataFrame:
    """Market-basket association rules over order contents: the top-k
    part pairs by LIFT = sup(ab)·N / (sup(a)·sup(b)) with support
    counts (the Apriori screening pass). Three bounded stages: (1) one
    orderkey exchange dedups (order, part) and emits per-order sorted
    pairs by vectorized shift-pairing; (2) item supports + the global
    basket count N fold driver-side (item domain = the part dim, small
    by contract) and broadcast; (3) a pair-keyed exchange sums pair
    supports and each bucket returns only its LOCAL top-k by
    (lift DESC, pa, pb) — the driver folds P·k candidate rows, never
    the pair table. Lift ties are totally ordered by (pa, pb) so the
    LIMIT boundary is deterministic; the division is exact-int →
    float64 on both sides, bit-identical."""
    import ray

    from .pairs import mix64

    P = 16
    lim = np.uint64(1) << np.uint64(32)

    _E1 = pa.table({"okey": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_partkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E1
        g = (pa.table({"okey": pc.cast(t2.column("l_orderkey"),
                                       pa.int64()),
                       "part": pc.cast(t2.column("l_partkey"),
                                       pa.int64())})
             .group_by(["okey", "part"]).aggregate([]))
        return pa.table({"okey": g.column("okey"),
                         "part": g.column("part"),
                         "bucket": pc.bit_wise_and(g.column("okey"),
                                                   P - 1)})

    def merge1(*tabs) -> pa.Table:
        """Per-bucket: distinct (order, part) → per-order pairs +
        (part, n_orders) partials + basket count, all in one table
        (kind 0 = pair, 1 = item, 2 = basket count)."""
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        E = pa.table({"kind": pa.array([], pa.int8()),
                      "key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        if not live:
            return E
        df = (pa.concat_tables(live).to_pandas().drop_duplicates()
              .sort_values(["okey", "part"]))
        ok = df["okey"].to_numpy(np.int64)
        pt = df["part"].to_numpy(np.int64)
        from .graph import _pairs_by_shift
        a, b = _pairs_by_shift(ok, pt)
        if len(a) and (a.min() < 0 or b.max() >= int(lim)):
            raise ValueError("partkey outside [0, 2^32) packing domain")
        pkey = ((a.astype(np.uint64) << np.uint64(32))
                | b.astype(np.uint64)).view(np.int64)
        uk, cnt = np.unique(pkey, return_counts=True)
        up, icnt = np.unique(pt, return_counts=True)
        n_orders = int(np.unique(ok).size)
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(uk.size, np.int8),
                 np.ones(up.size, np.int8),
                 np.full(1, 2, np.int8)])),
            "key": pa.array(np.concatenate(
                [uk, up, np.zeros(1, np.int64)])),
            "n": pa.array(np.concatenate(
                [cnt.astype(np.int64), icnt.astype(np.int64),
                 np.full(1, n_orders, np.int64)]))})

    tagged = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey"]).to_arrow_refs()]
    s1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)
    s1_tabs = ray.get(list(s1))
    empty = pd.DataFrame({"pa_key": pd.Series(dtype="int64"),
                          "pb_key": pd.Series(dtype="int64"),
                          "sup": pd.Series(dtype="int64"),
                          "lift": pd.Series(dtype="float64")})
    live = [t for t in s1_tabs if t.num_rows]
    if not live:
        return empty
    cat = pa.concat_tables(live).to_pandas()
    # item supports + N are already order-deduped (an order lives in
    # exactly one bucket); fold driver-side and broadcast
    items = cat[cat["kind"] == 1].groupby("key")["n"].sum()
    N = int(cat[cat["kind"] == 2]["n"].sum())
    item_keys = items.index.to_numpy(np.int64)
    item_sup = items.to_numpy(np.int64)
    bc = ray.put((item_keys, item_sup, N))

    # pair-keyed exchange: route pair partials to their hash bucket,
    # merge sums, compute lift, keep local top-k
    def split2(t: pa.Table) -> pa.Table:
        E = pa.table({"key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return E
        d = t.to_pandas()
        d = d[d["kind"] == 0]
        if d.empty:
            return E
        key = d["key"].to_numpy(np.int64)
        return pa.table({"key": pa.array(key),
                         "n": pa.array(d["n"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (mix64(key) & np.uint64(P - 1))
                             .astype(np.int64))})

    def merge2(*tabs) -> pd.DataFrame:
        cols = {"pa_key": pd.Series(dtype="int64"),
                "pb_key": pd.Series(dtype="int64"),
                "sup": pd.Series(dtype="int64"),
                "lift": pd.Series(dtype="float64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        ik, isup, n_all = ray.get(bc) if isinstance(
            bc, ray.ObjectRef) else bc
        df = (pa.concat_tables(live).to_pandas()
              .groupby("key", as_index=False).agg(n=("n", "sum")))
        key = df["key"].to_numpy(np.int64)
        sup = df["n"].to_numpy(np.int64)
        ua = (key.view(np.uint64) >> np.uint64(32)).astype(np.int64)
        ub = (key.view(np.uint64) & (lim - np.uint64(1))).astype(
            np.int64)
        sa = isup[np.searchsorted(ik, ua)]
        sb = isup[np.searchsorted(ik, ub)]
        lift = (sup * n_all).astype(np.float64) / (
            (sa * sb).astype(np.float64))
        order = np.lexsort((ub, ua, -lift))[:topk]
        return pd.DataFrame({"pa_key": ua[order], "pb_key": ub[order],
                             "sup": sup[order],
                             "lift": lift[order]})

    parts = [p for p in hash_shuffle([(r, ()) for r in s1], split2,
                                     merge2, P=P) if len(p)]
    if not parts:
        return empty
    allc = pd.concat(parts, ignore_index=True)
    lift = allc["lift"].to_numpy(np.float64)
    order = np.lexsort((allc["pb_key"].to_numpy(np.int64),
                        allc["pa_key"].to_numpy(np.int64),
                        -lift))[:topk]
    out = allc.iloc[order].reset_index(drop=True)
    out["lift"] = round_away(out["lift"].to_numpy(np.float64), 6)
    return out


def q_cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint screen on daily order revenue: the day k
    maximizing |S_k − (k/n)·S_n| (cumulative sum's maximum deviation
    from the no-change line — the classic level-shift detector), with
    the statistic itself. Reuses q199's counts-per-day exchange
    (``_daily_rev_cents``); the scan over ~#days rows is driver-side
    prefix arithmetic on exact integer cents, and k·S_n/n is the same
    exact-int → float64 expression on both sides (DuckDB's BIGINT
    division is float), so the argmax ordering is bit-deterministic
    with the (stat DESC, day) tie-break."""
    d = _daily_rev_cents(sf_dir)
    empty = pd.DataFrame({"n_days": pd.Series(dtype="int64"),
                          "cp_day": pd.Series(dtype="int64"),
                          "stat": pd.Series(dtype="float64")})
    if d.empty:
        return empty
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    n = days.size
    cum = np.cumsum(rev)
    tot = int(cum[-1])
    k = np.arange(1, n + 1, dtype=np.int64)
    stat = np.abs(cum.astype(np.float64)
                  - (k * tot).astype(np.float64) / n)
    best = np.lexsort((days, -stat))[0]
    return pd.DataFrame({
        "n_days": pd.array([n], "int64"),
        "cp_day": pd.array([int(days[best])], "int64"),
        "stat": round_away(np.array([stat[best]]), 4)})


def q_rolling_window_max(sf_dir: str) -> pd.DataFrame:
    """Order-statistic window frame: max(value) OVER (PARTITION BY
    user ORDER BY ts, event_id, value ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) — the ROWS-frame running max q49/q142's sum-based
    rollers don't cover (a max can't be maintained by +/- deltas).
    Same user exchange + sentinel window order as q202; the frame max
    is two boundary-masked shifts, one vector op per frame row.
    Non-finite values excluded on both sides (DuckDB max treats NaN
    as greatest); NULL user_id/event_id ride int64-max sentinels and
    restore to float64+NaN only when present (q116 dtype rule)."""
    P = 16

    _E = pa.table({"user": pa.array([], pa.float64()),
                   "unull": pa.array([], pa.bool_()),
                   "tsf": pa.array([], pa.int64()),
                   "idf": pa.array([], pa.int64()),
                   "idnull": pa.array([], pa.bool_()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return _E
        t2 = t.filter(pc.fill_null(pc.is_finite(t.column("value")),
                                   False))
        if t2.num_rows == 0:
            return _E
        uid = np.asarray(t2.column("user_id").to_numpy(
            zero_copy_only=False), np.float64)
        unull = np.isnan(uid)
        eid = t2.column("event_id")
        return pa.table({
            "user": pa.array(uid),
            "unull": pa.array(unull),
            "tsf": pc.fill_null(pc.cast(t2.column("ts"), pa.int64()),
                                _IMAX),
            "idf": pc.fill_null(pc.cast(eid, pa.int64()), _IMAX),
            "idnull": pc.is_null(eid),
            "v": pc.cast(t2.column("value"), pa.float64()),
            "bucket": pa.array(np.where(
                unull, 0, np.abs(np.nan_to_num(uid)).astype(np.int64)
                % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"user": pd.Series(dtype="float64"),
                "unull": pd.Series(dtype="bool"),
                "idf": pd.Series(dtype="int64"),
                "idnull": pd.Series(dtype="bool"),
                "v": pd.Series(dtype="float64"),
                "wmax": pd.Series(dtype="float64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        uid = df["user"].to_numpy(np.float64)
        ukey = np.where(df["unull"].to_numpy(bool), -np.inf, uid)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((v, df["idf"].to_numpy(np.int64),
                            df["tsf"].to_numpy(np.int64), ukey))
        u_s = ukey[order]
        v_s = v[order]
        same1 = np.zeros(u_s.size, bool)
        same1[1:] = u_s[1:] == u_s[:-1]
        same2 = np.zeros(u_s.size, bool)
        same2[2:] = u_s[2:] == u_s[:-2]
        m1 = np.full(u_s.size, -np.inf)
        m1[1:] = v_s[:-1]
        m1[~same1] = -np.inf
        m2 = np.full(u_s.size, -np.inf)
        m2[2:] = v_s[:-2]
        m2[~same2] = -np.inf
        wmax = np.maximum(v_s, np.maximum(m1, m2))
        out = df.iloc[order].reset_index(drop=True)
        out["wmax"] = wmax
        return out[["user", "unull", "idf", "idnull", "v", "wmax"]]

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "value"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "event_id": pd.Series(dtype="int64"),
                          "value": pd.Series(dtype="float64"),
                          "wmax": pd.Series(dtype="float64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    user = out["user"].to_numpy(np.float64).copy()
    user[out["unull"].to_numpy(bool)] = np.nan
    eid = out["idf"].to_numpy(np.int64).astype(np.float64)
    eid[out["idnull"].to_numpy(bool)] = np.nan
    res = pd.DataFrame({"user_id": user,
                        "event_id": eid,
                        "value": out["v"].to_numpy(np.float64),
                        "wmax": out["wmax"].to_numpy(np.float64)})
    if not out["unull"].any():
        res["user_id"] = res["user_id"].astype("int64")
    if not out["idnull"].any():
        res["event_id"] = out["idf"].to_numpy(np.int64)
    order = np.lexsort((res["value"].to_numpy(np.float64),
                        out["idf"].to_numpy(np.int64),
                        np.where(out["unull"].to_numpy(bool), np.inf,
                                 out["user"].to_numpy(np.float64))))
    return res.iloc[order].reset_index(drop=True)


def q_weekly_detrended(sf_dir: str) -> pd.DataFrame:
    """Seasonal decomposition screen: detrend daily revenue with a
    CENTERED 7-row moving average (ROWS BETWEEN 3 PRECEDING AND 3
    FOLLOWING — the symmetric frame q49/q142's trailing windows don't
    cover), keep only full-frame rows, and report the mean residual
    per weekday. Reuses the counts-per-day exchange
    (``_daily_rev_cents``); the trend is a cumsum sliding difference
    over exact integer cents (÷7 is the only float), and the weekday
    is the floored (day+4) mod 7 of the epoch-day index (q191 rule,
    0 = Sunday like dayofweek)."""
    d = _daily_rev_cents(sf_dir)
    empty = pd.DataFrame({"dow": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "detrended": pd.Series(dtype="float64")})
    n = len(d)
    if n < 7:
        return empty
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(rev)))
    # centered 7-row window sums for rows 3..n-4 (full frames only)
    core = np.arange(3, n - 3)
    trend = (cum[core + 4] - cum[core - 3]).astype(np.float64) / 7.0
    resid = rev[core].astype(np.float64) - trend
    dow = np.mod(days[core] + 4, 7).astype(np.int64)
    cnt = np.bincount(dow, minlength=7)
    s = np.zeros(7)
    np.add.at(s, dow, resid)
    keep = cnt > 0
    return pd.DataFrame({
        "dow": np.arange(7, dtype=np.int64)[keep],
        "n": cnt[keep].astype(np.int64),
        "detrended": round_away(s[keep] / cnt[keep], 6)})


def q_recency_scores(sf_dir: str, halflife_days: float = 7.0
                     ) -> pd.DataFrame:
    """Exponentially-decayed engagement score per user:
    Σ value · 2^(−(T−ts)/halflife), T the global max event time — the
    closed-form recency weighting that needs NO recursion (unlike an
    EWMA over steps). Two passes: a max-reduce for T, then per-batch
    per-user (n, Σ weighted) combiners folded driver-side (users are
    a small domain; the fold is O(P·users)). Weights are the same
    pow(2, −Δ/λ) float64 expression on both sides. NULL user_id IS a
    group (float64+NaN dtype only when present, q74 rule); NULL ts or
    non-finite values are excluded on both sides."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def tmax_part(t: pa.Table) -> pa.Table:
        E = pa.table({"tmax": pa.array([], pa.int64())})
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return E
        keep = pc.and_kleene(
            pc.is_valid(t.column("ts")),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"tmax": pa.array([int(us.max())])})

    p1 = ds.map_batches(tmax_part, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if p1.empty:
        return empty
    tmax = int(p1["tmax"].max())
    lam = halflife_days * 86_400_000_000.0

    def part(t: pa.Table) -> pa.Table:
        E = pa.table({"user": pa.array([], pa.float64()),
                      "unull": pa.array([], pa.bool_()),
                      "n": pa.array([], pa.int64()),
                      "s": pa.array([], pa.float64())})
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return E
        keep = pc.and_kleene(
            pc.is_valid(t.column("ts")),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        uid = np.asarray(t2.column("user_id").to_numpy(
            zero_copy_only=False), np.float64)
        unull = np.isnan(uid)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        w = v * np.power(2.0, -((tmax - us).astype(np.float64) / lam))
        ukey = np.where(unull, -np.inf, uid)
        uu, inv = np.unique(ukey, return_inverse=True)
        cnt = np.bincount(inv, minlength=uu.size)
        s = np.zeros(uu.size)
        np.add.at(s, inv, w)
        return pa.table({"user": pa.array(uu),
                         "unull": pa.array(~np.isfinite(uu)),
                         "n": pa.array(cnt.astype(np.int64)),
                         "s": pa.array(s)})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    ukey = np.where(parts["unull"].to_numpy(bool), -np.inf,
                    parts["user"].to_numpy(np.float64))
    uu, inv = np.unique(ukey, return_inverse=True)
    cnt = np.bincount(inv, weights=parts["n"].to_numpy(np.float64),
                      minlength=uu.size).astype(np.int64)
    s = np.zeros(uu.size)
    np.add.at(s, inv, parts["s"].to_numpy(np.float64))
    user = uu.copy()
    user[~np.isfinite(uu)] = np.nan
    res = pd.DataFrame({"user_id": user,
                        "n": pd.array(cnt, "int64"),
                        "score": round_away(s, 6)})
    if np.isfinite(uu).all():
        res["user_id"] = res["user_id"].astype("int64")
    return (res.iloc[np.argsort(
        np.where(np.isfinite(uu), uu, np.inf))].reset_index(drop=True))


def q_systematic_sample(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Systematic (every k-th) sample by global (value, event_id)
    rank — the deterministic grid sample next to q70's hash sample and
    q106's weighted one. ONE Dataset.sort is the only all-to-all;
    global indices then come from per-block row counts (driver folds P
    integers, q60's offset idea) and each block emits its own
    rank-hit rows — ranks never materialize. NULL event_ids ride the
    int64-max sentinel (NULLS-LAST order, q116 rule); non-finite
    values are excluded on both sides."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        E = pa.table({"idf": pa.array([], pa.int64()),
                      "idnull": pa.array([], pa.bool_()),
                      "value": pa.array([], pa.float64())})
        if t.num_rows == 0 or "value" not in t.schema.names:
            return E
        t2 = t.filter(pc.fill_null(pc.is_finite(t.column("value")),
                                   False))
        if t2.num_rows == 0:
            return E
        eid = t2.column("event_id")
        return pa.table({
            "idf": pc.fill_null(pc.cast(eid, pa.int64()), _IMAX),
            "idnull": pc.is_null(eid),
            "value": pc.cast(t2.column("value"), pa.float64())})

    srt = (ds.map_batches(prep, batch_format="pyarrow")
           .sort(["value", "idf"]).materialize())
    refs = srt.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def pick(t: pa.Table, off: int, k: int) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"idf": pd.Series(dtype="int64"),
                                 "idnull": pd.Series(dtype="bool"),
                                 "value": pd.Series(dtype="float64")})
        # global 0-based index ≡ 0 (mod k)
        first = (-off) % k
        idx = np.arange(first, t.num_rows, k, dtype=np.int64)
        return t.take(pa.array(idx)).to_pandas()

    parts = ray.get([pick.remote(r, int(o), k)
                     for r, o in zip(refs, offs)])
    live = [p for p in parts if len(p)]
    empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "value": pd.Series(dtype="float64")})
    if not live:
        return empty
    out = pd.concat(live, ignore_index=True)
    eid = out["idf"].to_numpy(np.int64)
    res = pd.DataFrame({"event_id": eid,
                        "value": out["value"].to_numpy(np.float64)})
    if out["idnull"].any():
        e = eid.astype(np.float64)
        e[out["idnull"].to_numpy(bool)] = np.nan
        res["event_id"] = e
    return (res.iloc[np.lexsort((out["idf"].to_numpy(np.int64),
                                 res["value"].to_numpy(np.float64)))]
            .reset_index(drop=True))


def q_sequence_pattern(sf_dir: str,
                       pattern: str = "^s.*p$") -> pd.DataFrame:
    """Sequence-pattern mining: each user's time-ordered event-type
    initials concatenated into a journey string, matched against an
    anchored regex (did the journey start with signup and end with
    purchase?) — the DFA-over-sequence op q74's fixed funnel can't
    express. One user exchange; within each bucket the journey order
    is built by CHAINED STABLE single-key sorts (type-bytes, then
    event_id, then ts, then user — pandas multi-key object sorts hash
    NUL-terminated, CLAUDE.md rule), and rows with NULL type drop
    exactly like string_agg skips NULL elements. The regex runs
    compiled over the per-user strings (RE2-compatible pattern — no
    backreferences)."""
    import re

    P = 16
    rx = re.compile(pattern)

    _E = pa.table({"user": pa.array([], pa.float64()),
                   "unull": pa.array([], pa.bool_()),
                   "tsf": pa.array([], pa.int64()),
                   "idf": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("event_type")))
        if t2.num_rows == 0:
            return _E
        uid = np.asarray(t2.column("user_id").to_numpy(
            zero_copy_only=False), np.float64)
        unull = np.isnan(uid)
        return pa.table({
            "user": pa.array(uid),
            "unull": pa.array(unull),
            "tsf": pc.fill_null(pc.cast(t2.column("ts"), pa.int64()),
                                _IMAX),
            "idf": pc.fill_null(pc.cast(t2.column("event_id"),
                                        pa.int64()), _IMAX),
            "typ": t2.column("event_type"),
            "bucket": pa.array(np.where(
                unull, 0, np.abs(np.nan_to_num(uid)).astype(np.int64)
                % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"user": pd.Series(dtype="float64"),
                "unull": pd.Series(dtype="bool"),
                "seq": pd.Series(dtype="object"),
                "matched": pd.Series(dtype="bool")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        # chained stable sorts, least-significant first: final order =
        # (user, ts, id, type-bytes); the type key is hex-encoded so
        # byte order survives pandas' object comparisons
        df["tkey"] = df["typ"].map(
            lambda s: s.encode("utf-8", "surrogatepass").hex())
        df["ukey"] = np.where(df["unull"].to_numpy(bool), -np.inf,
                              df["user"].to_numpy(np.float64))
        df = df.sort_values("tkey", kind="stable")
        df = df.sort_values("idf", kind="stable")
        df = df.sort_values("tsf", kind="stable")
        df = df.sort_values("ukey", kind="stable")
        chars = df["typ"].str.slice(0, 1)
        g = (pd.DataFrame({"ukey": df["ukey"].to_numpy(),
                           "unull": df["unull"].to_numpy(bool),
                           "ch": chars.to_numpy(dtype=object)})
             .groupby("ukey", sort=True))
        rows = []
        for ukey, grp in g:
            seq = "".join(grp["ch"].tolist())
            rows.append((ukey, bool(grp["unull"].iloc[0]), seq,
                         bool(rx.search(seq))))
        out = pd.DataFrame(rows, columns=["user", "unull", "seq",
                                          "matched"])
        return out

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "event_type"])
        .to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "seq": pd.Series(dtype="object"),
                          "matched": pd.Series(dtype="bool")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    user = out["user"].to_numpy(np.float64).copy()
    user[out["unull"].to_numpy(bool)] = np.nan
    res = pd.DataFrame({"user_id": user, "seq": out["seq"],
                        "matched": out["matched"].astype(bool)})
    if not out["unull"].any():
        res["user_id"] = res["user_id"].astype("int64")
    return (res.iloc[np.argsort(np.where(
        out["unull"].to_numpy(bool), np.inf,
        out["user"].to_numpy(np.float64)))].reset_index(drop=True))


def q_rrf_fusion(sf_dir: str, kc: int = 60,
                 topk: int = 20) -> pd.DataFrame:
    """Reciprocal-rank fusion of two event rankings — the IR result-
    merging op: r1 = rank by value DESC, r2 = rank by recency (ts
    DESC), score = 1/(kc+r1) + 1/(kc+r2), top-k by (score DESC,
    event_id). Two Dataset.sorts assign global ranks via q216's
    block-offset trick (ranks never gather); ONE event-keyed exchange
    joins the rank pairs and each bucket returns its local top-k —
    the driver folds P·k rows. Every score is the same exact-int
    1/(kc+r) float64 expression on both sides, so the ORDER BY is
    bit-deterministic. Contract: finite value, non-NULL ts/event_id
    (rank determinism needs the full tie-break chain)."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        E = pa.table({"event_id": pa.array([], pa.int64()),
                      "negv": pa.array([], pa.float64()),
                      "negts": pa.array([], pa.int64())})
        if t.num_rows == 0 or "value" not in t.schema.names:
            return E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("event_id")),
                          pc.is_valid(t.column("ts"))),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        v = np.asarray(t2.column("value").to_numpy(
            zero_copy_only=False), np.float64)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(t2.column("event_id"), pa.int64()),
            "negv": pa.array(-v),
            "negts": pa.array(-np.asarray(us, np.int64))})

    base = ds.map_batches(prep, batch_format="pyarrow").materialize()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def rank_rows(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        return pa.table({
            "event_id": t.column("event_id"),
            "r": pa.array(off + 1 + np.arange(t.num_rows,
                                              dtype=np.int64))})

    def ranks(sort_col: str):
        srt = base.sort([sort_col, "event_id"]).materialize()
        refs = srt.to_arrow_refs()
        counts = ray.get([nrows.remote(r) for r in refs])
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        return [rank_rows.remote(r, int(o))
                for r, o in zip(refs, offs)]

    r1_refs = ranks("negv")
    r2_refs = ranks("negts")

    from .pairs import mix64
    P = 16

    def split(t: pa.Table, dim: int) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int8()),
                             "bucket": pa.array([], pa.int64())})
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t.column("event_id"), "r": t.column("r"),
            "dim": pa.array(np.full(t.num_rows, dim, np.int8)),
            "bucket": pa.array((mix64(np.asarray(eid, np.int64)
                                      .view(np.uint64))
                                & np.uint64(P - 1)).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"event_id": pd.Series(dtype="int64"),
                "r1": pd.Series(dtype="int64"),
                "r2": pd.Series(dtype="int64"),
                "rrf": pd.Series(dtype="float64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        w = df.pivot_table(index="event_id", columns="dim",
                           values="r", aggfunc="first")
        r1 = w[0].to_numpy(np.int64)
        r2 = w[1].to_numpy(np.int64)
        rrf = 1.0 / (kc + r1) + 1.0 / (kc + r2)
        eid = w.index.to_numpy(np.int64)
        order = np.lexsort((eid, -rrf))[:topk]
        return pd.DataFrame({"event_id": eid[order],
                             "r1": r1[order], "r2": r2[order],
                             "rrf": rrf[order]})

    from .pairs import hash_shuffle as hs
    inputs = [(r, (0,)) for r in r1_refs]
    inputs += [(r, (1,)) for r in r2_refs]
    parts = [p for p in hs(inputs, split, merge, P=P) if len(p)]
    empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "r1": pd.Series(dtype="int64"),
                          "r2": pd.Series(dtype="int64"),
                          "rrf": pd.Series(dtype="float64")})
    if not parts:
        return empty
    allc = pd.concat(parts, ignore_index=True)
    rrf = allc["rrf"].to_numpy(np.float64)
    order = np.lexsort((allc["event_id"].to_numpy(np.int64),
                        -rrf))[:topk]
    out = allc.iloc[order].reset_index(drop=True)
    out["rrf"] = round_away(out["rrf"].to_numpy(np.float64), 9)
    out["r1"] = out["r1"].astype("int64")
    out["r2"] = out["r2"].astype("int64")
    return out


def q_time_in_state(sf_dir: str) -> pd.DataFrame:
    """Time-in-state accounting: each event opens a "state" named by
    its type that lasts until the user's NEXT event (lead(ts) −
    ts) — the session-replay summary op. Per-type totals and mean
    dwell in seconds. One user exchange, q202's sentinel window order
    (ts, event_id, event_type-bytes for full determinism), one masked
    diff, then per-type sums keyed through ``factorize_strings``
    (NUL-safe). Each user's LAST event has no successor — lead is
    NULL and the row drops from avg/sum like SQL. Durations are exact
    integer µs summed in int64; only the /1e6 and the mean divide are
    float."""
    from .pairs import factorize_strings

    P = 16

    _E = pa.table({"user": pa.array([], pa.float64()),
                   "unull": pa.array([], pa.bool_()),
                   "tsf": pa.array([], pa.int64()),
                   "idf": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "tnull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        uid = np.asarray(t2.column("user_id").to_numpy(
            zero_copy_only=False), np.float64)
        unull = np.isnan(uid)
        typ = t2.column("event_type")
        return pa.table({
            "user": pa.array(uid),
            "unull": pa.array(unull),
            "tsf": pc.cast(t2.column("ts"), pa.int64()),
            "idf": pc.fill_null(pc.cast(t2.column("event_id"),
                                        pa.int64()), _IMAX),
            "typ": pc.fill_null(typ, ""),
            "tnull": pc.is_null(typ),
            "bucket": pa.array(np.where(
                unull, 0, np.abs(np.nan_to_num(uid)).astype(np.int64)
                % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"typ": pd.Series(dtype="object"),
                "tnull": pd.Series(dtype="bool"),
                "n": pd.Series(dtype="int64"),
                "dur_us": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        df["tkey"] = df["typ"].map(
            lambda s: s.encode("utf-8", "surrogatepass").hex())
        df["ukey"] = np.where(df["unull"].to_numpy(bool), -np.inf,
                              df["user"].to_numpy(np.float64))
        df = df.sort_values("tkey", kind="stable")
        df = df.sort_values("idf", kind="stable")
        df = df.sort_values("tsf", kind="stable")
        df = df.sort_values("ukey", kind="stable")
        u_s = df["ukey"].to_numpy(np.float64)
        ts_s = df["tsf"].to_numpy(np.int64)
        samegrp = np.zeros(u_s.size, bool)
        samegrp[:-1] = u_s[1:] == u_s[:-1]
        dur = np.zeros(u_s.size, np.int64)
        dur[:-1] = ts_s[1:] - ts_s[:-1]
        keep = samegrp  # last event per user has no successor
        if not keep.any():
            return pd.DataFrame(cols)
        typ = df["typ"].to_numpy(dtype=object)[keep]
        tnull = df["tnull"].to_numpy(bool)[keep]
        key = pd.Series(np.where(tnull, None, typ), dtype=object)
        codes, uniq = factorize_strings(key, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq))
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, codes, dur[keep])
        return pd.DataFrame({
            "typ": pd.Series([u if u is not None else "" for u in uniq],
                             dtype=object),
            "tnull": [u is None for u in uniq],
            "n": n.astype(np.int64), "dur_us": s})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "event_type"])
        .to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64"),
                          "total_s": pd.Series(dtype="float64"),
                          "avg_s": pd.Series(dtype="float64")})
    if not parts:
        return empty
    from .pairs import factorize_strings as fs
    out = pd.concat(parts, ignore_index=True)
    key = out["typ"].where(~out["tnull"].to_numpy(bool), None)
    codes, uniq = fs(key, use_na_sentinel=False)
    # factorize hands NULL uniques back as float NaN (CLAUDE.md rule)
    uniq = [None if u is None or (isinstance(u, float)
                                  and np.isnan(u)) else u
            for u in uniq]
    n = np.bincount(codes, weights=out["n"].to_numpy(np.float64))
    s = np.zeros(len(uniq), np.int64)
    np.add.at(s, codes, out["dur_us"].to_numpy(np.int64))
    res = pd.DataFrame({
        "event_type": pd.Series(list(uniq), dtype=object),
        "n": n.astype(np.int64),
        "total_s": round_away(s / 1e6, 6),
        "avg_s": round_away(s / 1e6 / n, 6)})
    hexkey = res["event_type"].map(
        lambda x: "zz" if x is None
        else str(x).encode("utf-8", "surrogatepass").hex())
    return (res.iloc[np.argsort(hexkey.to_numpy())]
            .reset_index(drop=True))


def q_type_burstiness(sf_dir: str) -> pd.DataFrame:
    """Per-type burstiness (Fano factor): variance/mean of the
    per-hour event counts over the hours each type is ACTIVE — the
    dispersion screen separating steady feeds from bursty ones.
    Two-level aggregate with a bounded intermediate: per-block
    (type, hour, count) partials fold through one exchange keyed on
    the type; the hour axis uses the floor-divided epoch hour
    (CLAUDE.md pre-1970 rule). Counts are exact ints; var_samp uses
    the exact-centered two-pass on the folded (small) hour vector.
    Types with one active hour yield SQL NULL var -> NaN fano."""
    from .pairs import factorize_strings

    P = 8

    _E = pa.table({"typ": pa.array([], pa.string()),
                   "tnull": pa.array([], pa.bool_()),
                   "hour": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = np.floor_divide(us, 3_600_000_000)
        typ = t2.column("event_type").to_pandas()
        codes, uniq = factorize_strings(typ, use_na_sentinel=False)
        order = np.lexsort((hour, codes))
        c_s, h_s = codes[order], hour[order]
        newg = np.empty(c_s.size, bool)
        newg[0] = True
        newg[1:] = (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])
        idx = np.nonzero(newg)[0]
        cnt = np.diff(np.append(idx, c_s.size)).astype(np.int64)
        names = [None if u is None or (isinstance(u, float)
                                       and np.isnan(u)) else str(u)
                 for u in uniq]
        gname = [names[c] for c in c_s[idx]]
        return pa.table({
            "typ": pa.array([x if x is not None else "" for x in gname],
                            pa.string()),
            "tnull": pa.array([x is None for x in gname]),
            "hour": pa.array(h_s[idx]),
            "n": pa.array(cnt),
            "bucket": pa.array(np.abs(h_s[idx]) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"typ": pd.Series(dtype="object"),
                                 "tnull": pd.Series(dtype="bool"),
                                 "hour": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        key = df["typ"].where(~df["tnull"].to_numpy(bool), None)
        from .pairs import factorize_strings as fs
        codes, uniq = fs(key, use_na_sentinel=False)
        uniq = [None if u is None or (isinstance(u, float)
                                      and np.isnan(u)) else u
                for u in uniq]
        df = df.assign(gc=codes)
        g = df.groupby(["gc", "hour"], as_index=False).agg(
            n=("n", "sum"))
        g["typ"] = pd.Series([uniq[i] if uniq[i] is not None else ""
                              for i in g["gc"]], dtype=object)
        g["tnull"] = [uniq[i] is None for i in g["gc"]]
        return g[["typ", "tnull", "hour", "n"]]

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["ts", "event_type"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_hours": pd.Series(dtype="int64"),
                          "fano": pd.Series(dtype="float64")})
    if not parts:
        return empty
    from .pairs import factorize_strings as fs
    df = pd.concat(parts, ignore_index=True)
    key = df["typ"].where(~df["tnull"].to_numpy(bool), None)
    codes, uniq = fs(key, use_na_sentinel=False)
    uniq = [None if u is None or (isinstance(u, float)
                                  and np.isnan(u)) else u
            for u in uniq]
    rows = []
    cnts = df["n"].to_numpy(np.float64)
    for gi in range(len(uniq)):
        c = cnts[codes == gi]
        m = c.mean()
        fano = np.nan
        if c.size > 1:
            d = c - m
            fano = float((d * d).sum() / (c.size - 1)) / m
        rows.append((uniq[gi], int(c.size), fano))
    res = pd.DataFrame(rows, columns=["event_type", "n_hours", "fano"])
    res["n_hours"] = res["n_hours"].astype("int64")
    res["fano"] = round_away(res["fano"].to_numpy(np.float64), 6)
    hexkey = res["event_type"].map(
        lambda x: "zz" if x is None
        else str(x).encode("utf-8", "surrogatepass").hex())
    return (res.iloc[np.argsort(hexkey.to_numpy())]
            .reset_index(drop=True))


def q_range_window_avg(sf_dir: str, days: int = 30) -> pd.DataFrame:
    """Time-RANGE interval window (RANGE BETWEEN INTERVAL 30 DAY
    PRECEDING AND CURRENT ROW): every order gets the count and average
    of its CUSTOMER's order totals over the trailing calendar window —
    the value-bounded frame q49's ROWS window can't express (frames
    grow/shrink with order density, and ORDER BY peers share a frame).
    One customer exchange; each bucket sorts once by (cust, date) and
    resolves both frame edges per row with per-customer searchsorted
    (lo = first date >= d-30d, hi = last PEER — side='right' includes
    same-date ties exactly like RANGE CURRENT ROW). Sums are exact
    int64 cents, so the windowed avg is the same sum/100.0/n double on
    both sides regardless of DuckDB's segment-tree merge order.
    Contract: non-NULL orderkey/custkey/orderdate, finite totalprice."""
    P = 16
    delta = np.int64(days) * 86_400_000_000

    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "dus": pa.array([], pa.int64()),
                   "okey": pa.array([], pa.int64()),
                   "cents": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderdate" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                          pc.is_valid(t.column("o_custkey"))),
            pc.and_kleene(pc.is_valid(t.column("o_orderdate")),
                          pc.fill_null(pc.is_finite(
                              t.column("o_totalprice")), False)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        cust = t2.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        return pa.table({
            "cust": pa.array(cust),
            "dus": t2.column("o_orderdate").cast(pa.int64()),
            "okey": pc.cast(t2.column("o_orderkey"), pa.int64()),
            "cents": pa.array(cents),
            "bucket": pa.array(np.abs(cust) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"o_orderkey": pd.Series(dtype="int64"),
                "n_w": pd.Series(dtype="int64"),
                "w_avg": pd.Series(dtype="float64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        cust = df["cust"].to_numpy(np.int64)
        dus = df["dus"].to_numpy(np.int64)
        order = np.lexsort((dus, cust))
        cust, dus = cust[order], dus[order]
        okey = df["okey"].to_numpy(np.int64)[order]
        cents = df["cents"].to_numpy(np.int64)[order]
        pref = np.concatenate(([0], np.cumsum(cents)))
        # per-customer segments; frame edges via slice searchsorted
        seg = np.flatnonzero(np.concatenate(
            ([True], cust[1:] != cust[:-1], [True])))
        lo = np.empty(len(cust), np.int64)
        hi = np.empty(len(cust), np.int64)
        for s, e in zip(seg[:-1], seg[1:]):
            d = dus[s:e]
            lo[s:e] = s + np.searchsorted(d, d - delta, side="left")
            hi[s:e] = s + np.searchsorted(d, d, side="right")
        n = hi - lo
        w_sum = pref[hi] - pref[lo]
        return pd.DataFrame({
            "o_orderkey": okey, "n_w": n,
            "w_avg": round_away(w_sum / 100.0 / n, 6)})

    tagged = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                             "n_w": pd.Series(dtype="int64"),
                             "w_avg": pd.Series(dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    out["n_w"] = out["n_w"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_daily_interp(sf_dir: str) -> pd.DataFrame:
    """Linear interpolation onto the dense daily spine — the
    gap-filling twin of q145's LOCF: missing days between the first
    and last observed day get the straight-line value between their
    surrounding observations (sensor/timeseries repair before any
    seasonal model). Reuses the shared counts-per-day exchange
    (``_daily_rev_cents``, exact-int cents); the spine fill runs
    vectorized on the O(#days) driver fold. The interpolation is the
    SAME expression as the SQL twin — (pv + (nv-pv)*(day-pd)/(nd-pd))
    / 100.0 with every term an exact int64 before the one double
    division — so values are bit-identical."""
    d = _daily_rev_cents(sf_dir)
    empty = pd.DataFrame({"day": pd.Series(dtype="int64"),
                          "rev": pd.Series(dtype="float64"),
                          "interpolated": pd.Series(dtype="bool")})
    if d.empty:
        return empty
    days = d["day"].to_numpy(np.int64)
    revc = d["revc"].to_numpy(np.int64)
    spine = np.arange(days[0], days[-1] + 1, dtype=np.int64)
    # index of the previous known day (>= for knowns), next known day
    iprev = np.searchsorted(days, spine, side="right") - 1
    inext = np.searchsorted(days, spine, side="left")
    known = days[iprev] == spine
    pd_, nd_ = days[iprev], days[np.minimum(inext, days.size - 1)]
    pv, nv = revc[iprev], revc[np.minimum(inext, days.size - 1)]
    rev = np.where(
        known, revc[iprev] / 100.0,
        (pv + (nv - pv) * (spine - pd_)
         / (nd_ - pd_).astype(np.float64)) / 100.0)
    return pd.DataFrame({"day": spine,
                         "rev": round_away(rev, 6),
                         "interpolated": ~known})


def q_theilsen_slope(sf_dir: str) -> pd.DataFrame:
    """Theil–Sen robust trend estimate over daily revenue: the MEDIAN
    of all pairwise slopes (rev_j - rev_i)/(day_j - day_i), i<j — the
    outlier-resistant alternative to q92's least-squares family. One
    counts-per-day exchange; the O(#days²) pairwise slopes run
    vectorized on the driver fold (#days, not #orders — at 100 TB the
    day domain is still calendar-bounded). Every slope is one double
    division of exact int64 cents/day deltas, and the median is the
    quantile_cont(0.5) interpolation v0*(1-f)+v1*f in DuckDB's own op
    order. Zero/one observed days → the SQL ungrouped-aggregate row
    (n_pairs=0, slope NULL)."""
    d = _daily_rev_cents(sf_dir)
    one = pd.DataFrame({"n_pairs": pd.array([0], "int64"),
                        "slope": pd.array([np.nan], "float64")})
    if len(d) < 2:
        return one
    days = d["day"].to_numpy(np.int64)
    revc = d["revc"].to_numpy(np.int64)
    n = days.size
    # anchor-sliced fill (no O(m)-pair triu index materialization) +
    # partition selection instead of a full sort — the med needs two
    # order stats, not an ordering
    m = n * (n - 1) // 2
    s = np.empty(m)
    pos = 0
    for i in range(n - 1):
        cnt = n - 1 - i
        s[pos:pos + cnt] = (revc[i + 1:] - revc[i]) \
            / (days[i + 1:] - days[i]).astype(np.float64)
        pos += cnt
    rn = (s.size - 1) * 0.5
    i0 = int(np.floor(rn))
    i1 = int(np.ceil(rn))
    s.partition([i0, i1])
    med = s[i0] if i0 == i1 else s[i0] * 0.5 + s[i1] * 0.5
    return pd.DataFrame({"n_pairs": pd.array([int(s.size)], "int64"),
                         "slope": round_away(np.array([med]), 9)})


def q_mase(sf_dir: str, season: int = 7) -> pd.DataFrame:
    """Forecast-accuracy evaluation: MASE of the seasonal-naive
    forecast (ŷ_t = y_{t-7}) against the one-step naive baseline
    (ŷ_t = y_{t-1}) over daily revenue — the metric layer a forecast
    pipeline runs after q214's decomposition. Lags are CALENDAR days
    (a gap in the series drops the pair, matching the oracle's
    day-interval self-join, q199 rule). Absolute errors are exact
    int64 cents; the two means and their ratio are the only doubles,
    in the oracle's own op order (sum/n each, then one divide). Empty
    lag sets → SQL NULL mean → NaN ratio, still one output row."""
    d = _daily_rev_cents(sf_dir)
    one_cols = {"n_seasonal": pd.array([0], "int64"),
                "n_naive": pd.array([0], "int64"),
                "mase": pd.array([np.nan], "float64")}
    if d.empty:
        return pd.DataFrame(one_cols)
    days = d["day"].to_numpy(np.int64)
    revc = d["revc"].to_numpy(np.int64)

    def lag_abs_errors(lag: int) -> np.ndarray:
        j = np.searchsorted(days, days - lag)
        ok = (days[np.minimum(j, days.size - 1)] == days - lag)
        a = revc[ok]
        b = revc[np.minimum(j, days.size - 1)[ok]]
        return np.abs(a - b)
    e7 = lag_abs_errors(season)
    e1 = lag_abs_errors(1)
    mase = np.nan
    if e7.size and e1.size:
        mase = (float(e7.sum()) / e7.size) / (float(e1.sum()) / e1.size)
    return pd.DataFrame({"n_seasonal": pd.array([int(e7.size)], "int64"),
                         "n_naive": pd.array([int(e1.size)], "int64"),
                         "mase": round_away(np.array([mase]), 6)})


def q_winsorized_mean(sf_dir: str, lo_f: float = 0.05,
                      hi_f: float = 0.95) -> pd.DataFrame:
    """Winsorized mean of value per event_type — q124's robust-mean
    sibling that CLAMPS the tails to the quantile_cont bounds instead
    of dropping them (every row keeps its vote, outliers lose their
    magnitude). Same one-shuffle grouped shape and NULL/NaN contract
    as q124; a NaN bound (an inf−inf interpolation) disables that
    side's clamp exactly like SQL's CASE comparison with NULL/NaN
    going false — so an all-but-untouched group still averages its
    raw values on both sides."""
    from .relational import (_drop_null_nan_values, _null_safe_keys,
                             _quantile_cont, _restore_null_keys)

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    _WE = pa.table({"event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "w_mean": pa.array([], pa.float64())})

    def winsor(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(
            zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return _WE
        vs = np.sort(v)
        lo = _quantile_cont(vs, lo_f)
        hi = _quantile_cont(vs, hi_f)
        w = v.copy()
        if not np.isnan(lo):
            w[v < lo] = lo
        if not np.isnan(hi):
            w[v > hi] = hi
        return pa.table({
            "event_type": pa.array([t.column("event_type")[0].as_py()],
                                   pa.string()),
            "n": pa.array([len(w)], pa.int64()),
            "w_mean": pa.array([float(round_away(
                np.array(w.sum() / len(w)), 4)[()])], pa.float64())})

    out = (_null_safe_keys(ds.map_batches(_drop_null_nan_values,
                                          batch_format="pyarrow"),
                           ["event_type"])
           .groupby("event_type")
           .map_groups(winsor, batch_format="pyarrow").to_pandas())
    out = _with_cols(out, {"event_type": "object",
                           "n": "int64", "w_mean": "float64"})
    out = _restore_null_keys(out, ["event_type"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type",
                           na_position="last").reset_index(drop=True)


def q_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Change-data-capture diff between two snapshots of the event
    stream — the old/new reconciliation report every incremental
    pipeline runs: the stream splits at its midpoint timestamp
    (cut = floor((min+max)/2), both sides in the same float-floor op
    order), each user's row count is compared across the halves, and
    the user is classified added / removed / changed / same. Pass 1 is
    a two-scalar min/max fold over block refs; pass 2 is one user
    exchange of per-batch (user, n_old, n_new) combiner rows — at
    100 TB the exchange carries users × blocks rows, never events.
    Contract: NULL ts rows are outside both snapshots; NULL user_id
    rows are not entities (SQL WHERE on both sides)."""
    import ray

    P = 16
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    refs = ds.materialize().to_arrow_refs()

    @ray.remote
    def mmx(t: pa.Table):
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return None
        us = t.filter(pc.is_valid(t.column("ts"))).column("ts")
        if len(us) == 0:
            return None
        v = us.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return int(v.min()), int(v.max())

    spans = [s for s in ray.get([mmx.remote(r) for r in refs]) if s]
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "n_old": pd.Series(dtype="int64"),
                          "n_new": pd.Series(dtype="int64"),
                          "status": pd.Series(dtype="object")})
    if not spans:
        return empty
    mn = min(s[0] for s in spans)
    mx = max(s[1] for s in spans)
    cut = int(np.floor((mn + mx) / 2.0))

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "n_old": pa.array([], pa.int64()),
                   "n_new": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        old = us < cut
        u, inv = np.unique(uid, return_inverse=True)
        n_old = np.zeros(u.size, np.int64)
        n_new = np.zeros(u.size, np.int64)
        np.add.at(n_old, inv, old)
        np.add.at(n_new, inv, ~old)
        return pa.table({"user": pa.array(u),
                         "n_old": pa.array(n_old),
                         "n_new": pa.array(n_new),
                         "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"user": pd.Series(dtype="int64"),
                                 "n_old": pd.Series(dtype="int64"),
                                 "n_new": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("user", as_index=False)
                .agg(n_old=("n_old", "sum"), n_new=("n_new", "sum")))

    tagged = [(r, ()) for r in refs]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    if not parts:
        return empty
    g = pd.concat(parts, ignore_index=True)
    no = g["n_old"].to_numpy(np.int64)
    nn = g["n_new"].to_numpy(np.int64)
    status = np.where(no == 0, "added",
                      np.where(nn == 0, "removed",
                               np.where(no != nn, "changed", "same")))
    out = pd.DataFrame({"user_id": g["user"].to_numpy(np.int64),
                        "n_old": no, "n_new": nn, "status": status})
    return out.sort_values("user_id").reset_index(drop=True)


def q_late_events(sf_dir: str, lateness_hours: int = 1) -> pd.DataFrame:
    """Streaming-semantics audit: how many events arrive LATE — with
    an event time more than ``lateness_hours`` behind the running
    watermark (max event time seen over all strictly-preceding rows in
    INGEST order = event_id) — the allowed-lateness accounting every
    event-time streaming system does before dropping data. One
    Dataset.sort on (event_id, ts, type-hex) is the only all-to-all
    (full tie-break chain: tied ids may differ in type, and the hex
    key keeps byte order through the sort — NULL types ride the 'zz'
    NULLS-LAST sentinel); per-block running maxes then chain through
    a driver-folded carry (q216's block-offset discipline — P ints,
    never rows) and each block counts its own late rows per type. The
    late test is ``us + L < wm`` on exact int64 µs (same rewrite in
    the oracle — no subtraction from the int64-min carry sentinel)."""
    import ray

    L = np.int64(lateness_hours) * 3_600_000_000
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        E = pa.table({"idf": pa.array([], pa.int64()),
                      "us": pa.array([], pa.int64()),
                      "thex": pa.array([], pa.string()),
                      "tnull": pa.array([], pa.bool_())})
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return E
        keep = pc.and_kleene(pc.is_valid(t.column("event_id")),
                             pc.is_valid(t.column("ts")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        typ = t2.column("event_type").to_pylist()
        return pa.table({
            "idf": pc.cast(t2.column("event_id"), pa.int64()),
            "us": pc.cast(t2.column("ts"), pa.int64()),
            "thex": pa.array(
                ["zz" if s is None
                 else s.encode("utf-8", "surrogatepass").hex()
                 for s in typ], pa.string()),
            "tnull": pa.array([s is None for s in typ])})

    srt = (ds.map_batches(prep, batch_format="pyarrow")
           .sort(["idf", "us", "thex"]).materialize())
    refs = srt.to_arrow_refs()

    @ray.remote
    def block_max(t: pa.Table) -> int:
        if t.num_rows == 0:
            return np.iinfo(np.int64).min
        return int(t.column("us").to_numpy(zero_copy_only=False).max())

    maxes = ray.get([block_max.remote(r) for r in refs])
    carries = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(np.asarray(maxes, np.int64))[:-1]))

    @ray.remote
    def late_counts(t: pa.Table, carry: int) -> pd.DataFrame:
        cols = {"thex": pd.Series(dtype="object"),
                "tnull": pd.Series(dtype="bool"),
                "n": pd.Series(dtype="int64"),
                "n_late": pd.Series(dtype="int64")}
        if t.num_rows == 0:
            return pd.DataFrame(cols)
        us = t.column("us").to_numpy(zero_copy_only=False)
        run = np.maximum.accumulate(us)
        wm = np.concatenate(
            ([carry], np.maximum(run[:-1],
                                 np.int64(carry)))).astype(np.int64)
        late = (us + L) < wm
        df = pd.DataFrame({"thex": t.column("thex").to_pylist(),
                           "tnull": t.column("tnull").to_numpy(
                               zero_copy_only=False),
                           "late": late})
        g = df.groupby("thex", as_index=False).agg(
            tnull=("tnull", "first"), n=("late", "size"),
            n_late=("late", "sum"))
        g["n"] = g["n"].astype("int64")
        g["n_late"] = g["n_late"].astype("int64")
        return g

    parts = [p for p in ray.get(
        [late_counts.remote(r, int(c))
         for r, c in zip(refs, carries)]) if len(p)]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_events": pd.Series(dtype="int64"),
                          "n_late": pd.Series(dtype="int64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    g = (allp.groupby("thex", as_index=False)
         .agg(tnull=("tnull", "first"), n=("n", "sum"),
              n_late=("n_late", "sum"))
         .sort_values("thex"))  # hex keys sort by byte order, zz last
    src = [None if nn else bytes.fromhex(h).decode("utf-8",
                                                   "surrogatepass")
           for h, nn in zip(g["thex"], g["tnull"])]
    return pd.DataFrame({
        "event_type": pd.Series(src, dtype=object),
        "n_events": g["n"].to_numpy(np.int64),
        "n_late": g["n_late"].to_numpy(np.int64)}).reset_index(
        drop=True)


def q_calibration_curve(sf_dir: str, k: int = 10,
                        target: str = "purchase") -> pd.DataFrame:
    """Model-calibration (reliability) curve — the eval every scored
    dataset gets before its scores are trusted: rows are deciled by
    the score (ntile(10) ORDER BY value, event_id — exact SQL tiling
    via ``_ntile_of_ranks``) and each decile reports its size, mean
    score and positive rate (event_type == target). One Dataset.sort
    is the only all-to-all; global ranks come from block offsets
    (q216 discipline) and each block emits per-decile (n, Σscore,
    n_pos) partials — the driver folds P·k rows. Positive rates are
    exact-int ratios; the mean score is the lone float fold (round6,
    continuous data). Contract: finite value, non-NULL event_id."""
    import ray

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        E = pa.table({"idf": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64()),
                      "pos": pa.array([], pa.bool_())})
        if t.num_rows == 0 or "value" not in t.schema.names:
            return E
        keep = pc.and_kleene(
            pc.is_valid(t.column("event_id")),
            pc.fill_null(pc.is_finite(t.column("value")), False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return E
        return pa.table({
            "idf": pc.cast(t2.column("event_id"), pa.int64()),
            "v": pc.cast(t2.column("value"), pa.float64()),
            "pos": pc.fill_null(pc.equal(t2.column("event_type"),
                                         target), False)})

    srt = (ds.map_batches(prep, batch_format="pyarrow")
           .sort(["v", "idf"]).materialize())
    refs = srt.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    n = int(sum(counts))
    empty = pd.DataFrame({"decile": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "mean_score": pd.Series(dtype="float64"),
                          "pos_rate": pd.Series(dtype="float64")})
    if n == 0:
        return empty
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def partial(t: pa.Table, off: int) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"decile": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "p": pd.Series(dtype="int64")})
        ranks = off + np.arange(t.num_rows, dtype=np.int64)
        tile = _ntile_of_ranks(ranks, n, k)
        v = t.column("v").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        u, inv = np.unique(tile, return_inverse=True)
        return pd.DataFrame({
            "decile": u,
            "n": np.bincount(inv).astype(np.int64),
            "s": np.bincount(inv, weights=v),
            "p": np.bincount(inv, weights=pos).astype(np.int64)})

    parts = [p for p in ray.get(
        [partial.remote(r, int(o))
         for r, o in zip(refs, offs)]) if len(p)]
    g = (pd.concat(parts, ignore_index=True)
         .groupby("decile", as_index=False)
         .agg(n=("n", "sum"), s=("s", "sum"), p=("p", "sum")))
    nn = g["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "decile": g["decile"].to_numpy(np.int64),
        "n": nn,
        "mean_score": round_away(
            g["s"].to_numpy(np.float64) / nn, 6),
        "pos_rate": round_away(
            g["p"].to_numpy(np.float64) / nn, 6)})


def q_itemsets3(sf_dir: str, topk: int = 20) -> pd.DataFrame:
    """Frequent 3-ITEMSETS with lift — the Apriori step above q207's
    pairs (rule mining needs the triple supports before it can score
    A,B→C rules): top-k part triples by support, ties by keys, with
    lift = sup·N² / (s_a·s_b·s_c). Stage 1 is q207's orderkey
    exchange; triples are generated VECTORIZED per basket-size class
    (baskets group by size, one fancy-index gather per class applies
    the C(s,3) index LUT — no per-order Python loop; basket sizes are
    bounded by the order's line count). Triple keys pack 3×21 bits
    (part dim < 2^21 by contract — beyond it the same plan runs on a
    (a,b,c) column triple with lexsort run-length counting). Stage 2
    routes triple partials by key hash; each bucket sums supports and
    returns its LOCAL top-k, driver folds P·k rows. All lift math is
    exact int64 (< 2^53) → one double division, bit-identical."""
    import ray

    from itertools import combinations

    from .pairs import mix64

    P = 16
    B21 = np.uint64(21)
    lim21 = np.int64(1) << np.int64(21)

    _E1 = pa.table({"okey": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64())})

    def split1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return _E1
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_partkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E1
        g = (pa.table({"okey": pc.cast(t2.column("l_orderkey"),
                                       pa.int64()),
                       "part": pc.cast(t2.column("l_partkey"),
                                       pa.int64())})
             .group_by(["okey", "part"]).aggregate([]))
        return pa.table({"okey": g.column("okey"),
                         "part": g.column("part"),
                         "bucket": pc.bit_wise_and(g.column("okey"),
                                                   P - 1)})

    def merge1(*tabs) -> pa.Table:
        E = pa.table({"kind": pa.array([], pa.int8()),
                      "key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return E
        df = (pa.concat_tables(live).to_pandas().drop_duplicates()
              .sort_values(["okey", "part"]))
        ok = df["okey"].to_numpy(np.int64)
        pt = df["part"].to_numpy(np.int64)
        if len(pt) and (pt.min() < 0 or pt.max() >= int(lim21)):
            raise ValueError("partkey outside [0, 2^21) triple-"
                             "packing domain")
        starts = np.flatnonzero(np.concatenate(
            ([True], ok[1:] != ok[:-1])))
        lens = np.diff(np.concatenate((starts, [len(ok)])))
        keys = []
        for s in np.unique(lens[lens >= 3]):
            sel = starts[lens == s]
            M = pt[sel[:, None] + np.arange(s)]       # (m, s) sorted
            lut = np.array(list(combinations(range(int(s)), 3)))
            T = M[:, lut]                             # (m, C(s,3), 3)
            T = T.reshape(-1, 3).astype(np.uint64)
            keys.append(((T[:, 0] << (B21 * np.uint64(2)))
                         | (T[:, 1] << B21)
                         | T[:, 2]).view(np.int64))
        up, icnt = np.unique(pt, return_counts=True)
        n_orders = int(np.unique(ok).size)
        if keys:
            uk, cnt = np.unique(np.concatenate(keys),
                                return_counts=True)
        else:
            uk = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(uk.size, np.int8),
                 np.ones(up.size, np.int8),
                 np.full(1, 2, np.int8)])),
            "key": pa.array(np.concatenate(
                [uk, up, np.zeros(1, np.int64)])),
            "n": pa.array(np.concatenate(
                [cnt.astype(np.int64), icnt.astype(np.int64),
                 np.full(1, n_orders, np.int64)]))})

    tagged = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey"]).to_arrow_refs()]
    s1 = hash_shuffle(tagged, split1, merge1, P=P, gather=False)
    s1_tabs = ray.get(list(s1))
    empty = pd.DataFrame({"pa_key": pd.Series(dtype="int64"),
                          "pb_key": pd.Series(dtype="int64"),
                          "pc_key": pd.Series(dtype="int64"),
                          "sup": pd.Series(dtype="int64"),
                          "lift": pd.Series(dtype="float64")})
    live = [t for t in s1_tabs if t.num_rows]
    if not live:
        return empty
    cat = pa.concat_tables(live).to_pandas()
    items = cat[cat["kind"] == 1].groupby("key")["n"].sum()
    N = int(cat[cat["kind"] == 2]["n"].sum())
    bc = ray.put((items.index.to_numpy(np.int64),
                  items.to_numpy(np.int64), N))

    def split2(t: pa.Table) -> pa.Table:
        E = pa.table({"key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return E
        d = t.to_pandas()
        d = d[d["kind"] == 0]
        if d.empty:
            return E
        key = d["key"].to_numpy(np.int64)
        return pa.table({"key": pa.array(key),
                         "n": pa.array(d["n"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (mix64(key) & np.uint64(P - 1))
                             .astype(np.int64))})

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return empty.copy()
        ik, isup, n_all = ray.get(bc) if isinstance(
            bc, ray.ObjectRef) else bc
        df = (pa.concat_tables(live).to_pandas()
              .groupby("key", as_index=False).agg(n=("n", "sum")))
        key = df["key"].to_numpy(np.int64).view(np.uint64)
        sup = df["n"].to_numpy(np.int64)
        ua = (key >> (B21 * np.uint64(2))).astype(np.int64)
        ub = ((key >> B21) & np.uint64(int(lim21) - 1)).astype(
            np.int64)
        uc = (key & np.uint64(int(lim21) - 1)).astype(np.int64)
        sa = isup[np.searchsorted(ik, ua)]
        sb = isup[np.searchsorted(ik, ub)]
        sc = isup[np.searchsorted(ik, uc)]
        # same op order as the oracle: (sup·N·N) int64-exact, one
        # double division by ((sa·sb) int64 · double(sc))
        lift = (sup * n_all * n_all).astype(np.float64) \
            / ((sa * sb).astype(np.float64) * sc.astype(np.float64))
        order = np.lexsort((uc, ub, ua, -sup))[:topk]
        return pd.DataFrame({"pa_key": ua[order], "pb_key": ub[order],
                             "pc_key": uc[order], "sup": sup[order],
                             "lift": lift[order]})

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in s1], split2, merge2, P=P) if len(p)]
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    order = np.lexsort((allp["pc_key"], allp["pb_key"],
                        allp["pa_key"], -allp["sup"]))[:topk]
    out = allp.iloc[order].reset_index(drop=True)
    out["lift"] = round_away(out["lift"].to_numpy(np.float64), 6)
    for c in ("pa_key", "pb_key", "pc_key", "sup"):
        out[c] = out[c].astype("int64")
    return out


def q_js_divergence(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift metric: Jensen–Shannon divergence between
    the WEEKDAY and WEEKEND event-type distributions — the bounded,
    symmetric KL the drift monitors actually use (0 = identical
    mixes, ln2 = disjoint). One (type, is_weekend) counts exchange
    (partial per batch — the wire sees types × batches); the JS sum
    runs over the type domain on the driver in the oracle's own
    term order (p·ln(p/m), zero-probability terms drop). Weekend =
    epoch-day mod 7 ∈ {2, 3} (day 0 = Thu 1970-01-01); the mod is
    FLOORED on both sides so pre-1970 rows land on the same weekday
    (CLAUDE.md negative-% rule). NULL type is a category; NULL ts
    rows are out."""
    from .pairs import factorize_strings

    P = 8

    _E = pa.table({"typ": pa.array([], pa.string()),
                   "tnull": pa.array([], pa.bool_()),
                   "wk": pa.array([], pa.bool_()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, 86_400_000_000)
        wk = np.isin(np.mod(day, 7), (2, 3))
        typ = pd.Series(t2.column("event_type").to_pylist(),
                        dtype=object)
        codes, uniq = factorize_strings(typ, use_na_sentinel=False)
        uniq = [None if u is None or (isinstance(u, float)
                                      and np.isnan(u)) else u
                for u in uniq]
        key = codes * 2 + wk
        u, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        tc = (u // 2).astype(np.int64)
        return pa.table({
            "typ": pa.array([uniq[c] if uniq[c] is not None else ""
                             for c in tc], pa.string()),
            "tnull": pa.array([uniq[c] is None for c in tc]),
            "wk": pa.array((u % 2).astype(bool)),
            "n": pa.array(n),
            "bucket": pa.array(tc % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"typ": pd.Series(dtype="object"),
                "tnull": pd.Series(dtype="bool"),
                "wk": pd.Series(dtype="bool"),
                "n": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        key = df["typ"].where(~df["tnull"].to_numpy(bool), None)
        codes, uniq = factorize_strings(key, use_na_sentinel=False)
        g = (df.assign(tc=codes)
             .groupby(["tc", "wk"], as_index=False).agg(n=("n", "sum")))
        uniq = [None if u is None or (isinstance(u, float)
                                      and np.isnan(u)) else u
                for u in uniq]
        return pd.DataFrame({
            "typ": pd.Series([uniq[c] if uniq[c] is not None else ""
                              for c in g["tc"]], dtype=object),
            "tnull": [uniq[c] is None for c in g["tc"]],
            "wk": g["wk"].astype(bool),
            "n": g["n"].astype("int64")})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events", columns=["event_type", "ts"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    one = pd.DataFrame({"n_weekday": pd.array([0], "int64"),
                        "n_weekend": pd.array([0], "int64"),
                        "js": pd.array([np.nan], "float64")})
    if not parts:
        return one
    allp = pd.concat(parts, ignore_index=True)
    key = allp["typ"].where(~allp["tnull"].to_numpy(bool), None)
    codes, uniq = factorize_strings(key, use_na_sentinel=False)
    T = len(uniq)
    cwd = np.zeros(T, np.int64)
    cwe = np.zeros(T, np.int64)
    wk = allp["wk"].to_numpy(bool)
    nn = allp["n"].to_numpy(np.int64)
    np.add.at(cwd, codes[~wk], nn[~wk])
    np.add.at(cwe, codes[wk], nn[wk])
    n1 = int(cwd.sum())
    n2 = int(cwe.sum())
    if n1 == 0 or n2 == 0:
        return pd.DataFrame({"n_weekday": pd.array([n1], "int64"),
                             "n_weekend": pd.array([n2], "int64"),
                             "js": pd.array([np.nan], "float64")})
    # oracle term order: p = c/n per side, m = (p+q)/2, p·ln(p/m)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = cwd / float(n1)
        q = cwe / float(n2)
        m = (p + q) / 2.0
        tp = np.where(p > 0, p * np.log(p / m), 0.0)
        tq = np.where(q > 0, q * np.log(q / m), 0.0)
    js = 0.5 * float(tp.sum()) + 0.5 * float(tq.sum())
    return pd.DataFrame({"n_weekday": pd.array([n1], "int64"),
                         "n_weekend": pd.array([n2], "int64"),
                         "js": round_away(np.array([js]), 6)})


def q_hill_tail_index(sf_dir: str, k: int = 500) -> pd.DataFrame:
    """Hill estimator of the power-law tail index of order totals —
    the heavy-tail screen run before trusting any mean-based metric
    (α ≤ 2 means the variance doesn't exist): α = 1 + k / Σ ln(xᵢ/x_k)
    over the k largest values. Distributed top-k WITHOUT a global
    sort: each block emits its local (value, orderkey)-ordered top-k
    combiner, the driver folds blocks×k rows and takes the exact
    top-k (deterministic tie-break by orderkey). The log-sum runs in
    the oracle's own op order (one ln per row against the k-th
    value); an all-tied tail (Σ = 0) → SQL NULL → NaN. Contract:
    finite positive totals, non-NULL orderkey."""
    import ray

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    _E = pa.table({"x": pa.array([], pa.float64()),
                   "okey": pa.array([], pa.int64())})

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(
                pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                             False),
                pc.fill_null(pc.greater(t.column("o_totalprice"),
                                        pa.scalar(0.0)), False)),
            pc.is_valid(t.column("o_orderkey")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        x = np.asarray(t2.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        okey = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((okey, -x))[:k]
        return pa.table({"x": pa.array(x[order]),
                         "okey": pa.array(okey[order])})

    parts = (ds.map_batches(local_topk, batch_format="pyarrow")
             .to_pandas())
    one = pd.DataFrame({"k": pd.array([0], "int64"),
                        "alpha": pd.array([np.nan], "float64")})
    if parts.empty:
        return one
    x = parts["x"].to_numpy(np.float64)
    okey = parts["okey"].to_numpy(np.int64)
    order = np.lexsort((okey, -x))[:k]
    x = x[order]
    xk = x[-1]
    lsum = float(np.log(x / xk).sum())
    alpha = 1.0 + x.size / lsum if lsum > 0 else np.nan
    return pd.DataFrame({"k": pd.array([int(x.size)], "int64"),
                         "alpha": round_away(np.array([alpha]), 6)})


def q_eventually_follows(sf_dir: str) -> pd.DataFrame:
    """Process-mining eventually-follows matrix — the relation behind
    every process-discovery algorithm (q116's transition counts are
    DIRECTLY-follows; this is the transitive version): for each
    ordered type pair (A, B), how many users have SOME A event before
    SOME B event — equivalently min_ts(A) < max_ts(B) per user, an
    O(types²) test over the per-user (type, min, max) summary, never
    the event pairs. One user exchange of per-batch (user, type, min,
    max) combiners; each bucket folds its users' type summaries and
    emits per-pair counts on factorized codes (NUL-safe); the driver
    sums a types² frame. Contract: non-NULL user/ts/type."""
    from .pairs import factorize_strings

    P = 16

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "mn": pa.array([], pa.int64()),
                   "mx": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("user_id")),
                          pc.is_valid(t.column("ts"))),
            pc.is_valid(t.column("event_type")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        typ = pd.Series(t2.column("event_type").to_pylist(),
                        dtype=object)
        codes, uniq = factorize_strings(typ)
        key = pd.DataFrame({"u": uid, "c": codes, "us": us})
        g = key.groupby(["u", "c"], as_index=False).agg(
            mn=("us", "min"), mx=("us", "max"))
        u = g["u"].to_numpy(np.int64)
        return pa.table({
            "user": pa.array(u),
            "typ": pa.array([uniq[c] for c in g["c"]], pa.string()),
            "mn": pa.array(g["mn"].to_numpy(np.int64)),
            "mx": pa.array(g["mx"].to_numpy(np.int64)),
            "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"type_a": pd.Series(dtype="object"),
                "type_b": pd.Series(dtype="object"),
                "n_users": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["typ"])
        g = (df.assign(c=codes)
             .groupby(["user", "c"], as_index=False)
             .agg(mn=("mn", "min"), mx=("mx", "max")))
        T = len(uniq)
        cnt = np.zeros((T, T), np.int64)
        u = g["user"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        mn = g["mn"].to_numpy(np.int64)
        mx = g["mx"].to_numpy(np.int64)
        seg = np.flatnonzero(np.concatenate(
            ([True], u[1:] != u[:-1], [True])))
        for s, e in zip(seg[:-1], seg[1:]):
            cc, mm, xx = c[s:e], mn[s:e], mx[s:e]
            # pair (a, b): some a before some b ⇔ mn_a < mx_b
            hit = mm[:, None] < xx[None, :]
            np.fill_diagonal(hit, False)
            ia, ib = np.nonzero(hit)
            np.add.at(cnt, (cc[ia], cc[ib]), 1)
        ia, ib = np.nonzero(cnt)
        return pd.DataFrame({
            "type_a": pd.Series([uniq[i] for i in ia], dtype=object),
            "type_b": pd.Series([uniq[i] for i in ib], dtype=object),
            "n_users": cnt[ia, ib]})

    tagged = [(r, ()) for r in _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_type"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"type_a": pd.Series(dtype="object"),
                          "type_b": pd.Series(dtype="object"),
                          "n_users": pd.Series(dtype="int64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    from .pairs import coded_keys
    cj, restore = coded_keys(allp, ["type_a", "type_b"])
    out = restore(cj.groupby(["type_a", "type_b"], as_index=False)
                  .agg(n_users=("n_users", "sum")))
    out["n_users"] = out["n_users"].astype("int64")
    ka = out["type_a"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    kb = out["type_b"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    order = pd.DataFrame({"a": ka, "b": kb}).sort_values(
        ["a", "b"]).index
    return out.loc[order].reset_index(drop=True)


def _survival_hist(sf_dir: str, B: int = 32) -> pd.DataFrame | None:
    """Shared first stage of the survival estimators (KM q257,
    Nelson–Aalen q290): hours-to-first-purchase duration histogram
    (h, m=at-risk entries, d=deaths), right-censored at the user's
    last event. Per-batch per-user (min ts, max ts, min purchase ts)
    partials → one user-keyed raw-task exchange → per-bucket duration
    histogram, so the driver folds hours × buckets tiny rows, never
    users. Returns the h-ascending histogram, or None on empty
    input."""
    HOUR = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "st": pa.array([], pa.int64()),
                   "la": pa.array([], pa.int64()),
                   "pt": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        if not pc.all(keep).as_py():
            t = t.filter(keep)
        if t.num_rows == 0:
            return _E
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        is_p = pc.fill_null(
            pc.equal(t.column("event_type"), "purchase"),
            False).to_numpy(zero_copy_only=False)
        pt = np.where(is_p, ts, _IMAX)
        g = (pd.DataFrame({"u": uid, "st": ts, "la": ts, "pt": pt})
             .groupby("u", sort=False)
             .agg(st=("st", "min"), la=("la", "max"), pt=("pt", "min"))
             .reset_index())
        u = g["u"].to_numpy(np.int64)
        return pa.table({"user_id": pa.array(u),
                         "st": pa.array(g["st"].to_numpy(np.int64)),
                         "la": pa.array(g["la"].to_numpy(np.int64)),
                         "pt": pa.array(g["pt"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (u % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "m": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        t = pa.concat_tables(live).to_pandas()
        g = (t.groupby("user_id", sort=False)
             .agg(st=("st", "min"), la=("la", "max"), pt=("pt", "min")))
        obs = g["pt"].to_numpy(np.int64) != _IMAX
        end = np.where(obs, g["pt"].to_numpy(np.int64),
                       g["la"].to_numpy(np.int64))
        h = (end - g["st"].to_numpy(np.int64)) // HOUR
        hist = (pd.DataFrame({"h": h, "m": 1,
                              "d": obs.astype(np.int64)})
                .groupby("h", as_index=False).sum())
        return hist

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    if not parts:
        return None
    return (pd.concat(parts, ignore_index=True)
            .groupby("h", as_index=False).sum()
            .sort_values("h").reset_index(drop=True))


def q_kaplan_meier(sf_dir: str) -> pd.DataFrame:
    """Kaplan–Meier survival curve of hours-to-first-purchase, the
    product-limit estimator every churn/retention analysis starts
    from: per user, duration = first 'purchase' ts − first event ts,
    right-CENSORED at the user's last event when no purchase exists.
    Distributed via ``_survival_hist`` (user exchange → duration
    histogram). S(h) = Π_{h'≤h} (1 − d/n_risk) runs as a sequential
    cumprod ascending h — the exact op order of the oracle's windowed
    ``product()`` — with n_risk the reverse running sum of m (deaths
    and same-hour censored both count as at-risk, the standard KM tie
    convention). Durations are ≥ 0 by construction so the hour bin's
    truncating ``//`` equals floor even for pre-1970 timestamps. Rows
    with a NULL user_id or ts are out of contract on both sides; a
    NULL event_type simply never matches 'purchase'."""
    g = _survival_hist(sf_dir)
    if g is None:
        return pd.DataFrame({"h": pd.Series(dtype="int64"),
                             "n_risk": pd.Series(dtype="int64"),
                             "d": pd.Series(dtype="int64"),
                             "surv": pd.Series(dtype="float64")})
    m = g["m"].to_numpy(np.int64)
    d = g["d"].to_numpy(np.int64)
    n_risk = np.cumsum(m[::-1])[::-1]
    surv = np.cumprod(1.0 - d.astype(np.float64) / n_risk)
    keep = d > 0
    return pd.DataFrame({
        "h": g["h"].to_numpy(np.int64)[keep],
        "n_risk": n_risk[keep].astype(np.int64),
        "d": d[keep],
        "surv": round_away(surv[keep], 6)})


def q_nelson_aalen(sf_dir: str) -> pd.DataFrame:
    """Nelson–Aalen cumulative hazard over the same
    hours-to-first-purchase durations as q257's Kaplan–Meier: H(h) =
    Σ_{h'≤h} d/n_risk, plus the Breslow/Fleming–Harrington survival
    transform S(h) = exp(−H(h)) — the estimator of choice when the
    hazard itself (conversion intensity per hour at risk) is the
    quantity of interest. Reuses ``_survival_hist``'s user exchange +
    duration histogram, so the driver only folds the tiny
    (hour, m, d) table. The hazard sum runs as a sequential
    ``np.cumsum`` ascending h — the oracle's cumulative windowed
    ``sum() OVER (ORDER BY h)`` streams in the same order, and the
    d = 0 rows contribute an exact 0.0 on both sides. exp() is then
    applied to bit-identical H values. NULL contract identical to
    q257."""
    g = _survival_hist(sf_dir)
    if g is None:
        return pd.DataFrame({"h": pd.Series(dtype="int64"),
                             "n_risk": pd.Series(dtype="int64"),
                             "d": pd.Series(dtype="int64"),
                             "cumhaz": pd.Series(dtype="float64"),
                             "surv_na": pd.Series(dtype="float64")})
    m = g["m"].to_numpy(np.int64)
    d = g["d"].to_numpy(np.int64)
    n_risk = np.cumsum(m[::-1])[::-1]
    cumhaz = np.cumsum(d.astype(np.float64) / n_risk)
    keep = d > 0
    return pd.DataFrame({
        "h": g["h"].to_numpy(np.int64)[keep],
        "n_risk": n_risk[keep].astype(np.int64),
        "d": d[keep],
        "cumhaz": round_away(cumhaz[keep], 6),
        "surv_na": round_away(np.exp(-cumhaz[keep]), 6)})


def q_quadratic_fit(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag QUADRATIC least-squares fit of extendedprice on
    (quantity, quantity²) — the 2-feature normal-equations twin of
    q92's simple regression (SQL has no regr_* for more than one
    regressor, so the oracle solves the same 2×2 system from
    var_pop/covar_pop). One streaming pass of per-batch per-group
    CENTERED moment partials (Chan's parallel merge — q92's rule: raw
    Σx² cancels catastrophically), exchange sees flags × batches rows.
    Rank guard: the Vandermonde system is singular iff the group has
    < 3 DISTINCT quantities, an EXACT integer condition mirrored on
    both sides (a float det≈0 test would diverge in the last ulp) —
    partials carry the first 3 distinct quantity values per group so
    the merged distinct count saturates at 3. Non-finite or NULL
    (quantity, price) pairs are masked INSIDE the aggregate (DuckDB
    var_pop raises on NaN/±inf); the group row itself still surfaces
    with n=0 and NULL coefficients, like SQL GROUP BY."""
    from .pairs import factorize_strings

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    _M = ("n", "m1", "m2", "my", "s11", "s12", "s22", "c1", "c2",
          "q_a", "q_b", "q_c")
    _EMPTY = pa.table({"flag": pa.array([], pa.string()),
                       **{c: pa.array([], pa.float64()) for c in _M}})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_returnflag" not in t.schema.names:
            return _EMPTY
        ok = pc.and_(
            pc.fill_null(pc.is_finite(t.column("l_quantity")), False),
            pc.fill_null(pc.is_finite(t.column("l_extendedprice")),
                         False))
        df = pd.DataFrame({
            "flag": t.column("l_returnflag").to_pandas(),
            "q": t.column("l_quantity").to_numpy(zero_copy_only=False),
            "y": t.column("l_extendedprice").to_numpy(
                zero_copy_only=False),
            "ok": ok.to_numpy(zero_copy_only=False)})

        def mom(g: pd.DataFrame) -> pd.Series:
            g = g[g["ok"]]
            base = {c: 0.0 for c in _M}
            base.update({"q_a": np.nan, "q_b": np.nan, "q_c": np.nan})
            if not len(g):
                return pd.Series(base)
            x1 = g["q"].to_numpy(np.float64)
            x2 = x1 * x1
            y = g["y"].to_numpy(np.float64)
            m1, m2, my = x1.mean(), x2.mean(), y.mean()
            d1, d2, dy = x1 - m1, x2 - m2, y - my
            dq = np.unique(x1)[:3]
            return pd.Series({
                "n": float(len(x1)), "m1": m1, "m2": m2, "my": my,
                "s11": float(d1 @ d1), "s12": float(d1 @ d2),
                "s22": float(d2 @ d2), "c1": float(d1 @ dy),
                "c2": float(d2 @ dy),
                "q_a": dq[0] if dq.size > 0 else np.nan,
                "q_b": dq[1] if dq.size > 1 else np.nan,
                "q_c": dq[2] if dq.size > 2 else np.nan})

        codes, uniq = factorize_strings(df["flag"],
                                        use_na_sentinel=False)
        g = (df.assign(_c=codes).groupby("_c")
             .apply(mom, include_groups=False).reset_index())
        g["flag"] = uniq.to_numpy()[g["_c"].to_numpy()]
        return pa.table({"flag": pa.Array.from_pandas(
                             g["flag"], type=pa.string()),
                         **{c: pa.array(g[c].to_numpy()
                                        .astype(np.float64))
                            for c in _M}})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"flag": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "b1": pd.Series(dtype="float64"),
            "b2": pd.Series(dtype="float64"),
            "icept": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)

    def chan2(g: pd.DataFrame) -> pd.Series:
        n = m1 = m2 = my = s11 = s12 = s22 = c1 = c2 = 0.0
        dq: set = set()
        for r in g.itertuples(index=False):
            for v in (r.q_a, r.q_b, r.q_c):
                if v == v and len(dq) < 3:
                    dq.add(v)
            nb = r.n
            if nb == 0.0:
                continue
            if n == 0.0:
                n, m1, m2, my = nb, r.m1, r.m2, r.my
                s11, s12, s22, c1, c2 = r.s11, r.s12, r.s22, r.c1, r.c2
                continue
            tot = n + nb
            e1, e2, ey = r.m1 - m1, r.m2 - m2, r.my - my
            w = n * nb / tot
            s11 += r.s11 + e1 * e1 * w
            s12 += r.s12 + e1 * e2 * w
            s22 += r.s22 + e2 * e2 * w
            c1 += r.c1 + e1 * ey * w
            c2 += r.c2 + e2 * ey * w
            m1 += e1 * nb / tot
            m2 += e2 * nb / tot
            my += ey * nb / tot
            n = tot
        return pd.Series({"n": n, "m1": m1, "m2": m2, "my": my,
                          "s11": s11, "s12": s12, "s22": s22,
                          "c1": c1, "c2": c2, "ndist": float(len(dq))})

    pcodes, puniq = factorize_strings(parts["flag"],
                                      use_na_sentinel=False)
    m = (parts.assign(_c=pcodes).groupby("_c")
         .apply(chan2, include_groups=False).reset_index())
    m["flag"] = puniq.to_numpy()[m["_c"].to_numpy()]
    n = m["n"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        # population (÷n) moments — the oracle's var_pop/covar_pop
        v11, v12, v22 = (m["s11"].to_numpy() / n,
                         m["s12"].to_numpy() / n,
                         m["s22"].to_numpy() / n)
        g1, g2 = m["c1"].to_numpy() / n, m["c2"].to_numpy() / n
        det = v11 * v22 - v12 * v12
        b1 = (v22 * g1 - v12 * g2) / det
        b2 = (v11 * g2 - v12 * g1) / det
        icept = (m["my"].to_numpy() - b1 * m["m1"].to_numpy()
                 - b2 * m["m2"].to_numpy())
    full_rank = m["ndist"].to_numpy() >= 3.0
    b1 = np.where(full_rank, b1, np.nan)
    b2 = np.where(full_rank, b2, np.nan)
    icept = np.where(full_rank, icept, np.nan)
    out = pd.DataFrame({"flag": m["flag"],
                        "n": n.astype(np.int64),
                        "b1": round_away(b1, 6),
                        "b2": round_away(b2, 6),
                        "icept": round_away(icept, 6)})
    out["flag"] = out["flag"].astype(object).where(
        out["flag"].notna(), None)
    return out.reset_index(drop=True)


def q_markov_stationary(sf_dir: str, iters: int = 12) -> pd.DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    by power iteration — 12 unnormalized steps of d·P from a uniform
    start over source types, then one final L1 normalization (leak
    through sink types is linear, so normalizing once at the end is
    EXACTLY the per-step-renormalized direction). The transition
    counts come from the same distributed exchange as q116 (computed
    fresh here — the (src,dst,n) matrix is types² rows at any corpus
    scale, so the iteration itself is driver-side by design); the
    oracle is a recursive CTE running the identical join-aggregate
    recursion. Types that appear only as destinations hold an all-zero
    row (their mass vanishes next step), mirroring the SQL join
    dropping them; if every reachable type is a sink the recursion
    dries up before step 12 and BOTH sides return zero rows. Float op
    order differs between np.dot and SQL's join-sum only in the last
    ulp per step; round(…, 6) absorbs 12 steps of it."""
    from .relational import q_event_transitions

    cols = {"event_type": pd.Series(dtype="object"),
            "prob": pd.Series(dtype="float64")}
    tm = q_event_transitions(sf_dir)
    if tm.empty:
        return pd.DataFrame(cols)
    types = sorted({*tm["src"], *tm["dst"]})
    idx = {t: i for i, t in enumerate(types)}  # Python str hash is
    k = len(types)                             # full-bytes (NUL-safe)
    P = np.zeros((k, k), np.float64)
    si = np.fromiter((idx[s] for s in tm["src"]), np.int64,
                     len(tm))
    di = np.fromiter((idx[t] for t in tm["dst"]), np.int64,
                     len(tm))
    np.add.at(P, (si, di), tm["n"].to_numpy(np.float64))
    row = P.sum(axis=1)          # integer-valued: exact in any order
    has_out = row > 0
    W = np.divide(P, row[:, None], out=np.zeros_like(P),
                  where=has_out[:, None])
    n_src = int(has_out.sum())
    d = np.where(has_out, 1.0 / n_src, 0.0)
    for _ in range(iters):
        d = d @ W
        if not d.any():
            return pd.DataFrame(cols)
    tot = float(d.sum())
    nz = d > 0
    out = pd.DataFrame({
        "event_type": pd.Series([types[i] for i in
                                 np.flatnonzero(nz)], dtype=object),
        "prob": round_away(d[nz] / tot, 6)})
    return out.reset_index(drop=True)


def q_sax_symbols(sf_dir: str) -> pd.DataFrame:
    """SAX symbolization of the daily-revenue series — the discretized
    representation behind classic time-series indexing/motif search:
    z-normalize the per-day order revenue and map each day to a
    4-letter alphabet via the standard Gaussian breakpoints
    (±0.6744897501960817, 0 — the N(0,1) quartiles). Reuses the
    exact-cents counts-per-day exchange (q199's helper): the wide work
    is the day groupby; the z-scoring touches only the ~#days series.
    Parity: cents sums and the constant-series mean are EXACT integers
    on both sides, so sd == 0.0 is an exact flag (whole-series NULL
    symbols, float64 column like a DuckDB all-NULL BIGINT); breakpoint
    comparisons sit on continuous revenue z-scores where the two
    sides' last-ulp sd difference is measure-zero."""
    BP = np.array([-0.6744897501960817, 0.0, 0.6744897501960817])
    d = _daily_rev_cents(sf_dir)
    if d.empty:
        return pd.DataFrame({"day": pd.Series(dtype="int64"),
                             "sym": pd.Series(dtype="int64")})
    days = d["day"].to_numpy(np.int64)
    x = d["revc"].to_numpy(np.float64)
    mu = x.sum() / x.size  # exact-int sum below 2^53, like SQL avg
    sd = float(np.sqrt(np.mean((x - mu) ** 2)))
    if sd == 0.0:
        return pd.DataFrame({"day": days,
                             "sym": np.full(days.size, np.nan)})
    z = (x - mu) / sd
    # CASE z < b0 → 0 | z < b1 → 1 | z < b2 → 2 | else 3
    sym = np.searchsorted(BP, z, side="right").astype(np.int64)
    return pd.DataFrame({"day": days, "sym": sym})


def q_holt_linear(sf_dir: str) -> pd.DataFrame:
    """Holt double-exponential smoothing of daily revenue (level +
    trend, 7-day-ahead forecast) — the simplest trend-aware
    forecaster. Classic sequential recurrence: s_t = αy_t +
    (1−α)(s_{t−1}+b_{t−1}), b_t = β(s_t−s_{t−1}) + (1−β)b_{t−1},
    s₁ = y₁, b₁ = y₂−y₁. The wide work is the exact-cents per-day
    exchange (q199's helper); the recursion itself is inherently
    sequential over the ~#days series, so it runs driver-side — and
    the oracle runs the IDENTICAL recursion as a recursive CTE joining
    the row_number'd series, so every +/× happens in the same IEEE
    order on both sides (round 6 is belt-and-braces). The coefficients
    are LITERALS mirrored in the SQL text: 1.0 − 0.3 differs from the
    literal 0.7 by one ulp and the drift compounds over thousands of
    steps on 1e8-magnitude cents. Needs ≥ 2 days; otherwise zero rows
    on both sides."""
    A, OMA, B, OMB = 0.5, 0.5, 0.3, 0.7  # = the oracle's literals
    cols = {"n": pd.Series(dtype="int64"),
            "level": pd.Series(dtype="float64"),
            "trend": pd.Series(dtype="float64"),
            "forecast7": pd.Series(dtype="float64")}
    d = _daily_rev_cents(sf_dir)
    if len(d) < 2:
        return pd.DataFrame(cols)
    y = d.sort_values("day")["revc"].to_numpy(np.float64)
    s = y[0]
    b = y[1] - y[0]
    for t in range(1, y.size):
        s_new = A * y[t] + OMA * (s + b)
        b = B * (s_new - s) + OMB * b
        s = s_new
    return pd.DataFrame({
        "n": pd.array([y.size], "int64"),
        "level": round_away(np.array([s]), 6),
        "trend": round_away(np.array([b]), 6),
        "forecast7": round_away(np.array([s + 7.0 * b]), 6)})


def q_page_hinkley(sf_dir: str) -> pd.DataFrame:
    """Page–Hinkley-style maximum-RISE statistic over daily revenue —
    the one-sided upward-shift detector: with deviation walk m_t =
    S_t − t·μ (cumulative cents minus the no-change line), PH =
    max_t (m_t − min_{i≤t} m_i), the walk's largest climb from any
    earlier trough. Complements q213's CUSUM (which takes max |m_t|
    directly — a different extremum of the same walk). Deliberately
    uses the GLOBAL mean, not the textbook running mean: S_t and t·μ
    are the same exact-int → float64 single ops on both sides (q213's
    rule), whereas a running-mean walk accumulates through DuckDB's
    windowed tree-sum in a different op order and drifts past the
    rounding boundary at 1e9 magnitudes (measured). The min-prefix and
    argmax then compare bit-identical floats; the day exchange is the
    wide work, the ~#days scan is driver-side. Zero days → zero rows
    on both sides."""
    cols = {"n": pd.Series(dtype="int64"),
            "ph_max": pd.Series(dtype="float64"),
            "day": pd.Series(dtype="int64")}
    d = _daily_rev_cents(sf_dir)
    if d.empty:
        return pd.DataFrame(cols)
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    n = days.size
    cum = np.cumsum(rev)
    tot = int(cum[-1])
    k = np.arange(1, n + 1, dtype=np.int64)
    mt = cum.astype(np.float64) - (k * tot).astype(np.float64) / n
    ph = mt - np.minimum.accumulate(mt)
    i = int(np.lexsort((days, -ph))[0])
    return pd.DataFrame({"n": pd.array([n], "int64"),
                         "ph_max": round_away(np.array([ph[i]]), 6),
                         "day": pd.array([days[i]], "int64")})


def q_psi_value_drift(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index of the event-value distribution,
    weekend vs weekday — the model-monitoring staple (PSI > 0.2 ⇒
    investigate): decile edges come from the WEEKDAY (reference) side
    via exact distributed order statistics (`relational.
    _grouped_order_stats`, the q61/q99 rank-refinement machinery — no
    global sort), using DuckDB's quantile_disc rank rule index =
    ceil(p·n)−1 (probed exhaustively n ≤ 5000); a second streamed pass
    bins BOTH sides against the broadcast edges (edges are actual data
    values, so the ≥-comparisons are bit-exact). Emits one row per
    decile bin with counts and its PSI term (p−q)·ln(p/q), NULL when
    either side's bin is empty (the SQL convention — summing non-NULL
    terms gives the headline PSI). Weekday parity uses q248's
    floored-mod day rule; non-finite values and NULL ts are out of
    contract on both sides. Zero reference rows → zero rows."""
    import math

    import ray

    from .relational import _grouped_order_stats

    PS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    cols = {"bin": pd.Series(dtype="int64"),
            "n_ref": pd.Series(dtype="int64"),
            "n_cur": pd.Series(dtype="int64"),
            "term": pd.Series(dtype="float64")}

    _E = pa.table({"event_type": pa.array([], pa.string()),
                   "value": pa.array([], pa.float64())})

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("ts")),
                       pc.fill_null(pc.is_finite(t.column("value")),
                                    False))
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, 86_400_000_000)
        wk = np.isin(np.mod(day, 7), (2, 3))
        return pa.table({
            "event_type": pa.array(np.where(wk, "cur", "ref")),
            "value": pa.array(t2.column("value").to_numpy(
                zero_copy_only=False).astype(np.float64))})

    ds = (_read(sf_dir, "events", columns=["ts", "value"])
          .map_batches(tag, batch_format="pyarrow").materialize())

    def ranks_of(name, counts):
        if name != "ref":
            return []
        n = counts[0]
        return sorted({min(n - 1, max(0, math.ceil(p * n) - 1))
                       for p in PS})

    counts, values = _grouped_order_stats(ds, ranks_of)
    n_ref = counts.get("ref", (0,))[0]
    if n_ref == 0:
        return pd.DataFrame(cols)
    n_cur = counts.get("cur", (0,))[0]
    edges = np.array(
        [values[("ref", min(n_ref - 1, max(0, math.ceil(p * n_ref)
                                           - 1)))]
         for p in PS], np.float64)

    def bin_counts(t: pa.Table, ed: np.ndarray):
        out = np.zeros((2, 10), np.int64)
        if t.num_rows == 0 or "value" not in t.schema.names:
            return out
        v = t.column("value").to_numpy(zero_copy_only=False)
        cur = np.array([s == "cur" for s in
                        t.column("event_type").to_pylist()])
        b = np.searchsorted(ed, v, side="right")  # = #edges ≤ v
        np.add.at(out[0], b[~cur], 1)
        np.add.at(out[1], b[cur], 1)
        return out

    eref = ray.put(edges)
    tot = sum(ray.get([ray.remote(bin_counts).remote(r, eref)
                       for r in ds.to_arrow_refs()]))
    nr, nc = tot[0], tot[1]
    with np.errstate(invalid="ignore", divide="ignore"):
        p = nr / float(n_ref)
        q = nc / float(n_cur) if n_cur else np.full(10, np.nan)
        term = np.where((nr > 0) & (nc > 0),
                        (p - q) * np.log(p / q), np.nan)
    return pd.DataFrame({"bin": np.arange(10, dtype=np.int64),
                         "n_ref": nr, "n_cur": nc,
                         "term": round_away(term, 6)})


def q_user_erasure_audit(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Right-to-be-forgotten cascade audit for the MOST ACTIVE user —
    the compliance dry-run every deletion pipeline needs: how many
    rows would an erasure of user u touch across the three linked
    tables (events by user_id, orders by custkey, lineitems by the
    victim's orderkeys). Three stages, each the scale-appropriate
    shape: (1) argmax user via per-batch count partials through a
    user-keyed raw-task exchange with per-bucket top-1 (driver folds P
    candidates, never the user dimension); (2) the victim's orders by
    predicate-pushdown read (one customer — a few rows is the
    contract); (3) lineitem membership count with the broadcast
    orderkey set via vectorized ``pc.is_in`` per batch. Ties break to
    the smallest user_id; empty events → zero rows on both sides."""
    import ray

    cols = {"user_id": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "n_orders": pd.Series(dtype="int64"),
            "n_lineitems": pd.Series(dtype="int64")}

    _E = pa.table({"u": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("user_id")))
        if t2.num_rows == 0:
            return _E
        u, c = np.unique(t2.column("user_id").cast(pa.int64())
                         .to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"u": pa.array(u),
                         "n": pa.array(c.astype(np.int64)),
                         "bucket": pa.array(u % P)})

    def merge(*tabs):
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return None
        df = (pa.concat_tables(live).to_pandas()
              .groupby("u", as_index=False)["n"].sum())
        i = np.lexsort((df["u"].to_numpy(), -df["n"].to_numpy()))[0]
        return int(df["u"].iloc[i]), int(df["n"].iloc[i])

    cands = [c for c in hash_shuffle(
        [(r, ()) for r in _read(
            sf_dir, "events", columns=["user_id"]).to_arrow_refs()],
        split, merge, P=P) if c is not None]
    if not cands:
        return pd.DataFrame(cols)
    victim, n_events = min(cands, key=lambda c: (-c[1], c[0]))

    import os

    import pyarrow.dataset as pads

    ot = pads.dataset(os.path.join(sf_dir, "orders.parquet")).to_table(
        filter=pc.field("o_custkey") == victim,
        columns=["o_orderkey"])
    okeys = ot.column("o_orderkey").drop_null()
    n_orders = ot.num_rows
    kref = ray.put(okeys)

    def li_count(t: pa.Table, keys) -> int:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return 0
        return int(pc.sum(pc.is_in(t.column("l_orderkey"),
                                   value_set=keys).cast(pa.int8()))
                   .as_py() or 0)

    n_li = sum(ray.get([ray.remote(li_count).remote(r, kref)
                        for r in _read(
                            sf_dir, "lineitem",
                            columns=["l_orderkey"]).to_arrow_refs()]))
    return pd.DataFrame({"user_id": pd.array([victim], "int64"),
                         "n_events": pd.array([n_events], "int64"),
                         "n_orders": pd.array([n_orders], "int64"),
                         "n_lineitems": pd.array([n_li], "int64")})


def q_decayed_type_scores(sf_dir: str) -> pd.DataFrame:
    """Exponentially time-decayed event-type frequency (half-life
    7 days, anchored at the corpus max ts) — the recency-weighted
    heavy-hitter score streaming rankers keep instead of raw counts.
    Two passes: a max-ts fold (one scalar per block), then per-batch
    per-type partial sums of 2^((t−t_max)/H) — each term is the
    identical pow() on both sides; only the summation order differs
    (round 6; scores are O(n) bounded and continuous). NULL ts rows
    are out of contract; a NULL event_type is its own SQL group."""
    import ray

    from .pairs import factorize_strings

    H = 604_800_000_000.0  # 7 days in µs
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64")}
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    refs = ds.to_arrow_refs()

    def block_max(t: pa.Table):
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return None
        m = pc.max(t.column("ts").cast(pa.int64()))
        return m.as_py()

    maxes = [m for m in ray.get(
        [ray.remote(block_max).remote(r) for r in refs])
        if m is not None]
    if not maxes:
        return pd.DataFrame(cols)
    tmax = max(maxes)

    def partial(t: pa.Table, tm: int) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64())})
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return empty
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return empty
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        w = np.power(2.0, (us - tm) / H)
        typ = pd.Series(t2.column("event_type").to_pylist(),
                        dtype=object)
        codes, uniq = factorize_strings(typ, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq))
        s = np.bincount(codes, weights=w, minlength=len(uniq))
        return pa.table({
            "event_type": pa.Array.from_pandas(
                pd.Series(np.asarray(uniq, dtype=object)),
                type=pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "s": pa.array(s)})

    parts = [p for p in ray.get(
        [ray.remote(partial).remote(r, tmax) for r in refs])
        if p.num_rows]
    if not parts:
        return pd.DataFrame(cols)
    df = pa.concat_tables(parts).to_pandas()
    codes, uniq = factorize_strings(df["event_type"],
                                    use_na_sentinel=False)
    g = (df.assign(_c=codes).groupby("_c")[["n", "s"]]
         .sum().reset_index())
    out = pd.DataFrame({
        "event_type": pd.Series(uniq.to_numpy()[g["_c"].to_numpy()],
                                dtype=object),
        "n": g["n"].to_numpy(np.int64),
        "score": round_away(g["s"].to_numpy(np.float64), 6)})
    out["event_type"] = out["event_type"].astype(object).where(
        out["event_type"].notna(), None)
    key = out["event_type"].map(
        lambda s: "" if s is None else "1" + s.encode(
            "utf-8", "surrogatepass").hex())
    return out.loc[key.sort_values().index].reset_index(drop=True)


def q_holt_backtest(sf_dir: str, n_origins: int = 8) -> pd.DataFrame:
    """Rolling-origin backtest of the q267 Holt forecaster — the
    honest way to score a forecasting rule: refit on each expanding
    window ending at the last ``n_origins`` days, forecast one step,
    and report the mean absolute error. The oracle runs the SAME
    multi-track recursion (one recursive CTE carrying (origin, i, s,
    b) state per origin — each track stops at its own horizon), with
    the q267 literal-coefficient rule; the engine's per-origin driver
    recursions touch only the ~#days cents series from one exchange.
    |error| terms are identical doubles; only the 8-term MAE sum
    order differs (round 6, 1e-8 abs noise on 1e8 magnitudes).
    Origins need ≥ 2 history points; fewer than one usable origin →
    zero rows on both sides."""
    A, OMA, B, OMB = 0.5, 0.5, 0.3, 0.7
    cols = {"n_origins": pd.Series(dtype="int64"),
            "mae": pd.Series(dtype="float64")}
    d = _daily_rev_cents(sf_dir)
    n = len(d)
    if n < 3:
        return pd.DataFrame(cols)
    y = d.sort_values("day")["revc"].to_numpy(np.float64)
    errs = []
    for origin in range(max(2, n - n_origins), n):
        s = y[0]
        b = y[1] - y[0]
        for t in range(1, origin):
            s_new = A * y[t] + OMA * (s + b)
            b = B * (s_new - s) + OMB * b
            s = s_new
        errs.append(abs((s + b) - y[origin]))
    if not errs:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n_origins": pd.array([len(errs)], "int64"),
        "mae": round_away(np.array([float(np.mean(errs))]), 6)})


def q_binary_segmentation(sf_dir: str) -> pd.DataFrame:
    """Binary-segmentation changepoint detection on daily revenue —
    the recursive step every multi-changepoint method builds on q213's
    single CUSUM: find the global max-deviation day, split there, and
    report each half's own best candidate (rank 1 = global, 2 = left
    half, 3 = right half). All statistics stay in q213's exact-int
    form (prefix cents − k·segment-total/m as one int→float op chain),
    so argmax ordering is bit-deterministic against the oracle's
    windowed integer sums; the day exchange is the wide work and the
    ~#days recursion is driver-side. A half with no rows emits no
    candidate; fewer than 2 days → zero rows."""
    cols = {"rank": pd.Series(dtype="int64"),
            "day": pd.Series(dtype="int64"),
            "stat": pd.Series(dtype="float64")}
    d = _daily_rev_cents(sf_dir)
    n = len(d)
    if n < 2:
        return pd.DataFrame(cols)
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)

    def best(lo: int, hi: int):
        """argmax of |S_k − k·S/m| within rows [lo, hi) (exact-int →
        float ops in the oracle's order); None when empty."""
        m = hi - lo
        if m < 1:
            return None
        seg = rev[lo:hi]
        cum = np.cumsum(seg)
        tot = int(cum[-1])
        k = np.arange(1, m + 1, dtype=np.int64)
        stat = np.abs(cum.astype(np.float64)
                      - (k * tot).astype(np.float64) / m)
        i = int(np.lexsort((days[lo:hi], -stat))[0])
        return lo + i, float(stat[i])

    g = best(0, n)
    rows = [{"rank": 1, "day": int(days[g[0]]), "stat": g[1]}]
    split = g[0] + 1  # left = rows 1..k (inclusive of the cp day)
    left = best(0, split)
    if left is not None:
        rows.append({"rank": 2, "day": int(days[left[0]]),
                     "stat": left[1]})
    right = best(split, n)
    if right is not None:
        rows.append({"rank": 3, "day": int(days[right[0]]),
                     "stat": right[1]})
    out = pd.DataFrame(rows)
    out["rank"] = out["rank"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    out["stat"] = round_away(out["stat"].to_numpy(np.float64), 6)
    return out


def q_did_estimate(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences around the detected changepoint —
    the causal-inference primitive layered on q213's CUSUM: split the
    daily series at the max-deviation day (pre ≤ cp < post), treat
    weekend days (q248's floored-mod rule) as the treated group and
    weekdays as control, and report DiD = (ȳ_we,post − ȳ_we,pre) −
    (ȳ_wd,post − ȳ_wd,pre). Every mean is an exact-int cents sum over
    one division, so both sides compute identical doubles and the
    composition is exact (round 6 is belt-and-braces). Any empty cell
    → SQL NULL mean → NULL DiD; fewer than 2 days → zero rows."""
    cols = {"cp_day": pd.Series(dtype="int64"),
            "did": pd.Series(dtype="float64")}
    d = _daily_rev_cents(sf_dir)
    n = len(d)
    if n < 2:
        return pd.DataFrame(cols)
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    cum = np.cumsum(rev)
    tot = int(cum[-1])
    k = np.arange(1, n + 1, dtype=np.int64)
    stat = np.abs(cum.astype(np.float64)
                  - (k * tot).astype(np.float64) / n)
    cp = int(np.lexsort((days, -stat))[0])
    post = np.arange(n) > cp
    weekend = np.isin(np.mod(days, 7), (2, 3))

    def cell_mean(mask: np.ndarray) -> float:
        if not mask.any():
            return np.nan
        return float(int(rev[mask].sum()) / int(mask.sum()))

    m_we_post = cell_mean(weekend & post)
    m_we_pre = cell_mean(weekend & ~post)
    m_wd_post = cell_mean(~weekend & post)
    m_wd_pre = cell_mean(~weekend & ~post)
    did = (m_we_post - m_we_pre) - (m_wd_post - m_wd_pre)
    return pd.DataFrame({
        "cp_day": pd.array([int(days[cp])], "int64"),
        "did": round_away(np.array([did]), 6)})


def q_ewma_chart(sf_dir: str) -> pd.DataFrame:
    """EWMA control chart over daily revenue — the process-monitoring
    chart next to the moving-range chart (q202) and CUSUM (q213):
    s₁ = y₁, s_t = 0.25·y_t + 0.75·s_{t−1}, residual r_t = y_t −
    s_{t−1}, flagged when |r_t| > 3σ with σ the population std of the
    daily series. The wide work is the exact-cents per-day exchange
    (q199's helper); the recursion is inherently sequential over the
    ~#days series and runs driver-side, mirrored by the oracle's
    recursive CTE so every +/× happens in the same IEEE order (q267's
    rule: the 0.25/0.75 coefficients are LITERALS in both texts — and
    exactly representable, so no ulp drift even in principle). σ comes
    from EXACT integer power sums accumulated as Python ints (no
    int64 overflow on squared 1e9-cent days) with the one
    cast-to-double per operand in the oracle's own op order. Zero
    days → zero rows on both sides."""
    A, OMA = 0.25, 0.75  # = the oracle's literals (binary-exact)
    cols = {"day": pd.Series(dtype="int64"),
            "revc": pd.Series(dtype="int64"),
            "ewma": pd.Series(dtype="float64"),
            "resid": pd.Series(dtype="float64"),
            "viol": pd.Series(dtype="int64")}
    d = _daily_rev_cents(sf_dir)
    if d.empty:
        return pd.DataFrame(cols)
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    y = rev.astype(np.float64)
    n = y.size
    s1 = int(rev.sum())
    s2 = sum(int(v) * int(v) for v in rev.tolist())
    sigma = float(np.sqrt(float(n * s2 - s1 * s1) / float(n * n)))
    ewma = np.empty(n, np.float64)
    resid = np.empty(n, np.float64)
    ewma[0], resid[0] = y[0], 0.0
    for t in range(1, n):
        resid[t] = y[t] - ewma[t - 1]
        ewma[t] = A * y[t] + OMA * ewma[t - 1]
    return pd.DataFrame({
        "day": days,
        "revc": rev,
        "ewma": round_away(ewma, 6),
        "resid": round_away(resid, 6),
        "viol": (np.abs(resid) > 3.0 * sigma).astype(np.int64)})


def q_target_encoding(sf_dir: str, m: float = 20.0) -> pd.DataFrame:
    """Smoothed target encoding of order priority — the categorical
    feature-engineering primitive: enc(c) = (Σy_c + m·ȳ) / (n_c + m),
    the per-category target mean shrunk toward the global mean by a
    pseudo-count m=20 (James–Stein style; raw means of rare levels
    leak noise). Targets ride as EXACT cents ints in per-batch
    per-priority (n, Σ) partials folded driver-side as Python ints;
    the global mean and each encoding then apply one cast-to-double
    per operand in the oracle's literal op order, so every float is
    bit-identical. NULL priority IS a group (SQL GROUP BY), carried
    on NUL-safe codes; non-finite prices are excluded on both
    sides."""
    from .pairs import factorize_strings

    _E = pa.table({"pri": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "s": pa.array([], pa.int64())})
    _NULL = "\x00NULLPRI"

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        keep = pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                            False)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        pri = pd.Series(t2.column("o_orderpriority").to_pylist(),
                        dtype=object)
        keyed = pri.where(pri.isna(), "P" + pri).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        s = np.zeros(k, np.int64)
        np.add.at(s, codes, cents)
        return pa.table({"pri": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "s": pa.array(s)})

    parts = _read(sf_dir, "orders",
                  columns=["o_orderpriority", "o_totalprice"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"priority": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "mean_cents": pd.Series(dtype="float64"),
            "enc_cents": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["pri"],
                                    use_na_sentinel=False)
    k = len(uniq)
    n = [0] * k
    s = [0] * k
    for c, nn, ss in zip(codes, parts["n"].tolist(),
                         parts["s"].tolist()):
        n[c] += nn                     # Python-int fold: exact
        s[c] += ss
    tot_n = sum(n)
    tot_s = sum(s)
    g = float(tot_s) / tot_n
    order = sorted(range(k),           # SQL ORDER BY priority NULLS LAST
                   key=lambda i: (uniq[i] == _NULL, uniq[i]))
    out_p, out_n, out_m, out_e = [], [], [], []
    for i in order:
        key = uniq[i]
        out_p.append(None if key == _NULL else key[1:])
        out_n.append(n[i])
        out_m.append(float(s[i]) / n[i])
        out_e.append((float(s[i]) + m * g) / (n[i] + m))
    return pd.DataFrame({
        "priority": pd.Series(out_p, dtype=object),
        "n": pd.array(out_n, "int64"),
        "mean_cents": round_away(np.array(out_m, np.float64), 6),
        "enc_cents": round_away(np.array(out_e, np.float64), 6)})


def q_split_leakage(sf_dir: str, train_frac: float = 0.8,
                    P: int = 32) -> pd.DataFrame:
    """Train/test split leakage audit — the data-hygiene check every
    eval pipeline needs: an 80/20 ROW-level split (the md5(event_id)
    coin at a 52-bit exact threshold, q297's rule — deterministic
    under any partitioning) leaks users across the boundary, and this
    op counts exactly how badly: users present in train, in test, and
    in BOTH (the leaked set a group-aware split would empty). One
    user-keyed raw-task exchange of per-batch (user, saw_train,
    saw_test) OR-partials; each bucket counts its users' side
    membership, the driver folds P count-rows. All outputs exact ints
    but the one share division. NULL event_id or user_id rows are out
    of contract on both sides."""
    import hashlib

    from .pairs import hash_shuffle

    TWO52 = 4503599627370496.0
    thr = int(np.floor(train_frac * TWO52))

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "tr": pa.array([], pa.int64()),
                   "te": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("event_id")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t2.column("event_id").to_pylist()
        is_tr = np.array(
            [int(hashlib.md5(str(e).encode()).hexdigest()[:13], 16)
             < thr for e in eid], bool)
        g = (pd.DataFrame({"u": uid, "tr": is_tr, "te": ~is_tr})
             .groupby("u", sort=False)
             .agg(tr=("tr", "max"), te=("te", "max")).reset_index())
        u = g["u"].to_numpy(np.int64)
        return pa.table({"user_id": pa.array(u),
                         "tr": pa.array(
                             g["tr"].to_numpy(np.int64)),
                         "te": pa.array(
                             g["te"].to_numpy(np.int64)),
                         "bucket": pa.array((u % P).astype(np.int64))})

    def merge(*tabs):
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(3, np.int64)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("user_id", sort=False)
             .agg(tr=("tr", "max"), te=("te", "max")))
        tr = g["tr"].to_numpy(np.int64)
        te = g["te"].to_numpy(np.int64)
        return np.array([int(tr.sum()), int(te.sum()),
                         int((tr & te).sum())], np.int64)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])
    tot = sum(hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                           split, merge, P=P))
    n_tr, n_te, n_both = (int(x) for x in np.atleast_1d(tot)[:3]) \
        if np.ndim(tot) else (0, 0, 0)
    n_users = n_tr + n_te - n_both
    share = np.nan if n_users == 0 \
        else float(n_both) / n_users
    if n_users == 0:
        # empty-input contract: SQL's ungrouped aggregate still emits
        # one row, with NULL sums (n_tr/n_te) but integer counts
        return pd.DataFrame({
            "n_users": pd.array([0], "int64"),
            "n_train_users": np.array([np.nan]),
            "n_test_users": np.array([np.nan]),
            "n_leaked": pd.array([0], "int64"),
            "leak_share": np.array([np.nan])})
    return pd.DataFrame({
        "n_users": pd.array([n_users], "int64"),
        "n_train_users": pd.array([n_tr], "int64"),
        "n_test_users": pd.array([n_te], "int64"),
        "n_leaked": pd.array([n_both], "int64"),
        "leak_share": round_away(np.array([share], np.float64), 6)})


def q_near_amount_pairs(sf_dir: str, eps_cents: int = 50,
                        k: int = 100, P: int = 32) -> pd.DataFrame:
    """Epsilon band-join: pairs of orders whose totals differ by at
    most eps (50 cents) — the reconciliation screen for near-miss
    duplicate invoices that q206's exact-equality test cannot see.
    The distributed shape is the classic ε-join: amounts become exact
    cents ints, each row routes to its band ⌊c/ε⌋ AND band+1 (any
    qualifying pair spans adjacent bands), and each bucket forms its
    sorted-window pairs locally — with exactly-once global counting
    via the max-band rule: a pair is emitted only in the single
    bucket hash(max(band_a, band_b)) routes to, where it is
    guaranteed present. Buckets emit local top-k by (diff, k1, k2);
    the driver folds P·k rows. The oracle runs the same predicate as
    a plain inequality join — bands are engine-internal layout, not
    semantics. Bands use FLOOR division (negative amounts stay
    adjacency-correct). NULL keys / non-finite prices are out of
    contract on both sides."""
    import ray

    from .pairs import hash_shuffle, mix64

    _E = pa.table({"c": pa.array([], pa.int64()),
                   "key": pa.array([], pa.int64()),
                   "band": pa.array([], pa.int64()),
                   "route": pa.array([], pa.int8()),
                   "bucket": pa.array([], pa.int64())})
    cols = {"k1": pd.Series(dtype="int64"),
            "k2": pd.Series(dtype="int64"),
            "diff_cents": pd.Series(dtype="int64")}

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_orderkey")),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                         False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        c = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        key = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        band = np.floor_divide(c, eps_cents)
        c2 = np.concatenate([c, c])
        k2_ = np.concatenate([key, key])
        b2 = np.concatenate([band, band])          # row's OWN band
        rt = np.concatenate([np.zeros(len(c), np.int8),
                             np.ones(len(c), np.int8)])
        dest = np.concatenate([band, band + 1])    # route band, band+1
        return pa.table({"c": pa.array(c2), "key": pa.array(k2_),
                         "band": pa.array(b2),
                         "route": pa.array(rt, pa.int8()),
                         "bucket": pa.array(
                             (mix64(dest) & np.uint64(P - 1))
                             .astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        # every routed row shares this bucket — recover the id for
        # the exactly-once max-band test below
        bucket_id = int(live[0].column("bucket")[0].as_py())
        t = pa.concat_tables(
            [x.drop_columns(["bucket"]) for x in live]).to_pandas()
        t = t.sort_values(["c", "key"]).reset_index(drop=True)
        c = t["c"].to_numpy(np.int64)
        key = t["key"].to_numpy(np.int64)
        band = t["band"].to_numpy(np.int64)
        route = t["route"].to_numpy(np.int8)
        hi = np.searchsorted(c, c + eps_cents, side="right")
        lo = np.arange(len(c)) + 1
        reps = np.maximum(hi - lo, 0)
        if not reps.sum():
            return pd.DataFrame(cols)
        a = np.repeat(np.arange(len(c)), reps)
        b = np.concatenate([np.arange(l, h) for l, h in
                            zip(lo, hi) if h > l])
        # exactly-once rule: count only where hash(max band) is
        # THIS bucket
        mx = np.maximum(band[a], band[b])
        m = ((mix64(mx) & np.uint64(P - 1)).astype(np.int64)
             == bucket_id)
        # ...and only via each row's ONE required copy (native when
        # the row sits in the max band, probe when one below) — a row
        # whose two routes hash to the same bucket must not pair
        # twice, while genuine duplicate source rows keep SQL's
        # join multiplicity
        m &= route[a] == (band[a] != mx)
        m &= route[b] == (band[b] != mx)
        m &= key[a] != key[b]      # distinct orders only
        a, b = a[m], b[m]
        if not len(a):
            return pd.DataFrame(cols)
        k1 = np.minimum(key[a], key[b])
        kk2 = np.maximum(key[a], key[b])
        diff = np.abs(c[a] - c[b])
        o = np.lexsort((kk2, k1, diff))[:k]
        return pd.DataFrame({"k1": k1[o], "k2": kk2[o],
                             "diff_cents": diff[o]})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    live = [p for p in parts if len(p)]
    if not live:
        return pd.DataFrame(cols)
    out = pd.concat(live, ignore_index=True)
    o = np.lexsort((out["k2"].to_numpy(), out["k1"].to_numpy(),
                    out["diff_cents"].to_numpy()))[:k]
    return out.iloc[o].reset_index(drop=True)


def q_daily_mix_jaccard(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Day-over-day event-type-mix similarity — the drift screen that
    catches a pipeline swapping its traffic mix overnight: weighted
    (multiset) Jaccard Σ_t min(c_d[t], c_{d−1}[t]) / Σ_t max(...)
    between each calendar day and the previous one (q264's Σmax =
    tot_a + tot_b − Σmin identity covers types present on only one
    side). One day-keyed exchange of per-batch (day, type, count)
    partials; the driver folds the tiny day×type table, builds the
    dense day-ordered count matrix on NUL-safe type codes and takes
    vectorized column mins between calendar-ADJACENT rows. All counts
    exact ints; one division per day pair. NULL event_type IS a type
    (SQL GROUP BY); NULL ts rows are excluded on both sides; days
    with no predecessor emit no row."""
    from .pairs import factorize_strings, hash_shuffle

    DAY = 86_400_000_000
    _NULL = "\x00NULLTY"

    _E = pa.table({"day": pa.array([], pa.int64()),
                   "ty": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        keyed = ty.where(ty.isna(), "T" + ty).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        g = (pd.DataFrame({"day": day, "tc": codes})
             .groupby(["day", "tc"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({
            "day": pa.array(g["day"].to_numpy(np.int64)),
            "ty": pa.array([uniq[i] for i in g["tc"]], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64)),
            "bucket": pa.array(
                (np.abs(g["day"].to_numpy(np.int64)) % P))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "ty": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"],
                                        use_na_sentinel=False)
        g = (pd.DataFrame({"day": df["day"], "tc": codes,
                           "c": df["c"]})
             .groupby(["day", "tc"], sort=False, as_index=False)
             ["c"].sum())
        g["ty"] = [uniq[i] for i in g["tc"]]
        return g[["day", "ty", "c"]]

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"day": pd.Series(dtype="int64"),
            "smin": pd.Series(dtype="int64"),
            "smax": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["ty"], use_na_sentinel=False)
    days = np.sort(df["day"].unique())
    didx = {int(d): i for i, d in enumerate(days)}
    M = np.zeros((len(days), len(uniq)), np.int64)
    np.add.at(M, (df["day"].map(didx).to_numpy(np.int64), codes),
              df["c"].to_numpy(np.int64))
    if len(days) < 2:
        return pd.DataFrame(cols)
    adj = days[1:] == days[:-1] + 1
    smin = np.minimum(M[1:], M[:-1]).sum(axis=1)[adj]
    tot = M.sum(axis=1)
    smax = (tot[1:] + tot[:-1])[adj] - smin
    return pd.DataFrame({
        "day": days[1:][adj],
        "smin": smin,
        "smax": smax,
        "jaccard": round_away(
            smin.astype(np.float64) / smax, 6)})


def _month_lag_counts(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Shared exchange of the ship-lag family (q304/q305): order→ship
    lag in whole days, counted per order MONTH. One orderkey-bucketed
    side-tagged exchange joins orders(orderkey, orderdate) to
    lineitem(orderkey, shipdate) — pandas merge inside each bucket
    reproduces SQL's inner-join fan-out under duplicate keys — and
    emits (month, lag, count) partials; the driver folds the
    months × distinct-lags counts table (the module's
    counts-per-distinct contract, q195's scale).
    Months come from calendar truncation (numpy datetime64[M] —
    pre-1970-correct, labeled as the month start's epoch day). NULL
    keys/dates drop on both sides."""
    DAY = 86_400_000_000

    _E = pa.table({"okey": pa.array([], pa.int64()),
                   "side": pa.array([], pa.int8()),
                   "d": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split_orders(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("o_orderkey")),
                             pc.is_valid(t.column("o_orderdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        k = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"okey": pa.array(k),
                         "side": pa.array(
                             np.zeros(len(k), np.int8), pa.int8()),
                         "d": pa.array(np.floor_divide(us, DAY)),
                         "bucket": pa.array((k % P).astype(np.int64))})

    def split_lines(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("l_orderkey")),
                             pc.is_valid(t.column("l_shipdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        k = t2.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"okey": pa.array(k),
                         "side": pa.array(
                             np.ones(len(k), np.int8), pa.int8()),
                         "d": pa.array(np.floor_divide(us, DAY)),
                         "bucket": pa.array((k % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"month": pd.Series(dtype="int64"),
                "lag": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        o = df[df["side"] == 0][["okey", "d"]]
        li = df[df["side"] == 1][["okey", "d"]]
        if not len(o) or not len(li):
            return pd.DataFrame(cols)
        j = li.merge(o, on="okey", suffixes=("_s", "_o"))
        if not len(j):
            return pd.DataFrame(cols)
        od = j["d_o"].to_numpy(np.int64)
        month = (od.astype("datetime64[D]").astype("datetime64[M]")
                 .astype("datetime64[D]").astype(np.int64))
        lag = j["d_s"].to_numpy(np.int64) - od
        g = (pd.DataFrame({"month": month, "lag": lag})
             .groupby(["month", "lag"], sort=False).size()
             .reset_index(name="c"))
        return g

    o_refs = [(r, ()) for r in _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate"]).to_arrow_refs()]
    l_refs = [(r, ()) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate"]).to_arrow_refs()]
    from .pairs import hash_shuffle

    def split(t: pa.Table, which: int) -> pa.Table:
        return split_orders(t) if which == 0 else split_lines(t)

    parts = [p for p in hash_shuffle(
        [(r, (0,)) for r, _ in o_refs] + [(r, (1,)) for r, _ in l_refs],
        split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"month": pd.Series(dtype="int64"),
                             "lag": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .groupby(["month", "lag"], as_index=False)["c"].sum()
            .sort_values(["month", "lag"]).reset_index(drop=True))


def q_ship_lag_percentiles(sf_dir: str) -> pd.DataFrame:
    """Monthly order→ship lag p50/p90 — the fulfillment-SLA report:
    exact discrete quantiles per order month over the joined
    orders⋈lineitem lag distribution. The lag domain is small ints,
    so the counts-per-(month, lag) exchange (``_month_lag_counts``)
    makes each month's quantile a cumsum lookup with DuckDB's
    quantile_disc rank rule index = ceil(p·n)−1 (probed, q99/q274) —
    no per-group sort, no row materialization."""
    g = _month_lag_counts(sf_dir)
    cols = {"month": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "p50": pd.Series(dtype="int64"),
            "p90": pd.Series(dtype="int64")}
    if not len(g):
        return pd.DataFrame(cols)
    out_m, out_n, p50, p90 = [], [], [], []
    for m, sub in g.groupby("month", sort=True):
        lag = sub["lag"].to_numpy(np.int64)      # sorted within month
        c = sub["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        out_m.append(int(m))
        out_n.append(n)
        for p, acc in ((0.5, p50), (0.9, p90)):
            idx = int(np.ceil(p * n)) - 1        # quantile_disc rule
            acc.append(int(lag[np.searchsorted(cum, idx,
                                               side="right")]))
    return pd.DataFrame({"month": pd.array(out_m, "int64"),
                         "n": pd.array(out_n, "int64"),
                         "p50": pd.array(p50, "int64"),
                         "p90": pd.array(p90, "int64")})


def q_late_rate_wilson(sf_dir: str,
                       late_days: int = 1095) -> pd.DataFrame:
    """Monthly late-shipment rate with a 95% Wilson score interval —
    the uncertainty-aware SLA metric (a 3-shipment month's 33% late
    rate should not outrank a 3000-shipment month's 5%): late = lag >
    3 years (this corpus's ship lags are ~1000 days); k, n are exact
    ints from the shared (month, lag) counts
    and the Wilson bounds apply the z = 1.96 literal formula in the
    oracle's exact op order, so every float is bit-identical."""
    g = _month_lag_counts(sf_dir)
    cols = {"month": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "n_late": pd.Series(dtype="int64"),
            "late_rate": pd.Series(dtype="float64"),
            "wilson_lo": pd.Series(dtype="float64"),
            "wilson_hi": pd.Series(dtype="float64")}
    if not len(g):
        return pd.DataFrame(cols)
    tot = g.groupby("month", sort=True)["c"].sum()
    late = (g[g["lag"] > late_days]
            .groupby("month", sort=True)["c"].sum()
            .reindex(tot.index, fill_value=0))
    t = pd.DataFrame({"month": tot.index.to_numpy(np.int64),
                      "n": tot.to_numpy(np.int64),
                      "k": late.to_numpy(np.int64)})
    n = t["n"].to_numpy(np.int64).astype(np.float64)
    k = t["k"].to_numpy(np.int64).astype(np.float64)
    ph = k / n
    z = 1.96
    lo = ((ph + z * z / (2.0 * n)
           - z * np.sqrt((ph * (1.0 - ph) + z * z / (4.0 * n)) / n))
          / (1.0 + z * z / n))
    hi = ((ph + z * z / (2.0 * n)
           + z * np.sqrt((ph * (1.0 - ph) + z * z / (4.0 * n)) / n))
          / (1.0 + z * z / n))
    return pd.DataFrame({
        "month": t["month"].to_numpy(np.int64),
        "n": t["n"].to_numpy(np.int64),
        "n_late": t["k"].to_numpy(np.int64),
        "late_rate": round_away(ph, 6),
        "wilson_lo": round_away(lo, 6),
        "wilson_hi": round_away(hi, 6)})


def q_markov_attribution(sf_dir: str) -> pd.DataFrame:
    """First-order Markov REMOVAL-EFFECT attribution — the standard
    data-driven alternative to last-touch (q182): model user journeys
    as START → event types → absorption at the first 'purchase'
    (CONV) or at journey end (END), and credit each channel c by how
    much the conversion probability drops when c is removed
    (transitions into c die): effect(c) = 1 − P(conv | drop c) /
    P(conv), normalized to attribution shares. The wide work is one
    user-keyed exchange (q116's sort-once shifted-compare layout,
    truncated at each user's first purchase, vectorized per bucket —
    no per-user loop); buckets emit (src, dst, n) counts so the
    driver solves the (channels+1)-state absorption system — a
    types-sized linear solve, like q259's power iteration. Types are
    prefix-sentinel-coded (full-byte NUL safety). Iterative linear
    algebra on journey graphs has no SQL twin; the hand-example
    pytest pins the closed-form removal effects. NULL user/ts/type
    rows are out of contract."""
    from .pairs import factorize_strings, hash_shuffle

    B = 64
    START, CONV, END = "\x00START", "\x00CONV", "\x00END"
    TARGET = "purchase"

    _E = pa.table({"src": pa.array([], pa.string()),
                   "dst": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(pc.fill_null(t2.column("event_id"),
                                             _IMAX), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "event_type": pc.cast(t2.column("event_type"),
                                  pa.string()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"src": pd.Series(dtype="object"),
                "dst": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="stable").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        ty = df["event_type"].to_numpy(object)
        isp = np.array([x == TARGET for x in ty], bool)
        n = len(u)
        first = np.zeros(n, bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        fidx = np.flatnonzero(first)
        cp = np.cumsum(isp)
        base = np.repeat(cp[fidx] - isp[fidx],
                         np.diff(np.append(fidx, n)))
        purch_incl = cp - base          # purchases up to i inclusive
        srcs, dsts = [], []
        # START -> first event (or CONV when the journey opens with
        # the purchase)
        for f in fidx:
            srcs.append(START)
            dsts.append(CONV if isp[f] else "T" + ty[f])
        # consecutive transitions until the first purchase
        same = np.zeros(n - 1, bool) if n > 1 else np.zeros(0, bool)
        if n > 1:
            same = (u[1:] == u[:-1]) & (purch_incl[:-1] == 0)
        for i in np.flatnonzero(same):
            srcs.append("T" + ty[i])
            dsts.append(CONV if isp[i + 1] else "T" + ty[i + 1])
        # unconverted journeys end at END
        lidx = np.append(fidx[1:] - 1, n - 1)
        tot_p = cp[lidx] - (cp[fidx] - isp[fidx])
        for li in lidx[tot_p == 0]:
            srcs.append("T" + ty[li])
            dsts.append(END)
        # code-keyed groupby (q343 pattern): the raw-string groupby
        # would merge the NUL-prefixed sentinels "\x00CONV"/"\x00END"
        # (and any NUL-bearing event type with its prefix twin) under
        # pandas' NUL-terminated string hashing.
        from .pairs import factorize_strings

        codes, uniques = factorize_strings(
            pd.Series(srcs + dsts, dtype=object))
        half = len(srcs)
        g = (pd.DataFrame({"sc": codes[:half], "dc": codes[half:]})
             .groupby(["sc", "dc"], sort=False).size()
             .reset_index(name="n"))
        uarr = np.asarray(uniques, dtype=object)
        g["src"] = uarr[g["sc"].to_numpy()]
        g["dst"] = uarr[g["dc"].to_numpy()]
        return g[["src", "dst", "n"]]

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"channel": pd.Series(dtype="object"),
            "removal_effect": pd.Series(dtype="float64"),
            "attribution": pd.Series(dtype="float64"),
            "p_conv": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    tm = pd.concat(parts, ignore_index=True)
    codes, _ = factorize_strings(
        pd.concat([tm["src"], tm["dst"]], ignore_index=True))
    tm = (tm.assign(sc=codes[:len(tm)], dc=codes[len(tm):])
          .groupby(["sc", "dc"], as_index=False)
          .agg(src=("src", "first"), dst=("dst", "first"),
               n=("n", "sum")))
    states = sorted({*tm["src"], *tm["dst"]})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    M = np.zeros((k, k), np.float64)
    M[[idx[s] for s in tm["src"]],
      [idx[d] for d in tm["dst"]]] = tm["n"].to_numpy(np.float64)
    row = M.sum(axis=1)
    conv_i = idx.get(CONV)
    if conv_i is None or START not in idx:
        return pd.DataFrame(cols)

    def p_conv(drop: int | None) -> float:
        # transient states: everything with outgoing mass except
        # CONV/END (absorbing) and the dropped channel
        trans = [i for i in range(k)
                 if row[i] > 0 and i != conv_i and i != drop]
        if idx[START] not in trans:
            return 0.0
        pos = {s: j for j, s in enumerate(trans)}
        Q = np.zeros((len(trans), len(trans)))
        r = np.zeros(len(trans))
        for s in trans:
            W = M[s] / row[s]
            r[pos[s]] = W[conv_i]
            for d in trans:
                Q[pos[s], pos[d]] = W[d]
        p = np.linalg.solve(np.eye(len(trans)) - Q, r)
        return float(p[pos[idx[START]]])

    full = p_conv(None)
    chans = [s for s in states if s.startswith("T")]
    effects = []
    for c in chans:
        eff = np.nan if full <= 0 else 1.0 - p_conv(idx[c]) / full
        effects.append(eff)
    tot_eff = float(np.nansum(effects))
    attr = [np.nan if (np.isnan(e) or tot_eff <= 0) else e / tot_eff
            for e in effects]
    return pd.DataFrame({
        "channel": pd.Series([c[1:] for c in chans], dtype=object),
        "removal_effect": np.round(np.array(effects, np.float64), 6),
        "attribution": np.round(np.array(attr, np.float64), 6),
        "p_conv": np.round(np.full(len(chans), full), 6)})


def q_pk_dup_audit(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Primary-key integrity audit across every base table — the
    ingestion-quality twin of q239's FK-orphan audit: per table, the
    row count, distinct non-NULL key count, NULL-key rows and
    duplicate rows (rows beyond the first per key — what an upsert
    would have collapsed). Per-batch (key, count) combiners → one
    key-hash exchange per table (same key ⇒ same bucket, so bucket
    distinct-counts are global) → the driver folds P three-int rows
    per table. Exact ints throughout; fuzz worlds plant duplicate
    dimension rows so this audit is load-bearing there."""
    from .pairs import hash_shuffle, mix64

    SPECS = (("customer", "c_custkey"), ("events", "event_id"),
             ("nation", "n_nationkey"), ("orders", "o_orderkey"),
             ("part", "p_partkey"), ("region", "r_regionkey"),
             ("supplier", "s_suppkey"))

    _E = pa.table({"key": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "nulls": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def make_split(col: str):
        def split(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or col not in t.schema.names:
                return _E
            v = t.column(col)
            n_null = t.num_rows - len(v.drop_null())
            k = v.drop_null().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            u, c = np.unique(k, return_counts=True)
            nulls = np.zeros(len(u), np.int64)
            if not len(u):          # NULL-only block still reports
                return pa.table({
                    "key": pa.array([0], pa.int64()),
                    "c": pa.array([0], pa.int64()),
                    "nulls": pa.array([n_null], pa.int64()),
                    "bucket": pa.array([0], pa.int64())})
            nulls[0] = n_null       # ride the null count on one row
            return pa.table({"key": pa.array(u),
                             "c": pa.array(c.astype(np.int64)),
                             "nulls": pa.array(nulls),
                             "bucket": pa.array(
                                 (mix64(u) & np.uint64(P - 1))
                                 .astype(np.int64))})
        return split

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(3, np.int64)
        df = pa.concat_tables(live).to_pandas()
        nulls = int(df["nulls"].sum())
        df = df[df["c"] > 0]
        if not len(df):
            return np.array([0, 0, nulls], np.int64)
        g = df.groupby("key")["c"].sum()
        return np.array([int(g.sum()), len(g), nulls], np.int64)

    import ray

    # launch all seven table exchanges concurrently (gather=False
    # returns futures), one ray.get over everything
    futs = {}
    for tbl, col in SPECS:
        ds = _read(sf_dir, tbl, columns=[col])
        futs[tbl] = hash_shuffle(
            [(r, ()) for r in ds.to_arrow_refs()],
            make_split(col), merge, P=P, gather=False)
    got = ray.get([f for fs in futs.values() for f in fs])
    rows = []
    i = 0
    for tbl, col in SPECS:
        tot = sum(got[i:i + len(futs[tbl])])
        i += len(futs[tbl])
        nn, nk, nnull = (int(x) for x in np.atleast_1d(tot)[:3])
        rows.append((tbl, nn + nnull, nk, nnull, nn - nk))
    return pd.DataFrame(rows, columns=["tbl", "n_rows", "n_keys",
                                       "n_null_keys", "n_dup_rows"]
                        ).astype({"n_rows": "int64",
                                  "n_keys": "int64",
                                  "n_null_keys": "int64",
                                  "n_dup_rows": "int64"})


def q_numeric_profile(sf_dir: str) -> pd.DataFrame:
    """Numeric column profiler — the `describe()` every engine ships,
    distributed: per (table, column), row count, NULL count, non-
    finite count, and the exact min/max over finite values. One
    streamed pass per table of per-batch per-column partials (counts
    + running min/max — no shuffle at all; the driver folds
    #columns × #batches tiny rows). min/max are actual data values,
    so floats compare bit-exactly. Covers the numeric columns of
    lineitem, orders and events."""
    SPECS = (
        ("events", ("value",)),
        ("lineitem", ("l_quantity", "l_extendedprice", "l_discount",
                      "l_tax")),
        ("orders", ("o_totalprice",)),
    )

    rows = []
    for tbl, cols in SPECS:
        _ECOLS = pa.table({"col": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64()),
                           "nulls": pa.array([], pa.int64()),
                           "nonfin": pa.array([], pa.int64()),
                           "mn": pa.array([], pa.float64()),
                           "mx": pa.array([], pa.float64())})

        def partial(t: pa.Table, cols=cols) -> pa.Table:
            if t.num_rows == 0:
                return _ECOLS
            out = {"col": [], "n": [], "nulls": [], "nonfin": [],
                   "mn": [], "mx": []}
            for c in cols:
                if c not in t.schema.names:
                    continue
                v = t.column(c)
                n = len(v)
                nulls = v.null_count
                fin = pc.fill_null(pc.is_finite(v), False)
                vf = v.filter(fin)
                nonfin = n - nulls - len(vf)
                out["col"].append(c)
                out["n"].append(n)
                out["nulls"].append(nulls)
                out["nonfin"].append(nonfin)
                out["mn"].append(pc.min(vf).as_py()
                                 if len(vf) else np.nan)
                out["mx"].append(pc.max(vf).as_py()
                                 if len(vf) else np.nan)
            return pa.table({
                "col": pa.array(out["col"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "nulls": pa.array(out["nulls"], pa.int64()),
                "nonfin": pa.array(out["nonfin"], pa.int64()),
                "mn": pa.array(
                    [None if x is None or (isinstance(x, float)
                                           and np.isnan(x)) else
                     float(x) for x in out["mn"]], pa.float64()),
                "mx": pa.array(
                    [None if x is None or (isinstance(x, float)
                                           and np.isnan(x)) else
                     float(x) for x in out["mx"]], pa.float64())})

        parts = _read(sf_dir, tbl, columns=list(cols)).map_batches(
            partial, batch_format="pyarrow").to_pandas()
        parts = _with_cols(parts, {
            "col": "object", "n": "int64", "nulls": "int64",
            "nonfin": "int64", "mn": "float64", "mx": "float64"})
        for c in cols:
            sub = parts[parts["col"] == c]
            # the oracle emits every profiled column even over an
            # empty table (zero counts, NULL min/max) — mirror it
            mn = sub["mn"].dropna()
            mx = sub["mx"].dropna()
            rows.append((
                tbl, c, int(sub["n"].sum()), int(sub["nulls"].sum()),
                int(sub["nonfin"].sum()),
                float(mn.min()) if len(mn) else np.nan,
                float(mx.max()) if len(mx) else np.nan))
    return pd.DataFrame(rows, columns=["tbl", "col", "n", "n_null",
                                       "n_nonfinite", "mn", "mx"]
                        ).astype({"n": "int64", "n_null": "int64",
                                  "n_nonfinite": "int64"})


def q_dup_row_census(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Full-row duplicate census over events — the ingestion
    double-delivery check: rows identical across ALL six columns
    under SQL GROUP BY equality (NULLs group together; NaN groups
    with NaN; −0.0 with 0.0 — both probed). Each row canonicalizes to
    ``repr``-encoded fields (ints exact, shortest-roundtrip float
    repr, escaped strings — unambiguous without delimiters) → md5 →
    the (hash, count) exchange (same hash ⇒ same bucket ⇒ global
    counts); the driver folds P (rows, distinct, max-mult) triples.
    Exact ints throughout."""
    import hashlib

    from .pairs import hash_shuffle, str_u64

    _E = pa.table({"h": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return _E
        eid = t.column("event_id").to_pylist()
        ts = t.column("ts").cast(pa.int64()).to_pylist()
        uid = t.column("user_id").to_pylist()
        ty = t.column("event_type").to_pylist()
        val = t.column("value").to_pylist()
        pr = t.column("props").to_pylist()
        keys = []
        for row in zip(eid, ts, uid, ty, val, pr):
            e, s_, u, y, v, p = row
            if isinstance(v, float):
                if v != v:
                    v = "NaN"          # NaN groups with NaN
                elif v == 0.0:
                    v = 0.0            # −0.0 groups with 0.0
            keys.append(hashlib.md5(
                repr((e, s_, u, y, v, p)).encode()).hexdigest())
        g = pd.Series(keys).value_counts()
        h = list(g.index)
        return pa.table({"h": pa.array(h, pa.string()),
                         "c": pa.array(g.to_numpy(np.int64)),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in h],
                             np.int64))})

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(3, np.int64)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("h")["c"].sum())
        v = g.to_numpy(np.int64)
        return np.array([int(v.sum()), len(v), int(v.max())],
                        np.int64)

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type",
                        "value", "props"])
    parts = [np.atleast_1d(p) for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)]
    n = sum(int(p[0]) for p in parts)
    nd = sum(int(p[1]) for p in parts)
    mx = max((int(p[2]) for p in parts), default=0)
    cols = {"n_rows": pd.Series(dtype="int64"),
            "n_distinct": pd.Series(dtype="int64"),
            "n_dup_rows": pd.Series(dtype="int64"),
            "max_multiplicity": pd.Series(dtype="int64")}
    del cols  # ungrouped aggregate: SQL emits one row even on empty
    if n == 0:
        return pd.DataFrame({
            "n_rows": pd.array([0], "int64"),
            "n_distinct": pd.array([0], "int64"),
            "n_dup_rows": pd.array([0], "int64"),
            "max_multiplicity": np.array([np.nan])})  # max() → NULL
    return pd.DataFrame({
        "n_rows": pd.array([n], "int64"),
        "n_distinct": pd.array([nd], "int64"),
        "n_dup_rows": pd.array([n - nd], "int64"),
        "max_multiplicity": pd.array([mx], "int64")})


def q_top_share(sf_dir: str, frac: float = 0.01) -> pd.DataFrame:
    """Revenue concentration: the share of total order revenue held
    by the top 1% of customers — the single Lorenz-curve point
    management actually asks for (q143's Gini compresses the whole
    curve; this reads one end of it). One custkey exchange of exact-
    cents per-customer partials; the driver folds the customer-domain
    totals, ranks (rev DESC, custkey) and sums the top ⌈frac·n⌉
    exactly. One final division. NULL custkey / non-finite prices
    are out of contract."""
    from .pairs import hash_shuffle

    P = 16
    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_custkey")),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                         False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        c = t2.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"cust": pa.array(u), "rev": pa.array(s),
                         "bucket": pa.array((u % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"cust": pd.Series(dtype="int64"),
                                 "rev": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("cust", as_index=False)["rev"].sum())

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"n_customers": pd.Series(dtype="int64"),
            "k_top": pd.Series(dtype="int64"),
            "top_rev_cents": pd.Series(dtype="int64"),
            "total_rev_cents": pd.Series(dtype="int64"),
            "top_share": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    rev = df["rev"].to_numpy(np.int64)
    cust = df["cust"].to_numpy(np.int64)
    n = len(rev)
    kt = int(np.ceil(frac * n))
    o = np.lexsort((cust, -rev))[:kt]
    top = int(rev[o].sum())
    tot = int(rev.sum())
    share = np.nan if tot == 0 else float(top) / tot
    return pd.DataFrame({
        "n_customers": pd.array([n], "int64"),
        "k_top": pd.array([kt], "int64"),
        "top_rev_cents": pd.array([top], "int64"),
        "total_rev_cents": pd.array([tot], "int64"),
        "top_share": round_away(np.array([share]), 6)})


def q_double_fire_rate(sf_dir: str, window_us: int = 1_000_000,
                       B: int = 64) -> pd.DataFrame:
    """Double-fire (accidental duplicate event) rate per event type —
    the client-side instrumentation bug every event pipeline screens
    for: among consecutive SAME-TYPE events of one user, the share
    arriving within 1 s of the previous one. One user-keyed exchange
    sorts each bucket once (q116's layout); consecutive same-user
    same-type pairs fold to per-type (n_pairs, n_fast) int partials.
    Type keys ride NUL-safe codes; one division per type. NULL
    user/ts/type rows are out of contract on both sides."""
    from .pairs import factorize_strings, hash_shuffle

    _E = pa.table({"event_id": pa.array([], pa.int64()),
                   "user_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string()),
                   "ts": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(pc.fill_null(t2.column("event_id"),
                                             _IMAX), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "event_type": pc.cast(t2.column("event_type"),
                                  pa.string()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"ty": pd.Series(dtype="object"),
                "n_pairs": pd.Series(dtype="int64"),
                "n_fast": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True))
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        ty = df["event_type"].to_numpy(object)
        if len(u) < 2:
            return pd.DataFrame(cols)
        same_user = u[1:] == u[:-1]
        tcodes, _ = factorize_strings(pd.Series(ty, dtype=object))
        same_type = tcodes[1:] == tcodes[:-1]
        m = same_user & same_type
        if not m.any():
            return pd.DataFrame(cols)
        fast = ((ts[1:] - ts[:-1]) <= window_us) & m
        codes, uniq = factorize_strings(
            pd.Series(ty[1:][m], dtype=object))
        k = len(uniq)
        pairs = np.bincount(codes, minlength=k).astype(np.int64)
        nf = np.zeros(k, np.int64)
        np.add.at(nf, codes, fast[m].astype(np.int64))
        return pd.DataFrame({"ty": pd.Series(list(uniq),
                                             dtype=object),
                             "n_pairs": pairs, "n_fast": nf})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"event_type": pd.Series(dtype="object"),
            "n_pairs": pd.Series(dtype="int64"),
            "n_fast": pd.Series(dtype="int64"),
            "fast_rate": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    from .pairs import factorize_strings as _fs

    df = pd.concat(parts, ignore_index=True)
    codes, uniq = _fs(df["ty"])
    agg_p = [0] * len(uniq)
    agg_f = [0] * len(uniq)
    for c, p_, f_ in zip(codes, df["n_pairs"].tolist(),
                         df["n_fast"].tolist()):
        agg_p[c] += p_
        agg_f[c] += f_
    order = sorted(range(len(uniq)), key=lambda i: uniq[i])
    return pd.DataFrame({
        "event_type": pd.Series([uniq[i] for i in order],
                                dtype=object),
        "n_pairs": pd.array([agg_p[i] for i in order], "int64"),
        "n_fast": pd.array([agg_f[i] for i in order], "int64"),
        "fast_rate": round_away(np.array(
            [float(agg_f[i]) / agg_p[i] for i in order],
            np.float64), 6)})


def q_daily_ohlc(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Daily OHLC downsample of event values — the classic
    time-series compaction (open/high/low/close per calendar day),
    with open/close selected by the exact (ts, event_id) order so ties
    are deterministic. Per-batch per-day combiners carry (first-key,
    open, last-key, close, min, max, n) — the textbook associative
    OHLC merge — through one day-keyed exchange; the driver folds
    #days rows. Non-finite values are excluded on both sides (SQL
    min/NaN quirks never enter); NULL ts/event_id rows are out of
    contract."""
    from .pairs import hash_shuffle, round_away

    DAY = 86_400_000_000
    _E = pa.table({"day": pa.array([], pa.int64()),
                   "k1": pa.array([], pa.int64()),
                   "e1": pa.array([], pa.int64()),
                   "o": pa.array([], pa.float64()),
                   "k2": pa.array([], pa.int64()),
                   "e2": pa.array([], pa.int64()),
                   "cl": pa.array([], pa.float64()),
                   "lo": pa.array([], pa.float64()),
                   "hi": pa.array([], pa.float64()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("ts")),
                               pc.is_valid(t.column("event_id"))),
                       pc.fill_null(pc.is_finite(t.column("value")),
                                    False))
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t2.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = t2.column("value").to_numpy(zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        df = pd.DataFrame({"day": day, "us": us, "eid": eid, "v": v})
        df = df.sort_values(["day", "us", "eid"],
                            kind="stable").reset_index(drop=True)
        g = df.groupby("day", sort=True)
        first = g.head(1).reset_index(drop=True)
        last = g.tail(1).reset_index(drop=True)
        agg = g["v"].agg(["min", "max", "size"]).reset_index()
        u = first["day"].to_numpy(np.int64)
        return pa.table({
            "day": pa.array(u),
            "k1": pa.array(first["us"].to_numpy(np.int64)),
            "e1": pa.array(first["eid"].to_numpy(np.int64)),
            "o": pa.array(first["v"].to_numpy(np.float64)),
            "k2": pa.array(last["us"].to_numpy(np.int64)),
            "e2": pa.array(last["eid"].to_numpy(np.int64)),
            "cl": pa.array(last["v"].to_numpy(np.float64)),
            "lo": pa.array(agg["min"].to_numpy(np.float64)),
            "hi": pa.array(agg["max"].to_numpy(np.float64)),
            "n": pa.array(agg["size"].to_numpy(np.int64)),
            "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"day": pd.Series(dtype="int64"),
                "open": pd.Series(dtype="float64"),
                "high": pd.Series(dtype="float64"),
                "low": pd.Series(dtype="float64"),
                "close": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        out = []
        for day, sub in df.groupby("day", sort=True):
            fo = sub.loc[sub[["k1", "e1"]].apply(tuple, axis=1)
                         .idxmin()]
            la = sub.loc[sub[["k2", "e2"]].apply(tuple, axis=1)
                         .idxmax()]
            out.append((int(day), float(fo["o"]),
                        float(sub["hi"].max()),
                        float(sub["lo"].min()), float(la["cl"]),
                        int(sub["n"].sum())))
        return pd.DataFrame(out, columns=["day", "open", "high",
                                          "low", "close", "n"])

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"day": pd.Series(dtype="int64"),
            "open": pd.Series(dtype="float64"),
            "high": pd.Series(dtype="float64"),
            "low": pd.Series(dtype="float64"),
            "close": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    out = (pd.concat(parts, ignore_index=True)
           .sort_values("day").reset_index(drop=True))
    for c in ("open", "high", "low", "close"):
        out[c] = round_away(out[c].to_numpy(np.float64), 6)
    out["n"] = out["n"].astype("int64")
    return out


def q_dau_mau(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """DAU/MAU stickiness per month — the product-health ratio: mean
    daily active users over monthly active users. Distinct-user
    counting at two granularities rides ONE user-keyed exchange:
    per-batch distinct (user, day) pairs → user buckets, where each
    user's day set is globally assembled, contributing exact
    (day-count, month-presence) partials — no double counting under
    any partitioning. The driver folds per-month (Σ DAU, MAU,
    n_days); stickiness = (ΣDAU/days)/MAU with the divisions in the
    oracle's literal order. NULL user/ts out of contract."""
    from .pairs import hash_shuffle, round_away

    DAY = 86_400_000_000
    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "day": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        g = (pd.DataFrame({"u": u, "d": day})
             .drop_duplicates())
        uu = g["u"].to_numpy(np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "day": pa.array(g["d"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (uu % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"month": pd.Series(dtype="int64"),
                "dau_sum": pd.Series(dtype="int64"),
                "mau": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .drop_duplicates())              # global (user, day)
        d = df["day"].to_numpy(np.int64)
        month = (d.astype("datetime64[D]").astype("datetime64[M]")
                 .astype("datetime64[D]").astype(np.int64))
        df = df.assign(month=month)
        dau = df.groupby("month").size()       # Σ over days of DAU
        mau = df.drop_duplicates(["user_id", "month"]) \
                .groupby("month").size()
        return pd.DataFrame({"month": dau.index.to_numpy(np.int64),
                             "dau_sum": dau.to_numpy(np.int64),
                             "mau": mau.to_numpy(np.int64)})

    # distinct days per month must come from ALL users, not one
    # bucket — fold day sets separately (tiny): reuse the same split
    def merge_days(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"day": pd.Series(dtype="int64")})
        d = np.unique(np.concatenate(
            [x.column("day").to_numpy() for x in live]))
        return pd.DataFrame({"day": d})

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    refs = [(r, ()) for r in ds.to_arrow_refs()]
    parts = [p for p in hash_shuffle(refs, split, merge, P=P)
             if len(p)]
    dparts = [p for p in hash_shuffle(refs, split, merge_days, P=P)
              if len(p)]
    cols = {"month": pd.Series(dtype="int64"),
            "n_days": pd.Series(dtype="int64"),
            "mau": pd.Series(dtype="int64"),
            "dau_avg": pd.Series(dtype="float64"),
            "stickiness": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("month", as_index=False).sum())
    days = np.unique(np.concatenate(
        [p["day"].to_numpy(np.int64) for p in dparts]))
    dmonth = (days.astype("datetime64[D]").astype("datetime64[M]")
              .astype("datetime64[D]").astype(np.int64))
    nd = pd.Series(dmonth).value_counts().sort_index()
    g = g.sort_values("month").reset_index(drop=True)
    ndays = nd.reindex(g["month"].to_numpy()).to_numpy(np.int64)
    dau_avg = g["dau_sum"].to_numpy(np.int64).astype(np.float64) \
        / ndays
    stick = dau_avg / g["mau"].to_numpy(np.int64)
    return pd.DataFrame({
        "month": g["month"].to_numpy(np.int64),
        "n_days": ndays,
        "mau": g["mau"].to_numpy(np.int64),
        "dau_avg": round_away(dau_avg, 6),
        "stickiness": round_away(stick, 6)})


def q_rank_overlap_rbo(sf_dir: str, k: int = 20,
                       p: float = 0.9) -> pd.DataFrame:
    """Rank-biased overlap between the LAST two months' top-k
    supplier revenue rankings — the IR-grade answer to "did the
    leaderboard really change?" (plain set overlap ignores order;
    RBO weights agreement at the top): RBO@k = (1−p)/... truncated
    form Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d, normalized by the same
    sum with perfect overlap. Revenue per (month, supplier) rides an
    exact-cents supplier-keyed exchange (lineitem price × (1−disc)
    cents rounding mirrored from q01's rule); the driver ranks the
    two month slices (rev DESC, suppkey) and runs the depth sum
    ascending d — the oracle's cumulative window order. Overlaps are
    exact ints; p powers are literal-mirrored."""
    from .pairs import hash_shuffle, round_away

    P = 16
    _E = pa.table({"month": pa.array([], pa.int64()),
                   "supp": pa.array([], pa.int64()),
                   "revc": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("l_suppkey")),
                          pc.is_valid(t.column("l_shipdate"))),
            pc.and_kleene(
                pc.fill_null(pc.is_finite(
                    t.column("l_extendedprice")), False),
                pc.fill_null(pc.is_finite(t.column("l_discount")),
                             False)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        us = t2.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, 86_400_000_000)
        month = (day.astype("datetime64[D]").astype("datetime64[M]")
                 .astype("datetime64[D]").astype(np.int64))
        sp = t2.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ep = t2.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        dc = t2.column("l_discount").to_numpy(zero_copy_only=False)
        # price×(1−disc) lands ON the half-cent grid — SQL round()
        # is half-AWAY (CLAUDE.md rule; np.round would flip 112.5)
        cents = round_away(ep * (1.0 - dc) * 100.0, 0).astype(
            np.int64)
        g = (pd.DataFrame({"m": month, "s": sp, "c": cents})
             .groupby(["m", "s"], as_index=False)["c"].sum())
        sk = g["s"].to_numpy(np.int64)
        return pa.table({"month": pa.array(g["m"].to_numpy(np.int64)),
                         "supp": pa.array(sk),
                         "revc": pa.array(g["c"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (sk % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"month": pd.Series(dtype="int64"),
                                 "supp": pd.Series(dtype="int64"),
                                 "revc": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby(["month", "supp"], as_index=False)
                ["revc"].sum())

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])
    parts = [x for x in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(x)]
    cols = {"month_a": pd.Series(dtype="int64"),
            "month_b": pd.Series(dtype="int64"),
            "overlap_at_k": pd.Series(dtype="int64"),
            "rbo": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = (pd.concat(parts, ignore_index=True)
          .groupby(["month", "supp"], as_index=False)["revc"].sum())
    months = np.sort(df["month"].unique())
    if len(months) < 2:
        return pd.DataFrame(cols)
    ma, mb = int(months[-2]), int(months[-1])

    def ranked(m):
        sub = df[df["month"] == m]
        o = np.lexsort((sub["supp"].to_numpy(np.int64),
                        -sub["revc"].to_numpy(np.int64)))[:k]
        return sub["supp"].to_numpy(np.int64)[o]

    A, B = ranked(ma), ranked(mb)
    sa: set = set()
    sb: set = set()
    num = 0.0
    den = 0.0
    ov_k = 0
    for d in range(1, k + 1):
        if d <= len(A):
            sa.add(int(A[d - 1]))
        if d <= len(B):
            sb.add(int(B[d - 1]))
        ov = len(sa & sb)
        if d == k:
            ov_k = ov
        w = p ** (d - 1)
        num = num + w * (float(ov) / d)
        den = den + w
    return pd.DataFrame({
        "month_a": pd.array([ma], "int64"),
        "month_b": pd.array([mb], "int64"),
        "overlap_at_k": pd.array([ov_k], "int64"),
        "rbo": round_away(np.array([num / den]), 6)})


def q_conversion_path_length(sf_dir: str, B: int = 64) -> pd.DataFrame:
    """Conversion path-length histogram — how many events a
    converting user takes BEFORE the first purchase (0 = landed and
    bought): per user, count events strictly before the first
    purchase in exact (ts, event_id) order, histogrammed. One
    user-keyed exchange (q116's sort-once layout); each bucket emits
    its local (length, n_users) partial and the driver folds a tiny
    histogram. Non-converting users emit no row (SQL's filter). NULL
    user/ts rows are out of contract; NULL event_id rides the
    int64-max sentinel (sorts last, NULLS LAST)."""
    from .pairs import hash_shuffle

    _E = pa.table({"event_id": pa.array([], pa.int64()),
                   "user_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string()),
                   "ts": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(pc.fill_null(t2.column("event_id"),
                                             _IMAX), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "event_type": pc.cast(t2.column("event_type"),
                                  pa.string()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"path_len": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True))
        u = df["user_id"].to_numpy(np.int64)
        isp = pc.fill_null(pc.equal(
            pa.array(df["event_type"].to_numpy(object)),
            "purchase"), False).to_numpy(zero_copy_only=False)
        n = len(u)
        first = np.zeros(n, bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        fidx = np.flatnonzero(first)
        pos = np.arange(n) - np.repeat(fidx,
                                       np.diff(np.append(fidx, n)))
        # first purchase position per user (if any)
        dfp = pd.DataFrame({"u": u, "pos": pos, "isp": isp})
        conv = (dfp[dfp["isp"]].groupby("u", sort=False)["pos"]
                .min())
        if not len(conv):
            return pd.DataFrame(cols)
        lens, cnt = np.unique(conv.to_numpy(np.int64),
                              return_counts=True)
        return pd.DataFrame({"path_len": lens,
                             "n_users": cnt.astype(np.int64)})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"path_len": pd.Series(dtype="int64"),
            "n_users": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    return (pd.concat(parts, ignore_index=True)
            .groupby("path_len", as_index=False)["n_users"].sum()
            .sort_values("path_len").reset_index(drop=True))


def q_hour_anomalies(sf_dir: str, k: int = 10,
                     P: int = 16) -> pd.DataFrame:
    """Top-k anomalous traffic hours under a homogeneous-Poisson
    null: hourly event counts, λ = the mean count over OBSERVED
    hours, score z = (c − λ)/√λ — the monitoring screen that flags
    both spikes and droughts (of hours that have any traffic). One
    hour-keyed exchange of per-batch (hour, count) combiners; counts
    and the hour domain are exact ints, λ and each z are the same
    two-literal expression on both sides, ranked |z| DESC with exact
    tie order (hour ASC). Pre-1970 hours floor-divide (CLAUDE.md
    rule). NULL ts rows are out of contract."""
    from .pairs import hash_shuffle, round_away

    HOUR = 3_600_000_000
    _E = pa.table({"h": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        h = np.floor_divide(us, HOUR)
        u, cc = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u),
                         "c": pa.array(cc.astype(np.int64)),
                         "bucket": pa.array(np.abs(u) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("h", as_index=False)["c"].sum())

    ds = _read(sf_dir, "events", columns=["ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"hour": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "z": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("h", as_index=False)["c"].sum())
    c = g["c"].to_numpy(np.int64)
    h = g["h"].to_numpy(np.int64)
    lam = float(int(c.sum())) / len(c)
    z = (c.astype(np.float64) - lam) / np.sqrt(lam)
    zr = round_away(z, 6)
    o = np.lexsort((h, -np.abs(zr)))[:k]
    return pd.DataFrame({"hour": h[o], "n": c[o], "z": zr[o]})


def q_item_novelty_rate(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Item novelty influx per ship month — the cold-start curve a
    recommender's coverage planning needs: per month, how many
    distinct parts shipped at all, how many shipped for the FIRST
    time, and the novelty share. The whole curve rides each part's
    (first-month, month-set) through one part-keyed exchange:
    per-batch distinct (part, month) pairs → part buckets (global
    month sets per part) → per-bucket (month, active, new) partials;
    the driver folds months × buckets ints. One division per
    month."""
    from .pairs import hash_shuffle, round_away

    DAY = 86_400_000_000
    _E = pa.table({"part": pa.array([], pa.int64()),
                   "month": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                             pc.is_valid(t.column("l_shipdate")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        p_ = t2.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        month = (day.astype("datetime64[D]").astype("datetime64[M]")
                 .astype("datetime64[D]").astype(np.int64))
        g = (pd.DataFrame({"p": p_, "m": month}).drop_duplicates())
        pp = g["p"].to_numpy(np.int64)
        return pa.table({"part": pa.array(pp),
                         "month": pa.array(g["m"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (pp % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"month": pd.Series(dtype="int64"),
                "active": pd.Series(dtype="int64"),
                "new": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas().drop_duplicates()
        act = df.groupby("month").size()
        first = df.groupby("part")["month"].min()
        new = first.value_counts().sort_index()
        out = pd.DataFrame({
            "month": act.index.to_numpy(np.int64),
            "active": act.to_numpy(np.int64)})
        out["new"] = (new.reindex(act.index, fill_value=0)
                      .to_numpy(np.int64))
        return out

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"month": pd.Series(dtype="int64"),
            "n_active": pd.Series(dtype="int64"),
            "n_new": pd.Series(dtype="int64"),
            "novelty_share": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("month", as_index=False)[["active", "new"]].sum()
         .sort_values("month").reset_index(drop=True))
    act = g["active"].to_numpy(np.int64)
    new = g["new"].to_numpy(np.int64)
    return pd.DataFrame({
        "month": g["month"].to_numpy(np.int64),
        "n_active": act,
        "n_new": new,
        "novelty_share": round_away(
            new.astype(np.float64) / act, 6)})


def q_near_purchase_rate(sf_dir: str, window_us: int = 300_000_000,
                         B: int = 64) -> pd.DataFrame:
    """Purchase-proximity rate per event type — which behaviors
    cluster around buying: for each non-purchase event, does the SAME
    user purchase within ±5 minutes? One user-keyed exchange
    (q116's layout); each bucket sorts its users' purchase times once
    and answers every event with two vectorized ``searchsorted``
    probes (an interval semi-join, never an event×purchase blowup);
    per-type (n, n_near) int partials fold driver-side on NUL-safe
    codes. One division per type. NULL user/ts/type rows are out of
    contract."""
    from .pairs import factorize_strings, hash_shuffle, round_away

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string()),
                   "ts": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "event_type": pc.cast(t2.column("event_type"),
                                  pa.string()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"ty": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "near": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user_id", "ts"], kind="stable")
              .reset_index(drop=True))
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        ty = df["event_type"].to_numpy(object)
        isp = np.array([x == "purchase" for x in ty], bool)
        # purchase times, offset per user so probes stay in-user:
        # encode key = user * LARGE + clipped-ts? exact per-user probe
        # via contiguous runs instead
        near = np.zeros(len(u), bool)
        first = np.zeros(len(u), bool)
        if len(u):
            first[0] = True
            first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(u))
        for s0, e0 in zip(starts, ends):   # user-sized loop; probes
            pt = ts[s0:e0][isp[s0:e0]]     # vectorized within
            if not len(pt):
                continue
            lo = np.searchsorted(pt, ts[s0:e0] - window_us, "left")
            hi = np.searchsorted(pt, ts[s0:e0] + window_us, "right")
            near[s0:e0] = hi > lo
        m = ~isp
        codes, uniq = factorize_strings(pd.Series(ty[m],
                                                  dtype=object))
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        nr = np.zeros(k, np.int64)
        np.add.at(nr, codes, near[m].astype(np.int64))
        return pd.DataFrame({"ty": pd.Series(list(uniq),
                                             dtype=object),
                             "n": n, "near": nr})

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "n_near_purchase": pd.Series(dtype="int64"),
            "near_rate": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    from .pairs import factorize_strings as _fs
    from .pairs import round_away as _ra

    df = pd.concat(parts, ignore_index=True)
    codes, uniq = _fs(df["ty"])
    n = [0] * len(uniq)
    nr = [0] * len(uniq)
    for c, a, b in zip(codes, df["n"].tolist(), df["near"].tolist()):
        n[c] += a
        nr[c] += b
    order = sorted(range(len(uniq)), key=lambda i: uniq[i])
    return pd.DataFrame({
        "event_type": pd.Series([uniq[i] for i in order],
                                dtype=object),
        "n": pd.array([n[i] for i in order], "int64"),
        "n_near_purchase": pd.array([nr[i] for i in order],
                                    "int64"),
        "near_rate": _ra(np.array(
            [float(nr[i]) / n[i] for i in order], np.float64), 6)})


def q_srm_check(sf_dir: str) -> pd.DataFrame:
    """Sample-ratio-mismatch check — the first A/B-test sanity gate:
    split users 50/50 on the md5 coin (q297/q300's deterministic
    hash), then test whether the observed arm sizes are consistent
    with the intended ratio via χ² = (n_a − n_b)²/(n_a + n_b) (the
    1-dof two-cell statistic). A FAILED check means the assignment
    or logging pipeline is biased — before any metric is read. One
    user-keyed exchange dedups users globally; counts exact, one
    float expression. NULL user_id rows are out of contract."""
    import hashlib

    from .pairs import hash_shuffle, round_away

    P = 32
    TWO52 = 4503599627370496.0
    thr = int(np.floor(0.5 * TWO52))

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("user_id")))
        if t2.num_rows == 0:
            return _E
        u = np.unique(t2.column("user_id").cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        return pa.table({"user_id": pa.array(u),
                         "bucket": pa.array(
                             (u % P).astype(np.int64))})

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(2, np.int64)
        u = np.unique(np.concatenate(
            [x.column("user_id").to_numpy() for x in live]))
        a = sum(1 for x in u
                if int(hashlib.md5(str(x).encode())
                       .hexdigest()[:13], 16) < thr)
        return np.array([a, len(u) - a], np.int64)

    ds = _read(sf_dir, "events", columns=["user_id"])
    tot = sum(hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                           split, merge, P=P))
    na, nb = (int(x) for x in np.atleast_1d(tot)[:2]) \
        if np.ndim(tot) else (0, 0)
    cols = {"n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64"),
            "srm_flag": pd.Series(dtype="int64")}
    if na + nb == 0:
        return pd.DataFrame(cols)
    chi2 = float(na - nb) * (na - nb) / (na + nb)
    return pd.DataFrame({
        "n_a": pd.array([na], "int64"),
        "n_b": pd.array([nb], "int64"),
        "chi2": round_away(np.array([chi2]), 6),
        "srm_flag": pd.array([int(chi2 > 9.0)], "int64")})


def q_cohort_ltv(sf_dir: str, B: int = 32) -> pd.DataFrame:
    """Cohort LTV triangle — the revenue twin of the retention
    triangle (q83): users cohorted by FIRST-purchase month, purchase
    value (exact half-away cents, CLAUDE.md round rule) summed per
    (cohort, month-offset). One user-keyed exchange: each bucket
    derives its users' cohort locally (global per user) and emits
    exact-int (cohort, offset, cents, n_purchases) partials; the
    driver folds the tiny triangle. Non-finite values and NULL
    user/ts rows are out of contract; month offsets count calendar
    months."""
    from .pairs import hash_shuffle

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "ts": pa.array([], pa.int64()),
                   "cents": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("ts"))),
                       pc.and_(pc.fill_null(pc.equal(
                           t.column("event_type"), "purchase"),
                           False),
                           pc.fill_null(pc.is_finite(
                               t.column("value")), False)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = t2.column("value").to_numpy(zero_copy_only=False)
        cents = round_away(v * 100.0, 0).astype(np.int64)
        return pa.table({"user_id": pa.array(u),
                         "ts": pa.array(us),
                         "cents": pa.array(cents),
                         "bucket": pa.array((u % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"cohort": pd.Series(dtype="int64"),
                "offset": pd.Series(dtype="int64"),
                "cents": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        day = np.floor_divide(df["ts"].to_numpy(np.int64),
                              86_400_000_000)
        mon = day.astype("datetime64[D]").astype("datetime64[M]")
        df = df.assign(mon=mon.astype(np.int64))  # month index
        coh = df.groupby("user_id")["mon"].transform("min")
        df = df.assign(cohort=coh, offset=df["mon"] - coh)
        g = (df.groupby(["cohort", "offset"], as_index=False)
             .agg(cents=("cents", "sum"), n=("cents", "size")))
        return g

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "value"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"cohort_month": pd.Series(dtype="int64"),
            "month_offset": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
            "n_purchases": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby(["cohort", "offset"], as_index=False)
         [["cents", "n"]].sum()
         .sort_values(["cohort", "offset"]).reset_index(drop=True))
    # cohort label back to month-start epoch day (oracle convention)
    lab = (g["cohort"].to_numpy(np.int64).astype("datetime64[M]")
           .astype("datetime64[D]").astype(np.int64))
    return pd.DataFrame({
        "cohort_month": lab,
        "month_offset": g["offset"].to_numpy(np.int64),
        "revenue_cents": g["cents"].to_numpy(np.int64),
        "n_purchases": g["n"].to_numpy(np.int64)})


def q_type_conversion_lift(sf_dir: str, B: int = 32) -> pd.DataFrame:
    """Conversion lift per event type — does doing X make a user more
    likely to (ever) purchase than the base rate: lift(X) =
    [P(purchase | did X)] / [P(purchase)], over users. One user-keyed
    exchange of per-batch per-user (type-set, purchased) OR-partials
    on NUL-safe type codes; each bucket emits per-type exact
    (n_users_with_X, n_with_X_and_purchase) ints plus the base
    counts. Two divisions + one ratio per type in the oracle's
    literal order. NULL user/type rows are out of contract; the
    'purchase' row itself is reported too (lift = 1/base rate
    sanity)."""
    from .pairs import factorize_strings, hash_shuffle, round_away

    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("event_type")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"user_id": pc.cast(t2.column("user_id"),
                                          pa.int64()),
                       "event_type": pc.cast(
                           t2.column("event_type"), pa.string())})
             .group_by(["user_id", "event_type"]).aggregate([]))
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": g.column("user_id"),
                         "event_type": g.column("event_type"),
                         "bucket": pa.array((u % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"ty": pd.Series(dtype="object"),
                "nx": pd.Series(dtype="int64"),
                "nxp": pd.Series(dtype="int64"),
                "nu": pd.Series(dtype="int64"),
                "np_": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        # dedupe on CODES — pandas drop_duplicates hashes object
        # strings NUL-terminated and would merge 'fz' with
        # 'fz\x00nul' (CLAUDE.md rule)
        codes, uniq = factorize_strings(df["event_type"])
        df = (df.assign(tc=codes)
              .drop_duplicates(["user_id", "tc"]))
        purch = df[df["event_type"] == "purchase"]["user_id"]
        pset = set(purch.tolist())
        nu = df["user_id"].nunique()
        np_u = len(pset)
        out = []
        for tc, users in df.groupby("tc")["user_id"]:
            us = set(users.tolist())
            out.append((uniq[tc], len(us),
                        sum(1 for x in us if x in pset), nu, np_u))
        return pd.DataFrame(out, columns=["ty", "nx", "nxp", "nu",
                                          "np_"])

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"event_type": pd.Series(dtype="object"),
            "n_users": pd.Series(dtype="int64"),
            "n_converted": pd.Series(dtype="int64"),
            "lift": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["ty"])
    k = len(uniq)
    nx = [0] * k
    nxp = [0] * k
    for c, a, b in zip(codes, df["nx"].tolist(), df["nxp"].tolist()):
        nx[c] += a
        nxp[c] += b
    # (nu, np_) ride identically on every row of a bucket — one per
    # bucket frame
    nu = sum(int(p["nu"].iloc[0]) for p in parts)
    np_u = sum(int(p["np_"].iloc[0]) for p in parts)
    if nu == 0:
        return pd.DataFrame(cols)
    base = float(np_u) / nu
    order = sorted(range(k), key=lambda i: uniq[i])
    lifts = [np.nan if base == 0
             else (float(nxp[i]) / nx[i]) / base for i in order]
    return pd.DataFrame({
        "event_type": pd.Series([uniq[i] for i in order],
                                dtype=object),
        "n_users": pd.array([nx[i] for i in order], "int64"),
        "n_converted": pd.array([nxp[i] for i in order], "int64"),
        "lift": round_away(np.array(lifts, np.float64), 6)})


def q_churn_curve(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Monthly churn curve — of the users active in month m, the
    share with NO activity in month m+1 (the complement of q83's
    retention, on calendar months): exact ints from each user's
    global month set, assembled through one user-keyed exchange
    (q329's layout); every bucket emits per-month (active,
    churned-to-next) partials, the driver folds months × buckets
    ints. The LAST month emits no row (its churn is right-censored).
    One division per month."""
    from .pairs import hash_shuffle, round_away

    DAY = 86_400_000_000
    _E = pa.table({"user_id": pa.array([], pa.int64()),
                   "month": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("user_id")),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        mon = (day.astype("datetime64[D]").astype("datetime64[M]")
               .astype(np.int64))                # month INDEX
        g = pd.DataFrame({"u": u, "m": mon}).drop_duplicates()
        uu = g["u"].to_numpy(np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "month": pa.array(g["m"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             (uu % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"month": pd.Series(dtype="int64"),
                "active": pd.Series(dtype="int64"),
                "churned": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas().drop_duplicates()
        # per user: months present; churn at m iff m+1 absent
        df = df.sort_values(["user_id", "month"])
        u = df["user_id"].to_numpy(np.int64)
        m = df["month"].to_numpy(np.int64)
        nxt = np.zeros(len(u), bool)
        if len(u) > 1:
            nxt[:-1] = (u[1:] == u[:-1]) & (m[1:] == m[:-1] + 1)
        g = (pd.DataFrame({"m": m, "ch": ~nxt})
             .groupby("m", as_index=False)
             .agg(active=("ch", "size"), churned=("ch", "sum")))
        return g.rename(columns={"m": "month"})

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"month": pd.Series(dtype="int64"),
            "n_active": pd.Series(dtype="int64"),
            "n_churned": pd.Series(dtype="int64"),
            "churn_rate": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("month", as_index=False)[["active", "churned"]]
         .sum().sort_values("month").reset_index(drop=True))
    g = g.iloc[:-1]                       # last month right-censored
    if not len(g):
        return pd.DataFrame(cols)
    lab = (g["month"].to_numpy(np.int64).astype("datetime64[M]")
           .astype("datetime64[D]").astype(np.int64))
    act = g["active"].to_numpy(np.int64)
    ch = g["churned"].to_numpy(np.int64)
    return pd.DataFrame({
        "month": lab,
        "n_active": act,
        "n_churned": ch,
        "churn_rate": round_away(ch.astype(np.float64) / act, 6)})


def q_whale_curve(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Whale curve — revenue concentration by customer decile: rank
    customers by exact-cents order revenue (rev DESC, custkey), slice
    into SQL ntile(10) tiles (`_ntile_of_ranks`, the probed DuckDB
    tiling), and report each decile's size, revenue and share. The
    full Lorenz view behind q323's single top-1% point. One custkey
    exchange of exact-cents partials; the driver ranks the
    dimension-sized customer domain; shares are one division per
    decile."""
    from .pairs import hash_shuffle, round_away

    P = 16
    _E = pa.table({"cust": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("o_custkey")),
            pc.fill_null(pc.is_finite(t.column("o_totalprice")),
                         False))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        c = t2.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.round(np.asarray(
            t2.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"cust": pa.array(u), "rev": pa.array(s),
                         "bucket": pa.array((u % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"cust": pd.Series(dtype="int64"),
                                 "rev": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("cust", as_index=False)["rev"].sum())

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"decile": pd.Series(dtype="int64"),
            "n_customers": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
            "rev_share": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    rev = df["rev"].to_numpy(np.int64)
    cust = df["cust"].to_numpy(np.int64)
    n = len(rev)
    o = np.lexsort((cust, -rev))
    tiles = _ntile_of_ranks(np.arange(n, dtype=np.int64), n, k)
    g = (pd.DataFrame({"tile": tiles, "rev": rev[o]})
         .groupby("tile", as_index=False)
         .agg(n_customers=("rev", "size"),
              revenue_cents=("rev", "sum")))
    tot = int(rev.sum())
    return pd.DataFrame({
        "decile": g["tile"].to_numpy(np.int64),
        "n_customers": g["n_customers"].to_numpy(np.int64),
        "revenue_cents": g["revenue_cents"].to_numpy(np.int64),
        "rev_share": round_away(
            g["revenue_cents"].to_numpy(np.int64).astype(np.float64)
            / tot, 6)})


def q_nation_hhi(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Supplier-revenue Herfindahl index per nation — how
    concentrated each nation's supply base is (HHI > 0.25 ⇒ one or
    two suppliers dominate): HHI = Σ_s (rev_s/T)² = Σ rev_s² / T²,
    the exact-integer-numerator trick (q310's rule — never a float
    sum over suppliers). Supplier revenue rides a suppkey exchange
    of exact half-away cents (q334's rounding rule); the
    supplier→nation map is the broadcast dedup'd supplier dimension.
    Python-int squares cross any magnitude; ONE division per nation.
    Suppliers missing from the dimension group under NULL nation
    (SQL LEFT JOIN)."""
    from .pairs import hash_shuffle, round_away

    _E = pa.table({"supp": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.is_valid(t.column("l_suppkey")),
            pc.and_kleene(
                pc.fill_null(pc.is_finite(
                    t.column("l_extendedprice")), False),
                pc.fill_null(pc.is_finite(t.column("l_discount")),
                             False)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        s = t2.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ep = t2.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        dc = t2.column("l_discount").to_numpy(zero_copy_only=False)
        cents = round_away(ep * (1.0 - dc) * 100.0, 0).astype(
            np.int64)
        u, inv = np.unique(s, return_inverse=True)
        sm = np.zeros(len(u), np.int64)
        np.add.at(sm, inv, cents)
        return pa.table({"supp": pa.array(u), "rev": pa.array(sm),
                         "bucket": pa.array((u % P).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"supp": pd.Series(dtype="int64"),
                                 "rev": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("supp", as_index=False)["rev"].sum())

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"nationkey": pd.Series(dtype="float64"),
            "n_suppliers": pd.Series(dtype="int64"),
            "total_cents": pd.Series(dtype="int64"),
            "hhi": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True) \
        .groupby("supp", as_index=False)["rev"].sum()
    sup = _read_pd(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"])
    sup = sup[sup["s_suppkey"].notna()]
    nmap = (sup.assign(k=sup["s_suppkey"].astype(np.int64))
            .groupby("k")["s_nationkey"]
            .agg(lambda x: None if x.dropna().empty
                 else int(x.dropna().min())))
    df["nation"] = df["supp"].map(nmap)       # missing → NaN (NULL)
    out = []
    for nk, sub in df.groupby("nation", dropna=False, sort=True):
        rv = sub["rev"].tolist()
        T = sum(int(x) for x in rv)
        s2 = sum(int(x) * int(x) for x in rv)
        hhi = np.nan if T == 0 else float(s2) / (float(T) * T)
        out.append((None if pd.isna(nk) else float(nk), len(rv),
                    T, hhi))
    out.sort(key=lambda r: (r[0] is None,
                            r[0] if r[0] is not None else 0))
    return pd.DataFrame({
        "nationkey": pd.array([r[0] for r in out], "float64"),
        "n_suppliers": pd.array([r[1] for r in out], "int64"),
        "total_cents": pd.array([r[2] for r in out], "int64"),
        "hhi": round_away(np.array([r[3] for r in out],
                                   np.float64), 6)})


def q_join_cardinality_est(sf_dir: str, frac_bits: int = 3,
                           P: int = 16) -> pd.DataFrame:
    """Sampled join-cardinality estimation eval — the optimizer
    primitive, self-certifying: estimate |orders ⋈ lineitem| from a
    1/8 KEY-sample on each side (orderkeys whose md5 prefix has its
    low 3 bits zero — the same key surviving on BOTH sides makes
    this a correlated/co-sampled estimator, the standard join-sample
    trick; independent row samples would square the rate), scale by
    8, and report the exact size beside it with the relative error.
    One orderkey exchange carries per-key (order-rows,
    lineitem-rows) counts, so the exact join size is Σ a·b, the
    sample the same sum over surviving keys — exact ints, two
    divisions. NULL keys out of contract."""
    import hashlib

    from .pairs import hash_shuffle, round_away

    RATE = 1 << frac_bits

    _E = pa.table({"k": pa.array([], pa.int64()),
                   "a": pa.array([], pa.int64()),
                   "b": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def mk_split(col: str, side: int):
        def split(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or col not in t.schema.names:
                return _E
            v = t.column(col).drop_null().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if not len(v):
                return _E
            u, c = np.unique(v, return_counts=True)
            z = np.zeros(len(u), np.int64)
            a = c.astype(np.int64) if side == 0 else z
            b = c.astype(np.int64) if side == 1 else z
            return pa.table({"k": pa.array(u), "a": pa.array(a),
                             "b": pa.array(b),
                             "bucket": pa.array(
                                 (u % P).astype(np.int64))})
        return split

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(2, np.int64)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("k", as_index=False)[["a", "b"]].sum())
        prod = g["a"].to_numpy(np.int64) * g["b"].to_numpy(np.int64)
        exact = int(prod.sum())
        keys = g["k"].to_numpy(np.int64)
        insample = np.array(
            [int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
             % RATE == 0 for k in keys], bool)
        samp = int(prod[insample].sum())
        return np.array([exact, samp], np.int64)

    o_refs = [(r, (0,)) for r in _read(
        sf_dir, "orders", columns=["o_orderkey"]).to_arrow_refs()]
    l_refs = [(r, (1,)) for r in _read(
        sf_dir, "lineitem",
        columns=["l_orderkey"]).to_arrow_refs()]

    def split(t: pa.Table, side: int) -> pa.Table:
        return mk_split("o_orderkey" if side == 0 else "l_orderkey",
                        side)(t)

    tot = sum(hash_shuffle(o_refs + l_refs, split, merge, P=P))
    exact, samp = ((int(x) for x in np.atleast_1d(tot)[:2])
                   if np.ndim(tot) else (0, 0))
    cols = {"exact_rows": pd.Series(dtype="int64"),
            "sampled_rows": pd.Series(dtype="int64"),
            "estimate": pd.Series(dtype="int64"),
            "rel_err": pd.Series(dtype="float64")}
    if exact == 0:
        return pd.DataFrame(cols)
    est = samp * RATE
    return pd.DataFrame({
        "exact_rows": pd.array([exact], "int64"),
        "sampled_rows": pd.array([samp], "int64"),
        "estimate": pd.array([est], "int64"),
        "rel_err": round_away(np.array(
            [abs(est - exact) / float(exact)]), 6)})


def q_weekday_hour_heatmap(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Weekday × hour traffic heatmap — the calendar load profile
    behind capacity planning: event counts per (ISO-ish weekday with
    0 = Sunday, hour of day), computed with FLOORED division and
    FLOORED modulo so pre-1970 timestamps land in the right cell
    (CLAUDE.md's truncated-vs-floored rule; q248's weekday
    convention). One (cell, count) exchange of per-batch combiners —
    the driver folds ≤ 168 rows. NULL ts out of contract."""
    from .pairs import hash_shuffle

    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    _E = pa.table({"cell": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("ts")))
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, DAY)
        # epoch day 0 = Thursday; weekday 0 = Sunday ⇒ +4 shift
        wd = np.mod(day + 4, 7)          # np.mod floors (CLAUDE.md)
        hr = np.mod(np.floor_divide(us, HOUR), 24)
        cell = wd * 24 + hr
        u, cc = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "c": pa.array(cc.astype(np.int64)),
                         "bucket": pa.array(u % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"cell": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        return (pa.concat_tables(live).to_pandas()
                .groupby("cell", as_index=False)["c"].sum())

    ds = _read(sf_dir, "events", columns=["ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"weekday": pd.Series(dtype="int64"),
            "hour": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .groupby("cell", as_index=False)["c"].sum()
         .sort_values("cell").reset_index(drop=True))
    cell = g["cell"].to_numpy(np.int64)
    return pd.DataFrame({
        "weekday": cell // 24,
        "hour": cell % 24,
        "n": g["c"].to_numpy(np.int64)})


def q_brand_diversity_trend(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Brand revenue diversity per ship month — 1 − HHI over brand
    revenue shares, the diversification trend a category manager
    watches (falling diversity = one brand eating the mix). Same
    exact-integer discipline as q347: per-month brand revenues ride
    a (month, brand) exchange as half-away cents; diversity =
    1 − Σrev²/T² with Python-int squares — never a float sum over
    brands. The part→brand map is the broadcast dedup'd dimension
    (q310's min-brand rule; unknown parts = NULL brand, a real
    group)."""
    from .pairs import factorize_strings, hash_shuffle, round_away

    _E = pa.table({"month": pa.array([], pa.int64()),
                   "bc": pa.array([], pa.int64()),
                   "rev": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    pt = _read_pd(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pt = pt[pt["p_partkey"].notna()]
    grp = (pt.assign(k=pt["p_partkey"].astype(np.int64))
           .groupby("k")["p_brand"]
           .agg(lambda s: None if s.dropna().empty
                else s.dropna().min()))
    keys = grp.index.to_numpy(np.int64)
    bcodes, buniq = factorize_strings(
        pd.Series(grp.to_numpy(object), dtype=object),
        use_na_sentinel=False)
    null_code = None
    for i, uv in enumerate(buniq):
        if uv is None or (isinstance(uv, float) and np.isnan(uv)):
            null_code = i
    miss = null_code if null_code is not None else len(buniq)

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return _E
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("l_partkey")),
                          pc.is_valid(t.column("l_shipdate"))),
            pc.and_kleene(
                pc.fill_null(pc.is_finite(
                    t.column("l_extendedprice")), False),
                pc.fill_null(pc.is_finite(t.column("l_discount")),
                             False)))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        pk = t2.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(keys) == 0:
            # part-empty world: np.take on an empty axis raises even
            # under an all-False hit mask — every key is missing-dim
            bc = np.full(len(pk), miss, np.int64)
        else:
            pos = np.searchsorted(keys, pk)
            posc = np.clip(pos, 0, len(keys) - 1)
            hit = np.take(keys, posc) == pk
            bc = np.where(hit, np.take(bcodes, posc), miss)
        us = t2.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = np.floor_divide(us, 86_400_000_000)
        month = (day.astype("datetime64[D]").astype("datetime64[M]")
                 .astype("datetime64[D]").astype(np.int64))
        ep = t2.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        dc = t2.column("l_discount").to_numpy(zero_copy_only=False)
        cents = round_away(ep * (1.0 - dc) * 100.0, 0).astype(
            np.int64)
        g = (pd.DataFrame({"m": month, "bc": bc, "c": cents})
             .groupby(["m", "bc"], as_index=False)["c"].sum())
        return pa.table({"month": pa.array(g["m"].to_numpy(np.int64)),
                         "bc": pa.array(g["bc"].to_numpy(np.int64)),
                         "rev": pa.array(g["c"].to_numpy(np.int64)),
                         "bucket": pa.array(
                             np.abs(g["m"].to_numpy(np.int64)) % P)})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"month": pd.Series(dtype="int64"),
                "n_brands": pd.Series(dtype="int64"),
                "t": pd.Series(dtype="object"),
                "s2": pd.Series(dtype="object")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .groupby(["month", "bc"], as_index=False)["rev"].sum())
        out = []
        for m, sub in df.groupby("month"):
            rv = sub["rev"].tolist()
            T = sum(int(x) for x in rv)
            s2 = sum(int(x) * int(x) for x in rv)
            out.append((int(m), len(rv), T, s2))
        return pd.DataFrame(out, columns=["month", "n_brands", "t",
                                          "s2"])

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"month": pd.Series(dtype="int64"),
            "n_brands": pd.Series(dtype="int64"),
            "total_cents": pd.Series(dtype="int64"),
            "diversity": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .sort_values("month").reset_index(drop=True))
    g = g[[int(t) != 0 for t in g["t"]]]   # SQL: WHERE t <> 0
    div = [1.0 - float(s2) / (float(t) * t)
           for t, s2 in zip(g["t"], g["s2"])]
    return pd.DataFrame({
        "month": g["month"].to_numpy(np.int64),
        "n_brands": g["n_brands"].astype("int64").to_numpy(),
        "total_cents": np.array([int(x) for x in g["t"]], np.int64),
        "diversity": round_away(np.array(div, np.float64), 6)})


def q_behavior_coverage(sf_dir: str, train_frac: float = 0.8,
                        B: int = 64) -> pd.DataFrame:
    """Behavioral-vocabulary coverage across the user split — the
    sequence-model analogue of OOV rate: split USERS 80/20 on the
    md5 coin (group-aware, q300's lesson), collect each side's set
    of consecutive event-type bigrams, and report how much of the
    test side's bigram vocabulary (and bigram MASS) the train side
    covers. One user-keyed exchange (q116's sort-once layout)
    emits per-bucket (bigram-code pair → train/test counts) partials
    on NUL-safe codes; the driver folds the tiny bigram domain.
    Exact ints, two divisions."""
    import hashlib

    from .pairs import factorize_strings, hash_shuffle, round_away

    TWO52 = 4503599627370496.0
    thr = int(np.floor(train_frac * TWO52))

    _E = pa.table({"event_id": pa.array([], pa.int64()),
                   "user_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string()),
                   "ts": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(pc.fill_null(t2.column("event_id"),
                                             _IMAX), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "event_type": pc.cast(t2.column("event_type"),
                                  pa.string()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "bucket": pa.array((uid % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"src": pd.Series(dtype="object"),
                "dst": pd.Series(dtype="object"),
                "tr": pd.Series(dtype="int64"),
                "te": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = (pa.concat_tables(live).to_pandas()
              .sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True))
        u = df["user_id"].to_numpy(np.int64)
        ty = df["event_type"].to_numpy(object)
        if len(u) < 2:
            return pd.DataFrame(cols)
        same = u[1:] == u[:-1]
        users = np.unique(u)
        tr_users = {int(x) for x in users
                    if int(hashlib.md5(str(x).encode())
                           .hexdigest()[:13], 16) < thr}
        is_tr = np.array([int(x) in tr_users for x in u[1:]], bool)
        m = same
        # first aggregation must already be code-keyed (q343 pattern):
        # a raw-string groupby would irreversibly merge ('fz', X) with
        # ('fz\x00nul', X) before any NUL-safe regroup could help.
        from .pairs import factorize_strings

        srcs = ty[:-1][m]
        dsts = ty[1:][m]
        codes, uniques = factorize_strings(
            pd.Series(np.concatenate([srcs, dsts]) if len(srcs)
                      else [], dtype=object))
        half = len(srcs)
        g = (pd.DataFrame({"sc": codes[:half], "dc": codes[half:],
                           "tr": is_tr[m],
                           "te": ~is_tr[m]})
             .groupby(["sc", "dc"], as_index=False, sort=False)
             [["tr", "te"]].sum())
        uarr = np.asarray(uniques, dtype=object)
        g["src"] = (uarr[g["sc"].to_numpy()] if len(g)
                    else pd.Series(dtype=object))
        g["dst"] = (uarr[g["dc"].to_numpy()] if len(g)
                    else pd.Series(dtype=object))
        g["tr"] = g["tr"].astype("int64")
        g["te"] = g["te"].astype("int64")
        return g[["src", "dst", "tr", "te"]]

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"n_test_bigrams": pd.Series(dtype="int64"),
            "n_covered": pd.Series(dtype="int64"),
            "vocab_coverage": pd.Series(dtype="float64"),
            "mass_coverage": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    from .pairs import coded_keys

    df = pd.concat(parts, ignore_index=True)
    cj, restore = coded_keys(df, ["src", "dst"])
    g = (cj.groupby(["src", "dst"], as_index=False)
         [["tr", "te"]].sum())
    te_vocab = g[g["te"] > 0]
    n_te = len(te_vocab)
    if n_te == 0:
        return pd.DataFrame(cols)
    cov = te_vocab[te_vocab["tr"] > 0]
    mass_total = int(te_vocab["te"].sum())
    mass_cov = int(cov["te"].sum())
    return pd.DataFrame({
        "n_test_bigrams": pd.array([n_te], "int64"),
        "n_covered": pd.array([len(cov)], "int64"),
        "vocab_coverage": round_away(np.array(
            [float(len(cov)) / n_te]), 6),
        "mass_coverage": round_away(np.array(
            [float(mass_cov) / mass_total]), 6)})


def q_revenue_jumps(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k day-over-day revenue jumps — the "what happened on
    Tuesday?" triage list: daily exact-cents revenue (q199's
    exchange), the signed change versus the PREVIOUS OBSERVED day
    (SQL lag), the calendar gap between them, ranked by |change|
    with exact tie order (day ASC). All ints; the driver scans the
    ~#days series."""
    cols = {"day": pd.Series(dtype="int64"),
            "revc": pd.Series(dtype="int64"),
            "change_cents": pd.Series(dtype="int64"),
            "gap_days": pd.Series(dtype="int64")}
    d = _daily_rev_cents(sf_dir)
    if len(d) < 2:
        return pd.DataFrame(cols)
    d = d.sort_values("day").reset_index(drop=True)
    day = d["day"].to_numpy(np.int64)
    rev = d["revc"].to_numpy(np.int64)
    ch = rev[1:] - rev[:-1]
    gap = day[1:] - day[:-1]
    o = np.lexsort((day[1:], -np.abs(ch)))[:k]
    return pd.DataFrame({
        "day": day[1:][o],
        "revc": rev[1:][o],
        "change_cents": ch[o],
        "gap_days": gap[o]})


def q_constancy_screen(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Near-constant categorical column screen — the AutoML prep
    check that flags columns carrying (almost) no signal: per
    categorical column across four tables, the distinct-value count
    and the MODE share (most common value's fraction, NULL being a
    value). Per-batch (column, value, count) combiners ride a
    value-keyed exchange (global counts per value in one bucket);
    buckets emit local (distinct, mode-candidate) partials and the
    driver folds P rows per column — mode ties break by value
    (sentinel byte order, the oracle's coalesce-key rule). Exact
    ints; one division per column."""
    from .pairs import factorize_strings, hash_shuffle, round_away, \
        str_u64

    SPECS = (("documents", "lang"), ("documents", "source"),
             ("events", "event_type"), ("lineitem", "l_returnflag"),
             ("lineitem", "l_linestatus"),
             ("orders", "o_orderpriority"))
    _NULL = "\x00NULLVAL"
    _E = pa.table({"v": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def mk_split(col: str):
        def split(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or col not in t.schema.names:
                return _E
            vs = pd.Series(t.column(col).to_pylist(), dtype=object)
            keyed = vs.where(vs.isna(), "V" + vs).fillna(_NULL)
            codes, uniq = factorize_strings(keyed,
                                            use_na_sentinel=False)
            cc = np.bincount(codes,
                             minlength=len(uniq)).astype(np.int64)
            return pa.table({"v": pa.array(list(uniq), pa.string()),
                             "c": pa.array(cc),
                             "bucket": pa.array(np.array(
                                 [str_u64(x) & (P - 1)
                                  for x in uniq], np.int64))})
        return split

    def merge(*tabs) -> tuple:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return (0, 0, 0, None)
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["v"])
        g: dict = {}
        for c, n in zip(codes, df["c"].tolist()):
            g[c] = g.get(c, 0) + n
        n_distinct = len(g)
        total = sum(g.values())
        # mode tie rule: highest count, then smallest value bytes
        top = max(g.values())
        kmin = min((k for k, v in g.items() if v == top),
                   key=lambda k: uniq[k])
        return (total, n_distinct, top, uniq[kmin])

    import ray

    futs = {}
    for tbl, col in SPECS:
        ds = _read(sf_dir, tbl, columns=[col])
        futs[(tbl, col)] = hash_shuffle(
            [(r, ()) for r in ds.to_arrow_refs()],
            mk_split(col), merge, P=P, gather=False)
    got = ray.get([f for fs in futs.values() for f in fs])
    rows = []
    i = 0
    for tbl, col in SPECS:
        chunk = got[i:i + len(futs[(tbl, col)])]
        i += len(futs[(tbl, col)])
        total = sum(c[0] for c in chunk)
        nd = sum(c[1] for c in chunk)
        if total == 0:
            continue
        # global mode: each bucket's value set is disjoint, so its
        # local mode is exact there; fold with the same tie rule
        top = max(c[2] for c in chunk if c[3] is not None)
        kbest = min((c for c in chunk
                     if c[3] is not None and c[2] == top),
                    key=lambda c: c[3])
        mode_key = kbest[3]
        rows.append((tbl, col, total, nd,
                     None if mode_key == _NULL else mode_key[1:],
                     kbest[2], float(kbest[2]) / total))
    from .pairs import round_away as _ra

    return pd.DataFrame(rows, columns=[
        "tbl", "col", "n_rows", "n_distinct", "mode_value",
        "mode_count", "mode_share"]).astype(
        {"n_rows": "int64", "n_distinct": "int64",
         "mode_count": "int64"}).assign(
        mode_share=lambda d: _ra(
            d["mode_share"].to_numpy(np.float64), 6))


def q_hour_uniformity(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Hour-of-day uniformity χ² per event type — which behaviors
    actually have a daily rhythm: against the uniform-over-24-hours
    null, χ² = Σ(o_h − n/24)²/(n/24) telescopes to the EXACT-integer
    form (24·Σo_h² − n²)/n — one double division, no float sum over
    bins (the module's Σ-of-squares discipline, q347/q352). One
    (type, hour) exchange keyed on the type (a type's 24 bins
    co-locate); NUL-safe codes; flagged against the 23-dof α=0.05
    critical value 35.17 (literal both sides). Floored hour rule
    (pre-1970). NULL ts/type out of contract."""
    from .pairs import factorize_strings, hash_shuffle, round_away, \
        str_u64

    HOUR = 3_600_000_000
    _E = pa.table({"ty": pa.array([], pa.string()),
                   "h": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("ts")),
                       pc.is_valid(t.column("event_type")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hr = np.mod(np.floor_divide(us, HOUR), 24)
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        codes, uniq = factorize_strings(ty)
        g = (pd.DataFrame({"tc": codes, "h": hr})
             .groupby(["tc", "h"], sort=False).size()
             .reset_index(name="c"))
        names = [uniq[i] for i in g["tc"]]
        return pa.table({"ty": pa.array(names, pa.string()),
                         "h": pa.array(g["h"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64)),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in names],
                             np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"ty": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "s2": pd.Series(dtype="object")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"])
        out = []
        for tc, sub in df.assign(tc=codes).groupby("tc"):
            g = sub.groupby("h")["c"].sum()
            n = int(g.sum())
            s2 = sum(int(x) * int(x) for x in g)
            out.append((uniq[tc], n, s2))
        return pd.DataFrame(out, columns=["ty", "n", "s2"])

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64"),
            "nonuniform": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    # each type lives in ONE bucket — rows are already global
    rows = []
    for ty, n, s2 in zip(df["ty"], df["n"], df["s2"]):
        chi2 = float(24 * int(s2) - int(n) * int(n)) / int(n)
        rows.append((ty, int(n), chi2))
    rows.sort(key=lambda r: r[0])
    return pd.DataFrame({
        "event_type": pd.Series([r[0] for r in rows], dtype=object),
        "n": pd.array([r[1] for r in rows], "int64"),
        "chi2": round_away(np.array([r[2] for r in rows],
                                    np.float64), 6),
        "nonuniform": pd.array([int(r[2] > 35.17) for r in rows],
                               "int64")})


_BENFORD_P = np.array([
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061323,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
], np.float64)  # log10(1 + 1/d), d = 1..9 — literal on BOTH sides


def q_benford_screen(sf_dir: str) -> pd.DataFrame:
    """Benford first-significant-digit screen over order totals — the
    classic fraud/data-quality test. Each block bincounts the leading
    decimal digit of the EXACT-cents integer (``round(price*100)`` on
    both sides — the digit is derived from ints, never from float
    log10, whose power-of-ten boundaries are libm-dependent) and only
    a 9-vector crosses the wire (``tree_sum``). Companion to q179's
    integer-part Benford audit: this variant works on the cents grid
    (sub-unit amounts keep a leading digit) and adds the per-digit
    χ² decomposition against shared-literal expectations. Expected shares are
    hardcoded float literals shared verbatim with the oracle SQL, so
    no libm log10 divergence can enter the χ² terms. Contract:
    finite, strictly positive totals with cents ≥ 1; empty input
    still emits the 9 digit rows (share/χ² NULL)."""
    from .pairs import round_away, tree_sum

    def block_counts(block: pa.Table):
        if block.num_rows == 0 or \
                "o_totalprice" not in block.schema.names:
            return None
        x = block.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x) & (x > 0)]
        if x.size == 0:
            return None
        # SQL round() is half-away; x > 0 makes floor(x+0.5) identical
        cents = np.floor(x * 100.0 + 0.5).astype(np.int64)
        cents = cents[cents >= 1]
        if cents.size == 0:
            return None
        d = cents.copy()
        while True:  # pure-int leading digit: ≤19 vectorized passes
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        return np.bincount(d, minlength=10)[1:10].astype(np.float64)

    total = tree_sum(_read(sf_dir, "orders", columns=["o_totalprice"]),
                     block_counts, name="benford")
    c = (np.zeros(9, np.int64) if total is None
         else np.asarray(total).astype(np.int64))
    n = int(c.sum())
    digits = np.arange(1, 10, dtype=np.int64)
    if n == 0:
        share = np.full(9, np.nan)
        chi2 = np.full(9, np.nan)
    else:
        share = c / float(n)
        e = n * _BENFORD_P
        chi2 = (c - e) * (c - e) / e
    return pd.DataFrame({
        "digit": digits,
        "n_obs": c,
        "share": round_away(share, 6),
        "benford_p": round_away(_BENFORD_P.copy(), 6),
        "chi2_term": round_away(chi2, 6)})


def q_k_anonymity(sf_dir: str) -> pd.DataFrame:
    """k-anonymity audit of the (c_nationkey, c_mktsegment)
    quasi-identifier pair — the privacy screen a dataset release
    pipeline runs before publishing. One hash exchange keyed on the
    QI pair (NULL keys are real groups, SQL GROUP BY semantics; NUL
    bytes survive via hex-encoded segment keys); each bucket reduces
    its groups to fixed-size per-threshold partials (groups/rows
    below k for k ∈ {2, 5, 10}, plus n/min), so the driver folds
    P small rows — the group-size table itself never leaves the
    buckets. Always emits the 3 threshold rows (q143 contract);
    min_group_size is DOUBLE on both sides (NULL on empty)."""
    from .pairs import hash_shuffle, round_away, str_u64

    KS = (2, 5, 10)
    P = 8
    _NKNULL = np.iinfo(np.int64).min
    _E = pa.table({"nk": pa.array([], pa.int64()),
                   "seg": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return _E
        nk = pc.fill_null(t.column("c_nationkey").cast(pa.int64()),
                          _NKNULL).to_numpy(zero_copy_only=False)
        seg = t.column("c_mktsegment").to_pylist()
        segk = ["N" if s is None
                else "S" + s.encode("utf-8", "surrogatepass").hex()
                for s in seg]
        g = (pd.DataFrame({"nk": nk, "seg": segk})
             .groupby(["nk", "seg"], sort=False).size()
             .reset_index(name="c"))
        bucket = np.array([str_u64(f"{a}|{b}") & (P - 1)
                           for a, b in zip(g["nk"], g["seg"])],
                          np.int64)
        return pa.table({"nk": pa.array(g["nk"].to_numpy(np.int64)),
                         "seg": pa.array(g["seg"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64)),
                         "bucket": pa.array(bucket)})

    def merge(*tabs) -> tuple:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return (0, 0, None) + (0, 0) * len(KS)
        df = pa.concat_tables(live).to_pandas()
        sz = df.groupby(["nk", "seg"], sort=False)["c"].sum().to_numpy()
        out = [int(sz.sum()), int(len(sz)), int(sz.min())]
        for k in KS:
            below = sz < k
            out += [int(below.sum()), int(sz[below].sum())]
        return tuple(out)

    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_mktsegment"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    n_rows = sum(p[0] for p in parts)
    n_groups = sum(p[1] for p in parts)
    mins = [p[2] for p in parts if p[2] is not None]
    min_sz = float(min(mins)) if mins else np.nan
    rows = []
    for i, k in enumerate(KS):
        gb = sum(p[3 + 2 * i] for p in parts)
        rb = sum(p[4 + 2 * i] for p in parts)
        pct = (np.nan if n_rows == 0
               else float(round_away(np.array([rb / float(n_rows)]),
                                     6)[0]))
        rows.append((k, gb, rb, pct))
    return pd.DataFrame({
        "k": pd.array([r[0] for r in rows], "int64"),
        "groups_below": pd.array([r[1] for r in rows], "int64"),
        "rows_below": pd.array([r[2] for r in rows], "int64"),
        "pct_rows_below": np.array([r[3] for r in rows], np.float64),
        "n_rows": pd.array([n_rows] * 3, "int64"),
        "n_groups": pd.array([n_groups] * 3, "int64"),
        "min_group_size": np.array([min_sz] * 3, np.float64)})


def q_scd2_history(sf_dir: str, P: int = 16,
                   as_refs: bool = False):
    """Slowly-changing-dimension type-2 build: collapse each user's
    event-type timeline into validity intervals [valid_from, valid_to)
    with a per-user version counter — the dimension-history shape every
    warehouse load needs. One hash exchange on user_id (a user's whole
    timeline co-locates); inside a bucket the total order is built as
    CHAINED stable single-column sorts (ts, then event_id with the
    int64-max NULLS-LAST sentinel, then event_type bytes as the final
    tie-break — the NUL-safe multi-key discipline), runs are detected
    with vectorized adjacent compares, and each run emits one interval.
    Epoch-µs output: valid_from_us is non-null BIGINT; valid_to_us is
    the next run's start (NULL on the open current version → float64,
    the nullable-BIGINT dtype contract). Contract: NULL user/ts/type
    rows are out of the dimension source."""
    from .pairs import hash_shuffle, mix64

    _IM = np.iinfo(np.int64).max
    _E = pa.table({"u": pa.array([], pa.int64()),
                   "ts": pa.array([], pa.int64()),
                   "eid": pa.array([], pa.int64()),
                   "ty": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"user_id", "ts", "event_type"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("ts"))),
                       pc.is_valid(t.column("event_type")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        eid = (pc.fill_null(t2.column("event_id").cast(pa.int64()),
                            _IM).to_numpy(zero_copy_only=False)
               .astype(np.int64)
               if "event_id" in t2.schema.names
               else np.full(len(u), _IM, np.int64))
        return pa.table({
            "u": pa.array(u), "ts": pa.array(ts), "eid": pa.array(eid),
            "ty": t2.column("event_type"),
            "bucket": pa.array((mix64(u) % P).astype(np.int64))})

    def merge(*tabs) -> pa.Table:
        _EO = pa.table({
            "user_id": pa.array([], pa.int64()),
            "attr": pa.array([], pa.string()),
            "valid_from_us": pa.array([], pa.int64()),
            "valid_to_us": pa.array([], pa.int64()),
            "version": pa.array([], pa.int64())})
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EO
        df = pa.concat_tables(live).to_pandas()
        # chained stable sorts, last key first: ty bytes → eid → ts → u
        df = df.sort_values("ty", kind="stable")
        for k in ("eid", "ts", "u"):
            df = df.sort_values(k, kind="stable")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        ty = df["ty"].to_numpy(object)
        new_run = np.ones(len(df), bool)
        new_run[1:] = (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])
        idx = np.flatnonzero(new_run)
        ru, rts, rty = u[idx], ts[idx], ty[idx]
        vt = np.full(len(idx), np.nan)
        if len(idx) > 1:
            same = ru[1:] == ru[:-1]
            vt[:-1][same] = rts[1:][same].astype(np.float64)
        new_user = np.ones(len(idx), bool)
        if len(idx) > 1:
            new_user[1:] = ru[1:] != ru[:-1]
        starts = np.flatnonzero(new_user)
        version = (np.arange(len(idx), dtype=np.int64)
                   - np.repeat(starts, np.diff(
                       np.append(starts, len(idx)))) + 1)
        # nullable-int valid_to: the open interval is a real NULL in
        # the Arrow/parquet contract; to_pandas turns it into the
        # driver contract's float64+NaN automatically
        vt_ints = [None if np.isnan(v) else int(v) for v in vt]
        return pa.table({"user_id": pa.array(ru),
                         "attr": pa.array(list(rty), pa.string()),
                         "valid_from_us": pa.array(rts),
                         "valid_to_us": pa.array(vt_ints, pa.int64()),
                         "version": pa.array(version)})

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])
    if as_refs:
        import ray.data as rd

        futs = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                            split, merge, P=P, gather=False)
        return rd.from_arrow_refs(futs)
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if p.num_rows]
    if not parts:
        return merge().to_pandas()
    out = pa.concat_tables(parts).to_pandas()
    for k in ("version", "user_id"):
        out = out.sort_values(k, kind="stable")
    return out.reset_index(drop=True)


def q_scd2_history_ds(sf_dir: str, P: int = 16):
    """Dataset-returning core of q362 (the scale-safe per-row oracle
    contract): the per-bucket interval tables stay in the object
    store as ObjectRefs and stream straight to parquet — at 100× the
    history IS the dataset and never transits the driver heap."""
    return q_scd2_history(sf_dir, P=P, as_refs=True)


def q_gap_fill_locf(sf_dir: str, P: int = 16,
                    as_refs: bool = False):
    """Hourly time-grid resample with last-observation-carried-forward
    — the gap-fill every monitoring/feature pipeline needs. Per event
    type: bin finite-valued events to epoch hours (FLOOR division over
    raw µs, the pre-1970 rule), take the per-hour MAX (order-exact, no
    float-sum parity risk), densify over [min_hour, max_hour] and fill
    gaps by carrying the previous observed hour's value (vectorized
    searchsorted — never a Python loop over grid cells). Sibling of
    q145's per-user daily ASOF spine and q112's zero-fill: this is
    the per-type dense hourly grid with carry-forward semantics and
    explicit gap flags. One exchange
    keyed on the type (its whole timeline co-locates); NUL-safe coded
    group keys. Contract: NULL ts/type and non-finite values are out;
    the grid is anchored on observed hours so no leading gap exists."""
    from .pairs import factorize_strings, hash_shuffle, str_u64

    HOUR = 3_600_000_000
    _E = pa.table({"ty": pa.array([], pa.string()),
                   "h": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"event_type", "ts", "value"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        v = t.column("value").to_numpy(
            zero_copy_only=False).astype(np.float64)
        ts_ok = pc.and_(pc.is_valid(t.column("ts")),
                        pc.is_valid(t.column("event_type"))).to_numpy(
            zero_copy_only=False)
        keep = np.isfinite(v) & ts_ok
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        v = v[keep]
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        h = np.floor_divide(us, HOUR)
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        codes, uniq = factorize_strings(ty)
        g = (pd.DataFrame({"tc": codes, "h": h, "v": v})
             .groupby(["tc", "h"], sort=False)["v"].max()
             .reset_index())
        names = [uniq[i] for i in g["tc"]]
        return pa.table({
            "ty": pa.array(names, pa.string()),
            "h": pa.array(g["h"].to_numpy(np.int64)),
            "v": pa.array(g["v"].to_numpy(np.float64)),
            "bucket": pa.array(np.array(
                [str_u64(x) & (P - 1) for x in names], np.int64))})

    _EO = pa.table({"event_type": pa.array([], pa.string()),
                    "h": pa.array([], pa.int64()),
                    "vmax": pa.array([], pa.float64()),
                    "is_gap": pa.array([], pa.int64())})

    def merge(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _EO
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"])
        frames = []
        for tc, sub in df.assign(tc=codes).groupby("tc"):
            obs = sub.groupby("h")["v"].max().sort_index()
            oh = obs.index.to_numpy(np.int64)
            ov = obs.to_numpy(np.float64)
            grid = np.arange(oh[0], oh[-1] + 1, dtype=np.int64)
            pos = np.searchsorted(oh, grid, side="right") - 1
            filled = ov[pos]
            gap = np.ones(len(grid), bool)
            gap[oh - oh[0]] = False
            frames.append(pd.DataFrame({
                "event_type": np.full(len(grid), uniq[tc], object),
                "h": grid, "vmax": filled,
                "is_gap": gap.astype(np.int64)}))
        if not frames:
            return _EO
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "event_type": pa.array(list(out["event_type"]),
                                   pa.string()),
            "h": pa.array(out["h"].to_numpy(np.int64)),
            "vmax": pa.array(out["vmax"].to_numpy(np.float64)),
            "is_gap": pa.array(out["is_gap"].to_numpy(np.int64))})

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "value"])
    if as_refs:
        import ray.data as rd

        futs = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                            split, merge, P=P, gather=False)
        return rd.from_arrow_refs(futs)
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if p.num_rows]
    if not parts:
        return merge().to_pandas()
    out = pa.concat_tables(parts).to_pandas()
    out = out.sort_values("h", kind="stable")
    # single-column object sort is comparison-based and exact
    key = out["event_type"].map(
        lambda s: s.encode("utf-8", "surrogatepass").hex())
    out = out.loc[key.sort_values(kind="stable").index]
    return out.reset_index(drop=True)



def q_gap_fill_locf_ds(sf_dir: str, P: int = 16):
    """Dataset-returning core of q363 (scale-safe per-row oracle
    contract): per-type dense grids stream from the merge tasks to
    parquet without a driver concat."""
    return q_gap_fill_locf(sf_dir, P=P, as_refs=True)

def q_calibration_brier(sf_dir: str, P: int = 8) -> pd.DataFrame:
    """Calibration report + per-bin Brier score for a deterministic
    purchase-propensity score — the model-eval table every scoring
    pipeline emits. The score stands in for a model head: the 52-bit
    md5 coin (the module's SQL-provable deterministic-randomness
    pattern) quantized to the 1/1000 grid, p = (m + 0.5)/1000, so
    every Brier term is exact integer arithmetic until ONE final
    float expression per bin (Σ(2m+1)², 2Σm_pos+n_pos carried as
    ints — no float sum ever crosses rows). Label = user ever fired
    a 'purchase'. One exchange on user (per-user label OR + md5 once
    per user inside the bucket); the driver folds P fixed-size
    10×5 partials. All 10 bins always emit (NULL metrics when
    empty)."""
    import hashlib

    from .pairs import hash_shuffle, mix64, round_away

    _E = pa.table({"u": pa.array([], pa.int64()),
                   "y": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"user_id", "event_type"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("user_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = pc.equal(pc.fill_null(t2.column("event_type"), ""),
                     "purchase").to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"u": u, "y": y.astype(np.int64)})
             .groupby("u", sort=False)["y"].max().reset_index())
        return pa.table({
            "u": pa.array(g["u"].to_numpy(np.int64)),
            "y": pa.array(g["y"].to_numpy(np.int64)),
            "bucket": pa.array((mix64(g["u"].to_numpy(np.int64))
                                % P).astype(np.int64))})

    def merge(*tabs) -> np.ndarray:
        acc = np.zeros((10, 5), np.int64)  # n, sm, pos, A, bb
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return acc
        df = pa.concat_tables(live).to_pandas()
        g = df.groupby("u", sort=False)["y"].max()
        for u, y in g.items():
            m = int(hashlib.md5(f"cal|{int(u)}".encode()
                                ).hexdigest()[:13], 16) % 1000
            b = m // 100
            acc[b, 0] += 1
            acc[b, 1] += m
            acc[b, 2] += int(y)
            acc[b, 3] += (2 * m + 1) * (2 * m + 1)
            acc[b, 4] += 2 * m * int(y) + int(y)
        return acc

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    acc = np.zeros((10, 5), np.int64)
    for p in parts:
        acc += np.asarray(p, np.int64)
    n, sm, pos, a, bb = (acc[:, i] for i in range(5))
    mean_p = np.full(10, np.nan)
    frac = np.full(10, np.nan)
    brier = np.full(10, np.nan)
    for i in range(10):
        if n[i] > 0:
            mean_p[i] = float(2 * sm[i] + n[i]) / (2000.0 * n[i])
            frac[i] = pos[i] / float(n[i])
            brier[i] = (a[i] / 4000000.0 - bb[i] / 1000.0
                        + pos[i]) / n[i]
    return pd.DataFrame({
        "bin": np.arange(10, dtype=np.int64),
        "n": n.astype(np.int64),
        "mean_p": round_away(mean_p, 6),
        "frac_pos": round_away(frac, 6),
        "brier": round_away(brier, 6)})


def q_gini_revenue(sf_dir: str, P: int = 8) -> pd.DataFrame:
    """Gini coefficient of order revenue per customer nation — the
    GROUPED variant of q143's global Gini (q143 runs one distributed
    sort + prefix-offset rank pass for the single global coefficient;
    this plan co-locates each nation's distribution in a keyed bucket
    — right when the group count is bounded and every group needs its
    own coefficient; q346's whale curve is the cumulative view),
    computed EXACT: order totals become integer cents (round(price·100), the
    sf1 money rule), the rank-weighted numerator 2Σi·x₍ᵢ₎ − (n+1)Σx
    is accumulated as Python ints (the i·x dot product is chunked so
    every int64 partial provably fits — Σi·x alone overflows int64 at
    sf1 row counts), and ONE double division lands at the end, in
    the oracle's own operand order. Customer nation is the broadcast
    small side (duplicate custkey rows fan out multiplicatively like
    SQL's join — per-batch pandas merge on int keys); one exchange
    keyed on nation co-locates each nation's distribution; ties in
    the rank order don't affect Σi·x, so the in-bucket np.sort is
    exact. Bounded-cardinality per-group sort by contract (nations
    are a fixed dimension — the unbounded-group case uses q99's
    rank-refinement instead). NULL/non-finite totals are out;
    Σx = 0 yields NULL."""
    import ray

    from .pairs import hash_shuffle, round_away

    _NKNULL = np.iinfo(np.int64).min
    cust = _read_pd(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"])
    dim = pd.DataFrame({
        "ck": cust["c_custkey"].to_numpy(np.int64),
        "nk": cust["c_nationkey"].astype("float64")
        .fillna(float(_NKNULL)).to_numpy(np.float64)
        .astype(np.int64)})
    dim_ref = ray.put(dim)

    _E = pa.table({"nk": pa.array([], pa.int64()),
                   "cents": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, dref) -> pa.Table:
        need = {"o_custkey", "o_totalprice"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        x = t.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = np.isfinite(x) & pc.is_valid(
            t.column("o_custkey")).to_numpy(zero_copy_only=False)
        if not keep.any():
            return _E
        ck = pc.fill_null(t.column("o_custkey").cast(pa.int64()),
                          0).to_numpy(
            zero_copy_only=False)[keep].astype(np.int64)
        x = x[keep]
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        df = pd.DataFrame({"ck": ck, "cents": cents})
        j = df.merge(dref, on="ck", how="inner")  # int keys: NUL-safe
        if not len(j):
            return _E
        nk = j["nk"].to_numpy(np.int64)
        return pa.table({
            "nk": pa.array(nk),
            "cents": pa.array(j["cents"].to_numpy(np.int64)),
            "bucket": pa.array(
                (nk.astype(np.uint64) % np.uint64(P))
                .astype(np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live).to_pandas()
        out = []
        for nk, sub in df.groupby("nk", sort=False):
            xs = np.sort(sub["cents"].to_numpy(np.int64))
            n = len(xs)
            cmax = int(np.abs(xs).max(initial=0))
            # int64-provable chunked exact sums (CLAUDE.md sf1 rule)
            ch = max(1, (1 << 62) // max(1, cmax))
            sx = sum(int(xs[s0:s0 + ch].sum(dtype=np.int64))
                     for s0 in range(0, n, ch))
            chd = max(1, (1 << 62) // max(1, cmax * n))
            idx = np.arange(1, n + 1, dtype=np.int64)
            six = sum(int(np.dot(idx[s0:s0 + chd],
                                 xs[s0:s0 + chd]))
                      for s0 in range(0, n, chd))
            out.append((int(nk), n, sx, six))
        return out

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"])
    parts = hash_shuffle(
        [(r, (dim_ref,)) for r in ds.to_arrow_refs()],
        split, merge, P=P)
    rows = [r for p in parts for r in p]
    cols = {"nationkey": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64"),
            "gini": pd.Series(dtype="float64")}
    if not rows:
        return pd.DataFrame(cols)
    rows.sort(key=lambda r: (r[0] == _NKNULL, r[0]))
    nk_out, n_out, g_out = [], [], []
    for nk, n, sx, six in rows:
        nk_out.append(np.nan if nk == _NKNULL else float(nk))
        n_out.append(n)
        if sx == 0:
            g_out.append(np.nan)
        else:
            num = 2 * six - (n + 1) * sx
            g_out.append(float(num) / (float(n) * float(sx)))
    return pd.DataFrame({
        "nationkey": np.array(nk_out, np.float64),
        "n": pd.array(n_out, "int64"),
        "gini": round_away(np.array(g_out, np.float64), 6)})


def q_bloom_semijoin(sf_dir: str, min_size: int = 45,
                     P: int = 16) -> pd.DataFrame:
    """Bloom-filtered distributed semi-join — the scale technique for
    'filter the 100-TB fact table by a selective dimension subset'
    without shipping the fact table into a full join exchange:

    1. the bloom filter over qualifying part keys (p_size ≥ min_size)
       is built DISTRIBUTED — each part block contributes a 0/1 bit
       vector, ``tree_sum`` merges them additively and >0 recovers the
       OR, so the driver never materializes the key list;
    2. every lineitem block prunes against the broadcast bloom (128 KB
       regardless of dimension size; bloom negatives are guaranteed
       true negatives, so pruning is lossless);
    3. only the surviving ~selectivity fraction enters one hash
       exchange on partkey, where co-located part keys verify
       candidates EXACTLY — bloom false positives die here, so the
       result is byte-identical to SQL's IN semi-join (set semantics:
       duplicate dimension rows do NOT fan out).

    Money stays exact-int cents end-to-end (sum emitted as BIGINT —
    no float ever). NULL returnflag is a group; NULL partkey/price
    rows are out of contract."""
    import ray

    from .pairs import hash_shuffle, mix64, tree_sum

    M = 1 << 20  # bloom bits
    K = 4        # hashes
    _NULLF = "\x00NULLFLAG"

    def _positions(keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        h1 = mix64(k)
        h2 = mix64(k ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        pos = np.empty((K, len(keys)), np.int64)
        for i in range(K):
            pos[i] = ((h1 + np.uint64(i) * h2)
                      % np.uint64(M)).astype(np.int64)
        return pos

    def block_bits(block: pa.Table):
        need = {"p_partkey", "p_size"}
        if block.num_rows == 0 or not need <= set(block.schema.names):
            return None
        keep = pc.and_(pc.is_valid(block.column("p_partkey")),
                       pc.greater_equal(
                           pc.fill_null(block.column("p_size"),
                                        -(1 << 30)), min_size))
        b2 = block.filter(keep)
        if b2.num_rows == 0:
            return None
        keys = b2.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bits = np.zeros(M, np.float64)
        bits[_positions(keys).ravel()] = 1.0
        return bits

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_size"])
    vec = tree_sum(part_ds, block_bits, name="bloom")
    bloom = (np.zeros(M, bool) if vec is None
             else np.asarray(vec) > 0)
    bloom_ref = ray.put(bloom)

    _E = pa.table({"pk": pa.array([], pa.int64()),
                   "dim": pa.array([], pa.bool_()),
                   "flag": pa.array([], pa.string()),
                   "cents": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table, bref) -> pa.Table:
        if t.num_rows == 0:
            return _E
        names = set(t.schema.names)
        if "p_partkey" in names:  # dimension side: qualifying keys
            keep = pc.and_(pc.is_valid(t.column("p_partkey")),
                           pc.greater_equal(
                               pc.fill_null(t.column("p_size"),
                                            -(1 << 30)), min_size))
            t2 = t.filter(keep)
            if t2.num_rows == 0:
                return _E
            pk = np.unique(t2.column("p_partkey").cast(pa.int64())
                           .to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            n = len(pk)
            return pa.table({
                "pk": pa.array(pk),
                "dim": pa.array(np.ones(n, bool)),
                "flag": pa.array([""] * n, pa.string()),
                "cents": pa.array(np.zeros(n, np.int64)),
                "bucket": pa.array(
                    (mix64(pk) % np.uint64(P)).astype(np.int64))})
        if "l_partkey" not in names:
            return _E
        x = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("l_partkey")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        x = x[keep]
        pk = t2.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # lossless bloom prune: only candidates enter the exchange
        hit = bref[_positions(pk)].all(axis=0)
        if not hit.any():
            return _E
        t3 = t2.filter(pa.array(hit))
        pk = pk[hit]
        x = x[hit]
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        flags = pd.Series(t3.column("l_returnflag").to_pylist(),
                          dtype=object)
        fkey = flags.where(flags.isna(), "S" + flags).fillna(_NULLF)
        return pa.table({
            "pk": pa.array(pk),
            "dim": pa.array(np.zeros(len(pk), bool)),
            "flag": pa.array(list(fkey), pa.string()),
            "cents": pa.array(cents),
            "bucket": pa.array(
                (mix64(pk) % np.uint64(P)).astype(np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live).to_pandas()
        dimkeys = set(df.loc[df["dim"], "pk"].tolist())
        fact = df[~df["dim"] & df["pk"].isin(dimkeys)]
        if not len(fact):
            return []
        from .pairs import factorize_strings
        codes, uniq = factorize_strings(fact["flag"],
                                        use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        cents = np.zeros(len(uniq), np.int64)
        np.add.at(cents, codes, fact["cents"].to_numpy(np.int64))
        return [(uniq[i], int(n[i]), int(cents[i]))
                for i in range(len(uniq))]

    line_ds = _read(sf_dir, "lineitem",
                    columns=["l_partkey", "l_returnflag",
                             "l_extendedprice"])
    inputs = ([(r, (bloom_ref,)) for r in line_ds.to_arrow_refs()]
              + [(r, (bloom_ref,)) for r in part_ds.to_arrow_refs()])
    parts = hash_shuffle(inputs, split, merge, P=P)
    agg: dict = {}
    for p in parts:
        for fk, n, c in p:
            a = agg.setdefault(fk, [0, 0])
            a[0] += n
            a[1] += c
    cols = {"returnflag": pd.Series(dtype="object"),
            "n_items": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64")}
    if not agg:
        return pd.DataFrame(cols)
    keys = sorted(agg, key=lambda s: (s == _NULLF, s))
    return pd.DataFrame({
        "returnflag": pd.Series(
            [None if k == _NULLF else k[1:] for k in keys],
            dtype=object),
        "n_items": pd.array([agg[k][0] for k in keys], "int64"),
        "revenue_cents": pd.array([agg[k][1] for k in keys],
                                  "int64")})


def q_cuped_adjustment(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """CUPED variance reduction per market segment — the experiment-
    analysis primitive: with per-customer pre-period revenue x
    (orders before the cutoff) and post-period revenue y, θ =
    cov(x,y)/var(x) and the achievable variance reduction is corr².
    EXACT-INT MONEY DISCIPLINE (sf1 rule): revenues are integer
    cents, all five moments (Σx, Σy, Σx², Σy², Σxy) accumulate as
    Python ints (per-term x·y ~ 1e22 overflows int64; the oracle's
    HUGEINT holds the telescoped n·Σxy − ΣxΣy forms, probed ≤ 2e32),
    and each output is ONE double expression over exact ints in the
    oracle's operand order — cov² overflows even HUGEINT, so BOTH
    sides square in doubles. One exchange on custkey builds the
    per-customer (x, y) pairs; the segment dimension is the broadcast
    small side (duplicate rows duplicate the observation, SQL join
    semantics); the driver folds P per-segment moment partials.
    var(x)=0 → θ NULL; var(x)·var(y)=0 → reduction NULL."""
    from .pairs import hash_shuffle, mix64, round_away

    CUT_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC, µs
    _NULLS = "\x00NULLSEG"

    cust = _read_pd(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    seg = cust["c_mktsegment"].astype(object)
    # hex-encoded segment keys: the in-bucket pandas groupby would
    # otherwise NUL-merge 'FZ' with 'FZ\x00s' (fuzz-planted pair)
    dim = pd.DataFrame({
        "ck": cust["c_custkey"].to_numpy(np.int64),
        "seg": seg.where(seg.notna(), None).map(
            lambda s: _NULLS if s is None
            else "S" + s.encode("utf-8", "surrogatepass").hex())})

    _E = pa.table({"ck": pa.array([], pa.int64()),
                   "x": pa.array([], pa.int64()),
                   "y": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"o_custkey", "o_totalprice", "o_orderdate"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        v = t.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(v)
                & pc.is_valid(t.column("o_custkey")).to_numpy(
                    zero_copy_only=False)
                & pc.is_valid(t.column("o_orderdate")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        v = v[keep]
        ck = t2.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        us = t2.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(v >= 0, np.floor(v * 100.0 + 0.5),
                         -np.floor(-v * 100.0 + 0.5)).astype(np.int64)
        pre = us < CUT_US
        g = (pd.DataFrame({"ck": ck,
                           "x": np.where(pre, cents, 0),
                           "y": np.where(pre, 0, cents)})
             .groupby("ck", sort=False).sum().reset_index())
        cks = g["ck"].to_numpy(np.int64)
        return pa.table({
            "ck": pa.array(cks),
            "x": pa.array(g["x"].to_numpy(np.int64)),
            "y": pa.array(g["y"].to_numpy(np.int64)),
            "bucket": pa.array(
                (mix64(cks) % np.uint64(P)).astype(np.int64))})

    def make_merge(dref):
        def merge(*tabs) -> list:
            live = [x.drop_columns(["bucket"])
                    for x in tabs if x.num_rows]
            if not live:
                return []
            df = (pa.concat_tables(live).to_pandas()
                  .groupby("ck", sort=False).sum().reset_index())
            j = df.merge(dref, on="ck", how="inner")
            if not len(j):
                return []
            out = []
            for sk, sub in j.groupby("seg", sort=False):
                xs = sub["x"].tolist()
                ys = sub["y"].tolist()
                n = len(xs)
                sx = sum(int(a) for a in xs)
                sy = sum(int(b) for b in ys)
                sxx = sum(int(a) * int(a) for a in xs)
                syy = sum(int(b) * int(b) for b in ys)
                sxy = sum(int(a) * int(b) for a, b in zip(xs, ys))
                out.append((sk, n, sx, sy, sxx, syy, sxy))
            return out
        return merge

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice", "o_orderdate"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, make_merge(dim), P=P)
    agg: dict = {}
    for p in parts:
        for sk, n, sx, sy, sxx, syy, sxy in p:
            a = agg.setdefault(sk, [0, 0, 0, 0, 0, 0])
            a[0] += n
            a[1] += sx
            a[2] += sy
            a[3] += sxx
            a[4] += syy
            a[5] += sxy
    cols = {"segment": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "theta": pd.Series(dtype="float64"),
            "var_reduction": pd.Series(dtype="float64")}
    if not agg:
        return pd.DataFrame(cols)
    keys = sorted(agg, key=lambda s: (s == _NULLS, s))
    th, vr = [], []
    for k in keys:
        n, sx, sy, sxx, syy, sxy = agg[k]
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        th.append(float(cov) / float(vx) if vx != 0 else np.nan)
        vr.append((float(cov) * float(cov))
                  / (float(vx) * float(vy))
                  if vx != 0 and vy != 0 else np.nan)
    return pd.DataFrame({
        "segment": pd.Series(
            [None if k == _NULLS
             else bytes.fromhex(k[1:]).decode("utf-8",
                                              "surrogatepass")
             for k in keys], dtype=object),
        "n": pd.array([agg[k][0] for k in keys], "int64"),
        "theta": round_away(np.array(th, np.float64), 6),
        "var_reduction": round_away(np.array(vr, np.float64), 6)})


def q_rank_fusion(sf_dir: str, kc: int = 60, P: int = 8) -> pd.DataFrame:
    """Reciprocal rank fusion of two brand rankings (revenue rank ⊕
    item-count rank, RRF constant 60) — the standard search/result
    merging primitive (Cormack et al.). Revenue is exact-int cents;
    ranks are SQL rank() semantics (ties share the rank = 1 + count
    of strictly-greater values, computed vectorized); the fused score
    is a FIXED two-term float expression per row — no float aggregate
    ever forms, so parity is exact. Aggregate-domain companion to
    q219's row-level RRF: q219 fuses two GLOBAL event rankings
    (distributed sorts, unique tie-break chain); this one fuses
    grouped aggregates where SQL rank() ties are the point. Part brand is the broadcast small
    side with duplicate-row multiplicity (q08 rule); one streamed
    pass over lineitem emits per-brand int partials and the driver
    ranks the ~|brands| rows. NULL brand is a group; NULL
    partkey/price rows are out of contract."""
    from .pairs import factorize_strings, round_away

    _NULLB = "\x00NULLBRAND"
    part = _read_pd(sf_dir, "part",
                 columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"]
    ok = pk.notna()
    br = part["p_brand"].astype(object)
    dim = pd.DataFrame({
        "pk": pk[ok].to_numpy(np.int64),
        "brand": br[ok].where(br[ok].notna(), None).map(
            lambda s: _NULLB if s is None else "S" + s)})

    _E = pa.table({"brand": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "cents": pa.array([], pa.int64())})

    def partial(t: pa.Table, dimdf=dim) -> pa.Table:
        need = {"l_partkey", "l_extendedprice"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        x = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("l_partkey")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        x = x[keep]
        lpk = t2.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        j = (pd.DataFrame({"pk": lpk, "cents": cents})
             .merge(dimdf, on="pk", how="inner"))  # dup rows fan out
        if not len(j):
            return _E
        codes, uniq = factorize_strings(j["brand"],
                                        use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, codes, j["cents"].to_numpy(np.int64))
        return pa.table({"brand": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "cents": pa.array(c)})

    parts = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_extendedprice"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"brand": pd.Series(dtype="object"),
            "n_items": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
            "r_rev": pd.Series(dtype="int64"),
            "r_cnt": pd.Series(dtype="int64"),
            "rrf": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["brand"],
                                    use_na_sentinel=False)
    m = len(uniq)
    n = np.zeros(m, np.int64)
    c = np.zeros(m, np.int64)
    np.add.at(n, codes, parts["n"].to_numpy(np.int64))
    np.add.at(c, codes, parts["cents"].to_numpy(np.int64))
    # SQL rank(): 1 + count of strictly greater
    r_rev = 1 + (c[:, None] < c[None, :]).sum(axis=1)
    r_cnt = 1 + (n[:, None] < n[None, :]).sum(axis=1)
    rrf = 1.0 / (kc + r_rev) + 1.0 / (kc + r_cnt)
    out = pd.DataFrame({
        "brand": pd.Series(
            [None if u == _NULLB else u[1:] for u in uniq],
            dtype=object),
        "n_items": n, "revenue_cents": c,
        "r_rev": r_rev.astype(np.int64),
        "r_cnt": r_cnt.astype(np.int64),
        "rrf": round_away(rrf, 6)})
    key = out["brand"].map(
        lambda s: (1, "") if s is None
        else (0, s.encode("utf-8", "surrogatepass").hex()))
    out = (out.assign(_k=key)
           .sort_values("_k", kind="stable")
           .sort_values("rrf", kind="stable", ascending=False)
           .drop(columns="_k"))
    return out.reset_index(drop=True)


def q_independence_residuals(sf_dir: str) -> pd.DataFrame:
    """Pearson standardized residuals of the event_type × weekday
    contingency table — the independence heatmap behind a χ² test,
    emitted PER CELL so no order-sensitive float sum ever forms (the
    χ² total is a float Σ over cells; the residual (o−e)/√e is a
    fixed expression over exact ints per cell — the q359 Σ-of-
    squares discipline taken one step further). The per-cell
    decomposition of q136's global type×hour χ² statistic, on the
    weekday axis — WHICH cells drive the dependence, not just
    whether it exists. Weekday is the
    floored-epoch-day mod 7 (pre-1970 rule, 0 = Thursday). One
    streamed pass of per-block (type, weekday) int partials — cell
    cardinality is |types|·7, so the driver fold is tiny; marginals
    and residuals are computed once from exact counts. Zero cells of
    observed (type, weekday) pairs emit with their expected mass;
    weekdays with zero GLOBAL mass are skipped (√0 guard, matching
    the oracle's inner join). NULL ts/type out of contract."""
    from .pairs import factorize_strings, round_away

    DAY = 86_400_000_000
    _E = pa.table({"ty": pa.array([], pa.string()),
                   "wd": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        need = {"event_type", "ts"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.and_(pc.is_valid(t.column("ts")),
                       pc.is_valid(t.column("event_type")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wd = np.mod(np.floor_divide(us, DAY), 7)  # np.mod floors ✓
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        codes, uniq = factorize_strings(ty)
        g = (pd.DataFrame({"tc": codes, "wd": wd})
             .groupby(["tc", "wd"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({
            "ty": pa.array([uniq[i] for i in g["tc"]], pa.string()),
            "wd": pa.array(g["wd"].to_numpy(np.int64)),
            "c": pa.array(g["c"].to_numpy(np.int64))})

    parts = _read(sf_dir, "events", columns=["event_type", "ts"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"event_type": pd.Series(dtype="object"),
            "wd": pd.Series(dtype="int64"),
            "obs": pd.Series(dtype="int64"),
            "expected": pd.Series(dtype="float64"),
            "std_resid": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["ty"])
    k = len(uniq)
    obs = np.zeros((k, 7), np.int64)
    np.add.at(obs, (codes, parts["wd"].to_numpy(np.int64)),
              parts["c"].to_numpy(np.int64))
    rt = obs.sum(axis=1)
    ct = obs.sum(axis=0)
    n = int(obs.sum())
    live_wd = [w for w in range(7) if ct[w] > 0]
    order = sorted(range(k), key=lambda i: uniq[i].encode(
        "utf-8", "surrogatepass").hex())
    rows = []
    for i in order:
        for w in live_wd:
            e = float(int(rt[i]) * int(ct[w])) / n
            o = int(obs[i, w])
            rows.append((uniq[i], w, o, e, (o - e) / np.sqrt(e)))
    return pd.DataFrame({
        "event_type": pd.Series([r[0] for r in rows], dtype=object),
        "wd": pd.array([r[1] for r in rows], "int64"),
        "obs": pd.array([r[2] for r in rows], "int64"),
        "expected": round_away(np.array([r[3] for r in rows],
                                        np.float64), 6),
        "std_resid": round_away(np.array([r[4] for r in rows],
                                         np.float64), 6)})
_POIS1_T = (1656781714176974, 3313563428353948, 4141954285442435,
            4418084571138597, 4487117142562638)  # floor(cdf·2^52)


def q_poisson_bootstrap(sf_dir: str, B: int = 32) -> pd.DataFrame:
    """Percentile bootstrap CI for the per-segment mean order value,
    via the POISSON BOOTSTRAP — the bootstrap that distributes: each
    replicate's resample weight w ~ Poisson(1) is drawn per
    (replicate, orderkey) from the 52-bit md5 coin against EXACT
    integer CDF thresholds (floor(cdf·2^52) literals on both sides —
    the module's SQL-provable randomness pattern), so every row can
    compute all B weights locally and no replicate ever needs a
    global resample pass (q238 pioneered the technique for event
    values with mix64 draws and a rows-only check; this variant's
    md5-threshold draws are SQL-reproducible, making the bootstrap
    itself oracle-checkable). Per (segment, replicate) the weighted sum
    stays integer cents; each replicate mean is ONE double division;
    the CI bounds are quantile_disc ELEMENT SELECTIONS over the B
    replicate means (no float aggregate anywhere). Streamed pass of
    per-block (segment × B) int partials; the segment dimension is
    the broadcast small side with duplicate-row fanout. Replicates
    whose total weight is 0 are dropped from the selection (SQL
    NULL-mean rows, quantile ignores them). Contract: NULL
    orderkey/custkey/price and non-finite prices are out."""
    import hashlib

    from .pairs import round_away

    _NULLS = "\x00NULLSEG"
    cust = _read_pd(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"]
    ok = ck.notna()
    seg = cust["c_mktsegment"].astype(object)
    dim = pd.DataFrame({
        "ck": ck[ok].to_numpy(np.int64),
        "seg": seg[ok].where(seg[ok].notna(), None).map(
            lambda s: _NULLS if s is None
            else "S" + s.encode("utf-8", "surrogatepass").hex())})

    _E = pa.table({"seg": pa.array([], pa.string()),
                   "b": pa.array([], pa.int64()),
                   "sw": pa.array([], pa.int64()),
                   "nw": pa.array([], pa.int64()),
                   "sc": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64())})

    def partial(t: pa.Table, dimdf=dim, reps=B) -> pa.Table:
        need = {"o_orderkey", "o_custkey", "o_totalprice"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        x = t.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("o_custkey")).to_numpy(
                    zero_copy_only=False)
                & pc.is_valid(t.column("o_orderkey")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        x = x[keep]
        okey = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ckey = t2.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        j = (pd.DataFrame({"ck": ckey, "okey": okey, "cents": cents})
             .merge(dimdf, on="ck", how="inner"))
        if not len(j):
            return _E
        segk = j["seg"].to_numpy(object)
        okey = j["okey"].to_numpy(np.int64)
        cents = j["cents"].to_numpy(np.int64)
        w = np.empty((len(j), reps), np.int64)
        for r in range(len(j)):
            okb = str(int(okey[r]))
            for b in range(reps):
                u = int(hashlib.md5(
                    f"pb|{b}|{okb}".encode()).hexdigest()[:13], 16)
                k = 0
                for thr in _POIS1_T:
                    if u < thr:
                        break
                    k += 1
                w[r, b] = k
        codes, uniq = pd.factorize(pd.Series(segk, dtype=object))
        # seg keys are hex-encoded → pandas NUL hash bug can't bite
        m = len(uniq)
        sw = np.zeros((m, reps), np.int64)
        nw = np.zeros((m, reps), np.int64)
        for b in range(reps):
            np.add.at(sw[:, b], codes, w[:, b] * cents)
            np.add.at(nw[:, b], codes, w[:, b])
        sc = np.zeros(m, np.int64)
        nn = np.zeros(m, np.int64)
        np.add.at(sc, codes, cents)
        np.add.at(nn, codes, np.ones(len(j), np.int64))
        segs, bs, sws, nws, scs, ns = [], [], [], [], [], []
        for i in range(m):
            for b in range(reps):
                segs.append(uniq[i])
                bs.append(b)
                sws.append(int(sw[i, b]))
                nws.append(int(nw[i, b]))
                scs.append(int(sc[i]) if b == 0 else 0)
                ns.append(int(nn[i]) if b == 0 else 0)
        return pa.table({"seg": pa.array(segs, pa.string()),
                         "b": pa.array(bs, pa.int64()),
                         "sw": pa.array(sws, pa.int64()),
                         "nw": pa.array(nws, pa.int64()),
                         "sc": pa.array(scs, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"segment": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "mean_cents": pd.Series(dtype="float64"),
            "ci_lo": pd.Series(dtype="float64"),
            "ci_hi": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    agg: dict = {}
    for seg0, b, sw, nw, sc, n in parts.itertuples(index=False):
        a = agg.setdefault(seg0, [np.zeros(B, object),
                                  np.zeros(B, object), 0, 0])
        a[0][b] += sw
        a[1][b] += nw
        a[2] += sc
        a[3] += n
    keys = sorted(agg, key=lambda s: (s == _NULLS, s))
    rows = []
    for k in keys:
        sw, nw, sc, n = agg[k]
        means = np.array([float(int(sw[b])) / int(nw[b])
                          for b in range(B) if int(nw[b]) > 0],
                         np.float64)
        means.sort()
        nb = len(means)
        if nb == 0:
            lo = hi = np.nan
        else:
            lo = means[int(np.ceil(0.025 * nb)) - 1] \
                if int(np.ceil(0.025 * nb)) >= 1 else means[0]
            hi = means[int(np.ceil(0.975 * nb)) - 1]
        name = (None if k == _NULLS
                else bytes.fromhex(k[1:]).decode("utf-8",
                                                 "surrogatepass"))
        rows.append((name, n, float(sc) / n if n else np.nan,
                     lo, hi))
    return pd.DataFrame({
        "segment": pd.Series([r[0] for r in rows], dtype=object),
        "n": pd.array([r[1] for r in rows], "int64"),
        "mean_cents": round_away(np.array([r[2] for r in rows],
                                          np.float64), 6),
        "ci_lo": round_away(np.array([r[3] for r in rows],
                                     np.float64), 6),
        "ci_hi": round_away(np.array([r[4] for r in rows],
                                     np.float64), 6)})


def q_mad_outliers(sf_dir: str, thr: float = 5.1891,
                   P: int = 8) -> pd.DataFrame:
    """Median-absolute-deviation outlier screen per event type — the
    robust z-score rule (|x − med| > 3.5·1.4826·MAD, the 5.1891
    literal shared verbatim with the oracle). Both the median and the
    MAD are quantile_disc ELEMENT SELECTIONS (index ceil(n/2)−1, the
    probed lower-middle rule — no float aggregation ever), and the
    outlier test is a fixed per-row double expression, so parity is
    exact. ONE exchange keyed on the type: a type's values co-locate
    once and both selection passes plus the count run in-bucket
    (bounded-cardinality per-group sort by contract; q99's
    rank-refinement is the unbounded path). Non-finite values are
    out of contract (DuckDB NaN comparison semantics diverge from
    IEEE); NULL type is out like q359."""
    from .pairs import factorize_strings, hash_shuffle, round_away, \
        str_u64

    _E = pa.table({"ty": pa.array([], pa.string()),
                   "x": pa.array([], pa.float64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"event_type", "value"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        x = t.column("value").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("event_type")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E
        t2 = t.filter(pa.array(keep))
        ty = t2.column("event_type").to_pylist()
        return pa.table({
            "ty": pa.array(ty, pa.string()),
            "x": pa.array(x[keep]),
            "bucket": pa.array(np.array(
                [str_u64(s) & (P - 1) for s in ty], np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"])
        out = []
        for tc, sub in df.assign(tc=codes).groupby("tc"):
            xs = np.sort(sub["x"].to_numpy(np.float64))
            n = len(xs)
            med = float(xs[int(np.ceil(0.5 * n)) - 1])
            ad = np.sort(np.abs(xs - med))
            mad = float(ad[int(np.ceil(0.5 * n)) - 1])
            n_out = int((np.abs(xs - med) > thr * mad).sum())
            out.append((uniq[tc], n, med, mad, n_out))
        return out

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    rows = [r for p in parts for r in p]
    cols = {"event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "med": pd.Series(dtype="float64"),
            "mad": pd.Series(dtype="float64"),
            "n_outliers": pd.Series(dtype="int64"),
            "outlier_rate": pd.Series(dtype="float64")}
    if not rows:
        return pd.DataFrame(cols)
    rows.sort(key=lambda r: r[0].encode("utf-8",
                                        "surrogatepass").hex())
    return pd.DataFrame({
        "event_type": pd.Series([r[0] for r in rows], dtype=object),
        "n": pd.array([r[1] for r in rows], "int64"),
        "med": np.array([r[2] for r in rows], np.float64),
        "mad": np.array([r[3] for r in rows], np.float64),
        "n_outliers": pd.array([r[4] for r in rows], "int64"),
        "outlier_rate": round_away(np.array(
            [r[4] / float(r[1]) for r in rows], np.float64), 6)})


def q_load_fairness(sf_dir: str, P: int = 16) -> pd.DataFrame:
    """Jain's fairness index of per-user event load, per event type —
    the skew audit for partition/load planning (J = (Σx)²/(n·Σx²),
    1 = perfectly even, 1/n = one user owns everything). EXACT:
    per-(type,user) counts finalize inside one hash exchange keyed on
    the pair, each bucket folds to per-type (n_users, Σx, Σx², max)
    partials — all mergeable, so types spanning buckets recombine on
    the driver (the q50 regroup rule) — and the index is one double
    division over exact ints (HUGEINT squares in the oracle). Also
    emits max/mean — the straggler ratio. NULL type/user out of
    contract."""
    from .pairs import factorize_strings, hash_shuffle, round_away, \
        str_u64

    _E = pa.table({"ty": pa.array([], pa.string()),
                   "u": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"event_type", "user_id"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.and_(pc.is_valid(t.column("event_type")),
                       pc.is_valid(t.column("user_id")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        codes, uniq = factorize_strings(ty)
        g = (pd.DataFrame({"tc": codes, "u": u})
             .groupby(["tc", "u"], sort=False).size()
             .reset_index(name="c"))
        names = [uniq[i] for i in g["tc"]]
        from .pairs import mix64

        umix = mix64(g["u"].to_numpy(np.int64))
        bucket = np.array(
            [(str_u64(n) ^ int(m)) & (P - 1)
             for n, m in zip(names, umix)], np.int64)
        return pa.table({"ty": pa.array(names, pa.string()),
                         "u": pa.array(g["u"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64)),
                         "bucket": pa.array(bucket)})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"])
        out = []
        for tc, sub in df.assign(tc=codes).groupby(
                ["tc", "u"], sort=False)["c"].sum().groupby(level=0):
            xs = sub.to_numpy(np.int64)
            sx = sum(int(v) for v in xs)
            sxx = sum(int(v) * int(v) for v in xs)
            out.append((uniq[tc], len(xs), sx, sxx, int(xs.max())))
        return out

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    agg: dict = {}
    for p in parts:
        for ty, nu, sx, sxx, mx in p:
            key = ty.encode("utf-8", "surrogatepass").hex()
            a = agg.setdefault(key, [ty, 0, 0, 0, 0])
            a[1] += nu
            a[2] += sx
            a[3] += sxx
            a[4] = max(a[4], mx)
    cols = {"event_type": pd.Series(dtype="object"),
            "n_users": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "jain": pd.Series(dtype="float64"),
            "max_over_mean": pd.Series(dtype="float64")}
    if not agg:
        return pd.DataFrame(cols)
    rows = [agg[k] for k in sorted(agg)]
    return pd.DataFrame({
        "event_type": pd.Series([r[0] for r in rows], dtype=object),
        "n_users": pd.array([r[1] for r in rows], "int64"),
        "n_events": pd.array([r[2] for r in rows], "int64"),
        "jain": round_away(np.array(
            [float(r[2] * r[2]) / (float(r[1]) * float(r[3]))
             for r in rows], np.float64), 6),
        "max_over_mean": round_away(np.array(
            [float(r[4] * r[1]) / r[2] for r in rows],
            np.float64), 6)})


def q_markov_accuracy(sf_dir: str, B: int = 32) -> pd.DataFrame:
    """Train/eval split for a majority-bigram next-event model — the
    sequence-model eval shape: bigrams whose successor fires before
    the cutoff train a per-type argmax predictor (count DESC, type
    bytes ASC tie rule); later bigrams score it. One user-keyed
    exchange builds adjacency with the full deterministic order
    (ts, event-id sentinel, type bytes — the q362 total order) and
    emits code-keyed (prev, next, train/test count) partials; the
    driver folds the |types|² bigram domain, takes the argmax and
    one division per type. Exact ints throughout. Output rows are
    the types observed as a test-bigram source; a type with no
    training mass predicts NULL and scores 0."""
    from .pairs import factorize_strings, hash_shuffle, round_away

    CUT_US = 1_705_881_600_000_000  # 2024-01-22 00:00:00 UTC
    _IM = np.iinfo(np.int64).max
    _E = pa.table({"u": pa.array([], pa.int64()),
                   "ts": pa.array([], pa.int64()),
                   "eid": pa.array([], pa.int64()),
                   "ty": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"user_id", "event_type", "ts"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        eid = (pc.fill_null(t2.column("event_id").cast(pa.int64()),
                            _IM).to_numpy(zero_copy_only=False)
               .astype(np.int64)
               if "event_id" in t2.schema.names
               else np.full(len(u), _IM, np.int64))
        return pa.table({
            "u": pa.array(u),
            "ts": pa.array(t2.column("ts").cast(pa.int64())
                           .to_numpy(zero_copy_only=False)),
            "eid": pa.array(eid),
            "ty": t2.column("event_type"),
            "bucket": pa.array((u % B).astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"prev": pd.Series(dtype="object"),
                "nxt": pd.Series(dtype="object"),
                "tr": pd.Series(dtype="int64"),
                "te": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        df = df.sort_values("ty", kind="stable")
        for k in ("eid", "ts", "u"):
            df = df.sort_values(k, kind="stable")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        ty = df["ty"].to_numpy(object)
        if len(u) < 2:
            return pd.DataFrame(cols)
        same = u[1:] == u[:-1]
        prevs = ty[:-1][same]
        nxts = ty[1:][same]
        is_tr = (ts[1:][same] < CUT_US)
        codes, uniq = factorize_strings(pd.Series(
            np.concatenate([prevs, nxts]) if len(prevs) else [],
            dtype=object))
        half = len(prevs)
        g = (pd.DataFrame({"pc": codes[:half], "nc": codes[half:],
                           "tr": is_tr, "te": ~is_tr})
             .groupby(["pc", "nc"], as_index=False, sort=False)
             [["tr", "te"]].sum())
        uarr = np.asarray(uniq, dtype=object)
        return pd.DataFrame({
            "prev": uarr[g["pc"].to_numpy()] if len(g) else
            pd.Series(dtype=object),
            "nxt": uarr[g["nc"].to_numpy()] if len(g) else
            pd.Series(dtype=object),
            "tr": g["tr"].astype("int64"),
            "te": g["te"].astype("int64")})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if len(p)]
    cols = {"prev_type": pd.Series(dtype="object"),
            "predicted": pd.Series(dtype="object"),
            "n_test": pd.Series(dtype="int64"),
            "n_correct": pd.Series(dtype="int64"),
            "accuracy": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    allb = pd.concat(parts, ignore_index=True)
    # fold across buckets on hex keys (bigram domain is tiny)
    hp = allb["prev"].map(
        lambda s: s.encode("utf-8", "surrogatepass").hex())
    hn = allb["nxt"].map(
        lambda s: s.encode("utf-8", "surrogatepass").hex())
    g = (pd.DataFrame({"hp": hp, "hn": hn,
                       "tr": allb["tr"].to_numpy(np.int64),
                       "te": allb["te"].to_numpy(np.int64)})
         .groupby(["hp", "hn"], as_index=False).sum())
    name = {}
    for h, s in zip(pd.concat([hp, hn]), pd.concat(
            [allb["prev"], allb["nxt"]])):
        name.setdefault(h, s)
    pred: dict = {}
    for hprev, sub in g[g["tr"] > 0].groupby("hp"):
        best = sub.sort_values("hn").sort_values(
            "tr", kind="stable", ascending=False).iloc[0]
        pred[hprev] = best["hn"]
    rows = []
    for hprev, sub in g[g["te"] > 0].groupby("hp"):
        n_test = int(sub["te"].sum())
        p = pred.get(hprev)
        n_corr = int(sub.loc[sub["hn"] == p, "te"].sum()) \
            if p is not None else 0
        rows.append((name[hprev],
                     name[p] if p is not None else None,
                     n_test, n_corr))
    rows.sort(key=lambda r: r[0].encode("utf-8",
                                        "surrogatepass").hex())
    return pd.DataFrame({
        "prev_type": pd.Series([r[0] for r in rows], dtype=object),
        "predicted": pd.Series([r[1] for r in rows], dtype=object),
        "n_test": pd.array([r[2] for r in rows], "int64"),
        "n_correct": pd.array([r[3] for r in rows], "int64"),
        "accuracy": round_away(np.array(
            [r[3] / float(r[2]) for r in rows], np.float64), 6)})
def q_segment_flows(sf_dir: str, B: int = 32) -> pd.DataFrame:
    """Week-over-week user segment flows — the alluvial/Sankey input:
    each user's segment in an epoch week is their DOMINANT event type
    (count DESC, type bytes ASC — deterministic argmax), and flows
    count users transitioning segment A → segment B between
    CONSECUTIVE weeks. One user-keyed exchange: a user's whole
    timeline co-locates, the per-(user, week) argmax and the w→w+1
    pairing are local to the bucket, and only (from, to, count) int
    partials leave it — the driver folds a |types|² matrix. Epoch
    weeks are floored day/7 (pre-1970 rule). NULL user/type/ts out
    of contract."""
    from .pairs import factorize_strings, hash_shuffle

    DAY = 86_400_000_000
    _E = pa.table({"u": pa.array([], pa.int64()),
                   "wk": pa.array([], pa.int64()),
                   "ty": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"user_id", "event_type", "ts"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.and_(pc.and_(pc.is_valid(t.column("user_id")),
                               pc.is_valid(t.column("event_type"))),
                       pc.is_valid(t.column("ts")))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        u = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        us = t2.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = np.floor_divide(np.floor_divide(us, DAY), 7)
        ty = pd.Series(t2.column("event_type").to_pylist(),
                       dtype=object)
        codes, uniq = factorize_strings(ty)
        g = (pd.DataFrame({"u": u, "wk": wk, "tc": codes})
             .groupby(["u", "wk", "tc"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({
            "u": pa.array(g["u"].to_numpy(np.int64)),
            "wk": pa.array(g["wk"].to_numpy(np.int64)),
            "ty": pa.array([uniq[i] for i in g["tc"]], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64)),
            "bucket": pa.array(
                (g["u"].to_numpy(np.int64) % B).astype(np.int64))})

    def merge(*tabs) -> list:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return []
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["ty"])
        df = (df.assign(tc=codes)
              .groupby(["u", "wk", "tc"], as_index=False)["c"].sum())
        # deterministic argmax: count DESC, type hex ASC
        hx = np.array([uniq[i].encode("utf-8", "surrogatepass").hex()
                       for i in df["tc"]], dtype=object)
        df = (df.assign(hx=hx)
              .sort_values("hx", kind="stable")
              .sort_values("c", kind="stable", ascending=False)
              .drop_duplicates(["u", "wk"]))  # int+int keys — safe
        df = df.sort_values(["u", "wk"], kind="stable")
        u = df["u"].to_numpy(np.int64)
        wk = df["wk"].to_numpy(np.int64)
        hxv = df["hx"].to_numpy(object)
        flows: dict = {}
        names: dict = {}
        tc = df["tc"].to_numpy(np.int64)
        for i in range(len(u) - 1):
            if u[i + 1] == u[i] and wk[i + 1] == wk[i] + 1:
                key = (hxv[i], hxv[i + 1])
                flows[key] = flows.get(key, 0) + 1
                names[hxv[i]] = uniq[tc[i]]
                names[hxv[i + 1]] = uniq[tc[i + 1]]
        return [(names[a], names[b], n)
                for (a, b), n in flows.items()]

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=B)
        if p]
    cols = {"from_type": pd.Series(dtype="object"),
            "to_type": pd.Series(dtype="object"),
            "n_users": pd.Series(dtype="int64")}
    agg: dict = {}
    for p in parts:
        for a, b, n in p:
            k = (a.encode("utf-8", "surrogatepass").hex(),
                 b.encode("utf-8", "surrogatepass").hex())
            e = agg.setdefault(k, [a, b, 0])
            e[2] += n
    if not agg:
        return pd.DataFrame(cols)
    rows = [agg[k] for k in sorted(agg)]
    return pd.DataFrame({
        "from_type": pd.Series([r[0] for r in rows], dtype=object),
        "to_type": pd.Series([r[1] for r in rows], dtype=object),
        "n_users": pd.array([r[2] for r in rows], "int64")})


def q_permutation_fdr(sf_dir: str, B: int = 32,
                      fdr_q10: int = 1) -> pd.DataFrame:
    """Randomization test per order priority (does this priority's
    mean order value differ from the rest?) with Benjamini–Hochberg
    FDR control across the m priorities — the multiple-testing
    discipline a metrics pipeline needs, built ENTIRELY on exact
    integers so the oracle is bit-for-bit:

    * statistic T = |n₂·S₁ − n₁·S₂| (cross-multiplied mean gap in
      integer cents — never a float mean);
    * B deterministic relabelings share ONE md5 draw u(b, orderkey)
      (the 52-bit coin), each test comparing u against its own
      exact-integer threshold floor(n_p·2⁵²/n) — Bernoulli(n_p/n)
      relabeling, the distributed randomization-test standard (an
      exact global permutation would need a shuffle per replicate);
    * the empirical p-value (1 + #{T_b ≥ T})/(B+1) stays a rational
      — BH's p₍ᵢ₎ ≤ i·q/m at q = 0.1 becomes the integer test
      10·m·(1+c₍ᵢ₎) ≤ i·(B+1), and the rejection set is
      tie-order-invariant (k = max passing rank).

    Two passes: tiny per-group (count, Σcents) observables, then one
    streamed pass emitting m×B int partials per block (the md5 loop
    is the q374 cost shape). NULL priority is a test group; NULL
    key/price and non-finite prices are out of contract."""
    import hashlib

    from .pairs import round_away

    _NULLP = "\x00NULLPRI"
    TWO52 = 1 << 52

    def keyed(v):
        return (_NULLP if v is None
                else "S" + v.encode("utf-8", "surrogatepass").hex())

    _E1 = pa.table({"p": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64())})

    def obs_partial(t: pa.Table) -> pa.Table:
        need = {"o_orderkey", "o_orderpriority", "o_totalprice"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E1
        x = t.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("o_orderkey")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return _E1
        t2 = t.filter(pa.array(keep))
        x = x[keep]
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        pk = [keyed(v) for v in
              t2.column("o_orderpriority").to_pylist()]
        codes, uniq = pd.factorize(pd.Series(pk, dtype=object))
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, codes, cents)
        return pa.table({"p": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "s": pa.array(s)})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority",
                        "o_totalprice"])
    obs = ds.map_batches(obs_partial,
                         batch_format="pyarrow").to_pandas()
    cols = {"priority": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "c_exceed": pd.Series(dtype="int64"),
            "p_value": pd.Series(dtype="float64"),
            "bh_reject": pd.Series(dtype="int64")}
    if not len(obs):
        return pd.DataFrame(cols)
    agg: dict = {}
    for pkey, n, s in obs.itertuples(index=False):
        a = agg.setdefault(pkey, [0, 0])
        a[0] += int(n)
        a[1] += int(s)
    groups = sorted(agg)  # hex-keyed → byte order
    N = sum(a[0] for a in agg.values())
    S = sum(a[1] for a in agg.values())
    m = len(groups)
    if N == 0:
        return pd.DataFrame(cols)
    thr = [agg[g][0] * TWO52 // N for g in groups]
    t_obs = [abs((N - agg[g][0]) * agg[g][1]
                 - agg[g][0] * (S - agg[g][1])) for g in groups]

    def perm_partial(t: pa.Table, thrs=tuple(thr), reps=B
                     ) -> pa.Table:
        need = {"o_orderkey", "o_orderpriority", "o_totalprice"}
        mloc = len(thrs)
        empty = pa.table({
            "cell": pa.array([], pa.int64()),
            "n1": pa.array([], pa.int64()),
            "s1": pa.array([], pa.int64())})
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return empty
        x = t.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (np.isfinite(x)
                & pc.is_valid(t.column("o_orderkey")).to_numpy(
                    zero_copy_only=False))
        if not keep.any():
            return empty
        t2 = t.filter(pa.array(keep))
        x = x[keep]
        okey = t2.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = np.where(x >= 0, np.floor(x * 100.0 + 0.5),
                         -np.floor(-x * 100.0 + 0.5)).astype(np.int64)
        u = np.empty((len(okey), reps), np.int64)
        for r in range(len(okey)):
            ok = str(int(okey[r]))
            for b in range(reps):
                u[r, b] = int(hashlib.md5(
                    f"pf|{b}|{ok}".encode()).hexdigest()[:13], 16)
        tarr = np.asarray(thrs, np.int64)
        n1 = np.zeros((mloc, reps), np.int64)
        s1 = np.zeros((mloc, reps), np.int64)
        for g in range(mloc):
            memb = u < tarr[g]
            n1[g] = memb.sum(axis=0)
            s1[g] = (memb * cents[:, None]).sum(axis=0)
        cell = np.arange(mloc * reps, dtype=np.int64)
        return pa.table({"cell": pa.array(cell),
                         "n1": pa.array(n1.reshape(-1)),
                         "s1": pa.array(s1.reshape(-1))})

    pp = ds.map_batches(perm_partial,
                        batch_format="pyarrow").to_pandas()
    n1 = np.zeros(m * B, np.int64)
    s1 = np.zeros(m * B, np.int64)
    if len(pp):
        np.add.at(n1, pp["cell"].to_numpy(np.int64),
                  pp["n1"].to_numpy(np.int64))
        np.add.at(s1, pp["cell"].to_numpy(np.int64),
                  pp["s1"].to_numpy(np.int64))
    n1 = n1.reshape(m, B)
    s1 = s1.reshape(m, B)
    c_exc = []
    for g in range(m):
        c = 0
        for b in range(B):
            tb = abs((N - int(n1[g, b])) * int(s1[g, b])
                     - int(n1[g, b]) * (S - int(s1[g, b])))
            if tb >= t_obs[g]:
                c += 1
        c_exc.append(c)
    # BH at q = 0.1 on exact rationals: sort by (c, group bytes)
    order = sorted(range(m), key=lambda i: (c_exc[i], groups[i]))
    k = 0
    for rank, i in enumerate(order, start=1):
        if 10 * m * (1 + c_exc[i]) <= rank * (B + 1) * fdr_q10:
            k = rank
    reject = {order[r - 1]: int(r <= k)
              for r in range(1, m + 1)}
    rows = sorted(range(m), key=lambda i: (groups[i] == _NULLP,
                                           groups[i]))
    return pd.DataFrame({
        "priority": pd.Series(
            [None if groups[i] == _NULLP
             else bytes.fromhex(groups[i][1:]).decode(
                 "utf-8", "surrogatepass") for i in rows],
            dtype=object),
        "n": pd.array([agg[groups[i]][0] for i in rows], "int64"),
        "c_exceed": pd.array([c_exc[i] for i in rows], "int64"),
        "p_value": round_away(np.array(
            [(1 + c_exc[i]) / float(B + 1) for i in rows],
            np.float64), 6),
        "bh_reject": pd.array([reject[i] for i in rows], "int64")})


def q_ring_rebalance(sf_dir: str, n_before: int = 16,
                     n_after: int = 17) -> pd.DataFrame:
    """Rendezvous (highest-random-weight) hashing rebalance audit —
    the partition-planning question 'what moves when a node joins':
    every customer key is assigned to argmax_node md5('ring|node|key')
    under N=16 and N=17 nodes, and the report shows per-node load
    before/after plus the moved-key count (HRW's guarantee: only keys
    whose argmax IS the new node move — ~1/17 of them — unlike
    modulo hashing's ~16/17 reshuffle; the md5 draws are the module's
    SQL-provable 52-bit coins, so the oracle reproduces the exact
    assignment). One streamed pass of per-block fixed-size partials
    (n_after loads + moved counter); ties on the 52-bit draw break to
    the smaller node id on both sides. NULL keys out of contract."""
    import hashlib

    from .pairs import round_away

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "nb": pa.array([], pa.int64()),
                          "na": pa.array([], pa.int64()),
                          "mv": pa.array([], pa.int64())})
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return empty
        keep = pc.is_valid(t.column("c_custkey"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return empty
        keys = t2.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nb = np.zeros(n_after, np.int64)
        na = np.zeros(n_after, np.int64)
        moved = 0
        for k in keys:
            ks = str(int(k))
            hs = [int(hashlib.md5(f"ring|{nd}|{ks}".encode()
                                  ).hexdigest()[:13], 16)
                  for nd in range(n_after)]
            b = max(range(n_before),
                    key=lambda nd: (hs[nd], -nd))
            a = max(range(n_after),
                    key=lambda nd: (hs[nd], -nd))
            nb[b] += 1
            na[a] += 1
            moved += int(a != b)
        return pa.table({
            "node": pa.array(np.arange(n_after, dtype=np.int64)),
            "nb": pa.array(nb), "na": pa.array(na),
            "mv": pa.array([moved] + [0] * (n_after - 1),
                           pa.int64())})

    ds = _read(sf_dir, "customer", columns=["c_custkey"])
    parts = ds.map_batches(partial,
                           batch_format="pyarrow").to_pandas()
    cols = {"node": pd.Series(dtype="int64"),
            "n_before": pd.Series(dtype="int64"),
            "n_after": pd.Series(dtype="int64"),
            "moved_keys": pd.Series(dtype="int64"),
            "moved_frac": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    nb = np.zeros(n_after, np.int64)
    na = np.zeros(n_after, np.int64)
    np.add.at(nb, parts["node"].to_numpy(np.int64),
              parts["nb"].to_numpy(np.int64))
    np.add.at(na, parts["node"].to_numpy(np.int64),
              parts["na"].to_numpy(np.int64))
    moved = int(parts["mv"].sum())
    total = int(nb.sum())
    if total == 0:
        return pd.DataFrame(cols)
    frac = moved / float(total)
    return pd.DataFrame({
        "node": np.arange(n_after, dtype=np.int64),
        "n_before": nb,
        "n_after": na,
        "moved_keys": pd.array([moved] * n_after, "int64"),
        "moved_frac": round_away(np.full(n_after, frac), 6)})
