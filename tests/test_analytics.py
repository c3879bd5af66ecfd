"""Unit tests for the analytics operator family (q121–q125): skyline
mask vs brute force, rank-with-ties boundary semantics, and the
shipping-priority join's SQL fan-out on duplicate dimension rows."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_skyline_mask_matches_bruteforce():
    from web_scrapper_ray.pipelines.analytics import _skyline_mask

    rng = np.random.RandomState(7)
    price = np.round(rng.uniform(0, 10, 200), 1)  # ties guaranteed
    size = rng.randint(0, 8, 200).astype(np.int64)
    got = _skyline_mask(price, size)
    for i in range(len(price)):
        dominated = bool(np.any(
            (price <= price[i]) & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))))
        assert got[i] == (not dominated), i
    # equal (price, size) duplicates: both survive
    m = _skyline_mask(np.array([1.0, 1.0]), np.array([3, 3]))
    assert m.all()


def test_skyline_partials_are_mergeable():
    """skyline(union) == skyline(concat of per-chunk skylines)."""
    from web_scrapper_ray.pipelines.analytics import _skyline_mask

    rng = np.random.RandomState(11)
    price = rng.uniform(0, 5, 300)
    size = rng.randint(0, 100, 300).astype(np.int64)
    whole = set(map(tuple, np.c_[price, size][_skyline_mask(price, size)]))
    surv_p, surv_s = [], []
    for lo in range(0, 300, 50):
        m = _skyline_mask(price[lo:lo + 50], size[lo:lo + 50])
        surv_p.extend(price[lo:lo + 50][m])
        surv_s.extend(size[lo:lo + 50][m])
    sp, ss = np.array(surv_p), np.array(surv_s, np.int64)
    merged = set(map(tuple, np.c_[sp, ss][_skyline_mask(sp, ss)]))
    assert merged == whole


def test_rank_ties_exceed_k(ray_session, tmp_path):
    """RANK() <= 10 keeps every row tying the boundary value — the
    result can exceed 10 rows, and tied blocks share a rank."""
    from web_scrapper_ray.pipelines.analytics import q_top_orders_rank

    prices = [100.0] * 3 + [90.0] * 12 + [50.0] * 20  # rank 4 ties past k
    t = pa.table({"o_orderkey": pa.array(range(1, len(prices) + 1),
                                         pa.int64()),
                  "o_totalprice": pa.array(prices)})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_top_orders_rank(str(tmp_path))
    assert len(out) == 15  # 3 at rank 1 + 12 at rank 4
    assert out["rk"].tolist() == [1] * 3 + [4] * 12
    oracle = duckdb.sql(
        f"""SELECT o_orderkey, rk FROM (
              SELECT o_orderkey,
                     rank() OVER (ORDER BY o_totalprice DESC) AS rk
              FROM read_parquet('{tmp_path}/orders.parquet'))
            WHERE rk <= 10 ORDER BY rk, o_orderkey"""
    ).df()
    assert out["o_orderkey"].tolist() == oracle["o_orderkey"].tolist()


def test_shipping_priority_duplicate_customer_fanout(ray_session, tmp_path):
    """SQL's join fans out on duplicate customer rows — revenue must be
    counted once per duplicate, not membership-deduped."""
    from web_scrapper_ray.pipelines.analytics import q_shipping_priority

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "BUILDING", "BUILDING"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1997-01-01")] * 2,
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 20], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 100.0]),
        "l_discount": pa.array([0.0, 0.0, 0.1]),
        "l_shipdate": pa.array([pd.Timestamp("1999-01-01")] * 3,
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_shipping_priority(str(tmp_path))
    got = dict(zip(out["orderkey"], out["revenue"]))
    # order 10: custkey 1 duplicated → (100+50) counted twice = 300;
    # order 20: 100*0.9 = 90
    assert got == {10: 300.0, 20: 90.0}


def test_quiet_orders_window_boundaries(ray_session, tmp_path):
    """q129 anti range join: an event exactly at t0 or at t0+24h-1µs
    makes the order active; an event at exactly t0+24h does not."""
    from web_scrapper_ray.pipelines.analytics import q_quiet_orders

    DAY_US = 86_400_000_000
    t0 = pd.Timestamp("2020-01-01").value // 1000  # µs
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_orderdate": pa.array([t0] * 4, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "user_id": pa.array([10, 11, 12], pa.int64()),
        # at t0 (active), at window end (quiet), 1µs before end (active)
        "ts": pa.array([t0, t0 + DAY_US, t0 + DAY_US - 1],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_quiet_orders(str(tmp_path))
    assert out["o_orderkey"].tolist() == [2, 4]  # 4: no events at all


def test_connected_components_two_islands(ray_session, tmp_path):
    """q126: two disjoint part-supplier islands get distinct labels and
    every node inside an island shares its minimum packed code."""
    from web_scrapper_ray.pipelines.graph import q_connected_components

    # island A: parts 1,2 / supps 1,2 chained; island B: part 5 / supp 9
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 5], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 9], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_connected_components(str(tmp_path))
    comp = dict(zip(out["node"], out["component"]))
    # island A min code = p1 → 1*2 = 2; island B min = p5 → 10
    assert comp["p1"] == comp["p2"] == comp["s1"] == comp["s2"] == 2
    assert comp["p5"] == comp["s9"] == 10
    assert set(comp) == {"p1", "p2", "s1", "s2", "p5", "s9"}


def test_monthly_growth_pre1970_and_zero(ray_session, tmp_path):
    """q130: calendar-month truncation floors pre-1970 dates, and a
    zero-revenue month yields NULL growth (DuckDB x/0 → NULL)."""
    from web_scrapper_ray.pipelines.analytics import q_monthly_growth

    dec69 = pd.Timestamp("1969-12-15").value // 1000
    jan70 = pd.Timestamp("1970-01-20").value // 1000
    feb70 = pd.Timestamp("1970-02-05").value // 1000
    pq.write_table(pa.table({
        "o_orderdate": pa.array([dec69, jan70, feb70], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 0.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    out = q_monthly_growth(str(tmp_path))
    assert out["month_start"].tolist() == [
        int(pd.Timestamp("1969-12-01").value // 1e9),
        int(pd.Timestamp("1970-01-01").value // 1e9),
        int(pd.Timestamp("1970-02-01").value // 1e9)]
    assert out["revenue"].tolist() == [10.0, 0.0, 5.0]
    pg = out["pct_growth"].tolist()
    assert np.isnan(pg[0]) and pg[1] == -100.0 and np.isnan(pg[2])


def test_activity_streaks_islands(ray_session, tmp_path):
    """q131: duplicate same-day events collapse, pre-1970 fractional
    timestamps floor to the previous calendar day (day -1 and day 0 are
    consecutive), and the histogram counts each user's LONGEST run."""
    from web_scrapper_ray.pipelines.analytics import q_activity_streaks

    DAY = 86_400_000_000
    rows = []
    # user 1: days 1,2,3 then 10,11 → longest 3
    rows += [(1, d * DAY + 5) for d in (1, 2, 3, 10, 11)]
    rows += [(1, 2 * DAY + 99)]  # duplicate day
    # user 2: 1969-12-31 23:59:59.5 (day -1) and 1970-01-01 (day 0) → 2
    rows += [(2, -500_000), (2, 50)]
    # user 3: one day → 1
    rows += [(3, 7 * DAY)]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_activity_streaks(str(tmp_path))
    assert out["streak_days"].tolist() == [1, 2, 3]
    assert out["n_users"].tolist() == [1, 1, 1]


def test_interval_coverage_union(ray_session, tmp_path):
    """q132: overlapping and touching intervals merge; disjoint ones
    add; duplicate timestamps are idempotent."""
    from web_scrapper_ray.pipelines.analytics import q_interval_coverage

    MIN = 60_000_000
    t0 = pd.Timestamp("2021-06-01").value // 1000
    ts = [t0, t0,                       # duplicate → one 30-min window
          t0 + 10 * MIN,                # overlaps → extends to 40 min
          t0 + 40 * MIN,                # touches end exactly → merges
          t0 + 200 * MIN]               # disjoint → +30 min
    pq.write_table(pa.table({
        "user_id": pa.array([7] * len(ts), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_interval_coverage(str(tmp_path))
    assert out["user_id"].tolist() == [7]
    # [t0, t0+70min) ∪ [t0+200, t0+230) = 100 minutes
    assert out["covered_us"].tolist() == [100 * MIN]
    oracle = duckdb.sql(f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                          epoch_us(ts) + 1800000000 AS f
                   FROM '{tmp_path}/events.parquet'),
        m AS (SELECT user_id, s, f,
                     max(f) OVER (PARTITION BY user_id ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS mx FROM e),
        i AS (SELECT user_id, s, f,
                     sum(CASE WHEN mx IS NULL OR s > mx THEN 1 ELSE 0
                         END) OVER (PARTITION BY user_id ORDER BY s
                                    ROWS UNBOUNDED PRECEDING) AS isl
              FROM m),
        u AS (SELECT user_id, isl, max(f) - min(s) AS len
              FROM i GROUP BY user_id, isl)
        SELECT user_id, sum(len)::BIGINT AS covered_us
        FROM u GROUP BY user_id""").df()
    assert oracle["covered_us"].tolist() == out["covered_us"].tolist()


def test_welch_ttest_matches_duckdb(ray_session, tmp_path):
    """q133: t/dof match DuckDB's formula on a small sample; a
    single-row side (var_samp NULL) yields NULL t and dof."""
    from web_scrapper_ray.pipelines.analytics import q_welch_ttest

    va = [1.0, 2.0, 4.0, 8.0, 3.0]
    vb = [5.0, 5.5, 9.0]
    t = pa.table({
        "event_type": pa.array(["click"] * 5 + ["purchase"] * 3
                               + ["view", None]),
        "value": pa.array(va + vb + [99.0, 1.0], pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_welch_ttest(str(tmp_path))
    assert out["n_a"].tolist() == [5] and out["n_b"].tolist() == [3]
    oracle = duckdb.sql(f"""
        WITH s AS (SELECT event_type, count(*)::BIGINT AS n,
                          avg(value) AS m, var_samp(value) AS v
                   FROM '{tmp_path}/events.parquet'
                   WHERE isfinite(value)
                     AND event_type IN ('click', 'purchase')
                   GROUP BY 1),
        a AS (SELECT * FROM s WHERE event_type = 'click'),
        b AS (SELECT * FROM s WHERE event_type = 'purchase')
        SELECT round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 4) AS t_stat,
               round((a.v/a.n + b.v/b.n) * (a.v/a.n + b.v/b.n)
                     / ((a.v/a.n) * (a.v/a.n) / (a.n - 1)
                        + (b.v/b.n) * (b.v/b.n) / (b.n - 1)), 4) AS dof
        FROM a, b""").df()
    assert out["t_stat"].tolist() == oracle["t_stat"].tolist()
    assert out["dof"].tolist() == oracle["dof"].tolist()

    # single purchase row → var_samp NULL → NULL t/dof, row still emitted
    t2 = pa.table({"event_type": pa.array(["click", "click", "purchase"]),
                   "value": pa.array([1.0, 2.0, 5.0], pa.float64())})
    pq.write_table(t2, str(tmp_path / "events.parquet"))
    out2 = q_welch_ttest(str(tmp_path))
    assert len(out2) == 1
    assert np.isnan(out2["t_stat"].iloc[0]) and np.isnan(out2["dof"].iloc[0])


def test_local_supplier_volume_fanout_and_null(ray_session, tmp_path):
    """q134: duplicate nation-dim rows multiply revenue like the SQL
    join; a nation whose only revenue terms are NULL keeps SQL's NULL
    sum; cross-nation customer/supplier pairs are excluded."""
    from web_scrapper_ray.pipelines.analytics import q_local_supplier_volume

    pq.write_table(pa.table({
        "r_regionkey": pa.array([1], pa.int32()),
        "r_name": pa.array(["ASIA"])}), str(tmp_path / "region.parquet"))
    # NATION_A duplicated → its revenue doubles; NATION_B normal
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 10, 20], pa.int32()),
        "n_name": pa.array(["NATION_A", "NATION_A", "NATION_B"]),
        "n_regionkey": pa.array([1, 1, 1], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([10, 20, 20], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    t96 = pd.Timestamp("1996-06-01").value // 1000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([t96] * 3, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8, 9], pa.int64()),
        "s_nationkey": pa.array([10, 20, 10], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # order 100 (cust nation 10) × supp 7 (nation 10) → match, 50
        # order 200 (nation 20) × supp 8 (nation 20) → NULL price only
        # order 300 (nation 20) × supp 9 (nation 10) → cross → excluded
        "l_orderkey": pa.array([100, 200, 300], pa.int64()),
        "l_suppkey": pa.array([7, 8, 9], pa.int64()),
        "l_extendedprice": pa.array([100.0, None, 77.0], pa.float64()),
        "l_discount": pa.array([0.5, 0.1, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_local_supplier_volume(str(tmp_path))
    assert out["n_name"].tolist() == ["NATION_A", "NATION_B"]
    # NATION_A: 100*0.5 = 50, ×2 duplicate nation rows = 100
    assert out["revenue"].tolist()[0] == 100.0
    assert np.isnan(out["revenue"].tolist()[1])  # all-NULL → SQL NULL


def test_all_priority_customers_division(ray_session, tmp_path):
    """q135: only customers spanning all five priorities survive, and
    NUL-containing priority strings stay distinct from their prefix."""
    from web_scrapper_ray.pipelines.analytics import q_all_priority_customers

    P5 = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    cust, prio = [], []
    cust += [1] * 6
    prio += P5 + ["1-URGENT"]          # all 5 + repeat → qualifies, n=6
    cust += [2] * 5
    prio += P5[:4] + ["1-URGENT"]      # only 4 distinct → out
    cust += [3] * 5
    # the NUL variant is a DISTINCT 5th value (SQL keys on full bytes);
    # a pandas nunique over raw object strings would merge it with
    # '1-URGENT' (NUL-terminated C-string hashing) and wrongly drop 3
    prio += P5[:4] + ["1-URGENT\x00x"]
    pq.write_table(pa.table({
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderpriority": pa.array(prio)}),
        str(tmp_path / "orders.parquet"))
    out = q_all_priority_customers(str(tmp_path))
    assert out["c_custkey"].tolist() == [1, 3]
    assert out["n_orders"].tolist() == [6, 5]


def test_welch_constant_sides_null(ray_session, tmp_path):
    """q133: a constant-valued side has var_samp EXACTLY 0 (detected by
    min==max, not float-accumulated m2 ≈ 1e-31); both sides constant →
    se2 = 0 → x/0 → NULL t and dof like DuckDB."""
    from web_scrapper_ray.pipelines.analytics import q_welch_ttest

    t = pa.table({
        "event_type": pa.array(["click"] * 1100 + ["purchase"] * 1100),
        "value": pa.array([0.7] * 1100 + [0.1] * 1100, pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_welch_ttest(str(tmp_path))
    assert out["n_a"].tolist() == [1100]
    assert np.isnan(out["t_stat"].iloc[0]) and np.isnan(out["dof"].iloc[0])

    # one constant side, one varying: var_a contributes exactly 0
    t2 = pa.table({
        "event_type": pa.array(["click"] * 3 + ["purchase"] * 3),
        "value": pa.array([0.5, 0.5, 0.5, 1.0, 2.0, 4.0], pa.float64())})
    pq.write_table(t2, str(tmp_path / "events.parquet"))
    out2 = q_welch_ttest(str(tmp_path))
    oracle = duckdb.sql(f"""
        WITH s AS (SELECT event_type, count(*)::BIGINT AS n,
                          avg(value) AS m, var_samp(value) AS v
                   FROM '{tmp_path}/events.parquet'
                   WHERE isfinite(value)
                     AND event_type IN ('click', 'purchase') GROUP BY 1),
        a AS (SELECT * FROM s WHERE event_type = 'click'),
        b AS (SELECT * FROM s WHERE event_type = 'purchase')
        SELECT round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 4) AS t_stat
        FROM a, b""").df()
    assert out2["t_stat"].tolist() == oracle["t_stat"].tolist()


def test_local_supplier_volume_nul_and_null_names(ray_session, tmp_path):
    """q134: NUL-prefix nation names stay distinct groups, and a NULL
    n_name keeps its revenue row (SQL GROUP BY keeps the NULL group)."""
    from web_scrapper_ray.pipelines.analytics import q_local_supplier_volume

    pq.write_table(pa.table({
        "r_regionkey": pa.array([1], pa.int32()),
        "r_name": pa.array(["ASIA"])}), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 20, 30], pa.int32()),
        "n_name": pa.array(["NAT", "NAT\x00x", None]),
        "n_regionkey": pa.array([1, 1, 1], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([10, 20, 30], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    t96 = pd.Timestamp("1996-06-01").value // 1000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([t96] * 3, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8, 9], pa.int64()),
        "s_nationkey": pa.array([10, 20, 30], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 200, 300], pa.int64()),
        "l_suppkey": pa.array([7, 8, 9], pa.int64()),
        "l_extendedprice": pa.array([100.0, 10.0, 1.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_local_supplier_volume(str(tmp_path))
    assert out["n_name"].tolist() == ["NAT", "NAT\x00x", None]
    assert out["revenue"].tolist() == [100.0, 10.0, 1.0]


def test_chi2_independence_matches_formula(ray_session, tmp_path):
    """q136: χ² over the full r×c grid including zero-observed cells,
    floored hour binning for pre-1970 timestamps."""
    from web_scrapper_ray.pipelines.analytics import q_chi2_independence

    HOUR = 3_600_000_000
    rows = []
    # type A: hours 1 (×4), 2 (×1); type B: hour 2 (×5) — cell (B,1)
    # is zero-observed but contributes its expectation
    rows += [("A", 1 * HOUR)] * 4 + [("A", 2 * HOUR)]
    rows += [("B", 2 * HOUR + 7)] * 5
    # pre-1970: -1µs is hour 23 of 1969-12-31 (floored, not truncated)
    rows += [("A", -1)]
    pq.write_table(pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_chi2_independence(str(tmp_path))
    oracle = duckdb.sql(f"""
        WITH obs AS (SELECT event_type t, hour(ts) h, count(*)::DOUBLE o
                     FROM '{tmp_path}/events.parquet'
                     WHERE event_type IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
        r AS (SELECT t, sum(o) rt FROM obs GROUP BY 1),
        c AS (SELECT h, sum(o) ct FROM obs GROUP BY 1),
        n AS (SELECT sum(o) tot FROM obs),
        cells AS (SELECT coalesce(o.o, 0) o, r.rt * c.ct / n.tot e
                  FROM r CROSS JOIN c CROSS JOIN n
                  LEFT JOIN obs o ON o.t = r.t AND o.h = c.h)
        SELECT round(sum((o - e) * (o - e) / e), 4) chi2,
               ((SELECT count(*) FROM r) - 1)::BIGINT
               * ((SELECT count(*) FROM c) - 1)::BIGINT dof
        FROM cells""").df()
    assert out["chi2"].tolist() == oracle["chi2"].tolist()
    assert out["dof"].tolist() == oracle["dof"].tolist()
    assert out["dof"].tolist() == [2]  # 2 types × 3 live hours


def test_suppliers_per_region_dup_dim_fanout(ray_session, tmp_path):
    """q08: duplicate nation AND region rows fan the inner join out
    multiplicatively; an all-NULL-balance region sums to SQL NULL; a
    NULL r_name keeps its group."""
    from web_scrapper_ray.pipelines.relational import q_suppliers_per_region

    pq.write_table(pa.table({
        "r_regionkey": pa.array([1, 1, 2, 3], pa.int32()),
        "r_name": pa.array(["R1", "R1", None, "R3"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 10, 20, 30], pa.int32()),
        "n_name": pa.array(["n", "n", "m", "k"]),
        "n_regionkey": pa.array([1, 1, 2, 3], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["a", "b", "c"]),
        "s_nationkey": pa.array([10, 20, 30], pa.int32()),
        "s_acctbal": pa.array([5.0, None, 7.0], pa.float64()),
    }), str(tmp_path / "supplier.parquet"))
    out = q_suppliers_per_region(str(tmp_path))
    # supp 1 × nation dup(2) × region dup(2) = 4 joined rows in R1
    assert out["r_name"].tolist() == ["R1", "R3", None]
    assert out["n_suppliers"].tolist() == [4, 1, 1]
    vals = out["sum_acctbal"].tolist()
    assert vals[0] == 20.0 and vals[1] == 7.0 and np.isnan(vals[2])


def test_top_session_paths(ray_session, tmp_path):
    """q137: 30-min gaps split sessions, duplicate timestamps order by
    event_type, identical paths from users in different hash buckets
    total globally, and NUL-containing types stay distinct."""
    from web_scrapper_ray.pipelines.analytics import q_top_session_paths

    MIN = 60_000_000
    rows = []
    # users 1 and 34 (different buckets mod 32): same path view>click
    for u in (1, 34):
        rows += [(u, 0, "view"), (u, 5 * MIN, "click")]
    # user 2: same session, duplicate ts → ordered by type: a>b; then a
    # >30-min gap starts a second session 'solo'
    rows += [(2, 0, "b"), (2, 0, "a"), (2, 40 * MIN, "solo")]
    # user 3: NUL variant type is its own path
    rows += [(3, 0, "view\x00x")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_top_session_paths(str(tmp_path))
    got = dict(zip(out["path"], out["n"]))
    assert got == {"view>click": 2, "a>b": 1, "solo": 1, "view\x00x": 1}
    # count-desc then path-asc ordering
    assert out["path"].tolist()[0] == "view>click"
    oracle = duckdb.sql(f"""
        WITH e AS (SELECT user_id, ts, event_type
                   FROM '{tmp_path}/events.parquet'),
        l AS (SELECT user_id, ts, event_type,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts, event_type)),
        s AS (SELECT user_id, event_type, ts,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_type
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM l),
        p AS (SELECT user_id, sid, string_agg(event_type, '>'
                       ORDER BY ts, event_type) AS path
              FROM s GROUP BY 1, 2)
        SELECT path, count(*)::BIGINT AS n
        FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 20""").df()
    assert out["path"].tolist() == oracle["path"].tolist()
    assert out["n"].tolist() == oracle["n"].tolist()


def test_bfs_hops_cap_and_lone_seed(ray_session, tmp_path):
    """q138: hop distances from p_size=1 seeds, 4-round cap leaves far
    nodes out, an edgeless seed still emits h=0."""
    from web_scrapper_ray.pipelines.graph import q_bfs_hops

    # chain p1 - s1 - p2 - s2 - p3 - s3 (hops 0..5; s3 beyond cap 4)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 99], pa.int64()),
        "p_name": pa.array(["a", "b", "c", "lone"]),
        "p_brand": pa.array(["B"] * 4),
        "p_type": pa.array(["t"] * 4),
        "p_size": pa.array([1, 5, 5, 1], pa.int32()),
        "p_retailprice": pa.array([1.0] * 4),
    }), str(tmp_path / "part.parquet"))
    out = q_bfs_hops(str(tmp_path))
    got = dict(zip(out["node"], out["hops"]))
    # p99 is a seed with no edges → h=0; s3 is 5 hops away → absent
    assert got == {"p1": 0, "s1": 1, "p2": 2, "s2": 3, "p3": 4, "p99": 0}


def test_pairs_by_shift_matches_bruteforce():
    from web_scrapper_ray.pipelines.graph import _pairs_by_shift

    rng = np.random.RandomState(3)
    gid = np.sort(rng.randint(0, 10, 60))
    vals = np.sort(rng.randint(0, 100, 60))
    # sort vals within groups
    df = pd.DataFrame({"g": gid, "v": vals}).sort_values(["g", "v"])
    g, v = df["g"].to_numpy(), df["v"].to_numpy()
    a, b = _pairs_by_shift(g, v)
    got = sorted(zip(a.tolist(), b.tolist()))
    want = []
    for grp in np.unique(g):
        vv = np.sort(v[g == grp])
        for i in range(len(vv)):
            for j in range(i + 1, len(vv)):
                want.append((int(vv[i]), int(vv[j])))
    assert got == sorted(want)
    a0, b0 = _pairs_by_shift(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(a0) == 0 and len(b0) == 0


def test_triangle_count_k4_plus_path(ray_session, tmp_path):
    """q140: K4 on suppliers 1-4 (4 triangles) via orders covering all
    six pairs; a disjoint path 5-6-7 adds none; duplicate lineitem rows
    don't double-count."""
    from web_scrapper_ray.pipelines.graph import q_triangle_count

    orders, supps = [], []
    # K4: orders joining each pair (and one order with 3 suppliers,
    # which contributes three pairs at once)
    k4 = [(1, [1, 2, 3]), (2, [1, 4]), (3, [2, 4]), (4, [3, 4]),
          (5, [1, 3])]  # duplicate pair (1,3) via another order
    path = [(6, [5, 6]), (7, [6, 7])]
    for ok, ss in k4 + path:
        for s in ss:
            orders.append(ok)
            supps.append(s)
    orders.append(1)  # duplicate row
    supps.append(2)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orders, pa.int64()),
        "l_suppkey": pa.array(supps, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_triangle_count(str(tmp_path))
    assert out["n_triangles"].tolist() == [4]
    # the sparse wedge plan (dense_limit=0 forces it) must agree with
    # the dense bitset path on the same graph
    out2 = q_triangle_count(str(tmp_path), dense_limit=0)
    assert out2["n_triangles"].tolist() == [4]


def test_type_jaccard_small(ray_session, tmp_path):
    """q139: hand-checked Jaccard over user sets; repeated events don't
    inflate counts; single-type users contribute to unions only."""
    from web_scrapper_ray.pipelines.analytics import q_type_jaccard

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "a"),
            (4, "b"), (5, "c")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_type_jaccard(str(tmp_path))
    # a: {1,2,4}, b: {1,3,4}, c: {5}; a∩b={1,4} → 2/4; c shares no one
    assert out["type_a"].tolist() == ["a"]
    assert out["type_b"].tolist() == ["b"]
    assert out["n_both"].tolist() == [2]
    assert out["jaccard"].tolist() == [0.5]


def test_unpivot_drops_null_cells(ray_session, tmp_path):
    """q141: NULL measure cells produce no row (UNPIVOT semantics);
    each non-NULL cell becomes exactly one (measure, val) row."""
    from web_scrapper_ray.pipelines.analytics import q_unpivot_lineitem

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([5.0, None], pa.float64()),
        "l_extendedprice": pa.array([None, 7.5], pa.float64()),
        "l_discount": pa.array([0.1, 0.2], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_unpivot_lineitem(str(tmp_path))
    got = sorted(zip(out["l_orderkey"], out["measure"], out["val"]))
    assert got == [(1, "discount", 0.1), (1, "quantity", 5.0),
                   (2, "discount", 0.2), (2, "extendedprice", 7.5)]


def test_rolling_stddev_windows(ray_session, tmp_path):
    """q142: per-type 5-row windows match DuckDB; the first row of a
    type is NULL (n=1); non-finite values are excluded up front."""
    from web_scrapper_ray.pipelines.analytics import q_rolling_stddev

    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]
    t = pa.table({
        "event_id": pa.array(range(1, len(vals) + 3), pa.int64()),
        "event_type": pa.array(["a"] * len(vals) + ["a", "b"]),
        "ts": pa.array(list(range(len(vals))) + [99, 0],
                       pa.timestamp("us")),
        "value": pa.array(vals + [float("inf"), 3.0], pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_rolling_stddev(str(tmp_path))
    oracle = duckdb.sql(f"""
        SELECT event_id,
               round(stddev_samp(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mstd
        FROM '{tmp_path}/events.parquet'
        WHERE isfinite(value) ORDER BY event_id""").df()
    assert out["event_id"].tolist() == oracle["event_id"].tolist()
    gm, om = out["mstd"].to_numpy(), oracle["mstd"].to_numpy()
    assert ((gm == om) | (np.isnan(gm) & np.isnan(om))).all()
    assert np.isnan(out["mstd"].iloc[0])      # first 'a' row: n=1
    assert np.isnan(out["mstd"].iloc[-1])     # only 'b' row: n=1
    assert 8 not in out["event_id"].tolist()  # inf row excluded


def test_revenue_gini_known_values(ray_session, tmp_path):
    """q143: equal revenues → gini 0 (up to the (n+1)/n closed form);
    hand case matches the SQL formula; negative totals use the same
    closed form as the oracle."""
    from web_scrapper_ray.pipelines.analytics import q_revenue_gini

    # two customers, revenues 1 and 3: sorted Σi·x = 1*1 + 2*3 = 7,
    # G = 2*7/(2*4) - 3/2 = 1.75 - 1.5 = 0.25
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 1.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_revenue_gini(str(tmp_path))
    assert out["gini"].tolist() == [0.25]
    assert out["n_customers"].tolist() == [2]

    # perfectly equal distribution → 0
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([5.0] * 4, pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out2 = q_revenue_gini(str(tmp_path))
    assert out2["gini"].tolist() == [0.0]


def test_ntile_of_ranks_matches_duckdb():
    from web_scrapper_ray.pipelines.analytics import _ntile_of_ranks

    for n, k in [(10, 4), (7, 3), (3, 4), (8, 4), (1, 4), (5, 2)]:
        got = _ntile_of_ranks(np.arange(n), n, k).tolist()
        want = duckdb.sql(
            f"SELECT ntile({k}) OVER (ORDER BY x) FROM "
            f"(SELECT unnest(range({n})) x)").df().iloc[:, 0].tolist()
        assert got == want, (n, k)


def test_rfm_segments_null_metrics(ray_session, tmp_path):
    """q144: NULL last-date and all-NULL-price customers tile LAST in
    their metric; frequency counts every order row."""
    from web_scrapper_ray.pipelines.analytics import q_rfm_segments

    t0 = pd.Timestamp("2020-01-01").value // 1000
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([t0, t0 + 10, t0 + 5, None, t0 + 7],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 5.0, None, 20.0, 1.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_rfm_segments(str(tmp_path))
    oracle = duckdb.sql(f"""
        WITH c AS (SELECT o_custkey AS k, max(o_orderdate) AS last_dt,
                          count(*)::BIGINT AS freq,
                          sum(o_totalprice) AS mon
                   FROM '{tmp_path}/orders.parquet'
                   WHERE o_custkey IS NOT NULL GROUP BY 1)
        SELECT k AS c_custkey,
               ntile(4) OVER (ORDER BY last_dt, k) AS r_q,
               ntile(4) OVER (ORDER BY freq, k) AS f_q,
               ntile(4) OVER (ORDER BY mon, k) AS m_q
        FROM c ORDER BY 1""").df()
    for col in ("c_custkey", "r_q", "f_q", "m_q"):
        assert out[col].tolist() == oracle[col].tolist(), col
    # customer 3 (NULL date) has the LAST recency tile
    assert out.set_index("c_custkey").loc[3, "r_q"] == 4
    # customer 2 (all-NULL prices) has the LAST monetary tile
    assert out.set_index("c_custkey").loc[2, "m_q"] == 4


def test_daily_locf_fill(ray_session, tmp_path):
    """q145: days between events carry the last value forward; the
    first spine day (midnight before the first event) is NULL; tied
    timestamps collapse to max(value) before the fill."""
    from web_scrapper_ray.pipelines.analytics import q_daily_locf

    DAY = 86_400_000_000
    t0 = (pd.Timestamp("2022-03-01").value // 1000) + 5_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        # day 0 (two tied events → max 9.0), then day 3
        "ts": pa.array([t0, t0, t0 + 3 * DAY, t0 + 3 * DAY],
                       pa.timestamp("us")),
        "value": pa.array([9.0, 2.0, 4.0, 1.0], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_daily_locf(str(tmp_path))
    # spine: 2022-03-01 00:00 .. 2022-03-04 (4 days)
    assert len(out) == 4
    f = out["filled"].tolist()
    assert np.isnan(f[0])           # midnight precedes the first event
    # every later midnight precedes that day's 00:00:05 event, so the
    # tied day-0 max (9.0, never 2.0) carries across the whole spine
    assert f[1] == 9.0 and f[2] == 9.0 and f[3] == 9.0
    oracle = duckdb.sql(f"""
        WITH b AS (SELECT user_id, ts, max(value) AS v
                   FROM '{tmp_path}/events.parquet' GROUP BY 1, 2),
        r AS (SELECT user_id, date_trunc('day', min(ts)) AS lo,
                     max(ts) AS hi FROM b GROUP BY 1),
        s AS (SELECT user_id, unnest(generate_series(lo, hi,
                     INTERVAL 1 DAY)) AS h FROM r)
        SELECT epoch_us(s.h) AS day_us, b.v AS filled
        FROM s ASOF LEFT JOIN b
             ON b.user_id = s.user_id AND b.ts <= s.h
        ORDER BY 1""").df()
    gm, om = out["filled"].to_numpy(), oracle["filled"].to_numpy()
    assert ((gm == om) | (np.isnan(gm) & np.isnan(om))).all()
    assert out["day_us"].tolist() == oracle["day_us"].tolist()


def test_entity_conflicts_nul_variant(ray_session, tmp_path):
    """q146: a NUL-suffixed name variant is a real conflict (distinct
    bytes); exact duplicate rows of one name are not."""
    from web_scrapper_ray.pipelines.analytics import q_entity_conflicts

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "c_name": pa.array(["a", "a\x00x", "b", "b", "c", "d"]),
    }), str(tmp_path / "customer.parquet"))
    out = q_entity_conflicts(str(tmp_path))
    assert out["c_custkey"].tolist() == [1, 3]
    assert out["n_names"].tolist() == [2, 2]


def test_value_shape_matches_duckdb_across_splits(ray_session, tmp_path):
    """q147: Pébay-merged (M2, M3, M4) partials reproduce DuckDB's
    skewness/kurtosis exactly (at round-6) even when the same type's
    rows are scattered across many parquet files, and the NULL-type
    group survives."""
    from web_scrapper_ray.pipelines.analytics import q_value_shape

    rng = np.random.RandomState(11)
    n = 600
    types = np.array(["click", "view", "purchase"])[
        rng.randint(0, 3, n)].astype(object)
    types[::97] = None
    vals = np.round(rng.lognormal(0.0, 1.0, n), 3)
    # events.parquet as a DIRECTORY of three files → ≥3 blocks per
    # type → the driver-side Pébay merge actually runs
    (tmp_path / "events.parquet").mkdir()
    for i in range(3):
        pq.write_table(pa.table({
            "event_type": pa.array(types[i::3]),
            "value": pa.array(vals[i::3], pa.float64())}),
            str(tmp_path / "events.parquet" / f"part_{i}.parquet"))
    out = q_value_shape(str(tmp_path))
    oracle = duckdb.sql(f"""
        SELECT event_type, count(value)::BIGINT AS n,
               round(skewness(value), 6) AS skew,
               round(kurtosis(value), 6) AS kurt
        FROM '{tmp_path}/events.parquet/*.parquet'
        GROUP BY 1 ORDER BY 1 NULLS LAST""").df()
    assert out["event_type"].tolist() == oracle["event_type"].where(
        oracle["event_type"].notna(), None).tolist()
    assert out["n"].tolist() == oracle["n"].tolist()
    assert out["skew"].tolist() == oracle["skew"].tolist()
    assert out["kurt"].tolist() == oracle["kurt"].tolist()


def test_value_shape_small_and_constant_groups(ray_session, tmp_path):
    """q147 edge contracts (probed in DuckDB): n<3 → NULL skew, n<4 →
    NULL kurt, a CONSTANT group is NULL for both at any n, and
    non-finite values are masked but keep the group's row."""
    from web_scrapper_ray.pipelines.analytics import q_value_shape

    t = pa.table({
        "event_type": pa.array(
            ["pair"] * 2 + ["trio"] * 3 + ["flat"] * 4
            + ["quad"] * 4 + ["poison"] * 3),
        "value": pa.array(
            [1.0, 9.0] + [1.0, 2.0, 4.0] + [7.0] * 4
            + [1.0, 2.0, 3.0, 10.0] + [np.inf, np.nan, None],
            pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_value_shape(str(tmp_path)).set_index("event_type")
    assert np.isnan(out.loc["pair", "skew"])
    assert np.isnan(out.loc["pair", "kurt"])
    assert out.loc["trio", "skew"] == round(0.935220, 6)  # probed DuckDB
    assert np.isnan(out.loc["trio", "kurt"])
    assert np.isnan(out.loc["flat", "skew"])      # var=0, n=4
    assert np.isnan(out.loc["flat", "kurt"])
    assert out.loc["quad", "skew"] == 1.763633    # probed DuckDB
    assert out.loc["quad", "kurt"] == 3.228
    assert out.loc["poison", "n"] == 0            # masked, row kept
    assert np.isnan(out.loc["poison", "skew"])


def test_order_percentiles_window_order_edges(ray_session, tmp_path):
    """q148: probed DuckDB window-order contract — finite < +inf <
    NaN (peers) < NULL (peers, last); a single-row partition has
    percent_rank 0.0; NULL custkey is its own partition."""
    from web_scrapper_ray.pipelines.analytics import q_order_percentiles

    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "o_custkey": pa.array([10, 10, 10, 10, 10, None, 20], pa.int64()),
        "o_totalprice": pa.array(
            [1.0, float("inf"), float("nan"), float("nan"), None,
             3.0, 9.0], pa.float64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_order_percentiles(str(tmp_path))
    got = out.set_index("o_orderkey")
    # rank: 1.0→1, inf→2, NaN,NaN→3 (peers), NULL→5 ⇒ pr=(r−1)/4
    assert got.loc[1, "pr"] == 0.0 and got.loc[2, "pr"] == 0.25
    assert got.loc[3, "pr"] == 0.5 and got.loc[4, "pr"] == 0.5
    assert got.loc[5, "pr"] == 1.0
    assert got.loc[3, "cd"] == 0.8 and got.loc[5, "cd"] == 1.0
    # single-row partitions (NULL custkey and cust 20): pr 0, cd 1
    assert got.loc[6, "pr"] == 0.0 and got.loc[6, "cd"] == 1.0
    assert got.loc[7, "pr"] == 0.0 and got.loc[7, "cd"] == 1.0
    # NULL custkey rendered as NaN in the nullable-int float column
    assert np.isnan(got.loc[6, "o_custkey"])


def test_bitwise_event_ids_negatives_and_all_null(ray_session, tmp_path):
    """q150: two's-complement folds on negative ids match DuckDB
    (probed: bit_and(-5,3)=3, bit_or=-5, bit_xor=-8) and an
    all-NULL-id type keeps its row with NULL aggregates."""
    from web_scrapper_ray.pipelines.analytics import q_bitwise_event_ids

    t = pa.table({
        "event_type": pa.array(["x", "x", "x", "y"]),
        "event_id": pa.array([-5, 3, None, None], pa.int64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_bitwise_event_ids(str(tmp_path)).set_index("event_type")
    assert out.loc["x", ["n", "ba", "bo", "bx"]].tolist() == \
        [2, 3.0, -5.0, -8.0]
    assert out.loc["y", "n"] == 0
    assert np.isnan(out.loc["y", "ba"])


def test_orderkey_gaps_cross_bucket_stitching(ray_session, tmp_path):
    """q151: widely-spaced keys make every gap span range-bucket
    boundaries — the driver's envelope stitching must find them all,
    and duplicates/NULL keys are ignored."""
    from web_scrapper_ray.pipelines.analytics import q_orderkey_gaps

    keys = [0, 1, 5, 1000, 1001, 90000, 90001, 90005, None, 5, 1000]
    t = pa.table({"o_orderkey": pa.array(keys, pa.int64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_orderkey_gaps(str(tmp_path))
    assert out[["gap_start", "gap_end", "n_missing"]].values.tolist() == [
        [2, 4, 3], [6, 999, 994], [1002, 89999, 88998],
        [90002, 90004, 3]]


def test_user_drawdown_ties_and_negatives(ray_session, tmp_path):
    """q152 vs DuckDB directly: tied (ts, event_id) rows are RANGE
    peers (shared cum), negatives drive real drawdowns, NULL user is
    its own partition, NaN/inf rows are filtered."""
    from web_scrapper_ray.pipelines.analytics import q_user_drawdown

    T0 = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        # user 1: +5, -3, +1, -4 → cum 5,2,3,-1; runmax 5,5,5,5 → dd 6
        (1, T0 + 1, 1, 5.0), (1, T0 + 2, 2, -3.0),
        (1, T0 + 3, 3, 1.0), (1, T0 + 4, 4, -4.0),
        # user 2: two rows TIED on (ts, id): peers share cum
        (2, T0, 7, 10.0), (2, T0, 7, -6.0), (2, T0 + 1, 8, -1.0),
        # NULL user partition + a filtered non-finite row
        (None, T0, 9, 3.0), (None, T0 + 1, 10, -2.0),
        (1, T0 + 5, 5, float("inf")),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_user_drawdown(str(tmp_path))
    oracle = duckdb.sql(f"""
        WITH b AS (SELECT user_id, ts, event_id,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM '{tmp_path}/events.parquet'
                   WHERE value IS NOT NULL AND isfinite(value)),
        r AS (SELECT user_id, ts, event_id, cents,
                     sum(cents) OVER w AS cum FROM b
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        m AS (SELECT user_id, cum, max(cum) OVER w AS runmax FROM r
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, count(*)::BIGINT AS n,
               max(runmax - cum) / 100.0 AS max_drawdown
        FROM m GROUP BY 1 ORDER BY 1 NULLS LAST""").df()
    assert out["n"].tolist() == oracle["n"].tolist()
    assert out["max_drawdown"].tolist() == oracle["max_drawdown"].tolist()
    got = out.set_index("user_id")
    assert got.loc[1.0, "max_drawdown"] == 6.0
    # tied rows share cum=4 (10−6 summed as peers) → dd = 0 then 1
    assert got.loc[2.0, "max_drawdown"] == 1.0


def test_doc_sentences_split_parity(ray_session, tmp_path):
    """q153: probed DuckDB string_split edges — '' yields one ''
    sentence, a trailing separator yields a trailing '' element,
    NULL text yields zero rows, n_chars counts codepoints."""
    from web_scrapper_ray.pipelines.textops import q_doc_sentences

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["a. bé. c", "", None, "x. "],
                                   pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_doc_sentences(str(tmp_path))
    assert out["doc_id"].tolist() == [1, 1, 1, 2, 4, 4]
    assert out["pos"].tolist() == [1, 2, 3, 1, 1, 2]
    assert out["sentence"].tolist() == ["a", "bé", "c", "", "x", ""]
    assert out["n_chars"].tolist() == [1, 2, 1, 0, 1, 0]


def test_price_outlier_fences_matches_duckdb(ray_session, tmp_path):
    """q154: planted outliers beyond the 1.5·IQR fences are counted;
    NaN prices drop, NULL brand keeps its group."""
    from web_scrapper_ray.pipelines.analytics import q_price_outlier_fences

    vals = list(np.linspace(10.0, 20.0, 20)) + [100.0, -50.0, np.nan]
    brands = ["B1"] * 22 + ["B1"]
    t = pa.table({"p_brand": pa.array(brands + [None, None]),
                  "p_retailprice": pa.array(vals + [5.0, 6.0],
                                            pa.float64())})
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_price_outlier_fences(str(tmp_path))
    oracle = duckdb.sql(f"""
        WITH v AS (SELECT p_brand, p_retailprice AS x
                   FROM '{tmp_path}/part.parquet'
                   WHERE p_retailprice IS NOT NULL
                     AND NOT isnan(p_retailprice)),
        q AS (SELECT p_brand, count(*)::BIGINT AS n,
                     quantile_cont(x, 0.25) AS q1,
                     quantile_cont(x, 0.75) AS q3
              FROM v GROUP BY 1),
        j AS (SELECT v.p_brand AS p_brand, v.x, q.n, q.q1, q.q3
              FROM v JOIN q ON v.p_brand IS NOT DISTINCT FROM q.p_brand)
        SELECT p_brand, max(n) AS n, max(q1) AS q1, max(q3) AS q3,
               sum(CASE WHEN x < q1 - 1.5 * (q3 - q1)
                         OR x > q3 + 1.5 * (q3 - q1)
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM j GROUP BY 1 ORDER BY 1 NULLS LAST""").df()
    assert out["n"].tolist() == oracle["n"].tolist()
    assert out["q1"].tolist() == oracle["q1"].tolist()
    assert out["q3"].tolist() == oracle["q3"].tolist()
    assert out["n_outliers"].tolist() == oracle["n_outliers"].tolist()
    assert out.set_index("p_brand").loc["B1", "n_outliers"] == 2


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_returned_item_revenue_fanout_and_null_sum(ray_session, tmp_path):
    """q155: duplicate customer rows double their groups' revenue,
    two nationkeys sharing one n_name merge into one group, an
    all-NULL-revenue group keeps SQL's NULL sum, and out-of-window /
    non-'R' lineitems drop."""
    from web_scrapper_ray.pipelines.analytics import q_returned_item_revenue

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["ann", "ann", "bob", None, "eve"]),
        "c_acctbal": pa.array([10.0, 10.0, None, 3.0, 4.0], pa.float64()),
        "c_nationkey": pa.array([0, 0, 1, 2, None], pa.int32())}))
    # nationkeys 1 and 2 share the name 'NB' -> their groups merge
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["NA", "NB", "NB"]),
        "n_regionkey": pa.array([0, 0, 0], pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([1.0] * 5, pa.float64()),
        "o_orderdate": pa.array([ts("1996-08-01")] * 4 +
                                [ts("1995-01-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 5)}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12, 13, 14], pa.int64()),
        "l_partkey": pa.array([1] * 6, pa.int64()),
        "l_suppkey": pa.array([1] * 6, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 6, pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, None, 30.0, 40.0,
                                     999.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.2, 0.0, 0.5, 0.0],
                               pa.float64()),
        "l_tax": pa.array([0.0] * 6, pa.float64()),
        "l_returnflag": pa.array(["R", "R", "R", "A", "R", "R"]),
        "l_linestatus": pa.array(["F"] * 6),
        "l_shipdate": pa.array([ts("1996-09-01")] * 6,
                               pa.timestamp("us"))}))
    out = q_returned_item_revenue(str(tmp_path))
    con = duckdb.connect()
    for t in ["customer", "nation", "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{tmp_path}/{t}.parquet'")
    oracle = con.sql("""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue, c_acctbal, n_name
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
        GROUP BY 1, 2, 4, 5 ORDER BY 1, 3""").df()
    got = out.sort_values(["c_custkey", "revenue"]).reset_index(drop=True)
    exp = oracle.sort_values(["c_custkey", "revenue"]) \
        .reset_index(drop=True)
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert got["revenue"].fillna(-1).tolist() == \
        exp["revenue"].fillna(-1).tolist()
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    # dup customer rows doubled cust 1's revenue: (90 + 50) * 2
    assert got.loc[got["c_custkey"] == 1, "revenue"].iloc[0] == 280.0
    # cust 2's only revenue term is NULL -> SQL NULL sum survives
    assert np.isnan(got.loc[got["c_custkey"] == 2, "revenue"].iloc[0])
    # cust 4 has NULL nationkey -> inner nation join drops it
    assert 4 not in got["c_custkey"].tolist()


def test_large_volume_orders_threshold_and_fanout(ray_session, tmp_path):
    """q156: the HAVING boundary is strict (sum == 300 drops), NULL
    quantities don't poison the sum, and a duplicate customer row
    doubles the outer re-aggregated quantity."""
    from web_scrapper_ray.pipelines.analytics import q_large_volume_orders

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 2], pa.int64()),
        "c_name": pa.array(["ann", "bob", "bob"]),
        "c_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "c_nationkey": pa.array([0, 0, 0], pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([5.0, 6.0, None], pa.float64()),
        "o_orderdate": pa.array([ts("1996-08-01"), None,
                                 ts("1996-01-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3)}))
    # order 10: 150.5 + 150.0 = 300.5 > 300 (in); order 11: exactly
    # 300 (out); order 12: 299 + NULL = 299 (out)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12, 12], pa.int64()),
        "l_partkey": pa.array([1] * 5, pa.int64()),
        "l_suppkey": pa.array([1] * 5, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 2], pa.int32()),
        "l_quantity": pa.array([150.5, 150.0, 300.0, 299.0, None],
                               pa.float64()),
        "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["R"] * 5),
        "l_linestatus": pa.array(["F"] * 5),
        "l_shipdate": pa.array([ts("1996-09-01")] * 5,
                               pa.timestamp("us"))}))
    out = q_large_volume_orders(str(tmp_path))
    assert out["o_orderkey"].tolist() == [10]
    assert out["sum_qty"].tolist() == [300.5]
    assert out["c_name"].tolist() == ["ann"]
    # now give order 10 to the DUPLICATED customer 2: outer join
    # fan-out doubles the re-aggregated sum like SQL
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([2], pa.int64()),
        "o_orderstatus": pa.array(["O"]),
        "o_totalprice": pa.array([5.0], pa.float64()),
        "o_orderdate": pa.array([ts("1996-08-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"])}))
    out2 = q_large_volume_orders(str(tmp_path))
    assert out2["sum_qty"].tolist() == [601.0]
    assert out2["c_name"].tolist() == ["bob"]


def test_late_order_priorities_exists_semantics(ray_session, tmp_path):
    """q157: EXISTS counts an order once however many late lineitems
    it has, NULL shipdates never satisfy the predicate, NULL and
    NUL-embedded priorities stay distinct groups, and orders outside
    the window drop."""
    from web_scrapper_ray.pipelines.analytics import q_late_order_priorities

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([1.0] * 5, pa.float64()),
        "o_orderdate": pa.array([ts("1996-02-01"), ts("1996-02-01"),
                                 ts("1996-02-01"), ts("1996-02-01"),
                                 ts("1997-02-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT\x00z", None,
                                     "1-URGENT", "1-URGENT"])}))
    # order 1: two late items (counted once); order 2: late (NUL
    # priority variant); order 3: late (NULL priority); order 4: one
    # NULL shipdate + one on-time -> not late; order 5: late but
    # outside the window
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4, 4, 5], pa.int64()),
        "l_partkey": pa.array([1] * 7, pa.int64()),
        "l_suppkey": pa.array([1] * 7, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1, 1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 7, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 7, pa.float64()),
        "l_discount": pa.array([0.0] * 7, pa.float64()),
        "l_tax": pa.array([0.0] * 7, pa.float64()),
        "l_returnflag": pa.array(["R"] * 7),
        "l_linestatus": pa.array(["F"] * 7),
        "l_shipdate": pa.array(
            [ts("1996-06-01"), ts("1996-07-01"), ts("1996-06-01"),
             ts("1996-06-01"), None, ts("1996-02-10"),
             ts("1997-06-01")], pa.timestamp("us"))}))
    out = q_late_order_priorities(str(tmp_path))
    got = {r["o_orderpriority"]: r["n_late_orders"]
           for _, r in out.iterrows()}
    assert got == {"1-URGENT": 1, "1-URGENT\x00z": 1, None: 1}


def test_small_quantity_revenue_nan_threshold(ray_session, tmp_path):
    """q158: a NaN quantity poisons its part's avg to NaN, and DuckDB's
    total order then passes every non-NaN row (x < NaN is TRUE);
    duplicate part rows fan the brand sum out; an all-NULL-price brand
    keeps SQL's NULL sum."""
    from web_scrapper_ray.pipelines.analytics import q_small_quantity_revenue

    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 2, 3], pa.int64()),
        "p_name": pa.array(["a", "b", "b", "c"]),
        "p_brand": pa.array(["B1", "B2", "B2", None]),
        "p_type": pa.array(["t"] * 4),
        "p_size": pa.array([1] * 4, pa.int32()),
        "p_retailprice": pa.array([1.0] * 4, pa.float64())}))
    # part 1: quantities 1 and 100 (avg 50.5, thr 10.1 -> only qty=1
    # passes); part 2 (dup rows): NaN + 5 -> NaN threshold -> the
    # qty=5 row passes, doubled by the dup part rows; part 3:
    # qty 1 + 100 -> thr 10.1 -> the qty=1 row passes with a NULL
    # price, so the NULL-brand group keeps SQL's NULL sum
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([1] * 6, pa.int64()),
        "l_linenumber": pa.array([1] * 6, pa.int32()),
        "l_quantity": pa.array([1.0, 100.0, np.nan, 5.0, 1.0, 100.0],
                               pa.float64()),
        "l_extendedprice": pa.array([70.0, 1.0, 7.0, 14.0, None, 3.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 6, pa.float64()),
        "l_tax": pa.array([0.0] * 6, pa.float64()),
        "l_returnflag": pa.array(["R"] * 6),
        "l_linestatus": pa.array(["F"] * 6),
        "l_shipdate": pa.array(
            [pd.Timestamp("1996-01-01").to_pydatetime()] * 6,
            pa.timestamp("us"))}))
    out = q_small_quantity_revenue(str(tmp_path))
    got = {r["p_brand"]: r["avg_yearly"] for _, r in out.iterrows()}
    assert got["B1"] == 10.0           # 70 / 7
    assert got["B2"] == 4.0            # NaN thr passes qty=5 only: 14*2/7
    assert np.isnan(got[None])          # NULL price -> NULL sum
    con = duckdb.connect()
    for t in ["part", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{tmp_path}/{t}.parquet'")
    oracle = con.sql("""
        SELECT p_brand, round(sum(l1.l_extendedprice) / 7.0, 2)
                   AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY 1 ORDER BY 1 NULLS LAST""").df()
    exp = {r["p_brand"]: r["avg_yearly"] for _, r in oracle.iterrows()}
    for k in exp:
        kk = None if pd.isna(pd.Series([k], dtype=object))[0] else k
        if pd.isna(exp[k]):
            assert np.isnan(got[kk])
        else:
            assert got[kk] == exp[k], (k, got[kk], exp[k])


def test_user_hour_window_peers_and_boundary(ray_session, tmp_path):
    """q159: RANGE CURRENT ROW means last-peer (ties see each other),
    the 1h-preceding bound is inclusive, and partitions don't leak."""
    from web_scrapper_ray.pipelines.analytics import q_user_hour_window

    base = pd.Timestamp("2020-01-01").value // 1000
    H = 3_600_000_000
    ts = [base, base, base + H, base + 2 * H + 1, base]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "event_type": pa.array(["t"] * 5),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
        "props": pa.array(["{}"] * 5)}))
    out = q_user_hour_window(str(tmp_path)).set_index("event_id")
    # events 1,2 are ts-peers: each sees both (RANGE current-row =
    # last peer)
    assert out.loc[1, "n_win"] == 2 and out.loc[1, "sum_win"] == 3.0
    assert out.loc[2, "n_win"] == 2 and out.loc[2, "sum_win"] == 3.0
    # event 3 is exactly 1h later: inclusive lower bound pulls both
    assert out.loc[3, "n_win"] == 3 and out.loc[3, "sum_win"] == 7.0
    # event 4 is 1h+1µs after event 3: only itself... plus nothing
    assert out.loc[4, "n_win"] == 1 and out.loc[4, "sum_win"] == 8.0
    # user 8 never sees user 7's rows
    assert out.loc[5, "n_win"] == 1 and out.loc[5, "sum_win"] == 16.0


def test_idle_rich_customers_modulo_and_vacuous_exists(ray_session,
                                                       tmp_path):
    """q160: truncated modulo on a negative custkey (SQL %, not
    floored), NULL custkey survives NOT EXISTS vacuously into the NULL
    code group, and only orders past the cutoff disqualify."""
    from web_scrapper_ray.pipelines.analytics import q_idle_rich_customers

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([-10, 3, 4, None], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"]),
        "c_acctbal": pa.array([100.0, 90.0, 10.0, 95.0], pa.float64()),
        "c_nationkey": pa.array([0] * 4, pa.int32())}))
    # avg = (100+90+10+95)/4 = 73.75; -10, 3, NULL pass
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([3, -10], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"]),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([ts("2000-06-01"), ts("1999-06-01")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2)}))
    out = q_idle_rich_customers(str(tmp_path))
    # cust 3 has a RECENT order -> out; cust -10's order predates the
    # cutoff -> stays; -10 % 7 = -3 (truncated, not floored +4)
    cc = out["cc"].tolist()
    assert -3.0 in cc
    assert any(np.isnan(c) for c in cc)  # NULL custkey group
    assert len(out) == 2
    got = out.set_index("cc", drop=False)
    assert got.loc[-3.0, "total_bal"] == 100.0


def test_two_nation_volume_dup_dims_and_direction(ray_session, tmp_path):
    """q161: duplicate nation rows double the supplier side's fan-out,
    same-nation pairs are excluded, and volumes split by ship year."""
    from web_scrapper_ray.pipelines.analytics import q_two_nation_volume

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    # nation 0 = A (duplicated!), nation 1 = B
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 0, 1], pa.int32()),
        "n_name": pa.array(["NATION_3", "NATION_3", "NATION_7"]),
        "n_regionkey": pa.array([0, 0, 0], pa.int32())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["s1", "s2"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["c1", "c2"]),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_nationkey": pa.array([1, 0], pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"]),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([ts("1995-01-01")] * 2,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2)}))
    # line 1: supp 1 (A, dup nation -> x2) to cust 10 (B), 1995, 100
    # line 2: supp 2 (B) to cust 11 (A, dup nation -> x2), 1996, 50
    # line 3: supp 1 (A) to cust 11 (A) -> same nation, excluded
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([100, 101, 101], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1, 2], pa.int32()),
        "l_quantity": pa.array([1.0] * 3, pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, 7.0], pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_tax": pa.array([0.0] * 3, pa.float64()),
        "l_returnflag": pa.array(["R"] * 3),
        "l_linestatus": pa.array(["F"] * 3),
        "l_shipdate": pa.array([ts("1995-06-01"), ts("1996-06-01"),
                                ts("1996-06-01")], pa.timestamp("us"))}))
    out = q_two_nation_volume(str(tmp_path))
    got = {(r["supp_nation"], r["cust_nation"], r["l_year"]):
           r["revenue"] for _, r in out.iterrows()}
    assert got == {("NATION_3", "NATION_7", 1995): 200.0,
                   ("NATION_7", "NATION_3", 1996): 100.0}


def test_sole_late_shipper_dual_exists(ray_session, tmp_path):
    """q162: a sole-late supplier on a multi-supplier 'F' order counts;
    single-supplier orders fail EXISTS; two late suppliers fail NOT
    EXISTS; a NULL-suppkey line is never 'another supplier'."""
    from web_scrapper_ray.pipelines.analytics import q_sole_late_shipper

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
        "s_nationkey": pa.array([0] * 3, pa.int32()),
        "s_acctbal": pa.array([0.0] * 3, pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"]),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
        "o_orderdate": pa.array([ts("1996-01-01")] * 4,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)}))
    LATE, OK = ts("1996-06-01"), ts("1996-01-15")
    # order 1: supp1 late, supp2 on time -> supp1 counts
    # order 2: supp1 AND supp2 late -> neither counts
    # order 3: supp3 late but sole supplier (other line has NULL
    #          suppkey -> not 'another supplier') -> no count
    # order 4: status 'O' -> ignored entirely
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3, 4, 4], pa.int64()),
        "l_partkey": pa.array([1] * 8, pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 3, None, 1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1, 2, 1, 2], pa.int32()),
        "l_quantity": pa.array([1.0] * 8, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 8, pa.float64()),
        "l_discount": pa.array([0.0] * 8, pa.float64()),
        "l_tax": pa.array([0.0] * 8, pa.float64()),
        "l_returnflag": pa.array(["R"] * 8),
        "l_linestatus": pa.array(["F"] * 8),
        "l_shipdate": pa.array([LATE, OK, LATE, LATE, LATE, LATE,
                                LATE, OK], pa.timestamp("us"))}))
    out = q_sole_late_shipper(str(tmp_path))
    got = dict(zip(out["s_name"], out["numwait"]))
    assert got == {"s1": 1}


def test_nation_market_share_ratio_semantics(ray_session, tmp_path):
    """q163: the chosen nation's volume share per year; ELSE-0 keeps
    the numerator valid when the nation never ships, and the share is
    a plain ratio of the two sums."""
    from web_scrapper_ray.pipelines.analytics import q_nation_market_share

    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["AMERICA"])}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_5", "NATION_9"]),
        "n_regionkey": pa.array([0, 0], pa.int32())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["s1", "s2"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10], pa.int64()),
        "c_name": pa.array(["c"]),
        "c_acctbal": pa.array([0.0], pa.float64()),
        "c_nationkey": pa.array([1], pa.int32())}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([5, 6], pa.int64()),
        "p_name": pa.array(["p5", "p6"]),
        "p_brand": pa.array(["B", "B"]),
        "p_type": pa.array(["PROMO", "STANDARD"]),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0], pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_custkey": pa.array([10, 10], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"]),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([ts("1995-03-01"), ts("1996-03-01")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2)}))
    # 1995: N5 ships 30, N9 ships 70 -> share 0.3
    # 1996: only N9 ships (25, PROMO) + a STANDARD part line that
    #       must be excluded -> share 0.0 (ELSE-0 numerator is valid)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([100, 100, 101, 101], pa.int64()),
        "l_partkey": pa.array([5, 5, 5, 6], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2], pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([30.0, 70.0, 25.0, 99.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["R"] * 4),
        "l_linestatus": pa.array(["F"] * 4),
        "l_shipdate": pa.array([ts("1995-06-01")] * 4,
                               pa.timestamp("us"))}))
    out = q_nation_market_share(str(tmp_path))
    got = dict(zip(out["o_year"], out["mkt_share"]))
    assert got == {1995: 0.3, 1996: 0.0}


def test_isotonic_enrate_pools_violators(ray_session, tmp_path):
    """q268: a rate dip at x=20 pools into its neighbors; output rates
    are non-decreasing; total doc count is preserved."""
    from web_scrapper_ray.pipelines.textops import q_isotonic_enrate

    rows = []
    # x=10: 1/4 en; x=20: 0/4 en (violator -> pools with x=10);
    # x=30: 3/4 en; x=40: 4/4 en
    spec = [(10, 1), (20, 0), (30, 3), (40, 4)]
    did = 0
    for x, n_en in spec:
        for i in range(4):
            rows.append({"doc_id": did, "text": "t",
                         "lang": "en" if i < n_en else "de",
                         "source": "s", "n_chars": x})
            did += 1
    _write(tmp_path, "documents", pa.Table.from_pylist(rows))
    out = q_isotonic_enrate(str(tmp_path))
    assert out["n"].sum() == 16
    rates = out["rate"].to_numpy()
    assert (rates[1:] >= rates[:-1]).all()
    # the pooled first block spans x 10..20 with rate 1/8
    assert out.iloc[0]["x_lo"] == 10 and out.iloc[0]["x_hi"] == 20
    assert abs(out.iloc[0]["rate"] - 0.125) < 1e-12


def test_whitening_eval_near_identity(ray_session):
    """q269: whitened covariance of the sf0.001 embeddings is within
    eps-tolerance of the identity."""
    from web_scrapper_ray.pipelines.similarity import q_whitening_eval

    out = q_whitening_eval("/root/testdata/sf0.001")
    assert out["n"].iloc[0] > 0
    assert out["diag_err"].iloc[0] < 1e-3
    assert out["offdiag_max"].iloc[0] < 1e-3


def test_mmr_select_diversity_and_determinism(ray_session):
    """q270: MMR output is deterministic across runs, k rows, and its
    max intra-set similarity is <= plain top-k's (diversity bought)."""
    from web_scrapper_ray.pipelines.similarity import (
        q_knn_bruteforce, q_mmr_select)

    sf = "/root/testdata/sf0.001"
    a = q_mmr_select(sf, k=10)
    b = q_mmr_select(sf, k=10)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 10 and a["vec_id"].is_unique
    # relevance ranks never increase within MMR output rank order
    assert a["mmr_score"].iloc[0] >= a["mmr_score"].iloc[-1]

    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    def max_pairwise(ids):
        t = pads.dataset(f"{sf}/embeddings.parquet").to_table(
            filter=pc.field("vec_id").isin([int(i) for i in ids]),
            columns=["vec_id", "embedding"])
        M = np.asarray(t.column("embedding").to_pylist(), np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = M @ M.T
        np.fill_diagonal(S, -1)
        return S.max()

    topk = q_knn_bruteforce(sf, query_ids=(0,), k=10)
    assert max_pairwise(a["vec_id"]) <= max_pairwise(
        topk["neighbor_id"]) + 1e-9


def _us(day: int, hour: int = 0) -> int:
    return day * 86_400_000_000 + hour * 3_600_000_000


def test_kaplan_meier_hand_example(ray_session, tmp_path):
    """q257: observed at 0h and 2h, one censored at 5h — the KM
    staircase is 2/3 then 1/3, censored-only hours emit no row."""
    from web_scrapper_ray.pipelines.analytics import q_kaplan_meier

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view", "view",
                                "purchase"]),
        "ts": pa.array([_us(0, 0), _us(0, 2), _us(0, 0), _us(0, 5),
                        _us(0, 0)], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_kaplan_meier(str(tmp_path))
    assert out["h"].tolist() == [0, 2]
    assert out["n_risk"].tolist() == [3, 2]
    assert out["d"].tolist() == [1, 1]
    assert out["surv"].tolist() == [0.666667, 0.333333]


def test_quadratic_fit_exact_recovery(ray_session, tmp_path):
    """q258: y = 2 + 3q + 4q² recovers exactly; a 2-distinct-quantity
    group is rank-deficient -> NULL coefficients but a surfaced row."""
    from web_scrapper_ray.pipelines.analytics import q_quadratic_fit

    q = [1.0, 2.0, 3.0, 4.0]
    y = [2 + 3 * x + 4 * x * x for x in q]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * 4 + ["B"] * 3),
        "l_quantity": pa.array(q + [5.0, 5.0, 6.0], pa.float64()),
        "l_extendedprice": pa.array(y + [1.0, 2.0, 3.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_quadratic_fit(str(tmp_path)).set_index("flag")
    assert out.loc["A", "b1"] == 3.0 and out.loc["A", "b2"] == 4.0
    assert out.loc["A", "icept"] == 2.0 and out.loc["A", "n"] == 4
    assert np.isnan(out.loc["B", "b1"]) and out.loc["B", "n"] == 3


def test_markov_stationary_two_cycle(ray_session, tmp_path):
    """q259: a deterministic a→b→a cycle has the uniform stationary
    distribution."""
    from web_scrapper_ray.pipelines.analytics import q_markov_stationary

    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b"]),
        "ts": pa.array([_us(0, h) for h in range(4)],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_markov_stationary(str(tmp_path))
    got = dict(zip(out["event_type"], out["prob"]))
    assert got == {"a": 0.5, "b": 0.5}


def test_hits_hubs_small_graph(ray_session, tmp_path):
    """q262: matches a direct numpy alternating iteration on the same
    bipartite graph."""
    from web_scrapper_ray.pipelines.graph import q_hits_hubs

    edges = [(1, 1), (2, 1), (2, 2)]
    pq.write_table(pa.table({
        "l_partkey": pa.array([e[0] for e in edges] * 2, pa.int64()),
        "l_suppkey": pa.array([e[1] for e in edges] * 2, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_hits_hubs(str(tmp_path))
    E = np.array([[1, 0], [1, 1]], np.float64)  # parts × suppliers
    hub = np.ones(2)
    for _ in range(6):
        auth = E.T @ hub
        hub = E @ auth
    want = hub / hub.sum()
    got = out.set_index("partkey")["hub"]
    assert abs(got.loc[1] - round(want[0], 6)) < 1e-9
    assert abs(got.loc[2] - round(want[1], 6)) < 1e-9


def test_holt_linear_constant_trend(ray_session, tmp_path):
    """q267: a perfectly linear daily series keeps level=last value,
    trend=step, forecast7 = level + 7·step."""
    from web_scrapper_ray.pipelines.analytics import q_holt_linear

    pq.write_table(pa.table({
        "o_orderdate": pa.array([_us(0), _us(1), _us(2)],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.20, 0.30], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_holt_linear(str(tmp_path))
    assert out["n"].iloc[0] == 3
    assert out["level"].iloc[0] == 30.0
    assert out["trend"].iloc[0] == 10.0
    assert out["forecast7"].iloc[0] == 100.0


def test_page_hinkley_single_jump(ray_session, tmp_path):
    """q271: [10, 10, 40] climbs 20 cents from its trough at the last
    day."""
    from web_scrapper_ray.pipelines.analytics import q_page_hinkley

    pq.write_table(pa.table({
        "o_orderdate": pa.array([_us(0), _us(1), _us(2)],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.10, 0.40], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_page_hinkley(str(tmp_path))
    assert out["n"].iloc[0] == 3
    assert out["ph_max"].iloc[0] == 20.0
    assert out["day"].iloc[0] == 2


def test_user_erasure_audit_cascade(ray_session, tmp_path):
    """q273: the most active user's cascade counts events, their
    orders, and lineitems of those orderkeys only."""
    from web_scrapper_ray.pipelines.analytics import q_user_erasure_audit

    pq.write_table(pa.table({
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 200], pa.int64()),
        "o_custkey": pa.array([7, 7, 8], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 101, 200, None],
                               pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_user_erasure_audit(str(tmp_path))
    assert out.iloc[0].tolist() == [7, 3, 2, 3]


def test_mahalanobis_planted_outlier(ray_session, tmp_path):
    """q283: a point far along a low-variance direction ranks first,
    beating a same-L2 point along the high-variance axis."""
    from web_scrapper_ray.pipelines.similarity import (
        q_mahalanobis_outliers)

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (200, 4))
    base[:, 3] *= 0.01           # dim 3 is nearly constant
    base[0] = [8.0, 0, 0, 0]     # far along the WIDE axis
    base[1] = [0, 0, 0, 0.8]     # same-ish magnitude, NARROW axis
    rows = [{"vec_id": i, "embedding": base[i].tolist(), "label": 0}
            for i in range(len(base))]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "embeddings.parquet"))
    out = q_mahalanobis_outliers(str(tmp_path), k=5)
    assert len(out) == 5 and out["rank"].tolist() == [1, 2, 3, 4, 5]
    # the narrow-axis point dominates: its Mahalanobis blows up
    assert out.iloc[0]["vec_id"] == 1
    assert 0 in set(out["vec_id"])  # wide-axis point still surfaces


def test_pq_recall_eval_deterministic_floor(ray_session):
    """q289: PQ-ADC recall over sf0.001 is deterministic and beats
    random-selection recall (k/n ≈ 0.02) by a wide margin."""
    from web_scrapper_ray.pipelines.similarity import q_pq_recall_eval

    a = q_pq_recall_eval("/root/testdata/sf0.001")
    b = q_pq_recall_eval("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert a["n_probes"].iloc[0] == 8
    assert a["mean_recall"].iloc[0] >= 0.2


def test_nelson_aalen_hand_example(ray_session, tmp_path):
    """q290: same fixture as the KM hand example — cumhaz climbs
    1/3 then 1/3 + 1/2 = 5/6; surv_na = exp(-H); the censored-only
    hour (h=5) emits no row but stays in the at-risk denominator."""
    import math

    from web_scrapper_ray.pipelines.analytics import q_nelson_aalen

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view", "view",
                                "purchase"]),
        "ts": pa.array([_us(0, 0), _us(0, 2), _us(0, 0), _us(0, 5),
                        _us(0, 0)], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_nelson_aalen(str(tmp_path))
    assert out["h"].tolist() == [0, 2]
    assert out["n_risk"].tolist() == [3, 2]
    assert out["d"].tolist() == [1, 1]
    assert out["cumhaz"].tolist() == [0.333333, 0.833333]
    assert out["surv_na"].tolist() == [
        round(math.exp(-1 / 3), 6),
        round(math.exp(-(1 / 3 + 1 / 2)), 6)]


def test_common_neighbors_hand_example(ray_session, tmp_path):
    """q291: orders {1,2}, {2,3}, {3,4} → edges (1,2),(2,3),(3,4);
    non-edges with a shared neighbor are exactly (1,3) via 2 and
    (2,4) via 3; the adjacent pairs and the zero-overlap pair (1,4)
    never surface."""
    from web_scrapper_ray.pipelines.graph import q_common_neighbors

    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 20, 20, 30, 30], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 3, 4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_common_neighbors(str(tmp_path))
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, 3, 1), (2, 4, 1)]


def test_ewma_chart_hand_example(ray_session, tmp_path):
    """q294: y = [100, 200, 100] cents-days → ewma 100, 125, 118.75;
    resid 0, 100, -25; σ = √(2000/... ) population std of y; only the
    +100 jump beyond 3σ would flag (here σ≈47.1 → 3σ≈141.4, none)."""
    from web_scrapper_ray.pipelines.analytics import q_ewma_chart

    ts = [pd.Timestamp("2024-01-0%d" % d).to_pydatetime()
          for d in (1, 2, 3)]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(ts, pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 1.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_ewma_chart(str(tmp_path))
    assert out["revc"].tolist() == [100, 200, 100]
    assert out["ewma"].tolist() == [100.0, 125.0, 118.75]
    assert out["resid"].tolist() == [0.0, 100.0, -25.0]
    assert out["viol"].tolist() == [0, 0, 0]


def test_source_skewness_hand_example(ray_session, tmp_path):
    """q295: symmetric lengths → skew 0; right-skewed [1,1,1,9] →
    positive; constant group → NULL; NULL source is a group."""
    from web_scrapper_ray.pipelines.textops import q_source_skewness

    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "a", "b", "b", "b", "b",
                            "c", "c", None]),
        "n_chars": pa.array([1, 2, 3, 1, 1, 1, 9, 5, 5, 7],
                            pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = q_source_skewness(str(tmp_path))
    assert out["source"].tolist() == ["a", "b", "c", None]
    assert out["n"].tolist() == [3, 4, 2, 1]
    assert out["skew"].tolist()[0] == 0.0
    assert out["skew"].tolist()[1] > 1.0
    assert pd.isna(out["skew"].tolist()[2])
    assert pd.isna(out["skew"].tolist()[3])


def test_item_cf_hand_example(ray_session, tmp_path):
    """q296: parts 1,2 share both orders; each also pairs once with 3.
    sim(1,2) = 2/√(2·2) = 1.0; sim(1,3) = sim(2,3) = 1/√(2·1)."""
    from web_scrapper_ray.pipelines.graph import q_item_cf

    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 20, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_item_cf(str(tmp_path))
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, 2, 2, 1.0),
        (1, 3, 1, 0.707107),
        (2, 3, 1, 0.707107)]


def test_lang_rebalance_uniform_targets(ray_session, tmp_path):
    """q297: the minority lang keeps everything (p=1); the majority is
    thinned toward N/L; the keep decision is a pure function of
    doc_id so re-running (or re-partitioning) cannot change it."""
    import hashlib

    from web_scrapper_ray.pipelines.textops import q_lang_rebalance

    n_en, n_de = 40, 10
    ids = list(range(n_en + n_de))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(["en"] * n_en + ["de"] * n_de),
    }), str(tmp_path / "documents.parquet"))
    out = q_lang_rebalance(str(tmp_path))
    assert out["lang"].tolist() == ["de", "en"]
    assert out["n_before"].tolist() == [10, 40]
    assert out["p_keep"].tolist() == [1.0, 0.625]
    thr = int(np.floor(0.625 * 4503599627370496.0))
    exp = sum(1 for i in range(n_en)
              if int(hashlib.md5(str(i).encode()).hexdigest()[:13],
                     16) < thr)
    assert out["n_kept"].tolist() == [10, exp]


def test_target_encoding_shrinks_toward_global(ray_session, tmp_path):
    """q298: the 1-row category's encoding lands near the global mean
    (pseudo-count dominates); the big category barely moves; NULL
    priority is its own group."""
    from web_scrapper_ray.pipelines.analytics import q_target_encoding

    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["A"] * 40 + ["B"] + [None]),
        "o_totalprice": pa.array([1.0] * 40 + [101.0, 1.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_target_encoding(str(tmp_path))
    assert out["priority"].tolist() == ["A", "B", None]
    assert out["n"].tolist() == [40, 1, 1]
    g = (40 * 100 + 10100 + 100) / 42.0
    a, b = out["enc_cents"].tolist()[:2]
    assert abs(a - 100) < abs(b - 100)          # A stays near its mean
    assert abs(b - g) < abs(10100 - g) * 0.1    # B shrinks to global


def test_feature_hash_eval_collisions(ray_session, tmp_path):
    """q299: B=2 forces collisions; n_words is the distinct vocab and
    max_load + used buckets follow the md5 coin exactly."""
    import hashlib

    from web_scrapper_ray.pipelines.textops import q_feature_hash_eval

    pq.write_table(pa.table({
        "text": pa.array(["alpha beta gamma", "beta delta", None]),
    }), str(tmp_path / "documents.parquet"))
    out = q_feature_hash_eval(str(tmp_path), B=2)
    words = ["alpha", "beta", "gamma", "delta"]
    fb = [int(hashlib.md5(w.encode()).hexdigest()[:13], 16) % 2
          for w in words]
    assert out["n_words"].tolist() == [4]
    assert out["n_used"].tolist() == [len(set(fb))]
    assert out["max_load"].tolist() == [max(fb.count(0), fb.count(1))]


def test_split_leakage_hand_example(ray_session, tmp_path):
    """q300: user 1's events land on both sides of the md5 coin by
    construction (picked ids), user 2 is train-only — exactly one
    leaked user."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import q_split_leakage

    thr = int(np.floor(0.8 * 4503599627370496.0))

    def side(e):
        return int(hashlib.md5(str(e).encode()).hexdigest()[:13],
                   16) < thr

    ids = list(range(200))
    tr = next(e for e in ids if side(e))
    te = next(e for e in ids if not side(e))
    tr2 = next(e for e in ids if side(e) and e != tr)
    pq.write_table(pa.table({
        "event_id": pa.array([tr, te, tr2], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = q_split_leakage(str(tmp_path))
    assert out["n_users"].tolist() == [2]
    assert out["n_train_users"].tolist() == [2]
    assert out["n_test_users"].tolist() == [1]
    assert out["n_leaked"].tolist() == [1]
    assert out["leak_share"].tolist() == [0.5]


def test_heaps_law_hand_example(ray_session, tmp_path):
    """q301: doc 100 contributes before the 125 checkpoint, doc 300
    only from 500 up; types count first occurrences only."""
    from web_scrapper_ray.pipelines.textops import q_heaps_law

    pq.write_table(pa.table({
        "doc_id": pa.array([100, 300], pa.int64()),
        "text": pa.array(["a b a", "b c d"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_heaps_law(str(tmp_path))
    assert out["n_tokens"].tolist()[:3] == [3, 3, 6]
    assert out["n_types"].tolist()[:3] == [2, 2, 4]


def test_near_amount_pairs_band_straddle(ray_session, tmp_path):
    """q302: 10.20 vs 10.60 straddles a 50-cent band boundary (1020 //
    50 = 20, 1060 // 50 = 21) and must still pair; 10.20 vs 11.00
    (80 cents) must not; equal amounts on distinct orders pair at
    diff 0."""
    from web_scrapper_ray.pipelines.analytics import q_near_amount_pairs

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.20, 10.60, 11.00, 10.20],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_near_amount_pairs(str(tmp_path))
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, 4, 0), (1, 2, 40), (2, 3, 40), (2, 4, 40)]


def test_daily_mix_jaccard_hand_example(ray_session, tmp_path):
    """q303: day 0 {a:2, b:1} vs day 1 {a:1, c:1} → Σmin=1, Σmax=4;
    the gap before day 3 emits no row."""
    from web_scrapper_ray.pipelines.analytics import q_daily_mix_jaccard

    DAY = 86_400_000_000
    us = [0, 1, 2, DAY, DAY + 1, 3 * DAY]
    pq.write_table(pa.table({
        "ts": pa.array(us, pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b", "a", "c", "a"]),
    }), str(tmp_path / "events.parquet"))
    out = q_daily_mix_jaccard(str(tmp_path))
    assert out["day"].tolist() == [1]
    assert out["smin"].tolist() == [1]
    assert out["smax"].tolist() == [4]
    assert out["jaccard"].tolist() == [0.25]


def test_ship_lag_percentiles_disc_rule(ray_session, tmp_path):
    """q304: lags 10,20,30,40 in one month → p50 = ceil(.5·4)−1 =
    index 1 → 20; p90 = index ⌈3.6⌉−1 = 3 → 40; join fans out per
    lineitem row."""
    from web_scrapper_ray.pipelines.analytics import (
        q_ship_lag_percentiles)

    DAY = 86_400_000_000
    od = pd.Timestamp("2024-03-05").value // 1000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([od], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([od + 10 * DAY, od + 20 * DAY,
                                od + 30 * DAY, od + 40 * DAY],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_ship_lag_percentiles(str(tmp_path))
    m0 = int(pd.Timestamp("2024-03-01").value // 1000 // DAY)
    assert out["month"].tolist() == [m0]
    assert out["n"].tolist() == [4]
    assert out["p50"].tolist() == [20]
    assert out["p90"].tolist() == [40]


def test_late_rate_wilson_bounds(ray_session, tmp_path):
    """q305: 1 late of 4 → rate .25, Wilson 95% ≈ [.0456, .6994] —
    and the interval brackets the rate."""
    from web_scrapper_ray.pipelines.analytics import q_late_rate_wilson

    DAY = 86_400_000_000
    od = pd.Timestamp("2024-03-05").value // 1000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([od], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([od + 10 * DAY, od + 20 * DAY,
                                od + 30 * DAY, od + 2000 * DAY],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_late_rate_wilson(str(tmp_path))
    assert out["n"].tolist() == [4]
    assert out["n_late"].tolist() == [1]
    assert out["late_rate"].tolist() == [0.25]
    lo, hi = out["wilson_lo"][0], out["wilson_hi"][0]
    assert 0.04 < lo < 0.05 and 0.69 < hi < 0.71
    assert lo < 0.25 < hi


def test_shuffle_quality_hand_example(ray_session, tmp_path):
    """q307: ingest order aaab has 2 same-source adjacencies; the md5
    order's count matches a direct recomputation; NULL sources
    compare NULL-equals-NULL."""
    import hashlib

    from web_scrapper_ray.pipelines.textops import q_shuffle_quality

    srcs = ["a", "a", "a", "b", None, None]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "source": pa.array(srcs),
    }), str(tmp_path / "documents.parquet"))
    out = q_shuffle_quality(str(tmp_path))
    assert out["n"].tolist() == [6]
    assert out["same_adj_seq"].tolist() == [3]   # aa, aa, NULL-NULL
    order = sorted(range(6), key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    exp = sum(1 for x, y in zip(order, order[1:])
              if srcs[x] == srcs[y])
    assert out["same_adj_shuf"].tolist() == [exp]


def test_markov_attribution_closed_form(ray_session, tmp_path):
    """q308: journeys [A,purchase], [B], [A,B,purchase] → p_conv =
    2/3, removal effects A = 3/4, B = 1/2, shares 0.6 / 0.4 (hand
    absorbing-chain solve)."""
    from web_scrapper_ray.pipelines.analytics import (
        q_markov_attribution)

    rows = [(1, 0, "A"), (1, 1, "purchase"),
            (2, 0, "B"),
            (3, 0, "A"), (3, 1, "B"), (3, 2, "purchase")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_markov_attribution(str(tmp_path))
    got = {r.channel: r for r in out.itertuples(index=False)}
    assert set(got) == {"A", "B"}
    assert got["A"].p_conv == round(2 / 3, 6)
    assert got["A"].removal_effect == 0.75
    assert got["B"].removal_effect == 0.5
    assert got["A"].attribution == 0.6
    assert got["B"].attribution == 0.4


def test_markov_attribution_same_bucket_sentinels(ray_session,
                                                  tmp_path):
    """q308 regression (r4 ADVICE): users 1 and 65 land in the SAME
    uid%64 bucket; journeys [A,purchase] and [A] must yield
    p_conv=0.5, not 1.0 — a raw-string per-bucket groupby merges the
    NUL-prefixed CONV/END sentinels under pandas' NUL-terminated
    hashing. Also plants a NUL-bearing event type next to its prefix
    twin in one bucket."""
    from web_scrapper_ray.pipelines.analytics import (
        q_markov_attribution)

    rows = [(1, 0, "A"), (1, 1, "purchase"),
            (65, 0, "A"),
            (2, 0, "fz"), (2, 1, "purchase"),
            (66, 0, "fz\x00nul")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_markov_attribution(str(tmp_path))
    got = {r.channel: r for r in out.itertuples(index=False)}
    assert set(got) == {"A", "fz", "fz\x00nul"}
    # 4 journeys: A→CONV, A→END, fz→CONV, fznul→END ⇒
    # p_conv = (2/4)(1/2) + (1/4)(1) = 1/2
    assert got["A"].p_conv == 0.5
    # dropping A or fz leaves p=0.25 ⇒ effect 0.5 each; fznul never
    # converts ⇒ effect 0
    assert got["A"].removal_effect == 0.5
    assert got["fz"].removal_effect == 0.5
    assert got["fz\x00nul"].removal_effect == 0.0


def test_behavior_coverage_nul_adjacency(ray_session, tmp_path):
    """q354 regression (r4 ADVICE): a test user's fz\\x00nul→click
    bigram must NOT be covered by a train-side fz→click bigram —
    the first per-bucket aggregation has to be code-keyed."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import (
        q_behavior_coverage)

    thr = int(np.floor(0.8 * 4503599627370496.0))

    def is_tr(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13],
                   16) < thr

    tr_u = next(u for u in range(50) if is_tr(u))
    te_u = next(u for u in range(tr_u + 64, tr_u + 64 * 40, 64)
                if not is_tr(u))
    rows = [(tr_u, 0, "fz"), (tr_u, 1, "click"),
            (te_u, 0, "fz\x00nul"), (te_u, 1, "click")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_behavior_coverage(str(tmp_path))
    assert out["n_test_bigrams"].tolist() == [1]
    assert out["n_covered"].tolist() == [0]
    assert out["vocab_coverage"].tolist() == [0.0]
    assert out["mass_coverage"].tolist() == [0.0]


def test_pk_dup_audit_counts(ray_session, tmp_path):
    """q309: planted dup key + NULL key are counted per table; clean
    tables report zeros."""
    from web_scrapper_ray.pipelines.analytics import q_pk_dup_audit

    pq.write_table(pa.table({"c_custkey": pa.array(
        [1, 2, 2, None], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    for tbl, col in (("events", "event_id"),
                     ("nation", "n_nationkey"),
                     ("orders", "o_orderkey"), ("part", "p_partkey"),
                     ("region", "r_regionkey"),
                     ("supplier", "s_suppkey")):
        pq.write_table(pa.table({col: pa.array([1, 2], pa.int64())}),
                       str(tmp_path / f"{tbl}.parquet"))
    out = q_pk_dup_audit(str(tmp_path))
    cust = out[out["tbl"] == "customer"].iloc[0]
    assert (cust["n_rows"], cust["n_keys"], cust["n_null_keys"],
            cust["n_dup_rows"]) == (4, 2, 1, 1)
    rest = out[out["tbl"] != "customer"]
    assert (rest["n_dup_rows"] == 0).all()
    assert (rest["n_null_keys"] == 0).all()


def test_brand_homophily_perfect_sort(ray_session, tmp_path):
    """q310: baskets never mix brands → obs = 1 and H = 1; a missing
    part row lands in the NULL-brand group."""
    from web_scrapper_ray.pipelines.graph import q_brand_homophily

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([10, 11, 20, 21], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 11, 20, 21], pa.int64()),
        "p_brand": pa.array(["X", "X", "Y", "Y"]),
    }), str(tmp_path / "part.parquet"))
    out = q_brand_homophily(str(tmp_path))
    assert out["m_edges"].tolist() == [2]
    assert out["same_brand"].tolist() == [2]
    assert out["obs"].tolist() == [1.0]
    assert out["homophily"].tolist() == [1.0]


def test_exp_arrival_ks_exact_exponential_grid(ray_session, tmp_path):
    """q311: gaps all equal → EDF jumps 0→1 at the mean, theory is
    1−e⁻¹ there, so D = max(1−e⁻¹, ... ) = 1/e-side value — pinned
    against a direct computation."""
    import math

    from web_scrapper_ray.pipelines.rankstats import q_exp_arrival_ks

    ts = [0, 1_000_000, 2_000_000, 3_000_000]
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_exp_arrival_ks(str(tmp_path))
    assert out["n_gaps"].tolist() == [3]
    assert out["mean_gap_us"].tolist() == [1_000_000.0]
    f = 1.0 - math.exp(-1.0)
    assert out["ks_d"].tolist() == [round(max(abs(1.0 - f), f), 6)]


def test_token_budget_mix_boundary(ray_session, tmp_path):
    """q312: budget = 15//2 = 7 chars; best source taken whole (4),
    second partially (3 of 6); the third never surfaces. An
    exact-boundary budget stops BEFORE a zero-take row."""
    from web_scrapper_ray.pipelines.textops import q_token_budget_mix

    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b", "c"]),
        "lang": pa.array(["en", "en", "en", "de", "de"]),
        "n_chars": pa.array([2, 2, 3, 3, 5], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = q_token_budget_mix(str(tmp_path))
    assert out["source"].tolist() == ["a", "b"]
    assert out["chars_taken"].tolist() == [4, 3]
    assert out["en_share"].tolist() == [1.0, 0.5]


def test_fd_histogram_hand_example(ray_session, tmp_path):
    """q313: values 0..8 (n=9): q1 = idx ceil(2.25)-1 = 2, q3 = idx 6
    → IQR 4, w = 8/9^(1/3); the max clamps into the last bin."""
    from web_scrapper_ray.pipelines.rankstats import q_fd_histogram

    vals = [float(i) for i in range(9)]
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * 9),
        "value": pa.array(vals, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_fd_histogram(str(tmp_path))
    w = 2.0 * 4.0 / 9.0 ** (1.0 / 3.0)
    nbins = int(np.ceil(8.0 / w))
    exp = np.minimum(np.floor(np.array(vals) / w).astype(int),
                     nbins - 1)
    import collections
    cnt = collections.Counter(exp)
    assert out["bin"].tolist() == sorted(cnt)
    assert out["n"].tolist() == [cnt[b] for b in sorted(cnt)]
    assert int(out["n"].sum()) == 9


def test_blocking_quality_counts(ray_session, tmp_path):
    """q314: groups aaa×3 and zzz×2 sort contiguously, so all 4 true
    pairs sit within the w=4 window (pair completeness 1.0) while
    the window prunes most of the n(n−1)/2 comparison space."""
    from web_scrapper_ray.pipelines.dedup import q_blocking_quality

    docs = (["aaa", "aaa", "aaa"]
            + [f"m{i:02d}" for i in range(6)]   # spacers
            + ["zzz", "zzz"])
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs),
    }), str(tmp_path / "documents.parquet"))
    out = q_blocking_quality(str(tmp_path))
    assert out["true_pairs"].tolist() == [4]
    assert out["found_true"].tolist() == [4]
    assert out["pair_completeness"].tolist() == [1.0]
    assert out["cand_pairs"][0] < out["total_pairs"][0]


def test_dup_cluster_sizes_census(ray_session, tmp_path):
    """q315: 3×'a', 2×'b', 1×'c' → sizes {3:1, 2:1, 1:1}; NULL text
    is out of the census."""
    from web_scrapper_ray.pipelines.dedup import q_dup_cluster_sizes

    pq.write_table(pa.table({
        "text": pa.array(["a", "a", "a", "b", "b", "c", None]),
    }), str(tmp_path / "documents.parquet"))
    out = q_dup_cluster_sizes(str(tmp_path))
    assert out["size"].tolist() == [1, 2, 3]
    assert out["n_groups"].tolist() == [1, 1, 1]


def test_numeric_profile_nonfinite(ray_session, tmp_path):
    """q320: NULL / NaN / inf are counted separately and min/max see
    finite values only."""
    from web_scrapper_ray.pipelines.analytics import q_numeric_profile

    pq.write_table(pa.table({
        "value": pa.array([1.0, -5.0, None, float("nan"),
                           float("inf")], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    pq.write_table(pa.table({
        "l_quantity": pa.array([2.0], pa.float64()),
        "l_extendedprice": pa.array([3.0], pa.float64()),
        "l_discount": pa.array([0.1], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_totalprice": pa.array([7.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_numeric_profile(str(tmp_path))
    ev = out[out["col"] == "value"].iloc[0]
    assert (ev["n"], ev["n_null"], ev["n_nonfinite"]) == (5, 1, 2)
    assert (ev["mn"], ev["mx"]) == (-5.0, 1.0)


def test_dup_row_census_group_semantics(ray_session, tmp_path):
    """q321: NULLs group together, NaN with NaN, −0.0 with 0.0 — the
    probed DuckDB GROUP BY rules."""
    from web_scrapper_ray.pipelines.analytics import q_dup_row_census

    nan = float("nan")
    pq.write_table(pa.table({
        "event_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([0, 0, 0, 0, 0], pa.timestamp("us")),
        "user_id": pa.array([None, None, 7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "c"]),
        "value": pa.array([nan, nan, 0.0, -0.0, 1.0], pa.float64()),
        "props": pa.array([None, None, "{}", "{}", None]),
    }), str(tmp_path / "events.parquet"))
    out = q_dup_row_census(str(tmp_path))
    assert out["n_rows"].tolist() == [5]
    assert out["n_distinct"].tolist() == [3]
    assert out["n_dup_rows"].tolist() == [2]
    assert out["max_multiplicity"].tolist() == [2]


def test_top_share_hand_example(ray_session, tmp_path):
    """q323: 100 customers, top-1% = 1 customer (the 9900-cent
    whale) → share = 9900/(9900+99·100)."""
    from web_scrapper_ray.pipelines.analytics import q_top_share

    n = 100
    keys = list(range(n))
    prices = [99.0] + [1.0] * (n - 1)
    pq.write_table(pa.table({
        "o_custkey": pa.array(keys, pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_top_share(str(tmp_path))
    assert out["n_customers"].tolist() == [100]
    assert out["k_top"].tolist() == [1]
    assert out["top_rev_cents"].tolist() == [9900]
    assert out["top_share"].tolist() == [round(9900 / 19800, 6)]


def test_length_quantile_report_hand(ray_session, tmp_path):
    """q324: source a = 1..4 (p25=1, p50=2, p75=3, disc rule), source
    b = 10,20 (p50 = 10); pooled rank of b's median counts all six
    values below 10 → 4/6."""
    from web_scrapper_ray.pipelines.textops import (
        q_length_quantile_report)

    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "a", "a", "b", "b"]),
        "n_chars": pa.array([1, 2, 3, 4, 10, 20], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = q_length_quantile_report(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert (a["p25"], a["p50"], a["p75"]) == (1, 2, 3)
    assert a["pooled_rank_p50"] == round(1 / 6, 6)
    b = out[out["source"] == "b"].iloc[0]
    assert (b["p25"], b["p50"], b["p75"]) == (10, 10, 20)
    assert b["pooled_rank_p50"] == round(4 / 6, 6)


def test_double_fire_rate_hand(ray_session, tmp_path):
    """q325: user 1 fires view twice 0.5 s apart (fast), then view →
    purchase (type change, no pair), purchase again 5 s later (slow
    pair)."""
    from web_scrapper_ray.pipelines.analytics import q_double_fire_rate

    us = [0, 500_000, 2_000_000, 7_000_000]
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["view", "view", "purchase",
                                "purchase"]),
        "ts": pa.array(us, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_double_fire_rate(str(tmp_path))
    assert out["event_type"].tolist() == ["purchase", "view"]
    assert out["n_pairs"].tolist() == [1, 1]
    assert out["n_fast"].tolist() == [0, 1]
    assert out["fast_rate"].tolist() == [0.0, 1.0]


def test_range_partitioner_global_order(ray_session, tmp_path):
    """q326: partition manifests prove the global order — max of
    part i never exceeds min of part i+1, counts add to n."""
    from web_scrapper_ray.pipelines.layout import q_range_partitioner

    rng = np.random.default_rng(11)
    n = 400
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(n)), pa.int64()),
        "o_totalprice": pa.array(
            rng.uniform(1, 1000, n).round(2), pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_range_partitioner(str(tmp_path))
    assert int(out["n"].sum()) == n
    mx = out["mx_cents"].to_numpy()
    mn = out["mn_cents"].to_numpy()
    assert (mx[:-1] <= mn[1:]).all()


def test_skew_advisor_hot_key(ray_session, tmp_path):
    """q327: one user with 90 of 100 rows makes its md5 bucket carry
    ~90% of the load with a single key."""
    import hashlib

    from web_scrapper_ray.pipelines.layout import q_skew_advisor

    users = [7] * 90 + list(range(100, 110))
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = q_skew_advisor(str(tmp_path))
    hot = int(hashlib.md5(b"7").hexdigest()[:13], 16) % 32
    row = out[out["bucket"] == hot].iloc[0]
    assert row["n_rows"] >= 90
    assert int(out["n_rows"].sum()) == 100
    assert row["load_share"] >= 0.9


def test_daily_ohlc_tie_order(ray_session, tmp_path):
    """q328: open/close follow (ts, event_id) order exactly — equal
    timestamps break by event_id; NaN values are excluded."""
    from web_scrapper_ray.pipelines.analytics import q_daily_ohlc

    pq.write_table(pa.table({
        "event_id": pa.array([2, 1, 3, 4], pa.int64()),
        "ts": pa.array([0, 0, 500, 900], pa.timestamp("us")),
        "value": pa.array([5.0, 1.0, float("nan"), 9.0],
                          pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_daily_ohlc(str(tmp_path))
    assert out["open"].tolist() == [1.0]    # eid 1 wins the ts tie
    assert out["close"].tolist() == [9.0]
    assert out["high"].tolist() == [9.0]
    assert out["low"].tolist() == [1.0]
    assert out["n"].tolist() == [3]


def test_dau_mau_hand(ray_session, tmp_path):
    """q329: 2 days; user 1 active both days, user 2 once → ΣDAU=3,
    MAU=2, stickiness = (3/2)/2."""
    from web_scrapper_ray.pipelines.analytics import q_dau_mau

    DAY = 86_400_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10, DAY, DAY + 5], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_dau_mau(str(tmp_path))
    assert out["n_days"].tolist() == [2]
    assert out["mau"].tolist() == [2]
    assert out["dau_avg"].tolist() == [1.5]
    assert out["stickiness"].tolist() == [0.75]


def test_pii_rate_hand(ray_session, tmp_path):
    """q330: the email doc and the dotted-phone doc are each counted
    once per source; a doc with both counts in both columns."""
    from web_scrapper_ray.pipelines.textops import q_pii_rate

    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "a", "b"]),
        "text": pa.array(["write Bob@Example.COM today",
                          "call 555-123-4567 or 999.888.7777",
                          "nothing here",
                          "x@y.io and 111-222-3333"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_pii_rate(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert (a["n_docs"], a["n_email"], a["n_phone"]) == (3, 1, 1)
    b = out[out["source"] == "b"].iloc[0]
    assert (b["n_email"], b["n_phone"]) == (1, 1)
    assert b["email_per_1k"] == 1000.0


def test_sentence_stats_hand(ray_session, tmp_path):
    """q331: 'Hi there. Bye!?' is 2 sentence runs, 3 words; a NULL
    text doc still counts toward n_docs."""
    from web_scrapper_ray.pipelines.textops import q_sentence_stats

    pq.write_table(pa.table({
        "lang": pa.array(["en", "en"]),
        "text": pa.array(["Hi there. Bye!?", None]),
    }), str(tmp_path / "documents.parquet"))
    out = q_sentence_stats(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_docs"], r["n_sentences"], r["n_words"]) == (2, 2, 3)
    assert r["words_per_sentence"] == 1.5


def test_nonascii_share_hand(ray_session, tmp_path):
    """q332: 'héllo✓' has 2 non-ASCII of 6 chars; pure-ASCII source
    reports 0."""
    from web_scrapper_ray.pipelines.textops import q_nonascii_share

    pq.write_table(pa.table({
        "source": pa.array(["a", "b"]),
        "text": pa.array(["héllo✓", "plain"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_nonascii_share(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert (a["n_chars"], a["n_nonascii"]) == (6, 2)
    assert a["nonascii_share"] == round(2 / 6, 6)
    assert out[out["source"] == "b"].iloc[0]["nonascii_share"] == 0.0


def test_term_burstiness_hand(ray_session, tmp_path):
    """q333: 'x' appears 4 times in 1 doc (burstiness 4); 'y' once in
    each of 2 docs (burstiness 1); duplicate rows are separate
    documents."""
    from web_scrapper_ray.pipelines.textops import q_term_burstiness

    pq.write_table(pa.table({
        "text": pa.array(["x x x x y", "y", "y"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_term_burstiness(str(tmp_path))
    got = {r.word: (r.cf, r.df, r.burstiness)
           for r in out.itertuples(index=False)}
    assert got["x"] == (4, 1, 4.0)
    assert got["y"] == (3, 3, 1.0)


def test_rank_overlap_rbo_identical_and_disjoint(ray_session,
                                                 tmp_path):
    """q334: identical month rankings → RBO 1.0; the hand case pins
    the truncated-depth formula."""
    from web_scrapper_ray.pipelines.analytics import q_rank_overlap_rbo

    DAY = 86_400_000_000
    jan = pd.Timestamp("2024-01-05").value // 1000
    feb = pd.Timestamp("2024-02-05").value // 1000
    n = 25                      # > k, so identical rankings score 1
    supp, ship, price = [], [], []
    for i in range(n):
        for m0 in (jan, feb):
            supp.append(i + 1)
            ship.append(m0 + i * DAY // n)
            price.append(1000.0 - i)
    pq.write_table(pa.table({
        "l_suppkey": pa.array(supp, pa.int64()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array([0.0] * len(supp), pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_rank_overlap_rbo(str(tmp_path))
    assert out["rbo"].tolist() == [1.0]
    assert out["overlap_at_k"].tolist() == [20]


def test_conversion_path_length_hand(ray_session, tmp_path):
    """q335: user 1 buys as its 3rd event (len 2), user 2 lands on a
    purchase (len 0), user 3 never converts (no row)."""
    from web_scrapper_ray.pipelines.analytics import (
        q_conversion_path_length)

    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (1, 3, "view"),
            (2, 0, "purchase"),
            (3, 0, "view")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_conversion_path_length(str(tmp_path))
    assert out["path_len"].tolist() == [0, 2]
    assert out["n_users"].tolist() == [1, 1]


def test_hour_anomalies_spike(ray_session, tmp_path):
    """q336: a 10-event spike hour against 1-event hours tops the |z|
    ranking."""
    from web_scrapper_ray.pipelines.analytics import q_hour_anomalies

    HOUR = 3_600_000_000
    us = [0] * 10 + [HOUR, 2 * HOUR, 3 * HOUR]
    pq.write_table(pa.table({
        "ts": pa.array(us, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_hour_anomalies(str(tmp_path))
    lam = 13 / 4
    assert out["hour"].tolist()[0] == 0
    assert out["n"].tolist()[0] == 10
    assert out["z"].tolist()[0] == round((10 - lam) / lam ** 0.5, 6)


def test_item_novelty_rate_hand(ray_session, tmp_path):
    """q337: part 1 ships in both months, part 2 only in month 2 →
    month-2 novelty = 1/2."""
    from web_scrapper_ray.pipelines.analytics import (
        q_item_novelty_rate)

    jan = pd.Timestamp("2024-01-10").value // 1000
    feb = pd.Timestamp("2024-02-10").value // 1000
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([jan, feb, feb], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_item_novelty_rate(str(tmp_path))
    assert out["n_active"].tolist() == [1, 2]
    assert out["n_new"].tolist() == [1, 1]
    assert out["novelty_share"].tolist() == [1.0, 0.5]


def test_near_purchase_rate_window(ray_session, tmp_path):
    """q338: the click 4 min before the purchase is near, the view 10
    min before is not; the purchase itself never counts as an
    event."""
    from web_scrapper_ray.pipelines.analytics import (
        q_near_purchase_rate)

    MIN = 60_000_000
    rows = [(1, 0, "view"), (1, 6 * MIN, "click"),
            (1, 10 * MIN, "purchase"), (2, 0, "click")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_near_purchase_rate(str(tmp_path))
    got = {r.event_type: (r.n, r.n_near_purchase)
           for r in out.itertuples(index=False)}
    assert got["click"] == (2, 1)
    assert got["view"] == (1, 0)


def test_eccentricity_sample_path_graph(ray_session, tmp_path):
    """q340: a part–supplier path p1–s1–p2–s2–p3 gives the end part
    eccentricity 4 (bipartite hops) and full reach 5."""
    from web_scrapper_ray.pipelines.graph import q_eccentricity_sample

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 10, 20, 20], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_eccentricity_sample(str(tmp_path), n_seeds=3)
    assert set(out["seed_part"]) == {1, 2, 3}
    got = {r.seed_part: (r.ecc, r.n_reached)
           for r in out.itertuples(index=False)}
    assert got[1] == (4, 5)
    assert got[2] == (2, 5)
    assert got[3] == (4, 5)


def test_srm_check_balanced_split(ray_session, tmp_path):
    """q341: the md5 coin splits 200 users near 50/50; χ² stays far
    below the flag threshold; counts match a direct recount."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import q_srm_check

    users = list(range(200))
    pq.write_table(pa.table({
        "user_id": pa.array(users * 2, pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = q_srm_check(str(tmp_path))
    thr = int(np.floor(0.5 * 4503599627370496.0))
    na = sum(1 for u in users
             if int(hashlib.md5(str(u).encode()).hexdigest()[:13],
                    16) < thr)
    assert out["n_a"].tolist() == [na]
    assert out["n_b"].tolist() == [200 - na]
    assert out["srm_flag"].tolist() == [0]


def test_cohort_ltv_offsets(ray_session, tmp_path):
    """q342: user 1's purchases cohort at Jan with offsets 0 and 2;
    user 2 cohorts at Feb; views never enter."""
    from web_scrapper_ray.pipelines.analytics import q_cohort_ltv

    def ts(s):
        return pd.Timestamp(s).value // 1000

    rows = [(1, ts("2024-01-10"), "purchase", 10.0),
            (1, ts("2024-03-05"), "purchase", 5.0),
            (1, ts("2024-02-01"), "view", 99.0),
            (2, ts("2024-02-02"), "purchase", 7.0)]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_cohort_ltv(str(tmp_path))
    jan = ts("2024-01-01") // 86_400_000_000
    feb = ts("2024-02-01") // 86_400_000_000
    got = {(r.cohort_month, r.month_offset):
           (r.revenue_cents, r.n_purchases)
           for r in out.itertuples(index=False)}
    assert got[(jan, 0)] == (1000, 1)
    assert got[(jan, 2)] == (500, 1)
    assert got[(feb, 0)] == (700, 1)


def test_type_conversion_lift_hand(ray_session, tmp_path):
    """q343: 2 of 4 users purchase (base 1/2); both clickers
    purchased (lift 2); neither scroller did (lift 0)."""
    from web_scrapper_ray.pipelines.analytics import (
        q_type_conversion_lift)

    rows = [(1, "click"), (1, "purchase"),
            (2, "click"), (2, "purchase"),
            (3, "scroll"), (4, "scroll")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_type_conversion_lift(str(tmp_path))
    got = {r.event_type: r.lift for r in out.itertuples(index=False)}
    assert got["click"] == 2.0
    assert got["scroll"] == 0.0
    assert got["purchase"] == 2.0


def test_churn_curve_hand(ray_session, tmp_path):
    """q345: users {1,2} active in Jan, only 1 returns in Feb → Jan
    churn 1/2; Feb (last month) is right-censored out."""
    from web_scrapper_ray.pipelines.analytics import q_churn_curve

    def ts(s):
        return pd.Timestamp(s).value // 1000

    pq.write_table(pa.table({
        "user_id": pa.array([1, 2, 1], pa.int64()),
        "ts": pa.array([ts("2024-01-03"), ts("2024-01-20"),
                        ts("2024-02-10")], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_churn_curve(str(tmp_path))
    jan = ts("2024-01-01") // 86_400_000_000
    assert out["month"].tolist() == [jan]
    assert out["n_active"].tolist() == [2]
    assert out["n_churned"].tolist() == [1]
    assert out["churn_rate"].tolist() == [0.5]


def test_split_balance_ks_deterministic(ray_session, tmp_path):
    """q344: the KS gap matches a direct recomputation over the md5
    split — and is invariant to file row order."""
    import hashlib

    from web_scrapper_ray.pipelines.rankstats import q_split_balance_ks

    n = 60
    ids = list(range(n))
    lens = [(i * 37) % 100 + 1 for i in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array(lens, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = q_split_balance_ks(str(tmp_path))
    thr = int(np.floor(0.8 * 4503599627370496.0))
    tr = [int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
          < thr for i in ids]
    a = sorted(l for l, t in zip(lens, tr) if t)
    b = sorted(l for l, t in zip(lens, tr) if not t)
    vals = sorted(set(lens))
    d = max(abs(sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b))
            for v in vals)
    assert out["n_train"].tolist() == [len(a)]
    assert out["n_test"].tolist() == [len(b)]
    assert out["ks_d"][0] == round(d, 6)   # engine rounds to 6dp


def test_whale_curve_tiling(ray_session, tmp_path):
    """q346: 12 customers → first two deciles get 2 members (ntile
    tiling), the whale decile holds most of the revenue."""
    from web_scrapper_ray.pipelines.analytics import q_whale_curve

    n = 12
    pq.write_table(pa.table({
        "o_custkey": pa.array(list(range(n)), pa.int64()),
        "o_totalprice": pa.array([1000.0] + [1.0] * (n - 1),
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_whale_curve(str(tmp_path))
    assert out["n_customers"].tolist() == [2, 2] + [1] * 8
    assert out["revenue_cents"].tolist()[0] == 100000 + 100
    assert out["rev_share"].tolist()[0] > 0.99


def test_nation_hhi_concentration(ray_session, tmp_path):
    """q347: nation 1's two equal suppliers give HHI 0.5; nation 2's
    monopoly gives 1.0; an unknown supplier lands in the NULL
    nation."""
    from web_scrapper_ray.pipelines.analytics import q_nation_hhi

    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 3, 9], pa.int64()),
        "l_extendedprice": pa.array([10.0, 10.0, 5.0, 2.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([1, 1, 2], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    out = q_nation_hhi(str(tmp_path))
    got = {r.nationkey if not pd.isna(r.nationkey) else None:
           (r.n_suppliers, r.hhi)
           for r in out.itertuples(index=False)}
    assert got[1.0] == (2, 0.5)
    assert got[2.0] == (1, 1.0)
    assert got[None] == (1, 1.0)


def test_dedup_savings_hand(ray_session, tmp_path):
    """q348: 3 copies of a 4-char doc + 1 unique 2-char doc → keep 2
    of 4 docs, chars 14 → 6."""
    from web_scrapper_ray.pipelines.dedup import q_dedup_savings

    pq.write_table(pa.table({
        "text": pa.array(["aaaa", "aaaa", "aaaa", "bb", None]),
    }), str(tmp_path / "documents.parquet"))
    out = q_dedup_savings(str(tmp_path))
    assert out["n_docs"].tolist() == [4]
    assert out["n_kept"].tolist() == [2]
    assert out["chars_before"].tolist() == [14]
    assert out["chars_after"].tolist() == [6]
    assert out["doc_savings"].tolist() == [0.5]
    assert out["char_savings"].tolist() == [round(8 / 14, 6)]


def test_join_cardinality_est_exact_books(ray_session, tmp_path):
    """q349: exact join size is Σ a·b over shared keys; the estimate
    matches a direct recomputation of the md5 key sample."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import (
        q_join_cardinality_est)

    okeys = [1, 1, 2, 3]
    lkeys = [1, 2, 2, 2, 4]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(okeys, pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_join_cardinality_est(str(tmp_path))
    assert out["exact_rows"].tolist() == [2 * 1 + 1 * 3]
    prods = {1: 2, 2: 3}
    samp = sum(v for k, v in prods.items()
               if int(hashlib.md5(str(k).encode())
                      .hexdigest()[:13], 16) % 8 == 0)
    assert out["sampled_rows"].tolist() == [samp]
    assert out["estimate"].tolist() == [samp * 8]


def test_prefix_suggest_ties(ray_session, tmp_path):
    """q350: within prefix 'app', 'apple' (6) beats 'appla' (5); the
    count tie at 5 would break lexicographically; sub-threshold
    prefixes drop."""
    from web_scrapper_ray.pipelines.textops import q_prefix_suggest

    text = " ".join(["apple"] * 6 + ["appla"] * 5 + ["zz"] * 2)
    pq.write_table(pa.table({"text": pa.array([text])}),
                   str(tmp_path / "documents.parquet"))
    out = q_prefix_suggest(str(tmp_path))
    assert out["prefix"].tolist() == ["app"]
    assert out["suggestion"].tolist() == ["apple"]
    assert out["n"].tolist() == [6]


def test_weekday_hour_heatmap_pre1970(ray_session, tmp_path):
    """q351: epoch 0 is Thursday 00:00 (weekday 4); one hour BEFORE
    epoch is Wednesday 23:00 — floored, never truncated."""
    from web_scrapper_ray.pipelines.analytics import (
        q_weekday_hour_heatmap)

    HOUR = 3_600_000_000
    pq.write_table(pa.table({
        "ts": pa.array([0, -HOUR], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_weekday_hour_heatmap(str(tmp_path))
    got = {(r.weekday, r.hour): r.n
           for r in out.itertuples(index=False)}
    assert got[(4, 0)] == 1     # Thursday 00
    assert got[(3, 23)] == 1    # Wednesday 23


def test_brand_diversity_trend_hand(ray_session, tmp_path):
    """q352: Jan splits 50/50 between two brands (diversity 0.5);
    Feb is a monopoly (0.0); a part missing from the dimension is
    the NULL brand."""
    from web_scrapper_ray.pipelines.analytics import (
        q_brand_diversity_trend)

    jan = pd.Timestamp("2024-01-05").value // 1000
    feb = pd.Timestamp("2024-02-05").value // 1000
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_shipdate": pa.array([jan, jan, feb], pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0, 10.0, 7.0], pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["X", "Y"]),
    }), str(tmp_path / "part.parquet"))
    out = q_brand_diversity_trend(str(tmp_path))
    assert out["n_brands"].tolist() == [2, 1]
    assert out["diversity"].tolist() == [0.5, 0.0]


def test_behavior_coverage_hand(ray_session, tmp_path):
    """q354: split users by the md5 coin; the test side's one novel
    bigram is uncovered while the shared one is covered — pinned by
    direct recomputation."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import (
        q_behavior_coverage)

    thr = int(np.floor(0.8 * 4503599627370496.0))

    def is_tr(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13],
                   16) < thr

    tr_u = next(u for u in range(50) if is_tr(u))
    te_u = next(u for u in range(50) if not is_tr(u))
    rows = [(tr_u, 0, "a"), (tr_u, 1, "b"),          # train: a→b
            (te_u, 0, "a"), (te_u, 1, "b"),          # test: a→b, b→c
            (te_u, 2, "c")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_behavior_coverage(str(tmp_path))
    assert out["n_test_bigrams"].tolist() == [2]
    assert out["n_covered"].tolist() == [1]
    assert out["vocab_coverage"].tolist() == [0.5]
    assert out["mass_coverage"].tolist() == [0.5]


def test_revenue_jumps_hand(ray_session, tmp_path):
    """q355: days 0,1,3 with revenues 1, 5, 2 → changes +4 (gap 1)
    and −3 (gap 2), ranked by magnitude."""
    from web_scrapper_ray.pipelines.analytics import q_revenue_jumps

    DAY = 86_400_000_000
    pq.write_table(pa.table({
        "o_orderdate": pa.array([0, DAY, 3 * DAY],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 5.0, 2.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_revenue_jumps(str(tmp_path))
    assert out["change_cents"].tolist() == [400, -300]
    assert out["gap_days"].tolist() == [1, 2]


def test_cross_source_dups_hand(ray_session, tmp_path):
    """q356: the same text in sources a, b and NULL yields 3 pairs
    (NULL sentinel sorts first); within-source dups score nothing."""
    from web_scrapper_ray.pipelines.dedup import q_cross_source_dups

    pq.write_table(pa.table({
        "source": pa.array(["a", "b", None, "a", "a"]),
        "text": pa.array(["same", "same", "same", "solo", "solo"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_cross_source_dups(str(tmp_path))
    pairs = list(map(tuple, out[["source_a", "source_b"]]
                     .itertuples(index=False)))
    assert (None, "a") in pairs
    assert (None, "b") in pairs
    assert ("a", "b") in pairs
    assert len(pairs) == 3
    assert out["n_shared_docs"].tolist() == [1, 1, 1]


def test_constancy_screen_mode_and_nulls(ray_session, tmp_path):
    """q357: a near-constant lang column reports mode share; NULL is
    a value and can BE the mode."""
    from web_scrapper_ray.pipelines.analytics import q_constancy_screen

    pq.write_table(pa.table({
        "lang": pa.array(["en"] * 8 + ["de", None]),
        "source": pa.array([None] * 6 + ["s"] * 4),
    }), str(tmp_path / "documents.parquet"))
    for tbl, col in (("events", "event_type"),
                     ("lineitem", "l_returnflag"),
                     ("orders", "o_orderpriority")):
        pq.write_table(pa.table({col: pa.array(["x", "y"])}),
                       str(tmp_path / f"{tbl}.parquet"))
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["x", "y"]),
        "l_linestatus": pa.array(["z", "z"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_constancy_screen(str(tmp_path))
    lang = out[(out["col"] == "lang")].iloc[0]
    assert (lang["mode_value"], lang["mode_count"]) == ("en", 8)
    assert lang["mode_share"] == 0.8
    src = out[(out["col"] == "source")].iloc[0]
    assert pd.isna(src["mode_value"]) and src["mode_count"] == 6


def test_hour_uniformity_exact_form(ray_session, tmp_path):
    """q359: all events in one hour maximizes χ² = (24·n² − n²)/n =
    23n; a perfectly uniform type scores 0."""
    from web_scrapper_ray.pipelines.analytics import q_hour_uniformity

    HOUR = 3_600_000_000
    spikes = [("spike", 0)] * 48
    flat = [("flat", h * HOUR) for h in range(24)]
    rows = spikes + flat
    pq.write_table(pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = q_hour_uniformity(str(tmp_path))
    got = {r.event_type: (r.chi2, r.nonuniform)
           for r in out.itertuples(index=False)}
    assert got["spike"] == (23.0 * 48, 1)
    assert got["flat"] == (0.0, 0)


def test_benford_screen_hand(ray_session, tmp_path):
    """q360: leading digit comes from the exact-cents int (0.19 → 19
    cents → digit 1); non-finite/non-positive totals are out of
    contract; empty input still yields the 9 digit rows."""
    from web_scrapper_ray.pipelines.analytics import q_benford_screen

    vals = [1.0, 19.99, 123.0, 0.19, 900.0, -5.0, float("nan"),
            float("inf"), 0.0, None]
    pq.write_table(pa.table({
        "o_totalprice": pa.array(vals, pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_benford_screen(str(tmp_path))
    got = dict(zip(out["digit"], out["n_obs"]))
    assert got == {1: 4, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0,
                   9: 1}
    assert out["share"].iloc[0] == 0.8

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.table({
        "o_totalprice": pa.array([], pa.float64()),
    }), str(empty / "orders.parquet"))
    out2 = q_benford_screen(str(empty))
    assert len(out2) == 9 and out2["n_obs"].sum() == 0
    assert out2["share"].isna().all() and out2["chi2_term"].isna().all()


def test_k_anonymity_hand(ray_session, tmp_path):
    """q361: NULL QI values are real groups; thresholds 2/5/10 count
    groups and rows below k; empty input keeps the 3-row contract."""
    from web_scrapper_ray.pipelines.analytics import q_k_anonymity

    nk = [1, 1, 1, 1, 1, 2, None]
    seg = ["A", "A", "A", "A", "A", "B", None]
    pq.write_table(pa.table({
        "c_nationkey": pa.array(nk, pa.int32()),
        "c_mktsegment": pa.array(seg, pa.string()),
    }), str(tmp_path / "customer.parquet"))
    out = q_k_anonymity(str(tmp_path))
    assert list(out["k"]) == [2, 5, 10]
    # groups: (1,A)=5 rows, (2,B)=1, (NULL,NULL)=1
    assert list(out["groups_below"]) == [2, 2, 3]
    assert list(out["rows_below"]) == [2, 2, 7]
    assert out["n_rows"].iloc[0] == 7 and out["n_groups"].iloc[0] == 3
    assert out["min_group_size"].iloc[0] == 1.0

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.table({
        "c_nationkey": pa.array([], pa.int32()),
        "c_mktsegment": pa.array([], pa.string()),
    }), str(empty / "customer.parquet"))
    out2 = q_k_anonymity(str(empty))
    assert len(out2) == 3
    assert list(out2["rows_below"]) == [0, 0, 0]
    assert out2["pct_rows_below"].isna().all()
    assert out2["min_group_size"].isna().all()


def test_scd2_history_hand(ray_session, tmp_path):
    """q362: consecutive equal types collapse into one version;
    valid_to chains to the next run's start and the last version
    stays open (NaN)."""
    from web_scrapper_ray.pipelines.analytics import q_scd2_history

    rows = [(1, 100, "A"), (1, 200, "A"), (1, 300, "B"),
            (1, 400, "A"), (2, 50, "C")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_scd2_history(str(tmp_path))
    u1 = out[out["user_id"] == 1].sort_values("version")
    assert list(u1["attr"]) == ["A", "B", "A"]
    assert list(u1["valid_from_us"]) == [100, 300, 400]
    assert list(u1["valid_to_us"])[:2] == [300.0, 400.0]
    assert np.isnan(u1["valid_to_us"].iloc[2])
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and np.isnan(u2["valid_to_us"].iloc[0])


def test_gap_fill_locf_hand(ray_session, tmp_path):
    """q363: missing grid hours carry the previous observed hour's
    max; non-finite values are out of contract."""
    from web_scrapper_ray.pipelines.analytics import q_gap_fill_locf

    HOUR = 3_600_000_000
    rows = [("a", 0, 1.0), ("a", 0, 3.0), ("a", 3 * HOUR, 2.0),
            ("a", 1, float("inf")), ("b", HOUR, 5.0)]
    pq.write_table(pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_gap_fill_locf(str(tmp_path))
    a = out[out["event_type"] == "a"]
    assert list(a["h"]) == [0, 1, 2, 3]
    assert list(a["vmax"]) == [3.0, 3.0, 3.0, 2.0]
    assert list(a["is_gap"]) == [0, 1, 1, 0]
    b = out[out["event_type"] == "b"]
    assert list(b["h"]) == [1] and list(b["vmax"]) == [5.0]


def test_calibration_brier_exact(ray_session, tmp_path):
    """q364: bins follow the md5 quantized score; Brier terms are the
    exact-int telescoped forms (a perfectly-labeled bin scores the
    squared distance of its grid score to the label)."""
    import hashlib

    from web_scrapper_ray.pipelines.analytics import q_calibration_brier

    users = [1, 2, 3, 4]
    types = ["purchase", "view", "purchase", "view"]
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
    }), str(tmp_path / "events.parquet"))
    out = q_calibration_brier(str(tmp_path))
    assert list(out["bin"]) == list(range(10))
    assert out["n"].sum() == 4
    for u, ty in zip(users, types):
        m = int(hashlib.md5(f"cal|{u}".encode()).hexdigest()[:13],
                16) % 1000
        b = m // 100
        row = out[out["bin"] == b].iloc[0]
        assert row["n"] >= 1
        if row["n"] == 1:
            p = (m + 0.5) / 1000.0
            y = 1.0 if ty == "purchase" else 0.0
            assert abs(row["brier"] - (p - y) ** 2) < 2e-6
    assert out.loc[out["n"] == 0, "brier"].isna().all()


def test_contamination_13gram_planted(ray_session, tmp_path):
    """q365: a doc sharing a 13-token run with a benchmark doc
    (doc_id % 100 == 0) is flagged; a disjoint doc and a short doc
    are not; benchmark docs are excluded from the population."""
    from web_scrapper_ray.pipelines.textops import q_contamination_13gram

    bench = " ".join(f"w{i}" for i in range(20))
    dirty = "intro " + " ".join(f"w{i}" for i in range(5, 18)) + " outro"
    clean = " ".join(f"x{i}" for i in range(30))
    short = "only a few tokens here"
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 1, 2, 3], pa.int64()),
        "source": pa.array(["s", "s", "s", "t"]),
        "text": pa.array([bench, dirty, clean, short]),
    }), str(tmp_path / "documents.parquet"))
    out = q_contamination_13gram(str(tmp_path))
    s = out[out["source"] == "s"].iloc[0]
    assert (s["n_docs"], s["n_contaminated"]) == (2, 1)
    assert s["rate"] == 0.5
    t = out[out["source"] == "t"].iloc[0]
    assert (t["n_docs"], t["n_contaminated"]) == (1, 0)


def test_repetition_ratio_hand(ray_session, tmp_path):
    """q366: 'a b a b a b' has 4 3-grams, 2 distinct → dup_rate 0.5
    and the doc counts as high-repetition (5·2 > 4); an all-distinct
    doc scores 0; a 2-token doc is unscored."""
    from web_scrapper_ray.pipelines.textops import q_repetition_ratio

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["s", "s", "s"]),
        "text": pa.array(["a b a b a b", "p q r s t", "x y"]),
    }), str(tmp_path / "documents.parquet"))
    out = q_repetition_ratio(str(tmp_path))
    s = out.iloc[0]
    assert (s["n_docs"], s["total_3grams"], s["dup_3grams"]) == (2, 7, 2)
    assert abs(s["dup_rate"] - 2 / 7) < 2e-6
    assert s["n_high_rep"] == 1


def test_gini_revenue_exact(ray_session, tmp_path):
    """q367: equal revenues → gini 0; a single-customer-takes-all
    nation approaches (n−1)/n; duplicate customer rows fan orders
    out like SQL's join."""
    from web_scrapper_ray.pipelines.analytics import q_gini_revenue

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.0, 10.0, 0.0, 100.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_gini_revenue(str(tmp_path))
    n0 = out[out["nationkey"] == 0.0].iloc[0]
    assert n0["n"] == 2 and n0["gini"] == 0.0
    # nation 1: order of cust 4 joins TWICE (dup dim row): x = [0,
    # 10000, 10000]; gini = (2*(2*10000+3*10000) - 4*20000)/(3*20000)
    n1 = out[out["nationkey"] == 1.0].iloc[0]
    assert n1["n"] == 3
    assert abs(n1["gini"] - (2 * 50000 - 80000) / 60000.0) < 2e-6


def test_bloom_semijoin_exact(ray_session, tmp_path):
    """q368: bloom pruning is lossless — qualifying parts keep their
    lineitems, non-qualifying (and bloom-false-positive) partkeys are
    exactly filtered; duplicate dimension rows do NOT fan out."""
    from web_scrapper_ray.pipelines.analytics import q_bloom_semijoin

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "p_size": pa.array([50, 50, 10, 45], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 3, 99], pa.int64()),
        "l_returnflag": pa.array(["A", "A", "A", "B", "B"]),
        "l_extendedprice": pa.array([10.0, 20.0, 999.0, 5.5, 7.0],
                                    pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_bloom_semijoin(str(tmp_path))
    a = out[out["returnflag"] == "A"].iloc[0]
    assert (a["n_items"], a["revenue_cents"]) == (2, 3000)
    b = out[out["returnflag"] == "B"].iloc[0]
    assert (b["n_items"], b["revenue_cents"]) == (1, 550)


def test_cuped_exact(ray_session, tmp_path):
    """q369: perfectly correlated pre/post revenue gives var_reduction
    1 and theta = slope; uncorrelated orthogonal case gives theta 0."""
    from web_scrapper_ray.pipelines.analytics import q_cuped_adjustment

    # seg A: y = 2x exactly -> theta 2, reduction 1
    ck = [1, 2, 3, 4, 5, 6]
    seg = ["A", "A", "A", "B", "B", "B"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(ck, pa.int64()),
        "c_mktsegment": pa.array(seg),
    }), str(tmp_path / "customer.parquet"))
    import datetime as dt
    pre = dt.datetime(2024, 1, 1)
    post = dt.datetime(2024, 1, 20)
    rows = [
        (1, 10.0, pre), (1, 20.0, post),
        (2, 20.0, pre), (2, 40.0, post),
        (3, 30.0, pre), (3, 60.0, post),
        # seg B: x varies, y constant -> cov 0, theta 0
        (4, 10.0, pre), (4, 5.0, post),
        (5, 20.0, pre), (5, 5.0, post),
        (6, 30.0, pre), (6, 5.0, post),
    ]
    pq.write_table(pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = q_cuped_adjustment(str(tmp_path))
    a = out[out["segment"] == "A"].iloc[0]
    assert a["n"] == 3 and a["theta"] == 2.0 and \
        a["var_reduction"] == 1.0
    b = out[out["segment"] == "B"].iloc[0]
    assert b["theta"] == 0.0
    assert np.isnan(b["var_reduction"])  # var(y)=0


def test_rank_fusion_hand(ray_session, tmp_path):
    """q370: ties share a rank (SQL rank()); the fused score is
    1/(60+r1) + 1/(60+r2); dup dimension rows fan the join."""
    from web_scrapper_ray.pipelines.analytics import q_rank_fusion

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["X", "Y", "Z"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([50.0, 50.0, 30.0, 70.0, 100.0],
                                    pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q_rank_fusion(str(tmp_path))
    g = {r.brand: r for r in out.itertuples(index=False)}
    # revenue: X=100, Y=100, Z=100 -> all rank 1; counts: X=2,Y=2,Z=1
    assert {g[b].r_rev for b in "XYZ"} == {1}
    assert (g["X"].r_cnt, g["Y"].r_cnt, g["Z"].r_cnt) == (1, 1, 3)
    assert abs(g["Z"].rrf - (1 / 61 + 1 / 63)) < 2e-6


def test_label_centroid_drift_hand(ray_session, tmp_path):
    """q371: a label sitting at the global centroid has cos 1 and
    l2 0; an orthogonal label drifts."""
    from web_scrapper_ray.pipelines.similarity import \
        q_label_centroid_drift

    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [2.0, 1.0]]
    labs = [0, 0, 1, 2]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_label_centroid_drift(str(tmp_path))
    assert list(out["label"]) == [0.0, 1.0, 2.0]
    cg = np.array([1.0, 0.5])
    c0 = np.array([1.0, 0.0])
    exp_cos = float(c0 @ cg / np.sqrt((c0 @ c0) * (cg @ cg)))
    got = out[out["label"] == 0.0].iloc[0]
    assert abs(got["cos_to_global"] - exp_cos) < 2e-6
    g2 = out[out["label"] == 2.0].iloc[0]
    assert abs(g2["l2_to_global"] - np.sqrt(1.0 + 0.25)) < 2e-6
def test_mad_outliers_hand(ray_session, tmp_path):
    """q375: a gross outlier is flagged; med/mad follow the
    lower-middle quantile_disc rule."""
    from web_scrapper_ray.pipelines.analytics import q_mad_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 1000.0]
    pq.write_table(pa.table({
        "event_type": pa.array(["t"] * 5),
        "value": pa.array(vals, pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_mad_outliers(str(tmp_path))
    r = out.iloc[0]
    assert r["med"] == 12.0 and r["mad"] == 1.0
    assert r["n_outliers"] == 1 and r["outlier_rate"] == 0.2


def test_poisson_bootstrap_props(ray_session, tmp_path):
    """q374: CI brackets the point estimate on a well-behaved
    sample, weights are deterministic (two runs agree), and the
    full-sample mean is the exact ratio."""
    from web_scrapper_ray.pipelines.analytics import q_poisson_bootstrap

    n = 200
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_mktsegment": pa.array(["S"] * n),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([10.0 + (i % 7) for i in range(n)],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out1 = q_poisson_bootstrap(str(tmp_path))
    out2 = q_poisson_bootstrap(str(tmp_path))
    pd.testing.assert_frame_equal(out1, out2)
    r = out1.iloc[0]
    exp = sum(round((10.0 + (i % 7)) * 100) for i in range(n)) / n
    assert abs(r["mean_cents"] - exp) < 1e-6
    assert r["ci_lo"] <= r["mean_cents"] <= r["ci_hi"]
    assert r["ci_hi"] - r["ci_lo"] < 200  # tight CI for tight data


def test_boolean_retrieval_hand(ray_session, tmp_path):
    """q376: the top-3 df terms are selected (df DESC, token ASC);
    only docs containing ALL of them count as hits."""
    from web_scrapper_ray.pipelines.textops import q_boolean_retrieval

    docs = ["alpha beta gamma", "alpha beta gamma delta",
            "alpha beta", "alpha other words here"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "source": pa.array(["s"] * 4),
        "text": pa.array(docs),
    }), str(tmp_path / "documents.parquet"))
    out = q_boolean_retrieval(str(tmp_path))
    r = out.iloc[0]
    # df: alpha=4, beta=3, gamma=2 → terms 'alpha beta gamma'
    assert r["terms"] == "alpha beta gamma"
    assert (r["n_docs"], r["n_hits"]) == (4, 2)


def test_bm25_topk_hand(ray_session, tmp_path):
    """q377: higher tf of the rarest query term wins; scores are
    positive only for docs matching ≥1 term."""
    from web_scrapper_ray.pipelines.textops import q_bm25_topk

    docs = ["apple apple apple banana cherry",
            "apple banana cherry",
            "banana cherry",
            "unrelated words entirely"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "source": pa.array(["s"] * 4),
        "text": pa.array(docs),
    }), str(tmp_path / "documents.parquet"))
    out = q_bm25_topk(str(tmp_path))
    assert 3 not in set(out["doc_id"])
    assert len(out) == 3
    assert out["bm25"].iloc[0] >= out["bm25"].iloc[-1]
    assert out.iloc[0]["doc_id"] == 0  # tf-heavy doc ranks first


def test_load_fairness_exact(ray_session, tmp_path):
    """q378: even load → jain 1; one-user monopoly of n users →
    jain 1/n and max/mean = n."""
    from web_scrapper_ray.pipelines.analytics import q_load_fairness

    rows = ([("even", u) for u in (1, 2, 3, 4)]
            + [("skew", 9)] * 8 + [("skew", 10), ("skew", 11)])
    pq.write_table(pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = q_load_fairness(str(tmp_path))
    g = {r.event_type: r for r in out.itertuples(index=False)}
    assert g["even"].jain == 1.0 and g["even"].max_over_mean == 1.0
    # skew: x = [8,1,1] → J = 100/(3·66) = 0.505051
    assert abs(g["skew"].jain - 100 / 198) < 2e-6
    assert abs(g["skew"].max_over_mean - 2.4) < 2e-6


def test_filter_verdicts_rules(ray_session, tmp_path):
    """q379: each rule fires on its planted doc; a clean doc keeps."""
    from web_scrapper_ray.pipelines.textops import q_filter_verdicts

    clean = " ".join(f"word{i} the" for i in range(40))
    short = "tiny doc"
    rep = ("spam ham eggs " * 40)  # long enough, heavy 3-gram dup
    sym = ("the word " * 30) + ("@#$%^&*()!" * 40)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "source": pa.array(["s"] * 4),
        "text": pa.array([clean, short, rep, sym]),
    }), str(tmp_path / "documents.parquet"))
    out = q_filter_verdicts(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 4
    assert r["r1_size"] >= 1       # short doc
    assert r["r4_repetition"] >= 1  # repeated doc
    assert r["r5_symbol"] >= 1     # symbol doc
    assert r["n_kept"] >= 1        # clean doc survives


def test_mmr_rerank_diversifies(ray_session, tmp_path):
    """q380: with a cluster of near-copies of the query and one
    distinct-direction vector, plain relevance would fill the top
    slots with the copies; MMR pulls the diverse vector up."""
    from web_scrapper_ray.pipelines.similarity import q_mmr_rerank

    rng = np.random.default_rng(7)
    query = np.array([1.0, 0.0, 0.0, 0.0])
    clus = np.array([0.8, 0.6, 0.0, 0.0])   # rel .8, tight cluster
    div = np.array([0.75, 0.0, 0.661, 0.0])  # rel .75, far from clus
    vecs = [query]  # vec_id 0 = query
    for i in range(6):  # near-copies of the cluster center
        v = clus + rng.normal(0, 0.005, 4)
        vecs.append(v / np.linalg.norm(v))
    vecs.append(div / np.linalg.norm(div))  # vec_id 7
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_mmr_rerank(str(tmp_path), k=3)
    assert len(out) == 3
    assert out.iloc[0]["rank"] == 1
    # the diverse vector is selected by step 2 or 3
    assert 7 in set(out["vec_id"][:3])
    out2 = q_mmr_rerank(str(tmp_path), k=3)
    pd.testing.assert_frame_equal(out, out2)  # deterministic


def test_label_dispersion_exact(ray_session, tmp_path):
    """q381: identical unit vectors → mean pairwise cos 1; an
    orthogonal pair → 0; singleton → NULL."""
    from web_scrapper_ray.pipelines.similarity import \
        q_label_dispersion

    vecs = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0],
            [1.0, 0.0], [0.0, 1.0],
            [0.5, 0.5]]
    labs = [0, 0, 0, 1, 1, 2]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_label_dispersion(str(tmp_path))
    g = {r.label: r for r in out.itertuples(index=False)}
    assert abs(g[0.0].mean_pairwise_cos - 1.0) < 2e-6
    assert abs(g[1.0].mean_pairwise_cos - 0.0) < 2e-6
    assert np.isnan(g[2.0].mean_pairwise_cos)


def test_markov_accuracy_hand(ray_session, tmp_path):
    """q382: the majority next-type from the train window predicts
    the test window; ties break to the byte-smaller type."""
    from web_scrapper_ray.pipelines.analytics import q_markov_accuracy

    import datetime as dt
    tr = dt.datetime(2024, 1, 10)
    te = dt.datetime(2024, 1, 25)
    # user 1 train: A->B, A->B, A->C ; test: A->B, A->C
    seq = [(1, tr, "A"), (1, tr, "B"), (1, tr, "A"), (1, tr, "B"),
           (1, tr, "A"), (1, tr, "C"),
           (1, te, "A"), (1, te, "B"), (1, te, "A"), (1, te, "C")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in seq], pa.int64()),
        "ts": pa.array([r[1] for r in seq], pa.timestamp("us")),
        "event_id": pa.array(range(len(seq)), pa.int64()),
        "event_type": pa.array([r[2] for r in seq]),
    }), str(tmp_path / "events.parquet"))
    out = q_markov_accuracy(str(tmp_path))
    a = out[out["prev_type"] == "A"].iloc[0]
    assert a["predicted"] == "B"
    assert (a["n_test"], a["n_correct"]) == (2, 1)
    assert a["accuracy"] == 0.5
def test_segment_flows_hand(ray_session, tmp_path):
    """q383: dominant type per (user, week) with the (count DESC,
    type ASC) tie rule; only consecutive weeks pair."""
    from web_scrapper_ray.pipelines.analytics import q_segment_flows

    WEEK = 7 * 86_400_000_000
    rows = [
        (1, 0, "A"), (1, 0, "A"), (1, 0, "B"),         # wk0: A
        (1, WEEK, "B"),                                 # wk1: B
        (1, 3 * WEEK, "C"),                             # wk3 (gap)
        (2, 0, "A"), (2, 0, "B"),                       # wk0 tie → A
        (2, WEEK, "A"),                                 # wk1: A
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), str(tmp_path / "events.parquet"))
    out = q_segment_flows(str(tmp_path))
    got = {(r.from_type, r.to_type): r.n_users
           for r in out.itertuples(index=False)}
    assert got == {("A", "B"): 1, ("A", "A"): 1}


def test_permutation_fdr_detects_effect(ray_session, tmp_path):
    """q373: a huge group-mean gap survives the randomization null
    (p = 1/(B+1)) and is BH-rejected; the test is deterministic."""
    from web_scrapper_ray.pipelines.analytics import q_permutation_fdr

    n = 60
    pri = ["HIGH"] * n + ["LOW"] * n
    val = [1000.0] * n + [1.0] * n
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(2 * n), pa.int64()),
        "o_orderpriority": pa.array(pri),
        "o_totalprice": pa.array(val, pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_permutation_fdr(str(tmp_path))
    out2 = q_permutation_fdr(str(tmp_path))
    pd.testing.assert_frame_equal(out, out2)
    h = out[out["priority"] == "HIGH"].iloc[0]
    assert h["c_exceed"] == 0
    assert abs(h["p_value"] - 1 / 33) < 2e-6
    assert h["bh_reject"] == 1
    assert out["bh_reject"].sum() == 2  # both sides of the same gap


def test_ring_rebalance_props(ray_session, tmp_path):
    """q385: HRW moves only keys whose argmax IS the new node
    (~1/17), loads are conserved, and the run is deterministic."""
    from web_scrapper_ray.pipelines.analytics import q_ring_rebalance

    n = 500
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    out = q_ring_rebalance(str(tmp_path))
    out2 = q_ring_rebalance(str(tmp_path))
    pd.testing.assert_frame_equal(out, out2)
    assert len(out) == 17
    assert out["n_before"].sum() == n and out["n_after"].sum() == n
    assert out[out["node"] == 16]["n_before"].iloc[0] == 0
    moved = out["moved_keys"].iloc[0]
    # HRW: moved == keys now owned by node 16
    assert moved == out[out["node"] == 16]["n_after"].iloc[0]
    assert moved < n * 3 / 17  # ~n/17 expected, generous bound
