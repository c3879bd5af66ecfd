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
