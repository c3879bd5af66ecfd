"""Edge-semantics unit tests for the nonparametric rank-stat family
(q194–q196, q204) and the bounded k-core peel (q200): degenerate
inputs the synthetic worlds can't isolate — all-tied samples, empty
sides, constant axes, fully-peeling graphs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, types, values, ts_start=0):
    n = len(types)
    t = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(
            pd.to_datetime(np.arange(ts_start, ts_start + n),
                           unit="s")).cast(pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(values, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mannwhitney_all_tied_is_null_z(ray_session, tmp_path):
    """A fully-tied sample has zero rank variance -> SQL x/0 NULL."""
    from web_scrapper_ray.pipelines.rankstats import q_mannwhitney

    sf = _events(tmp_path, ["click", "purchase"] * 3, [5.0] * 6)
    out = q_mannwhitney(sf)
    assert out["n1"].iloc[0] == 3 and out["n2"].iloc[0] == 3
    # U1 = R1 - n1(n1+1)/2 with all mid-ranks (n+1)/2 = 3.5 -> 4.5
    assert out["u1"].iloc[0] == 4.5
    assert np.isnan(out["z"].iloc[0])


def test_mannwhitney_clean_separation(ray_session, tmp_path):
    """Clicks all below purchases: U1 = 0, z < 0 (exact closed form:
    z = -sqrt(3n/(n+1)) ... here n1=n2=3, no ties)."""
    from web_scrapper_ray.pipelines.rankstats import q_mannwhitney

    sf = _events(tmp_path, ["click"] * 3 + ["purchase"] * 3,
                 [1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    out = q_mannwhitney(sf)
    assert out["u1"].iloc[0] == 0.0
    var = 3 * 3 / 12.0 * 7  # no ties: n1 n2 (n+1) / 12
    # engine rounds z to 6dp
    assert abs(out["z"].iloc[0] - (0 - 4.5) / np.sqrt(var)) < 5e-7


def test_ks_empty_side_is_null(ray_session, tmp_path):
    from web_scrapper_ray.pipelines.rankstats import q_ks_distance

    sf = _events(tmp_path, ["click", "click"], [1.0, 2.0])
    out = q_ks_distance(sf)
    assert out["n2"].iloc[0] == 0
    assert np.isnan(out["d"].iloc[0])


def test_ks_disjoint_supports_is_one(ray_session, tmp_path):
    from web_scrapper_ray.pipelines.rankstats import q_ks_distance

    sf = _events(tmp_path, ["click"] * 2 + ["purchase"] * 2,
                 [1.0, 2.0, 5.0, 6.0])
    assert q_ks_distance(sf)["d"].iloc[0] == 1.0


def test_kruskal_all_tied_is_null(ray_session, tmp_path):
    """tsum = N^3 - N when every value ties -> correction 0 -> NULL."""
    from web_scrapper_ray.pipelines.rankstats import q_kruskal_wallis

    sf = _events(tmp_path, ["a", "b", "c"] * 2, [7.0] * 6)
    out = q_kruskal_wallis(sf)
    assert out["k"].iloc[0] == 3
    assert np.isnan(out["h"].iloc[0])


def test_kruskal_matches_closed_form(ray_session, tmp_path):
    """No ties, 2 groups: H reduces to the known closed form
    12/(N(N+1)) * sum R_g^2/n_g - 3(N+1)."""
    from web_scrapper_ray.pipelines.rankstats import q_kruskal_wallis

    vals = [1.0, 3.0, 5.0, 2.0, 4.0, 6.0]
    sf = _events(tmp_path, ["a"] * 3 + ["b"] * 3, vals)
    out = q_kruskal_wallis(sf)
    # ranks: a -> 1,3,5 (R=9); b -> 2,4,6 (R=12)
    h = 12.0 / (6 * 7) * (81 / 3 + 144 / 3) - 3 * 7
    assert abs(out["h"].iloc[0] - h) < 5e-7  # engine rounds to 6dp


def test_spearman_constant_axis_is_null(ray_session, tmp_path):
    from web_scrapper_ray.pipelines.rankstats import q_spearman_orders

    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_totalprice": pa.array([5.0, 5.0, 5.0]),
        "o_orderdate": pa.array(
            pd.to_datetime(["2020-01-01", "2020-01-02",
                            "2020-01-03"])).cast(pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_spearman_orders(str(tmp_path))
    assert out["n"].iloc[0] == 3
    assert np.isnan(out["rho"].iloc[0])


def _lineitem(tmp_path, order_supp_pairs):
    ok = [o for o, _ in order_supp_pairs]
    sp = [s for _, s in order_supp_pairs]
    t = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_suppkey": pa.array(sp, pa.int64())})
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_kcore_path_fully_peels(ray_session, tmp_path):
    """Path graph a-b-c-d (orders of 2 suppliers each) has max core 1:
    k=2 peeling removes endpoints round by round until empty."""
    from web_scrapper_ray.pipelines.graph import q_k_core

    sf = _lineitem(tmp_path, [(1, 10), (1, 11), (2, 11), (2, 12),
                              (3, 12), (3, 13)])
    out = q_k_core(sf, k=2, rounds=6)
    assert len(out) == 0


def test_kcore_triangle_survives(ray_session, tmp_path):
    """A triangle is its own 2-core; a pendant node peels off."""
    from web_scrapper_ray.pipelines.graph import q_k_core

    sf = _lineitem(tmp_path, [(1, 10), (1, 11), (2, 11), (2, 12),
                              (3, 12), (3, 10), (4, 10), (4, 99)])
    out = q_k_core(sf, k=2, rounds=6)
    assert out["l_suppkey"].tolist() == [10, 11, 12]
    assert out["deg"].tolist() == [2, 2, 2]


def test_bootstrap_ci_deterministic_and_sane(ray_session):
    """Poisson-bootstrap CI: deterministic across runs, brackets the
    point mean on the synthetic data, lo < hi."""
    from web_scrapper_ray.pipelines.rankstats import q_bootstrap_ci

    a = q_bootstrap_ci("/root/testdata/sf0.001", B=64)
    b = q_bootstrap_ci("/root/testdata/sf0.001", B=64)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert (a["ci_lo"] < a["ci_hi"]).all()
    assert ((a["ci_lo"] <= a["mean"]) & (a["mean"] <= a["ci_hi"])).all()


def test_bootstrap_ci_split_invariant(ray_session, tmp_path):
    """Row weights are content-hashed, so the CI is identical under a
    different partitioning of the same rows."""
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.rankstats import q_bootstrap_ci

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    pq.write_table(t, str(tmp_path / "events.parquet"),
                   row_group_size=97)
    a = q_bootstrap_ci("/root/testdata/sf0.001", B=32)
    b = q_bootstrap_ci(str(tmp_path), B=32)
    pd.testing.assert_frame_equal(a, b)


def test_pr_curve_hand_example(ray_session, tmp_path):
    """q292: thresholds only at positive scores, exact cumulative
    TP/FP descending value; NULL type is a negative, NaN value is
    excluded on both sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.rankstats import q_pr_curve

    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "view", "purchase", None,
                                "purchase", "view"]),
        "value": pa.array([5.0, 4.0, 3.0, 2.0, 1.0, float("nan")],
                          pa.float64()),
    }), str(tmp_path / "events.parquet"))
    out = q_pr_curve(str(tmp_path))
    assert out["threshold"].tolist() == [5.0, 3.0, 1.0]
    assert out["tp"].tolist() == [1, 2, 3]
    assert out["fp"].tolist() == [0, 1, 2]
    assert out["prec"].tolist() == [1.0, 0.666667, 0.6]
    assert out["rec"].tolist() == [0.333333, 0.666667, 1.0]


def test_md5_coin_mask_matches_duckdb_sql_coin():
    """The sampled-oracle coin: pairs.md5_coin_mask and pairs.sql_coin
    must draw IDENTICAL Bernoulli outcomes per key (the whole bounded-
    oracle contract rests on this), incl. negative and >2^53 keys;
    NULL draws False/NULL-out on both sides."""
    import duckdb
    import numpy as np

    from web_scrapper_ray.pipelines.pairs import md5_coin_mask, sql_coin

    keys = [0, 1, 7, -5, 123456789, 2**62, -(2**62), 999983]
    for p in (0.02, 0.004, 0.5, 1.0):
        mine = md5_coin_mask(keys, p)
        con = duckdb.connect()
        got = con.execute(
            "SELECT " + sql_coin("v", p)
            + " FROM (SELECT unnest(?::BIGINT[]) AS v)",
            [keys]).df().iloc[:, 0].to_numpy(bool)
        assert np.array_equal(mine, got), (p, mine, got)
    # NULL key: engine False, SQL NULL (row excluded either way)
    assert not md5_coin_mask([None], 0.9).any()
