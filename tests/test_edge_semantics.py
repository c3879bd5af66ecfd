"""Regression tests for latent oracle-divergence edge cases that the
driver's FK-clean 2024-only testdata cannot exercise: pre-1970 window
binning, NULL in DISTINCT, inner-join orphan drops, short-doc minhash
cliques, and tied-vector top-k."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_window_pre1970_fractional_seconds(ray_session, tmp_path):
    """date_trunc('hour') on negative-epoch fractional timestamps: int
    truncation toward zero binned them one hour late."""
    from web_scrapper_ray.pipelines.relational import q_events_window

    ts = pa.array([-500_000, 500_000, -3_600_000_000 - 1],
                  pa.timestamp("us"))
    sf = _write(tmp_path, "events", pa.table({
        "ts": ts,
        "event_type": pa.array(["x", "x", "x"]),
        "value": pa.array([1.0, 1.0, 1.0]),
    }))
    out = q_events_window(sf)
    oracle = duckdb.sql(
        f"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w,
                   count(*) n FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).df()
    assert sorted(out["window_start"]) == sorted(oracle["w"])
    # -0.5s lives in the [-3600, 0) hour; -3600.000001s in the one before
    assert set(out["window_start"]) == {-7200, -3600, 0}


def test_distinct_with_null(ray_session, tmp_path):
    from web_scrapper_ray.pipelines.relational import q_distinct_event_types

    sf = _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["b", None, "a", "b"]),
    }))
    out = q_distinct_event_types(sf)
    assert out["event_type"].tolist() == ["a", "b", None]  # NULLS LAST


def test_inner_join_drops_orphans(ray_session, tmp_path):
    """q02: an orders row whose custkey is missing from customer must be
    dropped (oracle INNER JOIN), not ranked with a NaN name."""
    from web_scrapper_ray.pipelines.relational import q_top_customers

    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["Customer#1", "Customer#2"]),
    }))
    sf = _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 99], pa.int64()),  # 99 = orphan
        "o_totalprice": pa.array([10.0, 5.0, 1000.0]),
    }))
    out = q_top_customers(sf)
    assert 99 not in set(out["c_custkey"])
    assert out["c_custkey"].tolist() == [1, 2]


def test_minhash_short_docs_no_clique(ray_session, tmp_path):
    """Docs with <3 tokens share the sentinel signature; they must emit
    NO band rows (a corpus of stubs would otherwise form one quadratic
    candidate clique) and can never appear in the result."""
    from web_scrapper_ray.pipelines.dedup import q_minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    rows = [{"doc_id": i, "text": "stub"} for i in range(20)]  # 1 token
    rows += [{"doc_id": 100, "text": base},
             {"doc_id": 101, "text": base + " extra"}]
    sf = _write(tmp_path, "documents", pa.Table.from_pylist(rows))
    out = q_minhash_lsh_pairs(sf, jaccard_threshold=0.5)
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (100, 101) in got
    assert all(a >= 100 and b >= 100 for a, b in got)  # no stub pairs


def test_knn_tied_vectors_deterministic(ray_session, tmp_path):
    """q24 with >k+1 identical vectors in one batch: the per-batch top-k
    must keep the LOWEST neighbor_ids (oracle row_number tie-break), not
    an arbitrary argpartition subset."""
    from web_scrapper_ray.pipelines.similarity import q_knn_bruteforce

    dup = [1.0, 0.0, 0.0]
    vecs = [dup] * 10 + [[0.0, 1.0, 0.0]]
    sf = _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array(list(range(11)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))
    out = q_knn_bruteforce(sf, query_ids=(0,), k=5)
    # neighbors 1..9 all have sim 1.0 → ranks 1..5 must be ids 1..5
    assert out[out["query_id"] == 0]["neighbor_id"].tolist() == [1, 2, 3, 4, 5]


def test_max_concurrency_carry_across_hours(ray_session, tmp_path):
    """q115: the peak overlap must survive the per-hour decomposition —
    intervals OPENED in earlier hour buckets contribute via the
    carry-in cumsum, and a half-open end at exactly t closes before a
    start at t opens."""
    from web_scrapper_ray.pipelines.relational import q_max_concurrency

    H = 3_600_000_000
    # event_id % 7 + 1 minutes duration; id=6 → 7 min, id=13 → 7 min
    # three intervals opened in hour 0 still open in hour 1 (durations
    # span the boundary), plus two opened in hour 1 → peak 5 in hour 1
    starts = [H - 60_000_000 * 3 + i for i in range(3)]  # open, cross
    starts += [H + 1000, H + 2000]                       # hour-1 opens
    ids = [6, 13, 20, 27, 34]  # all % 7 == 6 → 7-minute durations
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(starts, pa.timestamp("us")),
        "event_type": pa.array(["a"] * 5),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_max_concurrency(str(tmp_path))
    assert out["max_concurrent"].tolist() == [5]

    # half-open tie: one interval ends exactly when the next starts
    t2 = pa.table({
        "event_id": pa.array([6, 13], pa.int64()),  # 7-minute durations
        "ts": pa.array([0, 7 * 60_000_000], pa.timestamp("us")),
        "event_type": pa.array(["b", "b"]),
    })
    pq.write_table(t2, str(tmp_path / "events.parquet"))
    out2 = q_max_concurrency(str(tmp_path))
    assert out2["max_concurrent"].tolist() == [1]


def test_event_transitions_tie_order(ray_session, tmp_path):
    """q116: equal-ts events order by event_id inside a user, and
    transitions never cross users."""
    from web_scrapper_ray.pipelines.relational import q_event_transitions

    t = pa.table({
        "event_id": pa.array([2, 1, 3, 10], pa.int64()),
        "ts": pa.array([5, 5, 9, 9], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["b", "a", "c", "z"]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_transitions(str(tmp_path))
    got = {(r.src, r.dst): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}  # id tiebreak; no 1→2 hop


def test_sliding_distinct_users_window(ray_session, tmp_path):
    """q118: a user native to hour h counts in windows h, h+1, h+2 —
    but only hours that have native events emit a row, and a user seen
    in two source hours of one window counts once."""
    from web_scrapper_ray.pipelines.relational import q_sliding_distinct_users

    H = 3_600_000_000
    t = pa.table({
        # u1 in hours 0 and 1; u2 in hour 0; hour 3 has only u3
        "ts": pa.array([1, 2, H + 1, 3 * H + 1], pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1, 3], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_sliding_distinct_users(str(tmp_path))
    got = dict(zip(out["hour_start"] // 3600, out["n_users"]))
    # hour 0: {1,2}; hour 1: {1,2} (hour-0 carry) ∪ {1} = {1,2};
    # hour 2 has no native events → NO row; hour 3: {1 (from h1), 3}
    assert got == {0: 2, 1: 2, 3: 2}


def test_except_all_bag_multiplicity(ray_session, tmp_path):
    """q120: max(m−n, 0) copies per key, NULLs meet like the set ops."""
    from web_scrapper_ray.pipelines.relational import q_custkeys_except_all

    pq.write_table(pa.table({
        "o_custkey": pa.array([7, 7, 7, 8, None, None], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([7, 9, None], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    out = q_custkeys_except_all(str(tmp_path))
    vals = out["custkey"].tolist()
    assert vals[:3] == [7.0, 7.0, 8.0] and len(vals) == 4
    assert np.isnan(vals[3])  # 2 NULLs − 1 NULL = 1 NULL, ordered last


def test_factorize_strings_nul_safety():
    """pandas' string hash table truncates at NUL — the shared helper
    must key on full bytes and preserve first-occurrence uniques."""
    from web_scrapper_ray.pipelines.pairs import factorize_strings

    c, u = factorize_strings(pd.Series(["a\x00b", "a", "a\x00b", "", None]),
                             use_na_sentinel=False)
    assert list(c) == [0, 1, 0, 2, 3]
    assert list(u[:3]) == ["a\x00b", "a", ""] and pd.isna(u[3])
    # sentinel-vs-empty: the \x00-prefixed NULL sentinel is distinct
    c2, u2 = factorize_strings(pd.Series(["\x00<null>", "", "x"]))
    assert len(set(c2)) == 3
    # fast path (no NULs) must behave exactly like pd.factorize
    c3, u3 = factorize_strings(pd.Series(["q", "p", "q", None]))
    assert list(c3) == [0, 1, 0, -1] and list(u3) == ["q", "p"]


def test_window_nul_prefix_types_without_null_key(ray_session, tmp_path):
    """q04/q41 driver folds must NOT merge NUL-prefix type pairs.

    pandas' StringHashTable only escapes to its exact object table when
    a None is present in the column — a world with 'fz'/'fz\\x00nul'
    types and NO NULL event_type hits the NUL-truncating fast path, so
    the fuzz world (which always has NULL types) structurally cannot
    catch this class (code-review finding, reproduced)."""
    from web_scrapper_ray.pipelines.relational import (
        q_events_sliding_window, q_events_window)

    sf = _write(tmp_path, "events", pa.table({
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000, 4_000_000],
                       pa.timestamp("us")),
        "event_type": pa.array(["fz", "fz\x00nul", "fz", "fz\x00nul"]),
        "value": pa.array([5.0, 4.0, 6.0, 6.0]),
    }))
    out = q_events_window(sf)
    assert len(out) == 2
    got = {r.event_type: (r.n_events, r.sum_value)
           for r in out.itertuples()}
    assert got == {"fz": (2, 11.0), "fz\x00nul": (2, 10.0)}
    oracle = duckdb.sql(
        f"""SELECT event_type, count(*) n, round(sum(value), 4) s
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).df()
    assert {r.event_type: (r.n, r.s) for r in oracle.itertuples()} == got

    out41 = q_events_sliding_window(sf)
    # 2 types × 2 sliding windows (0h and −1h) each — count with
    # Counter, not pandas groupby (the trap under test lives there too)
    assert len(out41) == 4
    from collections import Counter
    assert Counter(out41["event_type"]) == {"fz": 2, "fz\x00nul": 2}
    assert out41["n_events"].tolist() == [2, 2, 2, 2]


def test_big_int64_ids_survive_exchanges(ray_session, tmp_path):
    """ids ≥ 2^53 must stay exact through NULL-free exchanges: a
    float64 leg silently rounds 2^53+1 → 2^53 (code-review finding)."""
    from web_scrapper_ray.pipelines.relational import (
        q_customer_orders_full_join, q_events_asof_join, q_rolling_avg)

    big = 2 ** 53 + 1
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([big, big + 2], pa.int64()),
        "ts": pa.array([10_000_000, 20_000_000], pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([1.0, 3.0]),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([big], pa.int64()),
        "o_totalprice": pa.array([10.0]),
        "o_orderdate": pa.array([5_000_000], pa.timestamp("us")),
    }))
    sf = _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([big], pa.int64()),
        "c_mktsegment": pa.array(["SEG"]),
    }))

    roll = q_rolling_avg(sf)
    assert roll["event_id"].dtype == np.int64
    assert roll["event_id"].tolist() == [big, big + 2]
    assert roll["rolling_avg"].tolist() == [1.0, 2.0]

    asof = q_events_asof_join(sf)
    assert asof["event_id"].dtype == np.int64
    # both events see the big-custkey user's order only if user matches;
    # user 1 has no order → inner asof drops them
    assert len(asof) == 0 or asof["event_id"].tolist() == [big, big + 2]

    fj = q_customer_orders_full_join(sf)
    assert fj["custkey"].dtype == np.int64
    assert fj["custkey"].tolist() == [big]
    assert fj["n_orders"].tolist() == [1]


def test_coded_keys_roundtrip():
    """shared NUL-safe groupby adapter: codes key on full bytes, restore
    maps back to originals with None for the NULL key."""
    from web_scrapper_ray.pipelines.pairs import coded_keys

    df = pd.DataFrame({"k": ["a", "a\x00b", "a", None, ""],
                       "v": [1, 2, 3, 4, 5]})
    df2, restore = coded_keys(df, ["k"])
    assert df2["k"].dtype.kind in "iu"
    out = df2.groupby("k", as_index=False)["v"].sum()
    out = restore(out)
    got = {(None if k is None else k): v
           for k, v in zip(out["k"], out["v"])}
    assert got == {"a": 4, "a\x00b": 2, None: 4, "": 5}
    assert out["k"].dtype == object
