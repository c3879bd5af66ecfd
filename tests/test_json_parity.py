"""q113 json_extract_string parity, probed against a LIVE DuckDB —
covers the yyjson grammar/rendering classes no synthetic corpus can
plant on both sides identically (lowercase inf/nan spellings are VALID
to yyjson but not to Python's json, so the fuzz world cannot carry
them; here each side evaluates its own parser on the same bytes and
the outputs must still agree).  Also pins q110's ±inf argmax, which
check_queries' round(9) normalization would mask (DBL_MAX*1e9 → inf).
"""

import json
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web_scrapper_ray.pipelines.textops import (_rewrite_infnan,
                                                json_extract_string_py)

HOSTILE = [
    # yyjson double rendering: fixed notation through 1e20, scientific
    # (no '+') from 1e21; fixed through 1e-6, scientific from 1e-7
    '{"k": 1e22}', '{"k": 1e21}', '{"k": 1e20}', '{"k": 1e15}',
    '{"k": 1e16}', '{"k": 1e-5}', '{"k": 1e-6}', '{"k": 1e-7}',
    '{"k": 2.0}', '{"k": -0.0}', '{"k": 0.1}', '{"k": 5e-324}',
    '{"k": 1.7976931348623157e308}', '{"k": 9.109383701528e-31}',
    '{"k": 123456789.123456789}',
    # ints beyond int64/uint64 are read as doubles
    '{"k": 123456789012345678901}', '{"k": 18446744073709551615}',
    '{"k": 18446744073709551616}', '{"k": -9223372036854775808}',
    '{"k": -9223372036854775809}',
    # duplicate keys: first-wins lookup, both pairs re-serialized
    '{"k":1,"k":2}', '{"k":null,"k":2}',
    '{"k": {"a":1,"a":2}}',
    # inf/nan literal grammar (yyjson accepts case-insensitive, '-' ok,
    # '+' rejected; Python only NaN/Infinity/-Infinity)
    '{"k": NaN}', '{"k": nan}', '{"k": -NaN}', '{"k": NAN}',
    '{"k": inf}', '{"k": Inf}', '{"k": -inf}', '{"k": Infinity}',
    '{"k": -Infinity}', '{"k": -INFINITY}', '{"k": +infinity}',
    '{"k": +inf}', '{"k": +NaN}', '{"k": 1e999}', '{"k": -1e999}',
    '{"k": 1e-999}', '{"k": [NaN, -inf]}', '{"nan": inf, "k": nan}',
    # inf/nan spellings INSIDE strings must never be rewritten
    '{"k": "banana"}', '{"k": "inf story"}', '{"k": "NaN"}',
    '{"k": "-Infinity"}', '{"nan": "inf", "k": "nan"}',
    # nested re-serialization: compact, yyjson numbers, escapes
    '{"k": {"a": 1e22, "k": [1.5, 2, true, null], "a": 2}}',
    '{"k": ["x\\ny/z\\u0001é", "\\ud83d\\ude00", "a/b"]}',
    # non-object roots, missing key, invalid grammar
    '[1, 2]', '"s"', '123', 'null', 'true', '{"K": 1}', '{}',
    'not json', '{"k": 01}', '{"k": +1}', '{"k": .5}', '{"k": 1.}',
    '{"k": 1e}', '{"k": "\\x41"}', '', ' ', '\t{"k": 1}  ',
    '﻿{"k":1}', None,
]


def test_json_extract_parity_vs_live_duckdb():
    con = duckdb.connect()
    cases = list(HOSTILE)
    rng = random.Random(20260818)
    for _ in range(300):
        e = rng.randint(-300, 300)
        m = rng.random() * 10 ** rng.randint(0, 17)
        try:
            x = m * (10.0 ** e) * rng.choice([1, -1])
        except OverflowError:
            continue
        cases.append(json.dumps({"k": x}))
    for _ in range(100):
        cases.append('{"k": %d}' % rng.randint(-10 ** 25, 10 ** 25))
    for raw in cases:
        want = con.execute(
            "select CASE WHEN json_valid(?) THEN"
            " json_extract_string(?, '$.k') END", [raw, raw]).fetchone()[0]
        got = json_extract_string_py(raw)
        assert got == want, f"{raw!r}: engine {got!r} != duckdb {want!r}"


def test_rewrite_infnan_leaves_strings_alone():
    assert _rewrite_infnan('{"k": "nan inf -Inf"}') == '{"k": "nan inf -Inf"}'
    assert _rewrite_infnan('{"k": nan}') == '{"k": NaN}'
    assert _rewrite_infnan('{"k": -NaN}') == '{"k": NaN}'  # -NaN IS NaN
    assert _rewrite_infnan('{"k": -inf}') == '{"k": -Infinity}'
    # escaped quote inside a string must not end string mode
    assert _rewrite_infnan('{"k": "a\\"nan", "j": inf}') \
        == '{"k": "a\\"nan", "j": Infinity}'


def test_argmax_keeps_infinity(ray_session, tmp_path):
    """q110: an all-±inf-max group must report vmax=inf, not DBL_MAX
    (np.nan_to_num used to clobber it); inf must also beat the largest
    finite double, with SQL's min-id tie-break left intact."""
    from web_scrapper_ray.pipelines.relational import q_argmax_event

    big = np.finfo(np.float64).max
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "b"]),
        "value": pa.array([big, float("inf"), 7.0, 7.0, None]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_argmax_event(str(tmp_path)).set_index("event_type")
    assert np.isinf(out.loc["a", "vmax"]) and out.loc["a", "vmax"] > 0
    assert out.loc["a", "argmax_id"] == 2  # inf beats DBL_MAX
    assert out.loc["b", "vmax"] == 7.0
    assert out.loc["b", "argmax_id"] == 3  # min id among ties
