"""Deterministic ADVERSARIAL sf dir for the parity gate: start from a
real sf tier and inject the value classes that have historically hidden
engine↔DuckDB divergences (q92 constant groups, q96 off-grid halves,
q105 non-ASCII bytes, nullable-dtype flips) — NULLs in every nullable
column, NaN/±inf doubles, half-boundary values, unicode / empty / blank
strings, pre-1970 timestamps, duplicate natural keys, constant groups.

Usage: python scripts/make_fuzz_world.py [/tmp/wsr_fuzz [src_sf_dir]]
Then:  python scripts/check_queries.py /tmp/wsr_fuzz

Any query whose engine/oracle pair disagrees here has a latent parity
hole; queries whose contract excludes a class carry the SAME filter in
both the engine and the oracle SQL, so they still pass.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260818


def _rows(t: pa.Table, d: dict) -> pa.Table:
    """Append rows given {col: list}; unmentioned columns get NULLs."""
    cols = {}
    n = max(len(v) for v in d.values())
    for name in t.schema.names:
        typ = t.schema.field(name).type
        vals = d.get(name, [None] * n)
        cols[name] = pa.array(vals, typ)
    return pa.concat_tables([t, pa.table(cols, schema=t.schema)])


def build(out_dir: str, src: str = "/root/testdata/sf0.001") -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    tabs = {name: pq.read_table(os.path.join(src, f"{name}.parquet"))
            for name in ("region nation customer supplier part orders "
                         "lineitem events documents embeddings").split()}

    ts = lambda s: np.datetime64(int(s * 1_000_000), "us").item()

    # events: NULL keys/values, NaN/±inf, pre-1970 fractional ts,
    # constant-value group (q92's class), half-boundary values
    tabs["events"] = _rows(tabs["events"], {
        "event_id": list(range(900001, 900013)),
        "ts": [None, ts(-3599.5), ts(-1), ts(0.5), ts(3600),
               ts(7200), ts(10800), ts(14400), ts(1), ts(2), ts(3), ts(4)],
        "user_id": [1, None, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        "event_type": ["fz_null", "fz_null", None, "fz_nan", "fz_inf",
                       "fz_konst", "fz_konst", "fz_konst",
                       "fz_half", "fz_half", "fz_half", "fz_half"],
        "value": [None, 1.0, 2.0, float("nan"), float("inf"),
                  1.7, 1.7, 1.7, 0.5, 1.5, 2.5, -2.5],
        "props": [None, "", "{}", "not json", "ünïcodé", "{\"a\":1}",
                  None, "", " ", "x", "y", "z"],
    })

    # q113/q17's hostile-JSON class (only spellings BOTH parsers accept
    # as valid/invalid identically — yyjson's extra lowercase inf/nan
    # grammar is covered by the DuckDB-probe unit test instead):
    # yyjson number rendering (fixed-vs-scientific cutoffs at 1e21/1e-7,
    # .0 suffix, no '+' exponent), >uint64 ints read as doubles,
    # duplicate keys (first-wins lookup, both pairs re-serialized),
    # NaN/Infinity literals, non-object roots, nested re-serialization
    jprops = ['{"k": 1e22}', '{"k": 1e15}', '{"k": 1e-7}',
              '{"k": 0.00001}', '{"k": 123456789012345678901}',
              '{"k": 18446744073709551615}', '{"k": -9223372036854775809}',
              '{"k": 2.0}', '{"k": -0.0}', '{"k":1,"k":2}',
              '{"k":null,"k":2}', '{"k": NaN}', '{"k": Infinity}',
              '{"k": -Infinity}', '{"k": 1e999}',
              '{"k": {"a": 1e22, "k": [1.5, 2, true, null], "a": 2}}',
              '{"k": "x\\ny/z\\u0001é"}', '[1, 2]', '"s"', '123',
              'null', 'true', '{"K": 1}', '{"k": 01}', '{"k": .5}']
    nj = len(jprops)
    # ts sits at q92's centering epoch (1.7e9): a perfectly-collinear
    # (value, ts) group FAR from the center would put ~5e5× leverage on
    # the intercept extrapolation, where DuckDB's accumulator and the
    # engine's Chan-merged moments legitimately differ in the 8th digit
    # of the slope — an ill-conditioning artifact, not a parity signal
    tabs["events"] = _rows(tabs["events"], {
        "event_id": list(range(900301, 900301 + nj)),
        "ts": [ts(1_700_000_000 + 100 + i) for i in range(nj)],
        "user_id": [20 + i for i in range(nj)],
        "event_type": ["fz_json"] * nj,
        "value": [float(i) for i in range(nj)],
        "props": jprops,
    })

    # negative + NULL event_ids (SQL % is TRUNCATED — numpy's floored
    # % gave negative ids a different q115 interval; NULL ids are
    # invisible to q110's min() and q116's tiebreak) and an
    # embedded-NUL event_type that is a NUL-prefix pair with 'fz'
    # (pandas hashes strings as C strings — groupby/factorize/
    # drop_duplicates silently merge the pair, DuckDB keys on bytes)
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [-3, -8, None, 900401, 900402, 900403, 900404],
        "ts": [ts(1_700_003_700 + 60 * i) for i in range(7)],
        "user_id": [30, 30, 31, 31, 32, 32, 32],
        "event_type": ["fz_neg", "fz_neg", "fz_neg",
                       "fz\x00nul", "fz", "fz\x00nul", "fz"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 6.0],
    })

    # q92's zero-valid-pair class: a type whose every row has a NULL in
    # the (ts, value) pair — GROUP BY still emits it (regr_count=0,
    # NULL slope/icept/r2); engines that pre-filter drop the group
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [900101, 900102, 900103],
        "ts": [None, ts(10), None],
        "user_id": [12, 12, 13],
        "event_type": ["fz_allnull"] * 3,
        "value": [1.0, None, None],
    })

    # split-batch all-NULL window slice (q04's class): a >1024-row run
    # of NULL values in ONE (type, hour) group guarantees a Ray batch
    # boundary strictly inside the run, so one Arrow partial sees an
    # all-NULL slice (partial sum NULL) while a later batch holds the
    # real values — a NaN-carrying combine poisons the SQL sum of 6.0
    nsplit = 1030
    tabs["events"] = _rows(tabs["events"], {
        "event_id": list(range(901000, 901000 + nsplit + 3)),
        "ts": [ts(720000 + i % 3000) for i in range(nsplit)]
              + [ts(720001), ts(720002), ts(720003)],
        "user_id": [None] * nsplit + [14, 14, 14],
        "event_type": ["fz_split"] * (nsplit + 3),
        "value": [None] * nsplit + [1.0, 2.0, 3.0],
    })

    # keyed-ASOF NULL-time classes (probed DuckDB semantics): NULL ts
    # on either side acts as +infinity — a NULL event ts matches the
    # partition max (a NULL-date order when one exists → NULL output;
    # still a row when ALL the user's orders are NULL-dated), while a
    # real event ts never matches a NULL-date order
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [900201, 900202, 900203, 900204, 900205],
        "ts": [None, ts(50), ts(60), None, None],
        "user_id": [900011, 900011, 900012, 900012, 900013],
        "event_type": ["fz_asof"] * 5,
        "value": [1.0] * 5,
    })

    # lineitem: off-grid half quantities (q96's class), NULL flags,
    # NaN price/discount, pre-1970 shipdate
    tabs["lineitem"] = _rows(tabs["lineitem"], {
        "l_orderkey": [900001] * 6,
        "l_partkey": [1, 1, 2, 2, 3, 3],
        "l_suppkey": [1, 1, 1, 1, 1, 1],
        "l_linenumber": [1, 2, 3, 4, 5, 6],
        # money stays NaN-free (NULLs only): Ray's builtin Sum/Mean
        # return None and Max skips where SQL PROPAGATES NaN — NaN in
        # a price column is out of contract for the builtin-agg
        # queries (real dirty money is NULL); the explicit-contract
        # events.value family below still gets NaN/±inf. Values are
        # clean 2dp so 2dp-rounded sums sit far from the banker's/
        # half-away knife edge that float association noise can flip.
        "l_quantity": [2.5, 3.5, -2.5, 0.5, None, 46.5],
        "l_extendedprice": [None, 1.25, 2.75, None, 1.0, 2.0],
        "l_discount": [0.05, None, 0.25, 0.5, 0.0, 1.0],
        "l_tax": [0.0] * 6,
        "l_returnflag": [None, "A", "A", None, "R", "R"],
        "l_linestatus": ["O", None, "O", None, "F", "F"],
        "l_shipdate": [ts(-86400.5), None, ts(0), ts(1), ts(2), ts(3)],
    })

    # NUL-pair flag/status strings (round-4 leg: any lineitem groupby
    # on returnflag/linestatus — q368/q370/q176/q01 families — must
    # key on full bytes; 'N' and 'N\x00x' are DISTINCT groups in SQL
    # and silently merge under pandas' C-string hashing)
    tabs["lineitem"] = _rows(tabs["lineitem"], {
        "l_orderkey": [900002] * 4,
        "l_partkey": [1, 2, 3, 1],
        "l_suppkey": [2, 2, 2, 2],
        "l_linenumber": [1, 2, 3, 4],
        "l_quantity": [1.0, 2.0, 3.0, 4.0],
        "l_extendedprice": [10.25, 20.5, 30.75, 41.0],
        "l_discount": [0.0, 0.1, 0.2, 0.3],
        "l_tax": [0.0] * 4,
        "l_returnflag": ["N\x00x", "N", "N\x00x", None],
        "l_linestatus": ["F\x00z", "F", "F", "F\x00z"],
        "l_shipdate": [ts(10), ts(11), ts(12), ts(13)],
    })

    # NUL-pair BRAND strings on joinable parts (q370/q45/q149/q166
    # class: brand aggregates must keep 'BB' and 'BB\x00b' apart
    # through every merge, including broadcast-dim lookups)
    tabs["part"] = _rows(tabs["part"], {
        "p_partkey": [900011, 900012],
        "p_name": ["fz brandpair a", "fz brandpair b"],
        "p_brand": ["BB", "BB\x00b"],
        "p_type": ["tt", "tt\x00p"],
        "p_size": [1, 2],
        "p_retailprice": [1.0, 2.0],
    })
    tabs["lineitem"] = _rows(tabs["lineitem"], {
        "l_orderkey": [900003] * 2,
        "l_partkey": [900011, 900012],
        "l_suppkey": [3, 3],
        "l_linenumber": [1, 2],
        "l_quantity": [1.0, 1.0],
        "l_extendedprice": [5.25, 5.25],
        "l_discount": [0.0, 0.0],
        "l_tax": [0.0] * 2,
        "l_returnflag": ["N", "N"],
        "l_linestatus": ["F", "F"],
        "l_shipdate": [ts(14), ts(15)],
    })

    # pre-1970 order dates on an ordered customer (calendar month/
    # day binning in the orderdate family must floor, not truncate)
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900051, 900052],
        "o_custkey": [900011, 900011],
        "o_orderstatus": ["O", "O"],
        "o_totalprice": [5.0, 6.0],
        "o_orderdate": [ts(-86400 * 40 - 0.5), ts(-86400 * 400)],
        "o_orderpriority": ["2-HIGH", "2-HIGH"],
    })

    # extreme int64 user ids (beyond 2^53: any engine stage that
    # round-trips ids through float64 loses them — q49's mixed
    # per-bucket schema crashed Ray's unifying safe-cast here).
    # ts sits near the 1.7e9 centering epoch and values are NOT
    # collinear (the documented q92 ill-conditioning class is an
    # artifact, not a parity signal)
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [900701, 900702, 900703, 900704],
        "ts": [ts(1_700_004_000 + i) for i in range(4)],
        "user_id": [1 << 62, -(1 << 62), -(1 << 63) + 1, 1 << 62],
        "event_type": ["fz_bigid"] * 4,
        "value": [1.0, 7.5, 2.25, 7.5],
    })

    # >2^53 surrogate keys where the schema allows sparse ids:
    # orderkey (join machinery), doc_id (text/dedup), vec_id
    # (similarity) — any float64 round-trip loses them. partkey/
    # suppkey stay in the dense packing domain BY CONTRACT (the
    # graph/itemset family packs them and raises loudly past 2^32).
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [(1 << 62) + 3],
        "o_custkey": [900011],
        "o_orderstatus": ["O"],
        "o_totalprice": [12.5],
        "o_orderdate": [ts(40)],
        "o_orderpriority": ["2-HIGH"],
    })
    tabs["lineitem"] = _rows(tabs["lineitem"], {
        "l_orderkey": [(1 << 62) + 3, (1 << 62) + 3],
        "l_partkey": [1, 2],
        "l_suppkey": [1, 1],
        "l_linenumber": [1, 2],
        "l_quantity": [1.0, 2.0],
        "l_extendedprice": [3.25, 4.5],
        "l_discount": [0.0, 0.0],
        "l_tax": [0.0, 0.0],
        "l_returnflag": ["N", "N"],
        "l_linestatus": ["F", "F"],
        "l_shipdate": [ts(41), ts(42)],
    })
    tabs["documents"] = _rows(tabs["documents"], {
        "doc_id": [(1 << 62) + 11],
        "text": ["fz big doc id body words"],
        "lang": ["en"],
        "source": ["fz"],
        "n_chars": [24],
    })
    tabs["embeddings"] = _rows(tabs["embeddings"], {
        "vec_id": [(1 << 62) + 13],
        "embedding": [[0.1, 0.2, 0.3, 0.4] * 16],
        "label": [0],
    })

    # NUL-pair supplier names WITH revenue (q164-class name outputs)
    tabs["supplier"] = _rows(tabs["supplier"], {
        "s_suppkey": [900011, 900012],
        "s_name": ["fzs", "fzs\x00n"],
        "s_nationkey": [0, 1],
        "s_acctbal": [1.0, 2.0],
    })
    tabs["lineitem"] = _rows(tabs["lineitem"], {
        "l_orderkey": [900003] * 2,
        "l_partkey": [900011, 900012],
        "l_suppkey": [900011, 900012],
        "l_linenumber": [3, 4],
        "l_quantity": [1.0, 1.0],
        "l_extendedprice": [7.25, 7.25],
        "l_discount": [0.0, 0.0],
        "l_tax": [0.0] * 2,
        "l_returnflag": ["N", "N"],
        "l_linestatus": ["F", "F"],
        "l_shipdate": [ts(16), ts(17)],
    })

    # NUL-pair MARKET SEGMENTS on customers WITH orders (q369/q374/
    # q42/q02 class: segment group keys must stay byte-distinct
    # through per-customer aggregation and the driver folds)
    tabs["customer"] = _rows(tabs["customer"], {
        "c_custkey": [900011, 900012],
        "c_name": ["fz segpair a", "fz segpair b"],
        "c_nationkey": [0, 1],
        "c_acctbal": [1.0, 2.0],
        "c_mktsegment": ["FZ", "FZ\x00s"],
    })
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900041, 900042, 900043],
        "o_custkey": [900011, 900012, 900012],
        "o_orderstatus": ["O", "O\x00s", "O"],
        "o_totalprice": [10.0, 20.0, 30.0],
        "o_orderdate": [ts(30), ts(31), ts(32)],
        "o_orderpriority": ["2-HIGH"] * 3,
    })

    # part: unicode names (q105 byte-distance class), NULL name/brand,
    # duplicate names, empty string
    tabs["part"] = _rows(tabs["part"], {
        "p_partkey": list(range(900001, 900008)),
        "p_name": ["éclair", "eclair", "éclairs", None, "", "日本語", "日本誤"],
        "p_brand": ["Brand#é", "Brand#é", None, "Brand#1", "", "B", "B"],
        "p_type": ["t"] * 7,
        "p_size": [1, 2, None, 4, 5, 6, 7],
        "p_retailprice": [0.5, 1.5, None, None, 2.5, -0.5, 0.0],
    })

    # customer/orders: NULL keys (join classes), NaN balances,
    # duplicate customer rows, an order pointing at a missing customer
    tabs["customer"] = _rows(tabs["customer"], {
        "c_custkey": [900001, 900001, 900002, 900003, None],
        "c_name": ["fz dup", "fz dup", None, "ünïcodé", "fz nullkey"],
        "c_nationkey": [0, 0, None, 1, 0],
        "c_acctbal": [None, 0.5, None, float("-inf"), 1.0],
        "c_mktsegment": ["FZ", "FZ", None, "", "FZN"],
    })
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900001, 900002, 900003],
        "o_custkey": [900001, None, 999999],
        "o_orderstatus": ["O", None, "F"],
        "o_totalprice": [0.25, None, 150.0],
        "o_orderdate": [ts(-1), ts(0), None],
        "o_orderpriority": ["1-URGENT", None, ""],
    })
    # ASOF right-side classes: user 900011 mixed real+NULL dates, 900012 only a
    # NULL date, 900013 only real dates (paired with the fz_asof events)
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900011, 900012, 900013, 900014, 900015],
        "o_custkey": [900011, 900011, 900012, 900013, 900013],
        "o_orderstatus": ["O"] * 5,
        "o_totalprice": [1.0] * 5,
        "o_orderdate": [ts(10), None, None, ts(10), ts(20)],
        "o_orderpriority": ["1-URGENT"] * 5,
    })

    # nation/region/supplier dim classes (q08/q134): DUPLICATE dim rows
    # fan inner joins out multiplicatively (a dict lookup collapses
    # them); NUL-prefix and NULL names are distinct GROUP BY keys; a
    # NULL s_nationkey never joins; NULL balances keep count(*) rows
    # but a group of only-NULL balances sums to SQL NULL
    rp = tabs["region"].to_pandas()
    akey = int(rp.loc[rp["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    tabs["region"] = _rows(tabs["region"], {
        "r_regionkey": [akey, 900001],
        "r_name": ["ASIA", None],  # dup ASIA doubles its fanout
    })
    tabs["nation"] = _rows(tabs["nation"], {
        "n_nationkey": [900001, 900001, 900002, 900003, 900004],
        "n_name": ["FZNAT", "FZNAT", "FZNAT\x00x", None, "fz nullreg"],
        "n_regionkey": [akey, akey, akey, akey, 900001],
    })
    tabs["supplier"] = _rows(tabs["supplier"], {
        "s_suppkey": [900001, 900001, 900002, 900003, 900004],
        "s_name": ["fz dup", "fz dup", None, "fz", "fz"],
        "s_nationkey": [900001, 900001, 900002, None, 900004],
        "s_acctbal": [1.25, None, None, 1.0, 2.0],
    })

    # q135's division class: a customer spanning 4 canonical priorities
    # plus a NUL-variant 5th (a DISTINCT value — pandas' C-string
    # hashing would merge it with '1-URGENT' and drop the customer);
    # q133's filter class: non-finite click/purchase values must be
    # excluded on both sides (DuckDB var_samp raises on NaN/±inf)
    # q146's entity-conflict class: one custkey bound to two names —
    # one pair differing only past an embedded NUL (pandas' C-string
    # hashing would hide it), plus a clean two-name conflict
    tabs["customer"] = _rows(tabs["customer"], {
        "c_custkey": [900010, 900010, 900011, 900011, 900012, 900012],
        "c_name": ["fz ent", "fz ent\x00x", "fz two", "fz too",
                   "fz same", "fz same"],
        "c_nationkey": [0] * 6,
        "c_acctbal": [1.0] * 6,
        "c_mktsegment": ["FZ"] * 6,
    })

    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": list(range(900021, 900026)),
        "o_custkey": [900021] * 5,
        "o_orderstatus": ["O"] * 5,
        "o_totalprice": [1.0] * 5,
        "o_orderdate": [ts(20 + i) for i in range(5)],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "1-URGENT\x00z"],
    })
    tabs["events"] = _rows(tabs["events"], {
        "event_id": list(range(900501, 900507)),
        "ts": [ts(100 + i) for i in range(6)],
        "user_id": [40, 40, 41, 41, 42, 42],
        "event_type": ["click", "click", "purchase",
                       "purchase", "click", "purchase"],
        "value": [float("nan"), float("inf"), float("-inf"),
                  None, 0.25, 0.75],
    })

    # attribution/asof classes (q182/q190/q178/q189): a NUL-variant
    # 'purchase\x00z' type is a DIFFERENT string that must neither
    # convert nor match; purchase-before-any-click (no asof match);
    # purchase with NO prior event at all (NULL attribution); two
    # events at the IDENTICAL timestamp (event_id breaks the tie)
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [900601, 900602, 900603, 900604, 900605, 900606],
        "ts": [ts(200), ts(200), ts(210), ts(220), ts(230), ts(230)],
        "user_id": [50, 50, 50, 51, 52, 52],
        "event_type": ["purchase", "click", "purchase\x00z",
                       "purchase", "click", "purchase"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })

    # rank-stat classes (q194-q196): CROSS-TYPE ties (identical value
    # in both click and purchase → shared mid-rank), a -0.0/+0.0 pair
    # (SQL groups them as one distinct value; float bit-keys don't),
    # and a 'click\x00k' NUL variant that must NOT join the club
    tabs["events"] = _rows(tabs["events"], {
        "event_id": [900611, 900612, 900613, 900614, 900615],
        "ts": [ts(240), ts(241), ts(242), ts(243), ts(244)],
        "user_id": [53, 53, 54, 54, 55],
        "event_type": ["click", "purchase", "click", "purchase",
                       "click\x00k"],
        "value": [7.25, 7.25, -0.0, 0.0, 7.25],
    })

    # audit/digit classes (q183/q179): exact-zero and negative order
    # totals (uncomparable / no leading digit), a lineitem-less order
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900031, 900032, 900033],
        "o_custkey": [40, 41, 42],
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": [0.0, -123.75, 0.5],
        "o_orderdate": [ts(300), ts(301), ts(302)],
        "o_orderpriority": ["5-LOW"] * 3,
    })

    # duplicate-invoice classes (q206): same cust + identical price at
    # gaps 5d (pair), 4d (pair), 9d-from-first (NO pair); a -0.0/+0.0
    # price pair (SQL equal); same price DIFFERENT cust (no pair); a
    # duplicated orderkey row (self-pair excluded, fans other pairs)
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": [900061, 900062, 900063, 900064, 900065,
                       900066, 900066, 900068],
        "o_custkey": [44, 44, 44, 45, 45, 46, 46, 47],
        "o_orderstatus": ["O"] * 8,
        "o_totalprice": [55.25, 55.25, 55.25, -0.0, 0.0,
                         77.5, 77.5, 55.25],
        "o_orderdate": [ts(40_000_000), ts(40_000_000 + 5 * 86_400),
                        ts(40_000_000 + 9 * 86_400),
                        ts(40_000_000 + 20 * 86_400),
                        ts(40_000_000 + 21 * 86_400),
                        ts(40_000_000 + 30 * 86_400),
                        ts(40_000_000 + 33 * 86_400),
                        ts(40_000_000 + 86_400)],
        "o_orderpriority": ["5-LOW"] * 8,
    })

    # WITH-TIES boundary class (q197): 12 orders in ONE price band
    # above everything else — the 10th row lands inside the band, so
    # WITH TIES must return all 12 (plain LIMIT 10 would return 10)
    tabs["orders"] = _rows(tabs["orders"], {
        "o_orderkey": list(range(900041, 900053)),
        "o_custkey": [43] * 12,
        "o_orderstatus": ["O"] * 12,
        "o_totalprice": [9_999_900.0 + i for i in range(12)],
        "o_orderdate": [ts(310 + i) for i in range(12)],
        "o_orderpriority": ["5-LOW"] * 12,
    })

    # skyline/Q20 classes (q185/q173): tied Pareto points (duplicate
    # coordinates both survive), a dominated duplicate, negative
    # price; 'red\x00x' part name — LIKE 'red%' matches it on BYTES
    tabs["part"] = _rows(tabs["part"], {
        "p_partkey": list(range(900011, 900016)),
        "p_name": ["red\x00x", "red one", "redder", "blue", None],
        "p_brand": ["Brand#9"] * 5,
        "p_type": ["t"] * 5,
        "p_size": [1, 1, 2, 1, 1],
        "p_retailprice": [-1.0, -1.0, -1.0, -2.0, -2.0],
    })

    # SNM / ER-chain classes (q208/q220): four docs whose 32-char
    # prefixes form a one-edit CHAIN (a~b~c~d adjacent in sorted order
    # but a!~d directly) — min-label propagation needs >1 round to
    # collapse them into one cluster; plus a NUL-embedded prefix that
    # must sort/compare by BYTES, and an exact-prefix duplicate pair
    tabs["documents"] = _rows(tabs["documents"], {
        "doc_id": list(range(900011, 900017)),
        "text": ["snm chain aaaaaaaaaaaaaaaaaaa 0 tail one",
                 "snm chain aaaaaaaaaaaaaaaaaaa 1 tail two",
                 "snm chain aaaaaaaaaaaaaaaaaab 1 tail three",
                 "snm chain aaaaaaaaaaaaaaaaabb 1 tail four",
                 "snm chain\x00aaaaaaaaaaaaaaaaaaa 0 nul",
                 "snm chain aaaaaaaaaaaaaaaaaaa 0 tail one dup"],
        "lang": ["en"] * 6,
        "source": ["fz"] * 6,
        "n_chars": [40, 40, 42, 41, 36, 44],
    })

    # NUL-pair lang codes (q297/q331/q344/q285 class: language keys
    # must stay byte-distinct through rebalance/split machinery)
    tabs["documents"] = _rows(tabs["documents"], {
        "doc_id": [900021, 900022, 900023],
        "text": ["the and for lang pair one",
                 "the and for lang pair two",
                 "the and for lang pair three"],
        "lang": ["xx", "xx\x00l", "xx"],
        "source": ["fz"] * 3,
        "n_chars": [25, 25, 27],
    })

    # documents: NULL/empty/unicode/whitespace text, NULL lang/source,
    # duplicate doc text (dedup classes), zero n_chars
    tabs["documents"] = _rows(tabs["documents"], {
        "doc_id": list(range(900001, 900008)),
        "text": [None, "", "   ", "ünïcodé naïve éclair",
                 "the the the the the", "the the the the the", "a"],
        "lang": [None, "en", "", "fr", "en", "en", None],
        "source": ["fz", None, "fz", "", "fz", "fz", "fz"],
        "n_chars": [None, 0, 3, 20, 19, 19, 1],
    })

    # NULL source WITH tokens (a NULL-source doc must form its own
    # group — pandas' NUL-terminated string hashing merged the \x00
    # sentinel with the real '' source above until q117's code-keyed
    # groupby), plus an embedded-NUL source that is a NUL-prefix pair
    # with the existing 'fz' source (the same hashing merges those)
    tabs["documents"] = _rows(tabs["documents"], {
        "doc_id": [900008, 900009],
        "text": ["null source tokens here", "nul embedded source doc"],
        "lang": ["en", "en"],
        "source": [None, "fz\x00x"],
        "n_chars": [23, 23],
    })

    # embeddings: NULL vector, NULL label, zero vector, duplicate ids
    dim = len(tabs["embeddings"].column("embedding")[0])
    tabs["embeddings"] = _rows(tabs["embeddings"], {
        "vec_id": [900001, 900002, 900003],
        "embedding": [None, [0.0] * dim,
                      [float(x) for x in rng.randn(dim)]],
        "label": [None, 0, 1],
    })

    for name, t in tabs.items():
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=256)
    print(f"fuzz world at {out_dir} "
          f"({', '.join(f'{k}={v.num_rows}' for k, v in tabs.items())})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wsr_fuzz"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    build(out, src)
