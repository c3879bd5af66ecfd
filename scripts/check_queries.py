"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query_name ...]
       python scripts/check_queries.py SF_DIR --exclude name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    # pandas MULTI-column sort factorizes object keys through its
    # NUL-terminated string hash table, so 'fz' and 'fz\x00nul' tie and
    # fall back to input order — sort on a hex encoding instead (two
    # lowercase hex chars per byte preserves byte order exactly)
    keys = {}
    for c in df.columns:
        keys[c] = (df[c].map(lambda v: v.encode("utf-8",
                                                "surrogatepass").hex())
                   if df[c].dtype == object else df[c])
    order = pd.DataFrame(keys).sort_values(list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    exclude: set = set()
    if rest and rest[0] == "--exclude":
        exclude = set(rest[1:])
        only = set()
    else:
        only = set(rest)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = _fresh_con(sf_dir)

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    # bounded twins for quadratic-oracle queries on big worlds: same
    # deterministic md5-coin input sample on both sides, so the sf1
    # gate runs them oracle-checked instead of --exclude'd
    sampled = (entrymod.sampled_oracles()
               if hasattr(entrymod, "sampled_oracles") else {})
    failures = 0
    for name, fn in qs.items():
        if (only and name not in only) or name in exclude:
            continue
        tag = ""
        if name in sampled:
            sp = sampled[name]
            n_tab = con.execute(
                f"SELECT count(*) FROM {sp['table']}").fetchone()[0]
            if n_tab > sp["max_full_rows"]:
                fn = sp["fn"]
                sqls = dict(sqls)
                sqls[name] = sp["sql"]
                tag = " [sampled]"
        t0 = time.time()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: engine error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(mine)} cols={list(mine.columns)} "
                  f"[rows-only, {dt:.1f}s]")
            continue
        try:
            theirs = normalize(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            con = _fresh_con(sf_dir, con)
            continue
        if _temp_spill_bytes() > 4 << 30:
            # DuckDB temp files live for the CONNECTION lifetime — a
            # heavy oracle's spill is only reclaimed on close (a
            # cumulative 77 GB filled the disk at sf1.0)
            con = _fresh_con(sf_dir, con)
        probs = []
        if len(mine) != len(theirs):
            probs.append(f"rows {len(mine)} vs {len(theirs)}")
        if list(mine.columns) != list(theirs.columns):
            probs.append(f"cols {list(mine.columns)} vs {list(theirs.columns)}")
        if not probs:
            try:
                eq = mine.equals(theirs)
                if not eq:
                    # locate first differing cell
                    for c in mine.columns:
                        a, b = mine[c].to_numpy(), theirs[c].to_numpy()
                        if a.dtype.kind == "f":
                            bad = ~(np.isclose(a, b, rtol=0, atol=0) | (pd.isna(a) & pd.isna(b)))
                        else:
                            bad = a != b
                        if bad.any():
                            i = int(np.argmax(bad))
                            probs.append(f"col {c} row {i}: {a[i]!r} vs {b[i]!r}")
                            break
                    else:
                        probs.append("dtype-level mismatch "
                                     + str([(c, str(mine[c].dtype), str(theirs[c].dtype)) for c in mine.columns]))
            except Exception as e:
                probs.append(f"compare error: {e}")
        if probs:
            print(f"FAIL {name}: {'; '.join(probs)}")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(mine)}{tag} [{dt:.1f}s]")
    failures += hash_mode(con, entrymod, sf_dir, only, exclude)
    ray.shutdown()
    return 1 if failures else 0


def _fresh_con(sf_dir: str, old=None):
    if old is not None:
        old.close()
    con = duckdb.connect()
    # NOTE (round 5): an explicit spill config (temp_directory +
    # max_temp_directory_size + memory_limit='75GiB') was tried here
    # and REVERTED: a sub-default memory_limit changes DuckDB's
    # aggregation/join plans — q126's sf1 oracle started spilling to
    # death (70 GiB) and q134's float revenue sum changed summation
    # order and flipped a half-cent at the rounding boundary — and
    # the off-cwd temp dir broke _temp_spill_bytes' accounting (disk
    # hit 95%). The ~100 GB q228 full oracle that motivated it is
    # covered by its SAMPLED contract at sf1 instead; default memory
    # behavior (spill to cwd .tmp, connection recycled by the spill
    # guard below) is the contract the whole battery was tuned on.
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _temp_spill_bytes() -> int:
    tot = 0
    try:
        for f in os.listdir(".tmp"):
            if f.startswith("duckdb_temp"):
                tot += os.path.getsize(os.path.join(".tmp", f))
    except OSError:
        pass
    return tot


def hash_mode(con, entrymod, sf_dir: str, only,
              exclude=frozenset()) -> int:
    """Scale-safe oracle contract for per-row-result queries: the
    engine result is STREAMED to parquet (``Dataset.write_parquet`` —
    never ``to_pandas`` through the driver) and DuckDB computes the
    same order-insensitive (count, sum-of-row-hash) aggregate over the
    files and over the oracle SQL. At 100× the result IS the dataset;
    this is the compare that still works there."""
    import shutil
    import tempfile

    if not hasattr(entrymod, "perrow_queries"):
        return 0
    perrow = entrymod.perrow_queries()
    sqls = entrymod.oracle_sql()
    # hash-based values with no SQL twin: streamed count-only check
    count_sqls = (entrymod.perrow_rowcount_sql()
                  if hasattr(entrymod, "perrow_rowcount_sql") else {})
    failures = 0
    tmp_root = tempfile.mkdtemp(prefix="wsr_hashgate_")
    try:
        for name, ds_fn in perrow.items():
            if (only and name not in only) or name in exclude:
                continue
            t0 = time.time()
            if name not in sqls:
                try:
                    want = con.execute(count_sqls[name]).fetchone()[0]
                    out_dir = os.path.join(tmp_root, name)
                    ds_fn(sf_dir).write_parquet(out_dir)
                    have_files = os.path.isdir(out_dir) and any(
                        f.endswith(".parquet")
                        for f in os.listdir(out_dir))
                    got = (con.execute(
                        "SELECT count(*)::BIGINT FROM read_parquet("
                        f"'{out_dir}/*.parquet')").fetchone()[0]
                        if have_files else 0)
                except Exception as e:
                    print(f"HASH FAIL {name}: {type(e).__name__}: {e}")
                    failures += 1
                    continue
                if got != want:
                    print(f"HASH FAIL {name}: engine rows={got} vs "
                          f"count-SQL {want}")
                    failures += 1
                else:
                    print(f"HASH PASS {name}: rows={got} [count-only, "
                          f"{time.time() - t0:.1f}s]")
                continue
            try:
                sql = sqls[name].rstrip().rstrip(";")
                out_dir = os.path.join(tmp_root, name)
                ds_fn(sf_dir).write_parquet(out_dir)
                desc = con.execute(
                    f"DESCRIBE SELECT * FROM ({sql})").fetchall()
                types = {r[0]: r[1] for r in desc}
                have_files = os.path.isdir(out_dir) and any(
                    f.endswith(".parquet")
                    for f in os.listdir(out_dir))
                if not have_files:
                    # empty Dataset.write_parquet writes no files —
                    # an empty engine result matches an empty oracle
                    agg0 = ("SELECT count(*)::BIGINT, "
                            "sum(1)::HUGEINT FROM ")
                    theirs = con.execute(agg0 + f"({sql})").fetchone()
                    if theirs[0] != 0:
                        print(f"HASH FAIL {name}: engine empty vs "
                              f"oracle rows={theirs[0]}")
                        failures += 1
                    else:
                        print(f"HASH PASS {name}: rows=0 "
                              f"[{time.time() - t0:.1f}s]")
                    continue
                eng_cols = {r[0] for r in con.execute(
                    "DESCRIBE SELECT * FROM read_parquet("
                    f"'{out_dir}/*.parquet')").fetchall()}
                if eng_cols != set(types):
                    print(f"HASH FAIL {name}: cols {sorted(eng_cols)} "
                          f"vs {sorted(types)}")
                    failures += 1
                    continue
                # cast both sides to the ORACLE's type (hash is
                # type-sensitive); round doubles like normalize() does
                exprs = []
                for c in sorted(types):
                    e = f'"{c}"::{types[c]}'
                    if types[c] in ("DOUBLE", "FLOAT", "REAL"):
                        e = f"round({e}::DOUBLE, 9)"
                    exprs.append(e)
                agg = (f"SELECT count(*)::BIGINT AS n, "
                       f"sum(hash({', '.join(exprs)}))::HUGEINT AS h "
                       f"FROM ")
                mine = con.execute(
                    agg + f"read_parquet('{out_dir}/*.parquet')"
                ).fetchone()
                theirs = con.execute(agg + f"({sql})").fetchone()
            except Exception as e:
                print(f"HASH FAIL {name}: {type(e).__name__}: {e}")
                failures += 1
                continue
            dt = time.time() - t0
            if mine != theirs:
                print(f"HASH FAIL {name}: engine (n,h)={mine} "
                      f"vs oracle {theirs}")
                failures += 1
            else:
                print(f"HASH PASS {name}: rows={mine[0]} [{dt:.1f}s]")
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
