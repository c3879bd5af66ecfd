"""Deterministic scale-up world: replicate an existing sf dir R times
with consistent key shifts, so the full query gate and bench can run
under real data pressure (≥10× rows per table, multi-block reads on
every path) without touching the read-only driver data.

Usage: python scripts/make_scale_world.py OUT_DIR [R] [SRC_DIR]
       (defaults: R=10, SRC=/root/testdata/sf0.1 → an sf1.0 stand-in)

Design (engine-vs-oracle correctness needs only internal consistency,
not the driver's generator — both sides read the same files):

* every integer key space shifts by ``replica × stride`` with the
  source's natural stride (custkey 15000, suppkey 1000, partkey
  20000, orderkey 150000, user_id 1500, event_id 100000, doc_id
  5000, vec_id 2000), keeping all FK joins valid and 1:1 with the
  base world's join topology;
* functionally-dependent names (c_name/s_name = 'Customer#%09d') are
  REGENERATED from the shifted key — replicated identical names would
  inflate the fuzzy-name join (q105) quadratically instead of
  linearly;
* document text: ~10% of docs per replica stay EXACT copies (a
  realistic dup rate that stresses the dedup paths superlinearly);
  the rest get one replica-tagged token appended (near-dup, not
  exact), n_chars recomputed;
* embeddings: replica 0 is the base; later replicas are rotated by a
  seeded ~25° mix with a deterministic gaussian (cosine-to-base ≈0.9
  < the 0.95 near-dup threshold), except the same 10% exact-copy ids
  which stay bit-identical (planted cross-replica near-dup pairs);
* nation/region copy unchanged (fixed dimensions);
* timestamps/dates/values copy unchanged — distributions replicate.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDES = {
    "c_custkey": 15_000,
    "o_custkey": 15_000,
    "s_suppkey": 1_000,
    "l_suppkey": 1_000,
    "p_partkey": 20_000,
    "l_partkey": 20_000,
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "user_id": 1_500,
    "event_id": 100_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

EXACT_COPY_MOD = 10  # id % 10 == 0 rows stay exact copies per replica


def _shift_keys(t: pa.Table, r: int) -> pa.Table:
    for name, stride in STRIDES.items():
        if name in t.schema.names:
            i = t.schema.get_field_index(name)
            col = pc.add(pc.cast(t.column(name), pa.int64()),
                         pa.scalar(r * stride, pa.int64()))
            t = t.set_column(i, name, col)
    return t


def _regen_name(t: pa.Table, key: str, col: str, prefix: str) -> pa.Table:
    ids = t.column(key).to_numpy(zero_copy_only=False)
    names = pa.array([f"{prefix}#{int(k):09d}" for k in ids],
                     pa.string())
    return t.set_column(t.schema.get_field_index(col), col, names)


def replicate_table(name: str, t: pa.Table, r: int) -> pa.Table:
    if name in ("nation", "region"):
        return t if r == 0 else None
    t = _shift_keys(t, r)
    if name == "customer":
        t = _regen_name(t, "c_custkey", "c_name", "Customer")
    elif name == "supplier":
        t = _regen_name(t, "s_suppkey", "s_name", "Supplier")
    elif name == "part" and r > 0:
        # distance-2 replica tag (doubled letter, pairwise levenshtein
        # 2 between replicas and 3 vs the base): without it, p_name
        # cliques inflate the within-1-edit fuzzy join (q105)
        # QUADRATICALLY instead of linearly with the replica count
        tag = chr(ord("a") + (r - 1) % 26) * 2
        names = pa.array(
            [None if v is None else f"{v} {tag}"
             for v in t.column("p_name").to_pylist()], pa.string())
        t = t.set_column(t.schema.get_field_index("p_name"),
                         "p_name", names)
    elif name == "documents" and r > 0:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out = []
        for k, tx in zip(ids, texts):
            if tx is None or (int(k) % EXACT_COPY_MOD) == 0:
                out.append(tx)
            else:
                out.append(f"{tx} rep{r}")
        tarr = pa.array(out, pa.string())
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         tarr)
        nch = pc.fill_null(pc.utf8_length(tarr), None)
        t = t.set_column(t.schema.get_field_index("n_chars"),
                         "n_chars", pc.cast(nch, pa.int64()))
    elif name == "embeddings" and r > 0:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        emb = t.column("embedding")
        vecs = emb.to_pylist()
        rng = np.random.default_rng(1_000_003 * r + 17)
        out = []
        for k, v in zip(ids, vecs):
            if v is None or (int(k) % EXACT_COPY_MOD) == 0:
                out.append(v)
                continue
            a = np.asarray(v, np.float64)
            g = rng.normal(size=a.shape)
            # jittered per-vector angle: a FIXED angle gives every
            # replica the same cosine-to-base up to the last ulp,
            # manufacturing exact near-ties that flip float-kernel
            # orderings between engine and oracle (q293 at sf1)
            ang = np.deg2rad(18.0 + 14.0 * rng.random())
            na = np.linalg.norm(a)
            if na == 0:
                out.append(v)
                continue
            g = g - (g @ a) / (na * na) * a
            ng = np.linalg.norm(g)
            if ng == 0:
                out.append(v)
                continue
            w = a * np.cos(ang) + (g / ng) * (na * np.sin(ang))
            out.append(w.astype(np.float32).tolist())
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array(out, pa.list_(pa.float32())))
    return t


def main() -> int:
    out_dir = sys.argv[1]
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for name in tables:
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        # strip pandas metadata so every replica concat is uniform
        base = base.replace_schema_metadata(None)
        reps = []
        for r in range(R):
            t = replicate_table(name, base, r)
            if t is not None:
                reps.append(t)
        full = pa.concat_tables(reps)
        pq.write_table(full, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=256 * 1024)
        print(f"{name}: {base.num_rows} × {len(reps)} → "
              f"{full.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
