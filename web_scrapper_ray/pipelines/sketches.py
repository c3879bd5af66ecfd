"""Distributed sketches (SURVEY.md §2.5 "novel sketch" slot).

HyperLogLog distinct-count over a Ray Data custom ``AggregateFn``: each
block folds into a 2^p-register accumulator (vectorized ``maximum.at``),
Ray tree-merges accumulators across blocks (elementwise max — the
fixed-size sketch, not the data, crosses the wire), and ``finalize``
applies the classic bias/small-range corrections. At any corpus size the
shuffle payload is 2^p bytes per block — there is no driver-side scan
and no groupby materialization.

Hashing is ``mix64`` (pipelines/pairs.py) — deterministic across
workers/runs, unlike Python's per-process-salted ``hash()``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .pairs import mix64

_P = 14                      # 2^14 = 16384 registers → ~0.8% typical error
_M = 1 << _P
_Q = 64 - _P


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0) via binary search —
    float log2 would misround near 2^53."""
    w = w.copy()
    bl = np.zeros(w.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        w[m] >>= np.uint64(s)
    return bl + (w != 0)


def hll_accumulate(regs: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Fold int64 keys into the register array (mutates + returns)."""
    h = mix64(keys.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(_Q)).astype(np.int64)
    w = h & np.uint64((1 << _Q) - 1)
    rho = (_Q - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if est <= 2.5 * _M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = _M * math.log(_M / zeros)
    return float(est)


def q_distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) over events via HLL(p=14).
    Deterministic (fixed hash), ~0.8% typical relative error — pinned by
    the error-bound pytest rather than a SQL oracle (a sketch can't
    value-match ``count(DISTINCT ...)``)."""
    import os

    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])

    def acc_block(regs: np.ndarray, block: pa.Table) -> np.ndarray:
        keys = block.column("user_id").to_numpy(zero_copy_only=False)
        return hll_accumulate(regs, keys)

    agg = AggregateFn(
        init=lambda _: np.zeros(_M, np.uint8),
        merge=np.maximum,
        accumulate_block=acc_block,
        finalize=lambda regs: int(round(hll_estimate(regs))),
        name="n_users_hll",
    )
    row = ds.aggregate(agg)
    return pd.DataFrame({"n_users_hll": [int(row["n_users_hll"])]})
