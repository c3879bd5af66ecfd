"""Degenerate-input stand-in for the parity gate: copy a world and
TRUNCATE chosen tables to zero rows (schema preserved). A fully-empty
table is the boundary every distributed query hits in real pipelines
(a day with no events, a source with no documents) — Ray hands
zero-block Datasets to the driver COLUMN-LESS, SQL's ungrouped
aggregates still emit one row, and nullable-dtype contracts flip, so
this sweep catches the empty-contract class the value-fuzz world
cannot.

Usage: python scripts/make_degenerate_world.py OUT table [table ...]
       python scripts/check_queries.py OUT
(source world defaults to /tmp/wsr_fuzz; pass SRC=dir env to change)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq


def build(out_dir: str, empty_tables: list[str],
          src: str | None = None) -> None:
    src = src or os.environ.get("SRC", "/tmp/wsr_fuzz")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.copytree(src, out_dir)
    for t in empty_tables:
        p = os.path.join(out_dir, f"{t}.parquet")
        tab = pq.read_table(p)
        pq.write_table(tab.slice(0, 0), p)
        print(f"{t}: 0 rows (schema kept)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    build(sys.argv[1], sys.argv[2:])
