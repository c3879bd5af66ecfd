"""Image fetch+decode+phash stage → the north-rule images table.

Input: deduped image refs ``(url_canon, host, caption)``; output rows in
IMAGES_SCHEMA plus a ``part`` column (hash-range of host) used to
partition the sink and bound write skew (north rule).

Stateful pieces (content-store shard cache) live per worker via
``worker_site_store``; the callable-class form makes this an actor-pool
stage (``map_batches(DecodeImages, concurrency=N)``).  Batches are
Arrow; pixels are decoded with the pure-numpy codecs (codecs.py — the
Pillow-backed real JPEG decode is the stubbed path).
"""

from __future__ import annotations

import pyarrow as pa

from .. import codecs
from ..sources.site_store import worker_site_store
from ..synth import shard_of


def make_decode_fn(world_dir: str, n_partitions: int = 16):
    """Stateless-task variant: the only state (content-store shard cache)
    is process-level via ``worker_site_store``, so plain tasks amortize it
    exactly like an actor pool without pool-startup latency."""

    def decode(batch: pa.Table) -> pa.Table:
        return _decode_batch(worker_site_store(world_dir), batch, n_partitions)

    return decode


class DecodeImages:
    def __init__(self, world_dir: str, n_partitions: int = 16):
        self.store = worker_site_store(world_dir)
        self.n_partitions = n_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _decode_batch(self.store, batch, self.n_partitions)


def _decode_batch(store, batch: pa.Table, n_partitions: int) -> pa.Table:
        urls = batch.column("url_canon").to_pylist()
        hosts = batch.column("host").to_pylist()
        captions = batch.column("caption").to_pylist()
        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "part")}
        for url, host, caption in zip(urls, hosts, captions):
            body, status = store.get_canonical(url, host)
            if body is None or status >= 400:
                continue
            try:
                pixels = codecs.decode_image(body)
            except ValueError:
                continue
            name = url.rsplit("/", 1)[-1]
            image_id, _, ext = name.rpartition(".")
            out["image_id"].append(image_id or name)
            out["bytes"].append(body)
            out["w"].append(pixels.shape[1])
            out["h"].append(pixels.shape[0])
            out["fmt"].append("png" if ext == "png" else "jpeg")
            out["caption"].append(caption or "")
            out["phash"].append(codecs.phash64(pixels))
            out["part"].append(shard_of(host, n_partitions))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "caption": pa.array(out["caption"], pa.string()),
                "phash": pa.array(out["phash"], pa.int64()),
                "part": pa.array(out["part"], pa.int32()),
            }
        )
