"""Image fetch+decode+phash stage → the north-rule images table.

Core: :func:`decode_urls` — canonical image URLs (+ their hosts) in,
rows of ``(url_canon, image_id, bytes, w, h, fmt, phash, part)`` out,
``part`` = hash-range of host (partitions the sink and bounds write
skew, north rule). Captions are attached by the caller (the max-caption
rule is a cross-wave reduction over refs, resolved at finalize).

Backend state (content-store shard cache / HTTP session pool) is per
worker via ``sources.fetch.worker_backend`` — plain tasks amortize it
exactly like an actor pool without pool-startup latency; decode is used
both as per-partition finalize tasks and as the speculative background
lanes that overlap the crawl waves (pipelines/crawl.py).
"""

from __future__ import annotations

import pyarrow as pa

from .. import codecs
from ..synth import shard_of


def decode_urls(store, urls: list[str], hosts: list[str],
                n_partitions: int = 16) -> pa.Table:
    """Fetch+decode+phash each canonical URL. ``store`` is any
    FetchBackend with ``get_canonical`` (synthetic site store or real
    HTTP — sources/fetch.py), so image bytes come from the SAME network
    the crawl used. Rows for failures (404 / undecodable) are simply
    absent, matching the crawl's failed-fetch semantics."""
    out = {k: [] for k in ("url_canon", "image_id", "bytes", "w", "h",
                           "fmt", "phash", "part")}
    for url, host in zip(urls, hosts):
        body, status = store.get_canonical(url, host)
        if body is None or status >= 400:
            continue
        try:
            pixels = codecs.decode_image(body)
        except ValueError:
            continue
        name = url.rsplit("/", 1)[-1]
        image_id, _, ext = name.rpartition(".")
        out["url_canon"].append(url)
        out["image_id"].append(image_id or name)
        out["bytes"].append(body)
        out["w"].append(pixels.shape[1])
        out["h"].append(pixels.shape[0])
        out["fmt"].append(codecs.sniff_format(body, ext))
        out["phash"].append(codecs.phash64(pixels))
        out["part"].append(shard_of(host, n_partitions))
    return pa.table(
        {
            "url_canon": pa.array(out["url_canon"], pa.string()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64()),
            "part": pa.array(out["part"], pa.int32()),
        }
    )
