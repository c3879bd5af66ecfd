"""Host-hash-sharded content store (the FetchActor's "network").

Stands in for HTTP: the reference's ``requests.Session.get``
(`/root/reference/src/webscraper/scrapers/content.py:84-109`) becomes a
lookup into host-sharded parquet written by synth.py.  Workers cache
only the shard files for the hosts they fetch (the crawl shuffles waves
by host, so each task touches ~1 shard) — an LRU of a few shards per
worker instead of the whole store, which is what keeps the design valid
when the store is 100 TB.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import pyarrow.parquet as pq

from ..functions.urlnorm import canonicalize_url, host_of
from ..synth import shard_of


class SiteStore:
    """Per-worker lazy shard cache. Create once per actor/worker (module
    cache below) — not per batch."""

    def __init__(self, world_dir: str, max_cached_shards: int = 8):
        with open(os.path.join(world_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.world_dir = world_dir
        self.n_shards = self.meta["n_shards"]
        self.max_cached = max_cached_shards
        self._cache: OrderedDict[int, dict[str, tuple[bytes, int]]] = OrderedDict()

    def _shard(self, host: str) -> dict[str, tuple[bytes, int]]:
        s = shard_of(host, self.n_shards)
        if s in self._cache:
            self._cache.move_to_end(s)
            return self._cache[s]
        path = os.path.join(self.world_dir, "site", f"site_{s:04d}.parquet")
        t = pq.read_table(path, columns=["url_canon", "body", "status"])
        d = {
            u: (b, st)
            for u, b, st in zip(
                t.column("url_canon").to_pylist(),
                t.column("body").to_pylist(),
                t.column("status").to_pylist(),
            )
        }
        self._cache[s] = d
        if len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return d

    def get(self, url: str, host: str | None = None,
            attempts: int | None = None) -> tuple[bytes | None, int]:
        """(body, status); (None, 404) for unknown URLs. ``attempts``
        accepted for FetchBackend signature compatibility (a store
        lookup has no retries). Host fallback uses urlnorm.host_of —
        the SAME key the write side shards by (hand-rolled netloc
        splitting mis-parses userinfo/IPv6/port forms)."""
        canon = canonicalize_url(url)
        h = host or host_of(canon)
        row = self._shard(h).get(canon)
        if row is None:
            return None, 404
        return row

    def get_canonical(self, url_canon: str, host: str) -> tuple[bytes | None, int]:
        """Fast path for already-canonical URLs (the decode stage's input
        is canonical by construction; re-canonicalizing 10^5+ image URLs
        costs seconds of pure regex work)."""
        row = self._shard(host).get(url_canon)
        if row is None:
            return None, 404
        return row


_STORES: dict[str, SiteStore] = {}


def worker_site_store(world_dir: str) -> SiteStore:
    """Process-level store cache: one SiteStore per worker, loaded shards
    reused across tasks/batches."""
    store = _STORES.get(world_dir)
    if store is None:
        store = _STORES[world_dir] = SiteStore(world_dir)
    return store
