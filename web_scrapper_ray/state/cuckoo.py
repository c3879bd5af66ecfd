"""Sharded cuckoo-filter URL-seen set (north-rule ST3).

Replaces the reference's in-process ``visited_urls``/``failed_urls``
sets (`/root/reference/src/webscraper/scrapers/base.py:69-70,195,199`)
with an approximate-membership structure that shards across an actor
pool ∝ cluster size: route ``hash64(url_canon) % n_shards`` → shard
actor → vectorized ``contains_or_add`` over the batch.  At test scale
the filter is sized so the false-positive probability is ~0 and an
exact ``groupby(url_canon).distinct`` oracle must agree.

Each shard is a plain numpy cuckoo table (buckets × 4 slots of uint16
fingerprints) wrapped in a Ray actor; snapshot/restore to ``.npz`` files
gives the per-wave checkpoint lineage.
"""

from __future__ import annotations

import hashlib

import numpy as np

_FP_MIX = np.uint64(0x5BD1E995)


def hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def hash64_batch(strings) -> np.ndarray:
    return np.fromiter(
        (hash64(s) for s in strings), dtype=np.uint64, count=len(strings)
    )


class CuckooFilter:
    """Single-shard cuckoo filter over uint64 item hashes."""

    def __init__(self, capacity: int = 1 << 16, bucket_size: int = 4, max_kicks: int = 500):
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.buckets = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(12345)

    def _fp_and_indices(self, hashes: np.ndarray):
        fps = ((hashes >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        fps[fps == 0] = 1  # 0 marks an empty slot
        mask = np.uint64(self.n_buckets - 1)
        i1 = (hashes & mask).astype(np.int64)
        i2 = ((hashes & mask) ^ (fps.astype(np.uint64) * _FP_MIX & mask)).astype(np.int64) & (
            self.n_buckets - 1
        )
        return fps, i1, i2

    def contains_or_add(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe; inserts misses. Returns a bool
        array: True = was already present. Duplicate hashes within the
        batch: first occurrence inserts, later ones report present."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        fps, i1, i2 = self._fp_and_indices(hashes)
        present = (self.buckets[i1] == fps[:, None]).any(axis=1) | (
            self.buckets[i2] == fps[:, None]
        ).any(axis=1)
        out = present.copy()
        batch_seen: set[int] = set()
        for k in np.nonzero(~present)[0]:
            h = int(hashes[k])
            if h in batch_seen:
                out[k] = True
                continue
            batch_seen.add(h)
            self._insert(int(fps[k]), int(i1[k]), int(i2[k]))
        return out

    def _insert(self, fp: int, i1: int, i2: int) -> None:
        for idx in (i1, i2):
            row = self.buckets[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # kick loop (partial-key cuckoo hashing)
        idx = i1 if self._rng.integers(0, 2) else i2
        cur = fp
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(0, self.bucket_size))
            cur, self.buckets[idx, slot] = int(self.buckets[idx, slot]), cur
            idx = (idx ^ int(np.uint64(cur) * _FP_MIX & np.uint64(self.n_buckets - 1))) & (
                self.n_buckets - 1
            )
            row = self.buckets[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return
        raise RuntimeError("cuckoo filter full — size shards for the frontier")

    def save(self, path: str) -> None:
        np.savez_compressed(path, buckets=self.buckets, count=self.count)

    @classmethod
    def load(cls, path: str, bucket_size: int = 4) -> "CuckooFilter":
        data = np.load(path)
        f = cls(capacity=data["buckets"].shape[0] * bucket_size, bucket_size=bucket_size)
        f.buckets = data["buckets"]
        f.count = int(data["count"])
        return f


def _make_shard_actor():
    import ray

    @ray.remote(num_cpus=0.1)
    class CuckooShard:
        def __init__(self, capacity: int):
            self.filter = CuckooFilter(capacity=capacity)

        def contains_or_add(self, hashes: np.ndarray) -> np.ndarray:
            return self.filter.contains_or_add(hashes)

        def snapshot(self, path: str) -> str:
            self.filter.save(path)
            return path

        def restore(self, path: str) -> int:
            self.filter = CuckooFilter.load(path)
            return self.filter.count

        def count(self) -> int:
            return self.filter.count

    return CuckooShard


class SeenSet:
    """Driver-side handle over the shard pool. Hash-routes batches and
    reassembles masks; usable from inside map_batches tasks too (the
    actor handles serialize into closures)."""

    def __init__(self, n_shards: int = 4, capacity_per_shard: int = 1 << 20):
        # 2 bytes/slot → 2 MiB per shard at the default: cheap headroom.
        # A small fixed capacity both inflates the 16-bit-fingerprint
        # false-positive rate (silently dropping never-seen URLs) and
        # hard-crashes ("cuckoo filter full") when a tier's frontier
        # outgrows it — size from CrawlConfig.seen_capacity_per_shard
        # for larger tiers.
        import ray  # session owned by the caller

        Shard = _make_shard_actor()
        self.n_shards = n_shards
        self.shards = [Shard.remote(capacity_per_shard) for _ in range(n_shards)]

    def contains_or_add_hashes(self, hashes: np.ndarray) -> np.ndarray:
        import ray

        hashes = np.asarray(hashes, dtype=np.uint64)
        # route on HIGH bits: the in-shard primary bucket index uses the
        # low bits (hash & (n_buckets-1)), so low-bit routing with a
        # power-of-two shard count would leave only 1/n_shards of each
        # shard's primary buckets addressable (capacity quartered)
        shard_ids = ((hashes >> np.uint64(32)) % np.uint64(self.n_shards)).astype(np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        futures, positions = [], []
        for s in range(self.n_shards):
            pos = np.nonzero(shard_ids == s)[0]
            if pos.size:
                futures.append(self.shards[s].contains_or_add.remote(hashes[pos]))
                positions.append(pos)
        for fut, pos in zip(ray.get(futures), positions):
            out[pos] = fut
        return out

    def contains_or_add(self, urls) -> np.ndarray:
        return self.contains_or_add_hashes(hash64_batch(urls))

    def snapshot(self, dir_path: str) -> list[str]:
        import os

        import ray

        os.makedirs(dir_path, exist_ok=True)
        return ray.get(
            [
                sh.snapshot.remote(os.path.join(dir_path, f"shard_{i:04d}.npz"))
                for i, sh in enumerate(self.shards)
            ]
        )

    def restore(self, dir_path: str) -> int:
        import os

        import ray

        return sum(
            ray.get(
                [
                    sh.restore.remote(os.path.join(dir_path, f"shard_{i:04d}.npz"))
                    for i, sh in enumerate(self.shards)
                ]
            )
        )

    def total_count(self) -> int:
        import ray

        return sum(ray.get([sh.count.remote() for sh in self.shards]))
