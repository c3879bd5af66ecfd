"""Wave-based distributed crawl driver (the engine's flagship pipeline).

Replaces the reference's sequential seed loop
(`/root/reference/src/webscraper/scrapers/base.py:173-216`) with an
iterative frontier engine: each pagination/detail hop is one wave; a
wave is one Ray Data pass

    read frontier segment (parquet, priority-ordered)
      → host-balanced, host-disjoint blocks (layout-level partitioning,
        no Ray shuffle — see _host_balanced_tables)
      → seen-filter (sharded cuckoo actors; seeds bypass the drop —
        the reference fetches duplicate config URLs twice, base.py:188-195)
      → fused fetch+parse per block, hosts interleaved on an
        earliest-ready heap (politeness actors + robots delay pace each
        host's fetch starts; waiting hosts never hold the worker)
      → write the wave's typed output rows to a parquet segment

The frontier/waves never live in driver memory — each wave's output is a
parquet segment and the next wave reads ``row_kind == 'frontier'`` rows
back with predicate pushdown.  Per-wave checkpoints (manifest JSON +
cuckoo shard snapshots) give mid-crawl resume with per-partition
lineage.  Finalization assembles the canonical crawl log / article
table (sorted by the reference's program-order keys) and runs the image
decode pipeline into a host-hash-partitioned parquet (Lance is named by
the north rule but not installed here — the sink keeps an identical
schema behind a format switch).

Pagination chains are inherently sequential per seed (page N+1's URL
comes from page N — content.py:351-456), so wave count ≈ max_pages+1;
all seeds, details and hosts progress in parallel within a wave.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..oracle import CONTENT_SELECTORS
from ..stages.crawl_stage import make_fetch_parse_fn
from ..state.cuckoo import SeenSet, hash64_batch
from ..state.politeness import PolitenessBoard
from ..synth import shard_of

# Bump when the wave-output / refs / articles layout OR the extraction
# semantics change: cached crawl dirs (ensure_tier_crawl memoization)
# are invalidated on mismatch.
FORMAT_VERSION = 6  # r3: RFC 9309 tying-group merge changes robots semantics
# + price/phone first-match + caption max-merge + magic-sniffed fmt


@dataclass
class CrawlConfig:
    world_dir: str
    out_dir: str
    selectors: dict = field(default_factory=lambda: dict(CONTENT_SELECTORS))
    opts: dict = field(default_factory=dict)  # max_pages, follow_next_page, ...
    seeds: Optional[list[str]] = None         # default: world seeds.parquet
    n_seen_shards: int = 4
    # per-shard cuckoo slots; size ≥ ~1.2× (expected frontier rows /
    # n_shards) — undersizing inflates the 16-bit-fingerprint false-
    # positive rate (never-seen URLs silently dropped) before crashing
    seen_capacity_per_shard: int = 1 << 20
    n_politeness_shards: int = 4
    politeness: bool = True
    images_partitions: int = 16
    run_ts: str = "2023-01-01T00:00:00"       # deterministic scraped_at stamp
    max_waves: int = 64
    # Fetch backend spec (sources/fetch.py): None → synthetic site
    # store; {"kind": "http", ...} → requests.Session with the
    # reference's retry policy + UA rotation (wired per worker).
    fetch_backend: Optional[dict] = None
    # O5 frontier scheduling (SURVEY.md §2.6). "program_order" = parity
    # mode: priority IS the reference program order (seed, page, dom).
    # "priority": rows are ordered by (seed priority desc, program
    # order) and each wave takes only the max_urls_per_wave head (the
    # minimal ready segment); the tail is deferred to the next wave's
    # frontier. Final outputs are identical either way (the canonical
    # log/articles are program-order sorted) PROVIDED the loop drains:
    # a small max_urls_per_wave inflates the wave count ~N/cap, and if
    # max_waves is hit with a non-empty frontier the undrained rows are
    # reported in counters["truncated_frontier_rows"] (not fetched).
    # What changes when it drains is only WHEN each URL is fetched —
    # the production lever for freshness/quotas.
    frontier_policy: str = "program_order"
    seed_priorities: Optional[dict] = None    # seed_index -> int (higher first)
    max_urls_per_wave: Optional[int] = None
    # Seen-set drop policy. The reference performs NO membership check
    # before fetching (base.py:188-195): duplicate seeds refetch their
    # whole chains. "per_seed" scopes the cuckoo key by seed_index, so
    # cross-seed duplicates refetch (reference parity) while a runaway
    # loop within one seed's expansion is still cut. "global" is the
    # production crawl policy (each canonical URL fetched once);
    # "off" registers but never drops.
    dedup_scope: str = "per_seed"
    # Speculative decode: each wave's newly-seen image urls are decoded
    # by background task LANES (≤ spec_decode_lanes concurrent, chained
    # per part so a part's waves stay ordered) WHILE later waves fetch.
    # Purely opportunistic: finalize reconciles exactly (decodes any
    # url the lanes didn't reach at FULL cluster width, attaches final
    # max-captions), so a crash, a slow lane or speculative_decode=False
    # all converge to identical output. Default OFF: on the synthetic
    # bench the interleaved waves are already CPU-saturated, so lanes
    # only add contention (measured +3 s/5 waves at 32 CPUs); the win
    # is IO-bound crawls — real HTTP fetch latency leaves workers idle
    # exactly where the lanes run.
    speculative_decode: bool = False
    spec_decode_lanes: Optional[int] = None   # default: cluster CPUs // 4


def _read_seeds(cfg: CrawlConfig) -> list[str]:
    if cfg.seeds is not None:
        return cfg.seeds
    t = pq.read_table(os.path.join(cfg.world_dir, "seeds.parquet"))
    return t.column("url").to_pylist()


def _frontier0(cfg: CrawlConfig, seeds: list[str], path: str) -> int:
    from ..functions.urlnorm import canonicalize_batch, host_of

    canon = canonicalize_batch(seeds)
    t = pa.table(
        {
            "kind": pa.array(["seed"] * len(seeds)),
            "seed_index": pa.array(range(len(seeds)), pa.int64()),
            "page_idx": pa.array([1] * len(seeds), pa.int64()),
            "sub_idx": pa.array([0] * len(seeds), pa.int64()),
            "url": pa.array(seeds),
            "url_canon": pa.array(canon),
            "host": pa.array([host_of(u) for u in canon]),
            "payload": pa.array([""] * len(seeds)),
        }
    )
    pq.write_table(t, path)
    return len(seeds)


def _wave_paths(cfg: CrawlConfig, k: int) -> dict:
    return {
        "frontier": os.path.join(cfg.out_dir, "frontier", f"wave_{k:03d}.parquet"),
        "wave_out": os.path.join(cfg.out_dir, "waves", f"wave_{k:03d}"),
        "cuckoo": os.path.join(cfg.out_dir, "checkpoints", f"cuckoo_{k:03d}"),
        "politeness": os.path.join(cfg.out_dir, "checkpoints", f"politeness_{k:03d}"),
        "manifest": os.path.join(cfg.out_dir, "checkpoints", f"wave_{k:03d}.json"),
    }


def _host_balanced_tables(table: pa.Table, n_bins: int) -> list[pa.Table]:
    """Split an Arrow table into ≤n_bins host-disjoint, size-balanced
    sub-tables (greedy longest-processing-time packing of whole hosts).
    Host-disjointness is what per-host ordering + politeness require."""
    import heapq

    hosts = table.column("host").to_pylist()
    by_host: dict[str, list[int]] = {}
    for i, h in enumerate(hosts):
        by_host.setdefault(h, []).append(i)
    heap = [(0, b) for b in range(min(n_bins, max(len(by_host), 1)))]
    heapq.heapify(heap)
    bins: dict[int, list[int]] = {b: [] for _, b in heap}
    for h, idxs in sorted(by_host.items(), key=lambda kv: -len(kv[1])):
        size, b = heapq.heappop(heap)
        bins[b].extend(idxs)
        heapq.heappush(heap, (size + len(idxs), b))
    return [
        table.take(pa.array(sorted(idxs), pa.int64()))
        for idxs in bins.values()
        if idxs
    ]


def _spec_decode_task(prev, world_dir: str, refs_file: str, tmp_dir: str,
                      wave_k: int, n_partitions: int,
                      backend_spec: dict | None = None) -> int:
    """Background decode of one wave×part refs slice. ``prev`` is the
    same lane's previous future — a pure ordering dependency so a
    part's waves never race on the already-decoded set. Idempotent
    (atomic rename; partial files from crashes are skipped here and
    reconciled at finalize)."""
    from ..sources.fetch import worker_backend
    from ..stages.decode import decode_urls

    refs = pq.read_table(refs_file, columns=["url_canon", "host"])
    done: set[str] = set()
    for f in glob.glob(os.path.join(tmp_dir, "wave_*.parquet")):
        try:
            done.update(pq.read_table(f, columns=["url_canon"])
                        .column("url_canon").to_pylist())
        except Exception:
            continue
    urls, hosts = [], []
    for u, h in zip(refs.column("url_canon").to_pylist(),
                    refs.column("host").to_pylist()):
        if u in done:
            continue
        done.add(u)
        urls.append(u)
        hosts.append(h)
    if not urls:
        return 0
    t = decode_urls(worker_backend(world_dir, backend_spec), urls, hosts, n_partitions)
    os.makedirs(tmp_dir, exist_ok=True)
    tmp = os.path.join(tmp_dir, f".wave_{wave_k:03d}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(tmp_dir, f"wave_{wave_k:03d}.parquet"))
    return t.num_rows


def _last_complete_wave(cfg: CrawlConfig) -> int:
    last = -1
    for f in sorted(glob.glob(os.path.join(cfg.out_dir, "checkpoints", "wave_*.json"))):
        try:
            with open(f) as fh:
                m = json.load(fh)
            if m.get("complete"):
                last = max(last, m["wave"])
        except Exception:
            continue
    return last


def run_crawl(cfg: CrawlConfig, resume: bool = False) -> dict:
    """Run (or resume) the crawl; returns paths + counters. Ray must be
    initialised by the caller."""
    import ray.data as rd

    for sub in ("frontier", "waves", "checkpoints", "out"):
        os.makedirs(os.path.join(cfg.out_dir, sub), exist_ok=True)

    if cfg.frontier_policy not in ("program_order", "priority"):
        raise ValueError(
            f"unknown frontier_policy: {cfg.frontier_policy!r} "
            "(expected 'program_order' or 'priority')")
    if cfg.dedup_scope not in ("per_seed", "global", "off"):
        raise ValueError(
            f"unknown dedup_scope: {cfg.dedup_scope!r} "
            "(expected 'per_seed', 'global' or 'off')")
    seeds = _read_seeds(cfg)
    opts = {"max_pages": 1, "follow_next_page": True, **cfg.opts}
    seen = SeenSet(n_shards=cfg.n_seen_shards,
                   capacity_per_shard=cfg.seen_capacity_per_shard)
    board = PolitenessBoard(cfg.n_politeness_shards) if cfg.politeness else None

    start_wave = 0
    resume_counters = None
    if resume:
        last = _last_complete_wave(cfg)
        if last >= 0:
            with open(_wave_paths(cfg, last)["manifest"]) as fh:
                manifest = json.load(fh)
            seen.restore(manifest["cuckoo_dir"])
            resume_metrics = manifest.get("metrics")
            resume_counters = manifest.get("counters")
            pol_dir = manifest.get("politeness_dir")
            if board is not None and pol_dir and os.path.isdir(pol_dir):
                board.restore(pol_dir)
            start_wave = last + 1
    if start_wave == 0:
        # fresh run into a reused out_dir: clear ALL wave state — a
        # previous run with different knobs (priority caps change the
        # wave count) would otherwise leave stale wave_NNN segments
        # that finalize's glob sweeps into the outputs
        for sub in ("refs", "images_tmp", "frontier", "waves", "checkpoints"):
            shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)
        for sub in ("frontier", "waves", "checkpoints"):
            os.makedirs(os.path.join(cfg.out_dir, sub), exist_ok=True)
        _frontier0(cfg, seeds, _wave_paths(cfg, 0)["frontier"])

    spec_remote = None
    spec_lanes: dict[int, object] = {}
    spec_all: list = []  # every submitted lane future (for cancel-all)
    n_lanes = 0
    if cfg.speculative_decode:
        import ray

        # lanes get a bounded slice of the cluster so waves keep their
        # cores; chained submission caps concurrency at n_lanes tasks
        n_lanes = cfg.spec_decode_lanes or max(
            2, int(ray.cluster_resources().get("CPU", 8)) // 4)
        spec_remote = ray.remote(num_cpus=1)(_spec_decode_task)

    from ..state.metrics import Metrics

    metrics = Metrics()
    if start_wave > 0 and resume_metrics:
        metrics.restore(resume_metrics)  # cumulative telemetry survives resume
    fetch_parse = make_fetch_parse_fn(
        cfg.world_dir, cfg.selectors, opts, seeds[0],
        board.shards if board else None,
        cfg.n_politeness_shards if board else 0,
        metrics_actor=metrics.actor,
        backend_spec=cfg.fetch_backend,
    )

    import time as _time

    debug_timing = bool(os.environ.get("WSR_TIMING"))
    counters = {"waves": 0, "fetches": 0, "records": 0}
    if start_wave > 0 and resume_counters:
        # cumulative counters ride the manifest exactly like metrics —
        # a resumed run must not report only its own waves
        counters.update(resume_counters)
    k = start_wave
    while k < cfg.max_waves:
        paths = _wave_paths(cfg, k)
        if not os.path.exists(paths["frontier"]):
            break
        frontier = pq.read_table(paths["frontier"])
        if frontier.num_rows == 0:
            break
        # a RE-run of this wave (crash before its manifest committed)
        # must not inherit artifacts of the prior attempt: with a
        # nondeterministic (HTTP) backend the re-run can emit a
        # different next-frontier (possibly empty → the write below is
        # skipped) or touch fewer refs parts, and resume/finalize sweep
        # whatever files exist — delete the stale ones up front
        stale_nxt = _wave_paths(cfg, k + 1)["frontier"]
        if os.path.exists(stale_nxt):
            os.remove(stale_nxt)
        for stale in glob.glob(os.path.join(cfg.out_dir, "refs", "part=*",
                                            f"wave_{k:03d}.parquet")):
            os.remove(stale)
        # ...and the speculative lanes' decode output for this wave: a
        # re-run may fetch different bytes, and finalize's reconcile
        # would otherwise reuse the crashed attempt's decodes
        for stale in glob.glob(os.path.join(cfg.out_dir, "images_tmp",
                                            "part=*", f"wave_{k:03d}.parquet")):
            os.remove(stale)
        # O5 frontier ordering: parity mode sorts by program order; in
        # priority mode a per-seed priority leads the sort key and the
        # wave takes only the minimal ready segment (max_urls_per_wave
        # head) — deferred rows rejoin the next wave's frontier. At
        # 10^10 scale the same policy selects which priority-ordered
        # frontier SEGMENTS a wave reads, rather than slicing one file.
        frontier = frontier.sort_by(
            [("seed_index", "ascending"), ("page_idx", "ascending"),
             ("sub_idx", "ascending")]
        )
        deferred = None
        if cfg.frontier_policy == "priority":
            prio = cfg.seed_priorities or {}
            pr = [int(prio.get(int(s), prio.get(str(s), 0)))
                  for s in frontier.column("seed_index").to_pylist()]
            frontier = frontier.append_column("priority", pa.array(pr, pa.int64()))
            frontier = frontier.sort_by(
                [("priority", "descending"), ("seed_index", "ascending"),
                 ("page_idx", "ascending"), ("sub_idx", "ascending")]
            )
            cap = cfg.max_urls_per_wave
            if cap and frontier.num_rows > cap:
                deferred = frontier.slice(cap).drop_columns(["priority"])
                frontier = frontier.slice(0, cap)
            frontier = frontier.drop_columns(["priority"])
        _t_wave = _time.time()

        # Host-partition the wave WITHOUT a Ray shuffle: the frontier
        # segment is tiny relative to the page/image volume, so the driver
        # packs whole hosts into ~size-balanced Arrow tables (one block
        # each) and the wave becomes read → N independent tasks → write.
        # (A Ray `repartition`+`groupby(host)` here measured ~6s of pure
        # coordination latency per wave regardless of cluster size, and
        # pure host-HASH partitioning left 8× size skew between blocks;
        # at 10^10-URL scale the same host-disjoint balanced layout comes
        # from writing frontier segments partitioned by host bucket.)
        tables = _host_balanced_tables(frontier, n_bins=96)
        ds = rd.from_arrow(tables)

        # seen-filter: register every canonical URL; drop repeats per policy
        # (seeds always bypass the drop — reference fetches dups twice).
        scope = cfg.dedup_scope

        def seen_filter(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            urls = batch.column("url_canon").to_pylist()
            if scope == "per_seed":
                sidx = batch.column("seed_index").to_pylist()
                keys = [f"{s}|{u}" for s, u in zip(sidx, urls)]
            else:
                keys = urls
            already = seen.contains_or_add_hashes(hash64_batch(keys))
            if scope == "off":
                return batch
            keep = (~already) | pc.equal(batch.column("kind"), "seed").to_numpy(
                zero_copy_only=False
            )
            return batch.filter(pa.array(keep))

        # batch_size=None → whole host-disjoint block per call, which the
        # politeness/ordering logic requires; the two map stages fuse into
        # one task per partition. max_retries=0: the fused task has a
        # NON-IDEMPOTENT side effect (cuckoo contains_or_add registers
        # the block's URLs), so a silent Ray system retry would see its
        # own registrations and drop every non-seed row as already-seen.
        # A worker death must instead fail the wave; run_crawl's
        # resume path restarts it from the pre-wave cuckoo snapshot,
        # which is consistent by construction.
        ds = ds.map_batches(seen_filter, batch_format="pyarrow", batch_size=None,
                            max_retries=0)
        out = ds.map_batches(fetch_parse, batch_format="pyarrow", batch_size=None,
                             max_retries=0)
        if os.path.exists(paths["wave_out"]):
            shutil.rmtree(paths["wave_out"])
        out.write_parquet(paths["wave_out"])
        _t_exec = _time.time()

        # next frontier + image refs from this wave's output: ONE
        # predicate-pushdown pass (row_kind ∈ {frontier, image_ref}),
        # split driver-side — log/record totals are tallied once in
        # finalize, no extra scans
        wave_ds = pads.dataset(paths["wave_out"])
        both = wave_ds.to_table(
            filter=pc.field("row_kind").isin(["frontier", "image_ref"]),
            columns=["row_kind", "kind", "seed_index", "page_idx", "sub_idx",
                     "url", "url_canon", "host", "payload", "caption"],
        )
        is_frontier = pc.equal(both.column("row_kind"), "frontier")
        nxt = both.filter(is_frontier).select(
            ["kind", "seed_index", "page_idx", "sub_idx", "url",
             "url_canon", "host", "payload"])
        counters["waves"] += 1
        if deferred is not None and deferred.num_rows:
            nxt = pa.concat_tables([nxt, deferred.select(nxt.column_names)])
        if nxt.num_rows:
            pq.write_table(nxt, _wave_paths(cfg, k + 1)["frontier"])
        # image refs: append this wave's slice into a host-hash-
        # partitioned layout (part id == decode/sink partition), so
        # finalize dedups + decodes each part INDEPENDENTLY — no global
        # shuffle and no driver-side materialization of the full ref set.
        # Per-wave driver handling of wave-sized metadata is the engine's
        # standing invariant (same as the frontier segment above);
        # overwriting wave-named files keeps resume idempotent.
        refs = both.filter(pc.invert(is_frontier)).select(
            ["url_canon", "host", "caption"])
        if refs.num_rows:
            host_part = {h: shard_of(h, cfg.images_partitions)
                         for h in set(refs.column("host").to_pylist())}
            parts = pa.array(
                [host_part[h] for h in refs.column("host").to_pylist()],
                pa.int32(),
            )
            for p in sorted(set(host_part.values())):
                sub = refs.filter(pc.equal(parts, p))
                d = os.path.join(cfg.out_dir, "refs", f"part={p}")
                os.makedirs(d, exist_ok=True)
                refs_file = os.path.join(d, f"wave_{k:03d}.parquet")
                pq.write_table(sub, refs_file)
                if spec_remote is not None:
                    # speculative decode lane (chained per lane so one
                    # part's waves stay ordered); runs while the NEXT
                    # waves fetch — see CrawlConfig.speculative_decode
                    lane = p % n_lanes
                    spec_lanes[lane] = spec_remote.remote(
                        spec_lanes.get(lane), cfg.world_dir, refs_file,
                        os.path.join(cfg.out_dir, "images_tmp", f"part={p}"),
                        k, cfg.images_partitions, cfg.fetch_backend,
                    )
                    spec_all.append(spec_lanes[lane])
        _t_nxt = _time.time()
        cuckoo_dir = paths["cuckoo"]
        seen.snapshot(cuckoo_dir)
        if board is not None:
            board.snapshot(paths["politeness"])
        if debug_timing:
            print(
                f"[wave {k}] rows={frontier.num_rows} "
                f"exec={_t_exec - _t_wave:.2f}s nxt={_t_nxt - _t_exec:.2f}s "
                f"snap={_time.time() - _t_nxt:.2f}s",
                flush=True,
            )
        manifest = {
            "wave": k, "complete": True, "cuckoo_dir": cuckoo_dir,
            "politeness_dir": paths["politeness"] if board is not None else None,
            "frontier_in": paths["frontier"], "wave_out": paths["wave_out"],
            "next_frontier_rows": nxt.num_rows, "counters": dict(counters),
            "metrics": metrics.snapshot(),
        }
        tmp = paths["manifest"] + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, paths["manifest"])
        if nxt.num_rows == 0:
            k += 1
            break
        k += 1

    if spec_all:
        # stop the lanes rather than wait: whatever they finished is in
        # images_tmp (atomic renames); finalize decodes the remainder at
        # FULL cluster width, so waiting on a few lanes only serializes.
        # EVERY submitted future is cancelled, not just each lane's tail
        # — cancelling only the pending tail would leave the running
        # predecessors decoding (and contending for CPU) through
        # finalize.
        import ray

        for fut in spec_all:
            ray.cancel(fut, force=False, recursive=False)
        for fut in spec_all:
            try:
                ray.get(fut)
            except Exception:
                pass

    # surface (never silently drop) any frontier left undrained because
    # the loop hit max_waves — possible in priority mode where a small
    # max_urls_per_wave inflates the wave count by ~N/cap
    leftover_path = _wave_paths(cfg, k)["frontier"]
    if k >= cfg.max_waves and os.path.exists(leftover_path):
        leftover = pq.read_metadata(leftover_path).num_rows
        if leftover:
            counters["truncated_frontier_rows"] = leftover

    result = finalize_crawl(cfg)
    counters["fetches"] = result["n_log"]
    counters["records"] = result["n_articles"]
    result["counters"] = counters
    return result


def ensure_tier_crawl(tier: str = "t1", out_root: str = "/tmp/wsr_crawl",
                      politeness: bool = True) -> dict:
    """Run (once; memoized on disk) the flagship crawl for a synthetic
    tier and return its output paths."""
    from .. import synth

    world = synth.ensure_world(tier)
    out = os.path.join(out_root, tier)
    marker = os.path.join(out, "out", "articles.parquet")
    fmt_marker = os.path.join(out, "out", "format.json")
    cfg = CrawlConfig(
        world_dir=world, out_dir=out,
        opts={"max_pages": synth.TIERS[tier].max_pages},
        politeness=politeness,
    )
    fmt_ok = False
    fmt: dict = {}
    if os.path.exists(fmt_marker):
        try:
            with open(fmt_marker) as fh:
                fmt = json.load(fh)
            # the memo must also bind to the WORLD content: a bumped
            # synth gen_version regenerates the world in place, and a
            # crawl built from the old bytes would silently poison
            # every parity comparison against the new world
            fmt_ok = (fmt.get("v") == FORMAT_VERSION
                      and fmt.get("world_key") == _world_key(world))
        except Exception:
            fmt_ok = False
    if os.path.exists(marker) and fmt_ok:
        res = finalize_paths(cfg)
        # same result shape as a fresh run for the count fields (the
        # wave-loop counters only exist on a fresh run)
        for k in ("n_images", "n_articles", "n_log"):
            if k in fmt:
                res[k] = fmt[k]
        return res
    shutil.rmtree(out, ignore_errors=True)  # stale layout → full re-run
    return run_crawl(cfg)


def _world_key(world_dir: str) -> str:
    """The synth world's content key (meta.json cache_key; '' when the
    world has no meta — e.g. hand-built test worlds)."""
    try:
        with open(os.path.join(world_dir, "meta.json")) as fh:
            return json.load(fh).get("cache_key", "")
    except Exception:
        return ""


def finalize_paths(cfg: CrawlConfig) -> dict:
    out_dir = os.path.join(cfg.out_dir, "out")
    return {
        "out_dir": out_dir,
        "crawl_log": os.path.join(out_dir, "crawl_log.parquet"),
        "seed_outcomes": os.path.join(out_dir, "seed_outcomes.parquet"),
        "articles": os.path.join(out_dir, "articles.parquet"),
        "images_dir": os.path.join(out_dir, "images"),
    }


def finalize_crawl(cfg: CrawlConfig) -> dict:
    """Assemble canonical outputs from wave segments (idempotent)."""
    import time as _time

    import ray.data as rd

    _dbg = bool(os.environ.get("WSR_TIMING"))
    t0 = _time.time()
    _marks = [("start", t0)]
    _meta_marks = [("start", t0)]  # meta thread's own list (no interleave)

    def _mark(name: str) -> None:
        _marks.append((name, _time.time()))

    def _meta_mark(name: str) -> None:
        _meta_marks.append((name, _time.time()))

    wave_files = sorted(
        glob.glob(os.path.join(cfg.out_dir, "waves", "wave_*", "*.parquet"))
    )
    out_dir = os.path.join(cfg.out_dir, "out")
    # a previous finalize's memo marker must not survive into the window
    # where this re-finalize is mutating the outputs in place — a crash
    # mid-write would otherwise leave a still-valid format.json over
    # torn/missing files; the marker is rewritten at the very end
    fmt_marker = os.path.join(out_dir, "format.json")
    if os.path.exists(fmt_marker):
        os.remove(fmt_marker)
    all_ds = pads.dataset(wave_files)

    n_log = 0
    n_articles = 0
    meta_err: list[BaseException] = []

    def assemble_metadata() -> None:
        """Driver-side assembly of the metadata-sized outputs (crawl log,
        seed outcomes, typed articles). Runs on a thread CONCURRENTLY
        with the decode fan-out below — Arrow's parquet/sort kernels
        release the GIL, and decode's wall time is worker-side waiting,
        so the two genuinely overlap."""
        nonlocal n_log, n_articles
        try:
            # canonical crawl log — program-order sort over the sequence keys
            log = all_ds.to_table(
                filter=pc.equal(pc.field("row_kind"), "log"),
                columns=["seed_index", "page_idx", "sub_idx", "url_canon",
                         "outcome", "fetch_ts"],
            ).sort_by([("seed_index", "ascending"), ("page_idx", "ascending"),
                       ("sub_idx", "ascending")])
            log = log.add_column(0, "fetch_seq",
                                 pa.array(range(log.num_rows), pa.int64()))
            pq.write_table(log, os.path.join(out_dir, "crawl_log.parquet"))
            n_log = log.num_rows
            _meta_mark("log")

            # seed outcomes (visited_urls / failed_urls of base.py:195,199)
            seeds_t = all_ds.to_table(
                filter=pc.equal(pc.field("row_kind"), "seed_outcome"),
                columns=["seed_index", "url", "outcome"],
            ).sort_by([("seed_index", "ascending")])
            pq.write_table(seeds_t, os.path.join(out_dir, "seed_outcomes.parquet"))
            _meta_mark("seeds")

            # article records: the wave output already carries TYPED
            # columns (crawl_stage OUT_SCHEMA), so this is a column
            # projection + program-order sort — no per-row JSON decode.
            # Metadata-sized; at larger scale becomes a Ray sort+write.
            rec = all_ds.to_table(
                filter=pc.equal(pc.field("row_kind"), "record"),
                columns=["seed_index", "page_idx", "sub_idx", "title", "url",
                         "date", "author", "excerpt", "content", "image",
                         "images", "categories", "keywords", "metadata_json"],
            ).sort_by([("seed_index", "ascending"), ("page_idx", "ascending"),
                       ("sub_idx", "ascending")])
            articles = rec.append_column(
                "scraped_at", pa.array([cfg.run_ts] * rec.num_rows, pa.string())
            )
            pq.write_table(articles, os.path.join(out_dir, "articles.parquet"))
            n_articles = articles.num_rows
            _meta_mark("records")
        except BaseException as e:  # surfaced after join
            meta_err.append(e)

    import threading

    meta_thread = threading.Thread(target=assemble_metadata, daemon=True)
    meta_thread.start()

    # image refs were written host-hash-partitioned per wave (see the
    # wave loop): refs/part=P/wave_k.parquet, with P == the decode/sink
    # partition. Each part is deduped (max-caption per url) + decoded in
    # ONE independent task — dup urls share a host, hosts share a part,
    # so per-part dedup IS global dedup, with zero shuffle and no
    # driver-side ref materialization.
    refs_root = os.path.join(cfg.out_dir, "refs")
    part_dirs = sorted(glob.glob(os.path.join(refs_root, "part=*")))
    images_out = os.path.join(out_dir, "images")
    if os.path.exists(images_out):
        shutil.rmtree(images_out)
    n_images = 0
    if part_dirs:
        from ..sources.fetch import worker_backend
        from ..stages.decode import decode_urls

        world_dir = cfg.world_dir
        backend_spec = cfg.fetch_backend
        n_parts = cfg.images_partitions
        tmp_root = os.path.join(cfg.out_dir, "images_tmp")

        def decode_part(batch: pa.Table) -> pa.Table:
            outs = []
            for pdir in batch.column("part_dir").to_pylist():
                t = pads.dataset(pdir).to_table()
                if t.num_rows == 0 or "url_canon" not in t.column_names:
                    # a crashed attempt's stale refs were swept, leaving
                    # an empty part dir (0-column table) — nothing to do
                    continue
                # max-caption per url via sort + keep-last boundary mask
                t = t.sort_by([("url_canon", "ascending"), ("caption", "ascending")])
                t = t.combine_chunks()
                urls_arr = t.column("url_canon").combine_chunks()
                if t.num_rows > 1:
                    keep = pc.not_equal(urls_arr.slice(0, t.num_rows - 1),
                                        urls_arr.slice(1)).to_pylist() + [True]
                    t = t.filter(pa.array(keep))
                captions = dict(zip(t.column("url_canon").to_pylist(),
                                    t.column("caption").to_pylist()))
                # reconcile with the speculative lanes' output: rows
                # already decoded during the crawl are reused; whatever
                # the lanes didn't reach is decoded here (exactness does
                # not depend on the lanes at all)
                part_id = pdir.rsplit("part=", 1)[1]
                tmp_dir = os.path.join(tmp_root, f"part={part_id}")
                done: dict[str, int] = {}
                decoded: list[pa.Table] = []
                for f in sorted(glob.glob(os.path.join(tmp_dir, "wave_*.parquet"))):
                    try:
                        tab = pq.read_table(f)
                    except Exception:
                        continue  # partial file from a crash
                    mask = []
                    for u in tab.column("url_canon").to_pylist():
                        fresh = u in captions and u not in done
                        mask.append(fresh)
                        if fresh:
                            done[u] = 1
                    decoded.append(tab.filter(pa.array(mask)))
                missing = t.filter(pa.array(
                    [u not in done for u in t.column("url_canon").to_pylist()]
                ))
                if missing.num_rows:
                    missing = missing.sort_by("host")  # shard-cache locality
                    decoded.append(decode_urls(
                        worker_backend(world_dir, backend_spec),
                        missing.column("url_canon").to_pylist(),
                        missing.column("host").to_pylist(), n_parts))
                full = pa.concat_tables(decoded) if decoded else decode_urls(
                    worker_backend(world_dir, backend_spec), [], [], n_parts)
                caps = pa.array(
                    [captions.get(u) or "" for u in
                     full.column("url_canon").to_pylist()], pa.string())
                outs.append(full.drop_columns(["url_canon"]).add_column(
                    5, "caption", caps))
            if not outs:
                # every part dir in this batch was an empty swept leftover
                # — emit the typed empty decode schema, not concat([])
                empty = decode_urls(
                    worker_backend(world_dir, backend_spec), [], [], n_parts)
                outs.append(empty.drop_columns(["url_canon"]).add_column(
                    5, "caption", pa.array([], pa.string())))
            return pa.concat_tables(outs)

        parts_ds = rd.from_items(
            [{"part_dir": d} for d in part_dirs],
            override_num_blocks=len(part_dirs),
        )
        images = parts_ds.map_batches(
            decode_part, batch_format="pyarrow", batch_size=None
        )
        _mark("dedup_split")
        images.write_parquet(images_out, partition_cols=["part"])
        _mark("decode_write")
        n_images = pads.dataset(images_out, partitioning="hive").count_rows()
        _mark("count")

    meta_thread.join()
    if meta_err:
        raise meta_err[0]
    with open(os.path.join(out_dir, "format.json"), "w") as fh:
        json.dump({"v": FORMAT_VERSION, "world_key": _world_key(cfg.world_dir),
                   "n_images": n_images, "n_articles": n_articles,
                   "n_log": n_log}, fh)
    if _dbg:
        # two independent mark lists (meta assembly runs on its own
        # thread) — interleaving them would garble the adjacent diffs
        def fmt_marks(tag, marks):
            return f"[finalize {tag}] " + " ".join(
                f"{n}={t2 - t1:.2f}s"
                for (_, t1), (n, t2) in zip(marks, marks[1:]))
        print(fmt_marks("decode", _marks), flush=True)
        print(fmt_marks("meta", _meta_marks), flush=True)
    return {
        "out_dir": out_dir,
        "crawl_log": os.path.join(out_dir, "crawl_log.parquet"),
        "seed_outcomes": os.path.join(out_dir, "seed_outcomes.parquet"),
        "articles": os.path.join(out_dir, "articles.parquet"),
        "images_dir": images_out,
        "n_images": n_images,
        "n_articles": n_articles,
        "n_log": n_log,
    }
