"""Fused per-host fetch+parse stage (the crawl engine's hot loop).

One crawl wave arrives as host-hash-disjoint blocks (partitioned at the
frontier layer — see pipelines/crawl.py); each block runs through
:func:`make_fetch_parse_fn`'s closure inside ``map_batches`` (Arrow in,
Arrow out): per host (sequentially, in host order): politeness-reserve →
fetch pages in program order → parse immediately (HTML bodies never
leave the task — at 100 TB the raw page bytes are the dominant volume,
so parse-at-fetch avoids shipping them through the object store) → emit
typed output rows in :data:`OUT_SCHEMA`:

=============  =========================================================
row_kind       meaning
=============  =========================================================
``record``     a final article record — TYPED columns (title/url/date/
               author/excerpt/content/image + list columns images/
               categories/keywords + metadata_json), already
               transformed+validated per reference T5/T6 semantics, so
               finalize assembles articles.parquet with a column
               projection instead of a per-row JSON decode
``log``        one fetch attempt (ordering keys seed_index/page_idx/
               sub_idx reproduce the reference's program order —
               base.py:188 seed order, content.py:146 DOM order,
               content.py:177-227 pagination chain)
``seed_outcome``  raw seed URL → visited|failed (base.py:195,199)
``frontier``   next-wave input (kind=detail|next); ``payload`` JSON is
               used ONLY here, for the transient listing state a detail
               fetch needs (content.py:153-170 merge semantics)
``image_ref``  (image url, caption alt) pair for the decode pipeline
=============  =========================================================

Orchestration parity notes vs the reference ContentScraper:
* detail fetch failure keeps the listing record (content.py:166-172);
* pagination only starts when page 1 yielded ≥1 url-bearing entry
  (content.py:177) and continues while entries exist (content.py:190);
* ``next`` pages are parsed as listings without the is_article check;
* detail pages are parsed with base_url = the listing-extracted URL.
"""

from __future__ import annotations

import json
import time

import pyarrow as pa

from .. import extract
from ..functions.urlnorm import canonicalize_url, host_of
from ..minidom import parse_html
from ..oracle import collect_image_caption_pairs
from ..sources.fetch import worker_backend
from ..state.cuckoo import hash64
from ..state.politeness import parse_robots_rules, robots_allowed

OUT_SCHEMA = pa.schema([
    ("row_kind", pa.string()),
    ("kind", pa.string()),
    ("seed_index", pa.int64()),
    ("page_idx", pa.int64()),
    ("sub_idx", pa.int64()),
    ("url", pa.string()),
    ("url_canon", pa.string()),
    ("host", pa.string()),
    ("payload", pa.string()),
    ("caption", pa.string()),
    ("outcome", pa.string()),
    ("fetch_ts", pa.float64()),
    # typed record fields (null on non-record rows)
    ("title", pa.string()),
    ("date", pa.string()),
    ("author", pa.string()),
    ("excerpt", pa.string()),
    ("content", pa.string()),
    ("image", pa.string()),
    ("images", pa.list_(pa.string())),
    ("categories", pa.list_(pa.string())),
    ("keywords", pa.list_(pa.string())),
    ("metadata_json", pa.string()),
])


def _row(row_kind, *, kind="", seed_index=-1, page_idx=-1, sub_idx=-1, url="",
         url_canon="", host="", payload="", caption="", outcome="", fetch_ts=0.0):
    return {
        "row_kind": row_kind, "kind": kind, "seed_index": int(seed_index),
        "page_idx": int(page_idx), "sub_idx": int(sub_idx), "url": url,
        "url_canon": url_canon, "host": host, "payload": payload,
        "caption": caption, "outcome": outcome, "fetch_ts": float(fetch_ts),
    }


def _record_row(rec: dict, *, seed_index: int, page_idx: int, sub_idx: int,
                host: str) -> dict:
    r = _row("record", seed_index=seed_index, page_idx=page_idx,
             sub_idx=sub_idx, host=host, url=rec.get("url") or "")
    r.update(
        title=rec.get("title"), date=rec.get("date"), author=rec.get("author"),
        excerpt=rec.get("excerpt"), content=rec.get("content"),
        image=rec.get("image"), images=rec.get("images") or [],
        categories=rec.get("categories") or [],
        keywords=rec.get("keywords") or [],
        metadata_json=json.dumps(rec.get("metadata") or {}, sort_keys=True),
    )
    return r


def empty_out_table() -> pa.Table:
    return OUT_SCHEMA.empty_table()



def _merge_caption_pairs(pairs: dict, new_pairs) -> None:
    """Merge (src, alt) pairs keeping the MAX alt per src —
    oracle_images_table takes max() over every pair on a page, so an
    intra-page duplicate src with differing alts must not collapse to
    last-wins."""
    for src, alt in new_pairs:
        cur = pairs.get(src)
        pairs[src] = alt if cur is None else max(cur, alt)


def _caption_pairs_map(pairs_iter) -> dict[str, str]:
    out: dict[str, str] = {}
    _merge_caption_pairs(out, pairs_iter)
    return out


def _image_refs_for_record(rec: dict, pairs: dict[str, str], feat_caption: str,
                           out: list[dict], seed_index: int) -> None:
    urls = []
    if rec.get("image"):
        urls.append(rec["image"])
    urls.extend(rec.get("images") or [])
    for u in urls:
        if not u or u.startswith("data:"):
            continue
        canon = canonicalize_url(u)
        fallback = feat_caption if u == rec.get("image") else ""
        out.append(
            _row(
                "image_ref",
                url_canon=canon,
                host=host_of(canon),
                caption=pairs.get(canon, fallback),
                seed_index=seed_index,
            )
        )


def make_fetch_parse_fn(world_dir: str, selectors: dict, opts: dict,
                        first_seed_url: str, politeness_shards: list | None,
                        n_politeness_shards: int = 0, metrics_actor=None,
                        backend_spec: dict | None = None):
    """Build the map_batches callable. ``politeness_shards`` /
    ``metrics_actor`` are actor handles (closure-captured; serialized
    into the tasks). ``backend_spec`` selects the fetch backend
    (sources/fetch.py): None → synthetic site store; {"kind": "http",
    ...} → real requests.Session with the reference retry/UA policy."""
    max_pages = opts.get("max_pages", 1)
    follow_next = opts.get("follow_next_page", True)

    def fetch_parse(batch: pa.Table) -> pa.Table:
        """Process a host-hash partition: hosts are disjoint across
        partitions, so per-host ordering + politeness hold. Hosts within
        a partition are INTERLEAVED on an earliest-ready heap: while one
        host waits out its crawl-delay, the task fetches+parses other
        hosts' pages — politeness latency overlaps compute instead of
        holding the worker (the SURVEY §7.4 "politeness vs throughput"
        lever). Per-host program order is untouched (one cursor per
        host); zero-delay hosts degrade to the old sequential order.
        Arrow in → Arrow out; the per-page row loop is inherent
        (fetch+parse is per-page), but no pandas frame is ever built."""
        import heapq

        if batch.num_rows == 0:
            return empty_out_table()
        out: list[dict] = []
        batch = batch.sort_by([
            ("host", "ascending"), ("seed_index", "ascending"),
            ("page_idx", "ascending"), ("sub_idx", "ascending"),
        ])
        cols = {
            name: batch.column(name).to_pylist()
            for name in ("host", "kind", "url", "seed_index", "page_idx",
                         "sub_idx", "payload")
        }
        hosts = cols["host"]
        states = []
        start = 0
        for i in range(1, len(hosts) + 1):
            if i == len(hosts) or hosts[i] != hosts[start]:
                states.append(_init_host(hosts[start], start, i,
                                         cols["url"][start]))
                start = i
        heap = [(st["ready"], gi) for gi, st in enumerate(states)]
        heapq.heapify(heap)
        while heap:
            ready, gi = heapq.heappop(heap)
            now = time.time()
            if ready > now:
                # heap min → NO host is ready; the unavoidable residue
                time.sleep(ready - now)
            st = states[gi]
            _process_row(st, cols, out)
            st["idx"] += 1
            if st["idx"] < st["hi"]:
                heapq.heappush(heap, (st["ready"], gi))
            elif st["shard"] is not None and st["delay"] > 0:
                # actual starts may have drifted past the reservation
                # (slow parses); push next_allowed so the next wave
                # keeps the gap
                st["shard"].advance.remote(st["host"], st["last_start"] + st["delay"])
        if metrics_actor is not None:
            tally: dict[str, int] = {}
            for r in out:
                if r["row_kind"] == "log":
                    tally[r["outcome"]] = tally.get(r["outcome"], 0) + 1
                elif r["row_kind"] in ("record", "frontier", "image_ref"):
                    tally[r["row_kind"]] = tally.get(r["row_kind"], 0) + 1
            metrics_actor.add.remote(tally)  # fire-and-forget, 1 msg/task
        if not out:
            return empty_out_table()
        return pa.Table.from_pylist(out, schema=OUT_SCHEMA)

    def _init_host(host: str, lo: int, hi: int, first_url: str = "") -> dict:
        import ray

        store = worker_backend(world_dir, backend_spec)

        # -- politeness: robots crawl-delay + cross-wave reservation ------
        delay_s = 0.0
        rules: list = []
        shard = None
        t0 = time.time()
        if politeness_shards:
            # robots are cached per backend instance (= per worker): one
            # fetch per host per worker for the whole crawl, and the
            # probe uses attempts=1 — a robots 404 is definitive and
            # must not burn the HTTP retry backoff every wave
            cache = getattr(store, "_robots_cache", None)
            if cache is None:
                cache = store._robots_cache = {}
            if host in cache:
                delay_s, rules = cache[host]
            else:
                # probe with the scheme the host is actually crawled
                # under — a hardcoded http:// silently loses all rules
                # on https-only hosts
                scheme = first_url.split("://", 1)[0] if "://" in first_url \
                    else "http"
                robots_body, _ = store.get(f"{scheme}://{host}/robots.txt",
                                           host, attempts=1)
                delay_s, rules = parse_robots_rules(robots_body)
                cache[host] = (delay_s, rules)
            shard = politeness_shards[hash64(host) % n_politeness_shards]
            t0 = ray.get(shard.reserve.remote(host, hi - lo, delay_s))
        # Disallow enforcement is opt-in (opts["respect_disallow"]): the
        # reference never reads robots.txt at all, so parity mode must
        # fetch everything; a production crawl flips the flag and gets
        # the full RFC 9309 matcher (Allow/Disallow, * and $ wildcards,
        # longest-match precedence).
        if not opts.get("respect_disallow"):
            rules = []
        return {
            "host": host, "idx": lo, "hi": hi, "store": store,
            "delay": delay_s, "rules": rules, "shard": shard,
            "t0": t0, "fetch_i": 0, "last_start": t0 - delay_s,
            "ready": t0 if delay_s > 0 else 0.0,
        }

    def _process_row(st: dict, cols: dict, out: list) -> None:
        host, store = st["host"], st["store"]
        ri = st["idx"]
        kind, url = cols["kind"][ri], cols["url"][ri]
        seed_i = int(cols["seed_index"][ri])
        page_i = int(cols["page_idx"][ri])
        sub_i = int(cols["sub_idx"][ri])
        def _listing_only_record() -> None:
            # the listing payload survives a blocked/failed detail fetch
            # (reference content.py:166-172 swallows the error) — emit
            # the listing-only record exactly like the failed-fetch path
            listing = json.loads(cols["payload"][ri])
            pairs = dict(json.loads(listing.pop("_pairs", None) or "{}"))
            feat_caption = listing.pop("_feat_caption", "")
            listing.pop("fetch_full", None)
            rec = extract.transform_article(listing, first_seed_url)
            rec = extract.validate_article(rec) if rec else None
            if rec:
                out.append(_record_row(rec, seed_index=seed_i,
                                       page_idx=page_i, sub_idx=sub_i,
                                       host=host))
                _image_refs_for_record(rec, pairs, feat_caption, out, seed_i)

        if st["rules"]:
            from urllib.parse import urlsplit

            # RFC 9309 match target = path + optional ?query
            parts = urlsplit(canonicalize_url(url))
            target = parts.path + (f"?{parts.query}" if parts.query else "")
            if not robots_allowed(target, st["rules"]):
                out.append(
                    _row("log", seed_index=seed_i, page_idx=page_i,
                         sub_idx=sub_i, url=url,
                         url_canon=canonicalize_url(url), host=host,
                         outcome="disallowed", fetch_ts=time.time())
                )
                if kind == "seed":
                    # the seed still needs its outcome row — it is
                    # neither visited nor failed, it was blocked
                    out.append(_row("seed_outcome", url=url,
                                    seed_index=seed_i, outcome="disallowed"))
                elif kind == "detail":
                    # consistent with the failed-detail rule: robots
                    # blocking the detail must not also discard the
                    # already-extracted listing record
                    _listing_only_record()
                return
        # fetch NOW (the heap guaranteed start ≥ both the reservation
        # schedule and last_start + delay; budget is on fetch STARTS,
        # relative to the PREVIOUS actual start). The logged timestamp
        # is the start time — the crawl log's politeness evidence.
        ts = time.time()
        st["fetch_i"] += 1
        st["last_start"] = ts
        if st["delay"] > 0:
            st["ready"] = max(st["t0"] + st["fetch_i"] * st["delay"],
                              ts + st["delay"])
        body, status = store.get(url, host)
        ok = body is not None and status < 400
        canon = canonicalize_url(url)
        out.append(
            _row("log", seed_index=seed_i, page_idx=page_i, sub_idx=sub_i,
                 url=url, url_canon=canon, host=host,
                 outcome="visited" if ok else "failed", fetch_ts=ts)
        )
        if kind == "seed":
            out.append(_row("seed_outcome", url=url,
                            seed_index=seed_i,
                            outcome="visited" if ok else "failed"))

        if kind == "detail":
            # A failed detail fetch keeps the listing-only record
            # (reference content.py:166-172 swallows the error).
            listing = json.loads(cols["payload"][ri])
            pairs = dict(json.loads(listing.pop("_pairs", None) or "{}"))
            feat_caption = listing.pop("_feat_caption", "")
            merged = listing
            if ok:
                try:
                    full = extract.extract_single_article(
                        parse_html(body.decode()), listing["url"], selectors, opts
                    )
                    if full:
                        merged = extract.merge_listing_detail(listing, full)
                        _merge_caption_pairs(
                            pairs,
                            collect_image_caption_pairs(body.decode(),
                                                        listing["url"]),
                        )
                except Exception:
                    # content.py:166-167: ANY detail failure (decode,
                    # parse, extract) keeps the listing-only record
                    merged = listing
            merged.pop("fetch_full", None)
            rec = extract.transform_article(merged, first_seed_url)
            rec = extract.validate_article(rec) if rec else None
            if rec:
                out.append(_record_row(rec, seed_index=seed_i,
                                       page_idx=page_i, sub_idx=sub_i,
                                       host=host))
                _image_refs_for_record(rec, pairs, feat_caption, out, seed_i)
            return

        if not ok:
            return

        # kind in (seed, next): a page to route/parse. The WHOLE parse/
        # extract path is guarded like the oracle/reference (base.py
        # per-seed try, content.py:225-227 pagination try): a non-UTF-8
        # body or a crashing extract must cost only this page's output,
        # never the fused wave task (which runs with max_retries=0
        # because of the cuckoo side effect).
        try:
            _parse_listing_page(st, out, kind, url, seed_i, page_i, body)
        except Exception:
            return

    def _parse_listing_page(st, out, kind, url, seed_i, page_i,
                            body) -> None:
        host = st["host"]
        html = body.decode()
        doc = parse_html(html)
        if kind == "seed" and extract.is_article_page(doc):
            article = extract.extract_single_article(doc, url, selectors, opts)
            if article:
                pairs = _caption_pairs_map(collect_image_caption_pairs(html, url))
                rec = extract.transform_article(article, first_seed_url)
                rec = extract.validate_article(rec) if rec else None
                if rec:
                    out.append(_record_row(rec, seed_index=seed_i,
                                           page_idx=page_i, sub_idx=0,
                                           host=host))
                    _image_refs_for_record(rec, pairs, "", out, seed_i)
            return

        elements = extract.find_article_elements(doc, selectors)
        if not elements:
            return
        pairs = _caption_pairs_map(collect_image_caption_pairs(html, url))
        n_valid = 0
        for dom_i, el in enumerate(elements):
            try:
                entry = extract.extract_article_listing(el, url, selectors, opts)
            except Exception:
                continue  # content.py:173-175: a bad element is skipped,
                # never the whole page/wave
            if not (entry and entry.get("url")):
                continue
            n_valid += 1
            feat = entry.get("image")
            feat_caption = pairs.get(canonicalize_url(feat), "") if feat else ""
            if entry.get("fetch_full"):
                entry["_feat_caption"] = feat_caption
                entry["_pairs"] = json.dumps(pairs)
                out.append(
                    _row("frontier", kind="detail", seed_index=seed_i,
                         page_idx=page_i, sub_idx=1 + dom_i,
                         url=entry["url"], url_canon=canonicalize_url(entry["url"]),
                         host=host_of(entry["url"]), payload=json.dumps(entry))
                )
            else:
                entry.pop("fetch_full", None)
                rec = extract.transform_article(entry, first_seed_url)
                rec = extract.validate_article(rec) if rec else None
                if rec:
                    out.append(_record_row(rec, seed_index=seed_i,
                                           page_idx=page_i,
                                           sub_idx=1 + dom_i, host=host))
                    _image_refs_for_record(rec, pairs, feat_caption, out, seed_i)
        # pagination (content.py:177-227)
        proceed = (n_valid > 0) if kind == "seed" else True
        if follow_next and proceed and max_pages > 1 and page_i < max_pages:
            next_url = extract.find_next_page(doc, url)
            if next_url:
                out.append(
                    _row("frontier", kind="next", seed_index=seed_i,
                         page_idx=page_i + 1, sub_idx=0, url=next_url,
                         url_canon=canonicalize_url(next_url),
                         host=host_of(next_url))
                )

    return fetch_parse
