"""Deterministic synthetic web world (seed=42) — FIXTURES.md §1-§3, §8.

Generates, per host: a robots.txt with a crawl-delay, a paginated blog
listing chain, article detail pages, a product-list page (`/shop`) and a
business-directory page (`/directory`), plus PNG/JPEG image payloads —
all rendered to real HTML exercising the selector shapes the reference
scrapers target (entry-title/time/.author/.entry-content/.product-item/
.price/.business-listing/... per `/root/reference/config/examples/`).

The world is written as a host-hash-sharded parquet content store
(SITE_SCHEMA) + a seeds parquet + meta.json, so fetch stages read only
the shard(s) for the hosts in their batch — the same locality layout a
real crawl store would use at 10^10 scale.

Pagination styles (exercising `content.py:351-456` discovery paths):
* style A (host%3==0): ``a[rel='next']`` link with ``?page=N+1``;
* style B (host%3==1): ``/blog/page/N/`` path links + ``.next`` link;
* style C (host%3==2): no next link; seeds start at ``/blog/?page=1`` so
  the query-pattern branch fabricates ``?page=N+1`` — the chain ends by
  attempting a 404 page (reference swallows it, `content.py:225-227`).

Everything is a pure function of (tier params, host index); no wall
clock, no global RNG.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .functions.urlnorm import canonicalize_url
from .schema import SITE_SCHEMA

WORDS = (
    "quantum harbor velvet lantern meadow cipher ember granite horizon "
    "juniper kestrel lattice marble nectar obsidian prairie quill russet "
    "saffron timber umber willow zephyr anchor basalt cobalt drift "
    "estuary fjord glacier heather islet jetty knoll lagoon mesa nexus "
    "orchard pebble quarry ridge summit tundra vale wharf yonder zenith "
    "amber birch cedar dune elm fern grove hollow iris jade kelp larch "
    "moss nook oak pine reed sage thorn vine wren yew alder bay cliff "
    "dell edge flint gorge heath inlet "
).split()

CATEGORIES = ["Tech", "Travel", "Food", "Science", "Art", "History", "Nature", "Sport"]
AUTHORS = ["Jane Roe", "Sam Park", "Ada Vale", "Omar Reed", "Lin Chen", "Max Stone"]


DEFAULT_IMAGE_SIZES = (32, 48, 64, 96)


@dataclass(frozen=True)
class WorldSpec:
    tier: str = "t1"
    gen_version: int = 4  # bump to invalidate cached worlds on disk
    n_hosts: int = 8
    listing_pages: int = 2        # pages in each host's blog chain
    entries_per_page: int = 4
    images_per_article: int = 2
    max_pages: int = 2            # crawler's pagination cap
    paragraphs: tuple = (4, 8)
    crawl_delay_ms_choices: tuple = (0,)
    products_per_host: int = 8
    businesses_per_host: int = 6
    image_sizes: tuple = DEFAULT_IMAGE_SIZES
    seed: int = 42

    def cache_key(self) -> str:
        return hashlib.md5(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:12]


TIERS = {
    "t1": WorldSpec(tier="t1"),
    "t2": WorldSpec(
        tier="t2", n_hosts=64, listing_pages=3, entries_per_page=6,
        images_per_article=2, max_pages=3,
        crawl_delay_ms_choices=(10, 20, 50),
    ),
    # bench: shallow pagination (4 waves of fixed overhead), wide pages
    # (16 entries, 4 images/article) — wall time is dominated by the
    # parallel fetch+parse+decode compute, which is what the N→4N
    # scaling criterion must measure.
    # Bench pages/images are sized so per-wave compute dominates the
    # fixed per-wave coordination cost — the regime a real 100 TB crawl
    # (100 KB pages, full-size images) lives in; a feather-weight world
    # would measure Ray's constant overheads, not the engine.
    "bench": WorldSpec(
        tier="bench", n_hosts=256, listing_pages=4, entries_per_page=16,
        images_per_article=3, max_pages=4, paragraphs=(4, 7),
        crawl_delay_ms_choices=(0, 5, 10),
    ),
}


def host_name(spec: WorldSpec, i: int) -> str:
    # A couple of unicode hosts at t2+ exercise the punycode path.
    if spec.n_hosts >= 16 and i % 31 == 7:
        return f"bücher{i:03d}.example.org"
    return f"host{i:03d}.example.org"


def _rng(*key) -> np.random.Generator:
    return np.random.default_rng([42, *key])


def _sentence(rng) -> str:
    n = int(rng.integers(5, 12))
    ws = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), n)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng, n_sent=None) -> str:
    n = n_sent or int(rng.integers(2, 5))
    return " ".join(_sentence(rng) for _ in range(n))


def _stable_hash(s: str) -> int:
    # 64 bits: 32 bits birthday-collides at bench scale (~57k image ids
    # → ~30% chance of two unrelated articles sharing pixel-identical
    # images/captions, silently polluting the phash dup-group data)
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def caption_for(image_id: str) -> str:
    rng = _rng(_stable_hash(image_id), 5)
    n = int(rng.integers(3, 13))
    return " ".join(WORDS[int(j)] for j in rng.integers(0, len(WORDS), n))


def image_spec(image_id: str, sizes: tuple | None = None) -> tuple[int, int, str]:
    rng = _rng(_stable_hash(image_id), 7)
    sizes = sizes if sizes is not None else DEFAULT_IMAGE_SIZES
    w = int(rng.choice(list(sizes)))
    h = int(rng.choice(list(sizes)))
    fmt = "png" if int(rng.integers(0, 2)) == 0 else "jpeg"
    return w, h, fmt


def image_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    rng = _rng(_stable_hash(image_id), 9)
    # Smooth base (gradients + sinusoid) + mild noise: realistic-ish and
    # compressible, while the codec guarantees PSNR regardless.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            128 + 60 * np.sin(xx / 7 + float(rng.uniform(0, 6))) + 40 * (yy / max(h - 1, 1) - 0.5),
            128 + 60 * np.cos(yy / 5 + float(rng.uniform(0, 6))) + 40 * (xx / max(w - 1, 1) - 0.5),
            128 + 50 * np.sin((xx + yy) / 9 + float(rng.uniform(0, 6))),
        ],
        axis=2,
    )
    noise = rng.normal(0, 12, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Page rendering
# ---------------------------------------------------------------------------


def _img_url(host: str, image_id: str, fmt: str) -> str:
    return f"http://{host}/img/{image_id}.{'png' if fmt == 'png' else 'jpg'}"


def article_id(host_idx: int, page: int, k: int) -> str:
    return f"{host_idx:04d}-{page:05d}-{k:02d}"


def _pagination_html(spec: WorldSpec, host: str, style: int, page: int) -> str:
    nxt = page + 1
    has_next = page < spec.listing_pages
    if style == 0:
        if not has_next:
            return '<nav class="pagination"></nav>'
        return (
            f'<nav class="pagination"><span class="current">{page}</span>'
            f'<a rel="next" href="/blog/?page={nxt}">Next</a></nav>'
        )
    if style == 1:
        links = "".join(
            f'<a href="/blog/page/{p}/">{p}</a>' for p in range(1, spec.listing_pages + 1)
        )
        nxt_link = f'<a class="next" href="/blog/page/{nxt}/">»</a>' if has_next else ""
        return f'<nav class="pagination">{links}{nxt_link}</nav>'
    # style C: plain numbered links only; discovery is via the ?page= URL pattern.
    return '<nav class="pagination"><span class="current">%d</span></nav>' % page


def render_listing(spec: WorldSpec, host_idx: int, page: int) -> str:
    host = host_name(spec, host_idx)
    style = host_idx % 3
    rng = _rng(host_idx, page, 1)
    entries = []
    for k in range(spec.entries_per_page):
        aid = article_id(host_idx, page, k)
        title = f"Article {aid}: " + " ".join(
            WORDS[int(j)] for j in rng.integers(0, len(WORDS), 3)
        ).title()
        date = f"2023-{(host_idx % 12) + 1:02d}-{(k % 27) + 1:02d}"
        author = AUTHORS[int(rng.integers(0, len(AUTHORS)))]
        excerpt = _sentence(rng) + " " + _sentence(rng)
        cats = sorted({CATEGORIES[int(j)] for j in rng.integers(0, len(CATEGORIES), 2)})
        thumb_id = f"img-{aid}-th"
        _, _, tfmt = image_spec(thumb_id, spec.image_sizes)
        # Every ~9th entry links to a missing detail page (404 → listing
        # data survives, reference content.py:166-167).
        missing = (host_idx + page + k) % 9 == 4
        href = f"/posts/{aid}-missing" if missing else f"/posts/{aid}"
        entries.append(
            f"""<article class="post-item">
  <h2 class="entry-title"><a href="{href}">{title}</a></h2>
  <time datetime="{date}T08:30:00Z">{date}</time>
  <span class="author">{author}</span>
  <p class="excerpt">{excerpt}</p>
  <img class="thumb" src="{_img_url(host, thumb_id, tfmt)}" alt="{caption_for(thumb_id)}">
  {''.join(f'<a class="tag" href="/t/{c.lower()}">{c}</a>' for c in cats)}
</article>"""
        )
    return f"""<html><head><title>Blog p{page} — {host}</title></head>
<body><div class="posts post-list">
{chr(10).join(entries)}
</div>
{_pagination_html(spec, host, style, page)}
</body></html>"""


def render_article(spec: WorldSpec, host_idx: int, page: int, k: int) -> str:
    host = host_name(spec, host_idx)
    aid = article_id(host_idx, page, k)
    rng = _rng(host_idx, page, k, 2)
    title = f"Article {aid}: " + " ".join(
        WORDS[int(j)] for j in _rng(host_idx, page, 1).integers(0, len(WORDS), 3 * (k + 1))[-3:]
    ).title()
    # Listing and detail titles may differ; listing (non-empty) wins on merge.
    date = f"2023-{(host_idx % 12) + 1:02d}-{(k % 27) + 1:02d}"
    author = AUTHORS[int(rng.integers(0, len(AUTHORS)))]
    lo, hi = spec.paragraphs
    paras = [_paragraph(rng) for _ in range(int(rng.integers(lo, hi + 1)))]
    img_tags = []
    for j in range(spec.images_per_article):
        iid = f"img-{aid}-{j:02d}"
        _, _, fmt = image_spec(iid, spec.image_sizes)
        img_tags.append(f'<img src="{_img_url(host, iid, fmt)}" alt="{caption_for(iid)}">')
    body_parts = []
    for i, p in enumerate(paras):
        body_parts.append(f"<p>{p}</p>")
        if i < len(img_tags):
            body_parts.append(img_tags[i])
    cats = sorted({CATEGORIES[int(j)] for j in rng.integers(0, len(CATEGORIES), 3)})
    feat_id = f"img-{aid}-th"
    _, _, ffmt = image_spec(feat_id, spec.image_sizes)
    return f"""<html><head>
<title>{title} — {host}</title>
<meta property="og:type" content="article">
<meta property="og:title" content="{title}">
<meta property="og:image" content="{_img_url(host, feat_id, ffmt)}">
<meta property="article:published_time" content="{date}T08:30:00Z">
<meta name="twitter:card" content="summary">
<meta name="description" content="{paras[0][:120]}">
</head><body>
<article class="single">
  <h1 class="entry-title" itemprop="headline">{title}</h1>
  <time datetime="{date}T08:30:00Z">{date}</time>
  <span class="author">{author}</span>
  <div class="entry-content" itemprop="articleBody">
    {chr(10).join(body_parts)}
  </div>
  {''.join(f'<a class="tag" href="/t/{c.lower()}">{c}</a>' for c in cats)}
</article>
</body></html>"""


def render_shop(spec: WorldSpec, host_idx: int) -> str:
    host = host_name(spec, host_idx)
    rng = _rng(host_idx, 3)
    items = []
    for k in range(spec.products_per_host):
        name = " ".join(WORDS[int(j)] for j in rng.integers(0, len(WORDS), 2)).title()
        price = float(rng.integers(100, 99999)) / 100.0
        cur = ["$", "€", "£"][int(rng.integers(0, 3))]
        avail = ["In Stock", "Out of Stock", "Available"][int(rng.integers(0, 3))]
        rating = round(float(rng.uniform(1, 5)), 1)
        count = int(rng.integers(0, 500))
        pid = f"img-{host_idx:04d}-prod-{k:02d}"
        _, _, pfmt = image_spec(pid, spec.image_sizes)
        items.append(
            f"""<div class="product-item">
  <h3 class="product-title">Product {host_idx:03d}-{k:02d} {name}</h3>
  <span class="price">{cur}{price:.2f}</span>
  <a href="/products/{host_idx:03d}-{k:02d}">view</a>
  <span class="availability">{avail}</span>
  <img src="{_img_url(host, pid, pfmt)}" alt="{caption_for(pid)}">
  <span class="rating">{rating}</span>
  <span class="review-count">{count} reviews</span>
</div>"""
        )
    return f"""<html><head><title>Shop — {host}</title></head>
<body><div class="product-grid">{chr(10).join(items)}</div></body></html>"""


def render_directory(spec: WorldSpec, host_idx: int) -> str:
    host = host_name(spec, host_idx)
    rng = _rng(host_idx, 4)
    rows = []
    for k in range(spec.businesses_per_host):
        name = " ".join(WORDS[int(j)] for j in rng.integers(0, len(WORDS), 2)).title() + " Co"
        street = int(rng.integers(1, 999))
        phone = f"({rng.integers(200, 999)}) {rng.integers(200, 999)}-{rng.integers(1000, 9999)}"
        bad_email = (host_idx + k) % 7 == 3
        email = (
            f"contact{k}@example.com" if bad_email else f"contact{k}@biz{host_idx:03d}.org"
        )
        cats = sorted({CATEGORIES[int(j)] for j in rng.integers(0, len(CATEGORIES), 2)})
        rows.append(
            f"""<div class="business-listing">
  <h3 class="business-name">{name}</h3>
  <address class="address">{street} Main Street, Springfield, IL 627{k:02d}</address>
  <span class="phone">{phone}</span>
  <a class="email" href="mailto:{email}">{email}</a>
  <a class="website" href="http://www.biz{host_idx:03d}-{k}.org/home?utm=x">site</a>
  <a href="https://facebook.com/biz{host_idx:03d}{k}">fb</a>
  <a href="https://twitter.com/biz{host_idx:03d}{k}">tw</a>
  {''.join(f'<span class="category">{c}</span>' for c in cats)}
</div>"""
        )
    return f"""<html><head><title>Directory — {host}</title></head>
<body><div class="results">{chr(10).join(rows)}</div></body></html>"""


# ---------------------------------------------------------------------------
# World assembly
# ---------------------------------------------------------------------------


def listing_url(spec: WorldSpec, host_idx: int, page: int) -> str:
    host = host_name(spec, host_idx)
    style = host_idx % 3
    if style == 1:
        return f"http://{host}/blog/" if page == 1 else f"http://{host}/blog/page/{page}/"
    if style == 2:
        return f"http://{host}/blog/?page={page}"
    return f"http://{host}/blog/" if page == 1 else f"http://{host}/blog/?page={page}"


def build_host_rows(spec: WorldSpec, host_idx: int) -> list[dict]:
    """All content-store rows for one host (pure function; Ray-parallelizable)."""
    host = host_name(spec, host_idx)
    delay = int(spec.crawl_delay_ms_choices[host_idx % len(spec.crawl_delay_ms_choices)])
    rows: list[dict] = []

    def add(url: str, kind: str, body: bytes, status: int = 200) -> None:
        rows.append(
            {
                "url_canon": canonicalize_url(url),
                "kind": kind,
                "body": body,
                "status": status,
                "crawl_delay_ms": delay,
            }
        )

    add(
        f"http://{host}/robots.txt",
        "robots",
        f"User-agent: *\nCrawl-delay: {delay / 1000.0}\n".encode(),
    )
    image_ids: set[str] = set()
    for page in range(1, spec.listing_pages + 1):
        add(listing_url(spec, host_idx, page), "listing", render_listing(spec, host_idx, page).encode())
        for k in range(spec.entries_per_page):
            aid = article_id(host_idx, page, k)
            missing = (host_idx + page + k) % 9 == 4
            if not missing:
                add(
                    f"http://{host}/posts/{aid}",
                    "article",
                    render_article(spec, host_idx, page, k).encode(),
                )
                for j in range(spec.images_per_article):
                    image_ids.add(f"img-{aid}-{j:02d}")
            image_ids.add(f"img-{aid}-th")
    add(f"http://{host}/shop", "product_list", render_shop(spec, host_idx).encode())
    add(f"http://{host}/directory", "business_list", render_directory(spec, host_idx).encode())
    # A deliberately-broken page per 4th host (seed-level failed_urls path).
    if host_idx % 4 == 1:
        add(f"http://{host}/broken", "listing", b"server error", status=500)
    for iid in sorted(image_ids):
        w, h, fmt = image_spec(iid, spec.image_sizes)
        payload = codecs.encode_image(image_pixels(iid, w, h), fmt)
        add(_img_url(host, iid, fmt), "image", payload)
    return rows


def build_seeds(spec: WorldSpec) -> list[str]:
    """Ordered raw seed list with dirty variants + duplicates + failures
    (duplicates are fetched twice by the reference — base.py:188-195)."""
    seeds: list[str] = []
    for i in range(spec.n_hosts):
        host = host_name(spec, i)
        url = listing_url(spec, i, 1)
        if i % 5 == 0:
            # dirty variant: uppercase host, explicit :80, dot-segment
            url = url.replace(host, host.upper() + ":80").replace("/blog/", "/blog/./")
        seeds.append(url)
        if i % 6 == 2:
            seeds.append(listing_url(spec, i, 1))  # duplicate (clean form)
        if i % 4 == 1:
            seeds.append(f"http://{host}/broken")  # 500 → failed seed
        if i % 8 == 3:
            seeds.append(f"http://{host}/posts/{article_id(i, 1, 1)}")  # direct article seed
    return seeds


N_SHARDS_BY_TIER = {"t1": 4, "t2": 16, "bench": 64}


def shard_of(host: str, n_shards: int) -> int:
    return int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % n_shards


def generate_world(spec: WorldSpec, out_dir: str, use_ray: bool = False) -> str:
    """Write the world to ``out_dir`` (idempotent via meta.json cache key).

    Layout: ``site/site_{shard:04d}.parquet`` (host-hash sharded),
    ``seeds.parquet``, ``meta.json``. Returns out_dir.
    """
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("cache_key") == spec.cache_key():
                return out_dir
    os.makedirs(os.path.join(out_dir, "site"), exist_ok=True)
    n_shards = N_SHARDS_BY_TIER.get(spec.tier, 16)

    if use_ray:
        import ray

        @ray.remote
        def _host_rows(i: int) -> list[dict]:
            return build_host_rows(spec, i)

        all_rows_lists = ray.get([_host_rows.remote(i) for i in range(spec.n_hosts)])
    else:
        all_rows_lists = [build_host_rows(spec, i) for i in range(spec.n_hosts)]

    shards: dict[int, list[dict]] = {s: [] for s in range(n_shards)}
    for rows in all_rows_lists:
        if not rows:
            continue
        from .functions.urlnorm import host_of

        host = host_of(rows[0]["url_canon"])
        shards[shard_of(host, n_shards)].extend(rows)
    for s, rows in shards.items():
        table = pa.Table.from_pylist(rows, schema=SITE_SCHEMA) if rows else SITE_SCHEMA.empty_table()
        pq.write_table(table, os.path.join(out_dir, "site", f"site_{s:04d}.parquet"))

    seeds = build_seeds(spec)
    pq.write_table(
        pa.table(
            {"seed_index": pa.array(range(len(seeds)), pa.int32()), "url": pa.array(seeds)}
        ),
        os.path.join(out_dir, "seeds.parquet"),
    )
    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as f:
        json.dump(
            {
                "cache_key": spec.cache_key(),
                "tier": spec.tier,
                "n_shards": n_shards,
                "n_hosts": spec.n_hosts,
                "max_pages": spec.max_pages,
                "spec": asdict(spec),
            },
            f,
        )
    os.replace(tmp_meta, meta_path)
    return out_dir


def default_world_dir(tier: str) -> str:
    return f"/tmp/wsr_world/{tier}"


def ensure_world(tier: str, use_ray: bool = False) -> str:
    spec = TIERS[tier]
    return generate_world(spec, default_world_dir(tier), use_ray=use_ray)
