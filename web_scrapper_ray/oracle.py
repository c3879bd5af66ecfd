"""Vendored sequential oracle — reference crawl semantics, no Ray.

Re-implements the reference's *orchestration* exactly and sequentially:
the ``scrape()`` seed loop (`/root/reference/src/webscraper/scrapers/
base.py:173-216`), the content scraper's listing/detail/pagination
control flow (`content.py:111-233`), and ecommerce/business page scrapes
(`ecommerce.py:104-142`, `business.py:107-145`) — over the synthetic
parquet content store.  Produces the golden crawl log, URL-seen sets,
article/product/business records, and the golden image+caption table.

Per SURVEY.md §5.1 the oracle shares the *per-element extraction*
functions (extract.py — separately unit-tested) with the engine but NO
pipeline/orchestration code: waves, actors, politeness, frontier
segments and checkpointing on the engine side are tested against this
straight-line loop.

The crawl log covers page fetch attempts only (the reference never
fetches images; image rows are compared as an unordered table).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from . import codecs, extract
from .functions.urlnorm import canonicalize_url

# Fixture selector maps (shaped like /root/reference/config/examples/*.yaml).
CONTENT_SELECTORS = {
    "article_container": "article.post-item",
    "title": ".entry-title",
    "date": "time",
    "author": ".author",
    "content": ".entry-content",
    "excerpt": ".excerpt, meta[name='description']",
    "image": ".thumb, meta[property='og:image']",
    "categories": ".tag",
}
ECOM_SELECTORS = {
    "product_container": ".product-item",
    "name": ".product-title",
    "price": ".price",
    "availability": ".availability",
    "images": "img",
    "rating": ".rating",
    "review_count": ".review-count",
}
BIZ_SELECTORS = {
    "business_container": ".business-listing",
    "name": ".business-name",
    "address": ".address",
    "phone": ".phone",
    "email": ".email",
    "website": ".website",
    "categories": ".category",
}


class FetchError(Exception):
    pass


class SiteDict:
    """Whole-store in-memory lookup (oracle/test scale only — the engine
    side uses the sharded SiteStore with per-host locality instead)."""

    def __init__(self, world_dir: str):
        self.pages: dict[str, tuple[bytes, int, str]] = {}
        for f in sorted(glob.glob(os.path.join(world_dir, "site", "*.parquet"))):
            t = pq.read_table(f)
            for u, b, s, k in zip(
                t.column("url_canon").to_pylist(),
                t.column("body").to_pylist(),
                t.column("status").to_pylist(),
                t.column("kind").to_pylist(),
            ):
                self.pages[u] = (b, s, k)

    def fetch(self, url: str) -> bytes:
        canon = canonicalize_url(url)
        row = self.pages.get(canon)
        if row is None or row[1] >= 400:
            raise FetchError(canon)
        return row[0]


@dataclass
class OracleResult:
    records: list[dict] = field(default_factory=list)
    crawl_log: list[dict] = field(default_factory=list)  # fetch_seq, url_canon, outcome
    visited_urls: set = field(default_factory=set)
    failed_urls: set = field(default_factory=set)

    def log_fetch(self, url: str, ok: bool) -> None:
        self.crawl_log.append(
            {
                "fetch_seq": len(self.crawl_log),
                "url_canon": canonicalize_url(url),
                "outcome": "visited" if ok else "failed",
            }
        )


def _fetch_logged(site: SiteDict, res: OracleResult, url: str) -> bytes:
    try:
        body = site.fetch(url)
    except FetchError:
        res.log_fetch(url, False)
        raise
    res.log_fetch(url, True)
    return body


from .minidom import parse_html  # noqa: E402


def _content_extract_data(site: SiteDict, res: OracleResult, url: str,
                          selectors: dict, opts: dict) -> list[dict]:
    """ContentScraper.extract_data (content.py:111-233), sequential."""
    html = _fetch_logged(site, res, url).decode()
    doc = parse_html(html)
    if extract.is_article_page(doc):
        article = extract.extract_single_article(doc, url, selectors, opts)
        return [article] if article else []
    elements = extract.find_article_elements(doc, selectors)
    if not elements:
        return []
    articles: list[dict] = []

    def handle_elements(elements, base_url) -> None:
        for el in elements:
            try:
                article = extract.extract_article_listing(el, base_url,
                                                          selectors, opts)
                if article and article.get("url"):
                    if article.get("fetch_full"):
                        try:
                            detail_html = _fetch_logged(
                                site, res, article["url"]).decode()
                            full = extract.extract_single_article(
                                parse_html(detail_html), article["url"],
                                selectors, opts
                            )
                            if full:
                                article = extract.merge_listing_detail(
                                    article, full)
                        except Exception:
                            # content.py:166-167: ANY detail failure
                            # (fetch, decode, extract) keeps the listing
                            pass
                    article.pop("fetch_full", None)
                    articles.append(article)
            except Exception:
                pass  # content.py:173-175: skip just this element

    handle_elements(elements, url)
    max_pages = opts.get("max_pages", 1)
    if opts.get("follow_next_page", True) and articles and max_pages > 1:
        current_page = 1
        next_url = extract.find_next_page(doc, url)
        while next_url and current_page < max_pages:
            current_page += 1
            try:
                next_html = _fetch_logged(site, res, next_url).decode()
                next_doc = parse_html(next_html)
                next_elements = extract.find_article_elements(next_doc, selectors)
                if not next_elements:
                    break
                handle_elements(next_elements, next_url)
                next_url = extract.find_next_page(next_doc, next_url)
            except Exception:
                # content.py:225-227: any pagination error stops the
                # chain but keeps everything collected so far
                break
    return articles


def oracle_crawl_content(world_dir: str, seeds: list[str], selectors: dict | None = None,
                         opts: dict | None = None) -> OracleResult:
    """The base.py:173-216 seed loop over the content scraper."""
    selectors = selectors or CONTENT_SELECTORS
    opts = {**extract.DEFAULT_CONTENT_OPTS, "follow_next_page": True, "max_pages": 1,
            **(opts or {})}
    site = SiteDict(world_dir)
    res = OracleResult()
    for url in seeds:
        try:
            data = _content_extract_data(site, res, url, selectors, opts)
            transformed = [
                a for a in (extract.transform_article(x, seeds[0]) for x in data) if a
            ]
            validated = [
                a for a in (extract.validate_article(x) for x in transformed) if a
            ]
            res.records.extend(validated)
            res.visited_urls.add(url)
        except Exception:
            res.failed_urls.add(url)
    return res


def oracle_scrape_products(world_dir: str, seeds: list[str],
                           selectors: dict | None = None) -> OracleResult:
    """base.py loop over EcommerceScraper.extract_data (ecommerce.py:104-142)."""
    selectors = selectors or ECOM_SELECTORS
    site = SiteDict(world_dir)
    res = OracleResult()
    for url in seeds:
        try:
            html = _fetch_logged(site, res, url).decode()
            doc = parse_html(html)
            elements = extract.find_product_elements(doc, selectors)
            products = []
            for el in elements:
                p = extract.extract_product(el, selectors)
                if p:
                    products.append(p)
            transformed = [
                p for p in (extract.transform_product(x, seeds[0]) for x in products) if p
            ]
            validated = [p for p in (extract.validate_product(x) for x in transformed) if p]
            res.records.extend(validated)
            res.visited_urls.add(url)
        except Exception:
            res.failed_urls.add(url)
    return res


def oracle_scrape_businesses(world_dir: str, seeds: list[str],
                             selectors: dict | None = None) -> OracleResult:
    """base.py loop over BusinessScraper.extract_data (business.py:107-145)."""
    selectors = selectors or BIZ_SELECTORS
    site = SiteDict(world_dir)
    res = OracleResult()
    for url in seeds:
        try:
            html = _fetch_logged(site, res, url).decode()
            doc = parse_html(html)
            elements = extract.find_business_elements(doc, selectors)
            businesses = []
            for el in elements:
                b = extract.extract_business(el, selectors)
                if b:
                    businesses.append(b)
            transformed = [
                b for b in (extract.transform_business(x) for x in businesses) if b
            ]
            validated = [b for b in (extract.validate_business(x) for x in transformed) if b]
            res.records.extend(validated)
            res.visited_urls.add(url)
        except Exception:
            res.failed_urls.add(url)
    return res


# ---------------------------------------------------------------------------
# Golden image+caption table
# ---------------------------------------------------------------------------


def collect_image_caption_pairs(html: str, base_url: str) -> list[tuple[str, str]]:
    """(absolute src, alt) for every non-data: <img> on a page — the
    caption source for the north-rule table (alt text; '' when absent)."""
    doc = parse_html(html)
    out = []
    for img in doc.find_all("img", src=True):
        src = img["src"]
        if src.startswith("data:"):
            continue
        if not src.startswith(("http://", "https://")):
            from urllib.parse import urljoin

            src = urljoin(base_url, src)
        out.append((canonicalize_url(src), img.get("alt", "")))
    return out


def image_urls_of_records(records: list[dict]) -> list[str]:
    """Unique canonical image URLs referenced by final records, in record
    order (articles: featured + content images; products: images list)."""
    seen: set[str] = set()
    out: list[str] = []
    for rec in records:
        urls = []
        if rec.get("image"):
            urls.append(rec["image"])
        urls.extend(rec.get("images") or [])
        for u in urls:
            if not u or u.startswith("data:"):
                continue
            c = canonicalize_url(u)
            if c not in seen:
                seen.add(c)
                out.append(c)
    return out


def oracle_images_table(world_dir: str, records: list[dict],
                        crawl_log: list[dict]) -> list[dict]:
    """Golden IMAGES_SCHEMA rows: fetch+decode every image referenced by
    the final records; caption = max over alts observed on visited pages
    (order-free rule, see stages/decode.py)."""
    site = SiteDict(world_dir)
    captions: dict[str, str] = {}
    for entry in crawl_log:
        if entry["outcome"] != "visited":
            continue
        row = site.pages.get(entry["url_canon"])
        if row is None or row[2] == "image":
            continue
        try:
            html = row[0].decode()
        except UnicodeDecodeError:
            continue
        for src, alt in collect_image_caption_pairs(html, entry["url_canon"]):
            captions[src] = max(captions.get(src, ""), alt)
    rows = []
    for url in image_urls_of_records(records):
        page = site.pages.get(url)
        if page is None or page[1] >= 400:
            continue
        payload = page[0]
        try:
            pixels = codecs.decode_image(payload)
        except ValueError:
            continue  # same skip-bad-image rule as stages/decode.py
        name = url.rsplit("/", 1)[-1]
        image_id, _, ext = name.rpartition(".")
        image_id = image_id or name
        rows.append(
            {
                "image_id": image_id,
                "bytes": payload,
                "w": int(pixels.shape[1]),
                "h": int(pixels.shape[0]),
                "fmt": codecs.sniff_format(payload, ext),
                "caption": captions.get(url, ""),
                "phash": codecs.phash64(pixels),
            }
        )
    return rows
