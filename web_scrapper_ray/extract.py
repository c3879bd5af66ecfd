"""Per-element extraction semantics (SURVEY.md §2.2 E1–E33, T1–T11).

Pure functions over :mod:`web_scrapper_ray.minidom` nodes replicating the
reference scrapers' extraction/transform/validation behavior:

* content:   `/root/reference/src/webscraper/scrapers/content.py:235-1177`
* ecommerce: `/root/reference/src/webscraper/scrapers/ecommerce.py:144-629`
* business:  `/root/reference/src/webscraper/scrapers/business.py:147-677`

These functions are shared by the Ray parse stages (stages/crawl_stage.py, pipelines/scrape.py) and
the vendored sequential oracle (oracle.py); the two sides implement the
*orchestration* (wave-parallel crawl vs sequential loop) independently,
so the oracle equivalence tests exercise ordering / seen-set / merge /
politeness behavior while extraction parity is pinned by direct unit
tests (tests/test_extract.py).

All functions are deterministic, hold no state, and are safe to call
from vectorized ``map_batches`` bodies (module-level compiled regexes,
no per-row allocation beyond the result dicts).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Optional
from urllib.parse import urljoin, urlparse

from .functions.text import clean_text, extract_keywords, summarize_text
from .functions.validators import is_valid_email, is_valid_phone, is_valid_url
from .minidom import Node

# ---------------------------------------------------------------------------
# content (articles)
# ---------------------------------------------------------------------------

_DATE_TEXT_RX = re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}")
_HTTPISH = ("http://", "https://")


def _has_class_term(node_attr: Optional[str], terms) -> bool:
    return bool(node_attr) and any(t in node_attr.lower() for t in terms)


def is_article_page(doc: Node) -> bool:
    """Single-article vs listing routing score (content.py:235-290)."""
    article_indicators = [
        doc.find("article"),
        doc.find(class_=lambda x: x and "article" in x),
        doc.find(class_=lambda x: x and "post" in x and "post-list" not in x),
        doc.find(["h1", "h2"], class_=lambda x: _has_class_term(x, ["title", "headline", "heading"])),
        doc.find(attrs={"itemprop": "headline"}),
        doc.find(attrs={"property": "og:type", "content": "article"}),
    ]
    listing_indicators = [
        len(doc.find_all("article")) > 1,
        len(doc.find_all(class_=lambda x: x and "post-" in x)) > 3,
        doc.find(class_=lambda x: _has_class_term(x, ["archive", "listing", "index", "blog-list", "post-list"])),
        doc.find(["ul", "div"], class_=lambda x: _has_class_term(x, ["posts", "articles", "entries"])),
    ]
    article_score = sum(1 for i in article_indicators if i)
    listing_score = sum(1 for i in listing_indicators if i)
    if listing_score > article_score:
        return False
    content_indicators = [
        len(doc.get_text()) > 2000,
        doc.find(["p", "div"], class_=lambda x: _has_class_term(x, ["content", "body", "entry", "article-text"])),
        doc.find(attrs={"itemprop": "articleBody"}),
        len(doc.find_all("p")) > 5,
    ]
    return sum(1 for i in content_indicators if i) >= 2 or article_score > listing_score


def find_article_elements(doc: Node, selectors: dict) -> list[Node]:
    """Listing-entry discovery chain (content.py:292-349)."""
    for selector in [
        selectors.get("article_container"),
        "article", ".post", ".entry", ".article", ".blog-post", ".blog-entry",
        "[itemtype*='BlogPosting']", "[itemtype*='Article']",
    ]:
        if not selector:
            continue
        try:
            elements = doc.select(selector)
        except Exception:
            continue
        if elements:
            return elements
    candidates = doc.find_all(
        ["div", "li", "article"],
        class_=lambda x: _has_class_term(x, ["post", "article", "entry", "item", "content"]),
    )
    if candidates:
        return candidates
    out = []
    for el in doc.find_all(["div", "li", "article"]):
        has_title = el.find(["h1", "h2", "h3", "h4"]) or el.find(
            class_=lambda x: x and "title" in str(x).lower()
        )
        has_meta = (
            el.find(text=_DATE_TEXT_RX)
            or el.find(class_=lambda x: _has_class_term(x, ["date", "time", "author", "meta"]))
            or el.find("time")
        )
        has_excerpt = el.find(
            ["p", "div"],
            class_=lambda x: _has_class_term(x, ["excerpt", "summary", "description", "intro"]),
        )
        if has_title and (has_meta or has_excerpt):
            out.append(el)
    return out


_NEXT_SELECTORS = [
    ".next", ".next-page", ".pagination .next", "a[rel='next']",
    "a:contains('Next')", "a:contains('»')", "a.next", ".pagination a:contains('›')",
]


def find_next_page(doc: Node, base_url: str) -> Optional[str]:
    """Next-page discovery (content.py:351-456): selectors → current-page
    sibling → ``?page=N`` query pattern → ``/page/N/`` path pattern."""
    for selector in _NEXT_SELECTORS:
        try:
            link = doc.select_one(selector)
        except Exception:
            continue
        if link is not None and link.has_attr("href"):
            nxt = link["href"]
            return nxt if nxt.startswith(_HTTPISH) else urljoin(base_url, nxt)
    indicator = None
    for selector in (".current", ".active", ".selected", "[aria-current='page']"):
        try:
            indicator = doc.select_one(selector)
        except Exception:
            continue
        if indicator is not None:
            break
    if indicator is not None:
        if indicator.name == "a" and indicator.has_attr("href"):
            m = re.search(r"\d+", indicator.get_text())
            if m:
                cur = int(m.group())
                for link in doc.find_all("a", href=True, text=re.compile(r"\d+")):
                    m2 = re.search(r"\d+", link.get_text())
                    if m2 and int(m2.group()) == cur + 1:
                        nxt = link["href"]
                        return nxt if nxt.startswith(_HTTPISH) else urljoin(base_url, nxt)
        else:
            sib = indicator.find_next_sibling()
            if sib is not None and sib.name == "a" and sib.has_attr("href"):
                nxt = sib["href"]
                return nxt if nxt.startswith(_HTTPISH) else urljoin(base_url, nxt)
    parsed = urlparse(base_url)
    path, query = parsed.path, parsed.query
    if "page=" in query:
        m = re.search(r"page=(\d+)", query)
        if m:
            nq = re.sub(r"page=\d+", f"page={int(m.group(1)) + 1}", query)
            return f"{parsed.scheme}://{parsed.netloc}{path}?{nq}"
    m = re.search(r"/page/(\d+)/?$", path)
    if m:
        np_ = re.sub(r"/page/\d+/?$", f"/page/{int(m.group(1)) + 1}/", path)
        return f"{parsed.scheme}://{parsed.netloc}{np_}"
    if "/page/" not in path and doc.find_all("a", href=re.compile(r"/page/\d+/?$")):
        return f"{parsed.scheme}://{parsed.netloc}{path.rstrip('/')}/page/2/"
    return None


def _select_first(el: Node, selector: str) -> Optional[Node]:
    """KNOWN DIVERGENCE (documented, deliberate): the reference lets an
    invalid user selector raise out of select_one, and its per-element
    handler then drops the WHOLE item (ecommerce.py:132-135). Here all
    selector errors degrade to the common-pattern fallbacks instead,
    because minidom also raises for some valid-but-unimplemented CSS
    (:nth-child, sibling combinators) where soupsieve would match —
    propagating would drop records the reference keeps. Lenient-fallback
    is the lesser divergence; configs with syntactically invalid
    selectors will emit records the reference would skip."""
    try:
        return el.select_one(selector)
    except Exception:
        return None


def extract_title(el: Node, selectors: dict) -> Optional[str]:
    if "title" in selectors:
        t = _select_first(el, selectors["title"])
        if t is not None:
            return t.get_text(strip=True)
    for sel in [
        "h1", "h1.entry-title", "h1.post-title", "h1.article-title",
        ".entry-title", ".post-title", ".article-title", "[itemprop='headline']",
        "header h1", "header h2", "h2.entry-title", ".title",
    ]:
        t = _select_first(el, sel)
        if t is not None:
            return t.get_text(strip=True)
    meta = el.find("meta", property="og:title")
    if meta is not None and meta.has_attr("content"):
        return meta["content"]
    heading = el.find(["h1", "h2", "h3"])
    return heading.get_text(strip=True) if heading is not None else None


def extract_article_url(el: Node, base_url: str, selectors: dict) -> Optional[str]:
    def absolutize(u: str) -> str:
        return u if u.startswith(_HTTPISH) else urljoin(base_url, u)

    if "url" in selectors:
        n = _select_first(el, selectors["url"])
        if n is not None and n.has_attr("href"):
            return absolutize(n["href"])
    title_el = el.find(["h1", "h2", "h3", "h4"])
    if title_el is not None:
        link = title_el.find("a", href=True)
        if link is not None:
            return absolutize(link["href"])
    link = el.find("a", href=True)
    return absolutize(link["href"]) if link is not None else None


_TEXT_DATE_PATTERNS = [
    r"\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{4}",
    r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}",
    r"\d{4}-\d{2}-\d{2}",
    r"\d{2}/\d{2}/\d{4}",
    r"\d{1,2}/\d{1,2}/\d{2,4}",
]
_ELEMENT_DATE_PATTERNS = [
    (r"\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{4}", "%d %B %Y"),
    (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}", "%B %d, %Y"),
    (r"\d{4}-\d{2}-\d{2}", "%Y-%m-%d"),
    (r"\d{2}/\d{2}/\d{4}", "%m/%d/%Y"),
]


def parse_date_element(el: Node) -> Optional[str]:
    """datetime/content attr ISO parse → text regex + strptime → ISO date
    (content.py:694-750)."""
    for attr in ("datetime", "content"):
        if el.has_attr(attr):
            s = el[attr]
            try:
                if "T" in s:
                    return datetime.fromisoformat(s.replace("Z", "+00:00")).date().isoformat()
                return s.split("T")[0]
            except Exception:
                pass
    text = el.get_text(strip=True)
    for pattern, fmt in _ELEMENT_DATE_PATTERNS:
        m = re.search(pattern, text)
        if m:
            s = m.group(0)
            try:
                return datetime.strptime(s, fmt).date().isoformat()
            except ValueError:
                if fmt == "%m/%d/%Y":
                    try:
                        return datetime.strptime(s, "%d/%m/%Y").date().isoformat()
                    except ValueError:
                        continue
                continue
    return None


def extract_date(el: Node, selectors: dict) -> Optional[str]:
    if "date" in selectors:
        n = _select_first(el, selectors["date"])
        if n is not None:
            return parse_date_element(n)
    for sel in [
        "time", "[itemprop='datePublished']", "[property='article:published_time']",
        ".date", ".published", ".post-date", ".entry-date", ".article-date",
        ".meta-date", "meta[property='article:published_time']",
    ]:
        n = _select_first(el, sel)
        if n is not None:
            return parse_date_element(n)
    for pattern in _TEXT_DATE_PATTERNS:
        rx = re.compile(pattern)
        node_text = el.find(text=rx)
        if node_text:
            m = rx.search(node_text)
            if m:
                s = m.group(0)
                for fmt in ["%d %B %Y", "%B %d, %Y", "%B %d %Y", "%Y-%m-%d", "%m/%d/%Y", "%d/%m/%Y"]:
                    try:
                        return datetime.strptime(s, fmt).isoformat()[:10]
                    except ValueError:
                        continue
    return None


_AUTHOR_TEXT_RXES = [
    re.compile(r"By\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2})"),
    re.compile(r"Author[:\s]+([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2})"),
]


def extract_author(el: Node, selectors: dict) -> Optional[str]:
    if "author" in selectors:
        n = _select_first(el, selectors["author"])
        if n is not None:
            return n.get_text(strip=True)
    for sel in [
        "[itemprop='author']", "[rel='author']", ".author", ".byline",
        ".entry-author", ".post-author", "meta[name='author']", ".meta-author",
    ]:
        n = _select_first(el, sel)
        if n is not None:
            if n.name == "meta" and n.has_attr("content"):
                return n["content"]
            return n.get_text(strip=True)
    for rx in _AUTHOR_TEXT_RXES:
        node_text = el.find(text=rx)
        if node_text:
            m = rx.search(node_text)
            if m:
                return m.group(1)
    return None


def extract_excerpt(el: Node, selectors: dict) -> Optional[str]:
    if "excerpt" in selectors:
        n = _select_first(el, selectors["excerpt"])
        if n is not None:
            # reference content.py:797-800: the USER selector branch has
            # no meta special-case — a meta selector yields '' here and
            # the summarize fallback fills the excerpt later
            return clean_text(n.get_text(strip=True))
    for sel in [
        "[itemprop='description']", "meta[name='description']",
        "meta[property='og:description']", ".excerpt", ".entry-summary",
        ".post-excerpt", ".summary", ".description", ".intro",
    ]:
        n = _select_first(el, sel)
        if n is not None:
            if n.name == "meta" and n.has_attr("content"):
                return clean_text(n["content"])
            return clean_text(n.get_text(strip=True))
    p = el.find("p")
    if p is not None:
        text = p.get_text(strip=True)
        if len(text) > 20:
            return clean_text(text)
    return None


def extract_content(el: Node, selectors: dict) -> Optional[str]:
    if "content" in selectors:
        n = _select_first(el, selectors["content"])
        if n is not None:
            return clean_text(n.get_text(strip=True))
    for sel in [
        "[itemprop='articleBody']", ".entry-content", ".post-content",
        ".article-content", ".content", "article", ".post-body", "#content",
    ]:
        n = _select_first(el, sel)
        if n is not None:
            if len(n.get_text(strip=True)) < 100:
                continue
            return clean_text(n.get_text(strip=True))
    paragraphs = el.find_all("p")
    if len(paragraphs) >= 3:
        content = " ".join(
            p.get_text(strip=True) for p in paragraphs if len(p.get_text(strip=True)) > 20
        )
        if content and len(content) > 200:
            return clean_text(content)
    return None


def _img_src(n: Node, base_url: str) -> Optional[str]:
    if n.name == "img" and n.has_attr("src"):
        src = n["src"]
    elif n.name == "meta" and n.has_attr("content"):
        src = n["content"]
    else:
        return None
    if not src.startswith(("http://", "https://", "data:")):
        src = urljoin(base_url, src)
    return src


def extract_featured_image(el: Node, base_url: str, selectors: dict) -> Optional[str]:
    if "image" in selectors:
        n = _select_first(el, selectors["image"])
        if n is not None:
            src = _img_src(n, base_url)
            if src is not None:
                return src
    for sel in [
        "meta[property='og:image']", "meta[name='twitter:image']", "[itemprop='image']",
        ".featured-image img", ".post-thumbnail img", ".entry-image img",
        "article img:first-of-type", ".wp-post-image",
    ]:
        n = _select_first(el, sel)
        if n is not None:
            src = _img_src(n, base_url)
            if src is not None:
                return src
    img = el.find("img", src=True)
    return _img_src(img, base_url) if img is not None else None


def extract_content_images(el: Node, base_url: str, selectors: dict) -> list[str]:
    def collect(container: Node) -> list[str]:
        out = []
        for img in container.find_all("img", src=True):
            src = img["src"]
            if src.startswith("data:") or "icon" in src.lower():
                continue
            if not src.startswith(_HTTPISH):
                src = urljoin(base_url, src)
            out.append(src)
        return out

    if "content" in selectors:
        n = _select_first(el, selectors["content"])
        if n is not None:
            return collect(n)
    for sel in ["[itemprop='articleBody']", ".entry-content", ".post-content",
                ".article-content", ".content", "article"]:
        n = _select_first(el, sel)
        if n is not None:
            return collect(n)
    return collect(el)


def extract_categories(el: Node, selectors: dict) -> list[str]:
    categories: list[str] = []
    if "categories" in selectors:
        try:
            cats = el.select(selectors["categories"])
        except Exception:
            cats = []
        if cats:
            for c in cats:
                t = c.get_text(strip=True)
                if t:
                    categories.append(t)
            return categories
    for sel in [
        "[itemprop='keywords']", "[rel='category']", ".category", ".tag",
        ".categories", ".tags", ".post-category", ".post-tag",
        "meta[property='article:tag']",
    ]:
        try:
            cats = el.select(sel)
        except Exception:
            continue
        if cats:
            for c in cats:
                t = c["content"] if (c.name == "meta" and c.has_attr("content")) else c.get_text(strip=True)
                if t and t not in categories:
                    categories.append(t)
    return categories


def extract_metadata(el: Node, selectors: dict) -> dict[str, str]:
    """og:/article:/twitter: meta map + reading_time + word_count
    (content.py:1010-1053)."""
    metadata: dict[str, str] = {}
    for meta in el.find_all("meta"):
        if meta.has_attr("property") and meta.has_attr("content"):
            prop = meta["property"]
            if prop.startswith(("og:", "article:")):
                metadata[prop.split(":")[-1]] = meta["content"]
        if meta.has_attr("name") and meta.has_attr("content"):
            name = meta["name"]
            if name.startswith("twitter:"):
                metadata[name.split(":")[-1]] = meta["content"]
            elif name in ("author", "description", "keywords"):
                metadata[name] = meta["content"]
    for sel in (".reading-time", ".read-time", "[itemprop='timeRequired']"):
        n = _select_first(el, sel)
        if n is not None:
            metadata["reading_time"] = n.get_text(strip=True)
            break
    if "content" in selectors:
        n = _select_first(el, selectors["content"])
        if n is not None:
            wc = len(n.get_text(strip=True).split())
            metadata["word_count"] = str(wc)
            if "reading_time" not in metadata:
                metadata["reading_time"] = f"{max(1, round(wc / 200))} min read"
    return metadata


DEFAULT_CONTENT_OPTS = {
    "extract_images": True,
    "extract_metadata": True,
    "generate_summary": True,
    "summary_length": 150,
    "extract_keywords": True,
    "max_keywords": 5,
}


def extract_article_listing(el: Node, base_url: str, selectors: dict,
                            opts: dict | None = None) -> dict[str, Any]:
    """E21 (content.py:458-502)."""
    o = {**DEFAULT_CONTENT_OPTS, **(opts or {})}
    article: dict[str, Any] = {"title": extract_title(el, selectors)}
    if not article["title"]:
        return {}
    article["url"] = extract_article_url(el, base_url, selectors)
    article["date"] = extract_date(el, selectors)
    article["author"] = extract_author(el, selectors)
    article["excerpt"] = extract_excerpt(el, selectors)
    if o["extract_images"]:
        article["image"] = extract_featured_image(el, base_url, selectors)
    article["categories"] = extract_categories(el, selectors)
    article["fetch_full"] = bool(article.get("url") and not article.get("content"))
    return article


def extract_single_article(doc: Node, url: str, selectors: dict,
                           opts: dict | None = None) -> dict[str, Any]:
    """E22 (content.py:504-560)."""
    o = {**DEFAULT_CONTENT_OPTS, **(opts or {})}
    article: dict[str, Any] = {"title": extract_title(doc, selectors)}
    if not article["title"]:
        return {}
    article["url"] = url
    article["date"] = extract_date(doc, selectors)
    article["author"] = extract_author(doc, selectors)
    article["content"] = extract_content(doc, selectors)
    if o["generate_summary"] and article["content"]:
        article["excerpt"] = summarize_text(article["content"], o["summary_length"])
    else:
        article["excerpt"] = extract_excerpt(doc, selectors)
    if o["extract_images"]:
        article["image"] = extract_featured_image(doc, url, selectors)
        article["images"] = extract_content_images(doc, url, selectors)
    article["categories"] = extract_categories(doc, selectors)
    if o["extract_metadata"]:
        article["metadata"] = extract_metadata(doc, selectors)
    if o["extract_keywords"] and article["content"]:
        article["keywords"] = extract_keywords(article["content"], o["max_keywords"])
    return article


def merge_listing_detail(listing: dict, detail: dict) -> dict:
    """T10 merge: listing fields win when present AND truthy
    (content.py:160-165)."""
    merged = dict(listing)
    merged.update({k: v for k, v in detail.items() if k not in merged or not merged[k]})
    return merged


_ISO_DATE_RX = re.compile(r"\d{4}-\d{2}-\d{2}")


def transform_article(article: dict, first_seed_url: str) -> Optional[dict]:
    """T5 (content.py:1074-1133). Returns None for dropped rows.
    ``scraped_at`` is NOT stamped here (nondeterministic in the reference;
    FIXTURES.md compares it structurally) — callers stamp it."""
    if not article or not article.get("title"):
        return None
    a = dict(article)
    a["title"] = a["title"].strip()
    if not a.get("excerpt") and a.get("content"):
        a["excerpt"] = summarize_text(a["content"], 150)
    if a.get("date") and not _ISO_DATE_RX.match(a["date"]):
        for fmt in ["%d %B %Y", "%B %d, %Y", "%B %d %Y", "%Y/%m/%d", "%m/%d/%Y", "%d/%m/%Y"]:
            try:
                a["date"] = datetime.strptime(a["date"], fmt).date().isoformat()
                break
            except ValueError:
                continue
    if a.get("url") and not a["url"].startswith(_HTTPISH):
        p = urlparse(first_seed_url)
        a["url"] = urljoin(f"{p.scheme}://{p.netloc}", a["url"])
    return a


def validate_article(article: dict) -> Optional[dict]:
    """T6 (content.py:1135-1177)."""
    if not article.get("title"):
        return None
    a = dict(article)
    for key in ("url", "date", "author", "excerpt", "content", "image"):
        a.setdefault(key, None)
    a.setdefault("categories", [])
    return a


# ---------------------------------------------------------------------------
# ecommerce (products)
# ---------------------------------------------------------------------------

_PRICE_HAS_RX = re.compile(r"(\$|€|£)\s*\d+\.?\d*")
_PRICE_NUM_RX = re.compile(r"(\d+[.,]\d{2}|\d+)")
_PRICE_ANY_RX = re.compile(r"(\$|€|£)?\s*(\d+[.,]\d{2}|\d+)\s*(\$|€|£)?", re.IGNORECASE)
_CURRENCY_RX = re.compile(r"(\$|€|£|USD|EUR|GBP)")


def find_product_elements(doc: Node, selectors: dict) -> list[Node]:
    """E1 (ecommerce.py:144-197)."""
    for selector in [
        selectors.get("product_container"),
        ".product", ".product-item", ".item", "[data-product-id]",
        ".product-card", ".product-grid-item",
    ]:
        if not selector:
            continue
        try:
            elements = doc.select(selector)
        except Exception:
            continue
        if elements:
            return elements
    candidates = doc.find_all(
        ["div", "li"], class_=lambda x: _has_class_term(x, ["product", "item", "card"])
    )
    if candidates:
        return candidates
    out = []
    for el in doc.find_all(["div", "li"]):
        has_price = el.find(text=_PRICE_HAS_RX)
        has_product = el.find("h2") or el.find("h3") or el.find("a", href=True)
        if has_price and has_product:
            out.append(el)
    return out


def parse_price(price_text: Optional[str]) -> Optional[float]:
    """E4 (ecommerce.py:307-327): first number, comma→dot."""
    if not price_text:
        return None
    m = _PRICE_NUM_RX.search(price_text)
    if m:
        try:
            return float(m.group(0).replace(",", "."))
        except ValueError:
            return None
    return None


def parse_rating(rating_text: Optional[str]) -> Optional[float]:
    """E9 (ecommerce.py:492-528): /2 if 5<r≤10; X/Y → ×5; ★ count."""
    if not rating_text:
        return None
    m = re.search(r"(\d+\.\d+|\d+)", rating_text)
    if m:
        try:
            rating = float(m.group(1))
            if 5 < rating <= 10:
                rating /= 2
            return round(rating, 1)
        except ValueError:
            pass
    m = re.search(r"(\d+)\s*/\s*(\d+)", rating_text)
    if m:
        try:
            num, den = float(m.group(1)), float(m.group(2))
            if den > 0:
                return round(num / den * 5, 1)
        except ValueError:
            pass
    stars = rating_text.count("★")
    return stars if stars > 0 else None


def _extract_generic_field(el: Node, selector: str) -> Optional[str]:
    """E10 (ecommerce.py:530-547): CSS only; XPath unsupported → None.
    Selector errors PROPAGATE — the reference's per-field try/except
    (ecommerce.py:241-244, business.py:243-248) leaves the key ABSENT
    from the record on error, unlike the main fields' lenient
    ``_select_first`` fallback policy; callers wrap accordingly."""
    if not selector or selector.startswith("/"):
        return None
    n = el.select_one(selector)
    return n.get_text(strip=True) if n is not None else None


DEFAULT_ECOM_OPTS = {
    "currency_symbol": "$",
    "extract_reviews": True,
    "extract_images": True,
}


def extract_product(el: Node, selectors: dict, opts: dict | None = None) -> dict[str, Any]:
    """E2-E10 (ecommerce.py:199-246)."""
    o = {**DEFAULT_ECOM_OPTS, **(opts or {})}
    product: dict[str, Any] = {}
    # name
    name = None
    if "name" in selectors:
        n = _select_first(el, selectors["name"])
        if n is not None:
            name = n.get_text(strip=True)
    if name is None:
        for sel in ["h1", "h2", "h3", ".product-name", ".product-title",
                    "[itemprop='name']", ".title", ".name"]:
            n = _select_first(el, sel)
            if n is not None:
                name = n.get_text(strip=True)
                break
    if name is None:
        link = el.find("a")
        if link is not None and link.get_text(strip=True):
            name = link.get_text(strip=True)
    product["name"] = name
    if not product["name"]:
        return {}
    # price — the reference RETURNS the parse result of the FIRST
    # matched element, even when it is None (ecommerce.py:277-293):
    # an unparseable matched price must not fall through to later
    # selectors or the loose-text regex
    price = None
    matched_price_el = False
    if "price" in selectors:
        n = _select_first(el, selectors["price"])
        if n is not None:
            matched_price_el = True
            price = parse_price(n.get_text(strip=True))
    if not matched_price_el:
        for sel in [".price", ".product-price", "[itemprop='price']",
                    ".price-current", ".price-new", ".current-price"]:
            n = _select_first(el, sel)
            if n is not None:
                matched_price_el = True
                price = parse_price(n.get_text(strip=True))
                break
    if not matched_price_el:
        node_text = el.find(text=_PRICE_ANY_RX)
        if node_text:
            price = parse_price(node_text)
    product["price"] = price
    # currency
    currency = None
    if "currency" in selectors:
        n = _select_first(el, selectors["currency"])
        if n is not None:
            m = _CURRENCY_RX.search(n.get_text(strip=True))
            if m:
                currency = m.group(0)
    if currency is None:
        pe = None
        if "price" in selectors:
            pe = _select_first(el, selectors["price"])
        if pe is None:
            pe = _select_first(el, ".price, .product-price, [itemprop='price']")
        if pe is not None:
            m = _CURRENCY_RX.search(pe.get_text(strip=True))
            if m:
                currency = m.group(0)
    product["currency"] = currency if currency is not None else o["currency_symbol"]
    # url
    url = None
    if "url" in selectors:
        n = _select_first(el, selectors["url"])
        if n is not None and n.has_attr("href"):
            url = n["href"]
    if url is None:
        link = el.find("a", href=True)
        if link is not None:
            url = link["href"]
    product["url"] = url
    # availability
    avail = None
    if "availability" in selectors:
        n = _select_first(el, selectors["availability"])
        if n is not None:
            avail = n.get_text(strip=True)
    if avail is None:
        for sel in ["[itemprop='availability']", ".availability", ".stock-status",
                    ".in-stock", ".out-of-stock"]:
            n = _select_first(el, sel)
            if n is not None:
                avail = n.get_text(strip=True)
                break
    if avail is None:
        for pattern, status in [
            (r"in\s*stock", "In Stock"), (r"out\s*of\s*stock", "Out of Stock"),
            (r"available", "Available"), (r"unavailable", "Unavailable"),
        ]:
            if el.find(text=re.compile(pattern, re.IGNORECASE)):
                avail = status
                break
    product["availability"] = avail if avail is not None else "Unknown"
    if o["extract_images"]:
        images: list[str] = []
        if "images" in selectors:
            try:
                imgs = el.select(selectors["images"])
            except Exception:
                imgs = []
            for img in imgs:
                if img.has_attr("src"):
                    images.append(img["src"])
                elif img.has_attr("data-src"):
                    images.append(img["data-src"])
        if not images:
            for img in el.select("img"):
                src = None
                for attr in ("src", "data-src", "data-lazy-src", "data-original"):
                    if img.has_attr(attr):
                        src = img[attr]
                        break
                if src and not src.startswith("data:"):
                    images.append(src)
        product["images"] = images
    if o["extract_reviews"]:
        reviews: dict[str, Any] = {}
        if "rating" in selectors:
            n = _select_first(el, selectors["rating"])
            if n is not None:
                reviews["rating"] = parse_rating(n.get_text(strip=True))
        if "rating" not in reviews:
            # reference ecommerce.py:448-465 has NO break: every matching
            # selector overwrites, so the LAST match wins
            for sel in ["[itemprop='ratingValue']", ".rating", ".stars", ".star-rating"]:
                n = _select_first(el, sel)
                if n is not None:
                    if n.has_attr("style"):
                        m = re.search(r"(\d+)%", n["style"])
                        if m:
                            reviews["rating"] = round((int(m.group(1)) / 100) * 5, 1)
                    else:
                        reviews["rating"] = parse_rating(n.get_text(strip=True))
        if "review_count" in selectors:
            n = _select_first(el, selectors["review_count"])
            if n is not None:
                m = re.search(r"(\d+)", n.get_text(strip=True))
                if m:
                    reviews["count"] = int(m.group(1))
        if "count" not in reviews:
            # reference ecommerce.py:476-489: no break — last match wins,
            # and a selector whose text has no digits sets nothing
            for sel in ["[itemprop='reviewCount']", ".review-count", ".ratings-count"]:
                n = _select_first(el, sel)
                if n is not None:
                    m = re.search(r"(\d+)", n.get_text(strip=True))
                    if m:
                        reviews["count"] = int(m.group(1))
        product["reviews"] = reviews if reviews else None
    for field, selector in selectors.items():
        if field not in ("product_container",) and field not in product:
            try:
                product[field] = _extract_generic_field(el, selector)
            except Exception:
                pass  # reference ecommerce.py:241-244: key stays absent
    return product


def transform_product(product: dict, first_seed_url: str) -> Optional[dict]:
    """T1 (ecommerce.py:549-594), sans scraped_at stamping."""
    if not product or not product.get("name"):
        return None
    p = dict(product)
    if isinstance(p.get("price"), str):
        p["price"] = parse_price(p["price"])
    p["name"] = p["name"].strip()
    if p.get("url") and not p["url"].startswith(_HTTPISH) and p["url"].startswith("/"):
        parsed = urlparse(first_seed_url)
        p["url"] = f"{parsed.scheme}://{parsed.netloc}{p['url']}"
    return p


def validate_product(product: dict, currency_symbol: str = "$") -> Optional[dict]:
    """T2 (ecommerce.py:596-628)."""
    if not product.get("name"):
        return None
    p = dict(product)
    p.setdefault("price", None)
    p.setdefault("currency", currency_symbol)
    p.setdefault("availability", "Unknown")
    p.setdefault("images", [])
    return p


# ---------------------------------------------------------------------------
# business (directory listings)
# ---------------------------------------------------------------------------

_PHONE_TEXT_RXES = [
    re.compile(r"\(\d{3}\)\s*\d{3}[-.]?\d{4}"),
    re.compile(r"\d{3}[-.\s]?\d{3}[-.\s]?\d{4}"),
    re.compile(r"\+\d{1,3}[-.\s]?\d{3}[-.\s]?\d{3}[-.\s]?\d{4}"),
]
_EMAIL_RX = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_ADDR_RX = re.compile(
    r"\d+\s+[A-Za-z0-9\s\.,]+,\s+[A-Za-z\s]+,\s+[A-Z]{2}(\s+\d{5})?", re.IGNORECASE
)
SOCIAL_PATTERNS = {
    "facebook": [r"facebook\.com", r"fb\.com"],
    "twitter": [r"twitter\.com", r"x\.com"],
    "linkedin": [r"linkedin\.com"],
    "instagram": [r"instagram\.com"],
    "youtube": [r"youtube\.com", r"youtu\.be"],
    "pinterest": [r"pinterest\.com"],
    "yelp": [r"yelp\.com"],
}

DEFAULT_BIZ_OPTS = {
    "extract_social_media": True,
    "validate_emails": True,
    "validate_phones": True,
    "validate_urls": True,
    "country_code": "US",
}


def find_business_elements(doc: Node, selectors: dict) -> list[Node]:
    """E11 (business.py:147-202)."""
    for selector in [
        selectors.get("business_container"),
        ".business", ".business-listing", ".listing", ".vcard", ".result",
        "[itemtype*='LocalBusiness']", ".business-card", ".directory-listing",
    ]:
        if not selector:
            continue
        try:
            elements = doc.select(selector)
        except Exception:
            continue
        if elements:
            return elements
    candidates = doc.find_all(
        ["div", "li"],
        class_=lambda x: _has_class_term(x, ["business", "listing", "result", "vcard", "card"]),
    )
    if candidates:
        return candidates
    out = []
    for el in doc.find_all(["div", "li", "article"]):
        has_name = el.find(["h1", "h2", "h3", "h4", "strong", "b"])
        has_contact = (
            el.find(text=re.compile(r"\(\d{3}\)\s*\d{3}-\d{4}"))
            or el.find(text=_EMAIL_RX)
            or el.find("address")
            or el.find(text=re.compile(r"\d+\s+[A-Za-z\s]+,\s+[A-Za-z\s]+,\s+[A-Z]{2}"))
        )
        if has_name and has_contact:
            out.append(el)
    return out


def parse_phone(phone_text: Optional[str], opts: dict) -> Optional[str]:
    """E14 parse step (business.py:357-372)."""
    if not phone_text:
        return None
    digits = re.sub(r"[^\d+]", "", phone_text)
    if not digits:
        return None
    if opts["validate_phones"] and not is_valid_phone(digits, opts["country_code"]):
        return None
    return digits


def parse_email(email_text: Optional[str], opts: dict) -> Optional[str]:
    """E15 parse step (business.py:415-431)."""
    if not email_text:
        return None
    m = _EMAIL_RX.search(email_text)
    if m:
        email = m.group(0)
        if opts["validate_emails"] and not is_valid_email(email):
            return None
        return email
    return None


def clean_url(url: Optional[str], opts: dict) -> Optional[str]:
    """T11 (business.py:476-492)."""
    if not url:
        return None
    url = re.sub(r"[?#].*$", "", url)
    if not url.startswith(_HTTPISH):
        url = "http://" + url
    if opts["validate_urls"] and not is_valid_url(url):
        return None
    return url


def extract_business(el: Node, selectors: dict, opts: dict | None = None) -> dict[str, Any]:
    """E12-E17 (business.py:204-250)."""
    o = {**DEFAULT_BIZ_OPTS, **(opts or {})}
    biz: dict[str, Any] = {}
    # name (business.py:252-283)
    name = None
    if "name" in selectors:
        n = _select_first(el, selectors["name"])
        if n is not None:
            name = n.get_text(strip=True)
    if name is None:
        for sel in ["h1", "h2", "h3", ".business-name", ".listing-name",
                    "[itemprop='name']", ".name", ".title"]:
            n = _select_first(el, sel)
            if n is not None:
                name = n.get_text(strip=True)
                break
    if name is None:
        link = el.find("a", class_=lambda x: _has_class_term(x, ["name", "title", "business"]))
        if link is not None and link.get_text(strip=True):
            name = link.get_text(strip=True)
    if name is None:
        heading = el.find(["h1", "h2", "h3", "h4", "strong", "b"])
        if heading is not None:
            name = heading.get_text(strip=True)
    biz["name"] = name
    if not biz["name"]:
        return {}
    # address (business.py:285-315)
    addr = None
    if "address" in selectors:
        n = _select_first(el, selectors["address"])
        if n is not None:
            addr = n.get_text(strip=True)
    if addr is None:
        for sel in ["address", "[itemprop='address']", ".address",
                    ".business-address", ".street-address"]:
            n = _select_first(el, sel)
            if n is not None:
                addr = n.get_text(strip=True)
                break
    if addr is None:
        node_text = el.find(text=_ADDR_RX)
        if node_text:
            addr = node_text.strip()
    biz["address"] = addr
    # phone (business.py:317-355) — like price, the reference returns
    # _parse_phone's result for the FIRST matched element even when it
    # is None; only a total selector miss reaches the text-regex scan
    phone = None
    matched_phone_el = False
    if "phone" in selectors:
        n = _select_first(el, selectors["phone"])
        if n is not None:
            matched_phone_el = True
            phone = parse_phone(n.get_text(strip=True), o)
    if not matched_phone_el:
        for sel in ["[itemprop='telephone']", ".phone", ".tel",
                    ".business-phone", ".phone-number"]:
            n = _select_first(el, sel)
            if n is not None:
                matched_phone_el = True
                phone = parse_phone(n.get_text(strip=True), o)
                break
    if not matched_phone_el:
        for rx in _PHONE_TEXT_RXES:
            node_text = el.find(text=rx)
            if node_text:
                m = rx.search(node_text)
                if m:
                    phone = m.group(0)
                    break
    biz["phone"] = phone
    # email (business.py:374-413)
    email = None
    matched_email_el = False
    if "email" in selectors:
        n = _select_first(el, selectors["email"])
        if n is not None:
            matched_email_el = True
            if n.name == "a" and n.has_attr("href") and n["href"].startswith("mailto:"):
                cand = n["href"][7:]
                email = cand if (not o["validate_emails"] or is_valid_email(cand)) else None
            else:
                email = parse_email(n.get_text(strip=True), o)
    if not matched_email_el:
        for sel in ["[itemprop='email']", ".email", ".business-email", "a[href^='mailto:']"]:
            n = _select_first(el, sel)
            if n is not None:
                matched_email_el = True
                if n.name == "a" and n.has_attr("href") and n["href"].startswith("mailto:"):
                    cand = n["href"][7:]
                    email = cand if (not o["validate_emails"] or is_valid_email(cand)) else None
                else:
                    email = parse_email(n.get_text(strip=True), o)
                break
    if not matched_email_el:
        node_text = el.find(text=_EMAIL_RX)
        if node_text:
            m = _EMAIL_RX.search(node_text)
            if m:
                cand = m.group(0)
                email = cand if (not o["validate_emails"] or is_valid_email(cand)) else None
    biz["email"] = email
    # website (business.py:433-474)
    website = None
    matched_site = False
    if "website" in selectors:
        n = _select_first(el, selectors["website"])
        if n is not None and n.name == "a" and n.has_attr("href"):
            href = n["href"]
            matched_site = True
            website = None if href.startswith(("mailto:", "tel:")) else clean_url(href, o)
    if not matched_site:
        for sel in ["[itemprop='url']", ".website", ".url", ".business-website", ".web"]:
            n = _select_first(el, sel)
            if n is not None and n.name == "a" and n.has_attr("href"):
                href = n["href"]
                if href.startswith(("mailto:", "tel:")):
                    continue
                website = clean_url(href, o)
                matched_site = True
                break
    if not matched_site:
        for link in el.find_all("a", href=True):
            href = link["href"]
            if href.startswith(("mailto:", "tel:", "#", "/")):
                continue
            cleaned = clean_url(href, o)
            if cleaned:
                website = cleaned
                break
    biz["website"] = website
    if o["extract_social_media"]:
        social: dict[str, str] = {}
        for link in el.find_all("a", href=True):
            href = link["href"]
            for platform, patterns in SOCIAL_PATTERNS.items():
                if any(re.search(p, href, re.IGNORECASE) for p in patterns):
                    social[platform] = href
                    break
        biz["social_media"] = social
    # categories (business.py:520-548) — NOTE: unlike the content scraper,
    # the business one appends common-pattern matches even when the
    # selector already matched, and does NOT dedup.
    categories: list[str] = []
    if "categories" in selectors:
        try:
            cats = el.select(selectors["categories"])
        except Exception:
            cats = []
        for c in cats:
            t = c.get_text(strip=True)
            if t:
                categories.append(t)
    for sel in ["[itemprop='category']", ".category", ".categories",
                ".business-category", ".tags"]:
        try:
            cats = el.select(sel)
        except Exception:
            continue
        for c in cats:
            t = c.get_text(strip=True)
            if t:
                categories.append(t)
    biz["categories"] = categories
    for field, selector in selectors.items():
        if field not in ("business_container",) and field not in biz:
            try:
                biz[field] = _extract_generic_field(el, selector)
            except Exception:
                pass  # reference business.py:243-248: key stays absent
    return biz


def transform_business(biz: dict) -> Optional[dict]:
    """T3 (business.py:569-621), sans scraped_at stamping."""
    if not biz or not biz.get("name"):
        return None
    b = dict(biz)
    b["name"] = b["name"].strip()
    if b.get("phone"):
        phone = re.sub(r"[^\d+]", "", b["phone"])
        if len(phone) == 10:
            b["phone"] = f"{phone[:3]}-{phone[3:6]}-{phone[6:]}"
        elif len(phone) > 10 and phone.startswith("+"):
            b["phone"] = phone
        elif len(phone) == 11 and phone.startswith("1"):
            b["phone"] = f"+{phone[0]}-{phone[1:4]}-{phone[4:7]}-{phone[7:]}"
    if b.get("website") and not b["website"].startswith(_HTTPISH):
        b["website"] = "http://" + b["website"]
    if b.get("email"):
        b["email"] = b["email"].lower().strip()
    return b


def validate_business(biz: dict, opts: dict | None = None) -> Optional[dict]:
    """T4 (business.py:623-677)."""
    o = {**DEFAULT_BIZ_OPTS, **(opts or {})}
    if not biz.get("name"):
        return None
    b = dict(biz)
    if b.get("email") and o["validate_emails"] and not is_valid_email(b["email"]):
        b["email"] = None
    if b.get("phone") and o["validate_phones"] and not is_valid_phone(b["phone"], o["country_code"]):
        b["phone"] = None
    if b.get("website") and o["validate_urls"] and not is_valid_url(b["website"]):
        b["website"] = None
    for key in ("address", "phone", "email", "website"):
        b.setdefault(key, None)
    b.setdefault("categories", [])
    return b
