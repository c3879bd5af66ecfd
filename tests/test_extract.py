"""Per-operator extraction unit tests (SURVEY.md §5.1 item 2) — pinned
against hand-written HTML, independent of the synthetic world."""

import pytest

from web_scrapper_ray import extract
from web_scrapper_ray.minidom import parse_html


def test_parse_price():
    assert extract.parse_price("$12.34") == 12.34
    assert extract.parse_price("12,34 €") == 12.34
    assert extract.parse_price("1299") == 1299.0
    assert extract.parse_price("no digits") is None
    assert extract.parse_price("") is None


def test_parse_rating_reference_quirks():
    assert extract.parse_rating("4.5 stars") == 4.5
    # reference ecommerce.py:504-506: 5<r<=10 halved
    assert extract.parse_rating("9.0") == 4.5
    assert extract.parse_rating("10") == 5.0
    assert extract.parse_rating("11") == 11.0  # >10 NOT halved
    assert extract.parse_rating("★★★☆☆") == 3
    assert extract.parse_rating("") is None
    # N.B. "4/5" hits the float branch first (4.0), matching the reference
    assert extract.parse_rating("4/5") == 4.0


def test_rating_style_percent():
    el = parse_html('<div><span class="rating" style="width: 80%"></span></div>')
    p = extract.extract_product(
        el, {"name": ".x"}, None
    )
    # no name → empty
    assert p == {}
    el2 = parse_html(
        '<div><h3>P</h3><span class="rating" style="width: 80%"></span></div>'
    )
    p2 = extract.extract_product(el2, {}, None)
    assert p2["reviews"]["rating"] == 4.0


def test_phone_parse_and_transform():
    opts = dict(extract.DEFAULT_BIZ_OPTS)
    assert extract.parse_phone("(555) 123-4567", opts) == "5551234567"
    assert extract.parse_phone("1111111", opts) is None  # fake
    b = extract.transform_business({"name": " X ", "phone": "5551234567"})
    assert b["phone"] == "555-123-4567"
    b = extract.transform_business({"name": "X", "phone": "15551234567"})
    assert b["phone"] == "+1-555-123-4567"


def test_clean_url_strips_tracking():
    opts = dict(extract.DEFAULT_BIZ_OPTS)
    assert extract.clean_url("http://a-site.org/p?utm=1#frag", opts) == "http://a-site.org/p"
    assert extract.clean_url("a-site.org/p", opts) == "http://a-site.org/p"
    assert extract.clean_url("http://localhost/x", opts) is None  # validator


def test_date_parsing_chain():
    el = parse_html('<time datetime="2023-05-01T10:00:00Z">whenever</time>')
    assert extract.parse_date_element(el.find("time")) == "2023-05-01"
    el = parse_html("<span>Published May 1, 2023 ok</span>")
    assert extract.parse_date_element(el.find("span")) == "2023-05-01"
    el = parse_html("<span>01/05/2023</span>")
    assert extract.parse_date_element(el.find("span")) == "2023-01-05"  # %m/%d first


def test_merge_listing_wins_when_truthy():
    listing = {"title": "L", "excerpt": "", "image": "http://h/t.png"}
    detail = {"title": "D", "excerpt": "DE", "content": "C", "image": "http://h/og.png"}
    m = extract.merge_listing_detail(listing, detail)
    assert m["title"] == "L"          # listing non-empty wins
    assert m["excerpt"] == "DE"       # listing falsy loses
    assert m["image"] == "http://h/t.png"
    assert m["content"] == "C"        # detail-only key added


def test_transform_article_date_normalization():
    a = extract.transform_article({"title": " T ", "date": "May 1, 2023"}, "http://h/")
    assert a["title"] == "T" and a["date"] == "2023-05-01"
    a = extract.transform_article({"title": "T", "date": "gibberish"}, "http://h/")
    assert a["date"] == "gibberish"   # kept when unparseable
    assert extract.transform_article({}, "http://h/") is None


def test_validate_article_backfill():
    a = extract.validate_article({"title": "T"})
    assert a["url"] is None and a["categories"] == []
    assert extract.validate_article({"title": ""}) is None


def test_find_next_page_shapes():
    base = "http://h/blog/"
    doc = parse_html('<nav><a rel="next" href="?page=2">Next</a></nav>')
    assert extract.find_next_page(doc, base) == "http://h/blog/?page=2"
    doc = parse_html('<nav class="pagination"><span class="current">1</span>'
                     '<a href="/blog/page/2/">2</a></nav>')
    # current-page sibling branch
    assert extract.find_next_page(doc, base) == "http://h/blog/page/2/"
    # query pattern branch
    doc = parse_html("<div>no links</div>")
    assert extract.find_next_page(doc, "http://h/blog/?page=3") == "http://h/blog/?page=4"
    # path pattern branch
    assert extract.find_next_page(doc, "http://h/blog/page/3/") == "http://h/blog/page/4/"
    # first-page /page/ discovery
    doc = parse_html('<a href="/blog/page/2/">2</a>')
    assert extract.find_next_page(doc, "http://h/blog/") == "http://h/blog/page/2/"
    assert extract.find_next_page(parse_html("<p>x</p>"), "http://h/other") is None


def test_is_article_page_routing():
    listing = parse_html(
        '<div class="post-list posts">' +
        "".join(
            f'<article class="post-item"><h2 class="entry-title"><a href="/p{i}">T{i}</a></h2>'
            f"<time>2023-01-01</time></article>"
            for i in range(4)
        ) + "</div>"
    )
    assert not extract.is_article_page(listing)
    article = parse_html(
        '<head><meta property="og:type" content="article"></head>'
        '<article><h1 class="entry-title" itemprop="headline">T</h1>'
        '<div class="entry-content">' + "<p>long paragraph text here</p>" * 7 + "</div></article>"
    )
    assert extract.is_article_page(article)


def test_extract_product_additional_selector_fields():
    html = (
        '<div class="product-item"><h3 class="product-title">Widget</h3>'
        '<span class="price">€9,99</span><a href="/p/1">v</a>'
        '<span class="rating">4.2</span><span class="review-count">17 reviews</span></div>'
    )
    el = parse_html(html).select_one(".product-item")
    p = extract.extract_product(
        el,
        {"product_container": ".product-item", "name": ".product-title",
         "price": ".price", "rating": ".rating", "review_count": ".review-count"},
    )
    assert p["price"] == 9.99 and p["currency"] == "€"
    assert p["reviews"] == {"rating": 4.2, "count": 17}
    # reference quirk: extra selector keys become string fields too
    assert p["rating"] == "4.2" and p["review_count"] == "17 reviews"


def test_business_email_mailto_and_validation():
    html = (
        '<div class="business-listing"><h3 class="business-name">B</h3>'
        '<a class="email" href="mailto:x@example.com">x@example.com</a></div>'
    )
    el = parse_html(html).select_one(".business-listing")
    b = extract.extract_business(el, {"name": ".business-name", "email": ".email"})
    assert b["email"] is None  # example.com blocklisted by validator


def test_price_phone_first_match_wins_even_if_unparseable():
    """Reference parity (ecommerce.py:277-293, business.py:320-337): the
    FIRST matched price/phone element decides — an unparseable text
    must NOT fall through to later selectors or text-regex fallbacks."""
    from web_scrapper_ray.extract import extract_business, extract_product
    from web_scrapper_ray.minidom import parse_html

    el = parse_html(
        '<div><span class="p">Call for price</span>'
        '<span class="price">$9.99</span></div>')
    prod = extract_product(el, {"name": "missing", "price": ".p"})
    # name falls back to <a> (absent) → {} guard; give it a name anchor
    el2 = parse_html(
        '<div><a href="/x">Widget</a><span class="p">Call for price</span>'
        '<span class="price">$9.99</span></div>')
    prod = extract_product(el2, {"price": ".p"})
    assert prod["price"] is None
    # common-pattern loop has the same first-match-wins semantics
    el3 = parse_html(
        '<div><a href="/x">Widget</a><span class="price">Sale!</span>'
        '<span>only $5.99</span></div>')
    assert extract_product(el3, {})["price"] is None

    biz = parse_html(
        '<div><h2>Acme</h2><span class="ph">call us!</span>'
        '<span>(555) 123-4567</span></div>')
    assert extract_business(biz, {"phone": ".ph"})["phone"] is None
    biz2 = parse_html(
        '<div><h2>Acme</h2><span class="phone">1111111</span>'
        '<span>(555) 123-4567</span></div>')
    assert extract_business(biz2, {})["phone"] is None


def test_generic_extra_field_absent_on_selector_error():
    """Reference parity (ecommerce.py:241-244): an invalid extra-field
    selector leaves the key ABSENT from the record, not None."""
    from web_scrapper_ray.extract import extract_product
    from web_scrapper_ray.minidom import parse_html

    el = parse_html('<div><a href="/x">Widget</a><span class="sku">S1</span></div>')
    prod = extract_product(el, {"sku": ".sku", "bad": "??!bogus"})
    assert prod["sku"] == "S1"
    assert "bad" not in prod
