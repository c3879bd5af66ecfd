import re

import pytest

from web_scrapper_ray.minidom import SelectorError, parse_html

HTML = """
<html><head>
<meta property="og:title" content="OG Title">
<meta property="og:image" content="/img/feat.png">
<meta name="twitter:card" content="summary">
</head><body>
<div class="wrap">
  <article class="post" id="a1">
    <h2 class="entry-title"><a href="/posts/1">First Post</a></h2>
    <time datetime="2023-05-01T10:00:00Z">May 1, 2023</time>
    <span class="author">Jane Roe</span>
    <p class="excerpt">A short excerpt of the first post.</p>
    <div class="entry-content">
      <p>Paragraph one with enough text to count as content here.</p>
      <img src="/img/one.png" alt="one">
      <img src="data:image/gif;base64,x" alt="inline">
    </div>
    <a class="tag" href="/t/a">alpha</a><a class="tag" href="/t/b">beta</a>
  </article>
  <article class="post" id="a2">
    <h2 class="entry-title"><a href="/posts/2">Second Post</a></h2>
    <p>Call (555) 123-4567 or mail <a href="mailto:x@real.org">x@real.org</a></p>
  </article>
  <nav class="pagination"><span class="current">1</span><a href="/page/2/">2</a>
    <a rel="next" href="?page=2">Next</a></nav>
</div>
</body></html>
"""

DOC = parse_html(HTML)


def test_select_tag_and_class():
    assert len(DOC.select("article")) == 2
    assert len(DOC.select(".post")) == 2
    assert DOC.select_one("#a2").attrs["id"] == "a2"
    assert len(DOC.select("article .tag")) == 2


def test_select_compound_and_attr():
    el = DOC.select_one("h2.entry-title a")
    assert el.get_text(strip=True) == "First Post"
    assert DOC.select_one("a[rel='next']")["href"] == "?page=2"
    assert DOC.select_one("meta[property='og:title']")["content"] == "OG Title"
    assert DOC.select_one("a[href^='mailto:']")["href"] == "mailto:x@real.org"
    assert DOC.select_one("[itemtype*='Nope']") is None


def test_select_child_and_first_of_type():
    assert DOC.select_one(".pagination > a")["href"] == "/page/2/"
    first = DOC.select_one("article img:first-of-type")
    assert first["src"] == "/img/one.png"


def test_contains_pseudo():
    el = DOC.select_one("a:contains('Next')")
    assert el is not None and el["href"] == "?page=2"
    assert DOC.select_one("a:contains('Nope')") is None
    with pytest.raises(SelectorError):
        DOC.select_one("a:nth-child(2)")


def test_get_text_strip_concatenates():
    h2 = DOC.select_one("#a1 h2")
    assert h2.get_text(strip=True) == "First Post"
    art = DOC.select_one("#a2")
    assert "Second Post" in art.get_text()


def test_find_api():
    art = DOC.select_one("#a1")
    assert art.find("a", href=True)["href"] == "/posts/1"
    assert art.find(["h1", "h2", "h3"]).name == "h2"
    assert DOC.find("meta", property="og:title")["content"] == "OG Title"
    node = DOC.find(class_=lambda x: x and "entry-content" in x)
    assert node.name == "div"
    # text regex returns the string of the matching text node
    m = DOC.find(text=re.compile(r"\(\d{3}\)\s*\d{3}-\d{4}"))
    assert "(555) 123-4567" in m


def test_find_next_sibling():
    cur = DOC.select_one(".current")
    nxt = cur.find_next_sibling()
    assert nxt.name == "a" and nxt["href"] == "/page/2/"


def test_void_and_malformed():
    doc = parse_html("<p>a<br>b<img src=x><p>second")
    assert len(doc.find_all("p")) == 2
    assert doc.find("img")["src"] == "x"


def test_bs4_comment_and_script_text_semantics():
    """bs4 ≥4.9 parity: get_text() excludes comments and script/style/
    template contents; find(text=...) still searches them; a comment
    counts as a child for tag.string purposes."""
    import re

    from web_scrapper_ray.minidom import parse_html

    doc = parse_html(
        "<div><p>Short intro</p>"
        "<script>{\"very\":\"long blob\"}</script>"
        "<style>.x{color:red}</style>"
        "<template><span>ghost</span></template>"
        "<!-- 12/25/2022 --></div>"
    )
    assert doc.get_text() == "Short intro"
    # find(text=) walks ALL strings, comments and script text included
    assert doc.find(text=re.compile(r"\d{1,2}/\d{1,2}/\d{4}")) == " 12/25/2022 "
    assert doc.find(text=re.compile("long blob")) is not None
    # a comment is a CHILD: <a>5<!--c--></a> has 2 children → .string
    # None → find('a', text=...) does not match (bs4 tag.string rule)
    doc2 = parse_html('<div><a>5<!--c--></a><a>7</a></div>')
    assert doc2.find("a", text=re.compile(r"\d")).get_text() == "7"


def test_bs4_legacy_void_tags():
    """bs4's extra empty-element tags close immediately: content after
    <image>/<spacer>/... must be a SIBLING, not nested underneath."""
    from web_scrapper_ray.minidom import parse_html

    doc = parse_html('<div><image src="x.png"><p class="price">$9.99</p></div>')
    div = doc.find("div")
    assert [c.name for c in div.element_children()] == ["image", "p"]
    assert doc.select_one("div > p.price") is not None
