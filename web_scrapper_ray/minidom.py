"""Minimal HTML DOM + CSS selector engine (stdlib only).

The reference engine parses pages with BeautifulSoup + soupsieve
(`/root/reference/src/webscraper/scrapers/content.py:126`); neither is
installed in this container, so this module provides the subset both the
engine's parse stages and the vendored sequential oracle need:

* an ``html.parser``-based tree (``Node``) with ``get_text``,
  ``find`` / ``find_all`` (by tag, class_ predicate, attrs, text regex),
  ``find_next_sibling``, attribute access;
* a CSS selector engine covering the selector shapes the reference
  actually uses: tag, ``*``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=v]``, ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``, compound
  simple selectors, descendant / child combinators, comma groups and
  ``:first-of-type``.

``:contains(text)`` matches soupsieve's non-standard pseudo-class
(substring of the element's text), used by the reference's
``a:contains('Next')`` next-page selectors (``content.py:363-372``).
Other unsupported pseudo-classes raise ``SelectorError``, which callers
swallow exactly like the reference's ``except Exception: continue``.

Semantics notes (matched against bs4 behavior):
* ``get_text(strip=True)`` concatenates the **stripped** text segments
  with no separator, dropping whitespace-only segments.
* ``find(text=regex)`` returns the matching text-node *string* in
  document order (bs4 returns a NavigableString).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Optional, Union

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
    # bs4's HTMLTreeBuilder adds these legacy empty-element tags —
    # without them, content following e.g. <image> or <spacer> nests
    # UNDER the tag instead of becoming a sibling, shifting sibling/
    # nth-of-type results vs the reference
    "basefont", "bgsound", "command", "frame", "image", "isindex",
    "keygen", "menuitem", "nextid", "spacer",
}

# bs4 ≥4.9 (reference pins beautifulsoup4>=4.11.1): get_text() excludes
# the contents of these "string container" tags
_NO_TEXT_TAGS = {"script", "style", "template"}


class Comment(str):
    """An HTML comment's text. Subclasses ``str`` so it lives in
    ``children`` like any text node (bs4's Comment is a
    NavigableString): it counts toward ``tag.string``'s child count and
    is searched by ``find(text=...)``, but ``get_text()`` skips it."""

    __slots__ = ()


class SelectorError(ValueError):
    """Raised for unsupported selector syntax (mirrors soupsieve errors)."""


class Node:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str], parent: Optional["Node"]):
        self.name = name
        self.attrs = attrs
        self.children: list[Union["Node", str]] = []
        self.parent = parent

    # -- attribute access -------------------------------------------------
    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- traversal --------------------------------------------------------
    def iter_desc(self) -> Iterator["Node"]:
        """All descendant element nodes in document order (excluding self)."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_desc()

    def iter_text(self) -> Iterator[str]:
        """Strings contributing to ``get_text()`` — bs4 semantics:
        comments and script/style/template contents are excluded."""
        for child in self.children:
            if isinstance(child, Node):
                if child.name in _NO_TEXT_TAGS:
                    continue
                yield from child.iter_text()
            elif not isinstance(child, Comment):
                yield child

    def iter_all_strings(self) -> Iterator[str]:
        """Every string in the subtree, comments and script/style text
        included — what bs4's ``find(text=...)`` walks (it filters
        NavigableStrings over .descendants, and Comment is one)."""
        for child in self.children:
            if isinstance(child, Node):
                yield from child.iter_all_strings()
            else:
                yield child

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def find_next_sibling(self) -> Optional["Node"]:
        if self.parent is None:
            return None
        sibs = self.parent.element_children()
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    # -- text -------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = list(self.iter_text())
        if strip:
            parts = [p.strip() for p in parts]
            parts = [p for p in parts if p]
        return separator.join(parts)

    # -- bs4-style find ---------------------------------------------------
    def _match_find(
        self,
        node: "Node",
        name,
        class_,
        attrs: dict,
        href,
        src,
    ) -> bool:
        if name is not None:
            names = [name] if isinstance(name, str) else list(name)
            if node.name not in names:
                return False
        if class_ is not None:
            cval = node.attrs.get("class")
            if callable(class_):
                # bs4 multi-valued class semantics: the predicate is
                # tried against each individual class AND the joined
                # string (absent attribute → one call with None)
                if cval is None:
                    if not class_(None):
                        return False
                else:
                    candidates = cval.split() + ([cval] if " " in cval else [])
                    if not any(class_(c) for c in candidates):
                        return False
            else:
                if cval is None or class_ not in cval.split():
                    return False
        if href is not None:
            v = node.attrs.get("href")
            if href is True:
                if v is None:
                    return False
            elif hasattr(href, "search"):
                if v is None or not href.search(v):
                    return False
            elif v != href:
                return False
        if src is not None:
            v = node.attrs.get("src")
            if src is True:
                if v is None:
                    return False
            elif hasattr(src, "search"):
                if v is None or not src.search(v):
                    return False
            elif v != src:
                return False
        for k, want in attrs.items():
            v = node.attrs.get(k)
            if want is True:
                if v is None:
                    return False
            elif callable(want):
                if not want(v):
                    return False
            elif v != want:
                return False
        return True

    def find_all(
        self,
        name=None,
        class_=None,
        text=None,
        href=None,
        src=None,
        attrs: Optional[dict] = None,
        limit: Optional[int] = None,
        **kw,
    ):
        """bs4-compatible-enough find_all. With ``text=`` returns matching
        text-node strings; otherwise matching Nodes."""
        merged = dict(attrs or {})
        merged.update(kw)
        out: list = []
        if (text is not None and name is None and class_ is None and not merged
                and href is None and src is None):
            # bare text search returns matching strings in TRUE document
            # order (bs4 iterates NavigableStrings depth-first; visiting
            # a node's trailing text before its descendants would return
            # the wrong first match on mixed content)
            rx = text if hasattr(text, "search") else re.compile(re.escape(text))
            for s in self.iter_all_strings():
                if rx.search(s):
                    out.append(s)
                    if limit and len(out) >= limit:
                        return out
            return out
        for node in self.iter_desc():
            if self._match_find(node, name, class_, merged, href, src):
                if text is not None:
                    rx = text if hasattr(text, "search") else re.compile(re.escape(text))
                    # bs4 filters tag+text on tag.string — None (no
                    # match) for tags with multiple children
                    s = _dot_string(node)
                    if s is None or not rx.search(s):
                        continue
                out.append(node)
                if limit and len(out) >= limit:
                    break
        return out

    def find(self, name=None, class_=None, text=None, href=None, src=None,
             attrs: Optional[dict] = None, **kw):
        res = self.find_all(name, class_=class_, text=text, href=href, src=src,
                            attrs=attrs, limit=1, **kw)
        return res[0] if res else None

    # -- CSS selectors ----------------------------------------------------
    def select(self, selector: str) -> list["Node"]:
        groups = _parse_selector(selector)
        out, seen = [], set()
        for node in self.iter_desc():
            if id(node) in seen:
                continue
            if any(_match_chain(node, chain, scope=self) for chain in groups):
                seen.add(id(node))
                out.append(node)
        return out

    def select_one(self, selector: str) -> Optional["Node"]:
        groups = _parse_selector(selector)
        for node in self.iter_desc():
            if any(_match_chain(node, chain, scope=self) for chain in groups):
                return node
        return None

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.name} {self.attrs}>"


def _dot_string(node: Node):
    """bs4 ``tag.string``: the single string child (recursing through a
    single tag child); None whenever there is more than one child."""
    while True:
        if len(node.children) != 1:
            return None
        child = node.children[0]
        if isinstance(child, str):
            return child
        node = child


# ---------------------------------------------------------------------------
# Selector parsing / matching
# ---------------------------------------------------------------------------

_SIMPLE_RX = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w:-]+)\s*(?:(?P<op>[\^\$\*]?=)\s*(?P<q>['"]?)(?P<val>[^\]'"]*)(?P=q))?\]
  | :(?P<pseudo>[\w-]+)(?P<parg>\([^)]*\))?
    """,
    re.VERBOSE,
)

_SUPPORTED_PSEUDO = {"first-of-type", "contains"}


def _parse_compound(token: str) -> list[tuple]:
    """Parse one compound simple selector like ``a.btn[href^='x']``."""
    parts: list[tuple] = []
    pos = 0
    while pos < len(token):
        m = _SIMPLE_RX.match(token, pos)
        if not m:
            raise SelectorError(f"bad selector near {token[pos:]!r}")
        pos = m.end()
        if m.group("tag"):
            parts.append(("tag", m.group("tag").lower()))
        elif m.group("cls"):
            parts.append(("class", m.group("cls")))
        elif m.group("id"):
            parts.append(("id", m.group("id")))
        elif m.group("attr"):
            parts.append(("attr", m.group("attr"), m.group("op"), m.group("val")))
        elif m.group("pseudo"):
            name = m.group("pseudo")
            arg = m.group("parg")
            if name not in _SUPPORTED_PSEUDO:
                raise SelectorError(f"unsupported pseudo-class :{name}")
            if name == "contains":
                if not arg:
                    raise SelectorError(":contains needs an argument")
                parts.append(("contains", arg[1:-1].strip("'\"")))
            else:
                if arg:
                    raise SelectorError(f"unsupported pseudo-class :{name}(...)")
                parts.append(("pseudo", name))
    if not parts:
        raise SelectorError(f"empty selector token {token!r}")
    return parts


from functools import lru_cache


@lru_cache(maxsize=4096)
def _parse_selector(selector: str) -> list[list[tuple]]:
    """→ list of chains; each chain is [(combinator, compound), ...] with
    combinator ∈ {' ', '>'} (first entry's combinator ignored).
    Memoized: parse stages evaluate the same fixed selector chains on
    every element, so parsing cost would otherwise dominate matching."""
    if not selector or not selector.strip():
        raise SelectorError("empty selector")
    groups = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            raise SelectorError("empty selector group")
        toks = re.split(r"\s*(>)\s*|\s+", part)
        chain: list[tuple] = []
        comb = " "
        for tok in toks:
            if tok is None or tok == "":
                continue
            if tok == ">":
                comb = ">"
                continue
            chain.append((comb, _parse_compound(tok)))
            comb = " "
        if not chain:
            raise SelectorError(f"bad selector {part!r}")
        groups.append(chain)
    return groups


def _match_compound(node: Node, parts: list[tuple]) -> bool:
    for p in parts:
        kind = p[0]
        if kind == "tag":
            if p[1] != "*" and node.name != p[1]:
                return False
        elif kind == "class":
            if p[1] not in node.classes:
                return False
        elif kind == "id":
            if node.attrs.get("id") != p[1]:
                return False
        elif kind == "attr":
            _, aname, op, val = p
            v = node.attrs.get(aname)
            if v is None:
                return False
            if op is None:
                continue
            if op == "=" and v != val:
                return False
            if op == "^=" and not v.startswith(val):
                return False
            if op == "$=" and not v.endswith(val):
                return False
            if op == "*=" and val not in v:
                return False
        elif kind == "contains":
            if p[1] not in node.get_text():
                return False
        elif kind == "pseudo":  # first-of-type
            parent = node.parent
            if parent is None:
                return False
            for sib in parent.element_children():
                if sib.name == node.name:
                    if sib is not node:
                        return False
                    break
    return True


def _match_chain(node: Node, chain: list[tuple], scope: Node) -> bool:
    """soupsieve/querySelectorAll scoping: RESULTS are descendants of
    the scope element (the caller's iteration guarantees that), but
    combinators may be satisfied by ancestors ABOVE the scope —
    el.select("header h2") matches an h2 inside el when a header
    anywhere up the document contains it."""
    comb, compound = chain[-1]
    if not _match_compound(node, compound):
        return False
    rest = chain[:-1]
    if not rest:
        return True
    cur = node.parent
    if comb == ">":
        return cur is not None and _match_chain(cur, rest, scope)
    # descendant: try every ancestor up to the document root
    while cur is not None:
        if _match_chain(cur, rest, scope):
            return True
        cur = cur.parent
    return False


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def handle_comment(self, data):
        # bs4 keeps comments as Comment NavigableStrings: they count as
        # children (tag.string goes None on mixed content) and are
        # matched by find(text=...), though get_text() excludes them
        self.stack[-1].children.append(Comment(data))


def parse_html(html: str) -> Node:
    """Parse an HTML string into a document root Node."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
