"""URL canonicalization (RFC 3986 normalize + punycode + query-param sort).

The reference only strips query/fragment and forces a scheme
(`/root/reference/src/webscraper/scrapers/business.py:476-492`); the
north rule expands this to a full canonicalizer feeding the URL-seen
set.  Rules applied, in order:

1. lowercase scheme and host; default scheme ``http`` when missing;
2. IDNA/punycode-encode non-ASCII hosts (via ``idna``, stdlib-adjacent);
3. drop default ports (``:80`` http, ``:443`` https);
4. resolve dot-segments in the path (RFC 3986 §5.2.4);
5. percent-encoding: uppercase hex digits, decode unreserved chars;
6. sort query parameters by (key, value), preserving duplicates;
7. drop the fragment;
8. empty path → ``/``.

Pure function of the input string — usable both per-row (oracle) and
vectorized over Arrow string columns inside ``map_batches``.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

try:
    import idna

    _HAVE_IDNA = True
except ImportError:  # pragma: no cover
    _HAVE_IDNA = False

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RX = re.compile(r"%([0-9a-fA-F]{2})")
_SCHEME_RX = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def _norm_pct(s: str) -> str:
    def fix(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RX.sub(fix, s)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        else:
            out.append(seg)
    result = "/".join(out)
    if path.startswith("/") and not result.startswith("/"):
        result = "/" + result
    if path.endswith(("/.", "/..")) and not result.endswith("/"):
        result += "/"
    return result


def _norm_host(host: str) -> str:
    # strip()/rstrip('.') to a FIXED POINT: removing a trailing dot can
    # expose trailing whitespace ('ä\x85.' → 'ä\x85'), and a single pass
    # would leave it — the unicode-degrade branch below would then return
    # a host that canonicalizes differently on the next pass, breaking
    # the idempotency the URL-seen/store lookups rely on.
    prev = None
    while host != prev:
        prev = host
        host = host.strip().rstrip(".")
    host = host.lower()
    if not host:
        return host
    try:
        host.encode("ascii")
        return host
    except UnicodeEncodeError:
        if _HAVE_IDNA:
            try:
                return idna.encode(host).decode("ascii")
            except idna.IDNAError:
                pass
        try:
            return host.encode("idna").decode("ascii")
        except UnicodeError:
            # unencodable label (empty, >63 chars, ...) — degrade to the
            # lowercased unicode host instead of killing the batch task
            return host


def canonicalize_url(url: str) -> str:
    """Canonical form of ``url`` (see module docstring for rules).
    Degrade-don't-crash: a URL whose authority cannot be parsed at all
    (e.g. a stray bracket — urlsplit raises ValueError) comes back as
    the stripped input with the default scheme prefixed (if it had
    none) instead of killing the whole map_batches task; the fallback
    is idempotent because re-canonicalizing its output re-enters the
    same except path unchanged."""
    if not url:
        return ""
    url = url.strip()
    # scheme must be detected ANCHORED — '://' appearing later (an
    # absolute URL inside the query string) is not a scheme
    if not _SCHEME_RX.match(url) and not url.startswith("//"):
        url = "http://" + url
    try:
        return _canonicalize_parsed(url)
    except ValueError:
        return url


def _canonicalize_parsed(url: str) -> str:
    parts = urlsplit(url)
    scheme = (parts.scheme or "http").lower()
    host = _norm_host(parts.hostname or "")
    if ":" in host:  # IPv6 literal — urlsplit strips the brackets
        host = f"[{host}]"
    try:
        port = parts.port
    except ValueError:  # malformed/out-of-range port: keep it verbatim
        # keep the WHOLE post-host tail, not just the last ':' segment —
        # 'host:80:80' must canonicalize to itself (idempotency: the
        # canon form is re-parsed by every store/seen lookup; dropping
        # middle segments made the second pass produce a different key)
        netloc_tail = parts.netloc.rsplit("@", 1)[-1]
        if netloc_tail.startswith("["):
            after = netloc_tail.split("]", 1)[1] if "]" in netloc_tail else ""
            port_s = after[1:] if after.startswith(":") else ""
        else:
            port_s = netloc_tail.split(":", 1)[1] if ":" in netloc_tail else ""
        port = None
        if port_s:
            host = f"{host}:{port_s}"
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += ":" + parts.password
        userinfo += "@"
    # decode unreserved percent-escapes BEFORE dot-segment removal, or
    # %2E-encoded '..' segments survive and canonicalization is not
    # idempotent
    path = _remove_dot_segments(_norm_pct(parts.path)) or "/"
    query = ""
    if parts.query:
        pairs = [p for p in parts.query.split("&") if p]
        pairs = sorted(_norm_pct(p) for p in pairs)
        query = "&".join(pairs)
    return urlunsplit((scheme, userinfo + host, path, query, ""))


def host_of(url: str) -> str:
    """Canonical host of a URL (post-canonicalization key for politeness
    grouping and output hash-range partitioning). Accepts raw scraped
    URLs too: protocol-relative ``//host/...`` resolves like
    canonicalize_url (prefixing ``http://`` blindly used to yield
    ``http:////host`` → host ''), and unparseable authorities degrade
    to ''."""
    if not _SCHEME_RX.match(url):
        url = ("http:" + url) if url.startswith("//") else ("http://" + url)
    try:
        parts = urlsplit(url)
        return _norm_host(parts.hostname or "")
    except ValueError:
        return ""


def canonicalize_batch(urls) -> list[str]:
    """Batch helper for map_batches (Python loop is fine: canonicalization
    is string-level and the per-URL cost is ~µs; compiled regexes and no
    per-row object allocation keep this the cheapest stage in the pipe)."""
    return [canonicalize_url(u) for u in urls]
