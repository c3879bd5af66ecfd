"""Fetch backends: the engine's pluggable "network" (reference ST1/S1).

The crawl stage talks to a :class:`FetchBackend` — ``get(url, host) ->
(body_bytes | None, status)`` — so the same wave engine runs against:

* :class:`StoreBackend` — the synthetic parquet site store (the sandbox
  default and the deterministic test/bench world);
* :class:`HTTPBackend` — a real ``requests.Session`` with the
  reference's session surface (persistent connection pool, User-Agent,
  Accept headers, proxy/headers/cookies —
  `/root/reference/src/webscraper/scrapers/content.py:60-82`) and its
  retry policy (3 attempts, exponential backoff 2–10 s, retried only on
  ``RequestException``, re-raised → caller marks the URL failed —
  `content.py:84-90`). User-agent rotation (reference ST2,
  `utils/user_agents.py:15-141`) is per-backend state: each worker's
  backend owns a :class:`UserAgentManager`; ``rotate="sequential"``
  reproduces the reference's sequential mode, ``"random"`` its default.

Backends are built once per worker process (``worker_backend`` cache)
— exactly the reference's one-Session-per-scraper-instance lifetime,
lifted to one-per-worker so the connection pool is reused across every
batch the worker runs.
"""

from __future__ import annotations

import time
from typing import Optional, Protocol

from ..functions.user_agents import UserAgentManager, get_random_user_agent
from .site_store import worker_site_store

# reference retry policy as DECLARED (content.py:84-90): tenacity
# retry_if_exception_type(RequestException), stop_after_attempt(3),
# wait_exponential(multiplier=1, min=2, max=10).
# NOTE the reference's decorator is dead code: _fetch_page catches
# RequestException INSIDE the retried function and re-raises
# ScraperError (a WebScraperError, exceptions.py:13), which the
# retry_if_exception_type(RequestException) predicate never matches —
# so the reference effectively makes exactly ONE attempt per URL.
# HTTPBackend defaults to the declared 3-attempt policy (the intent);
# pass retry_attempts=1 for strict parity with the reference's
# effective single-attempt behavior (also the right setting when
# retries must not sidestep per-host politeness pacing, which budgets
# fetch STARTS — in-fetch retry waits are backoff-only).
MAX_ATTEMPTS = 3
BACKOFF_MULTIPLIER = 1.0
BACKOFF_MIN_S = 2.0
BACKOFF_MAX_S = 10.0

DEFAULT_HEADERS = {
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,"
              "image/webp,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.5",
}


class FetchBackend(Protocol):
    def get(self, url: str, host: Optional[str] = None) -> tuple[Optional[bytes], int]:
        """Fetch one URL → (body bytes | None, HTTP status)."""
        ...


class StoreBackend:
    """Synthetic-world backend: lookups into the host-sharded parquet
    site store (per-worker shard LRU — see site_store.py)."""

    def __init__(self, world_dir: str):
        self.store = worker_site_store(world_dir)

    def get(self, url: str, host: Optional[str] = None,
            attempts: Optional[int] = None) -> tuple[Optional[bytes], int]:
        return self.store.get(url, host)

    def get_canonical(self, url_canon: str, host: str) -> tuple[Optional[bytes], int]:
        return self.store.get_canonical(url_canon, host)


def backoff_s(attempt: int) -> float:
    """Wait before retry ``attempt`` (1-based), tenacity wait_exponential
    semantics: multiplier·2^attempt clamped to [min, max] → 2 s, 4 s."""
    return min(max(BACKOFF_MULTIPLIER * (2 ** attempt), BACKOFF_MIN_S), BACKOFF_MAX_S)


class HTTPBackend:
    """requests.Session-backed fetcher with the reference retry policy.

    Parameters mirror the reference scraper __init__ surface:
    ``user_agent`` (default: one random pick per session, like
    ``get_random_user_agent()``), ``proxy``, ``headers``, ``cookies``,
    ``timeout``. ``ua_rotate`` additionally rotates the User-Agent
    per request ("sequential" | "random") — the ST2 pool wired into the
    dataplane. ``rewrite_netloc`` redirects every request to a fixed
    host:port while sending the original host as the ``Host`` header
    (sandbox/integration use: crawl a synthetic world through a real
    local HTTP server). ``sleep`` is injectable for tests; ``backoff``
    False disables retry waits without changing attempt semantics.
    """

    def __init__(self, user_agent: Optional[str] = None,
                 proxy: Optional[str] = None,
                 headers: Optional[dict] = None,
                 cookies: Optional[dict] = None,
                 timeout: float = 30.0,
                 ua_rotate: Optional[str] = None,
                 ua_seed: Optional[int] = None,
                 rewrite_netloc: Optional[str] = None,
                 backoff: bool = True,
                 retry_attempts: Optional[int] = None,
                 sleep=time.sleep):
        import requests

        self._requests = requests
        self.session = requests.Session()
        self.timeout = timeout
        self.backoff = backoff
        # None → declared reference policy (3); 1 → the reference's
        # effective behavior (see module note on the dead decorator)
        self.retry_attempts = retry_attempts or MAX_ATTEMPTS
        self.sleep = sleep
        self.rewrite_netloc = rewrite_netloc
        self.ua_manager = (
            UserAgentManager(rotate=ua_rotate, seed=ua_seed) if ua_rotate else None
        )
        ua = user_agent or get_random_user_agent(seed=ua_seed)
        self.session.headers.update({"User-Agent": ua, **DEFAULT_HEADERS})
        if proxy:
            self.session.proxies = {"http": proxy, "https": proxy}
        if headers:
            self.session.headers.update(headers)
        if cookies:
            self.session.cookies.update(cookies)

    def _target(self, url: str, host: Optional[str]) -> tuple[str, dict]:
        if not self.rewrite_netloc:
            return url, {}
        from urllib.parse import urlsplit, urlunsplit

        parts = urlsplit(url)
        target = urlunsplit((parts.scheme or "http", self.rewrite_netloc,
                             parts.path, parts.query, parts.fragment))
        h = host or parts.hostname or ""
        try:
            h = h.encode("idna").decode("ascii")  # unicode host → punycode
        except UnicodeError:
            pass
        return target, {"Host": h}

    def get_canonical(self, url_canon: str, host: str) -> tuple[Optional[bytes], int]:
        # canonical URLs are plain GETs over HTTP (no re-canonicalization)
        return self.get(url_canon, host)

    @staticmethod
    def _body(resp) -> bytes:
        """Reference decode parity (content.py:106 ``response.text``):
        for text responses, decode with the Content-Type charset (or
        requests' ISO-8859-1 text/* default) and re-encode UTF-8, so
        the downstream ``body.decode()`` sees the reference's exact
        string — a latin-1 site parses identically instead of dying in
        the per-page guard. Redirect chains and gzip/deflate
        content-encoding are already resolved by requests at this
        point (`resp.content` is the final, decoded payload). Binary
        and untyped responses pass through raw — image bytes must
        never ride a charset guess."""
        ctype = (resp.headers.get("Content-Type") or "").lower()
        is_text = ("text/" in ctype or "html" in ctype
                   or "xml" in ctype or "charset" in ctype)
        if is_text:
            try:
                return resp.text.encode("utf-8")
            except (LookupError, UnicodeError):
                pass  # unknown codec → raw bytes, page guard decides
        return resp.content

    def get(self, url: str, host: Optional[str] = None,
            attempts: Optional[int] = None) -> tuple[Optional[bytes], int]:
        """``attempts`` overrides the retry budget (robots probes use 1 —
        a 404 there is definitive and must not burn the 2s+4s backoff).
        UA rotation advances once per REQUEST (reference ST2), not per
        retry attempt."""
        target, extra = self._target(url, host)
        if self.ua_manager is not None:
            extra = {**extra, "User-Agent": self.ua_manager.get()}
        last_status = 0
        budget = attempts or self.retry_attempts
        for attempt in range(1, budget + 1):
            try:
                resp = self.session.get(target, timeout=self.timeout,
                                        headers=extra or None)
                last_status = resp.status_code
                resp.raise_for_status()
                return self._body(resp), resp.status_code
            except self._requests.RequestException:
                # reference: retried (incl. HTTPError from
                # raise_for_status), re-raised after the final attempt —
                # the caller records the URL as failed. We return
                # (None, status) for the same downstream semantics.
                if attempt < budget and self.backoff:
                    self.sleep(backoff_s(attempt))
        return None, last_status


_BACKENDS: dict = {}


def worker_backend(world_dir: str, spec: Optional[dict]) -> FetchBackend:
    """Process-level backend cache (one per worker, reused across
    batches). ``spec`` None or {"kind": "store"} → StoreBackend;
    {"kind": "http", ...HTTPBackend kwargs} → HTTPBackend."""
    key = (world_dir, None if spec is None else tuple(sorted(
        (k, str(v)) for k, v in spec.items())))
    be = _BACKENDS.get(key)
    if be is None:
        if spec is None or spec.get("kind", "store") == "store":
            be = StoreBackend(world_dir)
        elif spec["kind"] == "http":
            kwargs = {k: v for k, v in spec.items() if k != "kind"}
            be = HTTPBackend(**kwargs)
        else:
            raise ValueError(f"unknown fetch backend kind: {spec['kind']}")
        _BACKENDS[key] = be
    return be
