"""FetchBackend surface: the reference's session/retry/UA semantics
(content.py:60-109) over a REAL local HTTP server, and crawl parity
store-backend vs http-backend (same wave engine, different "network")."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow.parquet as pq
import pytest

from web_scrapper_ray.sources.fetch import (
    BACKOFF_MAX_S,
    BACKOFF_MIN_S,
    HTTPBackend,
    MAX_ATTEMPTS,
    backoff_s,
)


class _WorldHandler(BaseHTTPRequestHandler):
    """Serves a synthetic world over HTTP: Host header + path → site
    store lookup. /flaky-N fails (500) N times then succeeds; request
    log records (host, path, user-agent)."""

    store = None
    log: list = []
    flaky_counts: dict = {}
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802
        host = (self.headers.get("Host") or "").rsplit(":", 1)[0]
        with self.lock:
            self.log.append((host, self.path, self.headers.get("User-Agent")))
        if self.path.startswith("/flaky-"):
            n = int(self.path.rsplit("-", 1)[1])
            with self.lock:
                seen = self.flaky_counts.get(self.path, 0)
                self.flaky_counts[self.path] = seen + 1
            if seen < n:
                self.send_response(500)
                self.end_headers()
                return
            body = b"<html><body>recovered</body></html>"
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)
            return
        body, status = self.store.get(f"http://{host}{self.path}", host)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(status)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def world_server(ray_session):
    from web_scrapper_ray import synth
    from web_scrapper_ray.sources.site_store import SiteStore

    world = synth.ensure_world("t2")
    _WorldHandler.store = SiteStore(world)
    _WorldHandler.log = []
    _WorldHandler.flaky_counts = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _WorldHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield world, f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_backoff_matches_reference_policy():
    # tenacity wait_exponential(multiplier=1, min=2, max=10): 2s, 4s
    assert MAX_ATTEMPTS == 3
    assert backoff_s(1) == 2.0 and backoff_s(2) == 4.0
    assert backoff_s(10) == BACKOFF_MAX_S and backoff_s(0) == BACKOFF_MIN_S


def test_http_backend_fetch_retry_and_404(world_server):
    world, netloc = world_server
    sleeps = []
    be = HTTPBackend(rewrite_netloc=netloc, sleep=sleeps.append, timeout=5)

    # plain fetch of a real world page
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    body, status = be.get(seeds[0])
    assert status == 200 and body and b"<html" in body[:200].lower()

    # unknown URL → 404, retried MAX_ATTEMPTS times (reference retries
    # HTTPError from raise_for_status), then (None, 404)
    n0 = len(_WorldHandler.log)
    body, status = be.get("http://nosuch.example.org/missing")
    assert (body, status) == (None, 404)
    assert len(_WorldHandler.log) - n0 == MAX_ATTEMPTS
    assert sleeps[-2:] == [2.0, 4.0]  # exponential 2s, 4s between attempts

    # transient 500s → recovered within the retry budget
    body, status = be.get("http://flaky.example.org/flaky-2")
    assert status == 200 and body == b"<html><body>recovered</body></html>"


def test_http_backend_ua_rotation(world_server):
    world, netloc = world_server
    be = HTTPBackend(rewrite_netloc=netloc, ua_rotate="sequential", timeout=5,
                     sleep=lambda s: None)
    n0 = len(_WorldHandler.log)
    for i in range(3):
        body, status = be.get(f"http://ua{i}.example.org/flaky-0")
        assert status == 200
    uas = [ua for (_, _, ua) in _WorldHandler.log[n0:]]
    assert len(uas) == 3 and len(set(uas)) == 3  # sequential pool rotation


def test_http_backend_unicode_host_punycoded(world_server):
    """t2 worlds contain unicode hosts; the backend must send an
    IDNA-encoded Host header (urlnorm canonicalizes to punycode, so the
    store lookup only matches the punycoded form)."""
    world, netloc = world_server
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    uni = [u for u in seeds if any(ord(c) > 127 for c in u)]
    assert uni, "t2 world should contain a unicode host seed"
    be = HTTPBackend(rewrite_netloc=netloc, timeout=5, sleep=lambda s: None)
    body, status = be.get(uni[0])
    assert status == 200 and body
    host_sent = _WorldHandler.log[-1][0]
    assert host_sent.startswith("xn--") or host_sent.isascii()


def test_crawl_parity_store_vs_http_backend(world_server, tmp_path):
    """The politeness-paced wave crawl produces an identical crawl log,
    seed outcomes and articles whether pages come from the parquet store
    or a real HTTP server (reference retry policy active)."""
    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

    world, netloc = world_server
    spec = synth.TIERS["t2"]
    seeds = [synth.listing_url(spec, i, 1) for i in (0, 1, 2, 3)]

    def one(backend, out):
        cfg = CrawlConfig(world_dir=world, out_dir=str(tmp_path / out),
                          seeds=seeds, opts={"max_pages": 2},
                          politeness=True, fetch_backend=backend)
        return run_crawl(cfg)

    res_store = one(None, "store")
    # backoff=False: the 404 pagination tails would otherwise sleep 6s each
    res_http = one({"kind": "http", "rewrite_netloc": netloc,
                    "backoff": False, "timeout": 5}, "http")

    log_s = pq.read_table(res_store["crawl_log"]).drop_columns(["fetch_ts"])
    log_h = pq.read_table(res_http["crawl_log"]).drop_columns(["fetch_ts"])
    assert log_s.equals(log_h)
    arts_s = pq.read_table(res_store["articles"])
    arts_h = pq.read_table(res_http["articles"])
    assert arts_s.equals(arts_h)

    # politeness invariant holds over real HTTP too: per-host fetch
    # starts are spaced by ≥ the host's robots crawl-delay
    log = pq.read_table(res_http["crawl_log"]).to_pandas()
    for i in (1, 2):  # t2 delay choices (10,20,50) → hosts 1,2 = 20/50 ms
        host = synth.host_name(spec, i)
        delay_s = spec.crawl_delay_ms_choices[i % len(spec.crawl_delay_ms_choices)] / 1000
        ts = np.sort(
            log[log["url_canon"].str.contains(host, regex=False)]["fetch_ts"].to_numpy()
        )
        if len(ts) > 2 and delay_s > 0:
            assert np.diff(ts).min() >= delay_s * 0.9, (host, np.diff(ts).min())


def test_robots_probe_no_retry_and_cached(world_server):
    """A missing robots.txt must not burn the HTTP retry backoff
    (attempts=1), and robots are cached per backend: one probe per host
    per worker across waves."""
    world, netloc = world_server
    sleeps = []
    be = HTTPBackend(rewrite_netloc=netloc, sleep=sleeps.append, timeout=5)
    n0 = len(_WorldHandler.log)
    body, status = be.get("http://nosuchrobots.example.org/robots.txt",
                          attempts=1)
    assert (body, status) == (None, 404)
    assert len(_WorldHandler.log) - n0 == 1  # exactly one attempt
    assert sleeps == []                      # and no backoff sleeps


class _HardenedHandler(BaseHTTPRequestHandler):
    """The same synthetic world served the way the messy real web
    serves it: every page request 302-redirects once, and the final
    response is gzip-encoded with an explicit charset — ISO-8859-1
    when the page is representable in it, UTF-8 otherwise. robots.txt
    stays plain. requests resolves all three implicitly (the
    reference's content.py:106 ``response.text`` path); the backend
    must hand downstream the identical UTF-8 string the store backend
    serves."""

    store = None
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802
        import gzip as _gzip

        host = (self.headers.get("Host") or "").rsplit(":", 1)[0]
        if self.path == "/robots.txt":
            body, status = self.store.get(f"http://{host}{self.path}",
                                          host)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(status)
            self.end_headers()
            self.wfile.write(body)
            return
        if not self.path.startswith("/__hop"):
            self.send_response(302)
            self.send_header("Location", "/__hop" + self.path)
            self.end_headers()
            return
        real = self.path[len("/__hop"):]
        body, status = self.store.get(f"http://{host}{real}", host)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        try:
            text = body.decode("utf-8")
        except UnicodeDecodeError:
            # binary payloads (images) ship raw with a binary type —
            # the backend must never charset-mangle them
            self.send_response(status)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            payload, charset = text.encode("iso-8859-1"), "ISO-8859-1"
        except UnicodeEncodeError:
            payload, charset = body, "utf-8"
        gz = _gzip.compress(payload)
        self.send_response(status)
        self.send_header("Content-Type", f"text/html; charset={charset}")
        self.send_header("Content-Encoding", "gzip")
        self.send_header("Content-Length", str(len(gz)))
        self.end_headers()
        self.wfile.write(gz)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def hardened_server(ray_session):
    from web_scrapper_ray import synth
    from web_scrapper_ray.sources.site_store import SiteStore

    world = synth.ensure_world("t2")
    _HardenedHandler.store = SiteStore(world)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _HardenedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield world, f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_backend_redirect_gzip_charset(hardened_server):
    """Unit surface: one fetch through a redirect hop, gzip encoding
    and an ISO-8859-1 charset must yield byte-identical UTF-8 to the
    store's body."""
    from web_scrapper_ray import synth
    from web_scrapper_ray.sources.site_store import SiteStore

    world, netloc = hardened_server
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    be = HTTPBackend(rewrite_netloc=netloc, timeout=5,
                     sleep=lambda s: None)
    store = SiteStore(world)
    checked = 0
    for u in seeds[:6]:
        want, want_status = store.get(u, None)
        if want is None or want_status != 200:
            continue  # deliberately-broken world pages keep their status
        got, status = be.get(u)
        assert status == 200 and got == want, u
        checked += 1
    assert checked >= 3


def test_crawl_parity_hardened_http_site(hardened_server, tmp_path):
    """Full crawl parity through the redirecting, gzipped, latin-1
    site: identical crawl log and articles vs the store backend."""
    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

    world, netloc = hardened_server
    spec = synth.TIERS["t2"]
    seeds = [synth.listing_url(spec, i, 1) for i in (0, 1, 2)]

    def one(backend, out):
        cfg = CrawlConfig(world_dir=world, out_dir=str(tmp_path / out),
                          seeds=seeds, opts={"max_pages": 2},
                          politeness=True, fetch_backend=backend)
        return run_crawl(cfg)

    res_store = one(None, "store")
    res_http = one({"kind": "http", "rewrite_netloc": netloc,
                    "backoff": False, "timeout": 5}, "http")

    log_s = pq.read_table(res_store["crawl_log"]).drop_columns(["fetch_ts"])
    log_h = pq.read_table(res_http["crawl_log"]).drop_columns(["fetch_ts"])
    assert log_s.equals(log_h)
    arts_s = pq.read_table(res_store["articles"])
    arts_h = pq.read_table(res_http["articles"])
    assert arts_s.equals(arts_h)
