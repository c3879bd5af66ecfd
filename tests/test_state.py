"""Cuckoo seen-set and politeness scheduler tests (SURVEY.md §5.1 item 5)."""

import time

import numpy as np
import pytest

from web_scrapper_ray.state.cuckoo import CuckooFilter, SeenSet, hash64_batch
from web_scrapper_ray.state.politeness import PolitenessBoard, parse_robots_delay


def test_cuckoo_filter_exactness_at_capacity_margin():
    f = CuckooFilter(capacity=1 << 14)
    rng = np.random.default_rng(7)
    items = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    first = f.contains_or_add(items)
    # fresh random hashes: false-positive probability ~2^-16 per probe;
    # a generously-sized filter must report all-new
    assert not first.any()
    again = f.contains_or_add(items)
    assert again.all()


def test_cuckoo_within_batch_duplicates():
    f = CuckooFilter(capacity=1 << 10)
    items = np.array([42, 42, 43, 42], dtype=np.uint64)
    out = f.contains_or_add(items)
    assert list(out) == [False, True, False, True]


def test_cuckoo_snapshot_roundtrip(tmp_path):
    f = CuckooFilter(capacity=1 << 10)
    items = np.arange(100, dtype=np.uint64) * 2654435761
    f.contains_or_add(items)
    p = str(tmp_path / "snap.npz")
    f.save(p)
    g = CuckooFilter.load(p)
    assert g.contains_or_add(items).all()
    assert g.count == f.count


def test_seen_set_sharded_vs_exact_oracle(ray_session):
    urls = [f"http://h{i % 37}.org/p/{i % 201}" for i in range(1000)]
    seen = SeenSet(n_shards=3, capacity_per_shard=1 << 12)
    mask = seen.contains_or_add(urls)
    exact: set[str] = set()
    expected = []
    for u in urls:
        expected.append(u in exact)
        exact.add(u)
    assert list(mask) == expected
    assert seen.total_count() == len(set(urls))


def test_hash64_deterministic_across_calls():
    a = hash64_batch(["x", "y"])
    b = hash64_batch(["x", "y"])
    assert (a == b).all()


def test_parse_robots_delay():
    assert parse_robots_delay(b"User-agent: *\nCrawl-delay: 0.05\n") == 0.05
    assert parse_robots_delay(b"User-agent: *\n") == 0.0
    assert parse_robots_delay(None) == 0.0


def test_politeness_reserve_spacing(ray_session):
    board = PolitenessBoard(n_shards=2)
    t0 = board.reserve("h.org", 5, 0.05)
    t1 = board.reserve("h.org", 1, 0.05)
    # the second reservation starts after the first's 5 slots
    assert t1 >= t0 + 5 * 0.05 - 1e-6
    # an unrelated host is not delayed by h.org's budget
    t2 = board.reserve("other.org", 1, 0.05)
    assert t2 <= time.time() + 0.01


def test_parse_robots_disallow():
    from web_scrapper_ray.state.politeness import is_disallowed, parse_robots

    body = b"User-agent: *\nCrawl-delay: 0.02\nDisallow: /private/\nDisallow: /tmp\nDisallow: /\n"
    delay, dis = parse_robots(body)
    assert delay == 0.02
    assert dis == ["/private/", "/tmp"]  # bare "/" ignored (would kill the host)
    assert is_disallowed("/private/x", dis)
    assert is_disallowed("/tmpfile", dis)
    assert not is_disallowed("/public", dis)
    assert parse_robots(None) == (0.0, [])


def test_rfc9309_robots_matcher():
    """RFC 9309 semantics: group selection by UA, Allow/Disallow with
    * and $ wildcards, longest-match precedence, Allow winning ties."""
    from web_scrapper_ray.state.politeness import (
        parse_robots_rules,
        robots_allowed,
    )

    body = (b"User-agent: megabot\nDisallow: /\n\n"
            b"User-agent: *\nCrawl-delay: 0.05\n"
            b"Disallow: /private/\n"
            b"Allow: /private/pub*\n"
            b"Disallow: /*.zip$\n"
            b"Disallow: /tmp\n"
            b"Allow: /tmp/keep\n")
    delay, rules = parse_robots_rules(body)
    assert delay == 0.05 and len(rules) == 5
    assert not robots_allowed("/private/x", rules)
    assert robots_allowed("/private/pub/doc", rules)   # longer Allow wins
    assert not robots_allowed("/data/big.zip", rules)  # * and $ anchors
    assert robots_allowed("/data/big.zipper", rules)   # $ really anchors
    assert not robots_allowed("/tmpfile", rules)
    assert robots_allowed("/tmp/keep/me", rules)
    assert robots_allowed("/public", rules)            # no rule → allowed

    # group selection: the UA-specific group beats *
    delay_m, rules_m = parse_robots_rules(body, user_agent="MegaBot/2.0")
    assert not robots_allowed("/anything", rules_m)    # Disallow: /
    # empty Disallow means allow-all
    assert parse_robots_rules(b"User-agent: *\nDisallow:\n") == (0.0, [])


def test_rfc9309_orphan_rules_and_ua_grouping():
    """RFC 9309 group edges: rules/delay before any User-agent line are
    IGNORED (never attributed to the following group), consecutive UA
    lines after an orphan rule still form ONE group, and malformed
    Crawl-delay values never raise."""
    from web_scrapper_ray.state.politeness import (
        parse_robots,
        parse_robots_delay,
        parse_robots_rules,
    )

    # preamble delay must not leak into the * group
    delay, rules = parse_robots_rules(
        b"Crawl-delay: 10\nUser-agent: *\nDisallow: /admin\n")
    assert delay == 0.0
    assert rules == [(False, "/admin")]

    # orphan rule ignored; a and b share one group with only /y
    for ua in ("a", "b"):
        _, r = parse_robots_rules(
            b"Disallow: /x\nUser-agent: a\nUser-agent: b\nDisallow: /y\n",
            user_agent=ua)
        assert r == [(False, "/y")], ua

    # malformed Crawl-delay values: lenient (no delay), never a crash
    for bad in (b"User-agent: *\nCrawl-delay: 1.2.3\n",
                b"User-agent: *\nCrawl-delay: .\n"):
        d, _ = parse_robots_rules(bad)
        assert d == 0.0
    assert parse_robots_delay(b"Crawl-delay: 1.2.3\n") == 0.0
    assert parse_robots(b"Crawl-delay: .\n")[0] == 0.0


def test_robots_match_includes_query():
    """RFC 9309 match target is path + query: a $-anchored rule must not
    match a URL with a query string, and rules containing '?' must
    match (exercised through the crawl's target construction)."""
    from urllib.parse import urlsplit

    from web_scrapper_ray.state.politeness import (
        parse_robots_rules,
        robots_allowed,
    )

    _, rules = parse_robots_rules(
        b"User-agent: *\nDisallow: /*.php$\nDisallow: /search?q=\n")

    def target(url):
        p = urlsplit(url)
        return p.path + (f"?{p.query}" if p.query else "")

    assert not robots_allowed(target("http://h/x.php"), rules)
    assert robots_allowed(target("http://h/x.php?id=1"), rules)  # $ + query
    assert not robots_allowed(target("http://h/search?q=abc"), rules)
    assert robots_allowed(target("http://h/search"), rules)


def test_politeness_snapshot_filenames_three_digit_shards(tmp_path):
    """Snapshot/restore filename contract survives ≥100 shards (the
    fixed-width slice bug would have loaded shard_103 into shard 10)."""
    import json
    import os

    # write the files exactly as snapshot() does, for a 104-shard board
    d = str(tmp_path)
    for i in (7, 103):
        with open(os.path.join(d, f"shard_{i:02d}.json"), "w") as f:
            json.dump({f"host-{i}.org": 123.0 + i}, f)
    import glob
    loaded = {}
    for f in sorted(glob.glob(os.path.join(d, "shard_*.json"))):
        idx = int(os.path.basename(f)[6:-5])
        loaded[idx] = json.load(open(f))
    assert set(loaded) == {7, 103}
    assert loaded[103] == {"host-103.org": 226.0}


def test_rfc9309_matching_groups_combine():
    """RFC 9309 §2.2.1: multiple groups matching the same product token
    MUST be combined — two `*` groups merge their rules, and a
    UA-specific match merges only the tying groups, not the `*` ones."""
    from web_scrapper_ray.state.politeness import (
        parse_robots_rules,
        robots_allowed,
    )

    body = (b"User-agent: *\nDisallow: /a\n\n"
            b"User-agent: *\nDisallow: /b\nCrawl-delay: 0.25\n\n"
            b"User-agent: megabot\nDisallow: /m1\n\n"
            b"User-agent: megabot\nDisallow: /m2\n")
    delay, rules = parse_robots_rules(body)
    assert not robots_allowed("/a/x", rules)
    assert not robots_allowed("/b/x", rules)  # second * group counts too
    assert delay == 0.25
    _, rules_m = parse_robots_rules(body, user_agent="MegaBot/2.0")
    assert not robots_allowed("/m1", rules_m)
    assert not robots_allowed("/m2", rules_m)
    assert robots_allowed("/a/x", rules_m)  # * groups not merged in
