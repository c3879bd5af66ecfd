"""Per-host politeness scheduler (north-rule ST6/ST7).

The reference stores a ``delay`` and ``max_concurrent`` but never uses
them (verified: no sleep/threading in the reference ``src/`` —
`/root/reference/src/webscraper/scrapers/base.py:62,65`); the north rule
makes politeness a first-class component.  Design:

* Each crawl wave is shuffled ``groupby(host)`` so ALL of a host's
  fetches in a wave run inside one task, sequentially, in program order
  — per-host in-flight = 1 by construction.
* A sharded ``PolitenessShard`` actor pool (route: host-hash % shards)
  carries ``next_allowed_fetch_time`` per host *across* waves: the
  fetch task calls ``reserve(host, n, delay)`` once per group and gets
  the scheduled start; it then paces fetch *starts* ``delay`` apart.
* The crawl-delay comes from the host's robots.txt (fetched through the
  content store and parsed per group, cached per worker).

Shard count scales with the pool so no single actor serializes the
crawl (the N→4N scaling criterion).
"""

from __future__ import annotations

import re
import time

_DELAY_RX = re.compile(r"crawl-delay:\s*([0-9.]+)", re.IGNORECASE)
_DISALLOW_RX = re.compile(r"^disallow:\s*(\S+)", re.IGNORECASE | re.MULTILINE)


def _delay_value(token: str) -> float:
    """Lenient Crawl-delay parse: the [0-9.]+ regex admits malformed
    strings like '1.2.3' — a third-party robots.txt must never crash a
    wave task, so unparseable values mean no delay."""
    try:
        return float(token)
    except ValueError:
        return 0.0


def parse_robots_delay(robots_body: bytes | None) -> float:
    """Crawl-delay seconds from a robots.txt body (0.0 when absent)."""
    if not robots_body:
        return 0.0
    m = _DELAY_RX.search(robots_body.decode(errors="replace"))
    return _delay_value(m.group(1)) if m else 0.0


def parse_robots(robots_body: bytes | None) -> tuple[float, list[str]]:
    """(crawl-delay seconds, Disallow path prefixes). Simplified single
    user-agent-group semantics — sufficient for the synthetic worlds and
    the politeness budget definition; a production crawler would use a
    full RFC 9309 matcher here."""
    if not robots_body:
        return 0.0, []
    text = robots_body.decode(errors="replace")
    m = _DELAY_RX.search(text)
    delay = _delay_value(m.group(1)) if m else 0.0
    return delay, [p for p in _DISALLOW_RX.findall(text) if p != "/"]


def is_disallowed(url_path: str, disallow: list[str]) -> bool:
    """Legacy prefix matcher (kept for the simplified parse_robots
    surface); the crawl uses the RFC 9309 matcher below."""
    return any(url_path.startswith(p) for p in disallow)


# ---------------------------------------------------------------------------
# RFC 9309 robots matcher (group selection, Allow/Disallow, * and $
# wildcards, longest-match precedence with Allow winning ties)
# ---------------------------------------------------------------------------

_UA_RX = re.compile(r"^user-agent:\s*(\S+)", re.IGNORECASE)
_RULE_RX = re.compile(r"^(allow|disallow):\s*(\S*)", re.IGNORECASE)
_DELAY_LINE_RX = re.compile(r"^crawl-delay:\s*([0-9.]+)", re.IGNORECASE)


def parse_robots_rules(body: bytes | None, user_agent: str = "*"
                       ) -> tuple[float, list[tuple[bool, str]]]:
    """→ (crawl-delay seconds, [(is_allow, path_pattern), ...]) for the
    best-matching user-agent groups: a group's score is its longest UA
    token that is a substring of ``user_agent`` (case-insensitive, with
    ``*`` scoring 0 as the fallback), and ALL groups tying for the best
    score are merged — RFC 9309 §2.2.1 requires combining multiple
    groups that match the same product token (e.g. two ``*`` groups),
    not keeping just the first."""
    if not body:
        return 0.0, []
    groups: list[tuple[list[str], list[tuple[bool, str]], float]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay = 0.0
    in_group_body = False
    for raw in body.decode(errors="replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _UA_RX.match(line)
        if m:
            if in_group_body and cur_uas:
                groups.append((cur_uas, cur_rules, cur_delay))
                cur_uas, cur_rules, cur_delay = [], [], 0.0
                in_group_body = False
            cur_uas.append(m.group(1).lower())
            continue
        rm = _RULE_RX.match(line)
        if rm:
            if not cur_uas:
                continue  # orphan rule before any User-agent (RFC 9309:
                # rules outside a group are ignored, never attributed
                # to the next group)
            in_group_body = True
            if rm.group(2):  # empty Disallow: means allow-all (no rule)
                cur_rules.append((rm.group(1).lower() == "allow", rm.group(2)))
            continue
        dm = _DELAY_LINE_RX.match(line)
        if dm:
            if not cur_uas:
                continue  # orphan Crawl-delay — same RFC group rule
            in_group_body = True
            cur_delay = _delay_value(dm.group(1))
    if cur_uas:
        groups.append((cur_uas, cur_rules, cur_delay))
    ua = user_agent.lower()
    scored: list[tuple[int, list[tuple[bool, str]], float]] = []
    for uas, rules, delay in groups:
        score = -1
        for tok in uas:
            if tok == "*":
                score = max(score, 0)
            elif tok in ua:
                score = max(score, len(tok))
        if score >= 0:
            scored.append((score, rules, delay))
    if not scored:
        return 0.0, []
    best_score = max(s for s, _, _ in scored)
    merged: list[tuple[bool, str]] = []
    delay = 0.0
    for s, rules, d in scored:
        if s == best_score:
            merged.extend(rules)
            if d:  # Crawl-delay is non-standard; last specified wins
                delay = d
    return delay, merged


def _rule_matches(pattern: str, path: str) -> bool:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts) + (r"\Z" if anchored else "")
    return re.match(rx, path) is not None


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """RFC 9309 §2.2.2: the matching rule with the longest pattern wins;
    an Allow/Disallow tie goes to Allow; no matching rule → allowed."""
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _rule_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
    return best_allow


def _make_shard_actor():
    import ray

    @ray.remote(num_cpus=0.05)
    class PolitenessShard:
        def __init__(self) -> None:
            self.next_allowed: dict[str, float] = {}

        def reserve(self, host: str, n: int, delay_s: float) -> float:
            """Reserve n fetch slots spaced ``delay_s`` apart; returns the
            scheduled start time (wall clock)."""
            now = time.time()
            t0 = max(now, self.next_allowed.get(host, 0.0))
            self.next_allowed[host] = t0 + n * delay_s
            return t0

        def advance(self, host: str, until: float) -> None:
            """Push next_allowed forward when actual fetch starts ran
            later than the reservation (slow parses) — keeps the
            cross-wave gap honest."""
            if until > self.next_allowed.get(host, 0.0):
                self.next_allowed[host] = until

        def snapshot(self) -> dict[str, float]:
            return dict(self.next_allowed)

        def restore(self, state: dict[str, float]) -> None:
            self.next_allowed = dict(state)

    return PolitenessShard


class PolitenessBoard:
    """Driver-side handle; shard actors are created in the caller's Ray
    session and routed by stable host hash."""

    def __init__(self, n_shards: int = 4):
        Shard = _make_shard_actor()
        self.n_shards = n_shards
        self.shards = [Shard.remote() for _ in range(n_shards)]

    def shard_for(self, host: str):
        from .cuckoo import hash64

        return self.shards[hash64(host) % self.n_shards]

    def reserve(self, host: str, n: int, delay_s: float) -> float:
        import ray

        return ray.get(self.shard_for(host).reserve.remote(host, n, delay_s))

    def snapshot(self, out_dir: str) -> None:
        """Persist every shard's next-allowed map (checkpoint lineage:
        per-host politeness state survives resume alongside the cuckoo
        shards — SURVEY §2.8)."""
        import json
        import os

        import ray

        os.makedirs(out_dir, exist_ok=True)
        states = ray.get([s.snapshot.remote() for s in self.shards])
        for i, st in enumerate(states):
            tmp = os.path.join(out_dir, f".shard_{i:02d}.tmp")
            with open(tmp, "w") as f:
                json.dump(st, f)
            os.replace(tmp, os.path.join(out_dir, f"shard_{i:02d}.json"))

    def restore(self, in_dir: str) -> None:
        """Restore shard states written by :meth:`snapshot`. Shard count
        must match (it is part of the checkpoint contract, like the
        cuckoo shard count)."""
        import glob
        import json
        import os

        import ray

        files = sorted(glob.glob(os.path.join(in_dir, "shard_*.json")))
        futs = []
        for f in files:
            i = int(os.path.basename(f)[6:-5])
            if i < len(self.shards):
                with open(f) as fh:
                    futs.append(self.shards[i].restore.remote(json.load(fh)))
        ray.get(futs)
