"""User-agent pool + rotation (reference ST2:
`/root/reference/src/webscraper/utils/user_agents.py:15-141`).

Per-actor state in the engine: each FetchActor/fetch task owns a
``UserAgentManager`` (sequential rotation index is per-worker, matching
the reference's per-process module global).  The synthetic content store
ignores UA headers, but the surface is kept for API parity and is what
a real HTTP backend would consume.
"""

from __future__ import annotations

import random

USER_AGENTS = [
    # a reduced, representative pool (same shape as the reference's 22)
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/100.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 12_3) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/99.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:99.0) Gecko/20100101 Firefox/99.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 12.3; rv:98.0) Gecko/20100101 Firefox/98.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 12_3) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/15.3 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/99.0 Safari/537.36 Edg/99.0",
    "Mozilla/5.0 (Linux; Android 12; Pixel 6) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/99.0 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 15_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/15.0 Mobile/15E148 Safari/604.1",
]


class UserAgentManager:
    def __init__(self, user_agents: list[str] | None = None, rotate: str = "random",
                 seed: int | None = None):
        # an empty/None pool falls back to the full default list via the
        # `or` (the reference's post-hoc "warn + single default UA"
        # branch at user_agents.py:76-78 is unreachable for the same
        # reason there — its `or COMMON_USER_AGENTS.copy()` runs first)
        self.user_agents = list(user_agents or USER_AGENTS)
        self.rotate = rotate
        self._idx = 0
        self._rng = random.Random(seed)

    def get(self) -> str:
        if self.rotate == "sequential":
            ua = self.user_agents[self._idx % len(self.user_agents)]
            self._idx += 1
            return ua
        return self._rng.choice(self.user_agents)

    def add(self, ua: str) -> None:
        # reference add_user_agent: skip empty strings and duplicates
        # (dups would skew random rotation; '' would send a blank
        # User-Agent header)
        if ua and ua not in self.user_agents:
            self.user_agents.append(ua)


def get_random_user_agent(seed: int | None = None) -> str:
    return UserAgentManager(seed=seed).get()
