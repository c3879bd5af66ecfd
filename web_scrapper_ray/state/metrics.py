"""Run-metrics actor (SURVEY.md §2.5 A2 — replaces the reference's
incrementally-built report counters, `/root/reference/src/webscraper/
scrapers/base.py:218-239`).

A single low-traffic actor: each fetch+parse task posts one small
counter dict per host group (NOT per row), so the actor sees ~#groups
messages per wave — no bottleneck at any cluster size. Snapshots land
in each wave's checkpoint manifest, giving live progress plus the
lineage-coupled counters the north rule asks for.

Consistency contract: ``add`` is fire-and-forget from workers, so a
wave-k manifest snapshot may lag that wave's last few messages — the
counters are ADVISORY progress telemetry. Authoritative totals are
always recomputed from the wave data in finalize (crawl.py), never
from these counters. On resume the actor is re-seeded from the last
complete manifest's snapshot so cumulative telemetry survives.
"""

from __future__ import annotations


def _make_actor():
    import ray

    @ray.remote(num_cpus=0.05)
    class MetricsActor:
        def __init__(self) -> None:
            self.counters: dict[str, int] = {}

        def add(self, delta: dict[str, int]) -> None:
            for k, v in delta.items():
                self.counters[k] = self.counters.get(k, 0) + int(v)

        def snapshot(self) -> dict[str, int]:
            return dict(self.counters)

        def restore(self, counters: dict[str, int]) -> None:
            self.counters = dict(counters)

    return MetricsActor


class Metrics:
    """Driver-side handle; the actor handle serializes into stage
    closures. ``add`` from tasks is fire-and-forget."""

    def __init__(self) -> None:
        self.actor = _make_actor().remote()

    def add(self, **delta: int) -> None:
        self.actor.add.remote(dict(delta))

    def snapshot(self) -> dict[str, int]:
        import ray

        return ray.get(self.actor.snapshot.remote())

    def restore(self, counters: dict[str, int]) -> None:
        import ray

        ray.get(self.actor.restore.remote(dict(counters or {})))
