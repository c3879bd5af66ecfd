"""web_scrapper_ray — a Ray-Data-native crawl frontier + fetch/decode engine.

A brand-new engine (not a port) with the query/data-processing
capabilities of the reference "Web Scraper Pro" repo, re-expressed as
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages (HTTP-session
fetchers, sharded cuckoo-filter URL-seen set, per-host politeness
queues), parquet/lance-partitioned sinks, and a wave-based crawl driver
with per-wave checkpoints.

Nothing here calls ``ray.init()``; the caller (driver, bench.py, test
fixture) owns the Ray session.
"""

__version__ = "0.1.0"
