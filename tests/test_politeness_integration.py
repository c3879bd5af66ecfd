"""Politeness invariant (SURVEY.md §5.1 item 5): per-host inter-fetch
start spacing ≥ robots crawl-delay, hosts isolated from each other."""

import numpy as np
import pyarrow.parquet as pq

from web_scrapper_ray import synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


def test_per_host_fetch_spacing(ray_session, tmp_path):
    world = synth.ensure_world("t2")
    spec = synth.TIERS["t2"]
    # four hosts with the 50 ms budget (host_idx % 3 == 2 → 50 per
    # crawl_delay_ms_choices=(10,20,50))
    hosts = [synth.host_name(spec, i) for i in (2, 5, 8, 11)]
    seeds = [synth.listing_url(spec, i, 1) for i in (2, 5, 8, 11)]
    out = str(tmp_path / "polite")
    cfg = CrawlConfig(world_dir=world, out_dir=out, seeds=seeds,
                      opts={"max_pages": 2}, politeness=True)
    res = run_crawl(cfg)
    log = pq.read_table(res["crawl_log"]).to_pandas()
    assert len(log) > 20
    for host in hosts:
        ts = np.sort(
            log[log["url_canon"].str.contains(host, regex=False)]["fetch_ts"].to_numpy()
        )
        assert len(ts) > 3
        gaps = np.diff(ts)
        # 50 ms budget with small scheduling tolerance
        assert gaps.min() >= 0.05 * 0.9, (host, gaps.min())
