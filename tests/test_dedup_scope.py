"""Seen-set drop-policy switch: per_seed (reference parity, duplicate
seeds refetch their chains) vs global (production crawl: each canonical
URL fetched once)."""

import pyarrow.parquet as pq

from web_scrapper_ray import synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


def _run(tmp_path, scope):
    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    # host002 is the duplicated-seed host in the fixture (i % 6 == 2)
    seed = synth.listing_url(spec, 2, 1)
    cfg = CrawlConfig(world_dir=world, out_dir=str(tmp_path / scope),
                      seeds=[seed, seed], opts={"max_pages": 2},
                      politeness=False, dedup_scope=scope)
    res = run_crawl(cfg)
    return pq.read_table(res["crawl_log"]).to_pylist()


def test_global_scope_fetches_chain_once(ray_session, tmp_path):
    per_seed = _run(tmp_path, "per_seed")
    global_ = _run(tmp_path, "global")
    # both seeds fetched in both modes (seeds always bypass the drop)
    seeds_fetched = [r for r in global_ if r["sub_idx"] == 0 and r["page_idx"] == 1]
    assert len(seeds_fetched) == 2
    # per_seed refetches details/pagination for the duplicate; global doesn't
    assert len(per_seed) > len(global_)
    details_global = [r for r in global_ if r["sub_idx"] > 0]
    urls = [r["url_canon"] for r in details_global]
    assert len(urls) == len(set(urls))  # no detail fetched twice
