"""O5 frontier priority scheduling (SURVEY.md §2.6): a high-priority
seed jumps the low-priority backlog, and priority mode changes only
WHEN urls are fetched — final artifacts stay identical to parity mode."""

import pyarrow.parquet as pq

from web_scrapper_ray import synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


def test_high_priority_seed_jumps_backlog(ray_session, tmp_path):
    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    # backlog of three low-priority seeds + one high-priority seed LAST
    # in config order (the reference would fetch it last)
    seeds = [synth.listing_url(spec, i, 1) for i in (0, 1, 2, 3)]
    cfg = CrawlConfig(
        world_dir=world, out_dir=str(tmp_path / "prio"), seeds=seeds,
        opts={"max_pages": 2}, politeness=False,
        frontier_policy="priority", seed_priorities={3: 10},
        max_urls_per_wave=2, max_waves=64,
    )
    res = run_crawl(cfg)
    log = pq.read_table(res["crawl_log"]).to_pandas()
    seed_rows = log[log["page_idx"] == 1].groupby("seed_index")["fetch_ts"].min()
    # seed 3 (priority 10) is fetched in the first wave, before the
    # deferred low-priority seeds 1 and 2
    assert seed_rows[3] < seed_rows[1]
    assert seed_rows[3] < seed_rows[2]
    # everything still gets fetched eventually
    assert set(seed_rows.index) == {0, 1, 2, 3}


def test_priority_mode_preserves_final_artifacts(ray_session, tmp_path):
    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    seeds = [synth.listing_url(spec, i, 1) for i in (0, 1, 2, 3)]

    res_par = run_crawl(CrawlConfig(
        world_dir=world, out_dir=str(tmp_path / "par"), seeds=seeds,
        opts={"max_pages": 2}, politeness=False))
    res_pri = run_crawl(CrawlConfig(
        world_dir=world, out_dir=str(tmp_path / "pri"), seeds=seeds,
        opts={"max_pages": 2}, politeness=False,
        frontier_policy="priority", seed_priorities={3: 10, 1: 5},
        max_urls_per_wave=3))

    log_a = pq.read_table(res_par["crawl_log"]).drop_columns(["fetch_ts"])
    log_b = pq.read_table(res_pri["crawl_log"]).drop_columns(["fetch_ts"])
    assert log_a.equals(log_b)
    assert pq.read_table(res_par["articles"]).equals(
        pq.read_table(res_pri["articles"]))
    # fully drained → no truncation counter
    assert "truncated_frontier_rows" not in res_pri["counters"]


def test_priority_truncation_is_reported(ray_session, tmp_path):
    """max_waves hit with a non-empty deferred frontier → the undrained
    rows are surfaced in counters, never silently dropped."""
    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    seeds = [synth.listing_url(spec, i, 1) for i in (0, 1, 2, 3)]
    res = run_crawl(CrawlConfig(
        world_dir=world, out_dir=str(tmp_path / "trunc"), seeds=seeds,
        opts={"max_pages": 2}, politeness=False,
        frontier_policy="priority", seed_priorities={3: 10},
        max_urls_per_wave=1, max_waves=2,
    ))
    assert res["counters"]["truncated_frontier_rows"] > 0
    # the fetched subset is still the highest-priority head
    log = pq.read_table(res["crawl_log"]).to_pandas()
    assert 3 in set(log["seed_index"])
