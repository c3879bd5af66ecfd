"""Mid-crawl checkpoint/resume equivalence (SURVEY.md §5.1 item 4):
kill after a wave boundary, resume from per-partition lineage, final
outputs identical to the uninterrupted run."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from web_scrapper_ray import synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


def _cfg(world, out):
    return CrawlConfig(world_dir=world, out_dir=out, opts={"max_pages": 2}, politeness=False)


def test_resume_after_interrupt_matches_uninterrupted(ray_session, tmp_path):
    world = synth.ensure_world("t1")
    full_out = str(tmp_path / "full")
    res_full = run_crawl(_cfg(world, full_out))

    # interrupted run: execute wave 0 only (max_waves=1 simulates a crash
    # after the first checkpoint), then resume
    part_out = str(tmp_path / "part")
    cfg = _cfg(world, part_out)
    cfg.max_waves = 1
    run_crawl(cfg)
    manifests = sorted(glob.glob(os.path.join(part_out, "checkpoints", "wave_*.json")))
    assert len(manifests) == 1
    with open(manifests[0]) as fh:
        assert json.load(fh)["complete"]

    cfg2 = _cfg(world, part_out)
    res_resumed = run_crawl(cfg2, resume=True)

    log_a = pq.read_table(res_full["crawl_log"]).to_pylist()
    log_b = pq.read_table(res_resumed["crawl_log"]).to_pylist()
    assert [(r["url_canon"], r["outcome"]) for r in log_a] == [
        (r["url_canon"], r["outcome"]) for r in log_b
    ]
    arts_a = pq.read_table(res_full["articles"]).to_pylist()
    arts_b = pq.read_table(res_resumed["articles"]).to_pylist()
    assert arts_a == arts_b
