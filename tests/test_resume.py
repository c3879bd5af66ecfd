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
    # counters are cumulative across the resume (restored from the
    # manifest like metrics), not just the resumed run's own waves
    assert res_resumed["counters"]["waves"] == res_full["counters"]["waves"]
    assert res_resumed["counters"]["fetches"] == res_full["counters"]["fetches"]


def test_politeness_state_survives_resume(ray_session, tmp_path):
    """ST6 checkpoint lineage: the per-host next-allowed map is
    snapshotted per wave and restored on resume, so cross-restart
    fetch spacing stays honest."""
    import json

    from web_scrapper_ray import synth
    from web_scrapper_ray.state.politeness import PolitenessBoard

    world = synth.ensure_world("t1")
    out = str(tmp_path / "pol")
    cfg = CrawlConfig(world_dir=world, out_dir=out, opts={"max_pages": 2},
                      politeness=True, max_waves=1)
    run_crawl(cfg)  # stops after wave 0 (checkpoint written)

    manifest = json.load(open(out + "/checkpoints/wave_000.json"))
    pol_dir = manifest["politeness_dir"]
    assert pol_dir and json.load(open(pol_dir + "/shard_00.json")) is not None

    # a fresh board restores the persisted next-allowed map exactly
    board = PolitenessBoard(cfg.n_politeness_shards)
    board.restore(pol_dir)
    import ray
    restored = {}
    for sh in board.shards:
        restored.update(ray.get(sh.snapshot.remote()))
    persisted = {}
    for i in range(cfg.n_politeness_shards):
        persisted.update(json.load(open(f"{pol_dir}/shard_{i:02d}.json")))
    assert restored == persisted and len(persisted) > 0

    # and the resumed crawl completes to the same artifacts as a
    # non-interrupted run (resume path exercises board.restore)
    cfg_resume = CrawlConfig(world_dir=world, out_dir=out,
                             opts={"max_pages": 2}, politeness=True)
    res = run_crawl(cfg_resume, resume=True)
    full = run_crawl(CrawlConfig(world_dir=world, out_dir=str(tmp_path / "full"),
                                 opts={"max_pages": 2}, politeness=True))
    import pyarrow.parquet as pq
    a = pq.read_table(res["crawl_log"]).drop_columns(["fetch_ts"])
    b = pq.read_table(full["crawl_log"]).drop_columns(["fetch_ts"])
    assert a.equals(b)


def test_refinalize_with_empty_swept_part_dir(ray_session, tmp_path):
    """A crashed attempt can leave refs/part=N holding nothing after the
    stale-wave sweep; its decode batch is then fully empty and finalize
    must emit the typed empty decode schema, not concat([])."""
    world = synth.ensure_world("t1")
    out = str(tmp_path / "crawl")
    res = run_crawl(_cfg(world, out))

    import pyarrow.dataset as pads

    images_before = pads.dataset(res["images_dir"], partitioning="hive").count_rows()
    os.makedirs(os.path.join(out, "refs", "part=99"), exist_ok=True)
    os.remove(os.path.join(out, "out", "format.json"))
    res2 = run_crawl(_cfg(world, out), resume=True)
    images_after = pads.dataset(res2["images_dir"], partitioning="hive").count_rows()
    assert images_after == images_before
