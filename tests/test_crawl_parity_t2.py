"""t2-scale engine↔oracle equivalence (FIXTURES.md §8 correctness tier):
64 hosts, mixed crawl-delays, politeness ON, unicode hosts, all three
pagination styles. Complements the t1 parity suite at ~20× the volume."""

import json
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from web_scrapper_ray import oracle, synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


@pytest.fixture(scope="module")
def t2_run(ray_session, tmp_path_factory):
    world = synth.ensure_world("t2")
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    out = str(tmp_path_factory.mktemp("crawl_t2"))
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(world_dir=world, out_dir=out, opts={"max_pages": 3},
                      politeness=True)
    res = run_crawl(cfg)
    ores = oracle.oracle_crawl_content(world, seeds, opts={"max_pages": 3})
    return res, ores, world


def test_t2_crawl_log_and_seen_sets(t2_run):
    res, ores, _ = t2_run
    elog = pq.read_table(res["crawl_log"])
    eseq = list(zip(elog.column("url_canon").to_pylist(),
                    elog.column("outcome").to_pylist()))
    oseq = [(e["url_canon"], e["outcome"]) for e in ores.crawl_log]
    assert eseq == oseq
    so = pq.read_table(res["seed_outcomes"])
    pairs = list(zip(so.column("url").to_pylist(), so.column("outcome").to_pylist()))
    assert {u for u, o in pairs if o == "visited"} == ores.visited_urls
    assert {u for u, o in pairs if o == "failed"} == ores.failed_urls


def test_t2_records_and_images(t2_run):
    res, ores, world = t2_run
    ea = pq.read_table(res["articles"]).to_pylist()
    assert len(ea) == len(ores.records)
    fields = ("title", "url", "date", "author", "excerpt", "content", "image")
    for e, o in zip(ea, ores.records):
        for f in fields:
            assert e.get(f) == o.get(f), f
        assert (e.get("images") or []) == (o.get("images") or [])
        assert (e.get("keywords") or []) == (o.get("keywords") or [])
        assert json.loads(e["metadata_json"]) == (o.get("metadata") or {})
    oimgs = oracle.oracle_images_table(world, ores.records, ores.crawl_log)
    eimg = pads.dataset(res["images_dir"], partitioning="hive").to_table().to_pylist()
    om = {r["image_id"]: r for r in oimgs}
    em = {r["image_id"]: r for r in eimg}
    assert set(om) == set(em)
    for iid, o in om.items():
        e = em[iid]
        for key in ("bytes", "caption", "phash", "w", "h", "fmt"):
            assert e[key] == o[key], (iid, key)
