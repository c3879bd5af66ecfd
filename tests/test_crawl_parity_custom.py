"""Parity on custom world shapes (SURVEY.md §5.1 item 5 — varied graph
parameters). Notably max_pages > listing_pages: style-A/C pagination
chains then end by ATTEMPTING a nonexistent page (the reference
swallows the fetch error inside the while loop, content.py:225-227) —
a path the t1/t2 tiers never hit because their caps bind first."""

import shutil

import pyarrow.parquet as pq
import pytest

from web_scrapper_ray import oracle, synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl


@pytest.mark.parametrize(
    "name,spec,max_pages",
    [
        (
            "tail404",
            synth.WorldSpec(tier="tail404", n_hosts=9, listing_pages=3,
                            entries_per_page=5, images_per_article=1,
                            max_pages=5, crawl_delay_ms_choices=(0, 30)),
            5,  # > listing_pages → chains end with a failed fetch attempt
        ),
        (
            "narrow",
            synth.WorldSpec(tier="narrow", n_hosts=5, listing_pages=1,
                            entries_per_page=2, images_per_article=3,
                            max_pages=1),
            1,  # no pagination at all
        ),
    ],
)
def test_custom_world_parity(ray_session, tmp_path, name, spec, max_pages):
    world = synth.generate_world(spec, f"/tmp/wsr_world/{name}")
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    out = str(tmp_path / name)
    shutil.rmtree(out, ignore_errors=True)
    res = run_crawl(CrawlConfig(world_dir=world, out_dir=out,
                                opts={"max_pages": max_pages}, politeness=True))
    ores = oracle.oracle_crawl_content(world, seeds, opts={"max_pages": max_pages})

    elog = pq.read_table(res["crawl_log"])
    eseq = list(zip(elog.column("url_canon").to_pylist(),
                    elog.column("outcome").to_pylist()))
    oseq = [(e["url_canon"], e["outcome"]) for e in ores.crawl_log]
    assert eseq == oseq
    if name == "tail404":
        # the chain-ending 404 attempts must exist and match
        fails = [u for u, o in oseq if o == "failed" and ("page=4" in u or "/page/4/" in u)]
        assert fails, "expected pagination chains to end with a 404 attempt"
    ea = pq.read_table(res["articles"]).to_pylist()
    assert len(ea) == len(ores.records)
    for e, o in zip(ea, ores.records):
        assert e["title"] == o.get("title") and e["url"] == o.get("url")
        assert (e["images"] or []) == (o.get("images") or [])
