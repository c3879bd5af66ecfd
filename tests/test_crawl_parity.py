"""End-to-end equivalence: Ray engine vs sequential oracle (SURVEY.md §5.1
items 1+3) — crawl ordering, URL-seen sets, records, image table."""

import json
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from web_scrapper_ray import oracle, synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

RECORD_FIELDS = ("title", "url", "date", "author", "excerpt", "content", "image")


def _norm(r):
    out = {k: r.get(k) for k in RECORD_FIELDS}
    out["images"] = r.get("images") or []
    out["categories"] = r.get("categories") or []
    out["keywords"] = r.get("keywords") or []
    return out


@pytest.fixture(scope="module")
def t1_run(ray_session, tmp_path_factory):
    world = synth.ensure_world("t1")
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    out = str(tmp_path_factory.mktemp("crawl_t1"))
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(world_dir=world, out_dir=out, opts={"max_pages": 2}, politeness=False)
    res = run_crawl(cfg)
    ores = oracle.oracle_crawl_content(world, seeds, opts={"max_pages": 2})
    oimgs = oracle.oracle_images_table(world, ores.records, ores.crawl_log)
    return res, ores, oimgs


def test_crawl_log_order_matches_reference_program_order(t1_run):
    res, ores, _ = t1_run
    elog = pq.read_table(res["crawl_log"])
    eseq = list(zip(elog.column("url_canon").to_pylist(), elog.column("outcome").to_pylist()))
    oseq = [(e["url_canon"], e["outcome"]) for e in ores.crawl_log]
    assert eseq == oseq
    # fetch_seq is a dense 0..n-1 presentation of the same order
    assert elog.column("fetch_seq").to_pylist() == list(range(len(oseq)))


def test_url_seen_sets_match(t1_run):
    res, ores, _ = t1_run
    so = pq.read_table(res["seed_outcomes"])
    pairs = list(zip(so.column("url").to_pylist(), so.column("outcome").to_pylist()))
    assert {u for u, o in pairs if o == "visited"} == ores.visited_urls
    assert {u for u, o in pairs if o == "failed"} == ores.failed_urls


def test_records_match(t1_run):
    res, ores, _ = t1_run
    ea = pq.read_table(res["articles"]).to_pylist()
    assert len(ea) == len(ores.records)
    for e, o in zip(ea, ores.records):
        assert _norm(e) == _norm(o)
        assert json.loads(e["metadata_json"]) == (o.get("metadata") or {})


def test_images_table_matches(t1_run):
    res, _, oimgs = t1_run
    eimg = pads.dataset(res["images_dir"], partitioning="hive").to_table().to_pylist()
    om = {r["image_id"]: r for r in oimgs}
    em = {r["image_id"]: r for r in eimg}
    assert set(om) == set(em)
    for iid, o in om.items():
        e = em[iid]
        for key in ("bytes", "caption", "phash", "w", "h", "fmt"):
            assert e[key] == o[key], (iid, key)


def test_images_decode_psnr(t1_run):
    """Per-row decoded-pixel invariant (BASELINE.json input_hint):
    lossless exact, lossy PSNR ≥ 40 dB vs the generator's pixels."""
    from web_scrapper_ray import codecs

    _, _, oimgs = t1_run
    checked = 0
    for row in oimgs[:40]:
        w, h, fmt = synth.image_spec(row["image_id"])
        orig = synth.image_pixels(row["image_id"], w, h)
        dec = codecs.decode_image(row["bytes"])
        if fmt == "png":
            assert (dec == orig).all()
        else:
            assert codecs.psnr(orig, dec) >= 40.0
        checked += 1
    assert checked


def test_products_and_businesses_pipelines(ray_session, tmp_path):
    """Ecommerce/business page scrapes vs oracle (parse stages reused in
    batch form via the relational pipelines; here: oracle self-check on
    deterministic worlds plus engine shop/directory pipeline parity is
    covered by test_shop_pipelines)."""
    world = synth.ensure_world("t1")
    hosts = [synth.host_name(synth.TIERS["t1"], i) for i in range(8)]
    pres = oracle.oracle_scrape_products(world, [f"http://{h}/shop" for h in hosts])
    bres = oracle.oracle_scrape_businesses(world, [f"http://{h}/directory" for h in hosts])
    assert len(pres.records) == 8 * 8
    assert len(bres.records) == 8 * 6
    # reference quirks pinned: invalid example.com emails nulled,
    # categories double-appended (selector + common-pattern pass)
    assert any(b["email"] is None for b in bres.records)
    assert all(len(b["categories"]) % 2 == 0 for b in bres.records)
