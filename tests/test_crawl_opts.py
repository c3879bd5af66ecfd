"""Content-scraper option surface parity (reference __init__ kwargs,
content.py:50-57): non-default generate_summary / keywords / summary
lengths must flow identically through engine and oracle."""

import shutil

import pyarrow.parquet as pq

from web_scrapper_ray import oracle, synth
from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

OPTS = {
    "max_pages": 2,
    "generate_summary": False,   # excerpt falls back to _extract_excerpt
    "extract_keywords": True,
    "max_keywords": 3,
    "summary_length": 80,
    "extract_metadata": False,   # no metadata map on single articles
}


def test_non_default_content_options(ray_session, tmp_path):
    world = synth.ensure_world("t1")
    seeds = pq.read_table(world + "/seeds.parquet").column("url").to_pylist()
    out = str(tmp_path / "opts")
    shutil.rmtree(out, ignore_errors=True)
    res = run_crawl(CrawlConfig(world_dir=world, out_dir=out, opts=OPTS,
                                politeness=False))
    ores = oracle.oracle_crawl_content(world, seeds, opts=OPTS)
    ea = pq.read_table(res["articles"]).to_pylist()
    assert len(ea) == len(ores.records)
    saw_keywords = False
    for e, o in zip(ea, ores.records):
        assert e["title"] == o.get("title")
        assert e["excerpt"] == o.get("excerpt")
        assert (e["keywords"] or []) == (o.get("keywords") or [])
        if e["keywords"]:
            saw_keywords = True
            assert len(e["keywords"]) <= 3
        import json

        assert json.loads(e["metadata_json"]) == (o.get("metadata") or {})
    assert saw_keywords


def test_speculative_decode_output_identical(ray_session, tmp_path):
    """Opt-in speculative decode lanes converge to the exact same
    images table as the default path (reconciliation invariant)."""
    import pyarrow.dataset as pads

    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

    world = synth.ensure_world("t1")

    def one(spec, out):
        cfg = CrawlConfig(world_dir=world, out_dir=str(tmp_path / out),
                          opts={"max_pages": 2}, politeness=False,
                          speculative_decode=spec, spec_decode_lanes=2)
        return run_crawl(cfg)

    a = one(False, "plain")
    b = one(True, "spec")
    ta = pads.dataset(a["images_dir"], partitioning="hive").to_table().sort_by("image_id")
    tb = pads.dataset(b["images_dir"], partitioning="hive").to_table().sort_by("image_id")
    assert ta.num_rows == tb.num_rows and ta.num_rows > 0
    da = {r["image_id"]: r for r in ta.to_pylist()}
    db = {r["image_id"]: r for r in tb.to_pylist()}
    assert da == db
    # and the lanes actually produced tmp output (speculation ran)
    import glob as g
    assert g.glob(str(tmp_path / "spec" / "images_tmp" / "part=*" / "wave_*.parquet"))


def test_respect_disallow_end_to_end(ray_session, tmp_path):
    """Opt-in robots enforcement: a Disallow rule (RFC 9309 matcher)
    turns matching fetches into 'disallowed' log rows; parity mode
    (flag off) fetches everything."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl

    src = synth.ensure_world("t1")
    world = str(tmp_path / "world")
    shutil.copytree(src, world)
    # patch every robots.txt: block the /posts/ subtree
    for f in glob.glob(world + "/site/site_*.parquet"):
        t = pq.read_table(f)
        bodies = []
        for u, b in zip(t.column("url_canon").to_pylist(),
                        t.column("body").to_pylist()):
            if u.endswith("/robots.txt"):
                b = b + b"Disallow: /posts/\n"
            bodies.append(b)
        t = t.set_column(t.schema.get_field_index("body"), "body",
                         pa.array(bodies, pa.binary()))
        pq.write_table(t, f)

    def one(flag, out):
        cfg = CrawlConfig(world_dir=world, out_dir=str(tmp_path / out),
                          opts={"max_pages": 2, "respect_disallow": flag},
                          politeness=True)
        return run_crawl(cfg)

    res_off = one(False, "off")
    res_on = one(True, "on")
    log_off = pq.read_table(res_off["crawl_log"]).to_pandas()
    log_on = pq.read_table(res_on["crawl_log"]).to_pandas()
    assert (log_off["outcome"] == "disallowed").sum() == 0
    n_blocked = (log_on["outcome"] == "disallowed").sum()
    assert n_blocked > 0
    assert log_on[log_on["outcome"] == "disallowed"]["url_canon"].str.contains(
        "/posts/").all()
    # blocked detail fetches → fewer article records than parity mode
    n_off = pq.read_table(res_off["articles"]).num_rows
    n_on = pq.read_table(res_on["articles"]).num_rows
    assert n_on < n_off
