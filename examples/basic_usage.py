"""Programmatic API examples (reference analog:
`/root/reference/examples/basic_usage.py` — which pretty-prints
hard-coded sample records; these examples RUN the real engine on the
deterministic synthetic world).

Run: python examples/basic_usage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from web_scrapper_ray.pipelines.scrape import run_page_scrape
    from web_scrapper_ray.sources.io import export_data, generate_rss

    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]

    # 1. content crawl (listing → details → pagination → images)
    res = run_crawl(CrawlConfig(world_dir=world, out_dir="/tmp/wsr_example",
                                opts={"max_pages": 2}))
    print("crawl:", res["counters"], "| images:", res["n_images"])

    # 2. ecommerce page scrape
    products = run_page_scrape(
        world, [f"http://{synth.host_name(spec, 0)}/shop"], "ecommerce"
    )
    print("first product:", {k: products[0][k] for k in ("name", "price", "currency")})

    # 3. business directory scrape
    businesses = run_page_scrape(
        world, [f"http://{synth.host_name(spec, 0)}/directory"], "business"
    )
    print("first business:", {k: businesses[0][k] for k in ("name", "phone", "email")})

    # 4. format conversion (streaming read → write)
    export_data(res["articles"], "/tmp/wsr_example/articles_json",
                output_format="json")
    print("exported articles to JSON dir")

    # 5. RSS feed from the crawled articles
    import pyarrow.parquet as pq

    articles = pq.read_table(res["articles"]).to_pylist()[:5]
    xml = generate_rss(articles, "Example Feed", "Synthetic crawl", "http://h/feed")
    print("rss items:", xml.count("<item>"))

    # 6. priority scheduling: the last seed jumps the backlog
    prio = run_crawl(CrawlConfig(
        world_dir=world, out_dir="/tmp/wsr_example_prio",
        seeds=[synth.listing_url(spec, i, 1) for i in range(4)],
        opts={"max_pages": 2}, politeness=False,
        frontier_policy="priority", seed_priorities={3: 10},
        max_urls_per_wave=2))
    log = pq.read_table(prio["crawl_log"]).to_pandas()
    first = log[log["page_idx"] == 1].groupby("seed_index")["fetch_ts"].min()
    print("priority fetch order:", list(first.sort_values().index))

    # 7. Excel interchange (pure-stdlib codec; multi-sheet + options)
    from web_scrapper_ray.sources.xlsx import read_xlsx, write_xlsx

    write_xlsx("/tmp/wsr_example/report.xlsx",
               {"products": products[:3], "businesses": businesses[:3]},
               freeze_panes=(1, 0), autofilter=True)
    print("xlsx sheets:", list(read_xlsx("/tmp/wsr_example/report.xlsx")))

    # 8. cron-scheduled jobs (validated 5-field cron, webhook notify)
    from web_scrapper_ray.schedulers import JobScheduler, next_cron_fire

    sched = JobScheduler("/tmp/wsr_example/jobs.json")
    jid = sched.schedule_job("nightly", "/tmp/cfg.yaml", "0 3 * * *")
    print("cron job next fire:", sched.get_job(jid)["next_run"],
          "(= next_cron_fire:", next_cron_fire("0 3 * * *", __import__("time").time()), ")")
    sched.remove_job(jid)

    ray.shutdown()


if __name__ == "__main__":
    main()
