"""Engine page-scrape pipelines vs sequential oracle (ecommerce /
business, SURVEY.md §2.2 E1-E17 orchestration parity)."""

import pytest

from web_scrapper_ray import oracle, synth
from web_scrapper_ray.pipelines.scrape import run_page_scrape


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world("t1")


def _seeds(path_suffix):
    spec = synth.TIERS["t1"]
    return [f"http://{synth.host_name(spec, i)}/{path_suffix}" for i in range(spec.n_hosts)]


def test_products_match_oracle(ray_session, world):
    seeds = _seeds("shop")
    engine = run_page_scrape(world, seeds, "ecommerce")
    ores = oracle.oracle_scrape_products(world, seeds)
    assert len(engine) == len(ores.records)
    for e, o in zip(engine, ores.records):
        assert e == o


def test_businesses_match_oracle(ray_session, world):
    seeds = _seeds("directory")
    engine = run_page_scrape(world, seeds, "business")
    ores = oracle.oracle_scrape_businesses(world, seeds)
    assert len(engine) == len(ores.records)
    for e, o in zip(engine, ores.records):
        assert e == o


def test_failed_seed_skipped(ray_session, world):
    spec = synth.TIERS["t1"]
    seeds = [f"http://{synth.host_name(spec, 0)}/shop",
             f"http://{synth.host_name(spec, 0)}/nope"]
    engine = run_page_scrape(world, seeds, "ecommerce")
    assert len(engine) == spec.products_per_host
