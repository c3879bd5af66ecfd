"""Config tree, registry, UA rotation, CLI export (SURVEY.md §2.9/§3.3)."""

import json
import subprocess
import sys

import pytest

from web_scrapper_ray.config import ConfigError, ConfigManager, get_pipeline
from web_scrapper_ray.functions.user_agents import UserAgentManager, get_random_user_agent


def _write_cfg(tmp_path, data, name="c.json"):
    p = tmp_path / name
    p.write_text(json.dumps(data))
    return str(p)


def test_config_load_validate_dotpath(tmp_path):
    cfg = {"scraper": {"type": "content", "urls": ["http://h/x"],
                       "output": {"format": "json", "path": "/tmp/o.json"}}}
    cm = ConfigManager(_write_cfg(tmp_path, cfg))
    assert cm.get("scraper.type") == "content"
    assert cm.get("scraper.output.format") == "json"
    assert cm.get("missing.path", 42) == 42
    cm.set("scraper.max_pages", 3)
    assert cm.config["scraper"]["max_pages"] == 3


def test_config_yaml_and_validation_errors(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("scraper:\n  type: ecommerce\n  urls:\n    - http://h/shop\n")
    cm = ConfigManager(str(p))
    assert cm.get("scraper.type") == "ecommerce"
    with pytest.raises(ConfigError):
        ConfigManager(_write_cfg(tmp_path, {"scraper": {"type": "nope", "urls": ["x"]}}, "bad.json"))
    with pytest.raises(ConfigError):
        ConfigManager(_write_cfg(tmp_path, {"scraper": {"type": "content", "urls": []}}, "bad2.json"))
    with pytest.raises(ConfigError):
        ConfigManager(_write_cfg(
            tmp_path,
            {"scraper": {"type": "content", "urls": ["x"], "output": {"format": "weird"}}},
            "bad3.json"))
    # non-mapping shapes must surface as ConfigError, not raw TypeError
    # (reference runs _validate_config inside the wrapping try)
    with pytest.raises(ConfigError):
        ConfigManager(_write_cfg(
            tmp_path,
            {"scraper": {"type": "content", "urls": ["x"], "output": 42}},
            "bad4.json"))
    with pytest.raises(ConfigError):
        ConfigManager(_write_cfg(tmp_path, {"scraper": 42}, "bad5.json"))


def test_config_save_preserves_key_order(tmp_path):
    """Reference save_config uses sort_keys=False — saved YAML keeps
    insertion order (type before urls before output)."""
    from web_scrapper_ray.config import ConfigManager

    cm = ConfigManager()
    cm.config = {"scraper": {"type": "content", "urls": ["http://h/x"],
                             "output": {"format": "json", "path": "/tmp/o"}}}
    p = str(tmp_path / "saved.yaml")
    cm.save_config(p)
    text = open(p).read()
    assert text.index("type:") < text.index("urls:") < text.index("output:")


def test_registry():
    assert callable(get_pipeline("ecommerce"))
    assert callable(get_pipeline("content"))
    with pytest.raises(ConfigError):
        get_pipeline("unknown")


def test_user_agent_rotation():
    m = UserAgentManager(rotate="sequential")
    seq = [m.get() for _ in range(len(m.user_agents) + 1)]
    assert seq[0] == seq[-1]
    assert get_random_user_agent(seed=1) == get_random_user_agent(seed=1)


def test_cli_export_data(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), str(src))
    out = tmp_path / "out_json"
    # in-process (the CLI owns a session normally; reuse the test one)
    from web_scrapper_ray.sources.io import export_data, load_dataset

    export_data(str(src), str(out), output_format="json")
    assert load_dataset(str(out), fmt="json").count() == 2


def test_cli_scrape_subprocess(tmp_path):
    """End-to-end CLI in its own process (owns its Ray session)."""
    from web_scrapper_ray import synth

    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    cfg = {"scraper": {"type": "ecommerce",
                       "urls": [f"http://{synth.host_name(spec, 0)}/shop"],
                       "selectors": {"product_container": ".product-item",
                                     "name": ".product-title", "price": ".price"},
                       "output": {"format": "json", "path": str(tmp_path / "prod_json")}}}
    cfg_path = _write_cfg(tmp_path, cfg)
    r = subprocess.run(
        [sys.executable, "-m", "web_scrapper_ray.cli", "--num-cpus", "2",
         "scrape", "--config", cfg_path, "--world-dir", world],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["records"] == 8


def test_cli_query_subprocess(tmp_path):
    """`wsr query` runs a registry pipeline end-to-end in its own
    process and lands the result in the suffix-picked format."""
    out = str(tmp_path / "q01.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "web_scrapper_ray.cli", "--num-cpus", "2",
         "query", "q01_lineitem_agg",
         "--sf-dir", "/root/testdata/sf0.001", "--output", out],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows"] > 0 and info["output"] == out
    import pandas as pd

    assert len(pd.read_parquet(out)) == info["rows"]
    r2 = subprocess.run(
        [sys.executable, "-m", "web_scrapper_ray.cli", "query", "list"],
        capture_output=True, text=True, timeout=60,
    )
    assert r2.returncode == 0
    assert "q01_lineitem_agg" in r2.stdout.splitlines()
    r3 = subprocess.run(
        [sys.executable, "-m", "web_scrapper_ray.cli", "query", "nope"],
        capture_output=True, text=True, timeout=60,
    )
    assert r3.returncode == 2
