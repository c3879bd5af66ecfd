"""Config tree + pipeline registry (reference semantics:
`/root/reference/src/webscraper/utils/config.py:41-217`,
`scrapers/__init__.py:13-49`, `storage/__init__.py:15-48`).

Same user surface as the reference — YAML/JSON config with dot-path
get/set, required-field validation, a scraper-type registry and a
storage-format alias table — but the factories return Ray pipeline
builders instead of sequential scraper objects.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional


class WebScraperError(Exception):
    """Base exception for all engine errors (reference hierarchy root,
    exceptions.py). Defined here rather than functions/errors.py so
    ConfigError can subclass it without an import cycle; errors.py
    re-exports both."""


class ConfigError(WebScraperError):
    """Reference parity: ConfigError(WebScraperError) — user code
    catching WebScraperError around config loading must see it."""


VALID_SCRAPER_TYPES = ("ecommerce", "business", "content")
VALID_OUTPUT_FORMATS = (
    "csv", "json", "excel", "db", "database", "xlsx", "sqlite",
    "postgresql", "postgres", "mysql", "parquet", "lance",
)
_PATHLESS_FORMATS = ("database", "db", "sqlite", "postgresql", "postgres", "mysql")


class ConfigManager:
    def __init__(self, config_path: Optional[str] = None):
        self.config: dict[str, Any] = {}
        self.config_path: Optional[str] = None
        if config_path:
            self.load_config(config_path)

    def load_config(self, config_path: str) -> dict[str, Any]:
        if not os.path.exists(config_path):
            raise ConfigError(f"Configuration file not found: {config_path}")
        ext = os.path.splitext(config_path)[1].lower()
        try:
            with open(config_path, encoding="utf-8") as f:
                if ext in (".yml", ".yaml"):
                    import yaml

                    self.config = yaml.safe_load(f)
                elif ext == ".json":
                    self.config = json.load(f)
                else:
                    raise ConfigError(f"Unsupported configuration format: {ext}")
            self.config_path = config_path
            # validate INSIDE the wrapping try (reference config.py:78):
            # a malformed shape (e.g. `output: 42` → TypeError from
            # `"format" not in out`) must surface as ConfigError, never
            # a raw TypeError escaping load_config
            self.validate()
        except ConfigError:
            raise
        except Exception as e:
            raise ConfigError(
                f"Failed to load configuration from {config_path}: {e}"
            ) from e
        return self.config

    def validate(self) -> None:
        """Required sections/fields + whitelists (config.py:91-157)."""
        if not self.config:
            raise ConfigError("Configuration is empty")
        if "scraper" not in self.config:
            raise ConfigError("Missing required configuration section: scraper")
        sc = self.config["scraper"]
        for field in ("type", "urls"):
            if field not in sc:
                raise ConfigError(f"Missing required field in scraper configuration: {field}")
        if sc["type"] not in VALID_SCRAPER_TYPES:
            raise ConfigError(f"Invalid scraper type: {sc['type']}")
        if not isinstance(sc["urls"], list) or not sc["urls"]:
            raise ConfigError("URLs must be a non-empty list")
        out = sc.get("output")
        if "output" in sc and not isinstance(out, dict):
            # a bare 'output:' YAML line parses to None (and `output: 42`
            # to an int) — the reference's "'format' not in None/42"
            # TypeError surfaces as a ConfigError at load time via the
            # wrapping try; raise the specific message when validate()
            # is called directly so it never escapes as TypeError
            raise ConfigError("Output configuration must be a mapping")
        if out is not None:
            if "format" not in out:
                raise ConfigError("Missing required field in output configuration: format")
            if out["format"] not in VALID_OUTPUT_FORMATS:
                raise ConfigError(f"Invalid output format: {out['format']}")
            if "path" not in out and out["format"] not in _PATHLESS_FORMATS:
                raise ConfigError("Missing required field in output configuration: path")

    def get(self, key: str, default: Any = None) -> Any:
        value: Any = self.config
        for k in key.split("."):
            if isinstance(value, dict) and k in value:
                value = value[k]
            else:
                return default
        return value

    def set(self, key: str, value: Any) -> None:
        keys = key.split(".")
        node = self.config
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], dict):
                node[k] = {}
            node = node[k]
        node[keys[-1]] = value

    def save_config(self, config_path: Optional[str] = None) -> None:
        path = config_path or self.config_path
        if not path:
            raise ConfigError("No config path to save to")
        ext = os.path.splitext(path)[1].lower()
        if ext not in (".yml", ".yaml", ".json"):
            # reference save_config whitelists extensions (config.py)
            raise ConfigError(f"Unsupported configuration format: {ext}")
        try:
            parent = os.path.dirname(os.path.abspath(path))
            if parent:
                os.makedirs(parent, exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                if ext in (".yml", ".yaml"):
                    import yaml

                    # insertion-order keys like the reference's
                    # yaml.dump(..., sort_keys=False) (config.py:247)
                    yaml.safe_dump(self.config, f, default_flow_style=False,
                                   sort_keys=False)
                else:
                    json.dump(self.config, f, indent=2)
        except ConfigError:
            raise
        except Exception as e:  # reference wraps all save failures
            raise ConfigError(f"Failed to save configuration: {e}") from e


# ---------------------------------------------------------------------------
# Pipeline registry (scrapers/__init__.py factory analog)
# ---------------------------------------------------------------------------


def get_pipeline(scraper_type: str) -> Callable:
    """→ a callable (world_dir, seeds, selectors) → records, mirroring
    ``get_scraper``'s 3-type whitelist."""
    from .pipelines.scrape import run_page_scrape

    if scraper_type == "ecommerce":
        return lambda world, seeds, selectors=None, fetch_backend=None: \
            run_page_scrape(world, seeds, "ecommerce", selectors,
                            fetch_backend=fetch_backend)
    if scraper_type == "business":
        return lambda world, seeds, selectors=None, fetch_backend=None: \
            run_page_scrape(world, seeds, "business", selectors,
                            fetch_backend=fetch_backend)
    if scraper_type == "content":
        from .oracle import CONTENT_SELECTORS
        from .pipelines.crawl import CrawlConfig, run_crawl

        def content_pipeline(world, seeds, selectors=None, out_dir="/tmp/wsr_cli_crawl",
                             opts=None, **crawl_kwargs):
            """``crawl_kwargs`` pass through to CrawlConfig — the
            declarative surface for fetch_backend / frontier_policy /
            seed_priorities / max_urls_per_wave / dedup_scope /
            speculative_decode."""
            cfg = CrawlConfig(world_dir=world, out_dir=out_dir, seeds=seeds,
                              selectors=selectors or dict(CONTENT_SELECTORS),
                              opts=opts or {}, **crawl_kwargs)
            return run_crawl(cfg)

        return content_pipeline
    raise ConfigError(f"Unknown scraper type: {scraper_type}")
