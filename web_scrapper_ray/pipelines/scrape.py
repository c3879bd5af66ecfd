"""Single-wave page scrapes (ecommerce / business directory pipelines).

The reference's EcommerceScraper / BusinessScraper have no pagination or
detail-fetch (`/root/reference/src/webscraper/scrapers/ecommerce.py:104-142`,
`business.py:107-145`): one fetch per seed, N records per page.  Ray
shape: seeds → canonicalize → groupby(host) → fused fetch+parse group fn
→ typed records sorted by (seed_index, dom_index) = reference program
order.  (The reference quirk that relative URLs absolutize against
``urls[0]``'s host — ecommerce.py:578-586 — is preserved.)
"""

from __future__ import annotations

import collections
import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import extract
from ..functions.urlnorm import canonicalize_batch, host_of
from ..minidom import parse_html
from ..oracle import BIZ_SELECTORS, ECOM_SELECTORS
from ..sources.fetch import worker_backend

_OUT_COLS = ["row_kind", "seed_index", "dom_idx", "url", "payload", "outcome"]

_SeedRow = collections.namedtuple("_SeedRow",
                                  ["seed_index", "url", "host"])


def _empty_df() -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series(dtype="int64" if c in ("seed_index", "dom_idx") else "object")
         for c in _OUT_COLS}
    )


def _make_scrape_fn(world_dir: str, kind: str, selectors: dict,
                    first_seed_url: str, backend_spec: dict | None = None):
    def scrape(group: pa.Table) -> pd.DataFrame:
        if group.num_rows == 0:
            return _empty_df()
        store = worker_backend(world_dir, backend_spec)
        group = group.take(pc.sort_indices(
            group, sort_keys=[("seed_index", "ascending")]))
        out: list[dict] = []
        for r in map(_SeedRow._make,
                     zip(group.column("seed_index").to_pylist(),
                         group.column("url").to_pylist(),
                         group.column("host").to_pylist())):
            # per-seed guard with buffered commit (reference base.py:
            # 188-199 wraps each URL in try/except and marks it failed;
            # a decode/parse/extract error must cost ONE seed's records,
            # not the whole Ray task — and must not leak partial rows)
            seed_rows: list[dict] = []
            try:
                body, status = store.get(r.url, r.host)
                ok = body is not None and status < 400
                seed_rows.append({"row_kind": "seed_outcome",
                                  "seed_index": int(r.seed_index),
                                  "dom_idx": -1, "url": r.url, "payload": "",
                                  "outcome": "visited" if ok else "failed"})
                if ok:
                    doc = parse_html(body.decode())
                    if kind == "ecommerce":
                        elements = extract.find_product_elements(doc, selectors)
                        items = (extract.extract_product(el, selectors)
                                 for el in elements)
                        transformed = (extract.transform_product(x, first_seed_url)
                                       for x in items if x)
                        validated = [extract.validate_product(x)
                                     for x in transformed if x]
                    else:
                        elements = extract.find_business_elements(doc, selectors)
                        items = (extract.extract_business(el, selectors)
                                 for el in elements)
                        transformed = (extract.transform_business(x)
                                       for x in items if x)
                        validated = [extract.validate_business(x)
                                     for x in transformed if x]
                    for dom_i, rec in enumerate(v for v in validated if v):
                        seed_rows.append({"row_kind": "record",
                                          "seed_index": int(r.seed_index),
                                          "dom_idx": dom_i, "url": r.url,
                                          "payload": json.dumps(rec),
                                          "outcome": ""})
            except Exception:
                seed_rows = [{"row_kind": "seed_outcome",
                              "seed_index": int(r.seed_index),
                              "dom_idx": -1, "url": r.url, "payload": "",
                              "outcome": "failed"}]
            out.extend(seed_rows)
        return pd.DataFrame(out, columns=_OUT_COLS) if out else _empty_df()

    return scrape


def run_page_scrape(world_dir: str, seeds: list[str], kind: str,
                    selectors: dict | None = None,
                    fetch_backend: dict | None = None) -> list[dict]:
    """Distributed scrape; returns records as dicts in reference order
    (the reference's small-result list-of-dicts API). ``fetch_backend``
    selects the network (sources/fetch.py) exactly like CrawlConfig.
    Ray session owned by the caller."""
    import pyarrow.compute as pc
    import ray.data as rd

    selectors = selectors or (ECOM_SELECTORS if kind == "ecommerce" else BIZ_SELECTORS)
    canon = canonicalize_batch(seeds)
    t = pa.table(
        {
            "seed_index": pa.array(range(len(seeds)), pa.int64()),
            "url": pa.array(seeds),
            "url_canon": pa.array(canon),
            "host": pa.array([host_of(u) for u in canon]),
        }
    )
    fn = _make_scrape_fn(world_dir, kind, selectors, seeds[0], fetch_backend)
    out = rd.from_arrow(t).groupby("host").map_groups(fn,
                                                      batch_format="pyarrow")
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("row_kind"), "record")),
        batch_format="pyarrow",
    ).to_pandas()
    rows = rows.sort_values(["seed_index", "dom_idx"])
    return [json.loads(p) for p in rows["payload"]]
