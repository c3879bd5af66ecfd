"""Arrow schemas for the engine's core tables.

The image+caption table is the BASELINE.json ``input_hint`` shape
verbatim; frontier/site/crawl-log schemas follow FIXTURES.md §2/§3/§7
and replace the reference's ``List[Dict]``/``set`` state
(`/root/reference/src/webscraper/scrapers/base.py:55-70`).
"""

from __future__ import annotations

import pyarrow as pa

# North-rule image+caption table (BASELINE.json input_hint).
IMAGES_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

# Crawl frontier row. seq keys (seed_index, page_idx, sub_idx) reproduce the
# reference's program order (base.py:188 seed order; content.py:146 DOM order;
# content.py:177-227 pagination depth) as a sortable output property.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_canon", pa.string()),
        pa.field("host", pa.string()),
        pa.field("kind", pa.string()),  # seed | listing | detail | image
        pa.field("depth", pa.int32()),
        pa.field("seed_index", pa.int32()),
        pa.field("page_idx", pa.int32()),
        pa.field("sub_idx", pa.int32()),
        pa.field("priority", pa.float64()),
        pa.field("payload", pa.string()),  # JSON side-channel (listing fields / caption)
    ]
)

# Synthetic content store (FIXTURES.md §3).
SITE_SCHEMA = pa.schema(
    [
        pa.field("url_canon", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("body", pa.binary()),
        pa.field("status", pa.int32()),
        pa.field("crawl_delay_ms", pa.int32()),
    ]
)

# Canonical crawl log (FIXTURES.md §7).
CRAWL_LOG_SCHEMA = pa.schema(
    [
        pa.field("fetch_seq", pa.int64()),
        pa.field("url_canon", pa.string()),
        pa.field("outcome", pa.string()),  # visited | failed
    ]
)
