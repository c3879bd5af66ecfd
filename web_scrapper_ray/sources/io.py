"""Format sources/sinks + export converter (SURVEY.md §2.1 S2-S11).

The reference's storage handlers materialize whole result sets into
pandas (`/root/reference/src/webscraper/storage/csv_handler.py:64`,
`json_handler.py:23-141`, `database_handler.py:34-208`); here every
format maps to a streaming Ray Data reader/writer:

=========  ==============================  ==========================
format     load                            save
=========  ==============================  ==========================
csv        ``ray.data.read_csv``           ``ds.write_csv``
json       ``ray.data.read_json``          ``ds.write_json``
parquet    ``ray.data.read_parquet``       ``ds.write_parquet``
lance      parquet fallback (see note)     parquet fallback
sql        ``ray.data.read_sql``           per-batch executemany
excel      driver-side pandas (niche)      driver-side pandas
=========  ==============================  ==========================

Lance note: the north rule names Lance as the image-table format but
``pylance`` is not installed in this container (and installs are
disallowed), so the "lance" alias maps to a parquet directory with the
identical schema behind this format switch — swap the two write calls
when the wheel is available.

``export_data`` reproduces the CLI converter
(`cli/main.py:275-334`) as a streaming read→write with format
inference by extension.
"""

from __future__ import annotations

import os
from typing import Optional

_EXT_TO_FORMAT = {
    ".csv": "csv", ".json": "json", ".jsonl": "json", ".parquet": "parquet",
    ".pq": "parquet", ".lance": "lance", ".xlsx": "excel", ".xls": "excel",
    ".db": "sql", ".sqlite": "sql",
}

FORMAT_ALIASES = {
    "csv": "csv", "json": "json", "jsonl": "json", "parquet": "parquet",
    "pq": "parquet", "lance": "lance", "excel": "excel", "xlsx": "excel",
    "db": "sql", "sql": "sql", "sqlite": "sql", "database": "sql",
    # DSN-based servers validate as output formats (reference whitelist)
    # but only the sqlite file sink is wired in this build — mapped so
    # save_dataset raises a clear error, not a KeyError
    "postgresql": "sql_dsn", "postgres": "sql_dsn", "mysql": "sql_dsn",
}


def sqlalchemy_available() -> bool:
    try:
        import sqlalchemy  # noqa: F401

        return True
    except ImportError:
        return False


def sink_preflight_error(fmt: Optional[str], path: Optional[str]) -> Optional[str]:
    """Pre-flight a sink spec BEFORE any work runs: returns an error
    string for configurations save_dataset would reject at write time
    (server DSNs without SQLAlchemy — whether spelled as a postgres/
    mysql format or as fmt='sql' with a '://' path), else None.
    Mirrors the exact routing in :func:`save_dataset`."""
    try:
        f = FORMAT_ALIASES[fmt] if fmt else (
            FORMAT_ALIASES[infer_format(path)] if path else None)
    except (KeyError, ValueError):
        return f"unsupported output format {fmt!r}"
    is_dsn = f == "sql_dsn" or (
        f == "sql" and path and "://" in path
        and not path.startswith("sqlite:///"))
    if is_dsn and not sqlalchemy_available():
        return ("server DSN sinks (postgresql/mysql) need SQLAlchemy, "
                "which is not installed — use sqlite:///path, or "
                "sqlite/parquet/csv/json")
    return None


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_TO_FORMAT:
        raise ValueError(f"cannot infer format from {path!r}")
    return _EXT_TO_FORMAT[ext]


def load_dataset(path: str, fmt: Optional[str] = None, **kwargs):
    """→ ray.data.Dataset (streaming; never a driver-side list-of-dicts)."""
    import ray.data as rd

    fmt = FORMAT_ALIASES[fmt or infer_format(path)]
    if fmt == "csv":
        return rd.read_csv(path, **kwargs)
    if fmt == "json":
        return rd.read_json(path, **kwargs)
    if fmt in ("parquet", "lance"):
        return rd.read_parquet(path, **kwargs)
    if fmt == "excel":
        # S4: prefer pandas/openpyxl when present; otherwise the
        # pure-stdlib codec (sources/xlsx.py) reads the same files.
        try:
            import openpyxl  # noqa: F401
        except ImportError:
            from .xlsx import read_xlsx

            sheet = kwargs.pop("sheet_name", None)
            data = read_xlsx(path, sheet_name=sheet)
            if isinstance(data, dict):  # all sheets → first (pd.read_excel default)
                data = next(iter(data.values()), [])
            return rd.from_items(data)
        import pandas as pd

        df = pd.read_excel(path, **kwargs)
        if isinstance(df, dict):  # sheet_name=None/list → first sheet,
            df = next(iter(df.values()))  # matching the stdlib fallback
        return rd.from_pandas(df)
    if fmt in ("sql", "sql_dsn"):
        # default table name matches the reference database handler
        # (storage/database_handler.py:67 'scraped_data')
        table = kwargs.pop("table", "scraped_data")
        # sqlite:/// DSNs always take the stdlib path (same fallback as
        # _write_dsn, so save/load round-trips work without SQLAlchemy
        # even under fmt='postgresql'/'sql_dsn')
        if "://" in path and not path.startswith("sqlite:///"):
            # server DSN load — reference load() accepts any SQLAlchemy
            # connection string (database_handler.py:152-157)
            try:
                import sqlalchemy  # noqa: F401
            except ImportError:
                raise NotImplementedError(
                    f"DSN source {path.split(':', 1)[0]!r} needs SQLAlchemy, "
                    "which is not installed in this sandbox — use "
                    "sqlite:///path or a sqlite file") from None
            dsn = path

            def dsn_factory():
                from sqlalchemy import create_engine

                return create_engine(dsn).raw_connection()

            return rd.read_sql(f"SELECT * FROM {table}", dsn_factory, **kwargs)
        import sqlite3

        if path.startswith("sqlite:///"):
            path = path[len("sqlite:///"):]
        if not os.path.exists(path):
            # reference load() checks existence before connecting
            # (database_handler.py:146-150); sqlite3.connect would
            # otherwise create an empty db file as a side effect
            raise FileNotFoundError(f"SQLite database file not found: {path}")
        return rd.read_sql(f"SELECT * FROM {table}",
                           lambda: sqlite3.connect(path), **kwargs)
    raise ValueError(f"unsupported format {fmt!r}")


def save_dataset(ds, path: str, fmt: Optional[str] = None,
                 single_file: bool = False, **kwargs) -> None:
    """``single_file=True`` collects the dataset driver-side and writes
    ONE reference-compatible file (an indented JSON array per the
    reference json_handler, or one CSV) instead of a streaming part
    directory — for small exports consumed by reference-side tooling.
    The default stays streaming: a 100 TB sink must never funnel
    through the driver."""
    fmt = FORMAT_ALIASES[fmt or infer_format(path)]
    if single_file:
        if fmt not in ("csv", "json"):
            # don't silently write a part directory the caller asked
            # to avoid — parquet/sql/excel have no single-file branch
            raise ValueError(
                f"single_file is supported for csv/json, not {fmt!r}")
        _makedirs_for(path)
        df = ds.to_pandas()
        if fmt == "csv":
            df.to_csv(path, index=False, **kwargs)
        else:
            import json

            with open(path, "w", encoding="utf-8") as f:
                json.dump(df.to_dict("records"), f,
                          **{"ensure_ascii": False, "indent": 2,
                             "default": str, **kwargs})
        return
    if fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    elif fmt in ("parquet", "lance"):
        ds.write_parquet(path, **kwargs)
    elif fmt == "excel":
        # S8: small-output interchange sink (reference keeps Excel
        # driver-side too). Probe openpyxl separately (never catch
        # ImportErrors raised INSIDE to_excel); route to the stdlib
        # writer whenever extended options (freeze_panes/autofilter)
        # are requested — pandas' to_excel doesn't accept them, so the
        # declarative surface behaves the same in every environment.
        try:
            import openpyxl  # noqa: F401
            have_openpyxl = True
        except ImportError:
            have_openpyxl = False
        extended = {"freeze_panes", "autofilter"} & set(kwargs)
        _makedirs_for(path)
        if have_openpyxl and not extended:
            ds.to_pandas().to_excel(path, index=False, **kwargs)
        else:
            from .xlsx import write_xlsx

            sheet = kwargs.pop("sheet_name", "Sheet1")
            rows = [dict(r) for r in ds.to_pandas().to_dict("records")]
            write_xlsx(path, {sheet: rows}, **kwargs)
    elif fmt == "sql":
        if "://" in path:
            _write_dsn(ds, path, kwargs.pop("table", "scraped_data"))
        else:
            _write_sqlite(ds, path, kwargs.pop("table", "scraped_data"))
    elif fmt == "sql_dsn":
        _write_dsn(ds, path, kwargs.pop("table", "scraped_data"))
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def _makedirs_for(path: str) -> None:
    """Create the output file's parent directory like every reference
    storage handler does (csv_handler.py:61, database_handler.py:84,
    excel_handler.py:54, json_handler.py:50)."""
    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)


def _write_dsn(ds, dsn: str, table: str) -> None:
    """S9 DSN sink — reference ``storage/database_handler.py:34-115``
    accepts any SQLAlchemy DSN (postgres/mysql/sqlite). Uses SQLAlchemy
    when installed (same per-batch ``to_sql`` shape as the sqlite
    writer); ``sqlite:///`` DSNs also work without it via stdlib
    sqlite3 through the identical code path."""
    try:
        from sqlalchemy import create_engine
    except ImportError:
        if dsn.startswith("sqlite:///"):
            _write_sqlite(ds, dsn[len("sqlite:///"):], table)
            return
        raise NotImplementedError(
            f"DSN sink {dsn.split(':', 1)[0]!r} needs SQLAlchemy, which is "
            "not installed in this sandbox — use sqlite:///path, or "
            "sqlite/parquet/csv/json") from None
    engine = create_engine(dsn)
    try:
        first = True
        for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
            batch.to_sql(table, engine,
                         if_exists="replace" if first else "append", index=False)
            first = False
    finally:
        engine.dispose()


def _write_sqlite(ds, path: str, table: str) -> None:
    """Per-batch executemany writer (S9). Single local file → driver-side
    batches; on a cluster this becomes ds.write_sql with a pooled DSN."""
    import sqlite3

    _makedirs_for(path)
    con = sqlite3.connect(path)
    first = True
    try:
        for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
            batch.to_sql(table, con, if_exists="replace" if first else "append",
                         index=False)
            first = False
    finally:
        con.close()


def export_data(input_path: str, output_path: str,
                input_format: Optional[str] = None,
                output_format: Optional[str] = None,
                single_file: bool = False) -> None:
    """Streaming format converter (reference ``export-data`` CLI).
    ``single_file=True`` writes one reference-compatible json/csv file
    (the reference converter always produces a single file) instead of
    the default streaming part directory."""
    ds = load_dataset(input_path, input_format)
    save_dataset(ds, output_path, output_format, single_file=single_file)


# ---------------------------------------------------------------------------
# RSS 2.0 sink (S10 — content.py:1179-1248; driver-side over small results)
# ---------------------------------------------------------------------------


def generate_rss(articles, title: str, description: str, link: str,
                 now_utc: Optional[str] = None) -> str:
    """Articles (iterable of dicts) → RSS 2.0 XML. ``now_utc`` pins the
    build-date stamp for determinism (reference used utcnow)."""
    from datetime import datetime
    from xml.sax.saxutils import escape

    stamp = now_utc or "Thu, 01 Jan 1970 00:00:00 +0000"
    out = [
        '<?xml version="1.0" encoding="UTF-8" ?>',
        '<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom">',
        "<channel>",
        f"<title>{escape(title)}</title>",
        f"<description>{escape(description)}</description>",
        f"<link>{escape(link)}</link>",
        f'<atom:link href="{escape(link)}" rel="self" type="application/rss+xml" />',
        f"<lastBuildDate>{stamp}</lastBuildDate>",
    ]
    for a in articles:
        if not a.get("title") or not a.get("url"):
            continue
        pub = stamp
        if a.get("date"):
            try:
                pub = datetime.fromisoformat(a["date"]).strftime(
                    "%a, %d %b %Y %H:%M:%S +0000"
                )
            except ValueError:
                pass
        out.append("<item>")
        out.append(f"<title>{escape(a['title'])}</title>")
        out.append(f"<link>{escape(a['url'])}</link>")
        out.append(f"<guid>{escape(a['url'])}</guid>")
        if a.get("author"):
            out.append(f"<author>{escape(a['author'])}</author>")
        out.append(f"<pubDate>{pub}</pubDate>")
        if a.get("excerpt"):
            out.append(f"<description>{escape(a['excerpt'])}</description>")
        if a.get("content"):
            out.append(f"<content:encoded><![CDATA[{a['content']}]]></content:encoded>")
        for c in a.get("categories") or []:
            out.append(f"<category>{escape(c)}</category>")
        if a.get("image"):
            out.append(f'<enclosure url="{escape(a["image"])}" type="image/jpeg" />')
        out.append("</item>")
    out.append("</channel>")
    out.append("</rss>")
    return "\n".join(out)
