"""Sources/sinks + export converter + RSS formatter (SURVEY.md §2.1)."""

import os

import pyarrow.parquet as pq
import pytest

from web_scrapper_ray.sources.io import (
    export_data,
    generate_rss,
    infer_format,
    load_dataset,
    save_dataset,
)


@pytest.fixture()
def sample_parquet(tmp_path):
    import pyarrow as pa

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    return p


def test_infer_format():
    assert infer_format("x.csv") == "csv"
    assert infer_format("x.parquet") == "parquet"
    assert infer_format("x.lance") == "lance"
    with pytest.raises(ValueError):
        infer_format("x.weird")


def test_roundtrip_csv_json_parquet(ray_session, sample_parquet, tmp_path):
    ds = load_dataset(sample_parquet)
    csv_dir = str(tmp_path / "out_csv")
    save_dataset(ds, csv_dir, fmt="csv")
    back = load_dataset(csv_dir, fmt="csv").to_pandas().sort_values("a")
    assert back["b"].tolist() == ["x", "y", "z"]

    json_dir = str(tmp_path / "out_json")
    save_dataset(load_dataset(sample_parquet), json_dir, fmt="json")
    back = load_dataset(json_dir, fmt="json").to_pandas().sort_values("a")
    assert back["a"].tolist() == [1, 2, 3]


def test_export_data_converter(ray_session, sample_parquet, tmp_path):
    out = str(tmp_path / "conv_csv")
    export_data(sample_parquet, out, output_format="csv")
    assert load_dataset(out, fmt="csv").count() == 3


def test_sqlite_sink_and_source_roundtrip(ray_session, sample_parquet, tmp_path):
    db = str(tmp_path / "out.db")
    save_dataset(load_dataset(sample_parquet), db, fmt="sql", table="data")
    import sqlite3

    con = sqlite3.connect(db)
    rows = con.execute("SELECT a, b FROM data ORDER BY a").fetchall()
    con.close()
    assert rows == [(1, "x"), (2, "y"), (3, "z")]
    # S5: SQL source via ray.data.read_sql
    back = load_dataset(db, fmt="sql", table="data").to_pandas().sort_values("a")
    assert back["b"].tolist() == ["x", "y", "z"]


def test_sql_dsn_sink_sqlite_fallback(ray_session, sample_parquet, tmp_path):
    """S9 DSN path: a sqlite:/// DSN goes through _write_dsn (the
    SQLAlchemy code path, stdlib fallback when the lib is absent);
    server DSNs without SQLAlchemy raise the documented error."""
    import pytest

    from web_scrapper_ray.sources.io import sqlalchemy_available

    db = str(tmp_path / "dsn.db")
    save_dataset(load_dataset(sample_parquet), f"sqlite:///{db}",
                 fmt="sql", table="data")
    import sqlite3

    con = sqlite3.connect(db)
    rows = con.execute("SELECT a, b FROM data ORDER BY a").fetchall()
    con.close()
    assert rows == [(1, "x"), (2, "y"), (3, "z")]
    back = load_dataset(f"sqlite:///{db}", fmt="sql", table="data").to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2, 3]
    if not sqlalchemy_available():
        with pytest.raises(NotImplementedError, match="SQLAlchemy"):
            save_dataset(load_dataset(sample_parquet),
                         "postgresql://u:p@h/db", fmt="postgresql")


def test_generate_rss():
    arts = [
        {"title": "T1 & Co", "url": "http://h/a1", "date": "2023-05-01",
         "author": "Jane", "excerpt": "E1", "categories": ["x"],
         "image": "http://h/i.png", "content": "C1"},
        {"title": None, "url": "http://h/skip"},
    ]
    xml = generate_rss(arts, "Feed", "Desc", "http://h/feed")
    assert xml.count("<item>") == 1
    assert "T1 &amp; Co" in xml
    assert "<pubDate>Mon, 01 May 2023 00:00:00 +0000</pubDate>" in xml
    assert '<enclosure url="http://h/i.png"' in xml


def test_reference_interop_semantics(ray_session, sample_parquet, tmp_path):
    """Reference storage-handler parity invisible to the roundtrip
    tests: default SQL table name is 'scraped_data'
    (database_handler.py:67), a missing sqlite input raises without
    creating an empty db file (database_handler.py:146-150), and file
    sinks create their parent directories (database_handler.py:84)."""
    import os
    import sqlite3

    # default table name
    db = str(tmp_path / "defaults.db")
    save_dataset(load_dataset(sample_parquet), db, fmt="sql")
    con = sqlite3.connect(db)
    rows = con.execute("SELECT a FROM scraped_data ORDER BY a").fetchall()
    con.close()
    assert [r[0] for r in rows] == [1, 2, 3]
    assert load_dataset(db, fmt="sql").count() == 3

    # missing input: clear error, no empty-file side effect
    missing = str(tmp_path / "nope" / "absent.db")
    os.makedirs(os.path.dirname(missing))
    with pytest.raises(FileNotFoundError, match="not found"):
        load_dataset(missing, fmt="sql")
    assert not os.path.exists(missing)

    # sink into a directory that doesn't exist yet
    nested = str(tmp_path / "fresh" / "dir" / "out.db")
    save_dataset(load_dataset(sample_parquet), nested, fmt="sql")
    assert os.path.exists(nested)


def test_single_file_export(ray_session, sample_parquet, tmp_path):
    """single_file=True writes ONE reference-compatible file: an
    indented JSON array json.load can parse (reference json_handler
    round-trip), or one CSV — not a streaming part directory."""
    import json as jsonlib

    import pandas as pd

    jpath = str(tmp_path / "one.json")
    export_data(sample_parquet, jpath, output_format="json",
                single_file=True)
    assert os.path.isfile(jpath)
    data = jsonlib.load(open(jpath))
    assert sorted(r["a"] for r in data) == [1, 2, 3]

    cpath = str(tmp_path / "one.csv")
    export_data(sample_parquet, cpath, output_format="csv",
                single_file=True)
    assert os.path.isfile(cpath)
    back = pd.read_csv(cpath).sort_values("a")
    assert back["b"].tolist() == ["x", "y", "z"]


def test_sqlite_dsn_load_without_sqlalchemy(ray_session, sample_parquet, tmp_path):
    """sqlite:/// DSN loads take the stdlib path under ANY sql-ish fmt
    spelling, so a save/load round-trip works without SQLAlchemy."""
    db = str(tmp_path / "rt.db")
    save_dataset(load_dataset(sample_parquet), f"sqlite:///{db}",
                 fmt="postgresql")  # maps to sql_dsn → sqlite fallback
    back = load_dataset(f"sqlite:///{db}", fmt="postgresql").to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2, 3]


def test_single_file_rejects_unsupported_format(ray_session, sample_parquet, tmp_path):
    with pytest.raises(ValueError, match="single_file"):
        save_dataset(load_dataset(sample_parquet),
                     str(tmp_path / "x.parquet"), fmt="parquet",
                     single_file=True)
