"""Pure-stdlib XLSX codec (S4/S8 — reference excel_handler.py:24-226
surface: multi-sheet, freeze panes, autofilter) + io.py excel paths."""

import zipfile

from web_scrapper_ray.sources.xlsx import col_letter, read_xlsx, write_xlsx

ROWS = [
    {"name": "Widget & Co", "price": 9.99, "n": 3, "ok": True, "note": None},
    {"name": "<Gadget> \"X\"", "price": 12.5, "n": 0, "ok": False, "note": "à ünïcode"},
    {"name": "Plain", "price": 4.0, "n": 7, "ok": True, "note": "x<y&z>w"},
]


def test_col_letter():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == \
        ["A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]


def test_roundtrip_single_sheet(tmp_path):
    p = str(tmp_path / "one.xlsx")
    write_xlsx(p, {"Sheet1": ROWS})
    back = read_xlsx(p, sheet_name="Sheet1")
    assert len(back) == 3
    for orig, got in zip(ROWS, back):
        for k, v in orig.items():
            assert got[k] == v, (k, v, got[k])


def test_roundtrip_multi_sheet_freeze_autofilter(tmp_path):
    p = str(tmp_path / "multi.xlsx")
    sheets = {"products": ROWS[:2], "empty": [], "metrics": [{"m": 1.5}, {"m": -2}]}
    write_xlsx(p, sheets, freeze_panes=(1, 0), autofilter=True)
    back = read_xlsx(p)
    assert set(back) == {"products", "empty", "metrics"}
    assert back["empty"] == []
    assert back["metrics"] == [{"m": 1.5}, {"m": -2}]
    assert back["products"][0]["name"] == "Widget & Co"
    # structural assertions: valid zip, frozen pane + autofilter present
    with zipfile.ZipFile(p) as z:
        ws = z.read("xl/worksheets/sheet1.xml").decode()
        assert 'state="frozen"' in ws and 'ySplit="1"' in ws
        assert "<autoFilter" in ws


def test_nan_inf_cells_roundtrip(tmp_path):
    p = str(tmp_path / "nonfinite.xlsx")
    rows = [{"v": float("nan"), "w": 1.5},
            {"v": float("inf"), "w": float("-inf")},
            {"v": 2.0, "w": "inf"}]
    write_xlsx(p, {"Sheet1": rows})
    back = read_xlsx(p, sheet_name="Sheet1")
    # NaN writes as an EMPTY cell (pandas/openpyxl convention) → None
    assert back[0]["v"] is None and back[0]["w"] == 1.5
    # ±inf follows pandas' inf_rep convention: written as the string
    # form, NOT coerced back on read (so string cells are never mangled)
    assert back[1]["v"] == "inf" and back[1]["w"] == "-inf"
    assert back[2]["v"] == 2.0 and back[2]["w"] == "inf"


def test_io_excel_roundtrip_via_dataset(ray_session, tmp_path):
    import ray.data as rd

    from web_scrapper_ray.sources.io import load_dataset, save_dataset

    p = str(tmp_path / "ds.xlsx")
    ds = rd.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y&z"}])
    save_dataset(ds, p, "excel")
    back = load_dataset(p, "excel").to_pandas().sort_values("a")
    assert list(back["a"]) == [1, 2]
    assert list(back["b"]) == ["x", "y&z"]


def test_export_data_csv_to_excel(ray_session, tmp_path):
    import ray.data as rd

    from web_scrapper_ray.sources.io import export_data, load_dataset, save_dataset

    csv = str(tmp_path / "in.csv")
    rd.from_items([{"k": i, "v": f"s{i}"} for i in range(5)]).write_csv(csv)
    out = str(tmp_path / "out.xlsx")
    export_data(csv, out, "csv", "excel")
    back = load_dataset(out, "excel").to_pandas().sort_values("k")
    assert list(back["k"]) == list(range(5))


def test_xlsx_roundtrip_property(tmp_path):
    """Property: any table of str/int/float/bool/None cells survives a
    write→read roundtrip (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-10**12, max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=40),
    )
    colname = st.text(
        alphabet=st.characters(whitelist_categories=("L", "N")),
        min_size=1, max_size=8)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(colname, min_size=1, max_size=5, unique=True),
           st.integers(min_value=0, max_value=6), st.data())
    def run(cols, n_rows, data):
        rows = [
            {c: data.draw(cell) for c in cols}
            for _ in range(n_rows)
        ]
        p = str(tmp_path / "prop.xlsx")
        write_xlsx(p, {"S": rows})
        back = read_xlsx(p, sheet_name="S")
        assert len(back) == n_rows
        for orig, got in zip(rows, back):
            for c in cols:
                o, g = orig[c], got[str(c)]
                if isinstance(o, float):
                    assert g == float(repr(o)), (o, g)
                else:
                    assert g == o, (o, g)

    run()


def test_header_gap_and_quoted_sheet_name(tmp_path):
    """Review regressions: a blank header cell must not shift later
    columns; sheet names containing quotes must produce valid XML."""
    import zipfile as zf
    from xml.etree import ElementTree as ET

    p = str(tmp_path / "gap.xlsx")
    write_xlsx(p, {'Q3 "final"': [{"a": 1, "c": 3}, {"a": None, "c": 30}]})
    # simulate a foreign workbook with a header gap: header in A and C
    with zf.ZipFile(p) as z:
        ws = z.read("xl/worksheets/sheet1.xml").decode()
    ws_gap = ws.replace('<c r="B1"', '<c r="C1"').replace(
        '<c r="B2"', '<c r="C2"').replace('<c r="B3"', '<c r="C3"')
    import shutil
    p2 = str(tmp_path / "gap2.xlsx")
    shutil.copy(p, p2)
    # rewrite the worksheet with the gapped refs
    with zf.ZipFile(p, "r") as zin, zf.ZipFile(p2, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/worksheets/sheet1.xml":
                data = ws_gap.encode()
            zout.writestr(item, data)
    back = read_xlsx(p2)
    assert list(back) == ['Q3 "final"']  # quoted name round-trips
    rows = back['Q3 "final"']
    assert rows[0] == {"a": 1, "c": 3}      # c stays under header c
    assert rows[1] == {"a": None, "c": 30}
    # the workbook XML itself is well-formed despite the quote
    with zf.ZipFile(p2) as z:
        ET.fromstring(z.read("xl/workbook.xml"))


def test_escape_overlap_numpy_and_dup_headers(tmp_path):
    """ECMA-376 escape round-trips overlapping escape-shaped literals;
    numpy scalars write as numeric cells; duplicate headers get
    pandas-style suffixes instead of silently dropping a column."""
    import numpy as np

    p = str(tmp_path / "edge.xlsx")
    hostile = ["_x005F_x0041_", "_x0041_", "__x0041_", "a_x1234_b_x1234_",
               # escape-shaped only AFTER an adjacent illegal char is
               # substituted: the self-escape must fire via lookahead
               "_x0041\x00", "_x005F\x00", "\x00x0041_", "_x0041\x00_x0042_"]
    write_xlsx(p, {"S": [{"v": h} for h in hostile]})
    assert [r["v"] for r in read_xlsx(p, sheet_name="S")] == hostile

    write_xlsx(p, {"S": [{"n": np.int64(5), "f": np.float64(2.5)}]})
    row = read_xlsx(p, sheet_name="S")[0]
    assert row["n"] == 5 and isinstance(row["n"], int)
    assert row["f"] == 2.5 and isinstance(row["f"], float)

    # duplicate headers: dict rows can't express them, so patch a
    # written workbook's header row to repeat the same name
    import zipfile

    src = str(tmp_path / "dup_src.xlsx")
    write_xlsx(src, {"S": [{"x": 1, "y": 2}]})
    dst = str(tmp_path / "dup.xlsx")
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dst, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "xl/worksheets/sheet1.xml":
                data = data.replace(b">y<", b">x<")
            zout.writestr(item, data)
    row = read_xlsx(dst, sheet_name="S")[0]
    assert row == {"x": 1, "x.1": 2}
