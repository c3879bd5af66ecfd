"""Minimal pure-stdlib XLSX codec (reference S4/S8:
`/root/reference/src/webscraper/storage/excel_handler.py:24-226`).

openpyxl/xlsxwriter are not installable in this container, but XLSX is
just a zip of OOXML parts — this module writes and reads the subset the
reference's Excel handler surface uses: multiple named sheets, header
row, string/number/bool/null cells, ``freeze_panes`` and ``autofilter``.
Strings are written inline (no sharedStrings table needed on write);
the reader handles both inline and shared strings so files from real
Excel/openpyxl also load.

Driver-side by design: the reference treats Excel as a small-output
interchange format (SURVEY.md §2.1 keeps S4/S8 driver-side); big data
goes to parquet/csv.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any, Optional
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def col_letter(i: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


# XML-1.0-illegal chars, plus \r (parsers normalize literal CR to LF)
_BAD_CHAR_RX = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\r]")
_UNESCAPE_RX = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _esc_text(s: str) -> str:
    """OOXML string escaping (ECMA-376 §18.4): chars XML can't carry are
    written ``_xHHHH_``; pre-existing ``_xHHHH_`` literals self-escape
    their underscore as ``_x005F_``. The self-escape uses a LOOKAHEAD so
    overlapping escape-shaped literals (e.g. ``_x005F_x0041_``, where
    two sequences share an underscore) all round-trip. The lookahead
    also accepts a BAD char where the closing underscore would be: a
    literal ``_xHHHH`` followed by an illegal char becomes escape-shaped
    only after that char's own ``_xHHHH_`` substitution supplies the
    trailing underscore, so it must self-escape up front too."""
    s = re.sub(r"_(?=x[0-9A-Fa-f]{4}(?:_|[\x00-\x08\x0B\x0C\x0E-\x1F\r]))",
               "_x005F_", s)
    s = _BAD_CHAR_RX.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)
    return escape(s)


def _unesc_text(s: str) -> str:
    return _UNESCAPE_RX.sub(lambda m: chr(int(m.group(1), 16)), s)


def _cell_xml(ref: str, value: Any) -> str:
    import numbers

    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    # numbers.Number covers numpy/arrow scalars too — isinstance(int,
    # float) alone would silently write np.int64 as a TEXT cell
    if isinstance(value, numbers.Integral):
        return f'<c r="{ref}"><v>{int(value)!r}</v></c>'
    if isinstance(value, numbers.Real):
        value = float(value)
        if value != value:
            return ""  # NaN → empty cell (pandas/openpyxl convention)
        if value in (float("inf"), float("-inf")):
            # XLSX numeric cells can't hold ±inf; pandas' to_excel writes
            # it as the string 'inf' (the inf_rep option) and read_excel
            # does NOT convert back — same one-way convention here, so
            # legitimate string cells are never coerced on read
            return f'<c r="{ref}" t="inlineStr"><is><t>{value!r}</t></is></c>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc_text(str(value))}</t></is></c>'


def _sheet_xml(rows: list[dict], columns: list[str],
               freeze_panes: Optional[tuple] = None,
               autofilter: bool = False) -> str:
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             f'<worksheet xmlns="{_NS}">']
    if freeze_panes:
        fr, fc = freeze_panes
        top_left = f"{col_letter(fc)}{fr + 1}"
        pane_attrs = []
        if fc:
            pane_attrs.append(f'xSplit="{fc}"')
        if fr:
            pane_attrs.append(f'ySplit="{fr}"')
        parts.append(
            "<sheetViews><sheetView workbookViewId=\"0\">"
            f"<pane {' '.join(pane_attrs)} topLeftCell=\"{top_left}\" "
            'activePane="bottomRight" state="frozen"/></sheetView></sheetViews>'
        )
    parts.append("<sheetData>")
    header = "".join(
        _cell_xml(f"{col_letter(ci)}1", name) for ci, name in enumerate(columns)
    )
    parts.append(f'<row r="1">{header}</row>')
    for ri, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{col_letter(ci)}{ri}", row.get(name))
            for ci, name in enumerate(columns)
        )
        parts.append(f'<row r="{ri}">{cells}</row>')
    parts.append("</sheetData>")
    if autofilter and columns:
        last = f"{col_letter(len(columns) - 1)}{len(rows) + 1}"
        parts.append(f'<autoFilter ref="A1:{last}"/>')
    parts.append("</worksheet>")
    return "".join(parts)


def write_xlsx(path: str, sheets: dict[str, list[dict]],
               freeze_panes: Optional[tuple] = None,
               autofilter: bool = False) -> str:
    """``sheets``: {sheet_name: list-of-dicts}. Column order = first-seen
    key order across the sheet's rows (the reference's DataFrame
    construction order). ``freeze_panes``/(row, col) and ``autofilter``
    apply to every sheet, like the reference's per-option loop."""
    names = list(sheets)
    sheet_entries = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            f'relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(names):
            rows = sheets[name]
            columns: list[str] = []
            for r in rows:
                for k in r:
                    if k not in columns:
                        columns.append(k)
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(rows, columns, freeze_panes, autofilter),
            )
    return path


_CELL_REF_RX = re.compile(r"([A-Z]+)(\d+)")


def _ref_to_col(ref: str) -> int:
    m = _CELL_REF_RX.match(ref)
    out = 0
    for ch in m.group(1):
        out = out * 26 + (ord(ch) - ord("A") + 1)
    return out - 1


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        tnode = c.find(f"{{{_NS}}}is/{{{_NS}}}t")
        return _unesc_text(tnode.text or "") if tnode is not None else ""
    v = c.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    txt = v.text
    if re.fullmatch(r"-?\d+", txt):
        return int(txt)
    return float(txt)


def read_xlsx(path: str, sheet_name: Optional[str] = None
              ) -> dict[str, list[dict]] | list[dict]:
    """Read sheets → {name: list-of-dicts} (or one sheet's rows when
    ``sheet_name`` is given). First row = header (reference `load`
    semantics: pd.read_excel default)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            r.get("Id"): r.get("Target") for r in rels
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall(f"{{{_NS}}}si"):
                shared.append(_unesc_text(
                    "".join(t.text or "" for t in si.iter(f"{{{_NS}}}t"))))
        out: dict[str, list[dict]] = {}
        for sheet in wb.find(f"{{{_NS}}}sheets"):
            name = sheet.get("name")
            target = rel_map[sheet.get(f"{{{_NS_REL}}}id")]
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            ws = ET.fromstring(z.read(target))
            grid: dict[int, dict[int, Any]] = {}
            for row in ws.iter(f"{{{_NS}}}row"):
                ri = int(row.get("r"))
                grid.setdefault(ri, {})  # keep all-empty rows
                for c in row.findall(f"{{{_NS}}}c"):
                    grid[ri][_ref_to_col(c.get("r"))] = _cell_value(c, shared)
            if not grid:
                out[name] = []
                continue
            # map headers by their ACTUAL column index (a blank header
            # cell must not shift later columns under the wrong key);
            # duplicate names get pandas-style suffixes (x, x.1, …) so
            # no column's data silently vanishes in the row dicts
            header_row = grid.get(min(grid))
            col_map = {}
            seen_names: dict[str, int] = {}
            for ci in sorted(header_row):
                name_ = str(header_row[ci])
                n_seen = seen_names.get(name_, 0)
                seen_names[name_] = n_seen + 1
                col_map[ci] = name_ if n_seen == 0 else f"{name_}.{n_seen}"
            rows = []
            for ri in sorted(grid):
                if ri == min(grid):
                    continue
                cells = grid[ri]
                rows.append({col: cells.get(ci) for ci, col in col_map.items()})
            out[name] = rows
    if sheet_name is not None:
        return out[sheet_name]
    return out
