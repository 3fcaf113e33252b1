"""Excel workbook extraction (reference scripts/utils/extract_csv_from_excel.py).

Excel is a driver-side format (single small files feeding the lake),
so this mirrors the reference's pandas approach: one CSV per sheet,
filename-safe sheet names.

Engine selection: pandas' ExcelFile (openpyxl) when the engine is
importable — full xlsx coverage — else a STDLIB fallback reader for
the OOXML subset business exports actually use (SpreadsheetML is a
ZIP of XML: ECMA-376). The fallback handles shared strings (with rich
-text runs), inline strings, numeric/boolean cells, sparse rows with
gap cells, and multiple sheets in workbook order; it does NOT handle
formulas' cached values beyond their <v> text, 1904-epoch dates, or
styled number formats (values come out as the raw stored text/number
— the validation layer downstream casts anyway, reference
scripts/glue/script.py cast-all-fields). The subset is documented and
tested against workbooks written by the minimal writer in
tests (same ECMA-376 structure Excel itself produces).
"""

from __future__ import annotations

import csv
import os
import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """A1-style column letters → 0-based index (A→0, Z→25, AA→26)."""
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _si_text(si: ET.Element) -> str:
    """A sharedStrings <si>: plain <t> or rich-text <r><t> runs."""
    t = si.find(f"{_NS}t")
    if t is not None:
        return t.text or ""
    return "".join((r.text or "") for r in si.iter(f"{_NS}t"))


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return _si_text(is_el) if is_el is not None else ""
    v = c.find(f"{_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return raw == "1"
    if t == "str" or t == "e":
        return raw
    # numeric: keep ints exact, floats as floats
    if raw == "":
        return ""
    try:
        f = float(raw)
    except ValueError:
        return raw
    return int(f) if f.is_integer() and "e" not in raw.lower() and "." not in raw else f


def read_xlsx_stdlib(path: str) -> dict[str, list[list]]:
    """Minimal ECMA-376 SpreadsheetML reader (stdlib only): returns
    {sheet_name: rows} in workbook order; each row is a list of cell
    values with gap cells filled as '' and rows padded to the sheet's
    max width. See the module docstring for the covered subset."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in root.iter(f"{_NS}si")]
        rel_target: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            for rel in rels.iter(f"{_NS_PKG_REL}Relationship"):
                tgt = rel.get("Target", "")
                if tgt.startswith("/"):
                    tgt = tgt.lstrip("/")
                else:
                    tgt = "xl/" + tgt
                rel_target[rel.get("Id", "")] = tgt
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        out: dict[str, list[list]] = {}
        for i, sheet in enumerate(wb.iter(f"{_NS}sheet"), start=1):
            name = sheet.get("name", f"Sheet{i}")
            rid = sheet.get(f"{_NS_REL}id")
            target = rel_target.get(rid or "", "")
            if not target or target not in names:
                target = f"xl/worksheets/sheet{i}.xml"  # positional fallback
            if target not in names:
                out[name] = []
                continue
            ws = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row in ws.iter(f"{_NS}row"):
                cells: list = []
                next_col = 0
                for c in row.iter(f"{_NS}c"):
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else next_col
                    while len(cells) < idx:
                        cells.append("")
                    cells.append(_cell_value(c, shared))
                    next_col = idx + 1
                rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [""] * (width - len(r)) for r in rows]
        return out


def _safe(sheet: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in sheet)


def excel_to_csv_all_sheets(excel_path: str, output_dir: str) -> list[str]:
    """Extract every sheet of ``excel_path`` to ``output_dir`` as CSV;
    returns the written paths (reference
    scripts/utils/extract_csv_from_excel.py:12-31 semantics: one CSV
    per sheet, filename-safe sheet names, first row = header).

    Uses pandas/openpyxl when the engine is importable; otherwise the
    stdlib OOXML-subset reader (read_xlsx_stdlib)."""
    os.makedirs(output_dir, exist_ok=True)
    try:
        import pandas as pd

        xls = pd.ExcelFile(excel_path)
        written = []
        for sheet in xls.sheet_names:
            out = os.path.join(output_dir, f"{_safe(sheet)}.csv")
            xls.parse(sheet).to_csv(out, index=False)
            written.append(out)
        return written
    except ImportError:
        pass  # no xlsx engine — stdlib fallback below
    written = []
    for sheet, rows in read_xlsx_stdlib(excel_path).items():
        out = os.path.join(output_dir, f"{_safe(sheet)}.csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            for r in rows:
                w.writerow(r)
        written.append(out)
    return written
