"""Excel workbook extraction (reference scripts/utils/extract_csv_from_excel.py).

Excel is a driver-side format (single small files feeding the lake),
so this mirrors the reference's pandas approach: one CSV per sheet,
filename-safe sheet names. Gated behind an import-try — the xlsx
engine (openpyxl) is not in the test image; the function raises a
clear error instead of failing at import time.
"""

from __future__ import annotations

import os

import pandas as pd


def excel_to_csv_all_sheets(excel_path: str, output_dir: str) -> list[str]:
    """Extract every sheet of ``excel_path`` to ``output_dir`` as CSV;
    returns the written paths."""
    try:
        xls = pd.ExcelFile(excel_path)
    except ImportError as e:  # pragma: no cover - engine not installed
        raise NotImplementedError(
            "xlsx engine (openpyxl) not available in this environment; "
            "install it or convert sheets to CSV upstream"
        ) from e
    os.makedirs(output_dir, exist_ok=True)
    written = []
    for sheet in xls.sheet_names:
        safe = "".join(c if c.isalnum() else "_" for c in sheet)
        out = os.path.join(output_dir, f"{safe}.csv")
        xls.parse(sheet).to_csv(out, index=False)
        written.append(out)
    return written
