"""Excel landing conversion — reference operator S12.

The reference requires Excel inputs "to be pre-converted to CSV by the
Drive download step" (comment at reference:
airflow/dags/etl/pyspark_etl.py:50; openpyxl pinned but never imported).
We provide that landing-step conversion here. Preferred engine is
pandas + openpyxl when installed; otherwise a stdlib fallback parses the
xlsx container directly (it is a zip of XML — worksheet cells plus an
optional shared-strings table), covering the plain tabular files the
landing step actually sees. This is a small-file driver-side utility by
design — bulk data should never arrive as xlsx.
"""

from __future__ import annotations

import csv
import re
import xml.etree.ElementTree as ET
import zipfile

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'B7' -> 1, 'AA3' -> 26."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        el = cell.find(f"{_NS}is/{_NS}t")
        return el.text if el is not None else ""
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return ""
    if t == "s":
        return shared[int(v.text)]
    return v.text  # numbers/booleans kept as their literal text for CSV


def read_xlsx_rows(xlsx_path: str, *, sheet: int = 0) -> list[list]:
    """Stdlib xlsx reader: rows of one worksheet as lists of strings.

    Handles shared strings, inline strings, and numeric cells — the
    shapes a plain data export contains. Sparse rows are padded so every
    row is as wide as its right-most cell (CSV semantics).
    """
    with zipfile.ZipFile(xlsx_path) as z:
        shared: list[str] = []
        try:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        except KeyError:
            pass
        sheet_names = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if sheet >= len(sheet_names):
            raise ValueError(f"sheet {sheet} not found; file has {sheet_names}")
        ws = ET.fromstring(z.read(sheet_names[sheet]))

    rows: list[list] = []
    for row in ws.iter(f"{_NS}row"):
        out: list = []
        for cell in row.iter(f"{_NS}c"):
            ref = cell.get("r")
            ci = _col_index(ref) if ref else len(out)
            while len(out) <= ci:
                out.append("")
            out[ci] = _cell_value(cell, shared)
        rows.append(out)
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def excel_to_csv(xlsx_path: str, csv_path: str, *, sheet: int = 0) -> str:
    """Convert one sheet of an .xlsx file to CSV; returns ``csv_path``.

    Uses pandas+openpyxl when available (full format coverage: dates,
    formula results, multiple engines); falls back to the stdlib reader
    above for plain tabular files when the Excel stack is not installed.
    """
    try:
        import pandas as pd  # noqa: PLC0415

        pd.read_excel(xlsx_path, sheet_name=sheet).to_csv(csv_path, index=False)
        return csv_path
    except ImportError:
        pass
    rows = read_xlsx_rows(xlsx_path, sheet=sheet)
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return csv_path
