"""Excel landing conversion (S12): xlsx → CSV → Spark, no openpyxl needed.

The fixture is a minimal hand-built xlsx container (a zip of worksheet
XML + shared strings — the same bytes any spreadsheet tool writes for a
plain table), so the stdlib fallback parser is tested for real in this
container where the pandas Excel stack is absent.
"""

from __future__ import annotations

import zipfile

import pytest

from loan_etl_data_pipeline_spark.sources.csv import read_csv
from loan_etl_data_pipeline_spark.sources.excel import excel_to_csv, read_xlsx_rows

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
  <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
  <Default Extension="xml" ContentType="application/xml"/>
  <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
  <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
  <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheets><sheet name="loans" sheetId="1" r:id="rId1"
    xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets>
</workbook>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
  <si><t>loan_id</t></si><si><t>loan_type</t></si><si><t>auto</t></si><si><t>personal</t></si>
</sst>"""

# row 2 uses a shared string + number; row 3 an inline string + a GAP in
# column B (sparse row) to exercise ref-based column placement
_SHEET = """<?xml version="1.0" encoding="UTF-8"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheetData>
    <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>amount</t></is></c></row>
    <row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c><c r="C2"><v>1500.5</v></c></row>
    <row r="3"><c r="A3"><v>2</v></c><c r="C3"><v>900</v></c></row>
    <row r="4"><c r="A4"><v>3</v></c><c r="B4" t="s"><v>3</v></c><c r="C4"><v>250.25</v></c></row>
  </sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx(tmp_path):
    p = tmp_path / "loans.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)
    return str(p)


def test_read_xlsx_rows(xlsx):
    rows = read_xlsx_rows(xlsx)
    assert rows[0] == ["loan_id", "loan_type", "amount"]
    assert rows[1] == ["1", "auto", "1500.5"]
    assert rows[2] == ["2", "", "900"]  # sparse row padded at the gap
    assert rows[3] == ["3", "personal", "250.25"]


def test_excel_to_csv_into_spark(spark, xlsx, tmp_path):
    csv_path = excel_to_csv(xlsx, str(tmp_path / "loans.csv"))
    df = read_csv(spark, csv_path)
    assert df.count() == 3
    got = {r["loan_id"]: r for r in df.collect()}
    assert got[1]["loan_type"] == "auto" and got[1]["amount"] == 1500.5
    assert got[2]["loan_type"] is None
    assert got[3]["amount"] == 250.25


def test_missing_sheet_raises(xlsx):
    with pytest.raises(ValueError, match="sheet 3 not found"):
        read_xlsx_rows(xlsx, sheet=3)
