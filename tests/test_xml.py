"""XML ingestion (sources/xml.py): rowTag file reads with explicit and
inferred schemas, column-level from_xml parsing, and the corrupt-payload
quarantine contract."""

from __future__ import annotations

import os

from loan_etl_data_pipeline_spark.sources.xml import read_xml, xml_records


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_read_xml_rowtag(spark, tmp_path):
    p = _write(
        tmp_path,
        "loans.xml",
        "<loans>"
        "<loan><id>1</id><amount>100.5</amount><type>auto</type></loan>"
        "<loan><id>2</id><amount>250.0</amount><type>personal</type></loan>"
        "</loans>",
    )
    df = read_xml(spark, p, row_tag="loan")
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["amount"] == 100.5
    assert rows[1]["type"] == "personal"


def test_read_xml_explicit_schema_skips_inference(spark, tmp_path):
    p = _write(
        tmp_path,
        "one.xml",
        "<rs><r><id>9</id><v>3</v></r></rs>",
    )
    df = read_xml(spark, p, row_tag="r", schema="id BIGINT, v STRING")
    assert dict(df.dtypes) == {"id": "bigint", "v": "string"}
    assert df.collect()[0]["v"] == "3"  # typed by schema, not inference


def test_xml_records_parse_and_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, "<p><k>7</k><name>ok</name></p>"),
            (2, "definitely not xml <<<"),
            (3, None),
        ],
        "rid int, payload string",
    )
    out = {
        r["rid"]: r
        for r in xml_records(
            df, "payload", "k INT, name STRING", keep_cols=("rid",)
        ).collect()
    }
    assert out[1]["k"] == 7 and out[1]["name"] == "ok"
    assert not out[1]["xml_corrupt"]
    assert out[2]["k"] is None and out[2]["xml_corrupt"]
    # a NULL payload is absent data, not a corrupt record
    assert not out[3]["xml_corrupt"]
