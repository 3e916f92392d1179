"""CSV dialect sniffing (sources/csv.py sniff_csv_dialect) and its
hand-off to a distributed read."""

from __future__ import annotations

import gzip
import os

import pytest

from loan_etl_data_pipeline_spark.sources.csv import sniff_csv_dialect


def _write(tmp_path, name, text, gz=False):
    p = os.path.join(tmp_path, name)
    if gz:
        with gzip.open(p, "wt") as f:
            f.write(text)
    else:
        with open(p, "w") as f:
            f.write(text)
    return p


@pytest.mark.parametrize(
    "sep,name",
    [(",", "comma.csv"), (";", "semi.csv"), ("\t", "tab.csv"), ("|", "pipe.csv")],
)
def test_detects_delimiter(tmp_path, sep, name):
    text = sep.join(["id", "label", "amount"]) + "\n"
    text += sep.join(["1", "loan, special", "10.5"]) + "\n"
    text += sep.join(["2", "plain", "20"]) + "\n"
    # the embedded ", " in a field must not fool the comma candidate
    if sep != ",":
        d = sniff_csv_dialect(_write(str(tmp_path), name, text))
        assert d["sep"] == sep and d["n_fields"] == 3 and d["header"]


def test_prose_commas_lose_to_consistent_semicolon(tmp_path):
    # comma splits to DIFFERENT counts per line; semicolon is consistent
    text = "id;note;amt\n1;one, two, three;5\n2;four;6\n3;a, b;7\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "p.csv", text))
    assert d["sep"] == ";"


def test_headerless_numeric_first_row(tmp_path):
    text = "1,2.5,foo\n2,3.5,bar\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "h.csv", text))
    assert d["header"] is False


def test_all_string_file_with_genuine_header(tmp_path):
    """ADVICE r4: no numeric cell anywhere — the numeric heuristic is
    useless and must NOT default to header=False (which would ingest
    the header row as data). Distinctness fallback: unique first-row
    names that never recur in their own column => header."""
    text = "name,city,segment\nalice,paris,retail\nbob,lyon,corp\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "s.csv", text))
    assert d["header"] is True


def test_all_string_headerless_repeating_data(tmp_path):
    """All-string AND headerless: first row's values recur later in
    their own columns (categorical data), so the fallback says data."""
    text = "alice,paris,retail\nbob,lyon,corp\nalice,paris,corp\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "r.csv", text))
    assert d["header"] is False


def test_all_string_duplicate_first_row_values_not_header(tmp_path):
    """A first row with repeated values can't be a header (column names
    must be distinct)."""
    text = "x,x,y\naa,bb,cc\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "dup.csv", text))
    assert d["header"] is False


def test_single_quote_detection_and_gzip(tmp_path):
    text = "id;who\n1;'a;b'\n2;'c'\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "q.csv.gz", text, gz=True))
    assert d == {"sep": ";", "quote": "'", "header": True, "n_fields": 2}


def test_sniff_feeds_distributed_read(tmp_path, spark):
    text = "loan_id;loan_type;loan_amount\n1;auto;100.5\n2;home;200.25\n"
    p = _write(str(tmp_path), "loans.csv", text)
    d = sniff_csv_dialect(p)
    df = (
        spark.read.option("header", d["header"])
        .option("sep", d["sep"])
        .option("quote", d["quote"])
        .option("inferSchema", True)
        .csv(p)
    )
    assert df.columns == ["loan_id", "loan_type", "loan_amount"]
    assert df.count() == 2


def test_empty_file_defaults(tmp_path):
    d = sniff_csv_dialect(_write(str(tmp_path), "e.csv", ""))
    assert d == {"sep": ",", "quote": '"', "header": True, "n_fields": 0}


def test_run_etl_sniffs_semicolon_export(tmp_path, spark):
    """End-to-end: a semicolon locale export flows through the full
    reference pipeline when sniffing is on (and parses as ONE column
    when off — the failure mode the sniffer removes)."""
    import os

    from loan_etl_data_pipeline_spark.plans.etl import run_etl
    from loan_etl_data_pipeline_spark.sources.csv import read_csv

    text = (
        "loan_id;loan_amount;loan_type;timestamp\n"
        "1;1000.5;personal;2024-01-02 03:04:05\n"
        "2;2000.0;auto;01/15/2024 10:00:00\n"
    )
    p = _write(str(tmp_path), "loans_eu.csv", text)
    assert len(read_csv(spark, p).columns) == 1  # comma default mangles
    out = os.path.join(str(tmp_path), "out")
    insights = run_etl(spark, p, out, "timestamp", sniff_dialect=True)
    assert insights["total_loans"] == 2
    assert insights["avg_loan_amount"] == (1000.5 + 2000.0) / 2
    df = spark.read.parquet(out)
    assert {"loan_id", "loan_amount", "loan_type", "date", "time"} <= set(
        df.columns
    )
    assert {r["date"] for r in df.collect()} == {"2024-01-02", "2024-01-15"}


def test_single_quote_without_embedded_delimiter(tmp_path):
    # both quote chars are count-consistent here; the one that actually
    # WRAPS fields must win or every value keeps its literal quotes
    text = "id;who\n1;'alice'\n2;'bob'\n"
    d = sniff_csv_dialect(_write(str(tmp_path), "sq.csv", text))
    assert d["sep"] == ";" and d["quote"] == "'"


def test_sniff_resolves_globs_and_dirs(tmp_path, spark):
    import os

    from loan_etl_data_pipeline_spark.plans.etl import run_etl

    text = "loan_id;loan_amount;loan_type;timestamp\n1;10.5;auto;2024-01-02 03:04:05\n"
    _write(str(tmp_path), "part1.csv", text)
    # glob input
    out = os.path.join(str(tmp_path), "out_g")
    ins = run_etl(
        spark, os.path.join(str(tmp_path), "part*.csv"), out, "timestamp",
        sniff_dialect=True,
    )
    assert ins["total_loans"] == 1
    # unresolvable input fails loudly, not with FileNotFoundError inside open()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no readable file"):
        run_etl(
            spark, os.path.join(str(tmp_path), "nope*.csv"),
            os.path.join(str(tmp_path), "out_n"), "timestamp",
            sniff_dialect=True,
        )
