"""Excel landing conversion — reference operator S12.

The reference requires Excel inputs "to be pre-converted to CSV by the
Drive download step" (comment at reference:
airflow/dags/etl/pyspark_etl.py:50; openpyxl pinned but never imported).
We provide that landing-step conversion here, gated behind an import-try
since the engine itself stays CSV/Parquet-native. This is a small-file
driver-side utility by design — bulk data should never arrive as xlsx.
"""

from __future__ import annotations


def excel_to_csv(xlsx_path: str, csv_path: str, *, sheet: int | str = 0) -> str:
    """Convert one sheet of an .xlsx file to CSV; returns ``csv_path``."""
    try:
        import pandas as pd  # noqa: PLC0415

        df = pd.read_excel(xlsx_path, sheet_name=sheet)
    except ImportError as exc:  # pragma: no cover - env without pandas/openpyxl
        raise NotImplementedError(
            "excel_to_csv needs pandas + an Excel engine (openpyxl); "
            "not available in this environment"
        ) from exc
    df.to_csv(csv_path, index=False)
    return csv_path
