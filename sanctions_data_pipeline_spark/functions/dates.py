"""Date handling (reference main.py:620-636: ISO yyyy-mm-dd -> dd-mm-yyyy)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def reformat_dob(col: Column) -> Column:
    """yyyy-MM-dd (string or date/timestamp) -> dd-MM-yyyy."""
    return F.date_format(col.cast("timestamp"), "dd-MM-yyyy")


def sql_reformat_dob(expr: str) -> str:
    return f"strftime(CAST({expr} AS TIMESTAMP), '%d-%m-%Y')"
