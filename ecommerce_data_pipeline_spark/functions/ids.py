"""Id-generator expressions (F1) mirroring the reference's formats.

- ``prod-`` + 6 digits / ``S`` + 4 digits: ``dimension_tables_mock.py:49-55``
- ``cust-`` + 6 digits: ``dimension_tables_mock.py:85-86``
- ``TXN`` + yyyyMMddHHmmss + 4-digit sequence: ``transactions_mock_data.py:69``

All are Column expressions (concat/lpad/date_format): they run JVM-side in
whole-stage codegen, unlike the reference's per-row Python f-strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions.datetime import id_stamp


def _digits(col: str | Column, width: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c.cast("string"), width, "0")


def product_id(seq: str | Column) -> Column:
    """'prod-' + zero-padded 6 digits (dimension_tables_mock.py:49-51)."""
    return F.concat(F.lit("prod-"), _digits(seq, 6))


def customer_id(seq: str | Column) -> Column:
    """'cust-' + zero-padded 6 digits (dimension_tables_mock.py:85-86)."""
    return F.concat(F.lit("cust-"), _digits(seq, 6))


def supplier_id(seq: str | Column) -> Column:
    """'S' + zero-padded 4 digits (dimension_tables_mock.py:55)."""
    return F.concat(F.lit("S"), _digits(seq, 4))


def transaction_id(ts: str | Column, seq: str | Column) -> Column:
    """'TXN' + yyyyMMddHHmmss + 4-digit sequence (transactions_mock_data.py:69)."""
    return F.concat(F.lit("TXN"), id_stamp(ts), _digits(seq, 4))
