"""Date/time functions (F2), including the reference's non-ISO format.

The reference serializes transaction timestamps as
``strftime('%Y-%m-%d-%H:%M:%S')`` — a DASH between date and time
(``transactions_mock_data.py:74``) — and stamps ids with ``%Y%m%d%H%M%S``
(``transactions_mock_data.py:69``). Both are plain Column expressions here
so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# transactions_mock_data.py:74 — note the non-ISO dash separator.
REFERENCE_TS_FORMAT = "yyyy-MM-dd-HH:mm:ss"
# transactions_mock_data.py:69 — compact stamp embedded in transaction ids.
REFERENCE_ID_STAMP_FORMAT = "yyyyMMddHHmmss"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_reference_ts(col: str | Column) -> Column:
    """Parse the reference's 'yyyy-MM-dd-HH:mm:ss' string to a timestamp."""
    return F.to_timestamp(_c(col), REFERENCE_TS_FORMAT)


def format_reference_ts(col: str | Column) -> Column:
    """Render a timestamp in the reference's landing format."""
    return F.date_format(_c(col), REFERENCE_TS_FORMAT)


def id_stamp(col: str | Column) -> Column:
    """The compact 'yyyyMMddHHmmss' stamp used inside transaction ids."""
    return F.date_format(_c(col), REFERENCE_ID_STAMP_FORMAT)
