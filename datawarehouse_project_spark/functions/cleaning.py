"""Row-level cleaning expression library (SURVEY.md §2.2 P7-P12).

Everything is a native Column expression — no Python UDFs — so the whole
cleaning pass stays inside Catalyst/whole-stage codegen and scales linearly
with executors. Each function cites the reference behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's four accepted date formats, tried strictly in this order;
#: first hit wins (reference MeshJoin.java:158, 173-186). Java's
#: setLenient(false) maps to Spark's CORRECTED parser + try_to_date.
DATE_FORMATS = ["yyyy-M-d", "M/d/yyyy", "d-M-yyyy", "yyyy/M/d"]


def multi_format_date(col: Column | str, formats: list[str] | None = None) -> Column:
    """P12: strict multi-format date parse, first success wins, else NULL.

    The reference feeds minute-resolution strings ("2019-04-01 03:09:00")
    whose date prefix is consumed and the rest dropped (SimpleDateFormat
    prefix-parse, MeshJoin.java:177) — mirrored by trimming to the first
    space before parsing.
    """
    c = F.split(F.trim(F.col(col) if isinstance(col, str) else col), " ").getItem(0)
    parsed = [F.try_to_date(c, f) for f in formats or DATE_FORMATS]
    return F.coalesce(*parsed)


def clean_price(col: Column | str) -> Column:
    """P10+P11: strip non-numeric chars ("1299.99$" -> 1299.99), parse as
    DECIMAL(10,2); unparsable -> 0.00 (kept, not dropped) per reference
    MeshJoin.java:119-132. Negative handling (P9: row dropped) is the
    caller's filter — the asymmetry is deliberate reference behavior.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[^0-9.\\-]", "")
    return F.coalesce(
        stripped.try_cast("decimal(10,2)"), F.lit("0.00").cast("decimal(10,2)")
    )


def non_empty(col: Column | str) -> Column:
    """P8: required-string guard (MeshJoin.java:114-117)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.trim(c) != "")


def clean_int(col: Column | str) -> Column:
    """F10: strict int parse; unparsable -> NULL (caller drops, P9/
    MeshJoin.java:190-196)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c).try_cast("int")
