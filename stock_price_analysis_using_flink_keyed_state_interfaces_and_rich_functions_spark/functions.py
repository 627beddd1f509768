"""Scalar function surface — string / math / date / JSON helpers
(SURVEY.md §2.6 "Scalar fns"; generalizes the reference's substring-date
idiom, MaximumClosingPrice.java:37).

Everything here is a Catalyst expression (JVM-side, codegen'd) — no
Python UDFs. The JSON helpers serve the ``events.props`` column in the
synthetic testdata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "json_field",
    "json_struct",
    "with_date_parts",
    "date_diff_days",
    "month_floor",
    "normalize_ws",
    "slug",
    "extract_int",
    "safe_div",
]


def json_field(json_col: str | Column, path: str, cast: str | None = None) -> Column:
    """Extract one field from a JSON string column via JsonPath
    (``get_json_object`` — evaluated JVM-side, no full parse of the
    document into a struct)."""
    c = F.get_json_object(F.col(json_col) if isinstance(json_col, str) else json_col, path)
    return c.cast(cast) if cast else c


def json_struct(df: DataFrame, json_col: str, schema: str, out_col: str = "parsed") -> DataFrame:
    """Parse a JSON string column into a typed struct (``from_json``) —
    use when several fields are consumed; single-field access should use
    :func:`json_field` to keep the scan narrow."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), schema))


def with_date_parts(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """Add year/month/day integer columns from a date/timestamp column —
    the typed replacement for the reference's substring(0,4) parsing."""
    c = F.col(ts_col)
    return (
        df.withColumn(f"{prefix}yr", F.year(c))
        .withColumn(f"{prefix}mo", F.month(c))
        .withColumn(f"{prefix}day", F.dayofmonth(c))
    )


def date_diff_days(end: str | Column, start: str | Column) -> Column:
    return F.datediff(F.to_date(end) if isinstance(end, str) else end,
                      F.to_date(start) if isinstance(start, str) else start)


def month_floor(ts_col: str | Column) -> Column:
    """Truncate a timestamp to the first of its month (DATE)."""
    return F.trunc(F.col(ts_col) if isinstance(ts_col, str) else ts_col, "month")


def normalize_ws(text: str | Column) -> Column:
    """Trim + collapse runs of whitespace to single spaces."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def slug(text: str | Column) -> Column:
    """Lowercase, non-alnum → '-', squeeze repeats."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", "-"), r"(^-|-$)", "")


def extract_int(text: str | Column, pattern: str = r"(\d+)", group: int = 1) -> Column:
    """First integer matched by ``pattern`` (NULL if none)."""
    c = F.col(text) if isinstance(text, str) else text
    # try_cast: a >19-digit run overflows bigint — NULL (the documented
    # "no match" contract) beats an ANSI CAST_OVERFLOW killing the job
    return F.nullif(F.regexp_extract(c, pattern, group), F.lit("")).try_cast("long")


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division (ANSI-safe)."""
    return F.when(den != 0, num / den)
