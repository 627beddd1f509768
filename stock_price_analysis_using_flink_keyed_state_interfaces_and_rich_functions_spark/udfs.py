"""UDF surface — registration helpers for Python UDFs, Arrow-vectorized
pandas UDFs, and table functions (UDTF) (SURVEY.md §2.6 "UDF surface").

The engine's position (stated everywhere, enforced here by API shape):
built-in expressions first; a pandas UDF (Arrow batches, ~10-100× faster
than row-at-a-time) when Python is genuinely required; a plain Python
UDF only for non-vectorizable logic on small data. All helpers both
RETURN the callable (DataFrame-API use) and optionally REGISTER it for
``spark.sql`` use under ``name``.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = [
    "register_python_udf",
    "register_pandas_udf",
    "register_tokens_udtf",
    "register_grouped_agg_udf",
    "grouped_zscore",
    "pandas_scalar",
]


def register_python_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Row-at-a-time Python UDF — the documented slow path (one
    serialize/deserialize round-trip per row). Prefer
    :func:`register_pandas_udf` whenever the logic vectorizes."""
    udf = F.udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def pandas_scalar(return_type: str):
    """Decorator: scalar pandas UDF with Arrow transfer — batches arrive
    as ``pd.Series``; the function must be length-preserving."""
    def wrap(fn: Callable[..., pd.Series]):
        return F.pandas_udf(fn, return_type)

    return wrap


def register_pandas_udf(spark: SparkSession, name: str, fn: Callable, return_type: str):
    """Register an Arrow-vectorized scalar pandas UDF for SQL use."""
    udf = F.pandas_udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def register_tokens_udtf(spark: SparkSession, name: str = "split_tokens"):
    """Example UDTF (table function, Spark 3.5+): one input string →
    one row per whitespace token with its position. Usable from SQL as
    ``SELECT t.* FROM src, LATERAL split_tokens(src.text) t``.

    UDTFs evaluate row-at-a-time in Python — for plain tokenization the
    expression form (``posexplode(split(...))``) is strictly faster;
    this exists to expose the extension point for logic that genuinely
    needs imperative row→rows expansion.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            import re

            if text is None:
                return
            # ASCII whitespace, matching Java-regex \s (the posexplode/
            # split expression form this UDTF demonstrates against)
            toks = [x for x in re.split("[ \t\n\x0b\f\r]+", text) if x]
            for i, tok in enumerate(toks):
                yield i, tok

    spark.udtf.register(name, SplitTokens)
    return SplitTokens


def register_grouped_agg_udf(spark: SparkSession, name: str, fn: Callable, return_type: str):
    """Register a GROUPED_AGG pandas UDF — a vectorized user-defined
    aggregate usable in ``groupBy().agg()`` and as a SQL aggregate.
    ``fn`` receives whole-group ``pd.Series`` columns and returns one
    scalar; Spark handles the group shuffling, so the UDAF distributes
    like any built-in aggregate (one exchange on the grouping key).
    """
    from pyspark.sql.functions import PandasUDFType

    udf = F.pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
    spark.udf.register(name, udf)
    return udf


def grouped_zscore(
    df,
    key_cols,
    value_col: str,
    out_col: str = "zscore",
    scale: int = 100,
):
    """GROUPED_MAP surface (``applyInPandas``): per-group z-scores with
    whole-group pandas semantics — each group arrives as ONE DataFrame,
    the shape window functions can't give Python (quantile fits, model
    scoring, per-group regressions all ride this exact plumbing).

    Mean/std are derived from EXACT integer sums of ``round(v·scale)``
    (population std), so the emitted doubles are bit-identical to a SQL
    engine computing the same closed form — keeping even the UDF path
    oracle-checkable. Distributes as one exchange on the key; group =
    unit of memory (a group must fit in one executor's pandas frame —
    for billion-row keys use the window-function form instead).

    Precondition: ``value_col`` must be non-NULL and finite. A NULL
    arrives in pandas as NaN, and ``rint(NaN).astype(int64)`` is
    undefined behavior that would silently poison the whole group's
    mean/std — so non-finite inputs raise instead (filter NULLs out
    upstream, or use the window-function z-score which propagates them).
    """
    keys = list(key_cols)
    out_schema = ", ".join(
        [f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys]
        + [f"`{value_col}` double", f"`{out_col}` double"]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        vals = pdf[value_col].to_numpy(dtype="float64")
        if not np.isfinite(vals).all():
            raise ValueError(
                f"grouped_zscore: {value_col} contains NULL/NaN/inf values; "
                "the int64 cast would be undefined — filter them out first"
            )
        cents = np.rint(vals * scale).astype("int64")
        n = len(cents)
        sx = int(cents.sum())
        sxx = int((cents.astype(object) ** 2).sum())  # object: unbounded ints, no int64 overflow
        # float() BEFORE dividing — the same rounding path as a SQL
        # engine's CAST(sum AS DOUBLE)/n, so z-scores stay bit-identical
        # (sxx exceeds 2^53; exact-rational-then-round would differ in
        # the last ulp from round-then-divide).
        mean = float(sx) / n
        var = max(float(sxx) / n - mean * mean, 0.0)
        std = math.sqrt(var)
        out = pdf[keys].copy()
        out[value_col] = pdf[value_col].astype("float64")
        out[out_col] = (cents - mean) / std if std > 0 else 0.0
        return out

    return df.select(*keys, value_col).groupBy(*keys).applyInPandas(_z, schema=out_schema)
