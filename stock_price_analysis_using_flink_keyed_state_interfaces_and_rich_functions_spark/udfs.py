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
            if text is None:
                return
            for i, tok in enumerate(text.split()):
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
