"""Canonical schemas.

The reference has no schema system: rows are raw strings, fields are
positional ``split(",")`` indices, the header is dropped by a content
filter (MaximumClosingPrice.java:29-39 and the three clones). We replace
that fixed implicit schema with named, typed StructTypes; Catalyst then
gets column pruning and predicate pushdown for free.

``QUOTES_SCHEMA`` mirrors the 15-column HDFC.csv header
(reference: src/main/resources/HDFC.csv:1). Trailing columns are nullable
because early rows leave them empty (HDFC.csv:2-4) — the CSV reader must
tolerate ragged trailing nulls, which Spark's csv source does natively.

The synthetic-table schemas match /root/testdata parquet footers
(FIXTURES.md §3); we declare them explicitly so streaming reads
(which require a schema up front) and JSON/CSV round-trips don't depend
on inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "QUOTES_SCHEMA",
    "EVENTS_SCHEMA",
    "DOCUMENTS_SCHEMA",
    "EMBEDDINGS_SCHEMA",
    "LINEITEM_SCHEMA",
    "ORDERS_SCHEMA",
    "CUSTOMER_SCHEMA",
    "SUPPLIER_SCHEMA",
    "PART_SCHEMA",
    "NATION_SCHEMA",
    "REGION_SCHEMA",
    "TABLE_SCHEMAS",
]

QUOTES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("series", T.StringType(), True),
        T.StructField("prev_close", T.DoubleType(), True),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("last", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("vwap", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("turnover", T.DoubleType(), True),
        T.StructField("trades", T.DoubleType(), True),
        T.StructField("deliverable_volume", T.DoubleType(), True),
        T.StructField("pct_deliverable", T.DoubleType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "events": EVENTS_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
    "lineitem": LINEITEM_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "supplier": SUPPLIER_SCHEMA,
    "part": PART_SCHEMA,
    "nation": NATION_SCHEMA,
    "region": REGION_SCHEMA,
}
