"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — the
modern extension point the reference's hand-rolled ``SourceFunction``
maps to: implement ``reader``/``partitions`` in pure Python, register
once, then ``spark.read.format("synthetic_quotes")`` like any built-in.

The example source generates deterministic synthetic OHLCV quote rows
(seeded per partition — same data for any reader parallelism), which is
the dev/load-test stand-in for a market-data feed. Partition planning
is real: ``partitions()`` splits the row range so a cluster reads in
parallel, and each partition regenerates only its slice.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = [
    "SyntheticQuotesDataSource",
    "register_synthetic_quotes_source",
    "SyntheticQuotesStreamDataSource",
    "register_synthetic_quotes_stream_source",
]

_SCHEMA = "symbol string, day int, open double, high double, low double, close double, volume bigint"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _QuotesReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.n_symbols = int(options.get("symbols", "5"))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition):
        # deterministic per row id — identical output for ANY reader
        # parallelism, which is what makes the source test-stable
        for i in range(partition.start, partition.end):
            sym = f"SYM{i % self.n_symbols}"
            day = i // self.n_symbols
            base = float(50 + (i * 7919) % 1000) / 10.0
            spread = float((i * 104729) % 50) / 100.0
            o = round(base, 2)
            h = round(base + spread, 2)
            lo = round(base - spread / 2, 2)
            c = round(base + spread / 4, 2)
            vol = 1000 + (i * 31) % 5000
            yield (sym, day, o, h, lo, c, vol)


class SyntheticQuotesDataSource(DataSource):
    """``format("synthetic_quotes")`` — options: rows, partitions,
    symbols."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_quotes"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _QuotesReader(self.options)


def register_synthetic_quotes_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticQuotesDataSource)


def _gen_quote_row(i: int, n_symbols: int):
    """Deterministic quote row for global row id ``i`` — shared by the
    batch reader and the streaming reader so a stream that has drained
    N rows equals the batch read of N rows, column for column."""
    sym = f"SYM{i % n_symbols}"
    day = i // n_symbols
    base = float(50 + (i * 7919) % 1000) / 10.0
    spread = float((i * 104729) % 50) / 100.0
    return (
        sym,
        day,
        round(base, 2),
        round(base + spread, 2),
        round(base - spread / 2, 2),
        round(base + spread / 4, 2),
        1000 + (i * 31) % 5000,
    )


class _QuotesStreamReader:
    """``SimpleDataSourceStreamReader`` for the synthetic feed: the
    offset is just the global row counter (``{"row": N}``), each
    micro-batch serves up to ``rows_per_batch`` rows, and the feed
    dries up at ``total_rows`` (read returns the same offset with no
    rows — processAllAvailable() then terminates). Offsets are pure
    row-id arithmetic over the shared deterministic generator, so
    ``readBetweenOffsets`` (failure-recovery replay) is trivially
    exactly-once: any [start, end) re-read regenerates identical rows.
    """

    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", "100"))
        self.per_batch = int(options.get("rows_per_batch", "10"))
        self.n_symbols = int(options.get("symbols", "5"))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = int(start["row"])
        hi = min(lo + self.per_batch, self.total_rows)
        return (
            iter([_gen_quote_row(i, self.n_symbols) for i in range(lo, hi)]),
            {"row": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [_gen_quote_row(i, self.n_symbols) for i in range(int(start["row"]), int(end["row"]))]
        )

    def commit(self, end):
        pass  # nothing to clean up: the generator is stateless


class SyntheticQuotesStreamDataSource(DataSource):
    """``readStream.format("synthetic_quotes_stream")`` — the streaming
    twin of :class:`SyntheticQuotesDataSource` (options: total_rows,
    rows_per_batch, symbols). The modern ``pyspark.sql.datasource``
    replacement for the reference's hand-rolled SourceFunction feed,
    now on the STREAM side too: a custom Python micro-batch source with
    real offset tracking and deterministic failure-recovery replay."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_quotes_stream"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema):
        return _QuotesStreamReader(self.options)


def register_synthetic_quotes_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticQuotesStreamDataSource)
