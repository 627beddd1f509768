from .io import (  # noqa: F401
    read_quotes_csv,
    read_table,
    read_tables,
    read_quotes_stream,
    read_events_stream,
    write_parquet,
)
