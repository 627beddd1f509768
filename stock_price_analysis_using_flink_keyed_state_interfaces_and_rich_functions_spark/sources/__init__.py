from .io import (  # noqa: F401
    read_quotes_csv,
    read_text_lines,
    parse_quotes_lines,
    read_orc,
    write_orc,
    read_table,
    read_tables,
    read_quotes_stream,
    read_events_stream,
    write_parquet,
)
