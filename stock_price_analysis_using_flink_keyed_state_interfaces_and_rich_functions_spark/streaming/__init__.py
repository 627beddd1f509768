from .stateful import (  # noqa: F401
    running_max_stream,
    session_close_stream,
    fill_forward_stream,
    running_agg_update_stream,
    tumbling_count_window_avg_stream,
    rows_between_breaches_stream,
    running_max_transform_with_state,
    last_touch_attribution_stream,
)
from .windows import (  # noqa: F401
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    streaming_dedup,
    streaming_minhash_dedup,
    read_accepted_signatures,
    streaming_heavy_hitters,
    read_heavy_hitters,
    streaming_upsert_snapshot,
    read_snapshot,
    run_stream_foreach_batch,
    run_stream_to_memory,
)
