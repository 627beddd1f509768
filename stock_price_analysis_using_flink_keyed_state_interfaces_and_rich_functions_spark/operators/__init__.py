from .stateful import (  # noqa: F401
    running_max,
    final_max,
    tumbling_count_window_avg,
    rows_between_breaches,
)
