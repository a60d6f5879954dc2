from map_reduce_lite_spark.streaming.windows import (  # noqa: F401
    events_stream,
    hourly_counts_stream,
    sliding_value_stream,
    run_stream_to_memory,
)
from map_reduce_lite_spark.streaming.sessions import sessionize_stream  # noqa: F401
