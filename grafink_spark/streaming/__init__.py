from grafink_spark.streaming.pipeline import (  # noqa: F401
    read_event_stream,
    windowed_event_counts,
    run_stream_to_parquet,
)
