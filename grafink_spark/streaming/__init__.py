from grafink_spark.streaming.pipeline import (  # noqa: F401
    read_event_stream,
    run_stream_to_parquet,
    windowed_event_counts,
)
from grafink_spark.streaming.sessionize import (  # noqa: F401
    sessionize_batch,
    sessionize_stream,
)
from grafink_spark.streaming.graph_ingest import stream_to_graph  # noqa: F401
from grafink_spark.streaming.pipeline import enrich_stream  # noqa: F401
from grafink_spark.streaming.cdc_apply import apply_cdc_stream  # noqa: F401
