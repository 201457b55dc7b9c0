from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    streaming_tumbling_counts,
    run_to_memory_sink,
)

__all__ = [
    "read_events_stream",
    "streaming_tumbling_counts",
    "run_to_memory_sink",
]
