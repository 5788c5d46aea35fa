from smallquery_spark.streaming.runner import (
    events_stream,
    run_to_df,
    sink_scope,
    state_partitions_for,
    unload_state_stores,
)

__all__ = [
    "events_stream",
    "run_to_df",
    "sink_scope",
    "state_partitions_for",
    "unload_state_stores",
]
