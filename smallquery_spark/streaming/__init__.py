from smallquery_spark.streaming.runner import events_stream, run_to_df

__all__ = ["events_stream", "run_to_df"]
