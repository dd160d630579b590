from esxsnmp_tsdb_spark.streaming.runner import events_stream, run_to_memory

__all__ = ["events_stream", "run_to_memory"]
