from scalecast_spark.sources.loaders import load_table, events_to_series

__all__ = ["load_table", "events_to_series"]
