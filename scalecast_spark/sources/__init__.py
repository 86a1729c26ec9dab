from scalecast_spark.sources.loaders import load_table, events_to_series
from scalecast_spark.sources.sinks import (
    write_bucketed,
    write_delta,
    write_iceberg,
    write_partitioned,
)

__all__ = [
    "load_table", "events_to_series",
    "write_partitioned", "write_bucketed", "write_delta", "write_iceberg",
]
