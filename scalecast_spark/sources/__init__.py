from scalecast_spark.sources.loaders import (
    events_to_series,
    load_table,
    long_from_columns,
    read_any,
)
from scalecast_spark.sources.sinks import (
    write_bucketed,
    write_delta,
    write_iceberg,
    write_partitioned,
)

__all__ = [
    "load_table", "events_to_series", "read_any", "long_from_columns",
    "write_partitioned", "write_bucketed", "write_delta", "write_iceberg",
]
