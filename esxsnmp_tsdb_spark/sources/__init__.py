from esxsnmp_tsdb_spark.sources.catalog import (
    TABLES,
    load_events_range,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_events_range", "load_table", "register_views"]
