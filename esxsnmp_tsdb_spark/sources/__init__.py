from esxsnmp_tsdb_spark.sources.catalog import (
    BKT_OBS_TAG,
    OBS_COLUMNS,
    ROUTE_BUCKETED_CONF,
    TABLES,
    load_events_range,
    load_obs,
    load_table,
    register_views,
)

__all__ = [
    "BKT_OBS_TAG",
    "OBS_COLUMNS",
    "ROUTE_BUCKETED_CONF",
    "TABLES",
    "load_events_range",
    "load_obs",
    "load_table",
    "register_views",
]
