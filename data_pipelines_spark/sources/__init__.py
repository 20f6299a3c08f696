from data_pipelines_spark.sources.tables import (
    DRIVER_TABLES,
    load_events,
    load_table,
    register_views,
)

__all__ = ["DRIVER_TABLES", "load_events", "load_table", "register_views"]
