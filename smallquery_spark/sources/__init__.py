from smallquery_spark.sources.readers import (
    TABLES,
    load_dir,
    read_any,
    register_views,
)

__all__ = ["TABLES", "load_dir", "read_any", "register_views"]
