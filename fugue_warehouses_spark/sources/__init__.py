from fugue_warehouses_spark.sources.star import (
    STAR_TABLES,
    load_star_table,
    load_star_tables,
    register_star_views,
)

__all__ = [
    "STAR_TABLES",
    "load_star_table",
    "load_star_tables",
    "register_star_views",
]
