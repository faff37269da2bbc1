from .writers import (
    write_warehouse_table,
    write_semicolon_csv,
    overwrite_day_partition,
    write_json_artifact,
)

__all__ = [
    "write_warehouse_table",
    "write_semicolon_csv",
    "overwrite_day_partition",
    "write_json_artifact",
]
