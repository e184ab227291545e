from drill_calcite_spark.sources.files import (
    ensure_csv_copy,
    ensure_json_copy,
    read_csv_inferred,
    read_json_inferred,
)
from drill_calcite_spark.sources.modify import (
    delete_where,
    insert_into,
    merge_into,
    update_where,
)

__all__ = [
    "read_csv_inferred", "read_json_inferred",
    "ensure_csv_copy", "ensure_json_copy",
    "insert_into", "delete_where", "update_where", "merge_into",
]
