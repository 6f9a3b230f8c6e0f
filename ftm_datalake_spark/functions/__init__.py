from ftm_datalake_spark.functions.checksum import (
    content_checksum,
    data_checksum,
    shard_path,
)
from ftm_datalake_spark.functions.mime import mimetype_to_schema
from ftm_datalake_spark.functions.paths import file_name, parent_path

__all__ = [
    "content_checksum",
    "data_checksum",
    "shard_path",
    "mimetype_to_schema",
    "file_name",
    "parent_path",
]
