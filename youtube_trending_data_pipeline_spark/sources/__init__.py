from youtube_trending_data_pipeline_spark.sources.bronze import (
    read_bronze_day,
    region_items,
    write_bronze_day,
)
from youtube_trending_data_pipeline_spark.sources.tables import (
    append_partitioned,
    overwrite_date_partition,
    partition_exists,
    read_table,
)

__all__ = [
    "read_bronze_day",
    "region_items",
    "write_bronze_day",
    "read_table",
    "append_partitioned",
    "overwrite_date_partition",
    "partition_exists",
]
