from profet_spark.sources.catalog import TABLES, load_table, register_views
from profet_spark.sources.partitioned import scan_pruned, write_partitioned

__all__ = ["TABLES", "load_table", "register_views",
           "scan_pruned", "write_partitioned"]
