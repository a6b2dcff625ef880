from profet_spark.sources.catalog import TABLES, load_table, register_views
from profet_spark.sources.ingest import (ingest_csv, ingest_jsonl,
                                           ingest_jsonl_stream, split_corrupt)
from profet_spark.sources.partitioned import (high_watermark,
                                              materialize_incremental,
                                              scan_pruned, write_partitioned)

__all__ = ["TABLES", "load_table", "register_views",
           "ingest_jsonl", "ingest_csv", "ingest_jsonl_stream", "split_corrupt",
           "scan_pruned", "write_partitioned",
           "high_watermark", "materialize_incremental"]
