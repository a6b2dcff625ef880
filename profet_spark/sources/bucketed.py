"""Bucketed warehouse tables: co-located joins without a shuffle.

The fourth shuffle-avoidance tool alongside broadcast (J2/asof build
sides), pre-repartitioning (asof sort-merge union), and AQE: writing two
tables with ``bucketBy(N, key)`` pre-hash-partitions their FILES by the
join key, so a later equi-join or groupBy on that key needs NO Exchange —
each task reads bucket i of both sides. At warehouse scale this is how
the feature store amortizes shuffles: descriptor tables and label/anchor
tables are written bucketed by ``image_id`` once, and every downstream
join/aggregate against them is exchange-free (Iceberg's
``bucket(N, col)`` partition transform plays the same role through
storage-partitioned joins; this module is the Spark-warehouse form).

Contract notes (plan-asserted in tests/test_bucketed.py):
- join of two tables bucketed by the same key and bucket count plans a
  SortMergeJoin with ZERO Exchange operators;
- ``groupBy(key)`` on a bucketed table aggregates with no Exchange;
- an equality/IN filter on the bucket key prunes buckets at the scan
  (``SelectedBucketsCount`` in the plan) — the file-level analog of
  partition pruning.

Limits, stated plainly: bucketed writes go through ``saveAsTable`` (the
bucket metadata lives in the session catalog/metastore); the number of
buckets must match on both sides for the exchange-free join; the as-of
UNION strategy cannot consume bucketing (a union discards children's
output partitioning in Spark), which is why asof keeps its single
explicit repartition instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Write ``df`` as a parquet warehouse table bucketed by ``key``.

    ``sort_by`` additionally sorts rows within each bucket file (e.g. the
    timestamp column) so downstream merge joins and window scans read
    presorted data."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog, so
    this must be ``spark.table``, not a path read — a path read loses the
    bucket spec and reintroduces the shuffle)."""
    return spark.table(table)
