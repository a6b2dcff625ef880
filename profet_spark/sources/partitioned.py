"""Iceberg-style hidden partitioning over the parquet fallback
(SURVEY.md §4.2 "partition pruning"; north_rule: Iceberg tables with
days(ts) / bucket(N, image_id) partition specs).

Iceberg stores transform values (``days(ts)``, ``bucket(N, id)``) out of
band and rewrites predicates on the SOURCE columns into partition
predicates. The sandbox image carries no Iceberg jars, so this module
gives the parquet fallback the same contract:

- :func:`write_partitioned` materializes the transform columns (prefix
  ``_p_``) and writes with ``partitionBy`` — the directory layout IS the
  partition index;
- :func:`scan_pruned` rewrites ts-range / entity-set predicates into
  filters on those columns, so the scan's ``PartitionFilters`` prune whole
  directories before any data file is opened (asserted against the
  physical plan in tests/test_partitioned.py);
- readers never see the hidden columns (dropped after pruning), exactly
  like Iceberg's hidden partitioning.

On a real cluster the same two calls map 1:1 onto
``df.writeTo(tbl).partitionedBy(F.days("ts"), F.bucket(8, "image_id"))``
plus a plain source-column filter (Iceberg performs the predicate rewrite
itself); callers migrate by swapping this module for the catalog writer.

Scale notes (10^12 rows): day granularity bounds partition count by the
table's time span; the bucket transform spreads each day over N
directories so per-partition file sizes stay plannable, and entity lookups
(as-of build sides, backfill repairs) read N_probe/N of each day. The
bucket hash is Spark's xxhash64 — the same function the checkpoint sink
uses — so co-partitioned writes from different jobs land identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_COL = "_p_day"
BUCKET_COL = "_p_bucket"


def partition_transforms(ts_col: str, entity_col: str, n_buckets: int):
    """The two hidden transforms: days(ts) and bucket(n, entity)."""
    return {
        DAY_COL: F.date_format(F.col(ts_col), "yyyy-MM-dd"),
        BUCKET_COL: F.pmod(F.xxhash64(F.col(entity_col)), F.lit(n_buckets)).cast("int"),
    }


def write_partitioned(df: DataFrame, out_dir: str, ts_col: str = "ts",
                      entity_col: str = "image_id", n_buckets: int = 8) -> None:
    """Write ``df`` with the hidden partition spec days(ts) x bucket(n)."""
    for name, expr in partition_transforms(ts_col, entity_col, n_buckets).items():
        df = df.withColumn(name, expr)
    (df.write.mode("overwrite")
     .partitionBy(DAY_COL, BUCKET_COL)
     .parquet(out_dir))


def _bucket_ids(spark: SparkSession, values: list, n_buckets: int,
                value_type: str) -> list[int]:
    """Bucket ids for an entity list — computed with the SAME engine
    function AND the same column type used at write time (xxhash64 is
    type-sensitive: hashing 7 as int and as bigint give different values,
    so the probe column is cast to the table's entity type)."""
    src = spark.createDataFrame([(v,) for v in values], ["v"])
    rows = (src.select(F.pmod(F.xxhash64(F.col("v").cast(value_type)),
                              F.lit(n_buckets)).cast("int").alias("b"))
            .distinct().collect())
    return sorted(int(r["b"]) for r in rows)


def scan_pruned(spark: SparkSession, out_dir: str, ts_col: str = "ts",
                entity_col: str = "image_id", n_buckets: int = 8,
                ts_between: tuple | None = None,
                entity_in: list | None = None) -> DataFrame:
    """Read a :func:`write_partitioned` table with Iceberg-style predicate
    rewrite: ts bounds become ``_p_day`` range filters, an entity set
    becomes a ``_p_bucket`` IN-list — both land in the scan's
    ``PartitionFilters`` (directory pruning), while the exact row-level
    predicates still apply on the source columns. Hidden columns are
    dropped from the result."""
    df = spark.read.parquet(out_dir)
    if ts_between is not None:
        lo, hi = ts_between
        lo_c, hi_c = F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")
        # constant-foldable day bounds -> partition filter
        df = df.where(F.col(DAY_COL).between(
            F.date_format(lo_c, "yyyy-MM-dd"), F.date_format(hi_c, "yyyy-MM-dd")))
        df = df.where(F.col(ts_col).between(lo_c, hi_c))
    if entity_in is not None:
        etype = dict(df.dtypes)[entity_col]
        df = df.where(F.col(BUCKET_COL).isin(
            _bucket_ids(spark, entity_in, n_buckets, etype)))
        df = df.where(F.col(entity_col).isin(entity_in))
    return df.drop(DAY_COL, BUCKET_COL)
