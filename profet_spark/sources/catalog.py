"""Table loading (SURVEY.md §2.1 S1/S2/S5).

The reference walks a FASTA directory eagerly (ProFET
feat_extract/FeatureGen.py ≈L600-700, pipeline.py ≈L80-140 — reconstructed,
see SURVEY.md §0); here the scan is declarative: ``spark.read`` hands
Catalyst a relation it can push filters into and prune columns from.

Production target is an Iceberg catalog (``spark.read.table``); the
sandbox image carries no Iceberg jars, so we fall back to parquet files
with identical schemas. The fallback is behind one function so swapping
in Iceberg is a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Prefers an Iceberg catalog table when ``sf_dir``
    looks like a catalog identifier (no path separator AND no such local
    directory — a bare relative dir name like ``testdata`` must stay a
    parquet root, not become a TABLE_OR_VIEW_NOT_FOUND), else reads
    parquet from ``sf_dir/name.parquet``."""
    if os.sep not in sf_dir and "/" not in sf_dir and not os.path.isdir(sf_dir):
        return spark.read.table(f"{sf_dir}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
