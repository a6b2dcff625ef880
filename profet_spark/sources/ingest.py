"""Raw-text ingestion (SURVEY.md §2.1 source tier, JSONL/CSV formats).

Web-scale corpora arrive as JSON-lines and CSV long before they are
parquet — the reference's equivalent step is its eager FASTA directory
walk (`[R] FeatureGen.py ≈L600-700`, reconstructed). Two rules make
these readers safe at 100 TB where the naive ``spark.read.json(path)``
is not:

1. **Schema is REQUIRED, never inferred.** Inference is a full extra
   pass over the data before the real job starts (and samples can
   mis-type sparse columns); at scale that is a second 100 TB scan.
   Callers pass a DDL string or StructType; ``DOCUMENTS_DDL`` matches
   the engine's documents table for the common case.

2. **Corrupt records quarantine instead of killing the job.** One
   mangled line in a billion must not fail a 1000-executor stage.
   PERMISSIVE mode routes unparseable lines to a ``_corrupt_record``
   column; :func:`split_corrupt` separates clean rows from the
   quarantine so pipelines can persist rejects for audit (the
   row-count + checksum lineage the checkpoint sink records makes the
   split auditable). ``mode="fail"`` opts into FAILFAST for
   must-be-clean inputs.

Both readers return plain DataFrames: every downstream operator
(dedup, quality, packing, descriptors) composes unchanged, and
Catalyst still prunes columns/pushes filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the engine's documents-table shape (TESTDATA.md): the default target
# for raw text ingest
DOCUMENTS_DDL = "doc_id bigint, text string, lang string, n_chars int"


def _with_corrupt(schema) -> T.StructType:
    st = (T.StructType.fromDDL(schema) if isinstance(schema, str)
          else schema)
    if CORRUPT_COL in st.fieldNames():
        return st
    return T.StructType(list(st.fields)
                        + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def ingest_jsonl(spark: SparkSession, path: str,
                 schema: str | T.StructType = DOCUMENTS_DDL,
                 mode: str = "permissive") -> DataFrame:
    """Read JSON-lines with an EXPLICIT schema (no inference scan).

    ``mode="permissive"`` (default): unparseable/mistyped lines land in
    ``_corrupt_record`` with every schema column NULL — feed the result
    to :func:`split_corrupt`. ``mode="fail"``: FAILFAST, first bad line
    kills the read (for inputs contractually guaranteed clean)."""
    if mode not in ("permissive", "fail"):
        raise ValueError(f"mode must be 'permissive' or 'fail', got {mode!r}")
    if mode == "fail":
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    return (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def ingest_csv(spark: SparkSession, path: str,
               schema: str | T.StructType = DOCUMENTS_DDL,
               mode: str = "permissive", header: bool = True,
               **options) -> DataFrame:
    """CSV twin of :func:`ingest_jsonl` (same explicit-schema and
    quarantine rules); extra ``options`` pass through to the reader
    (``sep``, ``quote``, ``multiLine``, ...)."""
    if mode not in ("permissive", "fail"):
        raise ValueError(f"mode must be 'permissive' or 'fail', got {mode!r}")
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if mode == "fail":
        return reader.schema(schema).option("mode", "FAILFAST").csv(path)
    return (reader.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path))


def split_corrupt(df: DataFrame,
                  persist: bool = True) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with ``_corrupt_record`` dropped,
    and the raw text of every quarantined line for audit/repair.

    Spark REFUSES corrupt-column-only projections straight off a raw
    file scan (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``
    — the pruned parse would skip the very parsing that populates the
    column), and its documented shape is to materialize the parsed scan
    first. So by default the input is persisted (MEMORY_AND_DISK —
    spills, never OOMs) and both halves are narrow filters over that
    ONE parse; callers that materialize both halves should
    ``df.unpersist()`` afterwards (long-lived drivers) or let the job
    end reclaim it. ``persist=False`` keeps the quarantine at full row
    width instead (schema columns referenced alongside the corrupt
    column is the other Spark-permitted form) — the write-both-halves
    shape for corpora too large to cache even with spill."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"no {CORRUPT_COL} column — read with mode='permissive'")
    if persist:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        bad = (df.where(F.col(CORRUPT_COL).isNotNull())
               .select(F.col(CORRUPT_COL).alias("raw")))
    else:
        bad = (df.where(F.col(CORRUPT_COL).isNotNull())
               .withColumnRenamed(CORRUPT_COL, "raw"))
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, bad


def ingest_jsonl_stream(spark: SparkSession, path: str,
                        schema: str | T.StructType = DOCUMENTS_DDL,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """Structured-Streaming twin of :func:`ingest_jsonl` (§2.9): tail a
    landing directory of JSON-lines files with the SAME explicit schema
    (streaming readers REQUIRE one — inference is impossible on an
    unbounded source, which is exactly why the batch reader refuses it
    too) and the same PERMISSIVE ``_corrupt_record`` quarantine.

    The corrupt-only projection rule does not bite here: stream sinks
    consume full micro-batch rows, and the split belongs in
    ``foreachBatch`` where both halves of the (already materialized)
    micro-batch can be written in one pass:

        q = (ingest_jsonl_stream(spark, landing, DDL)
             .writeStream.foreachBatch(
                 lambda b, _: _route(*split_corrupt(b, persist=False)))
             .option("checkpointLocation", ckpt).start())

    ``max_files_per_trigger`` bounds micro-batch size for backpressure
    (the production knob when a backfill dumps 10^5 files at once)."""
    reader = (spark.readStream.schema(_with_corrupt(schema))
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.json(path)


__all__ = ["ingest_jsonl", "ingest_csv", "ingest_jsonl_stream",
           "split_corrupt", "DOCUMENTS_DDL", "CORRUPT_COL"]
