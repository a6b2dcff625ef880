"""Checkpointed, resumable partition sink (SURVEY.md §2.1 S7; north_rule
"resumable from checkpoint with per-partition lineage + metrics").

Design (works identically on a 1000-executor cluster):

- rows are assigned to one of N *deterministic* buckets by
  ``pmod(xxhash64(key_cols), N)`` — restart-stable, unlike
  ``spark_partition_id()`` which depends on scheduling;
- data lands under ``out_dir/bucket=K/`` via a single dynamic
  partition-overwrite job over the NOT-yet-committed buckets only
  (idempotent: a re-run of a failed bucket replaces its partial files);
- after the write succeeds, per-bucket metrics are computed with one
  hash agg — row count + order-insensitive checksum (sum of per-row
  xxhash64 over the output columns) — and appended to the manifest
  (JSON lines under ``out_dir/_manifest/``) together with lineage;
- resume = call ``checkpointed_write`` again: committed buckets are
  skipped by manifest lookup, the rest are (re)written.

The manifest doubles as the lineage record: every entry carries the
caller-supplied lineage string, the bucket's key columns, and metrics a
verifier can recompute from the written files (``verify_manifest``).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from profet_spark.functions import hashing as H

BUCKET_COL = "__bucket"
MANIFEST_DIR = "_manifest"

# bucket/checksum hash strategies:
# - "xxhash64": Spark-native, fastest (JVM codegen'd) — the production
#   default.
# - "portable": md5-derived h32 over '|'-joined string casts — computable
#   bit-for-bit in the DuckDB oracle, so the manifest itself can be graded
#   against SQL (used by the s7_checkpoint_manifest driver query).
HASH_STRATEGIES = ("xxhash64", "portable")


def _key_hash(cols: list[str], hash_strategy: str) -> F.Column:
    if hash_strategy == "xxhash64":
        return F.xxhash64(*[F.col(c) for c in cols])
    if hash_strategy == "portable":
        return H.h32(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
    raise ValueError(f"unknown hash_strategy: {hash_strategy!r}")


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def read_manifest(spark: SparkSession, out_dir: str) -> list[dict]:
    path = _manifest_path(out_dir)
    if not os.path.isdir(path):
        return []
    entries = []
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".json"):
            with open(os.path.join(path, fn)) as f:
                for line in f:
                    if line.strip():
                        entries.append(json.loads(line))
    return entries


def committed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    return {e["bucket"] for e in read_manifest(spark, out_dir)}


def _bucket_metrics(df: DataFrame, cols: list[str],
                    hash_strategy: str = "xxhash64") -> list[dict]:
    """(bucket, rows, checksum) in one hash agg. The checksum is the
    sum of per-row 32-bit-masked hashes over all output columns —
    order-insensitive, so any execution order verifies equal."""
    # canonical column order; low-32-bit mask + DECIMAL(38) sum keeps the
    # checksum exact and overflow-free up to ~10^28 rows (ANSI mode would
    # reject a wrapping long sum)
    h = _key_hash(sorted(cols), hash_strategy)
    if hash_strategy == "xxhash64":
        h = h.bitwiseAND(F.lit(0xFFFFFFFF))  # h32 is already 32-bit
    rows = (
        df.groupBy(BUCKET_COL)
        .agg(F.count("*").alias("rows"), F.sum(h.cast("decimal(38,0)")).alias("checksum"))
        .collect()
    )
    return [
        {"bucket": int(r[BUCKET_COL]), "rows": int(r["rows"]), "checksum": int(r["checksum"] or 0)}
        for r in rows
    ]


def checkpointed_write(
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    num_buckets: int = 32,
    lineage: str = "",
    fail_after_buckets: int | None = None,
    hash_strategy: str = "xxhash64",
) -> dict:
    """Write ``df`` to parquet under ``out_dir`` in resumable buckets.

    ``fail_after_buckets`` is a test hook: commit only that many pending
    buckets then raise, simulating a mid-job kill AFTER some buckets
    committed (the crash window between data-write and manifest-append of
    a single bucket is covered by idempotent overwrite on retry).

    Returns {"written": [...], "skipped": [...]}.
    """
    spark = df.sparkSession
    if "://" in out_dir and not out_dir.startswith("file:"):
        # manifest I/O is driver-local (os/open); an object-store URI would
        # silently write the manifest to a local './s3:/...' directory and
        # every resume would see zero committed buckets. A production
        # deployment routes the manifest through the Hadoop FS API.
        raise NotImplementedError(
            f"checkpointed_write: non-local out_dir {out_dir!r} — the "
            "manifest is driver-local; use a local/shared-filesystem path")
    prior = read_manifest(spark, out_dir)
    if prior:
        # a resume with different bucketing silently duplicates rows into
        # new buckets and loses the ones whose new bucket id is already
        # marked done — the manifest's recorded parameters are the contract
        p = prior[0]
        ours = {"key_cols": key_cols, "num_buckets": num_buckets,
                "hash_strategy": hash_strategy}
        theirs = {k: p.get(k) for k in ours}
        if ours != theirs:
            raise ValueError(
                f"checkpointed_write: resume parameters {ours} do not match "
                f"the existing manifest {theirs} — resuming with different "
                "bucketing would duplicate and drop rows")
    done = committed_buckets(spark, out_dir)
    bucketed = df.withColumn(
        BUCKET_COL,
        F.pmod(_key_hash(key_cols, hash_strategy), F.lit(num_buckets)).cast("int"),
    )
    pending = sorted(set(range(num_buckets)) - done)
    if fail_after_buckets is not None:
        to_write = pending[:fail_after_buckets]
    else:
        to_write = pending
    if not to_write:
        return {"written": [], "skipped": sorted(done)}

    subset = bucketed.where(F.col(BUCKET_COL).isin([int(b) for b in to_write]))
    (
        subset.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(out_dir)
    )
    # metrics come from the files just written, not from re-executing the
    # input plan: the read-back is one columnar scan of the new buckets
    # (vs a full upstream recompute) and is consistent with disk by
    # construction — an input-side recompute could diverge if the source
    # changed between the write and the metrics action, making
    # verify_manifest flag perfectly good files
    data_cols = [c for c in df.columns]
    # an all-empty write leaves no bucket=K dirs and parquet cannot infer
    # a schema from a bare _SUCCESS file
    has_parts = os.path.isdir(out_dir) and any(
        e.name.startswith(f"{BUCKET_COL}=") for e in os.scandir(out_dir))
    if has_parts:
        written_back = (
            spark.read.parquet(out_dir)
            .where(F.col(BUCKET_COL).isin([int(b) for b in to_write])))
        metrics = _bucket_metrics(written_back, data_cols, hash_strategy)
    else:
        metrics = []
    # a pending bucket that holds zero rows still needs a manifest entry,
    # or it is re-"written" on every resume and the idempotent no-op call
    # never converges
    seen = {m["bucket"] for m in metrics}
    metrics.extend({"bucket": int(b), "rows": 0, "checksum": 0}
                   for b in to_write if int(b) not in seen)

    os.makedirs(_manifest_path(out_dir), exist_ok=True)
    entry_file = os.path.join(_manifest_path(out_dir), f"commit-{uuid.uuid4().hex}.json")
    app_id = spark.sparkContext.applicationId
    with open(entry_file, "w") as f:
        for m in metrics:
            f.write(json.dumps({
                **m,
                "key_cols": key_cols,
                "num_buckets": num_buckets,
                "hash_strategy": hash_strategy,
                "lineage": lineage,
                "app_id": app_id,
                "committed_at": time.time(),
            }) + "\n")

    if fail_after_buckets is not None and len(pending) > len(to_write):
        raise RuntimeError(f"injected failure after {fail_after_buckets} buckets")
    return {"written": to_write, "skipped": sorted(done)}


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back ONLY committed buckets (uncommitted partials excluded)."""
    done = committed_buckets(spark, out_dir)
    df = spark.read.parquet(out_dir)
    return df.where(F.col(BUCKET_COL).isin([int(b) for b in done])).drop(BUCKET_COL)


def verify_manifest(spark: SparkSession, out_dir: str) -> bool:
    """Recompute per-bucket rows+checksum from the written files and
    compare with the manifest."""
    entries = {e["bucket"]: e for e in read_manifest(spark, out_dir)}
    if not entries:
        return True
    strategies = {e.get("hash_strategy", "xxhash64") for e in entries.values()}
    if len(strategies) != 1:  # not assert: must hold under python -O too
        raise ValueError(f"mixed hash strategies in manifest: {strategies}")
    df = spark.read.parquet(out_dir)
    data_cols = [c for c in df.columns if c != BUCKET_COL]
    recomputed = {
        m["bucket"]: m
        for m in _bucket_metrics(df.where(F.col(BUCKET_COL).isin(list(entries))),
                                 data_cols, strategies.pop())
    }
    for b, e in entries.items():
        m = recomputed.get(b)
        if m is None:
            # zero-row buckets leave no bucket=K directory: a committed
            # empty bucket legitimately recomputes to nothing
            if e["rows"] == 0 and e["checksum"] == 0:
                continue
            return False
        if e["rows"] != m["rows"] or e["checksum"] != m["checksum"]:
            return False
    # recomputed is keyed by the manifest's buckets (the scan is filtered
    # to them — uncommitted partials are the resume path's business, not a
    # verification failure), so there is nothing further to cross-check
    return True
