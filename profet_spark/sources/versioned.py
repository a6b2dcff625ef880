"""Versioned snapshots over the hidden-partitioned feature store:
time travel, rollback, version expiry, and additive schema evolution
(SURVEY.md §2.1 S13/S14; north_rule "Iceberg tables ... resumable from
checkpoint with per-partition lineage + metrics").

The in-place store (:mod:`profet_spark.sources.partitioned`) rewrites
touched partitions with dynamic partition overwrite — correct, but the
pre-image is gone, so a bad backfill cannot be undone and an auditor
cannot re-read "the table as trained on". Real Iceberg solves this with
immutable snapshots: every commit writes NEW data files and a manifest
that maps each partition to the file set valid at that version; readers
resolve a manifest, old versions stay readable until expired
(``VERSION AS OF`` / ``expire_snapshots``). This module gives the
sandbox fallback the same model:

- every commit writes its files under a fresh ``data/c<K>/`` directory
  (hidden-partitioned ``_p_day=… / _p_bucket=…``, same transforms as
  :func:`partitioned.write_partitioned`) — files are NEVER mutated or
  deleted by later commits;
- a commit's manifest (``_versions/v<K>.json``, atomic tmp+rename)
  maps every partition tag ``day/bucket`` to the LIST of commit dirs
  whose files currently make up that partition, carries the
  authoritative read schema, the operation, lineage, and row metrics;
- ``read_versioned(..., version=k)`` is time travel: resolve manifest
  ``k``, read exactly the referenced directories (driver-side metadata
  pruning — ts/entity predicates shrink the directory list BEFORE any
  file is listed), align each commit's files to the manifest schema
  (additive evolution: missing columns become typed nulls);
- ``rollback_versioned`` is a metadata-only commit that re-points the
  table at an older snapshot's partitions;
- ``expire_versions`` deletes manifests older than the retention window
  plus any commit directory no surviving manifest references
  (reference-counted, so shared unmodified partitions survive).

On a real cluster the same operations are catalog calls — ``VERSION AS
OF k`` reads, ``rollback_to_snapshot``, ``expire_snapshots``, ``ALTER
TABLE ADD COLUMN`` — routed via :mod:`profet_spark.sources.iceberg`;
this fallback exists so the sandbox exercises identical semantics.

Scale notes (10^12 rows): a manifest is O(partition count) metadata —
days(ts) x bucket(N) bounds that at (table span in days) x N entries
(~4M for 10 years x 1024 buckets), independent of row count; production
Iceberg stores the same mapping in avro manifest files. Commits touch
only their own partitions' entries; reads prune the tag list on the
driver, so plan time scales with the partitions READ, not with table
size or version count. Single-writer optimistic concurrency: two racing
commits collide on the version file rename and the loser retries — the
same model as Iceberg's atomic metadata swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from profet_spark.sources.partitioned import (
    BUCKET_COL,
    DAY_COL,
    _bucket_ids,
    _day_expr,
    _day_str,
    partition_transforms,
)

SPEC_FILE = "_versioned_spec.json"
VERSIONS_DIR = "_versions"
DATA_DIR = "data"


# ---------------------------------------------------------------- metadata

def _spec_path(store: str) -> str:
    return os.path.join(store, SPEC_FILE)


def read_spec(store: str) -> dict | None:
    path = _spec_path(store)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def _versions_dir(store: str) -> str:
    return os.path.join(store, VERSIONS_DIR)


def _manifest_path(store: str, version: int) -> str:
    return os.path.join(_versions_dir(store), f"v{version:08d}.json")


def _commit_dirname(version: int) -> str:
    return f"c{version:08d}"


def list_versions(store: str) -> list[int]:
    vdir = _versions_dir(store)
    if not os.path.isdir(vdir):
        return []
    out = []
    for fn in os.listdir(vdir):
        if fn.startswith("v") and fn.endswith(".json"):
            out.append(int(fn[1:-5]))
    return sorted(out)


def read_manifest(store: str, version: int | None = None) -> dict:
    """The snapshot manifest for ``version`` (latest if None)."""
    versions = list_versions(store)
    if not versions:
        raise ValueError(
            f"read_manifest: {store} has no versions — not a versioned "
            "store (create_versioned writes v1)")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"read_manifest: version {version} does not exist (have "
            f"{versions[0]}..{versions[-1]}, possibly expired)")
    with open(_manifest_path(store, version)) as f:
        return json.load(f)


def version_history(store: str) -> list[dict]:
    """Audit trail: (version, parent, operation, lineage, metrics,
    commit_ts) for every retained snapshot, oldest first."""
    keep = ("version", "parent", "operation", "lineage", "metrics",
            "commit_ts")
    return [{k: m.get(k) for k in keep}
            for m in (read_manifest(store, v) for v in list_versions(store))]


def _write_manifest(store: str, manifest: dict) -> int:
    """Atomic optimistic commit: tmp file + rename; a racing writer that
    already claimed this version number surfaces as an error (retry with
    a re-read base, exactly like an Iceberg commit conflict)."""
    version = manifest["version"]
    os.makedirs(_versions_dir(store), exist_ok=True)
    final = _manifest_path(store, version)
    tmp = final + f".tmp.{os.getpid()}.{id(manifest)}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        # os.link is atomic AND fails if the target exists — unlike
        # os.replace, which would let the second of two racing writers
        # silently overwrite the first (check-then-replace is TOCTOU).
        # This is the filesystem analog of Iceberg's atomic metadata
        # swap; the loser re-reads the latest manifest and retries.
        os.link(tmp, final)
    except FileExistsError:
        raise RuntimeError(
            f"versioned commit conflict: v{version} already exists in "
            f"{store} — re-read the latest manifest and retry") from None
    finally:
        os.unlink(tmp)
    return version


# ---------------------------------------------------------------- writes

def _hidden_write(df: DataFrame, spec: dict, commit_dir: str) -> None:
    transforms = partition_transforms(
        spec["ts_col"], spec["entity_col"], spec["n_buckets"],
        ts_dtype=dict(df.dtypes)[spec["ts_col"]])
    for name, expr in transforms.items():
        df = df.withColumn(name, expr)
    # hash-distribute on the partition transforms before the write
    # (Iceberg's write.distribution-mode=hash): without it every task
    # emits one file into every partition it touches — tasks x
    # partitions tiny files per commit instead of ~one per partition.
    # day x bucket(N) already bounds partition size, so one file per
    # partition is the right default; a commit whose single partition
    # is too large for one task should raise N, not fan out files.
    df = df.repartition(F.col(DAY_COL), F.col(BUCKET_COL))
    (df.write.mode("errorifexists")
     .partitionBy(DAY_COL, BUCKET_COL)
     .parquet(commit_dir))


def _tag_rows(df: DataFrame, spec: dict) -> list[tuple[str, int, int]]:
    """Distinct (day, bucket, rows) of a batch — one metadata agg.
    Pre-write analysis only (upsert's touched-set); POST-write manifests
    use :func:`_commit_tags_from_files` instead, which costs no job."""
    transforms = partition_transforms(
        spec["ts_col"], spec["entity_col"], spec["n_buckets"],
        ts_dtype=dict(df.dtypes)[spec["ts_col"]])
    probe = df
    for name, expr in transforms.items():
        probe = probe.withColumn(name, expr)
    rows = (probe.groupBy(DAY_COL, BUCKET_COL).count().collect())
    return [(r[DAY_COL], int(r[BUCKET_COL]), int(r["count"])) for r in rows]


def _commit_tags_from_files(commit_dir: str) -> list[tuple[str, int, int]]:
    """(day, bucket, rows) of a just-written commit, from the directory
    layout + parquet FOOTERS (pyarrow metadata, exact) — the manifest is
    built from the data files with ZERO extra Spark pass, exactly how
    Iceberg assembles its manifests at commit time. O(files) driver-side
    metadata reads; file count per commit is bounded by the batch's
    partition footprint, not the table."""
    import pyarrow.parquet as pq

    out: list[tuple[str, int, int]] = []
    if not os.path.isdir(commit_dir):
        return out
    for dent in sorted(os.listdir(commit_dir)):
        if not dent.startswith(f"{DAY_COL}="):
            continue
        day = dent.split("=", 1)[1]
        droot = os.path.join(commit_dir, dent)
        for bent in sorted(os.listdir(droot)):
            if not bent.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(bent.split("=", 1)[1])
            n = 0
            broot = os.path.join(droot, bent)
            for fn in os.listdir(broot):
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    n += pq.ParquetFile(
                        os.path.join(broot, fn)).metadata.num_rows
            if n:
                out.append((day, bucket, n))
    return out


def _schema_of(df: DataFrame, spec: dict) -> list[list[str]]:
    return [[c, t] for c, t in df.dtypes
            if c not in (DAY_COL, BUCKET_COL)]


def _validate_against(spec: dict, df: DataFrame) -> None:
    for c in (spec["ts_col"], spec["entity_col"]):
        if c not in df.columns:
            raise ValueError(f"versioned write: {c!r} not in the batch")


def create_versioned(df: DataFrame, store: str, ts_col: str = "ts",
                     entity_col: str = "image_id", n_buckets: int = 8,
                     lineage: str = "") -> int:
    """Create the store and commit snapshot v1 with ``df``'s rows."""
    if list_versions(store):
        raise ValueError(
            f"create_versioned: {store} already has versions — use "
            "append_versioned/upsert_versioned/overwrite commits")
    spec = {"ts_col": ts_col, "entity_col": entity_col,
            "n_buckets": n_buckets, "ts_dtype": dict(df.dtypes)[ts_col]}
    os.makedirs(store, exist_ok=True)
    with open(_spec_path(store), "w") as f:
        json.dump(spec, f)
    cdir = _commit_dirname(1)
    croot = os.path.join(store, DATA_DIR, cdir)
    _hidden_write(df, spec, croot)
    tags = _commit_tags_from_files(croot)
    manifest = {
        "version": 1, "parent": None, "operation": "create",
        "schema": _schema_of(df, spec),
        "partitions": {f"{_day_str(d)}/{b}": [cdir] for d, b, _ in tags},
        "commit_ts": time.time(), "lineage": lineage,
        "metrics": {"rows_written": sum(n for _, _, n in tags),
                    "partitions_touched": len(tags)},
    }
    return _write_manifest(store, manifest)


def _align_batch(df: DataFrame, schema: list[list[str]],
                 what: str) -> DataFrame:
    """Align a write batch to the manifest schema: manifest columns the
    batch lacks become typed nulls (Iceberg writer semantics for added
    columns); batch columns outside the schema are rejected — silently
    dropping them is data loss, evolve the schema first."""
    names = [c for c, _ in schema]
    extra = [c for c in df.columns if c not in names]
    if extra:
        raise ValueError(
            f"{what}: batch columns {extra} are not in the table schema — "
            "evolve_schema(add_cols=...) first, or drop them")
    for c, t in schema:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(t))
    # manifest order: every commit dir's files share one column layout
    return df.select(*names)


def append_versioned(spark: SparkSession, batch: DataFrame, store: str,
                     lineage: str = "") -> int:
    """Commit an append-only snapshot: the batch's files are ADDED to
    their partitions (no existing file is read, rewritten or dropped) —
    the O(batch) ingest path. Duplicate keys are the caller's problem
    (exactly like Iceberg appends); use upsert_versioned for merges."""
    spec = read_spec(store)
    if spec is None:
        raise ValueError(f"append_versioned: {store} is not a versioned "
                         "store (no spec)")
    _validate_against(spec, batch)
    base = read_manifest(store)
    batch = _align_batch(batch, base["schema"], "append_versioned")
    version = base["version"] + 1
    cdir = _commit_dirname(version)
    croot = os.path.join(store, DATA_DIR, cdir)
    _hidden_write(batch, spec, croot)
    tags = _commit_tags_from_files(croot)
    partitions = {k: list(v) for k, v in base["partitions"].items()}
    for d, b, _ in tags:
        partitions.setdefault(f"{_day_str(d)}/{b}", []).append(cdir)
    manifest = {
        "version": version, "parent": base["version"],
        "operation": "append", "schema": base["schema"],
        "partitions": partitions,
        "commit_ts": time.time(), "lineage": lineage,
        "metrics": {"rows_written": sum(n for _, _, n in tags),
                    "partitions_touched": len(tags)},
    }
    return _write_manifest(store, manifest)


def upsert_versioned(spark: SparkSession, batch: DataFrame, store: str,
                     key_cols: list[str] | None = None,
                     lineage: str = "") -> int:
    """Commit a merge snapshot: partitions the batch touches are
    re-materialized (stored rows whose key is NOT in the batch, plus the
    batch) into the new commit's files; untouched partitions keep their
    existing files BY REFERENCE — zero bytes moved, and the pre-image
    stays readable at the parent version (unlike the in-place
    :func:`partitioned.upsert_partitioned`, which this mirrors
    semantically — including the moved-key probe: with custom
    ``key_cols`` that don't determine the partition, stored same-key
    rows OUTSIDE the batch footprint extend the rewrite set, so the
    merged table never holds duplicate keys)."""
    spec = read_spec(store)
    if spec is None:
        raise ValueError(f"upsert_versioned: {store} is not a versioned "
                         "store (no spec)")
    _validate_against(spec, batch)
    base = read_manifest(store)
    keys = list(key_cols) if key_cols else [spec["entity_col"],
                                            spec["ts_col"]]
    missing = [c for c in keys if c not in batch.columns]
    if missing:
        raise ValueError(f"upsert_versioned: key columns {missing} not "
                         "in the batch")
    batch = _align_batch(batch, base["schema"], "upsert_versioned").cache()
    try:
        touched = {f"{_day_str(d)}/{b}": n
                   for d, b, n in _tag_rows(batch, spec)}
        batch_keys = batch.select(*keys).distinct()
        n_batch = batch.count()
        if n_batch <= 5_000_000:
            batch_keys = F.broadcast(batch_keys)
        # moved-key probe: stored rows sharing a batch key but living in
        # partitions the batch does not touch must be rewritten too
        rewrite = set(touched)
        if not {spec["entity_col"], spec["ts_col"]} <= set(keys):
            rest = [t for t in base["partitions"] if t not in rewrite]
            if rest:
                stored_rest = _read_tags(spark, store, base, rest,
                                         with_tag=True)
                moved = (stored_rest.join(batch_keys, keys, "left_semi")
                         .select("__vs_tag").distinct().collect())
                rewrite |= {r["__vs_tag"] for r in moved}
        existing = [t for t in rewrite if t in base["partitions"]]
        if existing:
            stored = _read_tags(spark, store, base, existing)
            kept = stored.join(batch_keys, keys, "left_anti")
            merged = kept.unionByName(batch)
        else:
            merged = batch
        version = base["version"] + 1
        cdir = _commit_dirname(version)
        croot = os.path.join(store, DATA_DIR, cdir)
        _hidden_write(merged, spec, croot)
        out_tags = _commit_tags_from_files(croot)
        partitions = {k: list(v) for k, v in base["partitions"].items()
                      if k not in rewrite}
        for d, b, _ in out_tags:
            partitions[f"{_day_str(d)}/{b}"] = [cdir]
        manifest = {
            "version": version, "parent": base["version"],
            "operation": "upsert", "schema": base["schema"],
            "partitions": partitions,
            "commit_ts": time.time(), "lineage": lineage,
            "metrics": {"rows_written": sum(n for _, _, n in out_tags),
                        "partitions_touched": len(rewrite)},
        }
        return _write_manifest(store, manifest)
    finally:
        batch.unpersist()


def rollback_versioned(spark: SparkSession, store: str, to_version: int,
                       lineage: str = "") -> int:
    """Metadata-only commit that restores snapshot ``to_version``'s
    partitions and schema as the new latest — the bad commits stay in
    history (auditable) but stop being served."""
    base = read_manifest(store)           # latest — assigns the number
    target = read_manifest(store, to_version)
    manifest = {
        "version": base["version"] + 1, "parent": base["version"],
        "operation": "rollback", "schema": target["schema"],
        "partitions": target["partitions"],
        "commit_ts": time.time(),
        "lineage": lineage or f"rollback to v{to_version}",
        "metrics": {"rows_written": 0, "partitions_touched": 0,
                    "restored_version": to_version},
    }
    return _write_manifest(store, manifest)


def evolve_schema(spark: SparkSession, store: str,
                  add_cols: dict[str, str], lineage: str = "") -> int:
    """Additive schema evolution as a metadata-only commit: no data file
    is rewritten; readers materialize the new columns as typed nulls for
    files written before the evolution (``ALTER TABLE ADD COLUMN``
    semantics). Only ADD is offered: drops/renames on a parquet fallback
    would silently corrupt position-based readers of old files."""
    if not add_cols:
        raise ValueError("evolve_schema: add_cols is empty")
    base = read_manifest(store)
    have = {c for c, _ in base["schema"]}
    dup = [c for c in add_cols if c in have]
    if dup:
        raise ValueError(f"evolve_schema: columns {dup} already exist")
    if DAY_COL in add_cols or BUCKET_COL in add_cols:
        raise ValueError("evolve_schema: _p_* names are reserved for the "
                         "hidden partition transforms")
    manifest = {
        "version": base["version"] + 1, "parent": base["version"],
        "operation": "evolve",
        "schema": base["schema"] + [[c, t] for c, t in add_cols.items()],
        "partitions": base["partitions"],
        "commit_ts": time.time(),
        "lineage": lineage or f"add columns {sorted(add_cols)}",
        "metrics": {"rows_written": 0, "partitions_touched": 0,
                    "columns_added": sorted(add_cols)},
    }
    return _write_manifest(store, manifest)


# ---------------------------------------------------------------- reads

def _read_tags(spark: SparkSession, store: str, manifest: dict,
               tags: list[str], with_tag: bool = False) -> DataFrame:
    """Read exactly ``tags``' directories at ``manifest``'s snapshot,
    aligned to the manifest schema. Directories are grouped by commit so
    each group keeps one file schema; per-group reads recover the hidden
    partition values from the path (basePath) and then union."""
    schema = manifest["schema"]
    by_commit: dict[str, list[str]] = {}
    for t in tags:
        for cdir in manifest["partitions"].get(t, []):
            by_commit.setdefault(cdir, []).append(t)
    parts = []
    for cdir, ctags in sorted(by_commit.items()):
        root = os.path.join(store, DATA_DIR, cdir)
        dirs = []
        for t in ctags:
            day, bucket = t.rsplit("/", 1)
            d = os.path.join(root, f"{DAY_COL}={day}",
                             f"{BUCKET_COL}={bucket}")
            # an append commit's manifest entry covers only the tags it
            # wrote; a tag listed under an OLDER commit may predate this
            # one — existence was fixed at commit time, so missing dirs
            # here indicate manifest corruption and must raise
            if not os.path.isdir(d):
                raise ValueError(
                    f"versioned read: {d} is referenced by v"
                    f"{manifest['version']} but does not exist — the "
                    "store was modified outside the commit protocol")
            dirs.append(d)
        df = spark.read.option("basePath", root).parquet(*dirs)
        for c, t in schema:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast(t))
        cols = [c for c, _ in schema]
        if with_tag:
            df = df.select(
                *cols, F.concat_ws(
                    "/", F.col(DAY_COL).cast("string"),
                    F.col(BUCKET_COL).cast("string")).alias("__vs_tag"))
        else:
            df = df.select(*cols)
        parts.append(df)
    if not parts:
        base = spark.createDataFrame(
            [], ", ".join(f"`{c}` {t}" for c, t in schema))
        return base.withColumn("__vs_tag", F.lit("")) if with_tag else base
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_versioned(spark: SparkSession, store: str,
                   version: int | None = None,
                   ts_between: tuple | None = None,
                   entity_in: list | None = None) -> DataFrame:
    """Read snapshot ``version`` (latest if None) — time travel.

    ts/entity predicates prune the manifest's tag list ON THE DRIVER
    (string day-range / bucket-id checks against the tag keys), so the
    scan never lists — let alone opens — a directory outside the
    predicate window; the exact row-level predicates still apply on the
    source columns, mirroring :func:`partitioned.scan_pruned`."""
    spec = read_spec(store)
    if spec is None:
        raise ValueError(f"read_versioned: {store} is not a versioned "
                         "store (no spec)")
    manifest = read_manifest(store, version)
    tags = sorted(manifest["partitions"])
    ts_col, entity_col = spec["ts_col"], spec["entity_col"]
    ts_dtype = spec["ts_dtype"]
    if ts_between is not None:
        lo, hi = ts_between
        row = spark.range(1).select(
            _day_expr(F.lit(lo).cast(ts_dtype), ts_dtype).alias("lo"),
            _day_expr(F.lit(hi).cast(ts_dtype), ts_dtype).alias("hi"),
        ).collect()[0]
        lo_day, hi_day = row["lo"], row["hi"]
        tags = [t for t in tags if lo_day <= t.rsplit("/", 1)[0] <= hi_day]
    if entity_in is not None:
        if not entity_in:
            tags = []
        else:
            etype = dict(manifest["schema"])[entity_col]
            buckets = {str(b) for b in _bucket_ids(
                spark, entity_in, spec["n_buckets"], etype)}
            tags = [t for t in tags if t.rsplit("/", 1)[1] in buckets]
    df = _read_tags(spark, store, manifest, tags)
    if ts_between is not None:
        lo, hi = ts_between
        df = df.where(F.col(ts_col).between(
            F.lit(lo).cast(ts_dtype), F.lit(hi).cast(ts_dtype)))
    if entity_in is not None:
        df = df.where(F.col(entity_col).isin(entity_in)
                      if entity_in else F.lit(False))
    return df


def read_incremental(spark: SparkSession, store: str, from_version: int,
                     to_version: int | None = None) -> DataFrame:
    """Rows ADDED strictly after snapshot ``from_version`` up to and
    including ``to_version`` (latest if None) — the incremental-consumer
    path: a downstream job that checkpointed "processed through v3"
    reads only the commits v4..vN, never the table.

    Like Iceberg's incremental append scan, the range must contain only
    ``append`` commits (plus metadata-only ``evolve``): an upsert
    rewrites whole partitions (its files mix old and new rows) and a
    rollback changes visibility without adding rows, so "the delta" is
    not a file set for those — the caller gets a loud error and should
    diff snapshots instead (:func:`partitioned.snapshot_diff` semantics
    via two time-travel reads). Cost is O(appended bytes in range):
    exactly the new commits' directories are listed and scanned."""
    spec = read_spec(store)
    if spec is None:
        raise ValueError(f"read_incremental: {store} is not a versioned "
                         "store (no spec)")
    latest = read_manifest(store)
    if to_version is None:
        to_version = latest["version"]
    if not from_version < to_version:
        raise ValueError(
            f"read_incremental: need from_version < to_version, got "
            f"{from_version} >= {to_version}")
    versions = list_versions(store)
    rng = [v for v in versions if from_version < v <= to_version]
    missing = set(range(from_version + 1, to_version + 1)) - set(rng)
    if missing:
        raise ValueError(
            f"read_incremental: versions {sorted(missing)} in the range "
            "are expired — the delta is no longer reconstructible; widen "
            "retention or fall back to a full snapshot read")
    to_manifest = read_manifest(store, to_version)
    schema = to_manifest["schema"]
    tags_by_commit: dict[str, list[str]] = {}
    for v in rng:
        m = read_manifest(store, v)
        if m["operation"] == "evolve":
            continue  # metadata-only, adds no rows
        if m["operation"] != "append":
            raise ValueError(
                f"read_incremental: v{v} is a {m['operation']!r} commit — "
                "incremental reads require an append-only range (Iceberg "
                "incremental-scan semantics); diff two time-travel reads "
                "for merge/rollback deltas")
        cdir = _commit_dirname(v)
        tags = [t for t, dirs in m["partitions"].items() if cdir in dirs]
        tags_by_commit[cdir] = tags
    # reuse the aligned reader: a synthetic manifest holding ONLY the
    # range's commits (a tag two appends both hit lists both commit
    # dirs), aligned to the END version's schema
    partitions: dict[str, list[str]] = {}
    for cdir, tags in sorted(tags_by_commit.items()):
        for t in tags:
            partitions.setdefault(t, []).append(cdir)
    synth = {"version": to_version, "schema": schema,
             "partitions": partitions}
    return _read_tags(spark, store, synth, sorted(partitions))


def compact_versioned(spark: SparkSession, store: str,
                      max_files_per_partition: int = 4,
                      target_file_bytes: int = 128 * 1024 * 1024,
                      lineage: str = "") -> dict:
    """S9 for the snapshot store: partitions fragmented across many
    commits (every streaming micro-batch / append adds a file) are
    rewritten into ONE file in a new snapshot commit; every other
    partition is carried by reference, and prior snapshots still read
    the old files (compaction is just another commit — Iceberg's
    ``rewrite_data_files``). Disk is reclaimed later by
    ``expire_versions`` once no retained snapshot references the
    pre-compaction commits.

    Victims: partitions whose CURRENT file count exceeds
    ``max_files_per_partition`` and whose bytes fit ``target_file_bytes``
    (oversized fragmented partitions are the engine's split job, not a
    merge candidate). Discovery is a driver-side listing of exactly the
    latest manifest's directories — O(partitions), zero data read for
    non-victims. Content is invariant by construction: rows are read
    from and written back to the same (day, bucket) transforms.

    Returns ``{"version", "partitions_compacted", "files_before",
    "files_after"}`` (version = the base snapshot when nothing
    qualified — no empty commit is written)."""
    spec = read_spec(store)
    if spec is None:
        raise ValueError(f"compact_versioned: {store} is not a versioned "
                         "store (no spec)")
    base = read_manifest(store)
    victims: list[str] = []
    files_before = 0
    for tag, cdirs in base["partitions"].items():
        day, bucket = tag.rsplit("/", 1)
        n_files, n_bytes = 0, 0
        for cdir in cdirs:
            d = os.path.join(store, DATA_DIR, cdir,
                             f"{DAY_COL}={day}", f"{BUCKET_COL}={bucket}")
            for fn in os.listdir(d):
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(d, fn))
        if n_files > max_files_per_partition and n_bytes <= target_file_bytes:
            victims.append(tag)
            files_before += n_files
    if not victims:
        return {"version": base["version"], "partitions_compacted": 0,
                "files_before": 0, "files_after": 0}
    merged = _read_tags(spark, store, base, victims)
    version = base["version"] + 1
    cdir = _commit_dirname(version)
    transforms = partition_transforms(
        spec["ts_col"], spec["entity_col"], spec["n_buckets"],
        ts_dtype=dict(merged.dtypes)[spec["ts_col"]])
    for name, expr in transforms.items():
        merged = merged.withColumn(name, expr)
    # one write task (= one file) per victim partition
    (merged.repartition(len(victims), F.col(DAY_COL), F.col(BUCKET_COL))
     .write.mode("errorifexists")
     .partitionBy(DAY_COL, BUCKET_COL)
     .parquet(os.path.join(store, DATA_DIR, cdir)))
    partitions = {k: list(v) for k, v in base["partitions"].items()}
    for t in victims:
        partitions[t] = [cdir]
    manifest = {
        "version": version, "parent": base["version"],
        "operation": "compact", "schema": base["schema"],
        "partitions": partitions,
        "commit_ts": time.time(),
        "lineage": lineage or f"compact {len(victims)} partitions",
        "metrics": {"rows_written": 0, "partitions_touched": len(victims),
                    "files_before": files_before,
                    "files_after": len(victims)},
    }
    _write_manifest(store, manifest)
    return {"version": version, "partitions_compacted": len(victims),
            "files_before": files_before, "files_after": len(victims)}


# ---------------------------------------------------------------- expiry

def expire_versions(spark: SparkSession, store: str,
                    keep_last: int = 2) -> dict:
    """Drop snapshots older than the newest ``keep_last`` and delete any
    commit directory no surviving snapshot references (reference-counted
    — a file shared with a retained snapshot is never touched). Time
    travel to an expired version raises; the latest data is unaffected.
    Mirrors Iceberg's ``expire_snapshots``."""
    if keep_last < 1:
        raise ValueError("expire_versions: keep_last must be >= 1")
    versions = list_versions(store)
    if not versions:
        raise ValueError(f"expire_versions: {store} has no versions")
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    live: set[str] = set()
    for v in keep:
        for dirs in read_manifest(store, v)["partitions"].values():
            live.update(dirs)
    removed_dirs = []
    for v in drop:
        os.remove(_manifest_path(store, v))
    data_root = os.path.join(store, DATA_DIR)
    for cdir in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        if cdir not in live:
            shutil.rmtree(os.path.join(data_root, cdir))
            removed_dirs.append(cdir)
    return {"expired_versions": drop, "kept_versions": keep,
            "removed_commit_dirs": removed_dirs}
