"""Table-statistics helpers (SURVEY.md §4.2; north_rule "per-partition
lineage + metrics").

Iceberg keeps exact per-file row counts in its manifests, so planners
read cardinality without touching data. The parquet fallback has the
same information in the file FOOTERS — :func:`estimate_row_count` sums
them via pyarrow: exact, O(files), zero data pages read. Operators that
only need cardinality for a rule-of-thumb (IVF's ``n_centroids ~
sqrt(n)``, as-of's hot-key sampling budget) use this instead of a full
``df.count()`` scan — at 10^12 rows the difference is one full table
pass per call.

Footer counts are only valid when the DataFrame is a bare scan: any
Filter / Join / Aggregate / Sample between the files and the result
changes cardinality. The guard walks the OPTIMIZED plan (so a dropped
filter that Catalyst eliminated doesn't disqualify the scan) and
returns None unless every node is cardinality-preserving — callers fall
back to ``count()`` explicitly and visibly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# optimized-plan node names that cannot change row cardinality (column
# pruning shows up as Project/Relation nodes, never as its rule name)
_CARDINALITY_PRESERVING = ("Project", "Relation", "LogicalRDD")


def _is_bare_scan(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0]
        if not node:
            continue
        if not any(node.startswith(p) for p in _CARDINALITY_PRESERVING):
            return False
    return True


def estimate_row_count(df: DataFrame) -> int | None:
    """Exact row count from parquet footers — zero data read.

    Returns None (caller decides whether to pay for ``count()``) when:
    - the plan is not a bare scan (footer counts would be wrong), or
    - the source is not file-backed, or
    - any footer is unreadable.
    """
    if not _is_bare_scan(df):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            path = f[len("file:"):] if f.startswith("file:") else f
            total += pq.ParquetFile(path).metadata.num_rows
        return int(total)
    except Exception:
        return None


def table_stats(df: DataFrame) -> dict:
    """Capacity-planning summary of a file-backed table: ``{"files",
    "rows", "bytes"}`` — all from metadata (footers + filesystem), zero
    data pages read, so it is safe to call on a 100 TB table.

    ``rows`` is :func:`estimate_row_count` (None unless the plan is a
    bare scan); ``bytes`` is summed only for local ``file:`` paths (the
    sandbox shape — object stores report sizes through their own
    listings, which is the catalog's job, not a client-side stat walk).
    This is the input to split sizing: bytes/128MB gives the production
    partition count, the same policy bench.py's `_input_parts` expresses
    through row counts."""
    import os as _os

    try:
        files = df.inputFiles()
    except Exception:
        files = []
    total = 0
    have_bytes = bool(files)
    for f in files:
        if f.startswith("file:"):
            try:
                total += _os.path.getsize(f[len("file:"):])
                continue
            except OSError:
                pass
        have_bytes = False
    return {"files": len(files), "rows": estimate_row_count(df),
            "bytes": total if have_bytes else None}
