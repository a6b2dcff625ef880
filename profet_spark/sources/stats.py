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
