"""A16/A17 mergeable sketch rollups: HLL + Theta distinct counts, KLL quantiles.

The pre-aggregation pattern that makes interactive analytics possible at
100 TB: COUNT(DISTINCT) and exact quantiles do not decompose over time
partitions (yesterday's count + today's count double-counts returning
users), so any span query rescans the base table. Mergeable sketches fix
that: store ONE small sketch row per (day, key) — bytes, not rows — and
answer ANY span by unioning sketches, never rescanning. Spark 4 ships
the Apache DataSketches aggregates natively (`hll_sketch_agg`,
`hll_union_agg`, `kll_sketch_agg_double`, ...), so the whole rollup is
JVM-side partial aggregation — no UDF, no Python, map-side combine free.

- :func:`distinct_rollup` — per-group HLL sketch + estimate of
  ``count distinct(value)``. The sketch column is retained so coarser
  spans union it (:func:`merge_distinct_rollup`) without rescanning.
- :func:`merge_distinct_rollup` — re-aggregate stored sketches to a
  coarser grouping (days → month, per-source → global). Register-max
  union: associative, commutative, idempotent — replay/backfill safe.
- :func:`quantile_rollup` — per-group KLL(k) quantile estimates over a
  double column, same shape.

Exactness contract (what the SQL oracle can and cannot grade): the HLL
sketch is EXACT while a group's cardinality stays in sparse mode
(roughly ``< 0.75 * 2^lgk`` coupons; lgk=14 → tens of thousands), and a
KLL(k) sketch stores values verbatim while a group holds ``<= k`` rows,
where `get_quantile(0.5)` equals DuckDB's ``quantile_disc`` rank
convention (probed, pinned by test). Inside those regimes the graded
keys hash-match exact SQL — certifying the plumbing bitwise. Beyond
them the estimates are approximate AND (for KLL, whose compaction
depends on merge order; for HLL, once coupons overflow sparse mode)
may vary with partitioning — the scale regime is therefore
property-tested in pytest (relative-error bound, merge-vs-direct
consistency) instead of hash-graded; the docstring IS the contract.

Reference parity: ProFET computes nothing incrementally (one in-memory
pass — [R] FeatureGen.py ≈L1040-1100); sketch rollups are part of the
task-mandated warehouse tier (SURVEY.md §2.10), the A10
distinct-count family's scale path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_rollup", "merge_distinct_rollup", "quantile_rollup",
           "theta_rollup", "merge_theta_rollup", "retention_rollup",
           "epoch_day"]


def epoch_day(ts_col: str):
    """Day number since the epoch as an exact FLOOR division (bigint).

    ``unix_micros div 86400000000`` truncates toward zero, which
    disagrees with both DuckDB's ``//`` and Spark's 1-day tumbling
    window alignment for PRE-epoch timestamps (ts = -1 µs would land in
    day 0 instead of day -1). Subtracting ``pmod`` (always
    non-negative) first makes the numerator an exact multiple, so the
    integer ``div`` IS the floor — one shared convention for the batch
    rollups, the streaming window twin, and the SQL oracles, exact at
    any magnitude (no double rounding)."""
    return F.expr(
        f"CAST((unix_micros(CAST({ts_col} AS TIMESTAMP)) "
        f"- pmod(unix_micros(CAST({ts_col} AS TIMESTAMP)), 86400000000))"
        f" div 86400000000 AS BIGINT)")

#: default log2(registers): sparse-exact into the tens of thousands of
#: distinct values per group, 16 KiB dense ceiling per sketch.
DEFAULT_LGK = 14


def distinct_rollup(df: DataFrame, group_cols: Sequence[str],
                    value_col: str, lgk: int = DEFAULT_LGK,
                    sketch_col: str = "sketch",
                    est_col: str = "n_distinct_est") -> DataFrame:
    """Per-group HLL distinct sketch + estimate — ONE hash aggregate
    with map-side partial sketches (each partition builds local
    registers; the exchange carries sketch bytes, never values).

    Keep ``sketch_col`` in the stored rollup: it is what makes coarser
    queries (:func:`merge_distinct_rollup`) rescan-free. Drop it only
    for a terminal report."""
    if not (4 <= lgk <= 21):  # datasketches' own bounds
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col))
            .withColumn(est_col, F.hll_sketch_estimate(F.col(sketch_col))))


def merge_distinct_rollup(df: DataFrame, group_cols: Sequence[str],
                          sketch_col: str = "sketch",
                          est_col: str = "n_distinct_est") -> DataFrame:
    """Union stored per-fine-group sketches up to ``group_cols`` (pass
    ``[]`` for a grand total) — the days→month rollup, touching ONLY the
    sketch rows. Register-max union is associative/commutative/
    idempotent, so retries and out-of-order backfills cannot corrupt
    the rollup."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    g = df.groupBy(*group_cols).agg(agg) if group_cols else \
        df.select(sketch_col).agg(agg)
    return g.withColumn(est_col, F.hll_sketch_estimate(F.col(sketch_col)))


def quantile_rollup(df: DataFrame, group_cols: Sequence[str],
                    value_col: str, qs: Sequence[float] = (0.5,),
                    k: int = 200, prefix: str = "q") -> DataFrame:
    """Per-group KLL(k) quantile estimates of a double column: one
    column ``<prefix><q*100 as int>`` per requested quantile (q50, q95,
    ...). ONE hash aggregate, sketch bytes on the exchange.

    Exact-verbatim while the group holds <= k rows (then `get_quantile`
    matches DuckDB ``quantile_disc`` — pinned by test); approximate
    (±~1.7%/sqrt(k) rank error) and merge-order-dependent beyond."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    sk = F.kll_sketch_agg_double(value_col, F.lit(int(k)))
    aggs = [F.kll_sketch_get_quantile_double(sk, F.lit(float(q)))
            .alias(f"{prefix}{int(round(q * 100))}") for q in qs]
    return df.groupBy(*group_cols).agg(*aggs)


#: default theta log2(nominal entries): exact-mode (no sampling) until
#: 2^12 = 4096 distinct values per group, ~32 KiB sketch ceiling.
DEFAULT_THETA_LGK = 12


def theta_rollup(df: DataFrame, group_cols: Sequence[str],
                 value_col: str, lgk: int = DEFAULT_THETA_LGK,
                 sketch_col: str = "sketch",
                 est_col: str = "n_distinct_est") -> DataFrame:
    """A17 per-group Theta distinct sketch + estimate — same shape as
    :func:`distinct_rollup` but supporting full SET EXPRESSIONS
    downstream: theta sketches intersect and difference, which HLL
    registers cannot (union-only). The price is a bigger sketch
    (samples, not registers); store theta when the rollup must answer
    "in A and B" / "in A not B" (retention, churn, audience overlap),
    HLL when union-only spans suffice.

    Exactness contract (mirrors the module contract): a theta sketch is
    EXACT — a verbatim hash sample with theta = 1 — while a group's
    cardinality stays at or below ``2^lgk`` nominal entries, and
    intersections/differences OF exact-mode sketches are exact distinct
    counts, so the graded keys hash-match plain COUNT(DISTINCT) /
    EXISTS SQL. Beyond exact mode the estimate is approximate
    (relative error ~1/sqrt(2^lgk)) and set operations compound it —
    that regime is property-tested, not hash-graded."""
    if not (4 <= lgk <= 26):  # datasketches theta bounds
        raise ValueError(f"lgk must be in [4, 26], got {lgk}")
    return (df.groupBy(*group_cols)
            .agg(F.theta_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col))
            .withColumn(est_col, F.theta_sketch_estimate(F.col(sketch_col))))


def merge_theta_rollup(df: DataFrame, group_cols: Sequence[str],
                       sketch_col: str = "sketch",
                       est_col: str = "n_distinct_est",
                       lgk: int = DEFAULT_THETA_LGK) -> DataFrame:
    """Union stored theta sketches up to ``group_cols`` (``[]`` = grand
    total) — rescan-free coarser spans, same contract as
    :func:`merge_distinct_rollup` (associative/commutative/idempotent).

    ``lgk`` MUST match (or exceed) the ``theta_rollup`` the sketches
    were built with: ``theta_union_agg`` resizes the union to its own
    nominal-entries bound, so merging lgk=16 sketches at the default 12
    would silently downsample exact inputs into approximate output."""
    if not (4 <= lgk <= 26):
        raise ValueError(f"lgk must be in [4, 26], got {lgk}")
    agg = F.theta_union_agg(F.col(sketch_col), F.lit(lgk)).alias(sketch_col)
    g = df.groupBy(*group_cols).agg(agg) if group_cols else \
        df.select(sketch_col).agg(agg)
    return g.withColumn(est_col, F.theta_sketch_estimate(F.col(sketch_col)))


def retention_rollup(daily: DataFrame, period_col: str,
                     sketch_col: str = "sketch", lag: int = 1,
                     group_cols: Sequence[str] = ()) -> DataFrame:
    """A17 period-over-period retention/churn from a stored
    :func:`theta_rollup` — the canonical set-expression query: for each
    consecutive period pair (a, b = a + lag), how many distinct values
    were in BOTH (retained), only in a (churned), only in b (new)?

    Runs entirely on the tiny sketch rollup (one row per period/group
    — O(periods), never the base table): a self-equi-join on
    ``period + lag`` plus per-pair ``theta_intersection`` /
    ``theta_difference``. With exact-mode inputs all three counts are
    exact (SQL-oracle-gradable); beyond, approximate.

    ``group_cols``: extra key columns the rollup was built per (e.g.
    source) — pairs join within each group."""
    # explicit renames rather than DataFrame aliases: alias-qualified
    # self-join columns fail ambiguity resolution when the rollup is read
    # back from a named table (e.g. a streaming memory sink)
    a = daily.select(
        *[F.col(gc) for gc in group_cols],
        F.col(period_col).alias("period_a"),
        F.col(sketch_col).alias("__sk_a"))
    b = daily.select(
        *[F.col(gc).alias(f"__b_{gc}") for gc in group_cols],
        F.col(period_col).alias("period_b"),
        F.col(sketch_col).alias("__sk_b"))
    cond = (F.col("period_a") + lag) == F.col("period_b")
    for gc in group_cols:
        cond = cond & (F.col(gc) == F.col(f"__b_{gc}"))
    sa, sb = F.col("__sk_a"), F.col("__sk_b")
    return (a.join(b, cond)
            .select(*group_cols, "period_a", "period_b",
                    F.theta_sketch_estimate(sa).alias("n_a"),
                    F.theta_sketch_estimate(sb).alias("n_b"),
                    F.theta_sketch_estimate(
                        F.theta_intersection(sa, sb)).alias("retained"),
                    F.theta_sketch_estimate(
                        F.theta_difference(sa, sb)).alias("churned"),
                    F.theta_sketch_estimate(
                        F.theta_difference(sb, sa)).alias("fresh")))
