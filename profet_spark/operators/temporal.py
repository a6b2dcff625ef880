"""Temporal window algebra (SURVEY.md §2.5 W3-W8) — the layer ProFET lacks.

Every operator here is pure built-in ``pyspark.sql`` Window machinery:
JVM-side, whole-stage-codegen'd, one shuffle on the entity key which AQE
can coalesce. No Python executes per row.

Leakage discipline (BASELINE.json north_rule): operators that read the
future (``lead``, ``bfill``) are train-time-only conveniences and say so;
everything else is bounded at the current row (``rowsBetween(..., 0)`` or
``(..., -1)``) so a feature at ``(entity, t)`` can never observe rows with
``ts > t``. The zero-leakage property tests (tests/test_asof.py and
tests/test_pipeline.py) recompute on a truncated input and assert
bit-equality.

At 100 TB scale: all windows below share one partitioning
(``partitionBy(entity)``), so Catalyst plans a single Exchange reused by
every window node; per-entity row counts are small (snapshots per image),
so no per-partition memory hazard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(entity: str, ts: str, tiebreak: list[str] | None = None):
    """Entity window ordered by ts plus deterministic tiebreak columns
    (real snapshot streams can carry duplicate ts per entity)."""
    return Window.partitionBy(entity).orderBy(ts, *(tiebreak or []))


def with_lag_lead(
    df: DataFrame,
    cols: list[str],
    entity: str = "image_id",
    ts: str = "ts",
    offsets: tuple[int, ...] = (1,),
    lead: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W3: previous (and optionally next) snapshot values per entity.

    ``lead`` reads the future — train-time only, never in a serving path.
    """
    w = _w(entity, ts, tiebreak)
    out = df
    for c in cols:
        for n in offsets:
            out = out.withColumn(f"{c}_lag{n}", F.lag(c, n).over(w))
            if lead:
                out = out.withColumn(f"{c}_lead{n}", F.lead(c, n).over(w))
    return out


def ffill(
    df: DataFrame, cols: list[str], entity: str = "image_id", ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W4 forward-fill: last non-null value at or before each row. Leakage-free."""
    w = _w(entity, ts, tiebreak).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame, cols: list[str], entity: str = "image_id", ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W4 backward-fill: next non-null value. READS THE FUTURE — train-only."""
    w = _w(entity, ts, tiebreak).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_bfill", F.first(c, ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    entity: str = "image_id",
    ts: str = "ts",
    session_col: str = "session_id",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W5 gap-based sessionization: a new session starts where the gap to
    the previous snapshot exceeds ``gap_seconds``. session_id is the
    0-based running count of session starts per entity — expressible as a
    cumulative sum over a lag comparison, one window, no Python."""
    w = _w(entity, ts, tiebreak)
    prev = F.lag(F.col(ts)).over(w)
    # interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ inputs
    gap_exceeded = (F.col(ts) - prev) > F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND")
    is_new = F.when(prev.isNull() | gap_exceeded, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1),
    )


def expanding_stats(
    df: DataFrame,
    col: str,
    entity: str = "image_id",
    ts: str = "ts",
    strictly_prior: bool = False,
    stats: tuple[str, ...] = ("mean", "min", "max", "count", "sum"),
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W8 point-in-time cumulative stats — the leakage-safe normalizer.

    ``strictly_prior=True`` ends the frame at the previous row (value at t
    excludes row t itself), the convention for target-encoding-style
    features where the current observation must not see itself.
    """
    end = -1 if strictly_prior else 0
    w = _w(entity, ts, tiebreak).rowsBetween(Window.unboundedPreceding, end)
    fns = {
        "mean": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "sum": F.sum,
        "stddev": F.stddev_samp,
    }
    out = df
    sfx = "_prior" if strictly_prior else "_cum"
    for s in stats:
        out = out.withColumn(f"{col}_{s}{sfx}", fns[s](col).over(w))
    return out


def tumbling_window(
    df: DataFrame,
    duration: str,
    aggs: list[Column],
    entity: str = "image_id",
    ts: str = "ts",
) -> DataFrame:
    """W7 tumbling wall-clock buckets via built-in ``F.window`` + hash agg
    (map-side partial aggregation is free)."""
    return (
        df.groupBy(entity, F.window(ts, duration).alias("win"))
        .agg(*aggs)
        .withColumn("win_start", F.col("win.start"))
        .withColumn("win_end", F.col("win.end"))
        .drop("win")
    )


def sliding_time_window(
    df: DataFrame,
    duration: str,
    slide: str,
    aggs: list[Column],
    entity: str = "image_id",
    ts: str = "ts",
) -> DataFrame:
    """W7 sliding variant: each row lands in duration/slide buckets."""
    return (
        df.groupBy(entity, F.window(ts, duration, slide).alias("win"))
        .agg(*aggs)
        .withColumn("win_start", F.col("win.start"))
        .withColumn("win_end", F.col("win.end"))
        .drop("win")
    )


def latest_snapshot(
    df: DataFrame, entity: str = "image_id", ts: str = "ts", k: int = 1, tiebreak: list[str] | None = None
) -> DataFrame:
    """W6 top-k most recent snapshots per entity (k=1 = as-of-now dedup).

    ``tiebreak`` columns make row_number deterministic when ts collides.
    """
    order = [F.desc(ts)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(entity).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "snapshot_rank")
    )
