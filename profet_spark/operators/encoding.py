"""Leakage-safe feature encoding & scaling (the FE tier).

The reference normalizes its feature matrix globally after extraction
(scikit-style fit over the whole matrix — SURVEY.md §1.1 "Feature
matrix"; ``[R] ProFET/feat_extract/pipeline.py ≈L40-90`` feeds the
matrix straight into sklearn scalers). That is leakage at this engine's
north rule: statistics fitted on validation/future rows contaminate
training features. The FE tier re-expresses the two workhorse encoders
point-in-time / split-aware:

- :func:`fit_feature_scaler` / :func:`apply_feature_scaler` — fit
  standardization statistics on an explicitly designated slice (in
  practice the ``cv_role = 'train'`` rows of
  :func:`~profet_spark.operators.feature_matrix.purged_cv_roles`) and
  apply them everywhere — the split-aware scaler.
- :func:`time_aware_target_encode` — the expanding strictly-prior
  category mean of a label: each row is encoded using ONLY labels that
  matured strictly before its timestamp (the classic leakage-free target
  encoder for high-cardinality categoricals).

Engine-portability contract (the repo convention, see w8_expanding):
sums run over an exact ``decimal(18,6)`` projection — order-insensitive
and bitwise-reproducible in both Spark and DuckDB — and every float is
derived from those exact aggregates by mirrored IEEE expression text
(one cast, one division chain, correctly-rounded ``sqrt``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(18,6)"


def fit_feature_scaler(
    df: DataFrame,
    features: list[str],
) -> DataFrame:
    """FE1a: standardization statistics, one row per feature:

    ``(feature, n, mean, std, vmin, vmax)``

    - ``n``: non-null count (exact int64);
    - ``mean``: exact decimal sum cast once to double, divided by ``n``;
    - ``std``: sample standard deviation derived from the exact decimal
      sum/sum-of-squares — ``sqrt((sumsq - sum*mean)/(n-1))``, NULL for
      ``n < 2`` and clamped at 0 against negative rounding residue.
      IEEE ``sqrt`` is correctly rounded, so the result is
      engine-portable bit-for-bit;
    - ``vmin``/``vmax``: exact value copies.

    Fit it on the TRAIN slice only (``df.where(cv_role == 'train')``) —
    fitting on everything is exactly the leakage this engine exists to
    prevent. Values are summed on an exact ``decimal(18,6)`` projection:
    |value| must stay < 10^12 and sub-microunit precision is rounded at
    the cast (the documented fixed-point contract); the decimal(38,12)
    sum-of-squares budget holds to ~10^14 rows per feature.

    Plan: ONE narrow explode projection → ONE hash aggregate with
    map-side partials; output is |features| rows, shuffle bytes are
    O(features × partitions) at any input size.
    """
    if not features:
        raise ValueError("fit_feature_scaler: no features given")
    missing = [c for c in features if c not in df.columns]
    if missing:
        raise ValueError(f"fit_feature_scaler: {missing} not in the input")
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("feature"),
                 F.col(c).cast("double").alias("v"))
        for c in sorted(features)
    ])).alias("p")
    base = (df.select(pairs)
            .select("p.feature", "p.v",
                    F.col("p.v").cast(_DEC).alias("vd"))
            .where(F.col("v").isNotNull()))
    agg = base.groupBy("feature").agg(
        F.count("v").alias("n"),
        F.sum("vd").cast("double").alias("_s"),
        F.sum(F.col("vd") * F.col("vd")).cast("double").alias("_ss"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("_s") / nd
    var = (F.col("_ss") - F.col("_s") * mean) / (nd - F.lit(1.0))
    std = F.when(F.col("n") >= 2,
                 F.sqrt(F.greatest(var, F.lit(0.0))))
    return agg.select("feature", "n", mean.alias("mean"), std.alias("std"),
                      "vmin", "vmax")


def apply_feature_scaler(
    df: DataFrame,
    scaler: DataFrame,
    features: list[str] | None = None,
    suffix: str = "_z",
) -> DataFrame:
    """FE1b: attach z-scores ``(v - mean) / std`` using a fitted scaler.

    ``scaler`` is :func:`fit_feature_scaler` output (or any
    ``(feature, mean, std)`` table). Rows whose feature had ``std`` NULL
    or 0 (constant or <2-row fit) get NULL — an undefined score is a
    loud NULL, not a silent 0. Features absent from the scaler raise.

    Plan: the scaler is pivoted to ONE row (|features| is bounded by the
    schema, not the data) and attached via ``crossJoin(broadcast(...))``
    — a pure stateless projection afterwards: no input shuffle, no
    driver collect, stream-safe on the applied side.
    """
    if not features:
        raise ValueError(
            "apply_feature_scaler: pass the features list explicitly")
    missing = [c for c in features if c not in df.columns]
    if missing:
        raise ValueError(f"apply_feature_scaler: {missing} not in the input")
    for c in features:
        if f"{c}{suffix}" in df.columns:
            raise ValueError(
                f"apply_feature_scaler: {c}{suffix} already exists")
    one = scaler.groupBy().agg(*[
        f
        for c in features
        for f in (
            F.first(F.when(F.col("feature") == c, F.col("mean")),
                    ignorenulls=True).alias(f"__m_{c}"),
            F.first(F.when(F.col("feature") == c, F.col("std")),
                    ignorenulls=True).alias(f"__sd_{c}"),
            # coalesce: a global agg over an EMPTY scaler yields one row
            # of NULLs — the guard must read 0, not slip through as NULL
            F.coalesce(
                F.max(F.when(F.col("feature") == c, F.lit(1)).otherwise(0)),
                F.lit(0)).alias(f"__has_{c}"),
        )
    ])
    out = df.crossJoin(F.broadcast(one))
    for c in features:
        # the missing-feature guard lives INSIDE the emitted column so
        # column pruning can never optimize it away
        z = F.when(F.col(f"__has_{c}") == 0,
                   F.raise_error(F.lit(
                       f"apply_feature_scaler: feature {c!r} missing from "
                       "the scaler table")).cast("double")) \
             .when(F.col(f"__sd_{c}") > 0,
                   (F.col(c).cast("double") - F.col(f"__m_{c}"))
                   / F.col(f"__sd_{c}"))
        out = out.withColumn(f"{c}{suffix}", z)
    drop = [f"__{p}_{c}" for c in features for p in ("m", "sd", "has")]
    return out.drop(*drop)


def time_aware_target_encode(
    df: DataFrame,
    category: str,
    label: str,
    ts: str = "ts",
    out_col: str | None = None,
    tiebreak: list[str] | None = None,
    smoothing: float = 0.0,
    prior: float = 0.0,
    strict_ts: bool = False,
) -> DataFrame:
    """FE2: time-aware target encoding — each row gets the mean label of
    its category computed over rows strictly prior in the ``(ts,
    *tiebreak)`` TOTAL ORDER (``orderBy(ts, *tiebreak)``, rows frame
    ``(unboundedPreceding, -1)``): the current row never sees its own
    label and never sees rows after it in that order.

    Note "strictly prior" is in the total order, not strictly earlier in
    TIME: with the default rows frame, a same-timestamp row earlier in
    tiebreak order IS included. When same-instant labels must never leak
    (e.g. the label matures exactly at ``ts``), pass ``strict_ts=True``:
    the frame becomes a range frame over exact int64 microseconds ending
    at ``-1µs``, so every row with ``ts' >= ts`` is excluded regardless
    of tiebreak (``tiebreak`` is then irrelevant and ignored).

    ``smoothing`` (m) shrinks low-history categories toward ``prior``
    (James–Stein style): ``(sum_prior + m*prior) / (n_prior + m)``. With
    ``m = 0`` a row with no history gets NULL. The prior must itself be
    leakage-safe — a constant or a statistic of the training slice only.

    Portability: label sums accumulate on the exact ``decimal(18,6)``
    projection; the encoding is one mirrored IEEE expression over (exact
    sum, exact count), so it hash-grades against DuckDB bit-for-bit.
    NULL labels contribute to neither sum nor count but still receive an
    encoding.

    Plan: ONE ``Exchange hashpartitioning(category)`` + one
    within-partition sort, shared by both window aggregates (one
    WindowExec) — the same single-shuffle shape as the W3–W8 profile
    tier, keyed by category instead of entity. A heavy-hitter category
    sorts its rows in one partition; the sort is external-spill-safe,
    but at pathological skew pre-aggregate per (category, ts) first.
    """
    if smoothing < 0:
        raise ValueError("time_aware_target_encode: smoothing must be >= 0")
    out_col = out_col or f"{category}_te"
    if out_col in df.columns:
        raise ValueError(f"time_aware_target_encode: {out_col!r} exists")
    us_col = f"__te_us_{out_col}"
    if strict_ts and us_col in df.columns:
        # same loud contract as the out_col guard: never silently
        # overwrite-and-drop a user column that collides with scratch
        raise ValueError(
            f"time_aware_target_encode: column {us_col!r} collides with "
            "the strict_ts scratch column — rename it")
    if strict_ts:
        # exact int64 microsecond ordering key (NTZ-safe cast hop, same
        # convention as feature_matrix); range frame ending at -1µs
        # excludes ALL same-instant rows — strictly earlier in time
        df = df.withColumn(
            us_col, F.unix_micros(F.col(ts).cast("timestamp")))
        w = (Window.partitionBy(category).orderBy(us_col)
             .rangeBetween(Window.unboundedPreceding, -1))
    else:
        w = (Window.partitionBy(category).orderBy(ts, *(tiebreak or []))
             .rowsBetween(Window.unboundedPreceding, -1))
    ld = F.col(label).cast(_DEC)
    n_prev = F.count(ld).over(w)
    s_prev = F.coalesce(F.sum(ld).over(w).cast("double"), F.lit(0.0))
    m = float(smoothing)
    denom = n_prev.cast("double") + F.lit(m)
    enc = F.when(denom > 0,
                 (s_prev + F.lit(m) * F.lit(float(prior))) / denom)
    out = df.withColumn(out_col, enc)
    return out.drop(us_col) if strict_ts else out
