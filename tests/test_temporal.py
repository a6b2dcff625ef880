"""Temporal window operators vs a DuckDB SQL oracle over the driver's
`events` table (FIXTURES.md §B)."""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from profet_spark.operators import temporal
from profet_spark.sources import load_table

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _duck(sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')")
    return con.execute(sql).df()


def _cmp(spark_pdf, duck_pdf, keys):
    a = spark_pdf.sort_values(keys).reset_index(drop=True)
    b = duck_pdf.sort_values(keys).reset_index(drop=True)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)


def test_lag_lead(events):
    got = (
        temporal.with_lag_lead(events.select("user_id", "ts", "event_id", "value"),
                               ["value"], entity="user_id", lead=True,
                               tiebreak=["event_id"])
        .toPandas()
    )
    want = _duck("""
        SELECT user_id, ts, event_id, value,
               lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag1,
               lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lead1
        FROM events
    """)
    _cmp(got, want[got.columns.tolist()], ["user_id", "ts", "event_id"])


def test_ffill(events):
    base = events.select("user_id", "ts", "event_id",
                         F.when(F.col("value") > 0, F.col("value")).alias("v"))
    got = temporal.ffill(base, ["v"], entity="user_id", tiebreak=["event_id"]).toPandas()
    want = _duck("""
        SELECT user_id, ts, event_id,
               CASE WHEN value > 0 THEN value END AS v,
               last_value(CASE WHEN value > 0 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        FROM events
    """)
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_sessionize(events):
    got = temporal.sessionize(
        events.select("user_id", "ts", "event_id"), gap_seconds=3600, entity="user_id", tiebreak=["event_id"]
    ).toPandas()
    want = _duck("""
        SELECT user_id, ts, event_id,
               sum(CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 3600 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
        FROM (SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
    """)
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_expanding_stats(events):
    got = temporal.expanding_stats(
        events.select("user_id", "ts", "event_id", "value"), "value", entity="user_id", tiebreak=["event_id"],
        stats=("mean", "min", "max", "count"),
    ).toPandas()
    want = _duck("""
        SELECT user_id, ts, event_id, value,
               avg(value)   OVER w AS value_mean_cum,
               min(value)   OVER w AS value_min_cum,
               max(value)   OVER w AS value_max_cum,
               count(value) OVER w AS value_count_cum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """)
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_tumbling(events):
    got = temporal.tumbling_window(
        events, "1 hour",
        [F.count("*").alias("n"), F.sum("value").alias("sv")],
        entity="user_id",
    ).select("user_id", "win_start", "n", "sv").toPandas()
    want = _duck("""
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS win_start,
               count(*) AS n, sum(value) AS sv
        FROM events GROUP BY 1, 2
    """)
    _cmp(got, want, ["user_id", "win_start"])


def test_latest_snapshot(events):
    got = temporal.latest_snapshot(
        events.select("user_id", "ts", "event_id"), entity="user_id", k=2,
        tiebreak=["event_id"],
    ).toPandas()
    want = _duck("""
        SELECT * FROM (
          SELECT user_id, ts, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                   AS snapshot_rank
          FROM events) WHERE snapshot_rank <= 2
    """)
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_resample_to_grid(events):
    got = temporal.resample_to_grid(
        events.select("user_id", "ts", "value"), ["value"],
        entity="user_id", every_seconds=21600,
    ).toPandas()
    want = _duck("""
        WITH span AS (
          SELECT user_id,
                 CAST(floor(epoch(min(ts)) / 21600) * 21600 AS BIGINT) AS s,
                 CAST(floor(epoch(max(ts))) AS BIGINT) AS e
          FROM events GROUP BY 1),
        grid AS (
          SELECT user_id, TIMESTAMP '1970-01-01' + to_seconds(g) AS ts
          FROM (SELECT user_id, unnest(generate_series(s, e, 21600)) AS g
                FROM span)),
        vals AS (SELECT user_id, ts, max(value) AS value
                 FROM events GROUP BY 1, 2)
        SELECT g.user_id, g.ts, v.value FROM grid g
        ASOF LEFT JOIN vals v ON g.user_id = v.user_id AND g.ts >= v.ts
    """)
    _cmp(got, want, ["user_id", "ts"])


def test_resample_grid_cap_raises(events):
    import pyspark.errors

    df = events.select("user_id", "ts", "value")
    with pytest.raises(pyspark.errors.PySparkException):
        temporal.resample_to_grid(
            df, ["value"], entity="user_id", every_seconds=1,
            max_points_per_entity=10,
        ).collect()
    with pytest.raises(ValueError):
        temporal.resample_to_grid(df, ["value"], entity="user_id",
                                  every_seconds=0)


@pytest.mark.parametrize("q,n", [(0.5, 8), (0.25, 5), (1.0, 3)])
def test_rolling_quantile_matches_quantile_disc(events, q, n):
    got = temporal.rolling_quantile(
        events.select("user_id", "ts", "event_id", "value"), "value",
        q=q, n=n, entity="user_id", tiebreak=["event_id"], out_col="rq",
    ).toPandas()
    want = _duck(f"""
        SELECT user_id, ts, event_id, value,
               quantile_disc(value, {q}) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW) AS rq
        FROM events
    """)
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_rolling_quantile_nulls_and_validation(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2025, 1, 1, 0, 0, i), i,
             None if i % 2 else float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "e int, ts timestamp, k int, v double")
    out = temporal.rolling_quantile(df, "v", q=0.5, n=3, entity="e",
                                    tiebreak=["k"], out_col="m").toPandas()
    # window of the 2nd row (i=1) holds [0.0] (null dropped) -> 0.0;
    # an entity whose first row is null gets NULL (empty window)
    by_k = out.set_index("k")["m"]
    assert by_k[1] == 0.0
    first_null = spark.createDataFrame(
        [(2, dt.datetime(2025, 1, 1), 0, None)],
        "e int, ts timestamp, k int, v double")
    out2 = temporal.rolling_quantile(first_null, "v", q=0.5, n=3, entity="e",
                                     out_col="m").toPandas()
    assert pd.isna(out2["m"].iloc[0])
    with pytest.raises(ValueError):
        temporal.rolling_quantile(df, "v", q=0.0, n=3, entity="e")
    with pytest.raises(ValueError):
        temporal.rolling_quantile(df, "v", q=0.5, n=0, entity="e")


def test_hamming_drift(events):
    """Drift profile over a synthetic 64-bit phash stream derived from
    props — two's-complement int64s (bit 63 set on ~half the rows), so
    this also pins XOR/popcount parity on negative values."""
    from profet_spark.functions import hashing as H

    ph = ((H.h32("props") - F.lit(2**31)) * F.lit(2**32) + H.h32_hi("props"))
    base = events.select("user_id", "ts", "event_id", ph.alias("ph"))
    got = temporal.hamming_drift(base, "ph", entity="user_id",
                                 tiebreak=["event_id"], mean_window=4).toPandas()
    want = _duck(f"""
        WITH base AS (
          SELECT user_id, ts, event_id,
                 ({H.h32_sql_duckdb('props')} - 2147483648) * 4294967296
                   + {H.h32_hi_sql_duckdb('props')} AS ph
          FROM events),
        lagged AS (
          SELECT *, lag(ph) OVER w AS prev_ph
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        d AS (
          SELECT user_id, ts, event_id, ph,
                 CASE WHEN prev_ph IS NOT NULL
                      THEN CAST(bit_count(xor(ph, prev_ph)) AS BIGINT) END
                   AS ph_drift
          FROM lagged)
        SELECT user_id, ts, event_id, ph, ph_drift,
               CASE WHEN count(ph_drift) OVER wm > 0 THEN
                 CAST(sum(ph_drift) OVER wm AS DOUBLE)
                   / CAST(count(ph_drift) OVER wm AS DOUBLE) END
                 AS ph_drift_mean4,
               CAST(coalesce(sum(ph_drift) OVER wc, 0) AS BIGINT)
                 AS ph_drift_cum
        FROM d
        WINDOW wm AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
               wc AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """)
    assert (got["ph"] < 0).any(), "fixture must exercise bit-63-set phashes"
    _cmp(got, want, ["user_id", "ts", "event_id"])


def test_profile_ops_share_one_exchange(events):
    """W10+W11 on the same (entity, ts) ordering: every window frame reuses
    ONE hash Exchange — the shared-partitioning contract in the module
    docstring."""
    base = events.select("user_id", "ts", "event_id", "value",
                         (F.col("event_id") * 7).alias("ph"))
    out = temporal.rolling_quantile(base, "value", q=0.5, n=8,
                                    entity="user_id", tiebreak=["event_id"])
    out = temporal.hamming_drift(out, "ph", entity="user_id",
                                 tiebreak=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_hamming_drift_on_snapshot_fixture(spark):
    """W11 on the north-star table shape (FIXTURES.md: real phash:int64 per
    image snapshot, planted hot-phash cluster): numpy popcount cross-check
    plus the hot-cluster invariant (identical phash stream => zero drift
    after the first snapshot)."""
    import numpy as np

    from profet_spark import fixtures

    pdf = fixtures.make_fixture(n_entities=50, with_images=False)[
        ["image_id", "ts", "phash"]]
    df = spark.createDataFrame(pdf, "image_id string, ts timestamp, phash long")
    got = (temporal.hamming_drift(df, "phash", entity="image_id")
           .toPandas().sort_values(["image_id", "ts"]).reset_index(drop=True))

    want = pdf.sort_values(["image_id", "ts"]).reset_index(drop=True)
    # exact-int reference (pandas shift would route int64 phashes through
    # float64 and corrupt bits past 2^53)
    drift, last = [], {}
    for iid, ph in zip(want["image_id"], want["phash"]):
        ph = int(ph)
        drift.append(
            bin((ph ^ last[iid]) & ((1 << 64) - 1)).count("1")
            if iid in last else np.nan)
        last[iid] = ph
    drift = np.array(drift, dtype=float)
    np.testing.assert_array_equal(
        np.nan_to_num(got["phash_drift"].to_numpy(dtype=float), nan=-1),
        np.nan_to_num(drift, nan=-1))

    hot = got[got["image_id"] == "img00000000"]
    assert len(hot) > 2
    assert (hot["phash_drift"].dropna() == 0).all()
    assert (hot["phash_drift_cum"] == 0).all()


def test_decayed_stats(events):
    """W12 vs a Python recompute using the IDENTICAL left-fold: every float
    op is correctly-rounded IEEE in the same order, so equality is EXACT
    (no tolerance) — the same contract the DuckDB oracle row relies on."""
    n, decay = 4, 0.6
    got = (
        temporal.decayed_stats(
            events.select("user_id", "ts", "event_id", "value"),
            "value", n=n, decay=decay, entity="user_id",
            tiebreak=["event_id"])
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert got["value_dsum4"].notna().all()
    for _, g in got.groupby("user_id", sort=False):
        vals = g["value"].tolist()
        for i, (_, row) in enumerate(g.iterrows()):
            s, wt = 0.0, 0.0
            for k in range(n):
                j = i - k
                present = j >= 0 and not pd.isna(vals[j])
                s = s + (float(vals[j]) * decay ** k if present else 0.0)
                wt = wt + (decay ** k if present else 0.0)
            assert row["value_dsum4"] == s
            assert row["value_dwt4"] == wt
            if wt > 0.0:
                assert row["value_dmean4"] == s / wt
            else:
                assert pd.isna(row["value_dmean4"])


def test_decayed_stats_null_renormalization(spark):
    """Interior NULLs drop out of BOTH the sum and the normalizer (no bias
    toward 0); parameter validation raises."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0), ("a", 4, 40.0)],
        "e string, ts int, v double")
    got = (temporal.decayed_stats(df, "v", n=3, decay=0.5, entity="e")
           .toPandas().sort_values("ts").reset_index(drop=True))
    last = got.iloc[3]
    # at ts=4 with n=3: k=0 -> 40 (w=1), k=1 -> 30 (w=0.5), k=2 -> NULL
    assert last["v_dsum3"] == 40.0 + 30.0 * 0.5
    assert last["v_dwt3"] == 1.0 + 0.5
    assert last["v_dmean3"] == (40.0 + 30.0 * 0.5) / 1.5
    null_row = got.iloc[1]  # current value NULL, one present lag
    assert null_row["v_dsum3"] == 10.0 * 0.5
    assert null_row["v_dwt3"] == 0.5
    with pytest.raises(ValueError):
        temporal.decayed_stats(df, "v", n=0, entity="e")
    with pytest.raises(ValueError):
        temporal.decayed_stats(df, "v", decay=1.0, entity="e")


def test_decayed_stats_shares_the_profile_exchange(events):
    """Stacking W12 onto W10+W11 adds ZERO Exchanges — all three share the
    (entity, ts) window spec."""
    base = events.select("user_id", "ts", "event_id", "value",
                         (F.col("event_id") * 7).alias("ph"))
    out = temporal.rolling_quantile(base, "value", q=0.5, n=8,
                                    entity="user_id", tiebreak=["event_id"])
    out = temporal.hamming_drift(out, "ph", entity="user_id",
                                 tiebreak=["event_id"])
    out = temporal.decayed_stats(out, "value", n=8, decay=0.5,
                                 entity="user_id", tiebreak=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
