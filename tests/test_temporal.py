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
