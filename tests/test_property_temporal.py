"""Hypothesis property tests for the temporal window operators
(SURVEY.md §5.2): on arbitrary small inputs — duplicate timestamps, nulls,
single-row entities — ffill, sessionize, expanding stats, and lag/lead
must equal an independent pandas reference."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from profet_spark.operators import temporal

_ts_pool = pd.date_range("2025-03-01", periods=30, freq="41min")


@hst.composite
def frame(draw):
    n = draw(hst.integers(1, 30))
    return pd.DataFrame({
        "user_id": [draw(hst.sampled_from(["a", "b"])) for _ in range(n)],
        "ts": [_ts_pool[draw(hst.integers(0, len(_ts_pool) - 1))] for _ in range(n)],
        "event_id": list(range(n)),
        "v": [draw(hst.one_of(hst.none(), hst.integers(-3, 3).map(float)))
              for _ in range(n)],
    })


def _sorted(pdf):
    return pdf.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort").reset_index(drop=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pdf=frame())
def test_ffill_bfill_property(spark, pdf):
    df = spark.createDataFrame(pdf, "user_id string, ts timestamp, event_id long, v double")
    got = _sorted(temporal.bfill(
        temporal.ffill(df, ["v"], entity="user_id", ts="ts", tiebreak=["event_id"]),
        ["v"], entity="user_id", ts="ts", tiebreak=["event_id"]).toPandas())
    want = _sorted(pdf)
    want["v"] = want["v"].astype("float64")
    grp = want.groupby("user_id", sort=False)["v"]
    want["v_ffill"] = grp.ffill()
    want["v_bfill"] = grp.bfill()
    for c in ("v_ffill", "v_bfill"):
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   want[c].to_numpy(dtype=float), equal_nan=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pdf=frame(), gap_minutes=hst.sampled_from([30, 60, 90]))
def test_sessionize_property(spark, pdf, gap_minutes):
    df = spark.createDataFrame(pdf, "user_id string, ts timestamp, event_id long, v double")
    got = _sorted(temporal.sessionize(
        df, gap_seconds=gap_minutes * 60, entity="user_id", ts="ts",
        tiebreak=["event_id"]).toPandas())
    want = _sorted(pdf)
    sess = []
    for _, g in want.groupby("user_id", sort=False):
        gaps = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sess.extend(gaps.cumsum().astype(int).tolist())
    want["session_id"] = sess
    assert got["session_id"].tolist() == want["session_id"].tolist()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pdf=frame())
def test_expanding_and_lag_property(spark, pdf):
    df = spark.createDataFrame(pdf, "user_id string, ts timestamp, event_id long, v double")
    out = temporal.expanding_stats(df, "v", entity="user_id", ts="ts",
                                   tiebreak=["event_id"], stats=("min", "max", "count"))
    out = temporal.with_lag_lead(out, ["v"], entity="user_id", ts="ts",
                                 lead=True, tiebreak=["event_id"])
    got = _sorted(out.toPandas())
    want = _sorted(pdf)
    want["v"] = want["v"].astype("float64")  # all-None columns arrive as object
    g = want.groupby("user_id", sort=False)["v"]
    want["v_min_cum"] = g.cummin()
    want["v_min_cum"] = want.groupby("user_id", sort=False)["v_min_cum"].ffill()
    want["v_max_cum"] = g.cummax()
    want["v_max_cum"] = want.groupby("user_id", sort=False)["v_max_cum"].ffill()
    want["v_count_cum"] = g.expanding().count().reset_index(level=0, drop=True).astype("int64")
    want["v_lag1"] = g.shift(1)
    want["v_lead1"] = g.shift(-1)
    for c in ("v_min_cum", "v_max_cum", "v_lag1", "v_lead1"):
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   want[c].to_numpy(dtype=float), equal_nan=True)
    assert got["v_count_cum"].tolist() == want["v_count_cum"].tolist()
