"""FE tier: split-aware scaler and time-aware target encoding — numpy
ground truth, leakage semantics (strictly-prior frame, train-only fit),
loud guards, and the single-Exchange plan shape."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from profet_spark.operators.encoding import (apply_feature_scaler,
                                             fit_feature_scaler,
                                             time_aware_target_encode)
from profet_spark.plans.inspect import formatted_plan, is_python_free


def _fe_fixture(seed=23, n=500):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2025-06-01")
        + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
        "cat": rng.choice(["a", "b", "c", "rare"], n, p=[.5, .3, .19, .01]),
        "x": np.round(rng.normal(40.0, 12.0, n), 6),
        "y": np.round(rng.exponential(5.0, n), 6),
        "const": 7.5,
    })
    pdf.loc[rng.choice(n, 30, replace=False), "x"] = np.nan
    return pdf


# ---------------------------------------------------------------- FE1


def test_fit_feature_scaler_matches_numpy(spark):
    pdf = _fe_fixture()
    out = (fit_feature_scaler(spark.createDataFrame(pdf), ["x", "y", "const"])
           .toPandas().set_index("feature").sort_index())
    for c in ("x", "y", "const"):
        v = pdf[c].dropna()
        assert out.loc[c, "n"] == len(v)
        assert out.loc[c, "vmin"] == v.min()
        assert out.loc[c, "vmax"] == v.max()
        np.testing.assert_allclose(out.loc[c, "mean"], v.mean(), rtol=1e-12)
        np.testing.assert_allclose(out.loc[c, "std"], v.std(ddof=1),
                                   rtol=1e-9, atol=1e-12)
    # constant feature: std exactly 0 (not NULL — n >= 2)
    assert out.loc["const", "std"] == 0.0


def test_apply_feature_scaler_z_and_guards(spark):
    pdf = _fe_fixture()
    sdf = spark.createDataFrame(pdf)
    fit = fit_feature_scaler(sdf, ["x", "y", "const"])
    got = (apply_feature_scaler(sdf, fit, ["x", "y", "const"])
           .toPandas().sort_values("event_id").reset_index(drop=True))
    for c in ("x", "y"):
        v = pdf[c]
        exp = (v - v.dropna().mean()) / v.dropna().std(ddof=1)
        np.testing.assert_allclose(got[f"{c}_z"].to_numpy(float),
                                   exp.to_numpy(float), rtol=1e-9,
                                   atol=1e-12)
    # zero-std feature scores are NULL, loudly undefined — never 0.0
    assert got["const_z"].isna().all()
    # missing feature in the scaler table raises IN THE PLAN (not a
    # silent null) even though the z column derivation is lazy
    bad = apply_feature_scaler(sdf, fit.where(F.col("feature") != "y"),
                               ["x", "y"])
    with pytest.raises(Exception, match="missing from the scaler"):
        bad.collect()
    with pytest.raises(ValueError, match="already exists"):
        apply_feature_scaler(sdf.withColumn("x_z", F.lit(0.0)), fit, ["x"])
    with pytest.raises(ValueError, match="explicitly"):
        apply_feature_scaler(sdf, fit, [])
    with pytest.raises(ValueError, match="not in the input"):
        fit_feature_scaler(sdf, ["nope"])


def test_split_scaler_composition_is_leakage_safe(spark):
    """Fit on train only: stats must ignore val/purged rows entirely."""
    pdf = _fe_fixture(seed=5)
    pdf["cv_role"] = np.where(pdf.event_id % 3 == 0, "val", "train")
    # plant an extreme outlier in the val slice — a leaky fit would shift
    sdf = spark.createDataFrame(pdf)
    pdf_out = pdf.copy()
    pdf_out.loc[pdf_out.cv_role == "val", "y"] = 1e6
    leaky = spark.createDataFrame(pdf_out)
    clean_fit = fit_feature_scaler(
        leaky.where(F.col("cv_role") == "train"), ["y"]).toPandas()
    train_y = pdf_out[pdf_out.cv_role == "train"].y
    np.testing.assert_allclose(clean_fit["mean"][0], train_y.mean(),
                               rtol=1e-12)
    assert clean_fit["vmax"][0] < 1e6


def test_scaler_plan_shapes(spark):
    pdf = _fe_fixture()
    sdf = spark.createDataFrame(pdf)
    fit = fit_feature_scaler(sdf, ["x", "y"])
    assert is_python_free(fit)
    applied = apply_feature_scaler(sdf, fit, ["x", "y"])
    assert is_python_free(applied)
    # the scaler rides broadcast; the applied side is a pure projection
    assert "BroadcastNestedLoopJoin" in formatted_plan(applied)


# ---------------------------------------------------------------- FE2


def _np_target_encode(pdf, m=0.0, prior=0.0):
    """event_id -> strictly-prior smoothed category mean (brute force)."""
    srt = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    out = {}
    for cat, g in srt.groupby("cat", sort=False):
        s = cnt = 0
        for _, row in g.iterrows():
            denom = cnt + m
            out[row.event_id] = ((s + m * prior) / denom) if denom > 0 \
                else np.nan
            if not np.isnan(row.x):
                s += row.x
                cnt += 1
    return out


@pytest.mark.parametrize("m,prior", [(0.0, 0.0), (12.0, 41.5)])
def test_target_encode_matches_brute_force(spark, m, prior):
    pdf = _fe_fixture(seed=17, n=300)
    out = time_aware_target_encode(
        spark.createDataFrame(pdf), "cat", "x", ts="ts",
        tiebreak=["event_id"], smoothing=m, prior=prior,
        out_col="te").toPandas().sort_values("event_id")
    exp = out.event_id.map(_np_target_encode(pdf, m, prior))
    np.testing.assert_allclose(out.te.to_numpy(float), exp.to_numpy(float),
                               rtol=1e-9, atol=1e-12, equal_nan=True)


def test_target_encode_never_sees_self_or_future(spark):
    """First occurrence of each category has no history → NULL (m=0);
    a row's encoding is unchanged when all LATER labels are perturbed."""
    pdf = _fe_fixture(seed=29, n=200)
    sdf = spark.createDataFrame(pdf)
    te = time_aware_target_encode(sdf, "cat", "x", tiebreak=["event_id"],
                                  out_col="te").toPandas()
    firsts = (pdf.sort_values(["ts", "event_id"]).groupby("cat")
              .head(1).event_id)
    assert te[te.event_id.isin(firsts)].te.isna().all()
    # perturb the future: encodings at or before the split must not move
    split = pdf.ts.quantile(0.5)
    pert = pdf.copy()
    pert.loc[pert.ts > split, "x"] = 9e5
    te2 = time_aware_target_encode(spark.createDataFrame(pert), "cat", "x",
                                   tiebreak=["event_id"],
                                   out_col="te").toPandas()
    early = pdf[pdf.ts <= split].event_id
    a = te.set_index("event_id").loc[early, "te"].to_numpy(float)
    b = te2.set_index("event_id").loc[early, "te"].to_numpy(float)
    np.testing.assert_array_equal(a, b)


def test_target_encode_strict_ts_excludes_same_instant(spark):
    """strict_ts=True: a row must never see labels at its OWN timestamp,
    regardless of tiebreak order — the range frame over exact int64
    microseconds, vs the default rows frame which includes earlier-
    tiebreak same-ts rows."""
    pdf = _fe_fixture(seed=37, n=400)
    # force heavy ts collisions: round to 6-hour buckets
    pdf["ts"] = pdf.ts.dt.floor("6h")
    sdf = spark.createDataFrame(pdf)
    got = time_aware_target_encode(
        sdf, "cat", "x", ts="ts", smoothing=3.0, prior=10.0,
        strict_ts=True, out_col="te").toPandas().sort_values("event_id")
    # brute force: strictly earlier in TIME only
    exp = []
    for _, row in pdf.sort_values("event_id").iterrows():
        prior_rows = pdf[(pdf.cat == row["cat"])
                         & (pdf.ts < row["ts"])].x.dropna()
        exp.append((prior_rows.sum() + 3.0 * 10.0)
                   / (len(prior_rows) + 3.0))
    np.testing.assert_allclose(got.te.to_numpy(float), np.array(exp),
                               rtol=1e-9, atol=1e-12, equal_nan=True)
    # and it genuinely differs from the rows-frame default here
    dflt = time_aware_target_encode(
        sdf, "cat", "x", ts="ts", tiebreak=["event_id"], smoothing=3.0,
        prior=10.0, out_col="te").toPandas().sort_values("event_id")
    assert not np.allclose(got.te.to_numpy(float), dflt.te.to_numpy(float),
                           equal_nan=True)
    # the scratch microsecond column never leaks into the output
    assert not [c for c in got.columns if c.startswith("__te_us")]


def test_target_encode_plan_and_validation(spark):
    pdf = _fe_fixture(seed=31, n=100)
    sdf = spark.createDataFrame(pdf)
    te = time_aware_target_encode(sdf, "cat", "x", tiebreak=["event_id"])
    assert is_python_free(te)
    plan = te._jdf.queryExecution().executedPlan().toString()
    # one Exchange (category key), count+sum share one Window node
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan
    with pytest.raises(ValueError, match="smoothing"):
        time_aware_target_encode(sdf, "cat", "x", smoothing=-1.0)
    with pytest.raises(ValueError, match="exists"):
        time_aware_target_encode(sdf.withColumn("cat_te", F.lit(0.0)),
                                 "cat", "x")


def test_apply_scaler_empty_scaler_raises(spark):
    """A fully-empty scaler table must hit the loud in-plan guard — the
    global pivot aggregate yields one all-NULL row, which must read as
    'feature missing', never as silent NULL z-scores."""
    pdf = _fe_fixture(seed=3, n=50)
    sdf = spark.createDataFrame(pdf)
    empty = fit_feature_scaler(sdf, ["x"]).where(F.lit(False))
    with pytest.raises(Exception, match="missing from the scaler"):
        apply_feature_scaler(sdf, empty, ["x"]).collect()
