"""A16 sketch rollups: exact-regime parity, merge algebra, error bounds."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from profet_spark.operators import sketches

EV = "/root/testdata/sf0.001/events.parquet"
DAY = ("CAST((unix_micros(CAST(ts AS TIMESTAMP)) "
       "- pmod(unix_micros(CAST(ts AS TIMESTAMP)), 86400000000))"
       " div 86400000000 AS BIGINT)")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EV).withColumn("day", F.expr(DAY))


def test_distinct_rollup_exact_in_sparse_regime(events):
    out = sketches.distinct_rollup(events, ["day"], "user_id")
    exact = events.groupBy("day").agg(
        F.countDistinct("user_id").alias("exact"))
    bad = (out.join(exact, "day")
           .where(F.col("n_distinct_est") != F.col("exact")).count())
    assert bad == 0 and out.count() == exact.count()


def test_merge_rollup_equals_direct_in_sparse_regime(events):
    daily = sketches.distinct_rollup(events, ["day"], "user_id")
    merged = sketches.merge_distinct_rollup(daily, [])
    direct = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert merged.collect()[0]["n_distinct_est"] == direct


def test_merge_rollup_idempotent_union(events):
    # unioning the same day twice must not change the estimate
    daily = sketches.distinct_rollup(events, ["day"], "user_id")
    doubled = daily.unionByName(daily)
    m1 = sketches.merge_distinct_rollup(daily, []).collect()[0]
    m2 = sketches.merge_distinct_rollup(doubled, []).collect()[0]
    assert m1["n_distinct_est"] == m2["n_distinct_est"]


def test_distinct_rollup_error_bound_beyond_sparse(spark):
    # 200k distinct values at lgk=12 is deep in dense/estimation mode:
    # the estimate must stay inside the published HLL error envelope
    # (~1.04/sqrt(2^lgk) ~ 1.6% at 1 sigma; assert 5 sigma)
    n = 200_000
    df = spark.range(n).select((F.col("id") * 2654435761 % 1000000007)
                               .alias("v"))
    est = sketches.distinct_rollup(df, [], "v", lgk=12).collect()[0]
    rel = abs(est["n_distinct_est"] - n) / n
    assert rel < 5 * 1.04 / math.sqrt(2 ** 12)


def test_quantile_rollup_matches_disc_convention(events):
    # exact-storage regime (every user holds far fewer than k rows):
    # get_quantile == the value at 1-based rank ceil(q*n) — DuckDB's
    # quantile_disc convention (probed on tiny frames, pinned here)
    out = (sketches.quantile_rollup(events, ["user_id"], "value",
                                    qs=(0.5, 0.9)).toPandas()
           .set_index("user_id"))
    pdf = events.select("user_id", "value").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        vs = sorted(grp["value"])
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            want = vs[max(1, math.ceil(q * len(vs))) - 1]
            assert out.loc[uid, col] == want, (uid, q)


def test_sketch_rollup_validation(events):
    with pytest.raises(ValueError, match="lgk"):
        sketches.distinct_rollup(events, ["day"], "user_id", lgk=3)
    with pytest.raises(ValueError, match="non-empty"):
        sketches.quantile_rollup(events, ["user_id"], "value", qs=())
    with pytest.raises(ValueError, match="outside"):
        sketches.quantile_rollup(events, ["user_id"], "value", qs=(1.5,))


def test_rollup_plans_are_partial_agg_python_free(events):
    from profet_spark.plans.inspect import formatted_plan, is_python_free
    daily = sketches.distinct_rollup(events, ["day"], "user_id")
    plan = formatted_plan(daily)
    # map-side partial sketch before the exchange: the shuffle carries
    # sketch bytes, never raw values
    assert "partial_hll_sketch_agg" in plan and is_python_free(daily)
    q = sketches.quantile_rollup(events, ["user_id"], "value")
    assert "partial_kll_sketch_agg" in formatted_plan(q)
    assert is_python_free(q)


# ----------------------------------------------------------- A17 theta


def test_theta_rollup_exact_in_exact_mode(events):
    out = sketches.theta_rollup(events, ["day"], "user_id")
    exact = events.groupBy("day").agg(
        F.countDistinct("user_id").alias("exact"))
    bad = (out.join(exact, "day")
           .where(F.col("n_distinct_est") != F.col("exact")).count())
    assert bad == 0 and out.count() == exact.count()


def test_merge_theta_rollup_equals_direct(events):
    daily = sketches.theta_rollup(events, ["day"], "user_id")
    merged = sketches.merge_theta_rollup(daily, [])
    direct = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert merged.collect()[0]["n_distinct_est"] == direct
    # idempotent: the same day twice changes nothing
    m2 = sketches.merge_theta_rollup(daily.unionByName(daily), [])
    assert m2.collect()[0]["n_distinct_est"] == direct


def test_retention_rollup_exact_vs_recompute(events):
    """Exact-mode retained/churned/fresh equal the brute-force
    day-pair set algebra over the base table."""
    daily = sketches.theta_rollup(events, ["day"], "user_id")
    got = (sketches.retention_rollup(daily, "day").toPandas()
           .sort_values("period_a").reset_index(drop=True))
    users = events.select("day", "user_id").distinct().toPandas()
    byday = users.groupby("day")["user_id"].agg(set).to_dict()
    for _, r in got.iterrows():
        a, b = byday[r.period_a], byday[r.period_b]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.retained == len(a & b)
        assert r.churned == len(a - b)
        assert r.fresh == len(b - a)
    # every consecutive present day pair appears
    days = sorted(byday)
    expect_pairs = sum(1 for d in days if d + 1 in byday)
    assert len(got) == expect_pairs


def test_retention_rollup_grouped(events):
    """group_cols: pairs join within each event_type group only."""
    daily = sketches.theta_rollup(events, ["event_type", "day"], "user_id")
    got = sketches.retention_rollup(daily, "day",
                                    group_cols=["event_type"]).toPandas()
    users = events.select("event_type", "day", "user_id").distinct().toPandas()
    byg = users.groupby(["event_type", "day"])["user_id"].agg(set).to_dict()
    assert len(got) > 0
    for _, r in got.iterrows():
        a = byg[(r.event_type, r.period_a)]
        b = byg[(r.event_type, r.period_b)]
        assert r.retained == len(a & b) and r.churned == len(a - b)


def test_theta_error_bound_beyond_exact_mode(spark):
    """Past 2^lgk nominal entries the estimate is approximate: pin a
    5-sigma relative-error envelope (rse ~ 1/sqrt(2^lgk))."""
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = (sketches.theta_rollup(df.withColumn("g", F.lit(1)), ["g"], "v",
                                 lgk=12)
           .collect()[0]["n_distinct_est"])
    rse = 1.0 / math.sqrt(2 ** 12)
    assert abs(est - n) / n < 5 * rse


def test_theta_rollup_validation(events):
    with pytest.raises(ValueError, match="lgk"):
        sketches.theta_rollup(events, ["day"], "user_id", lgk=30)


def test_theta_plans_are_partial_agg_python_free(events):
    daily = sketches.theta_rollup(events, ["day"], "user_id")
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert "ThetaSketchAgg" in plan or "theta" in plan.lower()
    assert "Python" not in plan  # all JVM-side
    ret = sketches.retention_rollup(daily, "day")
    rplan = ret._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in rplan


def test_merge_theta_rollup_respects_lgk(events):
    """Merging lgk=15 sketches at lgk=15 stays exact (the default-12
    union bound would silently downsample larger-lgk inputs — the merge
    must be told the build's lgk)."""
    daily = sketches.theta_rollup(events, ["day"], "user_id", lgk=15)
    merged = sketches.merge_theta_rollup(daily, [], lgk=15)
    direct = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert merged.collect()[0]["n_distinct_est"] == direct
    with pytest.raises(ValueError, match="lgk"):
        sketches.merge_theta_rollup(daily, [], lgk=30)


def test_retention_rollup_property_random_sets(spark):
    """Hypothesis-style randomized check (seeded loop — the session
    fixture makes @given awkward for Spark DataFrames at this size):
    random (day, user) multisets with gaps must reproduce Python set
    algebra exactly in the theta exact regime."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        days = sorted(rng.sample(range(100), rng.randint(3, 8)))
        rows = [(d, rng.randint(0, 40))
                for d in days for _ in range(rng.randint(1, 30))]
        df = spark.createDataFrame(rows, ["day", "user_id"])
        daily = sketches.theta_rollup(df, ["day"], "user_id")
        got = sketches.retention_rollup(daily, "day").toPandas()
        byday = {}
        for d, u in rows:
            byday.setdefault(d, set()).add(u)
        expect = {(d, d + 1) for d in byday if d + 1 in byday}
        assert {(r.period_a, r.period_b)
                for _, r in got.iterrows()} == expect
        for _, r in got.iterrows():
            a, b = byday[r.period_a], byday[r.period_b]
            assert (r.retained, r.churned, r.fresh) == (
                len(a & b), len(a - b), len(b - a))
