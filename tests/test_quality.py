"""DQ1 constraint audit + DQ2 skew profile (operators/quality.py)."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from profet_spark.operators import quality as Q


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        Row(id=1, name="Alpha", score=10.0, tag="a"),
        Row(id=2, name="Beta", score=250.0, tag="b"),      # score too high
        Row(id=3, name=None, score=50.0, tag="a"),         # null name
        Row(id=3, name="Gamma", score=-5.0, tag="z"),      # dup id, low score, bad tag
        Row(id=4, name="delta", score=None, tag="b"),      # lowercase, null score
        Row(id=None, name="Eps", score=30.0, tag="a"),     # null id
        Row(id=None, name="Zeta", score=30.0, tag="a"),    # second null id
    ]
    return spark.createDataFrame(rows)


def _report(df):
    return {r["constraint_name"]: r.asDict() for r in df.collect()}


def test_constraint_semantics(messy):
    rep = _report(Q.check_constraints(messy, [
        Q.not_null("name"),
        Q.in_range("score", 0, 100),
        Q.in_set("tag", ["a", "b"]),
        Q.matches("name", "^[A-Z]"),
        Q.unique("id"),
        Q.satisfies(F.col("score") > 0, "positive_score"),
    ]))
    assert all(r["rows"] == 7 for r in rep.values())
    assert rep["not_null(name)"]["violations"] == 1
    # nulls do NOT violate range/set/regex constraints
    assert rep["in_range(score,0,100)"]["violations"] == 2
    assert rep["in_set(tag)"]["violations"] == 1
    assert rep["matches(name,^[A-Z])"]["violations"] == 1  # 'delta'; null skipped
    # duplicates: id=3 twice and id=NULL twice -> 2 surplus rows
    # (all-NULL keys collide with each other: IS NOT DISTINCT FROM)
    assert rep["unique(id)"]["violations"] == 2
    # satisfies: NULL predicate counts as a violation (score=None) + the
    # two non-positive scores... score=-5 only; 250 is positive
    assert rep["satisfies(positive_score)"]["violations"] == 2
    assert rep["not_null(name)"]["passed"] is False
    clean = _report(Q.check_constraints(messy, [Q.in_range("score", -10, 300)]))
    assert clean["in_range(score,-10,300)"]["passed"] is True


def test_unique_multi_column_and_null_tuple(messy):
    rep = _report(Q.check_constraints(messy, [
        Q.unique("id", "tag"),
        Q.unique("score", "tag"),
    ]))
    # (3,'a') vs (3,'z') distinct; (NULL,'a') twice -> 1 surplus
    assert rep["unique(id,tag)"]["violations"] == 1
    # (30.0,'a') twice -> 1 surplus
    assert rep["unique(score,tag)"]["violations"] == 1


def test_constraint_validation(messy):
    with pytest.raises(ValueError, match="empty"):
        Q.check_constraints(messy, [])
    with pytest.raises(ValueError, match="duplicate"):
        Q.check_constraints(messy, [Q.not_null("id"), Q.not_null("id")])
    with pytest.raises(ValueError, match="not in the table"):
        Q.check_constraints(messy, [Q.not_null("nope")])
    with pytest.raises(ValueError, match="at least one"):
        Q.unique()


def test_audit_is_one_aggregate_pass(messy):
    """No unique constraint -> a single Aggregate pair (partial+final),
    no Expand, no join; the report explode runs on the 1-row result."""
    plan = Q.check_constraints(messy, [
        Q.not_null("id"), Q.in_range("score", 0, 100),
        Q.satisfies("score < 1000", "cap"),
    ])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "Join" not in plan
    # ONE unique plans as a fingerprint-keyed pre-aggregate (narrow md5
    # exchange, still no Expand); TWO force the documented Expand
    plan_1 = Q.check_constraints(messy, [
        Q.not_null("id"), Q.unique("id"),
    ])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan_1 and plan_1.count("Exchange") == 2
    plan_2 = Q.check_constraints(messy, [
        Q.unique("id"), Q.unique("tag"),
    ])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan_2


def test_audit_matches_duckdb(spark, sf_dir):
    from profet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    got = Q.check_constraints(ev, [
        Q.not_null("user_id"),
        Q.in_range("value", 0, 500),
        Q.unique("event_id"),
        Q.matches("event_type", "^[a-z_]+$"),
    ]).orderBy("idx").collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = con.execute("""
        WITH agg AS (
          SELECT COUNT(*) AS rows,
                 COUNT(*) FILTER (user_id IS NULL) AS v0,
                 COUNT(*) FILTER (value IS NOT NULL
                                  AND (value < 0 OR value > 500)) AS v1,
                 COUNT(*) - COUNT(DISTINCT md5(CASE WHEN event_id IS NULL
                     THEN 'n' ELSE 'v' || length(CAST(event_id AS VARCHAR))
                     || ':' || CAST(event_id AS VARCHAR) END)) AS v2,
                 COUNT(*) FILTER (event_type IS NOT NULL AND NOT
                     regexp_matches(event_type, '^[a-z_]+$')) AS v3
          FROM events)
        SELECT * FROM agg
    """).fetchone()
    rows, v = exp[0], exp[1:]
    assert len(got) == 4
    for i, r in enumerate(got):
        assert r["rows"] == rows
        assert r["violations"] == v[i], r["constraint_name"]
        assert r["passed"] is (v[i] == 0)


def test_skew_profile_exact(spark):
    rows = ([Row(k="hot", g=1)] * 70 + [Row(k="warm", g=2)] * 20
            + [Row(k="c1", g=3)] * 5 + [Row(k="c2", g=3)] * 5)
    df = spark.createDataFrame(rows)
    out = Q.skew_profile(df, "k", top_n=3, num_partitions=10).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert [r["k"] for r in out] == ["hot", "warm", "c1"]  # tie c1<c2
    assert [r["cnt"] for r in out] == [70, 20, 5]
    assert [r["share_bp"] for r in out] == [7000, 2000, 500]
    # avg partition load = 100/10 = 10 rows; hot needs ceil(70/10)=7 salts
    assert [r["salt"] for r in out] == [7, 2, 1]


def test_skew_profile_multi_key_and_topn_truncation(spark):
    rows = ([Row(a=1, b="x")] * 4 + [Row(a=1, b="y")] * 3
            + [Row(a=2, b="x")] * 2 + [Row(a=2, b="y")])
    out = Q.skew_profile(spark.createDataFrame(rows), ["a", "b"],
                         top_n=2, num_partitions=5).collect()
    assert len(out) == 2
    assert (out[0]["a"], out[0]["b"], out[0]["cnt"]) == (1, "x", 4)
    assert (out[1]["a"], out[1]["b"], out[1]["cnt"]) == (1, "y", 3)
    # ceil(4*5/10)=2, ceil(3*5/10)=2
    assert [r["salt"] for r in out] == [2, 2]


def test_skew_profile_plan_is_topn_not_global_sort(spark, sf_dir):
    from profet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = Q.skew_profile(ev, "user_id", top_n=10)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # totals side joins by broadcast; the key histogram never sorts fully
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    rows = prof.collect()
    assert len(rows) == 10 and rows[0]["cnt"] >= rows[-1]["cnt"]


def test_skew_profile_validation(spark):
    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="non-empty"):
        Q.skew_profile(df, [])
    with pytest.raises(ValueError, match=">= 1"):
        Q.skew_profile(df, "k", top_n=0)
    with pytest.raises(ValueError, match=">= 1"):
        Q.skew_profile(df, "k", num_partitions=0)
