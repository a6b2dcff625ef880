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


# ------------------------------------------------------------------ DQ3


def _preflight_map(df):
    out = {"hot": {}}
    for r in df.collect():
        if r["part"] == "hot":
            out["hot"][r["key"]] = (r["i1"], r["i2"], r["i3"])
        else:
            out[r["part"]] = (r["i1"], r["i2"], r["i3"])
    return out


def test_join_preflight_exact_regime(spark):
    """Exact-regime ground truth: planted key distributions with a hot
    key shared by both sides, nulls excluded, disjoint tails."""
    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(50)]          # hot on left
        + [Row(k=2, v=i) for i in range(5)]
        + [Row(k=3, v=0), Row(k=None, v=0)])
    right = spark.createDataFrame(
        [Row(j=1, w=i) for i in range(20)]          # hot on right too
        + [Row(j=2, w=0)]
        + [Row(j=9, w=i) for i in range(4)]         # right-only key
        + [Row(j=None, w=0)])
    got = _preflight_map(Q.join_preflight(left, right, "k", "j", top_n=3))
    assert got["left"] == (56, 3, -1)       # rows, distinct keys
    assert got["right"] == (25, 3, -1)
    assert got["overlap"] == (2, 1, 1)      # matched {1,2}; {3}; {9}
    # both-sides-hot keys with exact output-row products
    assert got["hot"]["1"] == (50, 20, 1000)
    assert got["hot"]["2"] == (5, 1, 5)
    assert "3" not in got["hot"]            # left-only: never hot-joined
    assert "9" not in got["hot"]            # right-only: same


def test_join_preflight_vacuous_join_detected(spark):
    left = spark.range(100).select((F.col("id")).alias("k"))
    right = spark.range(100).select((F.col("id") + 1000).alias("k"))
    got = _preflight_map(Q.join_preflight(left, right, "k"))
    assert got["overlap"][0] == 0           # zero matched keys
    assert got["hot"] == {}                 # no doubly-hot keys either


def test_join_preflight_matches_duckdb(spark, sf_dir):
    """orders ⋈ customer on custkey at sf0.001 — the sketch tier's
    exact regime; DuckDB recomputes every part."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = _preflight_map(
        Q.join_preflight(orders, cust, "o_custkey", "c_custkey", top_n=5))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW o AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    con.execute(f"CREATE VIEW c AS SELECT * FROM "
                f"read_parquet('{sf_dir}/customer.parquet')")
    nl, ndl = con.execute(
        "SELECT COUNT(o_custkey), COUNT(DISTINCT o_custkey) FROM o"
    ).fetchone()
    nr, ndr = con.execute(
        "SELECT COUNT(c_custkey), COUNT(DISTINCT c_custkey) FROM c"
    ).fetchone()
    inter, lo, ro = con.execute("""
        SELECT
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM o
           INTERSECT SELECT DISTINCT c_custkey FROM c)),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM o
           EXCEPT SELECT DISTINCT c_custkey FROM c)),
          (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM c
           EXCEPT SELECT DISTINCT o_custkey FROM o))
    """).fetchone()
    assert got["left"] == (nl, ndl, -1)
    assert got["right"] == (nr, ndr, -1)
    assert got["overlap"] == (inter, lo, ro)
    for key, (cl, cr, prod) in got["hot"].items():
        want_l = con.execute(
            "SELECT COUNT(*) FROM o WHERE o_custkey = ?", [int(key)]
        ).fetchone()[0]
        want_r = con.execute(
            "SELECT COUNT(*) FROM c WHERE c_custkey = ?", [int(key)]
        ).fetchone()[0]
        assert (cl, cr, prod) == (want_l, want_r, want_l * want_r)


def test_join_preflight_sketch_tier_never_shuffles_keys(spark, sf_dir):
    """The sketch tier's exchanges carry 1-row sketch aggregates; only
    the hot tier's partial-agg key shuffle appears. Assert no
    key-grouped exchange feeds the overlap computation by checking the
    sides/overlap subplan alone is key-shuffle-free."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lk = orders.select(F.col("o_custkey").alias("k")).where(
        F.col("k").isNotNull())
    side = lk.agg(F.count(F.lit(1)).alias("n"),
                  F.theta_sketch_agg("k", F.lit(12)).alias("sk"))
    plan = side._jdf.queryExecution().executedPlan().toString()
    # a single-row final aggregate: partial map-side sketches, no
    # hashpartitioning on the key column
    assert "hashpartitioning(k" not in plan


def test_join_preflight_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="top_n"):
        Q.join_preflight(df, df, "k", top_n=0)
