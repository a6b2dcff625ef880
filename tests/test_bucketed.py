"""Bucketed co-located joins (sources/bucketed.py): the plan contracts —
exchange-free join and aggregation, bucket pruning at the scan."""

import pytest
from pyspark.sql import functions as F

from profet_spark.sources import bucketed as B
from profet_spark.sources import load_table


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    anchors = (ev.where(F.col("event_type").isNull() | F.lit(True))
               .groupBy("user_id").agg(F.max("value").alias("max_val")))
    B.write_bucketed(ev, "ev_bkt", key="user_id", n_buckets=8, sort_by="user_id")
    B.write_bucketed(anchors, "anchor_bkt", key="user_id", n_buckets=8)
    yield "ev_bkt", "anchor_bkt"
    spark.sql("DROP TABLE IF EXISTS ev_bkt")
    spark.sql("DROP TABLE IF EXISTS anchor_bkt")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tables, sf_dir):
    """Same key + same bucket count => SortMergeJoin with ZERO Exchange
    (the co-located join the feature store relies on); result equal to
    the plain-parquet join."""
    ev_t, an_t = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.read_bucketed(spark, ev_t).join(
            B.read_bucketed(spark, an_t), "user_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: equals the plain (shuffled) join
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value")
        an = ev.groupBy("user_id").agg(F.max("value").alias("max_val"))
        want = ev.join(an, "user_id")
        cols = ["event_id", "user_id", "max_val"]
        got_p = j.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
        want_p = want.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
        assert got_p.equals(want_p)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, tables):
    """Aggregation on the bucket key needs no shuffle: partial and final
    HashAggregate run in the same stage."""
    ev_t, _ = tables
    agg = B.read_bucketed(spark, ev_t).groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("sv"))
    plan = _plan(agg)
    assert "HashAggregate" in plan
    assert "Exchange" not in plan, plan


def test_bucket_pruning_on_key_filter(spark, tables):
    """An IN-filter on the bucket key prunes buckets at the scan — the
    file-level analog of partition pruning."""
    ev_t, _ = tables
    # Spark's autoBucketedScan turns bucketing OFF for plans that do not
    # need the hash distribution (plain filter scans) — which also skips
    # bucket pruning; disable it to exercise the pruning path
    old_conf = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = B.read_bucketed(spark, ev_t).where(F.col("user_id").isin(3, 5))
        plan = _plan(q)
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old_conf)
    assert "SelectedBucketsCount" in plan, plan
    # fewer than all 8 buckets survive
    import re
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan
