"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Float-determinism policy: columns that COPY input doubles (lag/ffill/
as-of payloads) are emitted raw — both engines read the same parquet, so
they are bitwise identical. Columns that RE-AGGREGATE doubles are either
computed in DECIMAL (exact, order-insensitive) or rounded to 6 digits on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from profet_spark.operators import asof, temporal
from profet_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship point-in-time pipeline on sf0.001 (SURVEY.md §3.4):
    snapshot stream → as-of join of the purchase stream → forward-fill →
    gap sessionization → expanding leakage-safe stats."""
    ev = _events(spark, SF0001).select("event_id", "user_id", "ts", "event_type", "value")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purch_val"))
    )
    feat = asof.asof_join(
        ev, purchases, entity="user_id", ts="ts", strategy="sort_merge"
    )
    feat = temporal.ffill(feat, ["purch_val"], entity="user_id", ts="ts", tiebreak=["event_id"])
    feat = temporal.sessionize(feat, gap_seconds=3600, entity="user_id", ts="ts", tiebreak=["event_id"])
    feat = temporal.expanding_stats(
        feat, "value", entity="user_id", ts="ts", tiebreak=["event_id"],
        stats=("mean", "count", "max"),
    )
    return feat.select(
        "event_id", "user_id", "ts", "value", "purch_val", "purch_val_ffill",
        "session_id", F.round("value_mean_cum", 6).alias("value_mean_cum"),
        "value_count_cum", "value_max_cum",
    )


# ---------------------------------------------------------------- queries


def _q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = temporal.with_lag_lead(ev, ["value"], entity="user_id", ts="ts",
                                 lead=True, tiebreak=["event_id"])
    return out.select("user_id", "ts", "event_id", "value", "value_lag1", "value_lead1")


def _q_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    return temporal.ffill(ev, ["pv"], entity="user_id", ts="ts", tiebreak=["event_id"]).select(
        "user_id", "ts", "event_id", "pv", "pv_ffill"
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    return temporal.sessionize(ev, gap_seconds=3600, entity="user_id", ts="ts",
                               tiebreak=["event_id"])


def _q_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mean is derived from an exact DECIMAL cumulative sum (order-insensitive,
    # bitwise-reproducible) divided by the count — no float rounding games.
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "value",
        F.col("value").cast("decimal(18,2)").alias("vdec"),
    )
    out = temporal.expanding_stats(ev, "value", entity="user_id", ts="ts",
                                   tiebreak=["event_id"],
                                   stats=("min", "max", "count"))
    out = temporal.expanding_stats(out, "vdec", entity="user_id", ts="ts",
                                   tiebreak=["event_id"], stats=("sum",))
    return out.select(
        "user_id", "ts", "event_id", "value",
        (F.col("vdec_sum_cum").cast("double") / F.col("value_count_cum")).alias("mean_cum"),
        F.col("value_min_cum").alias("min_cum"),
        F.col("value_max_cum").alias("max_cum"),
        F.col("value_count_cum").alias("count_cum"),
    )


def _q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = temporal.tumbling_window(
        ev, "1 hour",
        [F.count("*").alias("n"),
         F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("sv")],
        entity="user_id", ts="ts",
    )
    return out.select("user_id", "win_start", "n", "sv")


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    return temporal.latest_snapshot(ev, entity="user_id", ts="ts", k=3,
                                    tiebreak=["event_id"])


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type", "value")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purch_val"))
    )
    out = asof.asof_join(ev, purchases, entity="user_id", ts="ts", strategy="sort_merge")
    return out.select("user_id", "ts", "event_id", "value", "purch_val")


def _q_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_quantity").alias("avg_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            ).alias("sum_disc_price"),
        )
        .select("l_returnflag", "l_linestatus", "count_order", "sum_qty",
                F.round("avg_qty", 6).alias("avg_qty"),
                F.col("sum_base").cast("string").alias("sum_base"),
                F.col("sum_disc_price").cast("string").alias("sum_disc_price"))
    )


def _q_bcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("total"))
    )


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    no_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(F.count("*").alias("n_custs"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w3_lag_lead": _q_lag_lead,
        "w4_ffill": _q_ffill,
        "w5_sessionize": _q_sessionize,
        "w8_expanding": _q_expanding,
        "w7_tumbling": _q_tumbling,
        "w6_topk_latest": _q_topk,
        "j3_asof_join": _q_asof,
        "a9_pricing_summary": _q_pricing,
        "j2_broadcast_join": _q_bcast_join,
        "j5_anti_join": _q_anti_join,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "w3_lag_lead": """
            SELECT user_id, ts, event_id, value,
                   lag(value)  OVER w AS value_lag1,
                   lead(value) OVER w AS value_lead1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "w4_ffill": """
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'purchase' THEN value END AS pv,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv_ffill
            FROM events
        """,
        "w5_sessionize": """
            SELECT user_id, ts, event_id,
                   sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '3600' SECOND
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
            FROM (SELECT user_id, ts, event_id,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                  FROM events)
        """,
        "w8_expanding": """
            SELECT user_id, ts, event_id, value,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / count(value) OVER w AS mean_cum,
                   min(value)   OVER w AS min_cum,
                   max(value)   OVER w AS max_cum,
                   count(value) OVER w AS count_cum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "w7_tumbling": """
            SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS win_start,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sv
            FROM events GROUP BY 1, 2
        """,
        "w6_topk_latest": """
            SELECT * FROM (
              SELECT user_id, ts, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                       AS snapshot_rank
              FROM events) t WHERE snapshot_rank <= 3
        """,
        "j3_asof_join": """
            WITH purchases AS (
              SELECT user_id, ts, max(value) AS purch_val
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
            )
            SELECT e.user_id, e.ts, e.event_id, e.value, p.purch_val
            FROM events e
            ASOF LEFT JOIN purchases p
              ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "a9_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS count_order,
                   sum(l_quantity) AS sum_qty,
                   round(avg(l_quantity), 6) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_base,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS VARCHAR) AS sum_disc_price
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "j2_broadcast_join": """
            SELECT n_name, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "j5_anti_join": """
            SELECT c_nationkey, count(*) AS n_custs
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
        """,
    }
