"""Source layer (SURVEY.md §2.1): table loading and the SQL surface."""

from profet_spark.sources import TABLES, load_table, register_views


def test_load_table_schema(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert {"event_id", "user_id", "ts", "event_type", "value"} <= set(ev.columns)


def test_register_views_sql_surface(spark, sf_dir):
    """After register_views the whole engine is reachable from spark.sql —
    the S1 scan + C-scalar + A-agg path in pure SQL."""
    register_views(spark, sf_dir, ("events", "orders", "customer"))
    out = spark.sql("""
        SELECT c.c_nationkey, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """)
    assert out.count() > 0
    ev = spark.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert ev == load_table(spark, sf_dir, "events").count()


def test_tables_constant_complete(spark, sf_dir):
    for t in TABLES:
        assert load_table(spark, sf_dir, t).limit(1).count() in (0, 1)
