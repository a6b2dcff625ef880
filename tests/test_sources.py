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


def test_estimate_row_count_footer_exact_and_guarded(spark, sf_dir):
    """Parquet-footer row counts (the Iceberg-manifest analog): exact on
    a bare scan — with ZERO Spark jobs — and refused (None) the moment
    the plan stops being cardinality-preserving."""
    from pyspark.sql import functions as F

    from profet_spark.sources.stats import estimate_row_count

    ev = load_table(spark, sf_dir, "events")
    exact = ev.count()
    before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    got = estimate_row_count(ev)
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    assert got == exact
    assert after == before, "footer count must not launch a Spark job"
    # column pruning keeps cardinality -> still footer-countable
    assert estimate_row_count(ev.select("event_id")) == exact
    # anything cardinality-changing refuses
    assert estimate_row_count(ev.where(F.col("value") > 50)) is None
    assert estimate_row_count(ev.groupBy("user_id").count()) is None
    assert estimate_row_count(ev.limit(10)) is None
    assert estimate_row_count(
        spark.createDataFrame([(1,)], "a bigint")) is None


def test_ivf_auto_centroids_uses_footer_stats(spark, sf_dir, monkeypatch):
    """ivf_ann(n_centroids='auto') on a parquet-backed corpus must derive
    sqrt(n) from file statistics, not a count() scan — and must actually
    hand that sqrt(n) to the centroid builder."""
    import math

    from profet_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    expected = max(1, int(math.isqrt(n)))
    # the row-count helper must resolve via footer stats: zero Spark jobs
    before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    got = sim._corpus_rows(emb)
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    assert got == n and after == before
    # capture what the auto path actually passes to the centroid builder
    seen = {}
    real_build = sim._build_centroids

    def spy(qdf, n_centroids, centroids, sample_size, kmeans_iter):
        seen["n_centroids"] = n_centroids
        seen["sample_size"] = sample_size
        return real_build(qdf, n_centroids, centroids, sample_size,
                          kmeans_iter)

    monkeypatch.setattr(sim, "_build_centroids", spy)
    out = sim.ivf_ann(emb, emb.limit(3), k=2, id_col="vec_id",
                      vec_col="embedding", n_centroids="auto")
    assert out.count() > 0
    assert seen["n_centroids"] == expected
    assert seen["sample_size"] >= 32 * expected


def test_table_stats_metadata_only(spark):
    from profet_spark.sources import load_table, stats

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    st = stats.table_stats(d)
    assert st["files"] >= 1
    assert st["rows"] == d.count()
    assert st["bytes"] and st["bytes"] > 0
    # filtered plan: footer row count invalid -> None, bytes still real
    st2 = stats.table_stats(d.where("doc_id > 3"))
    assert st2["rows"] is None and st2["files"] >= 1
