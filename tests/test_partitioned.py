"""Hidden-partitioning layer (Iceberg-style days(ts) x bucket(N, entity)
on the parquet fallback): layout, predicate rewrite into PartitionFilters,
and row-level equivalence with the unpartitioned scan."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from profet_spark import fixtures
from profet_spark.sources import partitioned as P


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    pdf = fixtures.make_fixture(n_entities=40, with_images=False)
    df = fixtures.to_spark(spark, pdf).select("image_id", "ts", "caption", "phash")
    out = str(tmp_path_factory.mktemp("part") / "snapshots")
    P.write_partitioned(df, out, n_buckets=4)
    return df, out


def test_layout_has_partition_dirs(table):
    _, out = table
    days = [d for d in os.listdir(out) if d.startswith(P.DAY_COL + "=")]
    assert days, "expected _p_day=... directories"
    buckets = os.listdir(os.path.join(out, days[0]))
    assert any(b.startswith(P.BUCKET_COL + "=") for b in buckets)


def test_roundtrip_rows_equal(spark, table):
    df, out = table
    back = P.scan_pruned(spark, out, n_buckets=4)
    assert P.DAY_COL not in back.columns and P.BUCKET_COL not in back.columns
    assert sorted(back.columns) == sorted(df.columns)
    a = df.orderBy("image_id", "ts").toPandas()
    b = back.orderBy("image_id", "ts").toPandas()[a.columns.tolist()]
    assert a.equals(b)


def _ts_bounds(df):
    r = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = r.lo + (r.hi - r.lo) / 2
    return r.lo, mid


def test_ts_range_becomes_partition_filter(spark, table):
    df, out = table
    lo, mid = _ts_bounds(df)
    pruned = P.scan_pruned(spark, out, n_buckets=4, ts_between=(lo, mid))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert P.DAY_COL in plan.split("PartitionFilters", 1)[1].split("]")[0], (
        "day bound must prune at the directory level")
    want = df.where(F.col("ts").between(F.lit(lo), F.lit(mid)))
    assert pruned.count() == want.count() > 0


def test_entity_set_becomes_bucket_filter(spark, table):
    df, out = table
    ids = [r.image_id for r in df.select("image_id").distinct().limit(3).collect()]
    pruned = P.scan_pruned(spark, out, n_buckets=4, entity_in=ids)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert P.BUCKET_COL in plan.split("PartitionFilters", 1)[1].split("]")[0], (
        "bucket id set must prune at the directory level")
    assert pruned.count() == df.where(F.col("image_id").isin(ids)).count() > 0


def test_bucket_probe_matches_non_bigint_entity_type(spark, tmp_path):
    """Regression: xxhash64 is type-sensitive, so the probe must hash with
    the TABLE's entity column type — an int32 entity column must still
    return rows (the old Python-int probe hashed as bigint and pruned
    everything away)."""
    from pyspark.sql import functions as F
    df = spark.range(0, 50).select(
        F.col("id").cast("int").alias("image_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        F.col("id").alias("payload"))
    out = str(tmp_path / "intkeys")
    P.write_partitioned(df, out, n_buckets=4)
    got = P.scan_pruned(spark, out, n_buckets=4, entity_in=[7, 12]).toPandas()
    assert sorted(got.image_id.tolist()) == [7, 12]


def test_combined_pruning_matches_plain_filter(spark, table):
    df, out = table
    lo, mid = _ts_bounds(df)
    ids = [r.image_id for r in df.select("image_id").distinct().limit(5).collect()]
    pruned = P.scan_pruned(spark, out, n_buckets=4,
                           ts_between=(lo, mid), entity_in=ids).toPandas()
    want = (df.where(F.col("ts").between(F.lit(lo), F.lit(mid)))
            .where(F.col("image_id").isin(ids))).toPandas()
    key = ["image_id", "ts"]
    assert (sorted(map(tuple, pruned[key].values.tolist()))
            == sorted(map(tuple, want[key].values.tolist())))


def test_iceberg_front_door_fallback(spark, tmp_path):
    """sources.iceberg routes to the parquet hidden-partition layer when no
    Iceberg runtime is on the classpath (this sandbox), with identical
    results to calling the layer directly; a catalog identifier without
    the runtime fails loudly instead of mis-writing to a path."""
    import datetime

    import pytest as _pt
    from pyspark.sql import functions as F

    from profet_spark.sources import iceberg as ice
    from profet_spark.sources import load_table
    from profet_spark.sources import partitioned as P

    assert ice.iceberg_available(spark) is False  # sandbox has no jars

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts")
    out = str(tmp_path / "ice_fallback")
    assert ice.write_table(ev, out, ts_col="ts", entity_col="user_id",
                           n_buckets=4) == "parquet"
    lo = ev.agg(F.min("ts")).collect()[0][0]
    hi = lo + datetime.timedelta(days=2)
    got = ice.read_table(spark, out, ts_col="ts", entity_col="user_id",
                         n_buckets=4, ts_between=(lo, hi),
                         entity_in=[0, 1, 2]).toPandas()
    want = P.scan_pruned(spark, out, ts_col="ts", entity_col="user_id",
                         n_buckets=4, ts_between=(lo, hi),
                         entity_in=[0, 1, 2]).toPandas()
    cols = ["event_id", "user_id", "ts"]
    assert got[cols].sort_values(cols).reset_index(drop=True).equals(
        want[cols].sort_values(cols).reset_index(drop=True))
    assert len(got) > 0

    with _pt.raises(ValueError, match="catalog identifier"):
        ice.write_table(ev, "cat.db.events", ts_col="ts", entity_col="user_id")

    # dotted FILENAMES (fewer than two dots, or any slash) route to the
    # parquet fallback rather than being mistaken for identifiers
    out2 = str(tmp_path / "snapshots.v2")
    assert ice.write_table(ev, out2, ts_col="ts", entity_col="user_id",
                           n_buckets=4) == "parquet"


def test_spec_is_authoritative_for_bucket_modulus(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("user_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
        (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "spec_tbl")
    P.write_partitioned(df, out, ts_col="ts", entity_col="user_id",
                        n_buckets=16)
    # omitted n_buckets: read from the spec
    assert P.scan_pruned(spark, out, ts_col="ts", entity_col="user_id",
                         entity_in=[7]).count() == 1
    # a contradictory modulus would silently return zero rows — raise
    with pytest.raises(ValueError, match="partition spec"):
        P.scan_pruned(spark, out, ts_col="ts", entity_col="user_id",
                      n_buckets=8, entity_in=[7])
    # empty probe list: IN () matches nothing, no crash
    assert P.scan_pruned(spark, out, ts_col="ts", entity_col="user_id",
                         entity_in=[]).count() == 0


def test_zoned_timestamp_days_are_utc(spark, tmp_path):
    """Iceberg's days() buckets instants by UTC day: writing from one
    session timezone and pruning from another must not lose rows."""
    out = str(tmp_path / "tz_tbl")
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql("""
            SELECT 1 AS user_id,
                   to_timestamp('2024-03-01 22:30:00') AS ts, 1 AS v""")
        # 22:30 EST = 2024-03-02T03:30Z -> UTC day 2024-03-02
        P.write_partitioned(df, out, ts_col="ts", entity_col="user_id",
                            n_buckets=2)
        import os
        assert any("_p_day=2024-03-02" in d for d in os.listdir(out))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        got = P.scan_pruned(
            spark, out, ts_col="ts", entity_col="user_id",
            ts_between=("2024-03-02 00:00:00", "2024-03-02 12:00:00"))
        assert got.count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


# -------------------------------------------------------------- S8 upsert


def _upsert_fixture(spark):
    from profet_spark.sources import load_table
    return load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts",
        F.col("value").cast("double").alias("val"))


def test_upsert_merges_and_only_rewrites_touched_partitions(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.write_partitioned(ev.where(F.col("ts") < F.lit("2024-01-20")), d,
                        ts_col="ts", entity_col="user_id", n_buckets=4)
    # snapshot the data files of partitions the batch will NOT touch
    untouched = {}
    for root, _, files in os.walk(d):
        if "_p_day=2024-01-0" in root:  # batch starts Jan 10
            day = root.split("_p_day=")[1].split(os.sep)[0]
            if day < "2024-01-10":
                for f in files:
                    p = os.path.join(root, f)
                    untouched[p] = os.stat(p).st_mtime_ns
    assert untouched, "fixture must have pre-batch partitions"

    upd = (ev.where(F.col("ts") >= F.lit("2024-01-10"))
           .withColumn("val", F.col("val") + 1000.0))
    stats = P.upsert_partitioned(spark, upd, d, key_cols=["event_id"])
    assert stats["rows_replaced"] > 0
    assert stats["partitions_rewritten"] > 0

    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    exp = ev.withColumn(
        "val", F.when(F.col("ts") >= F.lit("2024-01-10"),
                      F.col("val") + 1000.0).otherwise(F.col("val")))
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # the untouched partitions' data files are byte-identical on disk —
    # the dynamic-overwrite contract: cost scales with the batch footprint
    for p, mtime in untouched.items():
        assert os.path.exists(p) and os.stat(p).st_mtime_ns == mtime
    # the spec survives the rewrite
    assert P.read_spec(d)["n_buckets"] == 4


def test_upsert_validation(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store2")
    with pytest.raises(ValueError, match="_partition_spec"):
        P.upsert_partitioned(spark, ev, str(tmp_path / "nope"))
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    with pytest.raises(ValueError, match="not in the batch"):
        P.upsert_partitioned(spark, ev.drop("user_id"), d)
    # xxhash64 is type-sensitive: an int batch against a bigint store
    # must raise, not land rows in wrong buckets
    with pytest.raises(ValueError, match="cast the batch"):
        P.upsert_partitioned(
            spark, ev.withColumn("user_id", F.col("user_id").cast("int")), d)


def test_upsert_default_key_is_entity_ts(spark, tmp_path):
    ev = (_upsert_fixture(spark)
          .groupBy("user_id", "ts").agg(F.max("val").alias("val")))
    d = str(tmp_path / "store3")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    upd = ev.limit(50).withColumn("val", F.lit(-1.0))
    stats = P.upsert_partitioned(spark, upd, d)
    assert stats["rows_replaced"] == 50
    got = spark.read.parquet(d)
    assert got.count() == ev.count()
    assert got.where(F.col("val") == -1.0).count() == 50


def _moved_key_store(spark, tmp_path, name):
    """Store with surrogate keys; the batch moves key 7's ts to another
    day (a different (day, bucket) partition than the stored row)."""
    rows = [(i, 100 + (i % 3), datetime.datetime(2024, 1, 1 + i), 1.0 * i)
            for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp_ntz, val double")
    d = str(tmp_path / name)
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    batch = spark.createDataFrame(
        [(7, 100 + (7 % 3), datetime.datetime(2024, 3, 1), -7.0)],
        "event_id bigint, user_id bigint, ts timestamp_ntz, val double")
    return ev, batch, d


def test_upsert_moved_key_extend_removes_stale_row(spark, tmp_path):
    ev, batch, d = _moved_key_store(spark, tmp_path, "mk_extend")
    stats = P.upsert_partitioned(spark, batch, d, key_cols=["event_id"])
    got = spark.read.parquet(d)
    # exactly one row per key — the stale day=2024-01-08 row is gone
    assert got.count() == ev.count()
    k7 = got.where(F.col("event_id") == 7).collect()
    assert len(k7) == 1 and k7[0]["val"] == -7.0
    assert k7[0]["ts"] == datetime.datetime(2024, 3, 1)
    # rewrite set was extended beyond the batch's own single partition
    assert stats["partitions_rewritten"] >= 2
    assert stats["rows_replaced"] == 1
    # the stale partition held ONLY key 7 -> it must be dropped from disk
    assert not os.path.isdir(os.path.join(
        d, f"{P.DAY_COL}=2024-01-08"))


def test_upsert_moved_key_error_and_skip(spark, tmp_path):
    ev, batch, d = _moved_key_store(spark, tmp_path, "mk_err")
    with pytest.raises(ValueError, match="moves keys across partitions"):
        P.upsert_partitioned(spark, batch, d, key_cols=["event_id"],
                             on_moved_keys="error")
    with pytest.raises(ValueError, match="on_moved_keys"):
        P.upsert_partitioned(spark, batch, d, key_cols=["event_id"],
                             on_moved_keys="nope")
    # 'skip' documents the fast-path contract: the stale row survives
    P.upsert_partitioned(spark, batch, d, key_cols=["event_id"],
                         on_moved_keys="skip")
    got = spark.read.parquet(d)
    assert got.where(F.col("event_id") == 7).count() == 2


def test_upsert_moved_key_extend_without_forced_broadcast(
        spark, tmp_path, monkeypatch):
    # the non-broadcast (AQE-planned) merge path must produce the same
    # merge as the broadcast path
    ev, batch, d = _moved_key_store(spark, tmp_path, "mk_nobc")
    monkeypatch.setattr(P, "BROADCAST_KEY_LIMIT", 0)
    P.upsert_partitioned(spark, batch, d, key_cols=["event_id"])
    got = spark.read.parquet(d)
    assert got.count() == ev.count()
    assert got.where(F.col("event_id") == 7).count() == 1


def test_upsert_default_key_skips_moved_key_probe(spark, tmp_path):
    # (entity, ts) determines the partition: no probe branch, and rows
    # merge exactly (covered by test_upsert_default_key_is_entity_ts);
    # here pin that a key containing BOTH spec columns takes the fast
    # path even when extra key columns are present
    ev = (_upsert_fixture(spark)
          .groupBy("user_id", "ts").agg(F.max("val").alias("val"),
                                        F.max("event_id").alias("event_id")))
    d = str(tmp_path / "store_fastpath")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    upd = ev.limit(20).withColumn("val", F.lit(-2.0))
    stats = P.upsert_partitioned(
        spark, upd, d, key_cols=["event_id", "user_id", "ts"],
        on_moved_keys="error")  # would raise if the probe found anything
    assert stats["rows_replaced"] == 20
    assert spark.read.parquet(d).where(F.col("val") == -2.0).count() == 20


def test_compact_merges_fragmented_partitions_only(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "frag")
    # high write parallelism fragments every partition dir
    P.write_partitioned(ev.repartition(16), d, ts_col="ts",
                        entity_col="user_id", n_buckets=2)

    def files_per_dir():
        out = {}
        for root, _, files in os.walk(d):
            data = [f for f in files if f.endswith(".parquet")]
            if f"{P.BUCKET_COL}=" in root and data:
                out[os.path.relpath(root, d)] = sorted(data)
        return out

    before = files_per_dir()
    frag = {k: v for k, v in before.items() if len(v) > 2}
    assert frag, "fixture must fragment"
    want = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL).toPandas()

    # a tiny byte budget exempts everything -> no-op
    stats0 = P.compact_partitions(spark, d, max_files_per_partition=2,
                                  target_file_bytes=1)
    assert stats0["partitions_compacted"] == 0
    assert files_per_dir() == before

    stats = P.compact_partitions(spark, d, max_files_per_partition=2)
    assert stats["partitions_compacted"] == len(frag)
    assert stats["files_before"] == sum(len(v) for v in frag.values())
    assert stats["files_after"] == len(frag)
    after = files_per_dir()
    for k in frag:
        assert len(after[k]) == 1
    for k in set(before) - set(frag):  # non-victims byte-untouched
        assert after[k] == before[k]
    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL).toPandas()
    cols = list(want.columns)
    assert (got.sort_values(cols).reset_index(drop=True)
            .equals(want.sort_values(cols).reset_index(drop=True)))
    with pytest.raises(ValueError, match="_partition_spec"):
        P.compact_partitions(spark, str(tmp_path / "missing"))


def test_upsert_rejects_schema_widening_batch(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store4")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    widened = ev.withColumn("new_feature", F.lit(1.0))
    with pytest.raises(ValueError, match="not in the store schema"):
        P.upsert_partitioned(spark, widened, d, key_cols=["event_id"])


# ------------------------------------------------- Iceberg routing branch


def test_iceberg_route_decisions_both_ways(spark, monkeypatch):
    """Pin _route()'s decision table with iceberg_available mocked BOTH
    ways — the sandbox has no jars, so without the mock the real-catalog
    arm has zero executed coverage."""
    from profet_spark.sources import iceberg as I

    # paths / non-identifiers always take the fallback, jars or not
    for avail in (True, False):
        monkeypatch.setattr(I, "iceberg_available", lambda s, _a=avail: _a)
        assert I._route(spark, "/tmp/out/snapshots") == "parquet"
        assert I._route(spark, "snapshots.v2.parquet") == "parquet"
    # identifier + no runtime -> loud error, never a silent fallback
    monkeypatch.setattr(I, "iceberg_available", lambda s: False)
    with pytest.raises(ValueError, match="no Iceberg runtime"):
        I._route(spark, "cat.db.tbl")
    # identifier + runtime + no catalog config -> loud error
    monkeypatch.setattr(I, "iceberg_available", lambda s: True)
    with pytest.raises(ValueError, match="spark.sql.catalog"):
        I._route(spark, "cat.db.tbl")
    # identifier + runtime + configured catalog -> the real branch
    monkeypatch.setattr(I, "_catalog_configured", lambda s, t: True)
    assert I._route(spark, "cat.db.tbl") == "iceberg"


def test_iceberg_write_branch_builds_day_bucket_spec(spark, monkeypatch):
    """With the route forced to 'iceberg', write_table must issue
    writeTo(target).partitionedBy(days(ts), bucket(N, entity))
    .createOrReplace() — captured via a recording stub (the sandbox has
    no jars to execute it for real)."""
    from profet_spark.sources import iceberg as I

    calls = {}

    class _Rec:
        def __init__(self, target):
            calls["target"] = target

        def partitionedBy(self, *cols):
            calls["cols"] = [str(c._jc) for c in cols]
            return self

        def createOrReplace(self):
            calls["done"] = True

    monkeypatch.setattr(I, "_route", lambda s, t: "iceberg")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "image_id bigint, ts timestamp")
    # patch the CONCRETE DataFrame class (Spark 4 classic subclass
    # overrides the base), so write_table's df.writeTo hits the stub
    monkeypatch.setattr(type(df), "writeTo",
                        lambda self, target: _Rec(target), raising=True)
    assert I.write_table(df, "cat.db.tbl", ts_col="ts",
                         entity_col="image_id", n_buckets=16) == "iceberg"
    assert calls["target"] == "cat.db.tbl" and calls["done"]
    spec = " ".join(calls["cols"])
    assert "days(ts)" in spec and "bucket(16, image_id)" in spec


def test_iceberg_real_catalog_roundtrip(spark, tmp_path):
    """The real-jar path: hadoop catalog in a temp warehouse, write via
    writeTo().partitionedBy(days, bucket), read back pruned. Skipped
    where the Iceberg runtime is absent (this sandbox); present so any
    environment WITH the jars exercises the branch end to end."""
    from profet_spark.sources import iceberg as I

    if not I.iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath")
    cat = "it_cat"
    spark.conf.set(f"spark.sql.catalog.{cat}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse",
                   str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1 + i % 3), f"c{i}")
         for i in range(30)],
        "image_id bigint, ts timestamp, caption string")
    assert I.write_table(df, f"{cat}.db.tbl", ts_col="ts",
                         entity_col="image_id", n_buckets=4) == "iceberg"
    got = I.read_table(spark, f"{cat}.db.tbl", ts_col="ts",
                       entity_col="image_id",
                       entity_in=[1, 2, 3])
    assert got.count() == 3


# ---------------- S10 incremental feature materialization ----------------

_W3_S = 3 * 86400.0  # trailing 3-day feature window


def _w3_compute(df):
    """Trailing 3-day per-user exact-int aggregates over event_id — a
    delta-closed compute (lookback = window span) with engine-exact
    outputs, the shape the s10 driver key grades."""
    from profet_spark.operators.feature_matrix import windowed_spine_agg
    return windowed_spine_agg(
        df, df.select("user_id", "ts", "event_id"),
        {"w3_n": ("count", "event_id"), "w3_sum": ("sum", "event_id")},
        entity="user_id", ts="ts", window_s=_W3_S)


def _assert_frames_equal(got, exp):
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_high_watermark_scans_only_newest_day(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    true_max = ev.agg(F.max("ts")).collect()[0][0]
    assert P.high_watermark(spark, d) == true_max
    # the probe's frame reads ONLY the newest day's files — the O(1-day)
    # cost model that makes the incremental loop viable at 10^12 rows
    days = P._day_dirs(d)
    assert len(days) > 1, "fixture must span several days"
    scan = P._watermark_scan(spark, d)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert P.DAY_COL in pf and days[-1] in pf, (
        "the newest-day equality must prune at the directory level")


def test_high_watermark_requires_spec(spark, tmp_path):
    with pytest.raises(ValueError, match="_partition_spec"):
        P.high_watermark(spark, str(tmp_path / "nope"))


def test_incremental_bootstrap_writes_full_store(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    m = P.materialize_incremental(spark, ev, d, compute=_w3_compute,
                                  ts_col="ts", entity_col="user_id",
                                  n_buckets=4)
    assert m["bootstrap"] is True and m["watermark"] is None
    assert m["rows_written"] == ev.count()
    assert m["partitions_rewritten"] > 0
    assert P.read_spec(d)["n_buckets"] == 4
    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    exp = _w3_compute(ev).select(*got.columns)
    _assert_frames_equal(got, exp)


def test_incremental_equals_full_recompute(spark, tmp_path):
    import datetime as dt
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.materialize_incremental(
        spark, ev.where(F.col("ts") < F.lit("2024-01-20")), d,
        compute=_w3_compute, ts_col="ts", entity_col="user_id", n_buckets=4)
    m = P.materialize_incremental(
        spark, ev, d, compute=_w3_compute, key_cols=["event_id"],
        lookback=dt.timedelta(seconds=_W3_S))
    assert m["bootstrap"] is False and m["watermark"] is not None
    assert m["rows_written"] > 0
    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    exp = _w3_compute(ev).select(*got.columns)
    _assert_frames_equal(got, exp)


def test_incremental_rerun_is_idempotent(spark, tmp_path):
    import datetime as dt
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.materialize_incremental(spark, ev, d, compute=_w3_compute,
                              ts_col="ts", entity_col="user_id",
                              n_buckets=4)
    before = (spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
              .localCheckpoint())
    m = P.materialize_incremental(
        spark, ev, d, compute=_w3_compute, key_cols=["event_id"],
        lookback=dt.timedelta(seconds=_W3_S))
    # only the watermark instant is re-emitted (>= cutoff) and replaced
    assert m["bootstrap"] is False
    assert 0 < m["rows_written"] < ev.count()
    after = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    _assert_frames_equal(after, before)


def test_incremental_late_window_heals_late_arrivals(spark, tmp_path):
    import datetime as dt
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    wm0 = ev.where(F.col("ts") < F.lit("2024-01-20")).agg(
        F.max("ts")).collect()[0][0]
    late_lo = wm0 - dt.timedelta(days=1)
    # first run never saw the "late" slice just behind the watermark
    first = ev.where((F.col("ts") < F.lit(late_lo)) |
                     (F.col("ts") >= F.lit("2024-01-20")))
    P.materialize_incremental(spark, first, d, compute=_w3_compute,
                              ts_col="ts", entity_col="user_id",
                              n_buckets=4)
    # without a late window the healing run misses them: cutoff == wm
    P.materialize_incremental(
        spark, ev, d, compute=_w3_compute, key_cols=["event_id"],
        lookback=dt.timedelta(seconds=_W3_S))
    n_missing = (ev.count()
                 - spark.read.parquet(d).count())
    assert n_missing > 0, "late rows behind the watermark stay missing"
    # a late_window spanning the gap re-emits that slice and heals it
    global_max = ev.agg(F.max("ts")).collect()[0][0]
    P.materialize_incremental(
        spark, ev, d, compute=_w3_compute, key_cols=["event_id"],
        lookback=dt.timedelta(seconds=_W3_S),
        late_window=global_max - late_lo + dt.timedelta(days=1))
    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    exp = _w3_compute(ev).select(*got.columns)
    _assert_frames_equal(got, exp)


def test_incremental_empty_delta_short_circuits(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.materialize_incremental(spark, ev, d, ts_col="ts",
                              entity_col="user_id", n_buckets=4)
    wm = P.high_watermark(spark, d)
    m = P.materialize_incremental(
        spark, ev.where(F.col("ts") < F.lit(wm)), d)
    assert m == {"bootstrap": False, "watermark": wm, "cutoff": wm,
                 "rows_written": 0, "rows_replaced": 0,
                 "partitions_rewritten": 0}


def test_incremental_validation(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    with pytest.raises(ValueError, match="late_window"):
        P.materialize_incremental(spark, ev, d, late_window=3.0)
    with pytest.raises(ValueError, match="lookback"):
        P.materialize_incremental(spark, ev, d, lookback="3 days")
    with pytest.raises(ValueError, match="not in the source"):
        P.materialize_incremental(spark, ev, d, ts_col="nope",
                                  entity_col="user_id")
    with pytest.raises(ValueError, match="dropped"):
        P.materialize_incremental(
            spark, ev, d, ts_col="ts", entity_col="user_id",
            compute=lambda df: df.drop("user_id"))


# ---------------------------------------------------------------- S11 diff


def _diff_map(df):
    return {tuple(r[:-1]): r["diff_status"] for r in df.collect()}


def test_snapshot_diff_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, None, 40.0)],
        "k int, s string, v double")
    right = spark.createDataFrame(
        [(2, "b", 20.0),          # unchanged
         (3, "c", 30.0),          # null -> value: changed
         (4, None, 40.0),         # null == null: unchanged
         (5, "e", 50.0)],         # added
        "k int, s string, v double")
    got = {r["k"]: r["diff_status"]
           for r in P.snapshot_diff(left, right, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    withu = {r["k"]: r["diff_status"]
             for r in P.snapshot_diff(left, right, ["k"],
                                      include_unchanged=True).collect()}
    assert withu[2] == "unchanged" and withu[4] == "unchanged"
    summary = {r["diff_status"]: r["n"]
               for r in P.snapshot_diff(left, right, ["k"],
                                        mode="summary").collect()}
    assert summary == {"added": 1, "removed": 1, "changed": 1,
                       "unchanged": 2}


def test_snapshot_diff_fingerprint_is_injective(spark):
    # separator-join collisions: ('ab','c') vs ('a','bc') must be CHANGED
    left = spark.createDataFrame([(1, "ab", "c"), (2, "n", "x")],
                                 "k int, a string, b string")
    right = spark.createDataFrame([(1, "a", "bc"), (2, None, "x")],
                                  "k int, a string, b string")
    got = _diff_map(P.snapshot_diff(left, right, ["k"]))
    # row 2: literal 'n' (the null tag) vs NULL must also be CHANGED
    assert got == {(1,): "changed", (2,): "changed"}


def test_snapshot_diff_null_keys_join_null_safely(spark):
    left = spark.createDataFrame([(None, "x"), (1, "y")], "k int, v string")
    right = spark.createDataFrame([(None, "x"), (1, "z")], "k int, v string")
    got = P.snapshot_diff(left, right, ["k"], include_unchanged=True)
    m = _diff_map(got)
    assert m == {(None,): "unchanged", (1,): "changed"}


def test_snapshot_diff_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    other = spark.createDataFrame([(1, "a", 2)], "k int, v string, w int")
    with pytest.raises(ValueError, match="mode"):
        P.snapshot_diff(df, df, ["k"], mode="nope")
    with pytest.raises(ValueError, match="non-empty"):
        P.snapshot_diff(df, df, [])
    with pytest.raises(ValueError, match="not in right"):
        P.snapshot_diff(df, other.select("k", "w"), ["k"],
                        compare_cols=["v"])
    with pytest.raises(ValueError, match="disagree on non-key"):
        P.snapshot_diff(df, other, ["k"])
    with pytest.raises(ValueError, match="both key_cols and compare"):
        P.snapshot_diff(df, df, ["k"], compare_cols=["k", "v"])


def test_snapshot_diff_exchange_never_carries_payload(spark):
    """The full-outer join must shuffle (keys, md5) only — a wide payload
    column may appear in the scans but never in a join Exchange input."""
    from profet_spark.plans import formatted_plan
    left = spark.range(100).select(
        F.col("id").alias("k"),
        F.repeat(F.lit("x"), 10000).alias("payload"))
    right = left.where("k % 2 = 0")
    plan = formatted_plan(P.snapshot_diff(left, right, ["k"]))
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange" in ln:
            window = "".join(lines[i:i + 3])
            assert "payload#" not in window, window


def test_store_diff_after_incremental_materialize(spark, tmp_path):
    """S10 + S11 composition: an incrementally-maintained store diffs as
    100% unchanged against a one-shot full recompute."""
    pdf = fixtures.make_fixture(n_entities=30, with_images=False)
    df = fixtures.to_spark(spark, pdf).select("image_id", "ts", "caption")
    cut = df.agg(F.expr("percentile(cast(ts as double), 0.6)")).collect()[0][0]
    early = df.where(F.col("ts").cast("double") < cut)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    P.materialize_incremental(spark, early, inc, ts_col="ts",
                              entity_col="image_id", n_buckets=4)
    P.materialize_incremental(spark, df, inc)
    P.write_partitioned(df, full, ts_col="ts", entity_col="image_id",
                        n_buckets=4)
    summary = {r["diff_status"]: r["n"]
               for r in P.store_diff(spark, inc, full,
                                     mode="summary").collect()}
    assert summary == {"unchanged": df.count()}
    # and a real difference is reported as one
    P.upsert_partitioned(
        spark, df.orderBy("image_id", "ts").limit(1)
        .withColumn("caption", F.lit("EDITED")), full)
    rows = P.store_diff(spark, inc, full).collect()
    assert [r["diff_status"] for r in rows] == ["changed"]


def test_store_diff_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="_partition_spec"):
        P.store_diff(spark, str(tmp_path / "a"), str(tmp_path / "b"))


# ----------------------------------------------------------- S12 retention


def test_expire_drops_old_days_keeps_cutoff_and_survivors_bytes(
        spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=4)
    days = P._day_dirs(d)
    assert len(days) >= 3, "fixture must span several days"
    cutoff = days[1]
    # survivors' file bytes must not move: retention never rewrites
    keep_files = {}
    for root, _dirs, files in os.walk(d):
        if "_p_day=" in root:
            day = root.split("_p_day=")[1].split(os.sep)[0]
            if day >= cutoff:
                for f in files:
                    p = os.path.join(root, f)
                    keep_files[p] = os.stat(p).st_mtime_ns
    want_drop = ev.where(
        F.to_date("ts") < F.lit(cutoff).cast("date")).count()
    stats = P.expire_partitions(spark, d, older_than=cutoff)
    assert stats["days_dropped"] == [days[0]]
    assert stats["rows_dropped"] == want_drop > 0
    assert stats["partitions_dropped"] > 0
    assert P._day_dirs(d) == days[1:]   # cutoff day itself KEPT
    for p, mtime in keep_files.items():
        assert os.path.exists(p) and os.stat(p).st_mtime_ns == mtime
    got = spark.read.parquet(d).drop(P.DAY_COL, P.BUCKET_COL)
    exp = ev.where(F.to_date("ts") >= F.lit(cutoff).cast("date"))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # the spec survives retention
    assert P.read_spec(d)["n_buckets"] == 4


def test_expire_keep_days_and_dry_run(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=2)
    days = P._day_dirs(d)
    dry = P.expire_partitions(spark, d, keep_days=2, dry_run=True)
    assert dry["dry_run"] is True
    assert dry["days_dropped"] == days[:-2]
    assert P._day_dirs(d) == days  # nothing deleted
    wet = P.expire_partitions(spark, d, keep_days=2)
    assert wet["days_dropped"] == dry["days_dropped"]
    assert wet["rows_dropped"] == dry["rows_dropped"] > 0
    assert P._day_dirs(d) == days[-2:]
    # keeping more days than exist is a no-op, not an error
    none = P.expire_partitions(spark, d, keep_days=100)
    assert none["days_dropped"] == [] and none["rows_dropped"] == 0


def test_expire_validation(spark, tmp_path):
    ev = _upsert_fixture(spark)
    d = str(tmp_path / "store")
    P.write_partitioned(ev, d, ts_col="ts", entity_col="user_id",
                        n_buckets=2)
    with pytest.raises(ValueError, match="exactly one"):
        P.expire_partitions(spark, d)
    with pytest.raises(ValueError, match="exactly one"):
        P.expire_partitions(spark, d, older_than="2024-01-10", keep_days=1)
    with pytest.raises(ValueError, match="keep_days must be >= 1"):
        P.expire_partitions(spark, d, keep_days=0)
    with pytest.raises(ValueError, match="yyyy-MM-dd"):
        P.expire_partitions(spark, d, older_than="1/10/2024")
    with pytest.raises(ValueError, match="not a"):
        P.expire_partitions(spark, str(tmp_path / "nope"),
                            older_than="2024-01-10")
    # date/datetime cutoffs accepted via _day_str
    out = P.expire_partitions(
        spark, d, older_than=datetime.date(2000, 1, 1))
    assert out["days_dropped"] == []
