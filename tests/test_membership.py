"""Bloom-filter membership pruning (operators/membership.py).

Exactness: the composed semi/anti joins must equal the plain joins for
ANY filter parameters. Filter quality: no false negatives ever
(superset property), measured false-positive rate near the sizing
target. Scale shape: the prune is a map-side Filter — no Exchange on
the probe side before the pythonUDF filter."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from profet_spark.operators import membership as mb


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def probe_build(spark):
    """Probe: 5000 rows keyed 0..999; build: keys 0..99 plus some
    duplicates and a NULL (which must be ignored)."""
    probe = spark.range(5000).select(
        (F.col("id") % 1000).alias("k"),
        F.col("id").alias("payload"))
    build = spark.createDataFrame(
        [Row(k=int(i % 100), tag="b") for i in range(250)]
        + [Row(k=None, tag="n")])
    return probe, build


def test_semi_join_equals_plain(spark, probe_build):
    probe, build = probe_build
    got = mb.bloom_semi_join(probe, build, "k")
    want = probe.join(build.select("k").where(F.col("k").isNotNull())
                      .distinct(), "k", "left_semi")
    assert _rows(got, "k", "payload") == _rows(want, "k", "payload")


def test_anti_join_equals_plain(spark, probe_build):
    probe, build = probe_build
    got = mb.bloom_anti_join(probe, build, "k")
    want = probe.join(build.select("k").where(F.col("k").isNotNull())
                      .distinct(), "k", "left_anti")
    assert _rows(got, "k", "payload") == _rows(want, "k", "payload")


def test_semi_plus_anti_is_a_partition(spark, probe_build):
    probe, build = probe_build
    semi = mb.bloom_semi_join(probe, build, "k")
    anti = mb.bloom_anti_join(probe, build, "k")
    assert (_rows(semi.unionByName(anti), "k", "payload")
            == _rows(probe, "k", "payload"))


def test_string_keys_and_right_on(spark):
    probe = spark.createDataFrame(
        [Row(name=f"user-{i}", v=i) for i in range(400)])
    build = spark.createDataFrame(
        [Row(uname=f"user-{i * 7}", t=1) for i in range(40)])
    got = mb.bloom_semi_join(probe, build, "name", right_on="uname")
    want = probe.join(build.select(F.col("uname").alias("name")).distinct(),
                      "name", "left_semi")
    assert _rows(got, "name", "v") == _rows(want, "name", "v")


def test_null_probe_keys_route_correctly(spark):
    probe = spark.createDataFrame(
        [Row(k=1, v=1), Row(k=None, v=2), Row(k=5, v=3)])
    build = spark.createDataFrame([Row(k=1)])
    assert _rows(mb.bloom_semi_join(probe, build, "k"), "v") == [(1,)]
    # plain left_anti KEEPS null-key rows; bloom_anti must too
    assert _rows(mb.bloom_anti_join(probe, build, "k"), "v") == [(2,), (3,)]


def test_empty_build_side(spark):
    probe = spark.range(100).select(F.col("id").alias("k"))
    build = spark.range(0).select(F.col("id").alias("k"))
    assert mb.bloom_semi_join(probe, build, "k").count() == 0
    assert mb.bloom_anti_join(probe, build, "k").count() == 100


def test_superset_and_fpp(spark):
    """The filter never rejects a member; non-member acceptance stays
    within a loose multiple of the sizing target."""
    build = spark.range(2000).select((F.col("id") * 3).alias("k"))
    bloom = mb.build_bloom(build, "k", fpp=0.01)
    members = spark.range(2000).select((F.col("id") * 3).alias("k"))
    assert mb.bloom_prune(members, bloom, "k").count() == 2000
    # 10k keys guaranteed outside the build set (offset beyond range)
    outside = spark.range(10000).select((F.lit(1_000_000) + F.col("id"))
                                        .alias("k"))
    fp = mb.bloom_prune(outside, bloom, "k").count()
    assert fp / 10000 < 0.05  # target 0.01, loose 5x envelope


def test_clamped_filter_stays_exact(spark):
    """A deliberately starved bitmap (max_bits clamp) degrades pruning,
    never correctness."""
    probe = spark.range(3000).select((F.col("id") % 500).alias("k"),
                                     F.col("id").alias("payload"))
    build = spark.range(100).select((F.col("id") * 5).alias("k"))
    got = mb.bloom_semi_join(probe, build, "k", max_bits=64)
    want = probe.join(build.distinct(), "k", "left_semi")
    assert _rows(got, "k", "payload") == _rows(want, "k", "payload")


def test_partition_count_invariance(spark):
    probe = spark.range(4000).select((F.col("id") % 300).alias("k"))
    build = spark.range(60).select((F.col("id") * 4).alias("k"))
    a = _rows(mb.bloom_semi_join(probe.repartition(1), build, "k"), "k")
    b = _rows(mb.bloom_semi_join(probe.repartition(17),
                                 build.repartition(13), "k"), "k")
    assert a == b


def test_prune_is_shuffle_free(spark):
    """The probe-side prune plans as scan → (Arrow eval) → Filter with
    NO Exchange — the whole point of the operator."""
    probe = spark.range(1000).select((F.col("id") % 100).alias("k"))
    build = spark.range(10).select(F.col("id").alias("k"))
    bloom = mb.build_bloom(build, "k")
    plan = (mb.bloom_prune(probe, bloom, "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_build_plan_has_no_shuffle(spark):
    """The bitmap build is scan → mapInPandas (partition-parallel) →
    repartition(1) → mapInPandas: the only exchange carries P bitmap
    rows, never keys."""
    build = spark.range(5000).select(F.col("id").alias("k"))
    kdf = build.where(F.col("k").isNotNull())
    # reproduce the internal stages' plan via the public entry: a
    # filter-only probe after build must leave the BUILD job shuffle-free
    # — assert via the final bitmap being reachable with one collect and
    # the documented superset property
    bloom = mb.build_bloom(kdf, "k", expected=5000)
    assert bloom.n_set_bits > 0
    assert bloom.m_bits % 64 == 0 and bloom.m_bits & (bloom.m_bits - 1) == 0


def test_duplicate_build_keys_no_distinct_needed(spark):
    """Duplicates only re-set bits: a filter built from a duplicated key
    set equals one built from the distinct set, bit for bit."""
    uniq = spark.range(500).select((F.col("id") * 2).alias("k"))
    dup = uniq.unionByName(uniq).unionByName(uniq)
    b1 = mb.build_bloom(uniq, "k", expected=500)
    b2 = mb.build_bloom(dup, "k", expected=500)
    assert b1.m_bits == b2.m_bits and b1.k == b2.k
    assert np.array_equal(b1.words, b2.words)


def test_bloom_prune_streams_unchanged(spark, tmp_path_factory):
    """bloom_prune is a stateless broadcast filter, so it streams as-is:
    an availableNow replay keeps exactly the rows the batch prune
    keeps (same bitmap broadcast, same vectorized probe)."""
    from profet_spark.streaming import temporal_stream as st

    probe = spark.range(2000).select((F.col("id") % 400).alias("k"),
                                     F.col("id").alias("payload"))
    build = spark.range(50).select((F.col("id") * 8).alias("k"))
    bloom = mb.build_bloom(build, "k")
    out = str(tmp_path_factory.mktemp("bloom_stream"))
    probe.coalesce(2).write.mode("overwrite").parquet(out)
    stream = spark.readStream.schema(probe.schema).parquet(out)
    st.run_available_now(mb.bloom_prune(stream, bloom, "k"),
                         "t_bloom_prune", output_mode="append")
    got = _rows(spark.table("t_bloom_prune"), "k", "payload")
    want = _rows(mb.bloom_prune(probe, bloom, "k"), "k", "payload")
    assert got == want


def test_int_key_with_null_in_same_batch_regression(spark):
    """Regression (round-4 review): an int64 probe batch containing a
    NULL used to arrive as float64 in the UDF and hash '5.0' on the
    probe while the build hashed int 5 — a false-negative factory. The
    xxhash64-base design makes the hash JVM-side and dtype-stable."""
    probe = spark.createDataFrame(
        [Row(k=5, v=1), Row(k=None, v=2)]).coalesce(1)
    build = spark.createDataFrame([Row(k=5)])
    assert _rows(mb.bloom_semi_join(probe, build, "k"), "v") == [(1,)]
    assert _rows(mb.bloom_anti_join(probe, build, "k"), "v") == [(2,)]
    # and the raw prune alone (no exact join to hide behind) keeps the
    # member — the superset contract
    bloom = mb.build_bloom(build, "k")
    assert _rows(mb.bloom_prune(probe, bloom, "k"), "v") == [(1,)]


def test_large_int64_keys_keep_precision(spark):
    """Keys beyond 2^53 (where float64 rounds) must still round-trip:
    xxhash64 runs JVM-side on the exact int64."""
    big = (1 << 60) + 1
    probe = spark.createDataFrame(
        [Row(k=big, v=1), Row(k=big + 1, v=2), Row(k=None, v=3)]).coalesce(1)
    build = spark.createDataFrame([Row(k=big)])
    assert _rows(mb.bloom_semi_join(probe, build, "k"), "v") == [(1,)]
    assert _rows(mb.bloom_anti_join(probe, build, "k"), "v") == [(2,), (3,)]


def test_nan_double_keys_follow_spark_join_semantics(spark):
    """Spark equi-joins treat NaN == NaN as a match (NaN
    normalization); the bloom-composed joins must agree with the plain
    joins on NaN keys, both directions."""
    nan = float("nan")
    probe = spark.createDataFrame(
        [Row(k=1.5, v=1), Row(k=nan, v=2), Row(k=7.5, v=3)])
    build = spark.createDataFrame([Row(k=nan), Row(k=1.5)])
    want_semi = probe.join(build.distinct(), "k", "left_semi")
    want_anti = probe.join(build.distinct(), "k", "left_anti")
    assert (_rows(mb.bloom_semi_join(probe, build, "k"), "v")
            == _rows(want_semi, "v"))
    assert (_rows(mb.bloom_anti_join(probe, build, "k"), "v")
            == _rows(want_anti, "v"))


def test_non_power_of_two_max_bits_is_floored(spark):
    """max_bits is floored to a power of two (the probe's mask/word
    arithmetic requires it) — no crash, still exact."""
    probe = spark.range(500).select((F.col("id") % 100).alias("k"))
    build = spark.range(30).select((F.col("id") * 3).alias("k"))
    got = mb.bloom_semi_join(probe, build, "k", max_bits=1000)
    want = probe.join(build.distinct(), "k", "left_semi")
    assert _rows(got, "k") == _rows(want, "k")
    bloom = mb.build_bloom(build, "k", max_bits=1000)
    assert bloom.m_bits == 512


def test_filter_param_validation(spark):
    build = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="fpp"):
        mb.build_bloom(build, "k", fpp=1.0)
    with pytest.raises(ValueError, match="fpp"):
        mb.build_bloom(build, "k", fpp=0.0)
    with pytest.raises(ValueError, match="max_bits"):
        mb.build_bloom(build, "k", max_bits=32)


def test_composite_key_joins(spark):
    """Composite keys: (int, string) pairs hashed together by the same
    multi-argument xxhash64 on both sides; a NULL in ANY component
    routes like a null single key (never a member, kept by anti)."""
    probe = spark.createDataFrame(
        [Row(a=1, b="x", v=1), Row(a=1, b="y", v=2),
         Row(a=2, b="x", v=3), Row(a=None, b="x", v=4),
         Row(a=1, b=None, v=5)])
    build = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="z")])
    want_semi = probe.join(build.distinct(), ["a", "b"], "left_semi")
    want_anti = probe.join(build.distinct(), ["a", "b"], "left_anti")
    got_semi = mb.bloom_semi_join(probe, build, ["a", "b"])
    got_anti = mb.bloom_anti_join(probe, build, ["a", "b"])
    assert _rows(got_semi, "v") == _rows(want_semi, "v") == [(1,)]
    assert (_rows(got_anti, "v") == _rows(want_anti, "v")
            == [(2,), (3,), (4,), (5,)])


def test_composite_key_right_on_rename(spark):
    probe = spark.createDataFrame(
        [Row(a=i % 5, b=f"s{i % 3}", v=i) for i in range(60)])
    build = spark.createDataFrame(
        [Row(x=1, y="s0"), Row(x=2, y="s1"), Row(x=9, y="s9")])
    want = probe.join(
        build.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .distinct(), ["a", "b"], "left_semi")
    got = mb.bloom_semi_join(probe, build, ["a", "b"],
                             right_on=["x", "y"])
    assert _rows(got, "v") == _rows(want, "v")


def test_key_list_validation(spark):
    """Mismatched on/right_on lengths and empty key lists are errors,
    never silent zip-truncation (which would desynchronize the build
    and probe hashes — a false-negative factory)."""
    probe = spark.createDataFrame([Row(a=1, b="x", v=1)])
    build = spark.createDataFrame([Row(x=1, y="x")])
    with pytest.raises(ValueError, match="must align"):
        mb.bloom_semi_join(probe, build, "a", right_on=["x", "y"])
    with pytest.raises(ValueError, match="must align"):
        mb.bloom_anti_join(probe, build, ["a", "b"], right_on=["x"])
    with pytest.raises(ValueError, match="non-empty"):
        mb.build_bloom(build, [])


def test_mixed_key_dtypes_coerce_before_hashing(spark):
    """ADVICE r4 (high): xxhash64 is type-sensitive — int32 ``5`` and
    int64 ``5`` hash differently — while the plain equi-join coerces,
    so hashing native dtypes made every cross-dtype key a Bloom false
    negative (semi lost true members; anti leaked them into sure_out).
    The joins must now coerce the hash input (never the stored
    columns) and stay bit-for-bit equal to the plain joins."""
    probe = spark.range(200).select(
        F.col("id").cast("int").alias("k"),        # int32 probe
        F.col("id").alias("payload"))
    build = spark.createDataFrame(
        [Row(k=int(i)) for i in range(0, 60, 2)])  # int64 build
    assert dict(probe.dtypes)["k"] == "int"
    assert dict(build.dtypes)["k"] == "bigint"

    want_semi = probe.join(build.distinct(), "k", "left_semi")
    want_anti = probe.join(build.distinct(), "k", "left_anti")
    got_semi = mb.bloom_semi_join(probe, build, "k")
    got_anti = mb.bloom_anti_join(probe, build, "k")
    assert want_semi.count() == 30  # the regression returned 0 here
    assert _rows(got_semi, "k", "payload") == _rows(want_semi, "k",
                                                    "payload")
    assert _rows(got_anti, "k", "payload") == _rows(want_anti, "k",
                                                    "payload")
    # output schema is the PROBE's schema, untouched by the coercion
    assert got_semi.schema == want_semi.schema


def test_mixed_numeric_key_dtypes_coerce_to_double(spark):
    """int64 probe vs double build: both hash through double — exactly
    the coercion the plain join applies — so equality survives."""
    probe = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("payload"))
    build = spark.createDataFrame(
        [Row(kd=float(i)) for i in range(0, 40, 4)])
    want = probe.join(build.distinct(),
                      probe["k"] == build["kd"], "left_semi")
    got = mb.bloom_semi_join(probe, build, "k", right_on="kd")
    assert _rows(got, "payload") == _rows(want, "payload")
    assert got.count() == 10


def test_incompatible_key_dtypes_raise(spark):
    """string vs int has no safe hash coercion here — raise loudly
    instead of risking silent false negatives."""
    probe = spark.createDataFrame([Row(k="5", v=1)])
    build = spark.createDataFrame([Row(k=5)])
    with pytest.raises(ValueError, match="dtypes"):
        mb.bloom_semi_join(probe, build, "k")
    with pytest.raises(ValueError, match="dtypes"):
        mb.bloom_anti_join(probe, build, "k")


def test_long_float_keys_follow_spark_join_coercion(spark):
    """Discriminating pin for the integral×float hash coercion: Spark
    widens (long, float) join comparisons to DOUBLE (bigint 16777217
    does NOT match float 16777216.0f), so the bloom hash must use
    double too. If Spark ever switched to float-precedence coercion,
    the plain-join oracle here flips and this test catches the drift."""
    left = spark.createDataFrame(
        [Row(k=16777217, v=1), Row(k=16777216, v=2), Row(k=42, v=3)]
    ).select(F.col("k").cast("bigint").alias("k"), "v")
    right = spark.createDataFrame(
        [Row(k=16777216.0), Row(k=42.0)]
    ).select(F.col("k").cast("float").alias("k"))
    want = left.join(right.withColumnRenamed("k", "kr").distinct(),
                     F.col("k") == F.col("kr"), "left_semi")
    got = mb.bloom_semi_join(left, right, "k")
    assert _rows(got, "v") == _rows(want, "v") == [(2,), (3,)]
    got_anti = mb.bloom_anti_join(left, right, "k")
    want_anti = left.join(right.withColumnRenamed("k", "kr").distinct(),
                          F.col("k") == F.col("kr"), "left_anti")
    assert _rows(got_anti, "v") == _rows(want_anti, "v") == [(1,)]


def test_cast_types_length_mismatch_raises(spark):
    """A short cast_types list must raise, never zip-truncate trailing
    key columns out of the hash (silent false-negative factory)."""
    from pyspark.sql import types as T

    build = spark.createDataFrame([Row(a=1, b="x")])
    with pytest.raises(ValueError, match="must align"):
        mb.build_bloom(build, ["a", "b"], cast_types=[T.LongType()])


def test_bloom_joins_equal_plain_on_random_key_sets(spark):
    """Hypothesis property (round 5): for arbitrary small probe/build
    key sets — duplicates, negatives, empty builds, extreme int64
    values, starved bitmaps — the composed semi+anti joins must equal
    the plain joins AND partition the probe. Python-set reference, no
    Spark machinery on the oracle side."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as hst

    key = hst.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(probe_keys=hst.lists(key, min_size=0, max_size=30),
           build_keys=hst.lists(key, min_size=0, max_size=12),
           max_bits=hst.sampled_from([64, 256, 1 << 20]),
           overlap=hst.booleans())
    def run(probe_keys, build_keys, max_bits, overlap):
        if overlap and probe_keys and build_keys:
            build_keys = build_keys + probe_keys[:3]
        probe = spark.createDataFrame(
            [(k, i) for i, k in enumerate(probe_keys)] or [(0, -1)],
            "k long, v long")
        if not probe_keys:
            probe = probe.where(F.lit(False))
        build = spark.createDataFrame(
            [(k,) for k in build_keys] or [(0,)], "k long")
        if not build_keys:
            build = build.where(F.lit(False))
        semi = {r.v for r in mb.bloom_semi_join(
            probe, build, "k", max_bits=max_bits).collect()}
        anti = {r.v for r in mb.bloom_anti_join(
            probe, build, "k", max_bits=max_bits).collect()}
        bset = set(build_keys)
        want_semi = {i for i, k in enumerate(probe_keys) if k in bset}
        want_anti = {i for i, k in enumerate(probe_keys) if k not in bset}
        assert semi == want_semi
        assert anti == want_anti
        assert semi | anti == set(range(len(probe_keys)))
        assert not (semi & anti)

    run()


def test_composite_key_mixed_dtypes_coerce_per_column(spark):
    """Composite keys coerce EACH column pair independently: (int vs
    bigint, string vs string, float vs double) in one key tuple must
    all hash through their own common types and equal the plain join."""
    probe = spark.createDataFrame(
        [Row(a=i % 6, b=f"s{i % 3}", c=float(i % 4), v=i)
         for i in range(120)]).select(
        F.col("a").cast("int").alias("a"), "b",
        F.col("c").cast("float").alias("c"), "v")
    build = spark.createDataFrame(
        [Row(x=1, y="s0", z=2.0), Row(x=4, y="s1", z=0.0),
         Row(x=9, y="s9", z=9.0)]).select(
        F.col("x").cast("bigint").alias("x"), "y",
        F.col("z").cast("double").alias("z"))
    want = probe.join(
        build.select(F.col("x").alias("a"), F.col("y").alias("b"),
                     F.col("z").alias("c")).distinct(),
        ["a", "b", "c"], "left_semi")
    got = mb.bloom_semi_join(probe, build, ["a", "b", "c"],
                             right_on=["x", "y", "z"])
    assert _rows(got, "v") == _rows(want, "v")
    assert want.count() > 0  # non-vacuous
    got_anti = mb.bloom_anti_join(probe, build, ["a", "b", "c"],
                                  right_on=["x", "y", "z"])
    assert got_anti.count() + got.count() == probe.count()
