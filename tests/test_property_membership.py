"""Hypothesis property tests for the JB bloom joins: the composed
semi/anti joins must equal Python set membership over RANDOM key
multisets for any type (ints incl. extremes, strings incl. empties and
near-collisions) and any filter sizing — the exactness contract holds
no matter how degraded the Bloom tier is."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from profet_spark.operators import membership as mb

INTS = hst.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
STRS = hst.sampled_from(
    ["", "a", "b", "ab", "a b", "5", "5.0", "user-1", "user-10", "ümlaut"])


def _check(spark, probe_keys, build_keys, max_bits):
    probe = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe_keys)], ["k", "v"])
    build = spark.createDataFrame([(k,) for k in build_keys], ["k"])
    bset = set(build_keys)
    want_semi = sorted(i for i, k in enumerate(probe_keys) if k in bset)
    want_anti = sorted(i for i, k in enumerate(probe_keys) if k not in bset)
    semi = sorted(r.v for r in
                  mb.bloom_semi_join(probe, build, "k",
                                     max_bits=max_bits).collect())
    anti = sorted(r.v for r in
                  mb.bloom_anti_join(probe, build, "k",
                                     max_bits=max_bits).collect())
    assert semi == want_semi
    assert anti == want_anti


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(probe=hst.lists(INTS, min_size=1, max_size=30),
       build=hst.lists(INTS, min_size=1, max_size=10),
       max_bits=hst.sampled_from([64, 4096, 1 << 20]))
def test_bloom_joins_equal_set_membership_ints(spark, probe, build, max_bits):
    # make overlap likely: alias some probe keys into the build set
    build = build + probe[: len(probe) // 2]
    _check(spark, probe, build, max_bits)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(probe=hst.lists(STRS, min_size=1, max_size=20),
       build=hst.lists(STRS, min_size=1, max_size=8),
       max_bits=hst.sampled_from([64, 4096]))
def test_bloom_joins_equal_set_membership_strings(spark, probe, build,
                                                  max_bits):
    _check(spark, probe, build, max_bits)
