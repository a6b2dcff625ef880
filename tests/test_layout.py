"""L1 z-order layout: exact interleave, bucket math, span collapse, plans."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from profet_spark.operators import layout as L

BITS = 8  # small domain keeps the brute-force reference cheap


def _morton(x: int, y: int, bits: int) -> int:
    """Serial reference: bit b of dim d -> position b*2 + d (dim 0 LSB)."""
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def _norm(v: int, lo: int, hi: int, bits: int) -> int:
    v = max(min(v, hi), lo) - lo
    return (v * ((1 << bits) - 1)) // (hi - lo)


@pytest.fixture(scope="module")
def grid(spark):
    pdf = pd.DataFrame([(i, x, y) for i, (x, y) in enumerate(
        (x, y) for x in range(0, 64, 3) for y in range(0, 256, 11))],
        columns=["rid", "x", "y"])
    return spark.createDataFrame(pdf), pdf


def test_zorder_key_matches_serial_morton_plain(grid):
    df, pdf = grid
    out = (L.zorder_key(df, ["x", "y"], bits=BITS)
           .select("rid", "zkey").toPandas().set_index("rid")["zkey"])
    for _, r in pdf.iterrows():
        assert out[r.rid] == _morton(r.x, r.y, BITS)


def test_zorder_key_matches_serial_morton_normalized(grid):
    df, pdf = grid
    dims = {"x": (0, 100), "y": (10, 200)}
    out = (L.zorder_key(df, dims, bits=BITS)
           .select("rid", "zkey").toPandas().set_index("rid")["zkey"])
    for _, r in pdf.iterrows():
        expect = _morton(_norm(r.x, 0, 100, BITS),
                         _norm(r.y, 10, 200, BITS), BITS)
        assert out[r.rid] == expect


def test_zorder_key_null_on_out_of_domain_plain(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1, 300], "y": [2, 3]}))  # 300 >= 2^8
    out = L.zorder_key(df, ["x", "y"], bits=8).orderBy("x").collect()
    assert out[0]["zkey"] is not None and out[1]["zkey"] is None


def test_zorder_validation():
    import pyspark.sql  # noqa: F401  (errors raise before any plan runs)
    with pytest.raises(ValueError, match=">= 2 dimensions"):
        L.zorder_key(None, ["x"])
    with pytest.raises(ValueError, match="exceeds 62"):
        L.zorder_key(None, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="hi < lo"):
        L.zorder_key(None, {"x": (5, 1), "y": (0, 1)})
    with pytest.raises(ValueError, match="n_buckets"):
        L.cluster_by_zorder(None, ["x", "y"], n_buckets=0)


def test_cluster_bucket_is_deterministic_div(grid):
    df, pdf = grid
    n_buckets, k = 8, 2
    out = L.cluster_by_zorder(df, ["x", "y"], n_buckets=n_buckets,
                              bits=BITS).select("rid", "zkey", "zbucket")
    width = -(-(1 << (BITS * k)) // n_buckets)
    for r in out.collect():
        assert r["zbucket"] == r["zkey"] // width


def test_layout_audit_spans_collapse_vs_single_key(spark):
    # dense 64x64 grid: a single-key layout leaves the second dimension's
    # per-bucket span at the full domain; z-order shrinks it ~sqrt-wise.
    pdf = pd.DataFrame([(x * 64 + y, x, y)
                        for x in range(64) for y in range(64)],
                       columns=["rid", "x", "y"])
    df = spark.createDataFrame(pdf)
    z = L.cluster_by_zorder(df, ["x", "y"], n_buckets=16, bits=6)
    za = L.layout_audit(z, ["x", "y"]).toPandas()
    assert int(za["n_rows"].sum()) == 64 * 64
    single = df.withColumn("zbucket", F.expr("x div 4"))  # 16 x-buckets
    sa = L.layout_audit(single, ["x", "y"]).toPandas()
    span = lambda a, c: (a[f"{c}_max"] - a[f"{c}_min"]).mean()  # noqa: E731
    # the single-key layout cannot prune y at all
    assert span(sa, "y") == 63
    # z-order: both dims' spans far below the domain on every bucket
    assert span(za, "y") <= 16 and span(za, "x") <= 16
    assert (za["y_max"] - za["y_min"]).max() <= 16


def test_zorder_key_plan_zero_exchange_python_free(grid):
    from profet_spark.plans.inspect import (formatted_plan, is_python_free,
                                            is_shuffle_free)
    df, _ = grid
    z = L.zorder_key(df, ["x", "y"], bits=BITS)
    assert is_shuffle_free(z) and is_python_free(z)
    # a parquet-backed scan keeps the projection (a local relation is
    # constant-folded away) — the OR-chain must stay inside codegen
    ev = df.sparkSession.read.parquet("/root/testdata/sf0.001/events.parquet")
    zp = L.zorder_key(ev, {"user_id": (0, 150), "event_id": (0, 10000)},
                      bits=16)
    assert is_shuffle_free(zp) and is_python_free(zp)
    # '*' prefixes a whole-stage-codegen'd node in formatted mode
    assert "* Project" in formatted_plan(zp)


def test_cluster_plan_single_range_exchange(grid):
    from profet_spark.plans.inspect import formatted_plan, is_python_free
    df, _ = grid
    import re
    c = L.cluster_by_zorder(df, ["x", "y"], n_buckets=8, bits=BITS)
    plan = formatted_plan(c)
    # one detail line per physical node: exactly ONE Exchange, range kind
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1 and "rangepartitioning" in plan
    assert is_python_free(c)
