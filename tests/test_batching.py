"""B1/B2 image-training batch tier: ground truth, invariants, scale shape."""

import hashlib
from math import inf

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from profet_spark.operators import batching as B

N = 500


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _brute_bucket(w: int, h: int) -> int:
    """Float nearest-ratio with least-index tiebreak — the semantic spec
    the exact-int implementation must reproduce."""
    best, bi = inf, -1
    for i, (bw, bh) in enumerate(B.DEFAULT_ASPECT_BUCKETS):
        d = abs(w / h - bw / bh)
        if d < best - 1e-12:
            best, bi = d, i
    return bi


@pytest.fixture(scope="module")
def imgs(spark):
    pdf = pd.DataFrame({
        "image_id": [f"img{i:04d}" for i in range(N)],
        "w": [64 + (i * 37) % 1900 for i in range(N)],
        "h": [64 + (i * 91) % 1900 for i in range(N)],
    })
    return spark.createDataFrame(pdf), pdf


# ------------------------------------------------------------- B1 buckets

def test_bucket_matches_float_nearest_ratio(imgs):
    df, pdf = imgs
    got = B.assign_aspect_buckets(df).toPandas().set_index("image_id")
    for r in pdf.itertuples():
        want = _brute_bucket(r.w, r.h)
        assert got.loc[r.image_id, "aspect_bucket"] == want, (r.w, r.h)
    bw, bh = B.DEFAULT_ASPECT_BUCKETS[3]
    assert (got.loc[got.aspect_bucket == 3, "aspect_bucket_label"]
            == f"{bw}:{bh}").all()


def test_bucket_exact_tie_goes_to_earlier_index(spark):
    # 2:1 vs 1:2 tie is impossible; construct a real tie: w/h = 7/6 is
    # equidistant in ratio space from nothing in the default list, so
    # pin the documented rule directly on a square: 1:1 (index 0) beats
    # any later bucket at zero distance
    df = spark.createDataFrame([("a", 512, 512)], "image_id string, w int, h int")
    out = B.assign_aspect_buckets(df).collect()[0]
    assert out.aspect_bucket == 0 and out.aspect_bucket_label == "1:1"


def test_bucket_every_default_target_is_reachable(imgs):
    df, _ = imgs
    got = B.assign_aspect_buckets(df).toPandas()
    assert set(got.aspect_bucket) == set(range(len(B.DEFAULT_ASPECT_BUCKETS)))


def test_bucket_rejects_bad_dims_and_collisions(spark, imgs):
    df, _ = imgs
    bad = spark.createDataFrame([("a", 0, 100)], "image_id string, w int, h int")
    with pytest.raises(Exception, match="curation gate"):
        B.assign_aspect_buckets(bad).collect()
    with pytest.raises(ValueError, match="already exists"):
        B.assign_aspect_buckets(df.withColumn("aspect_bucket", F.lit(1)))
    with pytest.raises(ValueError, match=">= 2 buckets"):
        B.assign_aspect_buckets(df, buckets=[(1, 1)])


# ------------------------------------------------------------- B1 batches

def test_batches_fixed_size_one_tail_per_group(imgs):
    df, _ = imgs
    got = B.plan_aspect_batches(df, batch_size=8, n_shards=4).toPandas()
    sizes = got.groupby(["aspect_bucket", "shard", "batch_id"]).size()
    for (_, _, _), n in sizes.items():
        assert 1 <= n <= 8
    # at most one incomplete batch per (bucket, shard), and it is the
    # highest batch_id there
    for (bkt, sh), g in got.groupby(["aspect_bucket", "shard"]):
        bs = g.groupby("batch_id").size()
        tails = bs[bs < 8]
        assert len(tails) <= 1
        if len(tails) == 1:
            assert tails.index[0] == bs.index.max()
    # batch_pos is a permutation of 0..n-1 within each batch
    for _, g in got.groupby(["aspect_bucket", "shard", "batch_id"]):
        assert sorted(g.batch_pos) == list(range(len(g)))
    # is_complete matches actual batch size
    comp = got.groupby(["aspect_bucket", "shard", "batch_id"])[
        "is_complete"].first()
    assert ((sizes == 8) == comp).all()


def test_batches_match_hash_order_ground_truth(imgs):
    df, pdf = imgs
    got = B.plan_aspect_batches(df, batch_size=8, n_shards=4).toPandas()
    oh = pdf.image_id.map(lambda i: _h32(f"batch:{i}"))
    want_shard = (oh % 4).set_axis(pdf.image_id.tolist())
    got_shard = got.set_index("image_id").shard.reindex(want_shard.index)
    assert (got_shard == want_shard).all()
    # recompute rn by sorting (oh, id) within (bucket, shard)
    j = got.merge(pd.DataFrame({"image_id": pdf.image_id, "oh": oh}),
                  on="image_id")
    for _, g in j.groupby(["aspect_bucket", "shard"]):
        g = g.sort_values(["oh", "image_id"]).reset_index(drop=True)
        assert (g.batch_id == g.index // 8).all()
        assert (g.batch_pos == g.index % 8).all()


def test_batches_drop_incomplete_and_partition_invariance(imgs):
    df, _ = imgs
    full = B.plan_aspect_batches(df, batch_size=8, n_shards=4,
                                 drop_incomplete=True).toPandas()
    assert full.is_complete.all()
    assert (full.groupby(["aspect_bucket", "shard", "batch_id"]).size()
            == 8).all()
    a = B.plan_aspect_batches(df.repartition(1), batch_size=8,
                              n_shards=4).toPandas()
    b = B.plan_aspect_batches(df.repartition(13), batch_size=8,
                              n_shards=4).toPandas()
    key = ["image_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[sorted(a.columns)],
        b.sort_values(key).reset_index(drop=True)[sorted(b.columns)])


def test_batches_single_exchange_pure_jvm_plan(imgs):
    df, _ = imgs
    plan = (B.plan_aspect_batches(df, batch_size=8, n_shards=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # both window computations share the ONE (bucket, shard) exchange
    assert plan.count("Exchange") == 1, plan


def test_batches_validation(imgs):
    df, _ = imgs
    with pytest.raises(ValueError, match="batch_size"):
        B.plan_aspect_batches(df, batch_size=0)
    with pytest.raises(ValueError, match="n_shards"):
        B.plan_aspect_batches(df, n_shards=0)
    with pytest.raises(ValueError, match="already exists"):
        B.plan_aspect_batches(df.withColumn("batch_id", F.lit(1)))


# ------------------------------------------------------------- B2 augment

def test_augment_ground_truth_and_bounds(imgs):
    df, pdf = imgs
    got = B.plan_augmentations(df, crop_w=256, crop_h=256,
                               epochs=3).toPandas()
    assert len(got) == 3 * len(pdf)
    j = got.merge(pdf, on="image_id", suffixes=("", "_in"))
    for r in j.itertuples():
        span_x = max(r.w - 256 + 1, 1)
        span_y = max(r.h - 256 + 1, 1)
        assert r.crop_x == _h32(f"aug:x:{r.epoch}:{r.image_id}") % span_x
        assert r.crop_y == _h32(f"aug:y:{r.epoch}:{r.image_id}") % span_y
        assert r.flip == _h32(f"aug:f:{r.epoch}:{r.image_id}") % 2
    # small images clamp to origin
    small = j[(j.w < 256) & (j.h < 256)]
    assert len(small) > 0
    assert (small.crop_x == 0).all() and (small.crop_y == 0).all()


def test_augment_zero_shuffle_plan_and_flip_toggle(imgs):
    df, _ = imgs
    plan = (B.plan_augmentations(df, crop_w=128, crop_h=128)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    out = B.plan_augmentations(df, crop_w=128, crop_h=128, flip=False)
    assert "flip" not in out.columns


def test_augment_validation(imgs):
    df, _ = imgs
    with pytest.raises(ValueError, match="epochs"):
        B.plan_augmentations(df, epochs=0)
    with pytest.raises(ValueError, match="crop dims"):
        B.plan_augmentations(df, crop_w=0)
    with pytest.raises(ValueError, match="already exists"):
        B.plan_augmentations(df.withColumn("crop_x", F.lit(1)))


# ------------------------------------------------------- B1b resize targets

def test_resize_targets_budget_multiple_and_ratio():
    targets = B.bucket_resize_targets(pixel_budget=1024 * 1024, multiple=64)
    assert targets[0] == (1024, 1024)  # square bucket uses the full budget
    for (bw, bh), (tw, th) in zip(B.DEFAULT_ASPECT_BUCKETS, targets):
        assert tw % 64 == 0 and th % 64 == 0
        assert tw * th <= 1024 * 1024
        # within one multiple step of the true ratio in each dimension
        ideal_w = (1024 * 1024 * bw / bh) ** 0.5
        ideal_h = (1024 * 1024 * bh / bw) ** 0.5
        assert 0 <= ideal_w - tw < 64 or tw == 64
        assert 0 <= ideal_h - th < 64 or th == 64
    with pytest.raises(ValueError, match="pixel_budget"):
        B.bucket_resize_targets(pixel_budget=100, multiple=64)


def test_with_resize_targets_maps_buckets(imgs, spark):
    df, _ = imgs
    out = B.with_resize_targets(B.assign_aspect_buckets(df)).toPandas()
    targets = B.bucket_resize_targets()
    for r in out.itertuples():
        tw, th = targets[r.aspect_bucket]
        assert (r.target_w, r.target_h) == (tw, th)
    with pytest.raises(ValueError, match="already exists"):
        B.with_resize_targets(
            B.assign_aspect_buckets(df).withColumn("target_w", F.lit(1)))


# ----------------------------------------------- exact-argmin property

def _int_key_bucket(w: int, h: int) -> int:
    """The lcm-scaled integer key argmin, replicated in pure Python from
    batching._bucket_keys (same formula, same tiebreak)."""
    from math import gcd
    bks = B.DEFAULT_ASPECT_BUCKETS
    lcm = 1
    for _, bh in bks:
        lcm = lcm * bh // gcd(lcm, bh)
    n = len(bks)
    keys = [abs(w * bh - bw * h) * (lcm // bh * n) + i
            for i, (bw, bh) in enumerate(bks)]
    return min(keys) % n


def test_int_argmin_equals_exact_fraction_nearest_fuzz():
    """Property: the cross-multiplied integer argmin equals the TRUE
    exact nearest ratio (Fraction arithmetic, least-index ties) for any
    positive dimensions — the claim the float ground-truth test cannot
    make at ties."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as hst

    bks = B.DEFAULT_ASPECT_BUCKETS

    @settings(max_examples=3000, deadline=None)
    @given(w=hst.integers(1, 1 << 20), h=hst.integers(1, 1 << 20))
    def check(w, h):
        r = Fraction(w, h)
        dists = [abs(r - Fraction(bw, bh)) for bw, bh in bks]
        want = dists.index(min(dists))   # least index on exact ties
        assert _int_key_bucket(w, h) == want, (w, h)

    check()


def test_spark_bucket_equals_python_int_key(spark):
    """The JVM expression computes the same integer-key argmin as the
    Python replica (cross-checks _bucket_keys' codegen form)."""
    import random

    rng = random.Random(7)
    rows = [(str(i), rng.randint(1, 1 << 16), rng.randint(1, 1 << 16))
            for i in range(300)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = B.assign_aspect_buckets(df).toPandas().set_index("image_id")
    for i, w, h in rows:
        assert got.loc[i, "aspect_bucket"] == _int_key_bucket(w, h)


# ------------------------------------------------------------- B3 serving

def test_serving_order_matches_hash_rank_ground_truth(imgs):
    df, _ = imgs
    plan = B.plan_aspect_batches(df, batch_size=16, n_shards=4)
    got = B.epoch_serving_order(plan, epochs=3).toPandas()
    batches = (plan.select("aspect_bucket", "shard", "batch_id")
               .distinct().toPandas())
    n_batches = len(batches)
    for epoch in (1, 2, 3):
        g = got[got.epoch == epoch]
        assert len(g) == n_batches
        # ground truth: sort by (h32 key, batch identity)
        keys = batches.apply(
            lambda r: (_h32(f"serve:{epoch}:{r.aspect_bucket}:{r.shard}"
                            f":{r.batch_id}"),
                       r.aspect_bucket, r.shard, r.batch_id), axis=1)
        want = batches.assign(k=keys).sort_values("k").reset_index(drop=True)
        want["serve_pos"] = range(len(want))
        m = g.merge(want, on=["aspect_bucket", "shard", "batch_id"],
                    suffixes=("", "_w"))
        assert (m.serve_pos == m.serve_pos_w).all()
        assert (m.serve_key == m.k.map(lambda t: t[0])).all()
        # dense permutation of [0, n_batches)
        assert sorted(g.serve_pos) == list(range(n_batches))


def test_serving_order_epochs_are_distinct_permutations(imgs):
    df, _ = imgs
    plan = B.plan_aspect_batches(df, batch_size=16, n_shards=4)
    got = B.epoch_serving_order(plan, epochs=2).toPandas()
    p1 = (got[got.epoch == 1]
          .sort_values(["aspect_bucket", "shard", "batch_id"])
          .serve_pos.tolist())
    p2 = (got[got.epoch == 2]
          .sort_values(["aspect_bucket", "shard", "batch_id"])
          .serve_pos.tolist())
    assert p1 != p2   # different epochs shuffle differently
    # rerun is bitwise identical (pure function of salt/epoch/identity)
    again = B.epoch_serving_order(plan, epochs=2).toPandas()
    m = got.merge(again, on=["epoch", "aspect_bucket", "shard", "batch_id"],
                  suffixes=("", "_2"))
    assert (m.serve_pos == m.serve_pos_2).all()


def test_serving_order_matches_duckdb_oracle(imgs):
    import duckdb

    df, _ = imgs
    plan = B.plan_aspect_batches(df, batch_size=16, n_shards=4)
    got = (B.epoch_serving_order(plan, epochs=2).toPandas()
           .sort_values(["epoch", "serve_pos"]).reset_index(drop=True))
    bpdf = (plan.select("aspect_bucket", "shard", "batch_id")
            .distinct().toPandas())
    con = duckdb.connect()
    con.register("batches", bpdf)
    cols = ["aspect_bucket", "shard", "batch_id"]
    k = B.serve_key_sql_duckdb(cols)
    want = con.execute(f"""
        WITH rep AS (
          SELECT b.*, CAST(e.epoch AS BIGINT) AS epoch
          FROM batches b, (SELECT unnest(range(1, 3)) AS epoch) e),
        keyed AS (SELECT *, {k} AS serve_key FROM rep)
        SELECT epoch, aspect_bucket, shard, batch_id, serve_key,
               CAST(row_number() OVER (
                 PARTITION BY epoch
                 ORDER BY serve_key, aspect_bucket, shard, batch_id)
                 - 1 AS BIGINT) AS serve_pos
        FROM keyed ORDER BY epoch, serve_pos
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_serving_order_validation(imgs):
    df, _ = imgs
    plan = B.plan_aspect_batches(df, batch_size=16, n_shards=4)
    with pytest.raises(ValueError, match="epochs"):
        B.epoch_serving_order(plan, epochs=0)
    with pytest.raises(ValueError, match="batch_cols"):
        B.epoch_serving_order(df, epochs=1)  # no plan columns
    with pytest.raises(ValueError, match="already exists"):
        B.epoch_serving_order(plan.withColumn("serve_pos", F.lit(1)),
                              epochs=1)
