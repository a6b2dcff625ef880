"""Hypothesis property tests for the corpus pipeline tier (P1/P3):
split is a stable total labeling; packing equals the serial prefix sum
for arbitrary token counts, capacities, and partition counts."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from profet_spark.operators import corpus


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=hst.lists(hst.integers(min_value=0, max_value=10**9),
                     min_size=1, max_size=30, unique=True),
       w_train=hst.integers(min_value=0, max_value=10000))
def test_hash_split_is_a_stable_total_labeling(spark, ids, w_train):
    """Every id gets exactly one label; the label is the pure md5 function
    of (salt, id) regardless of which other ids are present."""
    weights = {"train": w_train / 10000, "rest": (10000 - w_train) / 10000}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = corpus.hash_split(df, weights).toPandas()
    assert len(got) == len(ids) and got.split.notna().all()
    for _, r in got.iterrows():
        b = int(hashlib.md5(f"split:{int(r.doc_id)}".encode())
                .hexdigest()[:8], 16) % 10000
        assert r.split_bucket == b
        assert r.split == ("train" if b < w_train else "rest")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=hst.lists(hst.integers(min_value=0, max_value=5000),
                      min_size=0, max_size=40),
       capacity=hst.integers(min_value=1, max_value=4096),
       n_parts=hst.sampled_from([1, 2, 7, 32]))
def test_pack_chunks_equals_serial_prefix_sum(spark, toks, capacity, n_parts):
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    got = (corpus.pack_chunks(df, "n", capacity, n_partitions=n_parts)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(toks)
    acc = 0
    for i, t in enumerate(toks):
        r = got.iloc[i]
        assert (int(r.doc_id), int(r.n_tokens), int(r.start_offset)) == \
            (i, t, acc)
        assert int(r.chunk_id) == acc // capacity
        assert int(r.chunk_offset) == acc % capacity
        acc += t
