"""Hypothesis property tests for the dedup family: engine jaccard and
exact dedup vs pure-Python set references on random word corpora."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from profet_spark.operators import dedup

WORDS = ["alpha", "bravo", "cat", "dog", "echo", "fox", "golf", "hotel"]


def docs_strategy():
    doc = hst.lists(hst.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
    return hst.lists(doc, min_size=2, max_size=8)


def _py_jaccard_pairs(texts, k, threshold):
    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= threshold:
                    out[(a, b)] = j
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy(), k=hst.sampled_from([2, 3]))
def test_ngram_jaccard_property(spark, texts, k):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = dedup.ngram_jaccard_pairs(df, k=k, threshold=0.4).toPandas()
    want = _py_jaccard_pairs(texts, k, 0.4)
    got_map = {(int(r.id_a), int(r.id_b)): r.jaccard for _, r in got.iterrows()}
    assert set(got_map) == set(want)
    for pair, j in want.items():
        assert np.isclose(got_map[pair], j, rtol=1e-12), pair


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy())
def test_exact_dedup_property(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    kept = sorted(dedup.exact_dedup(df).toPandas().doc_id)
    norm = [" ".join(t.lower().split()) for t in texts]
    want = sorted({min(i for i, m in enumerate(norm) if m == n)
                   for n in set(norm)})
    assert kept == want


def _vec_strategy():
    # small random embedding sets with a chance of duplicated directions
    elem = hst.floats(min_value=-2.0, max_value=2.0, allow_nan=False,
                      width=32)
    vec = hst.lists(elem, min_size=4, max_size=4)
    return hst.lists(vec, min_size=3, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_vec_strategy(), nc=hst.sampled_from([1, 2, 4]),
       parts=hst.sampled_from([1, 5]))
def test_semantic_dup_pairs_property(spark, vecs, nc, parts):
    """D9 invariants on random vectors: (a) the within-cell pair set is a
    SUBSET of the brute-force tier with bitwise-identical cosines, (b) at
    n_centroids=1 it EQUALS brute, (c) output is invariant to the input
    partitioning (the grouped kernel sorts by id internally)."""
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": range(len(vecs)),
                        "embedding": [list(map(float, v)) for v in vecs]})
    df = spark.createDataFrame(pdf)
    sem = dedup.semantic_dup_pairs(
        df, n_centroids=nc, threshold=0.8, centroids="lowest_id",
        persist=False).toPandas()
    brute = dedup.embedding_dup_pairs(df, threshold=0.8,
                                      persist=False).toPandas()
    smap = {(int(r.id_a), int(r.id_b)): r.cosine for _, r in sem.iterrows()}
    bmap = {(int(r.id_a), int(r.id_b)): r.cosine for _, r in brute.iterrows()}
    assert set(smap) <= set(bmap)
    for pair, c in smap.items():
        assert bmap[pair] == c, pair                   # bitwise
    if nc == 1:
        assert set(smap) == set(bmap)
    rep = dedup.semantic_dup_pairs(
        df.repartition(parts), n_centroids=nc, threshold=0.8,
        centroids="lowest_id", persist=False).toPandas()
    rmap = {(int(r.id_a), int(r.id_b)): (int(r.cid), r.cosine)
            for _, r in rep.iterrows()}
    want = {(int(r.id_a), int(r.id_b)): (int(r.cid), r.cosine)
            for _, r in sem.iterrows()}
    assert rmap == want
