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
