"""Text-analysis functions: hand-computed expectations on tiny rows."""

import numpy as np
import pytest

from profet_spark.functions import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the key table row a the"),          # en-heavy
        (1, "agg hash sort merge agg hash"),     # de-lexicon heavy
        (2, "Hello, World! 42 times."),
        (3, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_language_id(docs):
    got = ts.add_language_id(docs).toPandas().set_index("doc_id")
    assert got.loc[0, "pred_lang"] == "en"
    assert got.loc[0, "pred_score"] == 6 / 6
    assert got.loc[1, "pred_lang"] == "de"
    assert got.loc[1, "pred_score"] == 1.0
    # no lexicon hits -> all scores 0 -> tie broken to smallest lang code
    assert got.loc[2, "pred_lang"] == "de" and got.loc[2, "pred_score"] == 0.0
    assert got.loc[3, "pred_score"] == 0.0


def test_quality_features(docs):
    got = ts.add_quality_features(docs).toPandas().set_index("doc_id")
    r = got.loc[2]  # "Hello, World! 42 times." -> 4 ws tokens
    assert r.n_tokens == 4
    alpha = len("helloworldtimes")
    assert r.alpha_ratio == alpha / len("Hello, World! 42 times.")
    assert r.mean_tok_len == alpha / 4
    assert r.stopword_ratio == 0.0
    expected = 0.4 * r.alpha_ratio + 0.3 * min(4 / 32.0, 1.0) + 0.3 * 0.0
    assert np.isclose(r.quality_score, expected)
    assert got.loc[3].quality_score == 0.0


def test_token_counts(docs):
    got = ts.add_token_counts(docs).toPandas().set_index("doc_id")
    assert got.loc[0, "ws_tokens"] == 6
    # "hello, world! 42 times." -> hello , world ! 42 times . => 7
    assert got.loc[2, "bpe_tokens"] == 7
    assert got.loc[3, "ws_tokens"] == 0 and got.loc[3, "bpe_tokens"] == 0


def test_fingerprint_invariance(spark):
    """Identical normalized content -> identical fingerprint; different
    content -> (w.h.p.) different; short docs get the -1 sentinel."""
    rows = [(0, "a b c d e f"), (1, "A  B C D E F"), (2, "x y z q w e"), (3, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = ts.add_fingerprint(df).toPandas().set_index("doc_id")
    assert got.loc[0, "fp_minhash"] == got.loc[1, "fp_minhash"]
    assert got.loc[0, "fp_windows"] == 3
    assert got.loc[0, "fp_minhash"] != got.loc[2, "fp_minhash"]
    assert got.loc[3, "fp_minhash"] == -1 and got.loc[3, "fp_windows"] == 0


def test_repetition_features(docs):
    """T5 hand-check: exact duplicate-mass and top-gram-mass ratios."""
    got = ts.add_repetition_features(docs).toPandas().set_index("doc_id")
    # doc 0 "the key table row a the": 5 bigrams, all distinct
    assert got.loc[0, "dup_2gram_frac"] == 0.0
    assert got.loc[0, "top_2gram_frac"] == 1 / 5
    # doc 1 "agg hash sort merge agg hash": bigrams agg-hash x2,
    # hash-sort, sort-merge, merge-agg -> total 5, distinct 4, max 2
    assert got.loc[1, "dup_2gram_frac"] == 1 / 5
    assert got.loc[1, "top_2gram_frac"] == 2 / 5
    # trigrams of doc 1: 4 windows, all distinct
    assert got.loc[1, "dup_3gram_frac"] == 0.0
    assert got.loc[1, "top_3gram_frac"] == 1 / 4
    # empty doc -> all zeros (no windows)
    assert got.loc[3, "dup_2gram_frac"] == 0.0
    assert got.loc[3, "top_3gram_frac"] == 0.0


def test_repetition_degenerate_loop(spark):
    """A looping document approaches dup_frac -> 1, top_frac -> 1."""
    df = spark.createDataFrame([(0, ("spam " * 50).strip())],
                               ["doc_id", "text"])
    got = ts.add_repetition_features(df).toPandas()
    assert got.loc[0, "dup_2gram_frac"] == 48 / 49
    assert got.loc[0, "top_2gram_frac"] == 1.0
    assert got.loc[0, "top_3gram_frac"] == 1.0


def test_null_text_scores_like_empty(spark):
    """NULL text = missing document: zero tokens and quality 0.0 — not
    NULL counts with a free 0.3 score from least() skipping the NULL
    length term."""
    df = spark.createDataFrame([(0, None), (1, "")], "doc_id int, text string")
    got = (ts.add_token_counts(ts.add_quality_features(df))
           .toPandas().set_index("doc_id"))
    for c in ["n_tokens", "ws_tokens", "bpe_tokens"]:
        assert got[c].tolist() == [0, 0], c
    assert got.quality_score.tolist() == [0.0, 0.0]
    assert got.mean_tok_len.tolist() == [0.0, 0.0]


def test_null_text_matches_duckdb_oracle(spark):
    """The null-as-empty contract holds bitwise against the SQL twin
    (testdata has no NULL texts, so this pins the off-testdata case)."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_for_nulltext", "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import pandas as pd
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": [None, "", "the a\tx\nof"]})
    sdf = spark.createDataFrame(docs)
    got = (ts.add_token_counts(ts.add_quality_features(sdf))
           .select("doc_id", "n_tokens", "quality_score", "ws_tokens",
                   "bpe_tokens")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    q = mod.oracle_sql()["t2_quality_score"]
    want_q = (con.execute(q).df()
              .sort_values("doc_id").reset_index(drop=True))
    assert got.n_tokens.tolist() == want_q.n_tokens.tolist()
    assert got.quality_score.tolist() == want_q.quality_score.tolist()
    want_t = (con.execute(mod.oracle_sql()["t3_token_counts"]).df()
              .sort_values("doc_id").reset_index(drop=True))
    assert got.ws_tokens.tolist() == want_t.ws_tokens.tolist()
    assert got.bpe_tokens.tolist() == want_t.bpe_tokens.tolist()
    # the \s token class: tab/newline are separators, not phantom tokens
    assert got.bpe_tokens.tolist()[2] == 4


# ------------------------------------------------------------------ T6

@pytest.fixture(scope="module")
def pii_docs(spark):
    import pandas as pd
    rows = [
        "mail me at john.doe+spam@sub.example.co.uk now",
        "server 192.168.0.1 and 10.255.255.255 up",
        "ssn 123-45-6789 but not 1234-56-789",
        "call +1 (415) 555-0199 or +49 30 1234567 ok",
        "mixed: a@b.io 1.2.3.4 999-88-7777 +33 600000000",
        "clean text, nothing to see 123-456",
        "edge a@b.c x@y.zz 300.1.2.3",
        "",
        None,
    ]
    pdf = pd.DataFrame({"doc_id": range(len(rows)), "text": rows})
    return spark.createDataFrame(pdf), pdf


def test_scrub_pii_masks_and_counts(pii_docs):
    sdf, _ = pii_docs
    got = {r["doc_id"]: r for r in
           ts.scrub_pii(sdf, "text").orderBy("doc_id").collect()}
    assert got[0]["text_scrubbed"] == "mail me at <EMAIL> now"
    assert got[0]["n_pii_email"] == 1
    assert got[1]["text_scrubbed"] == "server <IP> and <IP> up"
    assert got[1]["n_pii_ipv4"] == 2
    assert got[2]["text_scrubbed"] == "ssn <SSN> but not 1234-56-789"
    assert got[3]["n_pii_phone"] == 2
    assert (got[4]["n_pii_email"], got[4]["n_pii_ssn"],
            got[4]["n_pii_ipv4"], got[4]["n_pii_phone"]) == (1, 1, 1, 1)
    assert got[5]["text_scrubbed"] == got[5]["text"]  # clean row untouched
    # one-letter TLD is not an email; unvalidated octets still mask (recall
    # bias is deliberate for a scrubbing pass)
    assert got[6]["text_scrubbed"] == "edge a@b.c <EMAIL> <IP>"
    assert got[8]["text_scrubbed"] == ""              # NULL reads as empty
    assert got[8]["n_pii_email"] == 0


def test_scrub_pii_matches_duckdb_bitwise(pii_docs):
    import duckdb
    _, pdf = pii_docs
    sdf, _ = pii_docs
    got = ts.scrub_pii(sdf, "text").orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    expr, counts = ts.scrub_pii_sql_duckdb("text")
    want = con.execute(
        f"SELECT doc_id, {expr} AS text_scrubbed, {', '.join(counts)} "
        f"FROM t ORDER BY doc_id").df()
    for c in ("text_scrubbed", "n_pii_email", "n_pii_ssn", "n_pii_ipv4",
              "n_pii_phone"):
        assert got[c].tolist() == want[c].tolist(), c


def test_scrub_pii_collision_guard_and_plan(pii_docs):
    sdf, _ = pii_docs
    with pytest.raises(ValueError, match="already exists"):
        ts.scrub_pii(ts.scrub_pii(sdf, "text"), "text")
    plan = ts.scrub_pii(sdf, "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan        # pure map-side projection
    assert "BatchEvalPython" not in plan  # zero Python in the plan
