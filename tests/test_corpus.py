"""P1-P4 corpus pipeline operators: determinism, ground truth, scale shape."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from profet_spark.operators import corpus

N = 400


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "doc_id": range(N),
        "lang": rng.choice(["en", "de", "fr"], N),
        "n_tok": rng.integers(1, 500, N).astype("int64"),
        "text": [" ".join(rng.choice(["a", "bb", "ccc", "Dd", "e"],
                                     rng.integers(1, 12)))
                 for _ in range(N)],
    })
    return spark.createDataFrame(pdf), pdf


# ------------------------------------------------------------------ P1

def test_hash_split_matches_md5_ground_truth(docs):
    df, pdf = docs
    got = corpus.hash_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}).toPandas()
    buckets = pdf.doc_id.map(lambda i: _h32(f"split:{i}") % 10000)
    want = np.where(buckets < 8000, "train",
                    np.where(buckets < 9000, "val", "test"))
    got = got.sort_values("doc_id")
    assert (got.split_bucket.to_numpy() ==
            buckets[got.doc_id].to_numpy()).all()
    assert (got.split.to_numpy() == want[got.doc_id]).all()
    # deterministic across invocations and stable under corpus growth
    sub = corpus.hash_split(df.where(df.doc_id < 50),
                            {"train": 0.8, "val": 0.1, "test": 0.1}).toPandas()
    merged = sub.merge(got, on="doc_id", suffixes=("_sub", ""))
    assert (merged.split_sub == merged.split).all()


def test_hash_split_rejects_bad_weights(docs):
    df, _ = docs
    with pytest.raises(ValueError, match="sum"):
        corpus.hash_split(df, {"a": 0.5, "b": 0.4})


# ------------------------------------------------------------------ P2

def test_stratified_sample_rates_and_nesting(docs):
    df, pdf = docs
    small = corpus.stratified_sample(
        df, {"en": 0.2, "de": 0.5}, strata_col="lang").toPandas()
    big = corpus.stratified_sample(
        df, {"en": 0.6, "de": 0.9, "fr": 0.3}, strata_col="lang").toPandas()
    assert set(small.lang) <= {"en", "de"}  # fr absent from the allowlist
    # nesting under the same salt
    assert set(small.doc_id) <= set(big.doc_id)
    # exact membership rule
    buckets = pdf.doc_id.map(lambda i: _h32(f"sample:{i}") % 10000)
    want = pdf[(pdf.lang == "en") & (buckets < 2000)
               | (pdf.lang == "de") & (buckets < 5000)]
    assert sorted(small.doc_id) == sorted(want.doc_id)
    # scalar-rate form
    flat = corpus.stratified_sample(df, 0.25).toPandas()
    assert sorted(flat.doc_id) == sorted(pdf.doc_id[buckets < 2500])


# ------------------------------------------------------------------ P3

def _pack_ground_truth(pdf, capacity):
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    end = pdf.n_tok.cumsum()
    start = end - pdf.n_tok
    return pd.DataFrame({
        "doc_id": pdf.doc_id, "n_tokens": pdf.n_tok,
        "start_offset": start, "chunk_id": start // capacity,
        "chunk_offset": start % capacity})


def test_pack_chunks_matches_serial_cumsum(docs):
    df, pdf = docs
    got = (corpus.pack_chunks(df, "n_tok", capacity=1024)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    want = _pack_ground_truth(pdf, 1024)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pack_chunks_invariant_to_partition_count(docs):
    df, _ = docs
    a = (corpus.pack_chunks(df, "n_tok", 512, n_partitions=1)
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    for p in (3, 16, 64):
        b = (corpus.pack_chunks(df, "n_tok", 512, n_partitions=p)
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


def test_pack_chunks_empty_and_validation(docs, spark):
    df, _ = docs
    empty = corpus.pack_chunks(df.where(df.doc_id < 0), "n_tok", 64).toPandas()
    assert empty.empty and "chunk_id" in empty.columns
    with pytest.raises(ValueError, match="capacity"):
        corpus.pack_chunks(df, "n_tok", 0)
    with pytest.raises(ValueError, match="integral"):
        corpus.pack_chunks(df.withColumn("bad", F.lit(1.5)), "bad", 64)
    with pytest.raises(Exception, match="negative"):
        corpus.pack_chunks(df.withColumn("neg", F.lit(-1).cast("bigint")),
                           "neg", 64).count()
    with pytest.raises(Exception, match="NULL token"):
        corpus.pack_chunks(
            df.withColumn("nul", F.when(df.doc_id == 7, None)
                          .otherwise(F.lit(1)).cast("bigint")),
            "nul", 64).count()


def test_pack_chunks_sharded_rejects_null_and_negative(docs):
    """The two P3 variants enforce the same token contract: a window sum
    would silently read NULL as 0 and walk offsets backwards on negative
    counts — both must fail loudly instead."""
    df, _ = docs
    for bad in (F.lit(-5), F.when(df.doc_id == 7, None).otherwise(F.lit(1))):
        with pytest.raises(Exception, match="NULL or negative token count"):
            corpus.pack_chunks_sharded(
                df.withColumn("bad_tok", bad.cast("bigint")),
                "bad_tok", 64, shard_col="lang").count()


def test_split_and_sample_reject_null_ids(docs):
    """A NULL id would hash to a NULL bucket → the row silently joins no
    split and survives no sample; the operators raise instead."""
    df, _ = docs
    nid = df.withColumn(
        "doc_id", F.when(df.doc_id == 7, None).otherwise(df.doc_id))
    with pytest.raises(Exception, match="non-null"):
        corpus.hash_split(nid, {"train": 1.0}).count()
    with pytest.raises(Exception, match="non-null"):
        corpus.stratified_sample(nid, 1.0).count()
    with pytest.raises(ValueError, match="empty rates"):
        corpus.stratified_sample(df, {}, strata_col="lang")


def test_pack_chunks_plan_has_no_global_window(docs):
    """The scale claim: a range exchange + broadcast offset join — never a
    single-partition global window OVER THE DATA (which would serialize
    100 TB through one task). The only window allowed is the P-row
    exclusive prefix over the per-partition totals (keyed by _pid)."""
    df, _ = docs
    plan = (corpus.pack_chunks(df, "n_tok", 1024, n_partitions=8)
            ._jdf.queryExecution().executedPlan().toString())
    specs = [seg for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs, "expected the P-row offsets window"
    # partition key is the warning-silencing constant pmod(_pid, 1)
    # (projected to an internal _wN alias) and the order key is _pid —
    # either way, keyed by _pid, never by a data column
    assert all(s.startswith(("_pid", "pmod(_pid", "_w"))
               and "_pid#" in s.split("specifiedwindowframe")[0]
               for s in specs), specs
    assert "rangepartitioning" in plan or "RangePartitioning" in plan


def test_pack_chunks_unpersisted_reuses_one_range_exchange(docs):
    """persist=False safety: the totals branch and the probe branch must
    share ONE materialized range shuffle (AQE ReusedExchange), otherwise
    repartitionByRange's per-execution boundary sampling could hand the
    offsets join a different _pid layout than the one the totals were
    summed over."""
    df, _ = docs
    out = corpus.pack_chunks(df, "n_tok", 1024, n_partitions=8,
                             persist=False)
    out.collect()  # finalize the adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    head = plan.split("Initial Plan")[0]
    # either marker proves single materialization: AQE stage reuse, or
    # cacheManager substituting a cache left by a persist=True call with
    # the same canonical plan (both branches then read the same blocks)
    assert ("ReusedExchange" in head and "rangepartitioning" in head) \
        or "InMemoryTableScan" in head or "TableCacheQueryStage" in head


# ------------------------------------------------------------------ P4

def test_tfidf_matches_pandas_ground_truth(docs):
    df, pdf = docs
    got = corpus.tfidf(df).toPandas()
    rows = []
    for _, r in pdf.iterrows():
        toks = r.text.strip().lower().split()
        for w in set(toks):
            rows.append((r.doc_id, w, toks.count(w)))
    tf = pd.DataFrame(rows, columns=["doc_id", "word", "tf"])
    dfreq = tf.groupby("word").size().rename("df").reset_index()
    want = tf.merge(dfreq, on="word")
    want["tfidf"] = want.tf.astype(float) * float(N + 1) / (want.df + 1.0)
    got = got.sort_values(["doc_id", "word"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "word"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tfidf_min_df_and_known_n(docs):
    df, _ = docs
    full = corpus.tfidf(df).toPandas()
    pruned = corpus.tfidf(df, min_df=5).toPandas()
    assert set(pruned.word) == set(full.word[full["df"] >= 5])
    # n_docs passed from table stats skips the count but changes nothing
    byhand = corpus.tfidf(df, n_docs=N).toPandas()
    assert np.array_equal(
        byhand.sort_values(["doc_id", "word"]).tfidf.to_numpy(),
        full.sort_values(["doc_id", "word"]).tfidf.to_numpy())


def test_stratified_sample_rejects_out_of_range_rates(docs):
    df, _ = docs
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        corpus.stratified_sample(df, 1.5)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        corpus.stratified_sample(df, {"en": -0.1}, strata_col="lang")


def test_pack_chunks_sharded_matches_per_shard_serial(docs):
    """Sharded packing == independent serial packing of each shard."""
    df, pdf = docs
    got = (corpus.pack_chunks_sharded(df, "n_tok", 1024, shard_col="lang")
           .toPandas().sort_values(["lang", "doc_id"]).reset_index(drop=True))
    parts = []
    for lang, grp in pdf.groupby("lang"):
        g = _pack_ground_truth(grp.reset_index(drop=True), 1024)
        g.insert(0, "lang", lang)
        parts.append(g)
    want = (pd.concat(parts).sort_values(["lang", "doc_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pure-JVM single-exchange plan: no Python nodes, exactly one
    # hashpartitioning exchange (the shard window)
    plan = (corpus.pack_chunks_sharded(df, "n_tok", 1024, shard_col="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_corpus_tier_on_string_id_snapshot_table(spark):
    """The north-rule input shape has image_id:string — the corpus tier
    must work unchanged on string ids (hash_split salts the string id
    directly; packing range-partitions on it)."""
    from profet_spark import fixtures

    pdf = fixtures.make_fixture(n_entities=60, with_images=False)
    df = fixtures.to_spark(spark, pdf)
    latest = (df.groupBy("image_id")
              .agg(F.max(F.length("caption")).alias("cap_len")))
    split = corpus.hash_split(latest, {"train": 0.9, "val": 0.1},
                              id_col="image_id").toPandas()
    assert len(split) == 60 and split.split.notna().all()
    for _, r in split.iterrows():
        assert r.split_bucket == _h32(f"split:{r.image_id}") % 10000
    samp = corpus.stratified_sample(latest, 0.5, id_col="image_id")
    assert 0 < samp.count() < 60
    packed = (corpus.pack_chunks(latest, "cap_len", 256,
                                 order_col="image_id")
              .toPandas().sort_values("image_id").reset_index(drop=True))
    ordered = (latest.toPandas().sort_values("image_id")
               .reset_index(drop=True))
    assert (packed.image_id == ordered.image_id).all()
    acc = 0
    for i, t in enumerate(ordered.cap_len):
        assert int(packed.start_offset[i]) == acc
        acc += int(t)


# ------------------------------------------------------------- P5 negatives


def test_hash_ring_negatives_bijection_and_determinism(spark):
    ids = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    sdf = spark.createDataFrame(ids)
    out = corpus.hash_ring_negatives(sdf, "doc_id", k=3, n_buckets=8)
    pdf = out.toPandas()
    assert len(pdf) == 3000
    # never self; with 1000 ids over 8 buckets no singleton buckets
    assert pdf.neg_id.notna().all()
    assert (pdf.neg_id != pdf.doc_id).all()
    # the ring successor is a bijection: per round, every id is the
    # negative of exactly one anchor — perfectly balanced usage
    for r, g in pdf.groupby("r"):
        assert g.neg_id.is_unique
        assert set(g.neg_id) == set(ids.doc_id)
    # rounds are independent draws (not all identical pairings)
    byr = pdf.pivot(index="doc_id", columns="r", values="neg_id")
    assert (byr[1] != byr[2]).any()
    # deterministic across invocations
    again = corpus.hash_ring_negatives(sdf, "doc_id", k=3, n_buckets=8)
    assert sorted(map(tuple, pdf.itertuples(index=False))) == \
        sorted(map(tuple, again.toPandas().itertuples(index=False)))


def test_hash_ring_negatives_singleton_and_guards(spark):
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [42]}))
    pdf = corpus.hash_ring_negatives(one, "doc_id", k=2).toPandas()
    # alone in every bucket: NULL negative, loudly absent — never self
    assert len(pdf) == 2 and pdf.neg_id.isna().all()
    with pytest.raises(ValueError, match="k must be"):
        corpus.hash_ring_negatives(one, "doc_id", k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        corpus.hash_ring_negatives(one, "doc_id", n_buckets=0)
    null_id = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.array([1, None], dtype="Int64")}))
    with pytest.raises(Exception, match="NULL doc_id"):
        corpus.hash_ring_negatives(null_id, "doc_id").collect()


def test_hash_ring_negatives_plan_one_exchange(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)}))
    out = corpus.hash_ring_negatives(sdf, "doc_id", k=4, n_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only shuffle is the narrow (r, bucket) hash exchange
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan


# ------------------------------------------------------------------ P6

@pytest.fixture(scope="module")
def decon_tables(spark):
    """A corpus with planted eval contamination: docs 0/1 contain a
    verbatim eval 3-gram, doc 2 is clean, doc 3 is too short to shingle."""
    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox jumps over lazy dogs",   # hits "quick brown fox"
            "QUICK brown FOX is case folded here too",    # case-insensitive hit
            "completely clean document with no overlap",  # clean
            "too short",                                  # < 3 words -> 0 shingles
        ],
    }))
    evals = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100, 101],
        "text": [
            "benchmark asks about the quick brown fox riddle",
            "another eval question entirely",
        ],
    }))
    return train, evals


def test_decontaminate_flags_planted_overlap(decon_tables):
    train, evals = decon_tables
    out = corpus.decontaminate(train, evals, n=3).orderBy("doc_id").collect()
    got = {r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated"])
           for r in out}
    assert got[0][2] and got[0][1] >= 1          # verbatim hit
    assert got[1][2] and got[1][1] >= 1          # case-folded hit
    assert got[2] == (4, 0, False)               # 6 words -> 4 shingles, clean
    assert got[3] == (0, 0, False)               # unshingleable -> clean
    # flag mode preserves every input row and the original columns first
    assert len(out) == 4
    assert [f for f in corpus.decontaminate(train, evals, n=3).columns] == [
        "doc_id", "text", "n_shingles", "n_contaminated", "contaminated"]


def test_decontaminate_drop_mode_and_min_hits(decon_tables):
    train, evals = decon_tables
    kept = corpus.decontaminate(train, evals, n=3, mode="drop")
    assert kept.columns == ["doc_id", "text"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # min_hits above the planted overlap count keeps everything
    all_kept = corpus.decontaminate(train, evals, n=3, min_hits=99,
                                    mode="drop")
    assert all_kept.count() == 4


def test_decontaminate_matches_pandas_ground_truth(docs):
    sdf, pdf = docs
    evals = sdf.where(F.col("doc_id") % 7 == 0)
    train = sdf.where(F.col("doc_id") % 7 != 0)
    out = corpus.decontaminate(train, evals, n=2).toPandas()

    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}

    probe = set().union(*(shingles(t) for t in
                          pdf[pdf.doc_id % 7 == 0].text)) or set()
    for _, r in out.iterrows():
        sh = shingles(pdf.loc[pdf.doc_id == r.doc_id, "text"].iloc[0])
        assert r.n_shingles == len(sh)
        assert r.n_contaminated == len(sh & probe)
        assert r.contaminated == (len(sh & probe) >= 1)


def test_decontaminate_validation_and_collisions(decon_tables):
    train, evals = decon_tables
    with pytest.raises(ValueError, match="n must be"):
        corpus.decontaminate(train, evals, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        corpus.decontaminate(train, evals, min_hits=0)
    with pytest.raises(ValueError, match="mode"):
        corpus.decontaminate(train, evals, mode="audit")
    with pytest.raises(ValueError, match="collision"):
        corpus.decontaminate(train.withColumn("contaminated", F.lit(True)),
                             evals)
    # drop mode tolerates output-name collisions (it never emits them)
    assert corpus.decontaminate(
        train.withColumn("contaminated", F.lit(True)), evals,
        n=3, mode="drop").count() == 2


def test_decontaminate_plan_broadcasts_both_small_sides(decon_tables):
    train, evals = decon_tables
    plan = corpus.decontaminate(train, evals, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2   # probes + hit-table joins
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ------------------------------------------------------------------ P7

def test_mixture_weights_ground_truth(docs):
    df, pdf = docs
    w = {"en": 2.5, "de": 1.0, "fr": 0.4}
    got = corpus.mixture_weights(df, w, strata_col="lang").toPandas()
    rows = []
    for r in pdf.itertuples():
        wv = w.get(r.lang, 0.0)
        n = int(wv) + (1 if _h32(f"mix:{r.doc_id}") % 10000
                       < round((wv - int(wv)) * 10000) else 0)
        rows.extend((r.doc_id, k) for k in range(1, n + 1))
    want = sorted(rows)
    assert sorted(zip(got.doc_id, got.rep)) == want
    # realized mix approximates the target on a 400-row corpus
    en = (pdf.lang == "en").sum()
    got_en = (got.lang == "en").sum()
    assert abs(got_en / en - 2.5) < 0.2


def test_mixture_weights_zero_shuffle_plan_and_validation(docs):
    df, _ = docs
    plan = (corpus.mixture_weights(df, {"en": 2.0}, strata_col="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    with pytest.raises(ValueError, match="empty weights"):
        corpus.mixture_weights(df, {}, strata_col="lang")
    with pytest.raises(ValueError, match="must be in"):
        corpus.mixture_weights(df, {"en": 100.0}, strata_col="lang")
    with pytest.raises(ValueError, match="must be in"):
        corpus.mixture_weights(df, {"en": -0.5}, strata_col="lang")
    with pytest.raises(ValueError, match="already exists"):
        corpus.mixture_weights(df.withColumn("rep", F.lit(1)),
                               {"en": 2.0}, strata_col="lang")


def test_mixture_weights_down_and_drop(docs):
    df, pdf = docs
    got = corpus.mixture_weights(df, {"en": 0.3}, strata_col="lang").toPandas()
    # sub-1 weight down-samples exactly like stratified_sample's rule
    kept = corpus.stratified_sample(
        df.where(F.col("lang") == "en"), 0.3, salt="mix").toPandas()
    assert sorted(got.doc_id) == sorted(kept.doc_id)
    assert (got.rep == 1).all()
    # strata absent from the mapping are dropped
    assert set(got.lang) == {"en"}


# ------------------------------------------------------------------ P8

def _chunk_ref(text: str, C: int, S: int) -> list[tuple[int, int, str]]:
    """Serial reference: (chunk_idx, chunk_start, chunk_text)."""
    L = len(text)
    n = 1 if L <= C else 1 + -((L - C) // -S)  # ceil
    return [(i, i * S, text[i * S:i * S + C]) for i in range(n)]


@pytest.fixture(scope="module")
def chunk_docs(spark):
    texts = [
        "",                         # empty -> one empty chunk
        "x",                        # single char
        "a" * 10,                   # exactly chunk_chars (C=10 below)
        "b" * 11,                   # one past the boundary
        "c" * 25,                   # multi-chunk
        "héllo wörld ünïcode " * 5,  # multi-byte: char semantics, not bytes
        " \t\n" * 7,                # whitespace-only
        "".join(chr(0x3041 + (i % 80)) for i in range(97)),  # hiragana
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf), pdf


def test_chunk_documents_matches_serial_reference(chunk_docs):
    df, pdf = chunk_docs
    C, S = 10, 7
    got = (corpus.chunk_documents(df, chunk_chars=C, stride=S)
           .toPandas().sort_values(["doc_id", "chunk_idx"]))
    want = []
    for _, r in pdf.iterrows():
        for i, st, tx in _chunk_ref(r.text, C, S):
            want.append((r.doc_id, i, st, len(tx), tx))
    got_t = list(got[["doc_id", "chunk_idx", "chunk_start", "chunk_len",
                      "chunk_text"]].itertuples(index=False, name=None))
    assert got_t == want
    # n_chunks is constant per doc and equals the emitted row count
    per = got.groupby("doc_id").agg(n=("chunk_idx", "size"),
                                    nc=("n_chunks", "max"))
    assert (per.n == per.nc).all()


def test_chunk_documents_coverage_and_tail_invariants(chunk_docs):
    df, pdf = chunk_docs
    C, S = 10, 7
    got = (corpus.chunk_documents(df, chunk_chars=C, stride=S)
           .toPandas().sort_values(["doc_id", "chunk_idx"]))
    for doc_id, g in got.groupby("doc_id"):
        text = pdf.loc[pdf.doc_id == doc_id, "text"].iloc[0]
        # overlap-trimmed concat reconstructs the document exactly
        rebuilt = "".join(
            t if i == 0 else t[C - S:]
            for i, t in zip(g.chunk_idx, g.chunk_text))
        assert rebuilt == text
        last = g.iloc[-1]
        # the last chunk reaches the end of the document
        assert last.chunk_start + last.chunk_len == max(len(text), 0) \
            or (len(text) == 0 and last.chunk_len == 0)
        # multi-chunk tails always carry NEW content beyond the overlap
        if len(g) > 1:
            assert last.chunk_len > C - S


def test_chunk_documents_matches_duckdb_oracle(chunk_docs):
    import duckdb

    df, pdf = chunk_docs
    C, S = 10, 7
    got = (corpus.chunk_documents(df, chunk_chars=C, stride=S)
           .toPandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (con.execute(corpus.chunk_documents_sql_duckdb(C, S)).df()
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want.astype({"doc_id": "int64"}),
        check_dtype=False)


def test_chunk_documents_validation(chunk_docs, spark):
    df, _ = chunk_docs
    with pytest.raises(ValueError, match="chunk_chars must be >= 1"):
        corpus.chunk_documents(df, chunk_chars=0, stride=1)
    with pytest.raises(ValueError, match="stride must be in"):
        corpus.chunk_documents(df, chunk_chars=10, stride=0)
    with pytest.raises(ValueError, match="stride must be in"):
        corpus.chunk_documents(df, chunk_chars=10, stride=11)
    with pytest.raises(ValueError, match="collision"):
        corpus.chunk_documents(df.withColumn("chunk_idx", F.lit(1)),
                               chunk_chars=10, stride=7)
    nul = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [None]}),
        schema="doc_id bigint, text string")
    with pytest.raises(Exception, match="NULL text"):
        corpus.chunk_documents(nul, chunk_chars=10, stride=7).collect()


def test_chunk_documents_zero_shuffle_plan(chunk_docs):
    df, _ = chunk_docs
    plan = (corpus.chunk_documents(df, chunk_chars=10, stride=7)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Window" not in plan


def test_chunk_documents_stride_equals_chunk_no_overlap(chunk_docs):
    df, pdf = chunk_docs
    got = (corpus.chunk_documents(df, chunk_chars=8, stride=8)
           .toPandas().sort_values(["doc_id", "chunk_idx"]))
    for doc_id, g in got.groupby("doc_id"):
        text = pdf.loc[pdf.doc_id == doc_id, "text"].iloc[0]
        assert "".join(g.chunk_text) == text


# ------------------------------------------------------------------ P9

def test_build_vocab_matches_counter_ground_truth(docs):
    from collections import Counter

    df, pdf = docs
    K = 3
    got = corpus.build_vocab(df, top_k=K).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    cnt = Counter(w for t in pdf.text for w in t.lower().split() if w)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    total = sum(cnt.values())
    assert list(got.token) == [t for t, _ in ranked]
    assert list(got.cnt) == [c for _, c in ranked]
    assert list(got["rank"]) == list(range(1, len(ranked) + 1))
    cum = np.cumsum([c for _, c in ranked])
    assert list(got.cum_cnt) == list(cum)
    np.testing.assert_array_equal(got.coverage.values, cum / float(total))


def test_build_vocab_matches_duckdb_oracle(docs):
    import duckdb

    df, pdf = docs
    got = corpus.build_vocab(df, top_k=4).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (con.execute(corpus.build_vocab_sql_duckdb(4)).df()
            .sort_values("rank").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # bitwise on the float column, not just allclose
    assert got.coverage.values.tobytes() == want.coverage.values.tobytes()


def test_build_vocab_min_count_and_validation(docs, spark):
    df, pdf = docs
    from collections import Counter

    cnt = Counter(w for t in pdf.text for w in t.lower().split() if w)
    floor = max(cnt.values())  # only the top token(s) survive
    got = corpus.build_vocab(df, top_k=100, min_count=floor).toPandas()
    assert set(got.cnt) == {floor}
    # coverage denominator stays the FULL token stream (pre-filter)
    total = sum(cnt.values())
    assert got.sort_values("rank").coverage.iloc[-1] == pytest.approx(
        got.cnt.sum() / total)
    with pytest.raises(ValueError, match="top_k"):
        corpus.build_vocab(df, top_k=0)
    with pytest.raises(ValueError, match="min_count"):
        corpus.build_vocab(df, top_k=1, min_count=0)


def test_build_vocab_bounded_window_plan(docs):
    df, _ = docs
    out = corpus.build_vocab(df, top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # top-k ships via TakeOrderedAndProject: the window never sees the
    # full distinct-token space
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


# ----------------------------------------------------------------- P10

def _cap_ground_truth(pdf, key, cap, salt, id_col="doc_id"):
    x = pdf.copy()
    x["_h"] = [_h32(f"{salt}:{i}") for i in x[id_col]]
    x = x.sort_values([key, "_h", id_col])
    x["cap_rank"] = x.groupby(key).cumcount() + 1
    return x[x.cap_rank <= cap][[id_col, key, "cap_rank"]].reset_index(
        drop=True)


def test_cap_per_key_matches_brute_force(docs):
    df, pdf = docs
    out = (corpus.cap_per_key(df, "lang", cap=9, id_col="doc_id",
                              salt="capT", mode="rank")
           .toPandas().sort_values(["lang", "cap_rank"])
           .reset_index(drop=True))
    want = (_cap_ground_truth(pdf, "lang", 9, "capT")
            .sort_values(["lang", "cap_rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["doc_id", "lang", "cap_rank"]].astype({"cap_rank": "int64"}),
        want.astype({"cap_rank": "int64"}))


def test_cap_per_key_drop_mode_keeps_columns(docs):
    df, pdf = docs
    out = corpus.cap_per_key(df, "lang", cap=5, salt="capT2")
    assert set(out.columns) == set(df.columns) | {"cap_rank"}
    counts = out.groupBy("lang").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_cap_per_key_prefilter_lossless_on_hot_key(docs):
    # one giant key at the smallest legal margin: the pre-filter tier
    # must still reproduce the exact brute-force top-cap
    df, pdf = docs
    hot = df.withColumn("lang", F.lit("hot"))
    out = (corpus.cap_per_key(hot, "lang", cap=6, salt="capH", margin=2,
                              mode="rank").toPandas()
           .sort_values("cap_rank").reset_index(drop=True))
    hp = pdf.copy(); hp["lang"] = "hot"
    want = _cap_ground_truth(hp, "lang", 6, "capH")
    assert list(out.doc_id) == list(want.doc_id)


def test_cap_per_key_small_keys_pass_through(docs):
    # cap above every key size: nothing dropped, ranks are a permutation
    df, pdf = docs
    out = corpus.cap_per_key(df, "lang", cap=10_000, salt="capT3")
    assert out.count() == len(pdf)


def test_cap_per_key_validation(docs):
    df, _ = docs
    with pytest.raises(ValueError, match="cap must be"):
        corpus.cap_per_key(df, "lang", cap=0)
    with pytest.raises(ValueError, match="margin"):
        corpus.cap_per_key(df, "lang", cap=1, margin=1)
    with pytest.raises(ValueError, match="mode"):
        corpus.cap_per_key(df, "lang", cap=1, mode="flag")
    with pytest.raises(ValueError, match="already exists"):
        corpus.cap_per_key(df.withColumn("cap_rank", F.lit(1)),
                           "lang", cap=1)


def test_cap_per_key_plan_shape(docs):
    # broadcast count join; ONE data exchange on the key feeding BOTH
    # window execs (rank + survivor-count); Python-free
    import re
    from profet_spark.plans.inspect import formatted_plan, is_python_free
    df, _ = docs
    out = corpus.cap_per_key(df, "lang", cap=5, salt="capT4")
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2
    # exchanges: one for the count aggregate, one for the key windows
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2
    assert is_python_free(out)
