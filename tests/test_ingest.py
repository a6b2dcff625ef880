"""JSONL/CSV ingestion: explicit schema (no inference scan), corrupt-row
quarantine, FAILFAST opt-in. SURVEY.md §2.1 source tier."""

import pytest
from pyspark.sql import types as T

from profet_spark.sources import ingest

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "n_chars": 7}',
]
BAD = ['{"doc_id": "not an int{{{', 'this is not json at all']


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(GOOD[:1] + BAD[:1] + GOOD[1:] + BAD[1:]) + "\n")
    return str(p)


def test_jsonl_permissive_quarantines_corrupt_lines(spark, jsonl_path):
    df = ingest.ingest_jsonl(spark, jsonl_path)
    clean, bad = ingest.split_corrupt(df)
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "hello world", 2: "bonjour"}
    assert ingest.CORRUPT_COL not in clean.columns
    raws = sorted(r.raw for r in bad.collect())
    assert raws == sorted(BAD)


def test_jsonl_failfast_raises_on_corrupt(spark, jsonl_path):
    with pytest.raises(Exception):
        ingest.ingest_jsonl(spark, jsonl_path, mode="fail").collect()


def test_jsonl_schema_is_explicit_not_inferred(spark, jsonl_path):
    df = ingest.ingest_jsonl(spark, jsonl_path)
    fields = {f.name: f.dataType for f in df.schema.fields}
    assert fields["doc_id"] == T.LongType()
    assert fields["n_chars"] == T.IntegerType()


def test_csv_permissive_and_passthrough_options(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("doc_id;text;lang;n_chars\n"
                 "1;hello;en;5\n"
                 "2;oops;fr;not_an_int\n"
                 "3;ok;de;2\n")
    df = ingest.ingest_csv(spark, str(p), sep=";")
    clean, bad = ingest.split_corrupt(df)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    assert bad.count() == 1 and "not_an_int" in bad.first().raw


def test_split_corrupt_requires_permissive(spark, jsonl_path):
    df = ingest.ingest_jsonl(spark, jsonl_path).drop(ingest.CORRUPT_COL)
    with pytest.raises(ValueError, match="permissive"):
        ingest.split_corrupt(df)


def test_mode_validated(spark, jsonl_path):
    with pytest.raises(ValueError, match="mode"):
        ingest.ingest_jsonl(spark, jsonl_path, mode="lenient")


def test_ingested_docs_compose_with_operators(spark, jsonl_path):
    """The ingest output is documents-shaped: dedup + quality compose."""
    from profet_spark.functions import textstats
    from profet_spark.operators import dedup

    clean, _ = ingest.split_corrupt(ingest.ingest_jsonl(spark, jsonl_path))
    out = textstats.add_quality_features(dedup.exact_dedup(clean))
    assert out.count() == 2


def test_split_corrupt_unpersisted_full_width(spark, jsonl_path):
    """persist=False: quarantine keeps full row width (the other
    Spark-permitted projection) and the same rows are flagged."""
    df = ingest.ingest_jsonl(spark, jsonl_path)
    clean, bad = ingest.split_corrupt(df, persist=False)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    rows = bad.collect()
    assert sorted(r.raw for r in rows) == sorted(BAD)
    assert "doc_id" in bad.columns  # full width retained


def test_jsonl_stream_equals_batch(spark, tmp_path):
    """§2.9 twin: the streaming reader drained with availableNow +
    foreachBatch(split_corrupt) yields exactly the batch reader's clean
    rows and quarantine lines."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.jsonl").write_text("\n".join([GOOD[0], BAD[0]]) + "\n")
    (landing / "b.jsonl").write_text("\n".join([BAD[1], GOOD[1]]) + "\n")

    got_clean, got_bad = [], []

    def route(batch, _epoch):
        clean, bad = ingest.split_corrupt(batch, persist=False)
        got_clean.extend((r.doc_id, r.text) for r in clean.collect())
        got_bad.extend(r.raw for r in bad.collect())

    q = (ingest.ingest_jsonl_stream(spark, str(landing),
                                    max_files_per_trigger=1)
         .writeStream.foreachBatch(route)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    bclean, bbad = ingest.split_corrupt(
        ingest.ingest_jsonl(spark, str(landing)), persist=False)
    assert sorted(got_clean) == sorted(
        (r.doc_id, r.text) for r in bclean.collect())
    assert sorted(got_bad) == sorted(r.raw for r in bbad.collect())
    assert len(got_clean) == 2 and len(got_bad) == 2
