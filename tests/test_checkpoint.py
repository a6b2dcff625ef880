"""Kill/resume test (SURVEY.md §5.2-5): abort after k buckets, restart,
assert the final table and manifest are identical to an uninterrupted
write."""

import shutil

import pandas as pd
import pytest

from pyspark.sql import functions as F

from profet_spark.sources import checkpoint as cp
from profet_spark.sources import load_table


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")


def _table_hash(spark, path):
    df = cp.read_checkpointed(spark, path)
    h = F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).bitwiseAND(F.lit(0xFFFFFFFF))
    return (df.count(), df.agg(F.sum(h.cast("decimal(38,0)"))).first()[0])


def test_kill_and_resume(spark, events, tmp_path):
    clean = str(tmp_path / "clean")
    crashy = str(tmp_path / "crashy")

    r = cp.checkpointed_write(events, clean, key_cols=["event_id"], num_buckets=16,
                              lineage="events sf0.001")
    assert len(r["written"]) == 16
    assert cp.verify_manifest(spark, clean)

    # crash after 5 buckets...
    with pytest.raises(RuntimeError, match="injected failure"):
        cp.checkpointed_write(events, crashy, key_cols=["event_id"], num_buckets=16,
                              lineage="events sf0.001", fail_after_buckets=5)
    assert len(cp.committed_buckets(spark, crashy)) == 5
    # ...partial read exposes only committed buckets
    partial_n = cp.read_checkpointed(spark, crashy).count()
    assert 0 < partial_n < events.count()

    # resume: completes the remaining 11
    r2 = cp.checkpointed_write(events, crashy, key_cols=["event_id"], num_buckets=16,
                               lineage="events sf0.001")
    assert len(r2["written"]) == 11 and len(r2["skipped"]) == 5
    assert cp.verify_manifest(spark, crashy)

    assert _table_hash(spark, crashy) == _table_hash(spark, clean)
    assert _table_hash(spark, crashy)[0] == events.count()

    # idempotent: a third call writes nothing
    r3 = cp.checkpointed_write(events, crashy, key_cols=["event_id"], num_buckets=16)
    assert r3["written"] == []


def test_manifest_detects_tamper(spark, events, tmp_path):
    out = str(tmp_path / "t")
    cp.checkpointed_write(events, out, key_cols=["event_id"], num_buckets=4)
    assert cp.verify_manifest(spark, out)
    # tamper: delete one bucket's files
    import glob, os
    victim = glob.glob(f"{out}/__bucket=2/*.parquet")
    assert victim
    for f in victim:
        os.remove(f)
    assert not cp.verify_manifest(spark, out)


def test_empty_buckets_commit_and_converge(spark, tmp_path):
    """Buckets with zero rows still get manifest entries (rows=0), so a
    re-call is a true no-op and verify_manifest accepts the absence of
    their bucket=K directories."""
    tiny = spark.range(3).withColumnRenamed("id", "event_id")
    out = str(tmp_path / "sparse")
    r1 = cp.checkpointed_write(tiny, out, key_cols=["event_id"],
                               num_buckets=32)
    assert len(r1["written"]) == 32
    assert len(cp.committed_buckets(spark, out)) == 32
    assert cp.verify_manifest(spark, out)
    r2 = cp.checkpointed_write(tiny, out, key_cols=["event_id"],
                               num_buckets=32)
    assert r2["written"] == [] and len(r2["skipped"]) == 32
    assert cp.read_checkpointed(spark, out).count() == 3


def test_resume_with_mismatched_params_raises(spark, events, tmp_path):
    out = str(tmp_path / "resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        cp.checkpointed_write(events, out, key_cols=["event_id"],
                              num_buckets=16, fail_after_buckets=5)
    for kwargs in ({"num_buckets": 32},
                   {"num_buckets": 16, "key_cols": ["user_id"]},
                   {"num_buckets": 16, "hash_strategy": "portable"}):
        kw = {"key_cols": ["event_id"], **kwargs}
        with pytest.raises(ValueError, match="resume parameters"):
            cp.checkpointed_write(events, out, **kw)


def test_non_local_out_dir_raises(spark, events):
    with pytest.raises(NotImplementedError, match="driver-local"):
        cp.checkpointed_write(events, "s3://bucket/table",
                              key_cols=["event_id"])
