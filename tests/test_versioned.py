"""Versioned store: snapshots, time travel, rollback, expiry, schema
evolution (sources/versioned.py — S13/S14)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from profet_spark.sources import versioned as V


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _mk(spark, triples):
    return spark.createDataFrame(
        [Row(image_id=i, ts=ts, val=float(v)) for i, ts, v in triples],
        "image_id bigint, ts string, val double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


BASE = [
    (1, "2024-01-01 10:00:00", 1.0),
    (2, "2024-01-01 11:00:00", 2.0),
    (3, "2024-01-02 10:00:00", 3.0),
    (4, "2024-01-03 10:00:00", 4.0),
]


@pytest.fixture()
def store(tmp_path, spark):
    s = str(tmp_path / "vstore")
    V.create_versioned(_mk(spark, BASE), s, ts_col="ts",
                       entity_col="image_id", n_buckets=4,
                       lineage="unit: base")
    return s


def test_create_and_read_roundtrip(spark, store):
    got = V.read_versioned(spark, store)
    assert _rows(got, ["image_id", "val"]) == [(1, 1.0), (2, 2.0),
                                               (3, 3.0), (4, 4.0)]
    hist = V.version_history(store)
    assert [h["operation"] for h in hist] == ["create"]
    assert hist[0]["metrics"]["rows_written"] == 4


def test_append_creates_snapshot_and_time_travel(spark, store):
    V.append_versioned(spark, _mk(spark, [(5, "2024-01-01 12:00:00", 5.0)]),
                       store, lineage="unit: append")
    latest = V.read_versioned(spark, store)
    assert _rows(latest, ["image_id"]) == [(1,), (2,), (3,), (4,), (5,)]
    v1 = V.read_versioned(spark, store, version=1)
    assert _rows(v1, ["image_id"]) == [(1,), (2,), (3,), (4,)]
    # the appended tag references BOTH commits; day-02 references only v1's
    m = V.read_manifest(store)
    multi = [t for t, dirs in m["partitions"].items() if len(dirs) == 2]
    assert len(multi) >= 1 and all(t.startswith("2024-01-01") for t in multi)


def test_upsert_rewrites_only_touched_partitions(spark, store):
    batch = _mk(spark, [(1, "2024-01-01 10:00:00", 100.0),
                        (6, "2024-01-01 13:00:00", 6.0)])
    V.upsert_versioned(spark, batch, store, lineage="unit: upsert")
    latest = V.read_versioned(spark, store)
    assert _rows(latest, ["image_id", "val"]) == [
        (1, 100.0), (2, 2.0), (3, 3.0), (4, 4.0), (6, 6.0)]
    # untouched days still served from commit 1 by reference
    m = V.read_manifest(store)
    untouched = [dirs for t, dirs in m["partitions"].items()
                 if not t.startswith("2024-01-01")]
    assert untouched and all(d == ["c00000001"] for d in untouched)
    # pre-image intact (time travel)
    v1 = V.read_versioned(spark, store, version=1)
    assert _rows(v1, ["image_id", "val"])[0] == (1, 1.0)


def test_upsert_moved_key_probe_extends_rewrite(spark, store):
    # key_cols=['image_id'] does not determine the partition: image 3's
    # stored row lives on day 02, the batch moves it to day 05
    batch = _mk(spark, [(3, "2024-01-05 10:00:00", 33.0)])
    V.upsert_versioned(spark, batch, store, key_cols=["image_id"])
    latest = V.read_versioned(spark, store)
    got = _rows(latest, ["image_id", "val"])
    assert got == [(1, 1.0), (2, 2.0), (3, 33.0), (4, 4.0)]
    assert latest.where("image_id = 3").count() == 1  # stale row gone


def test_rollback_restores_old_content(spark, store):
    V.upsert_versioned(
        spark, _mk(spark, [(1, "2024-01-01 10:00:00", 100.0)]), store)
    V.rollback_versioned(spark, store, to_version=1)
    latest = V.read_versioned(spark, store)
    assert _rows(latest, ["image_id", "val"]) == [
        (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    assert [h["operation"] for h in V.version_history(store)] == [
        "create", "upsert", "rollback"]


def test_evolve_schema_typed_nulls_then_values(spark, store):
    V.evolve_schema(spark, store, {"src": "string"})
    evolved = V.read_versioned(spark, store)
    assert dict(evolved.dtypes)["src"] == "string"
    assert evolved.where(F.col("src").isNull()).count() == 4
    batch = spark.createDataFrame(
        [Row(image_id=7, ts="2024-01-04 10:00:00", val=7.0, src="late")],
        "image_id bigint, ts string, val double, src string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    V.append_versioned(spark, batch, store)
    latest = V.read_versioned(spark, store)
    assert _rows(latest, ["image_id", "src"]) == [
        (1, None), (2, None), (3, None), (4, None), (7, "late")]
    # pre-evolution snapshot has no src column at all
    assert "src" not in V.read_versioned(spark, store, version=1).columns


def test_evolve_schema_rejects_dup_and_reserved(spark, store):
    with pytest.raises(ValueError, match="already exist"):
        V.evolve_schema(spark, store, {"val": "double"})
    with pytest.raises(ValueError, match="reserved"):
        V.evolve_schema(spark, store, {"_p_day": "string"})
    with pytest.raises(ValueError, match="evolve_schema"):
        V.append_versioned(
            spark,
            _mk(spark, [(9, "2024-01-01 09:00:00", 9.0)])
            .withColumn("extra", F.lit(1)),
            store)


def test_expire_keeps_referenced_commit_dirs(spark, store):
    V.upsert_versioned(
        spark, _mk(spark, [(1, "2024-01-01 10:00:00", 100.0)]), store)
    out = V.expire_versions(spark, store, keep_last=1)
    assert out["expired_versions"] == [1] and out["kept_versions"] == [2]
    # commit 1's files still back v2's untouched partitions -> kept
    assert out["removed_commit_dirs"] == []
    assert os.path.isdir(os.path.join(store, "data", "c00000001"))
    latest = V.read_versioned(spark, store)
    assert latest.count() == 4
    with pytest.raises(ValueError, match="does not exist"):
        V.read_versioned(spark, store, version=1)


def test_expire_removes_unreferenced_commit_dirs(spark, store):
    # v2 rewrites EVERY partition -> commit 1 becomes unreferenced
    allrows = _mk(spark, [(i, ts, v * 10) for i, ts, v in BASE])
    V.upsert_versioned(spark, allrows, store)
    out = V.expire_versions(spark, store, keep_last=1)
    assert out["removed_commit_dirs"] == ["c00000001"]
    assert not os.path.isdir(os.path.join(store, "data", "c00000001"))
    assert V.read_versioned(spark, store).count() == 4


def test_read_pruning_skips_directories(spark, store):
    got = V.read_versioned(spark, store,
                           ts_between=("2024-01-02 00:00:00",
                                       "2024-01-02 23:59:59"))
    assert _rows(got, ["image_id"]) == [(3,)]
    # driver-side metadata pruning: only day-02 directories are opened
    assert all("2024-01-01" not in f and "2024-01-03" not in f
               for f in got.inputFiles())
    by_ent = V.read_versioned(spark, store, entity_in=[2])
    assert _rows(by_ent, ["image_id"]) == [(2,)]
    assert V.read_versioned(spark, store, entity_in=[]).count() == 0


def test_commit_conflict_raises(spark, store):
    m = V.read_manifest(store)
    clash = dict(m, version=m["version"])  # same number again
    with pytest.raises(RuntimeError, match="conflict"):
        V._write_manifest(store, clash)


def test_create_refuses_existing_store(spark, store, tmp_path):
    with pytest.raises(ValueError, match="already has versions"):
        V.create_versioned(_mk(spark, BASE), store)


# ------------------------------------------------------- incremental reads

def test_read_incremental_appends_only(spark, store):
    V.append_versioned(spark, _mk(spark, [(5, "2024-01-01 12:00:00", 5.0)]),
                       store)                                        # v2
    V.append_versioned(spark, _mk(spark, [(6, "2024-01-02 12:00:00", 6.0),
                                          (7, "2024-01-05 12:00:00", 7.0)]),
                       store)                                        # v3
    inc = V.read_incremental(spark, store, from_version=1)
    assert _rows(inc, ["image_id"]) == [(5,), (6,), (7,)]
    assert _rows(V.read_incremental(spark, store, 1, 2),
                 ["image_id"]) == [(5,)]
    # metadata-only evolve commits are transparent; the delta is read
    # with the END version's schema (typed-null src for older appends)
    V.evolve_schema(spark, store, {"src": "string"})                 # v4
    inc3 = V.read_incremental(spark, store, 2)
    assert "src" in inc3.columns
    assert _rows(inc3, ["image_id", "src"]) == [(6, None), (7, None)]


def test_read_incremental_rejects_non_append_range(spark, store):
    V.upsert_versioned(
        spark, _mk(spark, [(1, "2024-01-01 10:00:00", 100.0)]), store)  # v2
    with pytest.raises(ValueError, match="'upsert' commit"):
        V.read_incremental(spark, store, 1)
    with pytest.raises(ValueError, match="from_version < to_version"):
        V.read_incremental(spark, store, 2, 2)


def test_read_incremental_expired_range_raises(spark, store):
    V.append_versioned(spark, _mk(spark, [(5, "2024-01-01 12:00:00", 5.0)]),
                       store)                                        # v2
    V.append_versioned(spark, _mk(spark, [(6, "2024-01-02 12:00:00", 6.0)]),
                       store)                                        # v3
    V.expire_versions(spark, store, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        V.read_incremental(spark, store, 1)


# ------------------------------------------------- model-based lifecycle

def test_lifecycle_matches_reference_model(spark, tmp_path):
    """Scripted multi-commit lifecycle vs a plain-dict reference model:
    after every commit, every RETAINED snapshot must equal the model's
    frozen copy of the table at that commit."""
    import itertools

    s = str(tmp_path / "model_store")
    model: dict[int, tuple] = {}          # image_id -> (ts, val)
    history: dict[int, dict] = {}         # version -> frozen model

    def mk(rows):
        return _mk(spark, rows)

    def freeze(v):
        history[v] = dict(model)

    base = [(i, f"2024-01-0{1 + i % 3} 0{i}:00:00", float(i)) for i in range(1, 6)]
    for i, ts, val in base:
        model[i] = (ts, val)
    v = V.create_versioned(mk(base), s, ts_col="ts", entity_col="image_id",
                           n_buckets=4)
    freeze(v)

    script = [
        ("append", [(6, "2024-01-04 06:00:00", 6.0)]),
        ("upsert", [(2, "2024-01-02 02:00:00", 22.0),
                    (7, "2024-01-01 07:00:00", 7.0)]),
        ("rollback", 2),
        ("upsert", [(1, "2024-01-05 01:00:00", 11.0)]),  # moves key 1's day
        ("append", [(8, "2024-01-02 08:00:00", 8.0)]),
    ]
    for op, arg in script:
        if op == "append":
            v = V.append_versioned(spark, mk(arg), s)
            for i, ts, val in arg:
                assert i not in model
                model[i] = (ts, val)
        elif op == "upsert":
            v = V.upsert_versioned(spark, mk(arg), s, key_cols=["image_id"])
            for i, ts, val in arg:
                model[i] = (ts, val)
        elif op == "rollback":
            v = V.rollback_versioned(spark, s, to_version=arg)
            model.clear()
            model.update(history[arg])
        freeze(v)
        for ver, frozen in history.items():
            got = {r["image_id"]: (str(r["ts"]), r["val"])
                   for r in V.read_versioned(spark, s, version=ver).collect()}
            want = {i: (f"{ts}", val) for i, (ts, val) in frozen.items()}
            assert got == want, f"snapshot v{ver} diverged after {op}"
    # expiry keeps the newest two snapshots readable and intact
    V.expire_versions(spark, s, keep_last=2)
    kept = V.list_versions(s)
    assert len(kept) == 2
    for ver in kept:
        got = {r["image_id"] for r in
               V.read_versioned(spark, s, version=ver).collect()}
        assert got == set(history[ver])


# ------------------------------------------------- streaming append sink

def _stream_src(spark, tmp_path, batches):
    """Write each batch as one parquet file; return a 1-file-per-trigger
    stream over the directory (the suite's micro-batch replay pattern)."""
    import time as _t

    src = str(tmp_path / "stream_src")
    for i, rows in enumerate(batches):
        _mk(spark, rows).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append").parquet(src)
        if i + 1 < len(batches):
            _t.sleep(1.1)  # file source orders by mtime
    return (spark.readStream
            .schema("image_id bigint, ts timestamp_ntz, val double")
            .option("maxFilesPerTrigger", 1).parquet(src)), src


def test_stream_appends_one_commit_per_batch(spark, store, tmp_path):
    from profet_spark.streaming import versioned_sink as VS

    stream, _ = _stream_src(spark, tmp_path, [
        [(10, "2024-01-04 10:00:00", 10.0)],
        [(11, "2024-01-05 11:00:00", 11.0),
         (12, "2024-01-01 12:00:00", 12.0)],
    ])
    q = VS.append_stream(stream, store, str(tmp_path / "ckpt"),
                         lineage_prefix="t1")
    q.awaitTermination()
    hist = V.version_history(store)
    assert [h["operation"] for h in hist] == ["create", "append", "append"]
    assert VS.committed_batch_ids(store, "t1") == {0, 1}
    got = V.read_versioned(spark, store)
    assert _rows(got, ["image_id"]) == [(i,) for i in (1, 2, 3, 4, 10, 11, 12)]


def test_stream_resume_same_checkpoint_is_noop_then_incremental(
        spark, store, tmp_path):
    import time as _t

    from profet_spark.streaming import versioned_sink as VS

    stream, src = _stream_src(spark, tmp_path, [
        [(10, "2024-01-04 10:00:00", 10.0)]])
    ckpt = str(tmp_path / "ckpt")
    VS.append_stream(stream, store, ckpt).awaitTermination()
    assert V.read_manifest(store)["version"] == 2
    # resume with NO new data: offset log says everything is processed
    VS.append_stream(stream, store, ckpt).awaitTermination()
    assert V.read_manifest(store)["version"] == 2
    # new file arrives -> exactly one more commit
    _t.sleep(1.1)
    _mk(spark, [(11, "2024-01-05 11:00:00", 11.0)]).coalesce(1) \
        .write.mode("append").parquet(src)
    VS.append_stream(stream, store, ckpt).awaitTermination()
    assert V.read_manifest(store)["version"] == 3
    assert V.read_versioned(spark, store).count() == 6


def test_stream_replayed_batch_ids_are_skipped(spark, store, tmp_path):
    """Crash-replay twin: a FRESH checkpoint re-delivers ids 0..n for the
    same files; the manifest's lineage log must dedupe every one."""
    from profet_spark.streaming import versioned_sink as VS

    stream, _ = _stream_src(spark, tmp_path, [
        [(10, "2024-01-04 10:00:00", 10.0)],
        [(11, "2024-01-05 11:00:00", 11.0)],
    ])
    VS.append_stream(stream, store, str(tmp_path / "ck1")).awaitTermination()
    n1 = V.read_versioned(spark, store).count()
    v1 = V.read_manifest(store)["version"]
    VS.append_stream(stream, store, str(tmp_path / "ck2")).awaitTermination()
    assert V.read_versioned(spark, store).count() == n1
    assert V.read_manifest(store)["version"] == v1


def test_stream_requires_existing_store(spark, tmp_path):
    from profet_spark.streaming import versioned_sink as VS

    stream, _ = _stream_src(spark, tmp_path, [
        [(1, "2024-01-01 10:00:00", 1.0)]])
    with pytest.raises(ValueError, match="create_versioned"):
        VS.append_stream(stream, str(tmp_path / "nostore"),
                         str(tmp_path / "ck"))


# ---------------------------------------------------------- compaction

def test_compact_versioned_merges_fragmented_partitions(spark, store):
    for k in range(5):  # five appends -> six files behind one partition
        V.append_versioned(
            spark, _mk(spark, [(1, f"2024-01-01 10:0{k}:00", float(k))]),
            store)
    before = _rows(V.read_versioned(spark, store),
                   ["image_id", "ts", "val"])
    out = V.compact_versioned(spark, store, max_files_per_partition=2)
    assert out["partitions_compacted"] == 1
    assert out["files_before"] == 6 and out["files_after"] == 1
    # content invariant, one manifest entry now backs the victim tag
    after = _rows(V.read_versioned(spark, store),
                  ["image_id", "ts", "val"])
    assert after == before
    m = V.read_manifest(store)
    victim = [t for t, d in m["partitions"].items()
              if d == [f"c{out['version']:08d}"]]
    assert len(victim) == 1 and victim[0].startswith("2024-01-01")
    untouched = [d for t, d in m["partitions"].items() if t not in victim]
    assert all(d == ["c00000001"] for d in untouched)
    # prior snapshots still read the pre-compaction files
    assert V.read_versioned(spark, store, version=1).count() == 4
    # compaction is not a row delta: incremental ranges over it must fail
    with pytest.raises(ValueError, match="'compact' commit"):
        V.read_incremental(spark, store, 1, out["version"])
    # idempotent: nothing left to compact, no empty commit written
    out2 = V.compact_versioned(spark, store, max_files_per_partition=2)
    assert out2["partitions_compacted"] == 0
    assert out2["version"] == out["version"]
    assert V.read_manifest(store)["version"] == out["version"]


def test_compact_then_expire_reclaims_fragments(spark, store):
    for k in range(5):
        V.append_versioned(
            spark, _mk(spark, [(1, f"2024-01-01 10:0{k}:00", float(k))]),
            store)
    out = V.compact_versioned(spark, store, max_files_per_partition=2)
    n = V.read_versioned(spark, store).count()
    exp = V.expire_versions(spark, store, keep_last=1)
    # the five append commits are now unreferenced -> deleted; the
    # create commit still backs the other day partitions -> kept
    assert set(exp["removed_commit_dirs"]) == {
        f"c{v:08d}" for v in range(2, 7)}
    assert V.read_versioned(spark, store).count() == n


# -------------------------------------- reproducible-training integration

def test_training_matrix_from_pinned_snapshot_is_reproducible(
        spark, store, tmp_path):
    """The reproducibility guarantee the snapshot store exists for: a
    training matrix assembled from feature tables READ AT SNAPSHOT k is
    bit-identical no matter how many commits land afterwards — pin the
    version in the training job's config and the dataset is replayable
    forever (until retention expires k)."""
    from profet_spark.operators.feature_matrix import point_in_time_matrix

    spine = _mk(spark, [(1, "2024-01-02 12:00:00", 0.0),
                        (2, "2024-01-03 12:00:00", 0.0),
                        (3, "2024-01-03 12:00:00", 0.0)]).drop("val")
    feats = V.read_versioned(spark, store, version=1)

    def matrix(feature_df):
        return point_in_time_matrix(
            spine, {"f": feature_df.withColumnRenamed("val", "f_val")},
            entity="image_id", ts="ts").orderBy("image_id")

    before = [tuple(r) for r in matrix(feats).collect()]
    # the store moves on: corrections, late data, compaction
    V.upsert_versioned(
        spark, _mk(spark, [(1, "2024-01-01 10:00:00", 999.0)]), store)
    V.append_versioned(
        spark, _mk(spark, [(9, "2024-01-02 09:00:00", 9.0)]), store)
    V.compact_versioned(spark, store, max_files_per_partition=0)
    after = [tuple(r) for r in
             matrix(V.read_versioned(spark, store, version=1)).collect()]
    assert after == before
    # and the LATEST read sees the correction, proving the pin mattered
    latest = [tuple(r) for r in
              matrix(V.read_versioned(spark, store)).collect()]
    assert latest != before


def test_concurrent_commit_race_single_winner(spark, store):
    """TOCTOU guard: many threads publishing the SAME version number via
    the atomic link — exactly one wins, every loser gets the conflict
    error, and the winner's manifest is intact on disk."""
    import json as _json
    import threading

    base = V.read_manifest(store)
    results = []

    def attempt(i):
        m = dict(base, version=base["version"] + 1,
                 lineage=f"racer-{i}", parent=base["version"])
        try:
            V._write_manifest(store, m)
            results.append(("won", i))
        except RuntimeError:
            results.append(("lost", i))

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(r for r, _ in results).count("won") == 1
    winner = [i for r, i in results if r == "won"][0]
    with open(V._manifest_path(store, base["version"] + 1)) as f:
        assert _json.load(f)["lineage"] == f"racer-{winner}"
    # no tmp litter left behind
    import os as _os
    assert not [f for f in _os.listdir(V._versions_dir(store))
                if ".tmp." in f]


def test_random_lifecycles_match_reference_model(spark):
    """Hypothesis twin of the scripted model test: arbitrary short
    commit sequences (append new keys / upsert mixes / rollback to any
    retained version) must keep EVERY retained snapshot equal to the
    model's frozen copy at that commit."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as hst

    days = [f"2024-01-0{d}" for d in range(1, 8)]

    @hst.composite
    def ops(draw):
        seq = []
        n = draw(hst.integers(1, 4))
        for _ in range(n):
            kind = draw(hst.sampled_from(["append", "upsert", "rollback"]))
            if kind == "rollback":
                seq.append(("rollback", None))
            else:
                rows = draw(hst.lists(
                    hst.tuples(hst.integers(1, 12),
                               hst.sampled_from(days),
                               hst.integers(-5, 5)),
                    min_size=1, max_size=4,
                    unique_by=lambda r: r[0]))
                seq.append((kind, rows))
        return seq

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(script=ops())
    def run(script):
        s = tempfile.mkdtemp(prefix="hyp_vstore_")
        try:
            model = {i: (f"2024-01-0{1 + i % 3} 0{i % 10}:00:00", float(i))
                     for i in range(1, 5)}
            history = {}
            v = V.create_versioned(
                _mk(spark, [(i, ts, val) for i, (ts, val) in model.items()]),
                s, ts_col="ts", entity_col="image_id", n_buckets=4)
            history[v] = dict(model)
            for kind, rows in script:
                if kind == "rollback":
                    target = min(history)  # earliest retained
                    v = V.rollback_versioned(spark, s, to_version=target)
                    model = dict(history[target])
                else:
                    batch = [(i, f"{d} 12:00:00", float(x))
                             for i, d, x in rows]
                    if kind == "append":
                        batch = [(i, t, x) for i, t, x in batch
                                 if i not in model]
                        if not batch:
                            continue
                        v = V.append_versioned(spark, _mk(spark, batch), s)
                    else:
                        v = V.upsert_versioned(spark, _mk(spark, batch), s,
                                               key_cols=["image_id"])
                    for i, t, x in batch:
                        model[i] = (t, x)
                history[v] = dict(model)
            for ver, frozen in history.items():
                got = {r["image_id"]: (str(r["ts"]), r["val"])
                       for r in V.read_versioned(
                           spark, s, version=ver).collect()}
                assert got == {i: (t, x) for i, (t, x) in frozen.items()}, \
                    f"v{ver} diverged under {script}"
        finally:
            shutil.rmtree(s, ignore_errors=True)

    run()
