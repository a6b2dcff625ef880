"""Exactly-once Structured Streaming appends into the versioned store
(S13's streaming twin; north_rule "resumable from checkpoint with
per-partition lineage + metrics").

Spark's foreachBatch gives at-least-once micro-batch delivery: after a
crash between "sink wrote" and "offset log committed", the SAME batch id
is replayed. The versioned store turns that into exactly-once the same
way the real Iceberg streaming sink does — the sink records the batch id
in the commit metadata (here: the manifest's lineage field) and a replay
of an already-committed id is a no-op. Idempotency therefore needs no
external coordination: the manifest IS the transaction log, and the
check is a driver-side scan of retained manifests (O(versions), pure
metadata).

Scale notes: each micro-batch is one append commit — O(batch) new files,
untouched partitions by reference (see sources/versioned.py) — so sink
cost tracks the stream rate, never the table size. Retention interacts
with idempotency: expiring a version older than the streaming
checkpoint's replay horizon forgets its batch id, so keep
``expire_versions(keep_last=...)`` comfortably above the number of
in-flight/replayable batches (the checkpoint replays at most the last
uncommitted one, so any keep_last >= 2 is safe in practice; the guard
is documented rather than enforced because retention is an independent
maintenance job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from profet_spark.sources import versioned as V

_LINEAGE_FMT = "{prefix}:batch={batch_id}"


def committed_batch_ids(store: str, lineage_prefix: str) -> set[int]:
    """Batch ids already committed to ``store`` under this prefix —
    recovered from the retained manifests' lineage fields."""
    head = f"{lineage_prefix}:batch="
    out = set()
    for h in V.version_history(store):
        lin = h.get("lineage") or ""
        if lin.startswith(head):
            out.add(int(lin[len(head):]))
    return out


def append_stream(stream: DataFrame, store: str, checkpoint_dir: str,
                  lineage_prefix: str = "stream",
                  available_now: bool = True) -> StreamingQuery:
    """Start a streaming query that appends every micro-batch to the
    versioned store as one snapshot commit, exactly once per batch id.

    The store must already exist (``create_versioned`` the base — an
    empty frame with the right schema is fine); the stream's columns are
    aligned to the table schema by the append path (typed nulls for
    evolved columns, loud error on unknown columns).

    ``available_now=True`` drains what is currently available and stops
    (the test/backfill mode); pass False for a continuous query the
    caller triggers/stops. Restarting from the same ``checkpoint_dir``
    resumes from the offset log; replayed batch ids are skipped via the
    manifest, so crash-resume never double-appends."""
    if V.read_spec(store) is None:
        raise ValueError(
            f"append_stream: {store} is not a versioned store — "
            "create_versioned(...) the base table first")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(store, lineage_prefix):
            return  # crash-replay of a committed batch: exactly-once skip
        spark = batch_df.sparkSession
        # foreachBatch frames are re-computable plans; materialize the
        # row set once so the tag probe and the write see the same data
        batch_df = batch_df.localCheckpoint(eager=True)
        if not batch_df.take(1):
            return  # empty trigger: no commit, id stays unclaimed
        V.append_versioned(
            spark, batch_df, store,
            lineage=_LINEAGE_FMT.format(prefix=lineage_prefix,
                                        batch_id=batch_id))

    writer = (stream.writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
