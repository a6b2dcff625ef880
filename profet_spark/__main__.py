"""``python -m profet_spark`` — the spark-submit job runner.

The north rule's deployment shape is ``spark-submit --py-files
profet_spark.zip`` driving a named pipeline over a table root (the
BENCH/ scaling harness runs exactly that shape). This module is the
user-facing version: pick a pipeline, point it at an input root
(parquet directory or Iceberg catalog name — ``sources.catalog``
resolves either), write parquet (or run against the ``noop`` sink for
a dry-run/benchmark pass).

    spark-submit --master yarn --py-files profet_spark.zip \\
        profet_spark/__main__.py \\
        --pipeline caption_features --input /data/sf1 --output /out/feats

(spark-submit takes the ``__main__.py`` file as its primary resource —
it has no ``-m`` module flag; ``python -m profet_spark`` is the local
form. Under spark-submit the session INHERITS ``--master`` — see
``get_spark`` — so a cluster job never silently downgrades to local.)

Pipelines are thin compositions of the library operators — everything
here is reachable from the Python API too; the CLI only removes the
boilerplate for the four most common jobs. Kept argparse-only (no
extra deps) and import-light so ``--help`` works without a JVM.
"""

from __future__ import annotations

import argparse
import sys


def _build(spark, pipeline: str, input_root: str, eval_root: str | None = None,
           ngram: int = 13, min_side: int = 64, batch_size: int = 64,
           n_shards: int = 64, cap: int = 1000, threshold: float = 0.9):
    from pyspark.sql import functions as F

    from profet_spark.functions import image_descriptors as imgd
    from profet_spark.functions import text_descriptors as td
    from profet_spark.functions import textstats
    from profet_spark.operators import dedup
    from profet_spark.sources import load_table

    if pipeline == "caption_features":
        snaps = load_table(spark, input_root, "documents").select(
            F.col("doc_id").alias("id"), F.col("text").alias("caption"))
        return td.add_caption_features_packed(snaps)
    if pipeline == "image_features":
        snaps = load_table(spark, input_root, "images")
        return imgd.phash_hamming_to_prev(imgd.add_image_features(snaps))
    if pipeline == "curate":
        # keep ONE canonical doc per near-dup cluster (connected
        # components, not the drop-every-id_a heuristic), then attach
        # quality + fingerprint features to the survivors
        docs = load_table(spark, input_root, "documents")
        kept = dedup.drop_near_duplicates(docs, k=3, threshold=0.5)
        return textstats.add_fingerprint(
            textstats.add_quality_features(kept)).drop("text")
    if pipeline == "quality":
        docs = load_table(spark, input_root, "documents")
        return textstats.add_fingerprint(
            textstats.add_quality_features(docs)).drop("text")
    if pipeline == "image_curate":
        # two-tier image gate: metadata predicates (bytes of rejects are
        # never decoded), then pixel-stat thresholds; flag mode keeps the
        # audit columns for inspection
        snaps = load_table(spark, input_root, "images")
        return imgd.curate_images(snaps, min_w=min_side, min_h=min_side)
    if pipeline == "scrub":
        # T6: mask emails/SSNs/IPs/phones, keep the per-doc mask counts
        docs = load_table(spark, input_root, "documents")
        return textstats.scrub_pii(docs).drop("text")
    if pipeline == "decontaminate":
        # P6: drop docs sharing a word n-gram with the eval set
        # (--eval-input), or with the table's own held-out test split
        from profet_spark.operators import corpus

        docs = load_table(spark, input_root, "documents")
        if eval_root:
            evals = load_table(spark, eval_root, "documents")
            return corpus.decontaminate(docs, evals, n=ngram, mode="drop")
        sp = corpus.hash_split(docs,
                               {"train": 0.8, "val": 0.1, "test": 0.1})
        return corpus.decontaminate(
            sp.where(F.col("split") == "train").drop("split"),
            sp.where(F.col("split") == "test").drop("split"),
            n=ngram, mode="drop")
    if pipeline == "batch_plan":
        # B1: aspect-bucketed fixed-size training batches over the image
        # snapshot table; only (id, w, h) are read — bytes stay pruned
        from profet_spark.operators import batching

        snaps = load_table(spark, input_root, "images")
        return batching.with_resize_targets(batching.plan_aspect_batches(
            snaps.select("image_id", "w", "h"), batch_size=batch_size,
            n_shards=n_shards, drop_incomplete=True))
    if pipeline == "ingest":
        # here --input is a JSONL landing directory, not a table root;
        # returns (clean, quarantine) — main() writes the quarantine to
        # <output>_quarantine so rejects are never silently dropped
        from profet_spark.sources import ingest as ing

        return ing.split_corrupt(ing.ingest_jsonl(spark, input_root))
    if pipeline == "cap":
        # P10: at most --cap docs per source (fair salted-hash survivors;
        # hot domains bounded by the exact pre-filter, never one task)
        from profet_spark.operators import corpus

        docs = load_table(spark, input_root, "documents")
        return corpus.cap_per_key(docs, "source", cap=cap,
                                  id_col="doc_id")
    if pipeline == "pq_index":
        # N4xN3: build the persistable IVF-PQ index over the embeddings
        # table; main() writes it PARTITIONED BY cid so a query's probe
        # becomes directory pruning at the scan. --n-shards doubles as
        # the coarse cell count.
        from profet_spark.operators import similarity

        emb = load_table(spark, input_root, "embeddings")
        return similarity.ivf_pq_encode(emb, n_centroids=n_shards)
    if pipeline == "spandedup":
        # D10: excise corpus-wide duplicated substrings (span
        # granularity; --ngram doubles as the span width in characters)
        # from every document — the within-document boilerplate cut
        docs = load_table(spark, input_root, "documents")
        spans = dedup.repeated_spans(docs, text_col="text",
                                     span=max(2, ngram))
        return dedup.cut_spans(docs, spans, text_col="text")
    if pipeline == "semdedup":
        # D9 SemDeDup: keep one row per semantic-duplicate cluster over
        # the embeddings table — coarse k-means cells, within-cell exact
        # cosine pairs, keep-min-id. --n-shards doubles as the cell count
        # (size it ~ rows / target_cell_size at warehouse scale);
        # --threshold is the duplicate cosine bar.
        emb = load_table(spark, input_root, "embeddings")
        return dedup.semdedup(emb, n_centroids=n_shards,
                              threshold=threshold)
    if pipeline == "image_dedup":
        # keep one canonical image per perceptual near-dup cluster,
        # stored-phash mode (bytes never read; <=3-bit Hamming — the
        # pigeonhole join's full-recall bound). Pixel-mode (DCT pHash
        # recomputed from bytes) is the library call with hash_col=None.
        snaps = load_table(spark, input_root, "images")
        return dedup.drop_near_duplicate_images(snaps, hash_col="phash")
    if pipeline == "retention":
        # A17: day-over-day retained/churned/fresh distinct users from
        # per-day theta sketch rows only (set-expression rollup; the
        # base table is scanned once for the rollup, never for pairs)
        from profet_spark.operators import sketches

        ev = load_table(spark, input_root, "events").withColumn(
            "day", sketches.epoch_day("ts"))
        daily = sketches.theta_rollup(ev, ["day"], "user_id")
        return sketches.retention_rollup(daily, "day")
    if pipeline == "zorder":
        # L1: re-layout events by the (user_id, second-of-day) Morton
        # key — the written files carry tight min/max on BOTH dims, so a
        # 2-D predicate prunes at the footer level like a 1-D one
        from profet_spark.operators import layout as LY

        ev = load_table(spark, input_root, "events")
        sec = F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) div 1000000) % 86400")
        return LY.cluster_by_zorder(
            ev.withColumn("sec", sec),
            {"user_id": (0, 1 << 20), "sec": (0, 86399)},
            n_buckets=n_shards)
    raise SystemExit(f"unknown pipeline: {pipeline!r} (see --help)")


PIPELINES = ("caption_features", "image_features", "curate", "quality",
             "ingest", "compact", "scrub", "decontaminate", "image_curate",
             "batch_plan", "materialize", "diff", "cap", "zorder",
             "semdedup", "pq_index", "snapshot", "spandedup", "retention",
             "image_dedup")


def main(argv: list[str] | None = None, _spark=None) -> int:
    """``_spark``: injected session for in-process tests — the CLI then
    neither builds nor stops it (stop() on a shared session would kill
    the caller's fixture)."""
    ap = argparse.ArgumentParser(
        prog="python -m profet_spark",
        description="Run a named profet_spark pipeline over a table root.")
    ap.add_argument("--pipeline", required=True, choices=PIPELINES)
    ap.add_argument("--input", required=True,
                    help="parquet root dir or Iceberg catalog name "
                         "(for --pipeline ingest: a JSONL landing dir)")
    ap.add_argument("--output", default=None,
                    help="parquet output dir; omit for a noop-sink dry run")
    ap.add_argument("--master", default=None,
                    help="override spark.master (default: inherit from "
                         "spark-submit, else local)")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="must be >= 1 when given")
    ap.add_argument("--eval-input", default=None,
                    help="decontaminate only: table root of the benchmark/"
                         "eval set (default: the input's own test split)")
    ap.add_argument("--ngram", type=int, default=13,
                    help="decontaminate: overlap shingle width (13 = the "
                         "GPT-3/Llama convention); spandedup: span chars")
    ap.add_argument("--min-side", type=int, default=64,
                    help="image_curate only: resolution floor for w and h")
    ap.add_argument("--batch-size", type=int, default=64,
                    help="batch_plan only: images per training batch")
    ap.add_argument("--n-shards", type=int, default=64,
                    help="batch_plan: numbering shards per bucket; "
                         "zorder: layout bucket count "
                         "(size to the cluster; bounds window partitions)")
    ap.add_argument("--cap", type=int, default=1000,
                    help="cap only: max docs kept per source")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="semdedup only: duplicate cosine bar; cells come "
                         "from --n-shards (~ rows / target cell size)")
    ap.add_argument("--keep-last", type=int, default=0,
                    help="snapshot only: run expire_versions(keep_last=N) "
                         "after the commit (0 = keep all versions)")
    ap.add_argument("--late-days", type=float, default=0.0,
                    help="materialize only: re-emit this many trailing "
                         "days each run so late snapshot arrivals within "
                         "the window are healed by the upsert")
    ap.add_argument("--right", default=None,
                    help="diff only: the right-hand write_partitioned "
                         "store root (--input is the left)")
    args = ap.parse_args(argv)

    if args.shuffle_partitions is not None and args.shuffle_partitions < 1:
        ap.error(f"--shuffle-partitions must be >= 1, "
                 f"got {args.shuffle_partitions}")
    if _spark is None:
        from profet_spark import get_spark

        # master=None inherits spark-submit's --master (get_spark detects
        # the launcher) or falls back to local outside it
        spark = get_spark(app=f"profet_{args.pipeline}", master=args.master,
                          shuffle_partitions=args.shuffle_partitions)
    else:
        spark = _spark
    if args.pipeline == "materialize":
        # S10 incremental feature materialization: watermark from the
        # store's partition layout + a one-day probe, compute ONLY the
        # delta (per-row caption descriptors — trivially delta-closed,
        # no lookback), idempotent upsert. First run bootstraps the
        # store; re-runs write nothing unless the snapshot table grew.
        # --input: snapshot table root; --output: the feature store.
        import datetime
        import json

        from profet_spark.functions import text_descriptors as td
        from profet_spark.sources import load_table
        from profet_spark.sources.partitioned import materialize_incremental

        if not args.output:
            ap.error("--pipeline materialize requires --output "
                     "(the feature-store root)")
        snaps = load_table(spark, args.input, "images").select(
            "image_id", "ts", "caption")
        late = (datetime.timedelta(days=args.late_days)
                if args.late_days else None)
        m = materialize_incremental(
            spark, snaps, args.output,
            compute=td.add_caption_features_packed,
            ts_col="ts", entity_col="image_id", late_window=late)
        print(json.dumps(m, default=str))
        if _spark is None:
            spark.stop()
        return 0
    if args.pipeline == "diff":
        # S11 store audit: what changed between two versions of a
        # write_partitioned store (e.g. the incrementally-maintained
        # store vs a full recompute). Prints the per-status summary as
        # the job's one-line JSON; with --output also writes the
        # per-key (added/removed/changed) rows as parquet.
        import json

        from profet_spark.sources.partitioned import store_diff

        if not args.right:
            ap.error("--pipeline diff requires --right "
                     "(the right-hand store root)")
        summary = {r["diff_status"]: r["n"]
                   for r in store_diff(spark, args.input, args.right,
                                       mode="summary").collect()}
        for k in ("added", "removed", "changed", "unchanged"):
            summary.setdefault(k, 0)
        print(json.dumps(summary, sort_keys=True))
        if args.output:
            (store_diff(spark, args.input, args.right)
             .write.mode("overwrite").parquet(args.output))
            print(f"wrote {args.output}")
        if _spark is None:
            spark.stop()
        return 0
    if args.pipeline == "snapshot":
        # S13 versioned snapshot ingest: the first run creates the store
        # from the events table; re-runs append ONLY the rows past the
        # store's high watermark as one new snapshot commit (O(delta),
        # old versions stay readable for time travel / rollback);
        # --keep-last runs reference-counted retention after the commit.
        # Watermark probe is metadata-first: the manifest names the max
        # day, and only THAT day's partitions are read for the exact max
        # ts — one partition read, never the table.
        import json

        from pyspark.sql import functions as F

        from profet_spark.sources import load_table
        from profet_spark.sources import versioned as V

        if not args.output:
            ap.error("--pipeline snapshot requires --output "
                     "(the versioned-store root)")
        ev = load_table(spark, args.input, "events").select(
            "event_id", "user_id", "ts", "value")
        if V.read_spec(args.output) is None:
            ver = V.create_versioned(
                ev, args.output, ts_col="ts", entity_col="user_id",
                n_buckets=args.n_shards,
                lineage=f"snapshot: bootstrap from {args.input}")
            op = "create"
        else:
            m = V.read_manifest(args.output)
            wm = None
            if m["partitions"]:
                last_day = max(t.rsplit("/", 1)[0] for t in m["partitions"])
                wm = (V.read_versioned(
                    spark, args.output,
                    ts_between=(f"{last_day} 00:00:00",
                                f"{last_day} 23:59:59.999999"))
                    .agg(F.max("ts")).collect()[0][0])
            delta = ev if wm is None else ev.where(F.col("ts") > F.lit(wm))
            if delta.take(1):
                ver = V.append_versioned(
                    spark, delta, args.output,
                    lineage=f"snapshot: delta after {wm}")
                op = "append"
            else:
                ver, op = m["version"], "noop"
        if args.keep_last:
            V.expire_versions(spark, args.output, keep_last=args.keep_last)
        hist = V.version_history(args.output)
        print(json.dumps({
            "version": ver, "operation": op,
            "rows_written": 0 if op == "noop" else next(
                h["metrics"]["rows_written"]
                for h in hist if h["version"] == ver),
            "versions_retained": [h["version"] for h in hist]}))
        if _spark is None:
            spark.stop()
        return 0
    if args.pipeline == "compact":
        # S9 store maintenance: rewrites only fragmented small partitions,
        # returns the audit counters as the job's one-line JSON output
        # (--output unused). Versioned stores (snapshot pipeline output)
        # are compacted as a new snapshot commit; write_partitioned
        # stores in place.
        import json

        from profet_spark.sources import versioned as V
        from profet_spark.sources.partitioned import compact_partitions

        if V.read_spec(args.input) is not None:
            result = V.compact_versioned(spark, args.input)
        else:
            result = compact_partitions(spark, args.input)
        print(json.dumps(result))
        if _spark is None:
            spark.stop()
        return 0
    out = _build(spark, args.pipeline, args.input, eval_root=args.eval_input,
                 ngram=args.ngram, min_side=args.min_side,
                 batch_size=args.batch_size, n_shards=args.n_shards,
                 cap=args.cap, threshold=args.threshold)
    quarantine = None
    if isinstance(out, tuple):  # ingest: (clean, quarantine)
        out, quarantine = out
    if args.output:
        w = out.write.mode("overwrite")
        if args.pipeline == "pq_index":
            w = w.partitionBy("cid")  # probe == directory pruning
        w.parquet(args.output)
        print(f"wrote {args.output}")
        if quarantine is not None:
            qdir = args.output.rstrip("/") + "_quarantine"
            quarantine.write.mode("overwrite").parquet(qdir)
            print(f"wrote {qdir}")
    else:
        out.write.format("noop").mode("overwrite").save()
        if quarantine is not None:
            quarantine.write.format("noop").mode("overwrite").save()
        print("noop sink: plan executed end-to-end")
    if _spark is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
