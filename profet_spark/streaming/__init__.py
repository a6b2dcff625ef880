"""Structured Streaming analogs of the batch temporal operators (SURVEY.md
§2.9). Batch is the correctness contract; these prove every temporal op has
a streaming twin with matching semantics (verified in tests/test_streaming.py
by running both on the same rows)."""

from profet_spark.streaming.dedup_stream import (  # noqa: F401
    committed_batches,
    ingest_stream,
)
from profet_spark.streaming.temporal_stream import (  # noqa: F401
    dedup_within_watermark,
    read_parquet_stream,
    run_available_now,
    session_agg,
    sliding_counts,
    stateful_asof_attach,
    stateful_decayed_stats,
    stateful_drift_profile,
    stateful_matrix_attach,
    stateful_target_encode,
    stateful_windowed_agg,
    theta_daily_rollup,
    tumbling_counts,
    windowed_drift_counts,
)
