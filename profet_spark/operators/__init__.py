from profet_spark.operators import (  # noqa: F401
    batching,
    corpus,
    dedup,
    encoding,
    membership,
    similarity,
    sketches,
)
from profet_spark.operators.asof import asof_join
from profet_spark.operators.feature_matrix import point_in_time_matrix
from profet_spark.operators.temporal import (
    bfill,
    expanding_stats,
    ffill,
    latest_snapshot,
    sessionize,
    sliding_time_window,
    tumbling_window,
    with_lag_lead,
)

__all__ = [
    "asof_join",
    "point_in_time_matrix",
    "with_lag_lead",
    "ffill",
    "bfill",
    "sessionize",
    "expanding_stats",
    "tumbling_window",
    "sliding_time_window",
    "latest_snapshot",
]
