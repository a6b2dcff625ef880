"""Plan-inspection helpers: make the 100 TB-critical plan properties
(pushdown, pruning, broadcast, Python-free spans) assertable."""

from profet_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    has_node,
    is_python_free,
    is_shuffle_free,
    pushed_filters,
    read_schema_lines,
    scans_column,
)
