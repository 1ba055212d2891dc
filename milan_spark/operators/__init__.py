"""DataFrame-native operator implementations of the reference's operator set.

Each module documents which reference construct it reproduces (file:line into
/root/reference) and how the semantics map onto Spark's execution model.
"""

from milan_spark.operators.joins import (
    left_enrichment_join,
    full_enrichment_join,
    left_inner_enrichment_join,
    snapshot_join,
    left_windowed_join_apply,
)
from milan_spark.operators.scans import (
    running_sum_by,
    stream_max_by,
    stream_min_by,
    scan,
    last,
)
from milan_spark.operators.windows import (
    tumbling_window,
    sliding_window,
    record_window,
    session_window_agg,
)

__all__ = [
    "left_enrichment_join",
    "full_enrichment_join",
    "left_inner_enrichment_join",
    "snapshot_join",
    "left_windowed_join_apply",
    "running_sum_by",
    "stream_max_by",
    "stream_min_by",
    "scan",
    "last",
    "tumbling_window",
    "sliding_window",
    "record_window",
    "session_window_agg",
]
