from pyspark_bigdata_sars_cov_2_analysis_spark.streaming.events import (
    funnel_state,
    latest_per_user_state,
    latest_state_per_key,
    read_event_stream,
    running_user_totals,
    running_user_totals_v2,
    segment_window_counts,
    sessionized,
    sliding_counts,
    tumbling_counts,
    view_purchase_attribution,
    view_purchase_attribution_outer,
)

__all__ = [
    "funnel_state",
    "latest_per_user_state",
    "latest_state_per_key",
    "read_event_stream",
    "running_user_totals",
    "running_user_totals_v2",
    "segment_window_counts",
    "sessionized",
    "sliding_counts",
    "tumbling_counts",
    "view_purchase_attribution",
    "view_purchase_attribution_outer",
]
