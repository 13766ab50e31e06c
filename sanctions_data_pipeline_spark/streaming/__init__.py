from sanctions_data_pipeline_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    run_available_now,
    session_agg,
    tumbling_agg,
)
