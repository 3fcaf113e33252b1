from lakehouse_architecture_transaction_spark.streaming.pipeline import (  # noqa: F401
    hourly_stream_agg,
    run_stream_to_memory,
    sessionize_stateful,
    stream_upsert_into,
)
