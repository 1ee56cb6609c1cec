from speech_data_pipeline_spark.streaming.ingest import (  # noqa: F401
    read_event_stream,
    streaming_sessionize,
    streaming_type_counts,
)
