from chatvector_ai_spark.streaming.incremental import (  # noqa: F401
    stream_event_rollup,
    stream_ingest_chunks,
)
