from stockpulse_spark.streaming.pipeline import (
    dedup_stream,
    dual_sink_writer,
    replay_json_stream,
    streaming_resample,
)

__all__ = [
    "dedup_stream",
    "dual_sink_writer",
    "replay_json_stream",
    "streaming_resample",
]
