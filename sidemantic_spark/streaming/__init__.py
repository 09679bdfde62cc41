from sidemantic_spark.streaming.stream_layer import (
    StreamingError,
    StreamingModelBinding,
    StreamingSemanticLayer,
)

__all__ = ["StreamingError", "StreamingModelBinding", "StreamingSemanticLayer"]
