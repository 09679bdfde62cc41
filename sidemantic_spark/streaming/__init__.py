from sidemantic_spark.streaming.stream_layer import (
    StreamingModelBinding,
    StreamingSemanticLayer,
)

__all__ = ["StreamingModelBinding", "StreamingSemanticLayer"]
