from sidemantic_spark.server.http_api import SemanticHttpServer

__all__ = ["SemanticHttpServer"]
