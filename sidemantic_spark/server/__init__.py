from sidemantic_spark.server.http_api import SemanticHttpServer
from sidemantic_spark.server.mcp import McpServer

__all__ = ["SemanticHttpServer", "McpServer"]
