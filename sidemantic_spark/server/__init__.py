from sidemantic_spark.server.http_api import SemanticHttpServer
from sidemantic_spark.server.mcp import McpServer
from sidemantic_spark.server.pgwire import PgWireServer

__all__ = ["SemanticHttpServer", "McpServer", "PgWireServer"]
