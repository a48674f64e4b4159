from tristage_rag_tpu.serve.batcher import MicroBatcher
from tristage_rag_tpu.serve.jsonrpc import JsonRpcError, StdioJsonRpcServer
from tristage_rag_tpu.serve.mcp_server import RetrievalMCPServer

__all__ = [
    "MicroBatcher",
    "StdioJsonRpcServer",
    "JsonRpcError",
    "RetrievalMCPServer",
]
