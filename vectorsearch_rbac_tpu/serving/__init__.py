from .server import BatchingServer, SearchRequest, SearchResult

__all__ = ["BatchingServer", "SearchRequest", "SearchResult"]
