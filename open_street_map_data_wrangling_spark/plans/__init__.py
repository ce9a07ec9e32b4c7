from .registry import QUERIES, QuerySpec, load_all_queries, query

__all__ = ["QUERIES", "QuerySpec", "load_all_queries", "query"]
