from .catalog import QUERIES, Query

__all__ = ["QUERIES", "Query"]
