from .registry import QUERIES, QuerySpec, get_queries, get_oracles  # noqa: F401
