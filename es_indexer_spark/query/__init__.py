from .engine import IndexSearcher  # noqa: F401
