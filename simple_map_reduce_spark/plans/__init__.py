from .sql import parse, FilterQuery, JoinQuery, run

__all__ = ["parse", "FilterQuery", "JoinQuery", "run"]
