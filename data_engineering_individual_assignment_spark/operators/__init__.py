from . import dedup, joins, regression, similarity

__all__ = ["dedup", "joins", "regression", "similarity"]
