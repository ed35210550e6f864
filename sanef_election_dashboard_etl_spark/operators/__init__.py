from . import dedup, multimodal, pandas_ops, relational, similarity, text

__all__ = ["dedup", "multimodal", "pandas_ops", "relational", "similarity", "text"]
