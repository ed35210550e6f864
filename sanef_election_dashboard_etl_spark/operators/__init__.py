from . import relational, text, dedup, similarity, multimodal

__all__ = ["relational", "text", "dedup", "similarity", "multimodal"]
