from . import (dedup, layout, multimodal, packing, pandas_ops, profile,
               relational, sampling, similarity, sketch, temporal, text)

__all__ = ["dedup", "layout", "multimodal", "packing", "pandas_ops",
           "profile", "relational", "sampling", "similarity", "sketch",
           "temporal", "text"]
