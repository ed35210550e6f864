from .numeric import dsum, davg, ratio
from .maps import recode_map

__all__ = ["dsum", "davg", "ratio", "recode_map"]
