from . import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
