from . import dedup, multimodal, sampling, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal", "sampling"]
