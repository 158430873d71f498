from . import codecs, dedup, hygiene, multimodal, sampling, similarity, textstats

__all__ = ["codecs", "dedup", "hygiene", "similarity", "textstats", "multimodal", "sampling"]
