from . import dedup, dispatch, multimodal, similarity

__all__ = ["dedup", "dispatch", "multimodal", "similarity"]
