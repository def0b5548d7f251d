from . import jsonpath, text, vectors

__all__ = ["jsonpath", "text", "vectors"]
