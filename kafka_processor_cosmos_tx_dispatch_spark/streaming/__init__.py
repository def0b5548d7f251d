from . import dispatch, stateful, windows

__all__ = ["dispatch", "stateful", "windows"]
