from . import pipelines, stateful, windows

__all__ = ["pipelines", "stateful", "windows"]
