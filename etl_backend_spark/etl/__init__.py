from . import writes

__all__ = ["writes"]
