from . import scd, writes

__all__ = ["scd", "writes"]
