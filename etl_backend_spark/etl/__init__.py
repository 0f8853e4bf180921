from . import manifest, scd, writes

__all__ = ["manifest", "scd", "writes"]
