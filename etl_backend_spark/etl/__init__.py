from . import incremental, manifest, scd, writes

__all__ = ["incremental", "manifest", "scd", "writes"]
