from . import aggregates, filters, joins, pagination, scans, windows

__all__ = ["aggregates", "filters", "joins", "pagination", "scans", "windows"]
