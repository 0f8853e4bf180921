from . import aggregates, filters, joins, pagination, scans, skew, windows

__all__ = ["aggregates", "filters", "joins", "pagination", "scans", "skew", "windows"]
