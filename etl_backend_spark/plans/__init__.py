from .query_builder import SearchParams, ads_search, ads_search_total

__all__ = ["SearchParams", "ads_search", "ads_search_total"]
