from . import chat_pipeline

__all__ = ["chat_pipeline"]
