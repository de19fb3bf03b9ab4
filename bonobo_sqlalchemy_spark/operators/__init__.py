from .upsert import InsertOrUpdate

__all__ = ["InsertOrUpdate"]
