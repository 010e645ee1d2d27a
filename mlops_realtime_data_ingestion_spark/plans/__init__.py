from .spec import QuerySpec

__all__ = ["QuerySpec"]
