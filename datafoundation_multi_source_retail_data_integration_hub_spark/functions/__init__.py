from . import dates, normalize

__all__ = ["dates", "normalize"]
