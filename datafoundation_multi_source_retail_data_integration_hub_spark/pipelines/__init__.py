from . import retail

__all__ = ["retail"]
