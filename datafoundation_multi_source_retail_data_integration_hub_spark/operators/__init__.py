from . import keys, scd2

__all__ = ["keys", "scd2"]
