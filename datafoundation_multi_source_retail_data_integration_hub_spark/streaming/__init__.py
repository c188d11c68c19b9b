from . import pipelines

__all__ = ["pipelines"]
