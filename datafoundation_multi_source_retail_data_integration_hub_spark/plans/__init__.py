from .star_schema import DimensionSpec, FactSpec, StarSchema, build_star_schema

__all__ = ["DimensionSpec", "FactSpec", "StarSchema", "build_star_schema"]
