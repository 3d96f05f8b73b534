"""Global function sugar under the reference's import path
(reference functions/globals.py): aggregate builders + the map/filter/
sort/cast expression helpers — implementations live in functions/__init__."""
from . import cast, count, filter, map, max, mean, min, sort, sum  # noqa: A004

__all__ = ["count", "sum", "mean", "min", "max",
           "map", "filter", "sort", "cast"]
