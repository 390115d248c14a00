from .base import Geometry, points_in_rings, signed_area
from .arrangement import (
    build_arrangement,
    difference,
    holes_of_union_geom,
    intersection,
    intersection_area,
    make_valid,
    union_all,
)

__all__ = [
    "Geometry",
    "points_in_rings",
    "signed_area",
    "build_arrangement",
    "difference",
    "holes_of_union_geom",
    "intersection",
    "intersection_area",
    "make_valid",
    "union_all",
]
