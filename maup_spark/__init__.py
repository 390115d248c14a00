"""maup_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the operator semantics of mggg/maup (reference at
/root/reference, studied not ported).

Public API mirrors /root/reference/maup/__init__.py:28-45, re-expressed
over Spark DataFrames with WKB geometry columns:

- assign / assign_points / assign_by_area / assign_to_max
- intersections / prorate / normalize
- adjacencies, doctor, close_gaps, resolve_overlaps, quick_repair,
  snap_to_grid, crop_to, expand_to  (operators.repair / adjacency)
- CellGrid spatial index, Geometry kernel (geom)
"""

from .index.cells import CellGrid
from .geom.base import Geometry
from .operators.assign import assign, assign_by_area, assign_points, assign_to_max
from .operators.intersections import intersections, prorate
from .operators.normalize import normalize
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "CellGrid",
    "Geometry",
    "assign",
    "assign_by_area",
    "assign_points",
    "assign_to_max",
    "get_spark",
    "intersections",
    "normalize",
    "prorate",
]
