"""Discrete-global-grid cell index (H3/S2 stand-in, built from scratch).

The reference accelerates every spatial op with an in-memory STRtree
whose probe is a bbox query (/root/reference/maup/indexed_geometries.py:19-29).
That cannot distribute; the Spark-native analog materializes a *cell
cover* column: the plane is cut into a 2^res × 2^res grid, every geometry
is exploded to the cells its bbox touches, and the bbox-probe becomes a
hash **equi-join on cell_id** that Catalyst can plan (broadcast for small
polygon layers, shuffle+AQE otherwise).  Exact geometry refinement then
runs per candidate pair, exactly like the reference's covers/intersection
refine after the tree probe.

Cell ids are pure integer arithmetic:

    ix = floor((x - x0) / wx),  iy = floor((y - y0) / wy)
    cell_id = iy * 2^res + ix

so a *point's* cell is computed with Spark built-in expressions (stays in
whole-stage codegen; see ``point_cell_expr``) and the same formula is
valid ANSI SQL for DuckDB oracles.  Only polygon covers need a (pandas)
UDF, and polygon layers are the small side.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class CellGrid:
    """A fixed-resolution grid over the extent [x0,x1) × [y0,y1)."""

    x0: float = -180.0
    y0: float = -90.0
    x1: float = 180.0
    y1: float = 90.0
    res: int = 7  # 2^res cells per axis

    @property
    def n(self) -> int:
        return 1 << self.res

    @property
    def wx(self) -> float:
        return (self.x1 - self.x0) / self.n

    @property
    def wy(self) -> float:
        return (self.y1 - self.y0) / self.n

    # ----------------------------------------------------------- python side
    def cell_of_point(self, x: float, y: float) -> int:
        ix = min(max(int((x - self.x0) // self.wx), 0), self.n - 1)
        iy = min(max(int((y - self.y0) // self.wy), 0), self.n - 1)
        return iy * self.n + ix

    def cells_of_points(self, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        ix = np.clip(((xs - self.x0) / self.wx).astype(np.int64), 0, self.n - 1)
        iy = np.clip(((ys - self.y0) / self.wy).astype(np.int64), 0, self.n - 1)
        return iy * self.n + ix

    def cover_bbox(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """All cell ids whose cell rectangle intersects the bbox (the
        distributed analog of an R-tree bbox probe)."""
        ix0 = min(max(int((xmin - self.x0) // self.wx), 0), self.n - 1)
        ix1 = min(max(int((xmax - self.x0) // self.wx), 0), self.n - 1)
        iy0 = min(max(int((ymin - self.y0) // self.wy), 0), self.n - 1)
        iy1 = min(max(int((ymax - self.y0) // self.wy), 0), self.n - 1)
        ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
        return (iys[:, None] * self.n + ixs[None, :]).ravel()

    def cell_bounds(self, cell_id: int):
        iy, ix = divmod(int(cell_id), self.n)
        return (
            self.x0 + ix * self.wx,
            self.y0 + iy * self.wy,
            self.x0 + (ix + 1) * self.wx,
            self.y0 + (iy + 1) * self.wy,
        )

    def ring_cells(self, cell_id: int, ring: int) -> np.ndarray:
        """Cells at Chebyshev distance <= ring (for kNN ring expansion)."""
        iy, ix = divmod(int(cell_id), self.n)
        ix0, ix1 = max(ix - ring, 0), min(ix + ring, self.n - 1)
        iy0, iy1 = max(iy - ring, 0), min(iy + ring, self.n - 1)
        ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
        return (iys[:, None] * self.n + ixs[None, :]).ravel()

    # -------------------------------------------------------- sql mirrors
    def point_cell_sql(self, x_expr: str, y_expr: str) -> str:
        """ANSI-SQL cell id of a point — identical semantics in Spark SQL
        and DuckDB (used for JVM-side point indexing and for oracles)."""
        return (
            f"(CAST(FLOOR(({y_expr} - ({self.y0})) / {self.wy!r}) AS BIGINT) * {self.n} "
            f"+ CAST(FLOOR(({x_expr} - ({self.x0})) / {self.wx!r}) AS BIGINT))"
        )

    def choose_res_for(self, typical_extent: float) -> int:
        """Resolution where a typical geometry bbox spans ~1-2 cells/axis."""
        span = max(self.x1 - self.x0, self.y1 - self.y0)
        return max(0, min(28, int(math.log2(max(span / typical_extent, 1.0)))))
