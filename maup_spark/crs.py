"""CRS metadata gate.

The reference enforces CRS equality with a decorator raising TypeError
at call time (/root/reference/maup/crs.py:4-16) and rejects geographic
CRS for repair work (/root/reference/maup/smart_repair.py:116-120).
Spark DataFrames carry no geometry metadata, so the engine tracks CRS
as an explicit layer property checked at *plan build* (before any job
is launched) — same contract, earlier failure.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

_GEOGRAPHIC = {"EPSG:4326", "EPSG:4269", "OGC:CRS84"}


@dataclass(frozen=True)
class Layer:
    """A geometry DataFrame + its layer-level metadata."""

    df: DataFrame
    crs: str | None = None
    geom_col: str = "geometry"


def require_same_crs(a: Layer | str | None, b: Layer | str | None) -> None:
    """Raise TypeError when two layers' CRS differ (reference parity:
    /root/reference/maup/crs.py:9-14)."""
    ca = a.crs if isinstance(a, Layer) else a
    cb = b.crs if isinstance(b, Layer) else b
    if ca != cb:
        raise TypeError(
            "the source and target geometries must have the same CRS. "
            f"{ca} {cb}"
        )


def require_projected(crs: str | None) -> None:
    """Reject geographic (lon/lat-degree) CRS where planar math is
    required (/root/reference/maup/smart_repair.py:116-120)."""
    if crs is not None and crs.upper() in _GEOGRAPHIC:
        raise TypeError(
            f"{crs} is a geographic CRS; reproject to a projected CRS "
            "before repair operations"
        )
