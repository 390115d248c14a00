"""CRS gate parity (/root/reference/maup/crs.py:4-16, smart_repair.py:116-120)."""

import pytest

from maup_spark.crs import Layer, require_projected, require_same_crs


def test_same_crs_passes():
    require_same_crs("EPSG:5070", "EPSG:5070")
    require_same_crs(None, None)


def test_mismatch_raises():
    with pytest.raises(TypeError, match="same CRS"):
        require_same_crs("EPSG:5070", "EPSG:3857")


def test_geographic_rejected_for_repair():
    with pytest.raises(TypeError, match="geographic"):
        require_projected("EPSG:4326")
    require_projected("EPSG:5070")
