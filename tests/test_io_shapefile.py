"""Zipped-shapefile bootstrap: write -> read round-trip on synthesized
zips (the reference's only real input format, reference
tests/test_assign.py:146-148)."""

import numpy as np
import pytest

from maup_spark.geom.base import Geometry, signed_area
from maup_spark.io.shapefile import (read_shapefile_zip, shapefile_to_parquet,
                                     write_shapefile_zip)


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=float,
    )


def test_polygon_roundtrip_with_holes(spark, tmp_path):
    path = str(tmp_path / "layer.zip")
    donut = Geometry("Polygon", [_sq(0, 0, 4), _sq(1, 1, 1)])
    multi = Geometry.multipolygon([[_sq(10, 0, 2)], [_sq(20, 0, 3), _sq(21, 1, 1)]])
    write_shapefile_zip(
        path,
        [
            (donut, {"NAME": "donut", "POP": 17}),
            (multi, {"NAME": "twin", "POP": 5}),
            (None, {"NAME": "void", "POP": 0}),
        ],
        prj_wkt='PROJCS["fake"]',
    )
    df = read_shapefile_zip(spark, path)
    rows = {r["fid"]: r for r in df.collect()}
    assert df.columns == ["fid", "geometry", "NAME", "POP"]
    assert [rows[i]["NAME"] for i in range(3)] == ["donut", "twin", "void"]
    assert [rows[i]["POP"] for i in range(3)] == [17, 5, 0]
    assert rows[2]["geometry"] is None

    g0 = Geometry.from_wkb(bytes(rows[0]["geometry"]))
    assert g0.gtype == "Polygon"
    assert g0.area == pytest.approx(16 - 1)
    assert g0.num_interior_rings == 1

    g1 = Geometry.from_wkb(bytes(rows[1]["geometry"]))
    parts = list(g1.polygons())
    assert len(parts) == 2
    assert g1.area == pytest.approx(4 + 9 - 1)
    # the hole landed on the polygon that contains it
    holed = [rings for rings in parts if len(rings) > 1]
    assert len(holed) == 1 and abs(signed_area(holed[0][0])) == pytest.approx(9)


def test_point_and_line_roundtrip(spark, tmp_path):
    ppath = str(tmp_path / "pts.zip")
    write_shapefile_zip(
        ppath,
        [(Geometry.point(1.5, -2.25), {"ID": 1}), (Geometry.point(3, 4), {"ID": 2})],
    )
    pts = {
        r["ID"]: Geometry.from_wkb(bytes(r["geometry"])).data
        for r in read_shapefile_zip(spark, ppath).collect()
    }
    assert tuple(pts[1]) == (1.5, -2.25) and tuple(pts[2]) == (3.0, 4.0)

    lpath = str(tmp_path / "lines.zip")
    zigzag = Geometry.linestring([[0, 0], [1, 2], [3, 1]])
    write_shapefile_zip(lpath, [(zigzag, {"ID": 7})])
    (row,) = read_shapefile_zip(spark, lpath).collect()
    g = Geometry.from_wkb(bytes(row["geometry"]))
    assert np.allclose(next(iter(g.lines())), zigzag.data)


def test_dbf_types_and_nulls(spark, tmp_path):
    path = str(tmp_path / "typed.zip")
    write_shapefile_zip(
        path,
        [
            (Geometry.point(0, 0), {"N": 42, "F": 2.5, "L": True, "C": "abc"}),
            (Geometry.point(1, 1), {"N": None, "F": None, "L": False, "C": None}),
        ],
    )
    df = read_shapefile_zip(spark, path)
    assert dict(df.dtypes) == {
        "fid": "bigint", "geometry": "binary",
        "N": "bigint", "F": "double", "L": "boolean", "C": "string",
    }
    a, b = sorted(df.collect(), key=lambda r: r["fid"])
    assert (a["N"], a["L"], a["C"]) == (42, True, "abc")
    assert a["F"] == pytest.approx(2.5)
    assert (b["N"], b["F"], b["C"]) == (None, None, None)


def test_shapefile_to_parquet_bootstrap(spark, tmp_path):
    path = str(tmp_path / "boot.zip")
    write_shapefile_zip(
        path, [(Geometry("Polygon", [_sq(i, 0, 1)]), {"K": i}) for i in range(5)]
    )
    out = str(tmp_path / "boot_parquet")
    shapefile_to_parquet(spark, path, out)
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert {r["K"] for r in back.select("K").collect()} == set(range(5))


def test_malformed_inputs(spark, tmp_path):
    import zipfile

    bad = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("x.shp", b"\x00" * 50)
    with pytest.raises(ValueError, match="magic"):
        read_shapefile_zip(spark, bad)

    noshp = str(tmp_path / "noshp.zip")
    with zipfile.ZipFile(noshp, "w") as z:
        z.writestr("readme.txt", "hi")
    with pytest.raises(ValueError, match="no .shp"):
        read_shapefile_zip(spark, noshp)


def test_roundtrip_fuzz_coordinates(spark, tmp_path):
    """Coordinates are IEEE doubles in both SHP and WKB: round-trip must
    be bit-exact for arbitrary finite values (hypothesis-generated once,
    pinned here for determinism)."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=25, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        x0=st.floats(-1e15, 1e15, allow_nan=False, allow_infinity=False),
        y0=st.floats(-1e15, 1e15, allow_nan=False, allow_infinity=False),
        s=st.floats(1e-6, 1e9, allow_nan=False, allow_infinity=False),
    )
    def collect(x0, y0, s):
        cases.append((x0, y0, s))

    collect()
    path = str(tmp_path / "fuzz.zip")
    write_shapefile_zip(
        path,
        [
            (Geometry("Polygon", [_sq(x0, y0, s)]), {"I": i})
            for i, (x0, y0, s) in enumerate(cases)
        ],
    )
    back = {
        r["I"]: Geometry.from_wkb(bytes(r["geometry"]))
        for r in read_shapefile_zip(spark, path).collect()
    }
    for i, (x0, y0, s) in enumerate(cases):
        ring = next(iter(back[i].polygons()))[0]
        expect = _sq(x0, y0, s)
        # SHP stores raw doubles; the reader may reverse ring order (CW
        # normalization round-trips rectilinear rings to the same set)
        got = {(float(x), float(y)) for x, y in ring}
        want = {(float(x), float(y)) for x, y in expect}
        assert got == want, (i, x0, y0, s)


def test_dataframe_export_roundtrip(spark, tmp_path):
    from maup_spark.io.shapefile import dataframe_to_shapefile_zip

    df = spark.createDataFrame(
        [(i, Geometry("Polygon", [_sq(i, 0, 1)]).wkb, f"n{i}") for i in range(4)],
        "gid bigint, geometry binary, name string",
    )
    path = str(tmp_path / "export.zip")
    dataframe_to_shapefile_zip(df, path)
    back = read_shapefile_zip(spark, path)
    rows = sorted(back.collect(), key=lambda r: r["gid"])
    assert [r["gid"] for r in rows] == [0, 1, 2, 3]
    assert [r["name"] for r in rows] == ["n0", "n1", "n2", "n3"]
    assert Geometry.from_wkb(bytes(rows[2]["geometry"])).area == 1.0


def test_zip_member_selection_hardening(spark, tmp_path):
    """Resource forks (__MACOSX/._layer.shp), hidden entries, and
    mispaired sidecars must not hijack member selection; two real
    layers in one zip is ambiguous and must raise."""
    import io
    import zipfile

    src = str(tmp_path / "clean.zip")
    write_shapefile_zip(src, [(Geometry.polygon(_sq(0, 0, 1)), {"A": 1})])
    with zipfile.ZipFile(src) as z:
        parts = {n: z.read(n) for n in z.namelist()}

    # resource forks + hidden junk alongside the real layer
    noisy = str(tmp_path / "noisy.zip")
    with zipfile.ZipFile(noisy, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
        z.writestr("__MACOSX/._clean.shp", b"\x00junk")
        z.writestr("__MACOSX/._clean.dbf", b"\x00junk")
        z.writestr(".hidden.shp", b"\x00junk")
    df = read_shapefile_zip(spark, noisy)
    assert df.count() == 1 and df.collect()[0]["A"] == 1

    # two full layers -> ambiguous, refuse to guess
    dual = str(tmp_path / "dual.zip")
    with zipfile.ZipFile(dual, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
            z.writestr("other/" + n.replace("clean", "other"), b)
    with pytest.raises(ValueError, match="multiple shapefile layers"):
        read_shapefile_zip(spark, dual)


def test_dbf_numeric_width_is_checked(tmp_path):
    """A numeric wider than its declared field must raise, never be
    sliced (left-keeping slice silently corrupts the magnitude)."""
    path = str(tmp_path / "narrow.zip")
    with pytest.raises(ValueError, match="widen the field"):
        write_shapefile_zip(
            path,
            [(Geometry.polygon(_sq(0, 0, 1)), {"BIG": 123456})],
            fields=[("BIG", "N", 4, 0)],
        )


def test_mixed_int_float_infers_numeric(spark, tmp_path):
    """A column holding both ints and floats must infer as F (numeric),
    not degrade to C text."""
    path = str(tmp_path / "mixed.zip")
    write_shapefile_zip(
        path,
        [
            (Geometry.polygon(_sq(0, 0, 1)), {"V": 2}),
            (Geometry.polygon(_sq(2, 0, 1)), {"V": 2.5}),
        ],
    )
    df = read_shapefile_zip(spark, path)
    vals = sorted(r["V"] for r in df.collect())
    assert vals == [2.0, 2.5]
    assert dict(df.dtypes)["V"] == "double"


def test_wide_int64_roundtrips(spark, tmp_path):
    """Data-sized numeric widths: an int needing > 18 chars still
    round-trips exactly."""
    path = str(tmp_path / "wide.zip")
    big = -(2**62)
    write_shapefile_zip(path, [(Geometry.polygon(_sq(0, 0, 1)), {"N": big})])
    df = read_shapefile_zip(spark, path)
    assert df.collect()[0]["N"] == big
