"""Zipped-ESRI-shapefile bootstrap (read + write), pure Python.

The reference's entire example corpus is zipped shapefiles loaded via
``geopandas.read_file("zip://...")`` (reference tests/test_assign.py:146-148,
README.md:51-53).  A ``.shp`` is UNSPLITTABLE — variable-length records
with no sync markers — and needs its ``.dbf``/``.shx`` sidecars, so the
100-TB design is NOT a distributed scan of shapefiles: this module is
the driver-side BOOTSTRAP that converts a zipped layer into splittable
parquet once (``shapefile_to_parquet``); every downstream operator then
reads parquet with full pushdown/pruning.  Polygon layers in the wild
(district/precinct maps, the reference's use case) are 10^3-10^5 rows —
driver-side parse is milliseconds, and the expensive work (assign,
intersections) happens after the parquet handoff.

The codecs are from-scratch over the public ESRI whitepaper format
(July 1998), in the same spirit as io/geo.py's WKT/GeoJSON parsers —
no geopandas/pyogrio/shapely anywhere.  Supported shapes: Null (0),
Point (1), PolyLine (3), Polygon (5), MultiPoint (8); Z/M variants are
rejected loudly.  Ring semantics follow the spec: exterior rings
clockwise, holes counter-clockwise; on read each hole is attached to
the outer ring containing its first vertex.
"""

from __future__ import annotations

import io
import os
import struct
import zipfile
from typing import Iterable, Sequence

import numpy as np

from ..geom.base import Geometry, point_in_ring, signed_area

_SHAPE_NULL = 0
_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5
_SHAPE_MULTIPOINT = 8
_SUPPORTED = {_SHAPE_NULL, _SHAPE_POINT, _SHAPE_POLYLINE, _SHAPE_POLYGON,
              _SHAPE_MULTIPOINT}


# --------------------------------------------------------------------- read

def _rings_to_geometry(rings: list[np.ndarray]) -> Geometry:
    """ESRI ring soup -> (Multi)Polygon: CW = outer, CCW = hole; holes
    join the outer ring that contains their first vertex."""
    outers = [r for r in rings if signed_area(r) < 0]
    holes = [r for r in rings if signed_area(r) >= 0]
    if not outers:  # degenerate producer: treat everything as outer
        outers, holes = holes, []
    polys: list[list[np.ndarray]] = [[o] for o in outers]
    for h in holes:
        hx, hy = float(h[0, 0]), float(h[0, 1])
        for p in polys:
            if point_in_ring(hx, hy, p[0]):
                p.append(h)
                break
        else:  # orphan hole: keep the area by treating it as an outer
            polys.append([h])
    return Geometry.multipolygon(polys)


def _parse_shp(buf: bytes) -> list[tuple[int, Geometry | None]]:
    if len(buf) < 100 or struct.unpack(">i", buf[0:4])[0] != 9994:
        raise ValueError("not a shapefile: bad magic (expect 9994)")
    layer_type = struct.unpack("<i", buf[32:36])[0]
    if layer_type not in _SUPPORTED:
        raise ValueError(
            f"unsupported shapefile shape type {layer_type} "
            "(Z/M variants and patches are not supported)")
    out: list[tuple[int, Geometry | None]] = []
    off = 100
    while off + 8 <= len(buf):
        recno, nwords = struct.unpack(">ii", buf[off:off + 8])
        content = buf[off + 8:off + 8 + 2 * nwords]
        off += 8 + 2 * nwords
        st = struct.unpack("<i", content[0:4])[0]
        if st == _SHAPE_NULL:
            out.append((recno, None))
            continue
        if st != layer_type:
            raise ValueError(f"record {recno} shape type {st} != layer {layer_type}")
        if st == _SHAPE_POINT:
            x, y = struct.unpack("<2d", content[4:20])
            out.append((recno, Geometry.point(x, y)))
            continue
        if st == _SHAPE_MULTIPOINT:
            (n,) = struct.unpack("<i", content[36:40])
            pts = np.frombuffer(content[40:40 + 16 * n], "<f8").reshape(n, 2)
            out.append((recno, Geometry("MultiPoint", [p.copy() for p in pts])))
            continue
        # PolyLine / Polygon share the parts layout
        nparts, npoints = struct.unpack("<2i", content[36:44])
        parts = struct.unpack(f"<{nparts}i", content[44:44 + 4 * nparts])
        pts_off = 44 + 4 * nparts
        pts = np.frombuffer(
            content[pts_off:pts_off + 16 * npoints], "<f8"
        ).reshape(npoints, 2)
        bounds = list(parts) + [npoints]
        pieces = [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
        if st == _SHAPE_POLYLINE:
            out.append((recno, Geometry.multilinestring(pieces)))
        else:
            out.append((recno, _rings_to_geometry(pieces)))
    return out


def _parse_dbf(buf: bytes):
    """-> (fields [(name, type_char, length, decimals)], records [dict])."""
    nrec, hsize, rsize = struct.unpack("<ihh", buf[4:12])
    fields = []
    off = 32
    while off < hsize - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    records = []
    off = hsize
    for _ in range(nrec):
        rec = buf[off:off + rsize]
        off += rsize
        if not rec or rec[0:1] == b"*":  # deleted row
            continue
        vals = {}
        p = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[p:p + flen].decode("latin-1")
            p += flen
            s = raw.strip()
            if ftype == "C" or ftype == "D":
                vals[name] = s if s else None
            elif ftype == "L":
                vals[name] = (s in "YyTt") if s and s != "?" else None
            elif ftype in ("N", "F"):
                if not s:
                    vals[name] = None
                elif fdec == 0 and ftype == "N" and "." not in s:
                    vals[name] = int(s)
                else:
                    vals[name] = float(s)
            else:
                raise ValueError(f"unsupported DBF field type {ftype!r}")
        records.append(vals)
    return fields, records


def read_shapefile_zip(spark, path: str):
    """Parse a zipped shapefile into DataFrame[fid, geometry, attrs...].

    Driver-side bootstrap (see module docstring) — the result should be
    written to parquet (``shapefile_to_parquet``) before heavy use.
    ``fid`` is the 0-based record index (matching the reference's
    RangeIndex after ``geopandas.read_file``); ``geometry`` is WKB.
    """
    with zipfile.ZipFile(path) as z:
        # Real-world zips carry __MACOSX/._layer.shp resource forks,
        # hidden files, or several nested layers: skip hidden/underscore
        # entries, group sidecars by shared basename, and refuse to
        # guess when more than one candidate layer remains.
        layers: dict[str, dict[str, str]] = {}
        for n in z.namelist():
            bn = os.path.basename(n)
            if not bn or bn.startswith((".", "_")) or "__MACOSX" in n:
                continue
            stem, ext = os.path.splitext(bn)
            layers.setdefault(stem.lower(), {})[ext.lower()] = n
        cands = {s: m for s, m in layers.items() if ".shp" in m}
        if not cands:
            raise ValueError(f"no .shp member in {path}")
        if len(cands) > 1:
            raise ValueError(
                f"multiple shapefile layers in {path}: "
                f"{sorted(cands)} — extract the one you want"
            )
        (members,) = cands.values()
        shp = z.read(members[".shp"])
        dbf = z.read(members[".dbf"]) if ".dbf" in members else None
    shapes = _parse_shp(shp)
    fields, records = _parse_dbf(dbf) if dbf else ([], [{}] * len(shapes))
    if len(records) != len(shapes):
        raise ValueError(
            f".shp has {len(shapes)} records but .dbf has {len(records)}")

    from pyspark.sql.types import (BinaryType, BooleanType, DoubleType,
                                   LongType, StringType, StructField,
                                   StructType)
    _T = {"C": StringType(), "D": StringType(), "L": BooleanType()}
    schema = StructType(
        [StructField("fid", LongType()), StructField("geometry", BinaryType())]
        + [
            StructField(
                name,
                _T.get(ft, LongType() if (ft == "N" and fdec == 0) else DoubleType()),
            )
            for name, ft, flen, fdec in fields
        ]
    )
    rows = [
        tuple(
            [i, geom.wkb if geom is not None else None]
            + [rec.get(name) for name, *_ in fields]
        )
        for i, ((_, geom), rec) in enumerate(zip(shapes, records))
    ]
    return spark.createDataFrame(rows, schema)


def shapefile_to_parquet(spark, zip_path: str, out_path: str,
                         partition_cols: Sequence[str] = ()) -> None:
    """One-shot bootstrap: zipped shapefile -> (optionally partitioned)
    parquet, the splittable format every operator here consumes."""
    df = read_shapefile_zip(spark, zip_path)
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(out_path)


# -------------------------------------------------------------------- write

def _oriented(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    cw = signed_area(ring) < 0
    return ring if cw == clockwise else ring[::-1]


def _shape_record(geom: Geometry | None, layer_type: int) -> bytes:
    if geom is None or geom.is_empty:
        return struct.pack("<i", _SHAPE_NULL)
    if layer_type == _SHAPE_POINT:
        (pt,) = list(geom.points())
        return struct.pack("<i2d", _SHAPE_POINT, float(pt[0]), float(pt[1]))
    if layer_type == _SHAPE_MULTIPOINT:
        pts = np.asarray(list(geom.points()), dtype="<f8")
        return (
            struct.pack("<i4d", _SHAPE_MULTIPOINT,
                        pts[:, 0].min(), pts[:, 1].min(),
                        pts[:, 0].max(), pts[:, 1].max())
            + struct.pack("<i", len(pts)) + pts.tobytes()
        )
    if layer_type == _SHAPE_POLYLINE:
        parts = [np.asarray(l, dtype="<f8") for l in geom.lines()]
    else:
        parts = []
        for rings in geom.polygons():
            parts.append(_oriented(np.asarray(rings[0], dtype="<f8"), True))
            parts.extend(
                _oriented(np.asarray(h, dtype="<f8"), False) for h in rings[1:]
            )
    allpts = np.concatenate(parts)
    starts, n = [], 0
    for p in parts:
        starts.append(n)
        n += len(p)
    return (
        struct.pack("<i4d", layer_type,
                    allpts[:, 0].min(), allpts[:, 1].min(),
                    allpts[:, 0].max(), allpts[:, 1].max())
        + struct.pack(f"<2i{len(parts)}i", len(parts), n, *starts)
        + allpts.astype("<f8").tobytes()
    )


def _dbf_bytes(fields, records) -> bytes:
    hsize = 32 + 32 * len(fields) + 1
    rsize = 1 + sum(f[2] for f in fields)
    out = io.BytesIO()
    out.write(struct.pack("<4Bihh20x", 0x03, 95, 7, 26, len(records), hsize, rsize))
    for name, ftype, flen, fdec in fields:
        out.write(struct.pack(
            "<11sc4xBB14x", name.encode("latin-1")[:11], ftype.encode(), flen, fdec
        ))
    out.write(b"\x0d")
    for rec in records:
        out.write(b" ")
        for name, ftype, flen, fdec in fields:
            v = rec.get(name)
            if v is None:
                s = ""
            elif ftype in ("N", "F"):
                s = f"{v:.{fdec}f}" if fdec else str(int(v))
                if len(s) > flen:
                    # slicing would silently corrupt the magnitude
                    raise ValueError(
                        f"value {v!r} needs {len(s)} chars but field "
                        f"{name!r} is {ftype}({flen},{fdec}) — widen the field"
                    )
                s = s.rjust(flen)
            elif ftype == "L":
                s = "T" if v else "F"
            else:
                s = str(v)
            enc = s.encode("latin-1")[:flen].ljust(flen, b" ")
            out.write(enc)
    out.write(b"\x1a")
    return out.getvalue()


def _infer_fields(records: list[dict]) -> list[tuple[str, str, int, int]]:
    fields = []
    seen: dict[str, str] = {}
    order: list[str] = []
    for rec in records:
        for k, v in rec.items():
            if k not in seen:
                order.append(k)
                seen[k] = ""
            if v is None:
                continue
            t = ("L" if isinstance(v, bool) else
                 "N" if isinstance(v, int) else
                 "F" if isinstance(v, float) else "C")
            prev = seen[k]
            if prev in ("", t):
                seen[k] = t
            elif {prev, t} == {"N", "F"}:
                seen[k] = "F"  # mixed int/float stays numeric, not text
            else:
                seen[k] = "C"
    for k in order:
        t = seen[k] or "C"
        if t == "N":
            # width sized from the data (int64 can need 20 chars with
            # sign; a fixed 18 would make _dbf_bytes raise)
            width = max(
                [18] + [len(str(int(r[k]))) for r in records if r.get(k) is not None]
            )
            fields.append((k, "N", width, 0))
        elif t == "F":
            width = max(
                [24]
                + [len(f"{float(r[k]):.15f}") for r in records if r.get(k) is not None]
            )
            fields.append((k, "F", width, 15))
        elif t == "L":
            fields.append((k, "L", 1, 0))
        else:
            width = max(
                [1] + [len(str(r.get(k, ""))) for r in records if r.get(k) is not None]
            )
            fields.append((k, "C", min(max(width, 1), 254), 0))
    return fields


def write_shapefile_zip(
    path: str,
    records: Iterable[tuple[Geometry | bytes | None, dict]],
    fields: Sequence[tuple[str, str, int, int]] | None = None,
    prj_wkt: str | None = None,
) -> None:
    """Write (geometry, attrs) records as a zipped shapefile
    (.shp/.shx/.dbf [+ .prj]).  ``records``: geometry as a Geometry or
    WKB bytes (None -> null shape); attrs as a flat dict.  ``fields``
    (DBF descriptors, (name, C|N|F|L, length, decimals)) are inferred
    from the attribute values when omitted.  Exists so shapefile
    workflows ROUND-TRIP through this engine (and for tests); the
    production direction is shapefile_to_parquet."""
    recs = [
        (Geometry.from_wkb(g) if isinstance(g, (bytes, bytearray)) else g, dict(a))
        for g, a in records
    ]
    geoms = [g for g, _ in recs]
    nonnull = [g for g in geoms if g is not None and not g.is_empty]
    layer_type = _SHAPE_POLYGON
    if nonnull:
        t = nonnull[0].gtype
        layer_type = {
            "Point": _SHAPE_POINT, "MultiPoint": _SHAPE_MULTIPOINT,
            "LineString": _SHAPE_POLYLINE, "MultiLineString": _SHAPE_POLYLINE,
        }.get(t, _SHAPE_POLYGON)

    shp_records = [_shape_record(g, layer_type) for g in geoms]
    # layer bbox over non-null shapes
    xs, ys = [], []
    for g in nonnull:
        x0, y0, x1, y1 = g.bounds
        xs += [x0, x1]
        ys += [y0, y1]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (0.0, 0.0, 0.0, 0.0)

    body = io.BytesIO()
    shx_body = io.BytesIO()
    off_words = 50  # header is 100 bytes = 50 words
    for i, content in enumerate(shp_records):
        nwords = len(content) // 2
        shx_body.write(struct.pack(">2i", off_words, nwords))
        body.write(struct.pack(">2i", i + 1, nwords))
        body.write(content)
        off_words += 4 + nwords

    def header(total_words: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<2i", 1000, layer_type)
        h += struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
        assert len(h) == 100
        return h

    shp_bytes = header(50 + len(body.getvalue()) // 2) + body.getvalue()
    shx_bytes = header(50 + len(shx_body.getvalue()) // 2) + shx_body.getvalue()
    dbf_fields = list(fields) if fields is not None else _infer_fields(
        [a for _, a in recs]
    )
    dbf_bytes = _dbf_bytes(dbf_fields, [a for _, a in recs])

    base = os.path.splitext(os.path.basename(path))[0]
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(f"{base}.shp", shp_bytes)
        z.writestr(f"{base}.shx", shx_bytes)
        z.writestr(f"{base}.dbf", dbf_bytes)
        if prj_wkt:
            z.writestr(f"{base}.prj", prj_wkt)
    os.replace(tmp, path)


def dataframe_to_shapefile_zip(
    df,
    path: str,
    geom_col: str = "geometry",
    prj_wkt: str | None = None,
) -> None:
    """Export a (bounded) geometry DataFrame as a zipped shapefile —
    the reverse bootstrap, for handing results back to reference-stack
    tooling.  Collects to the driver by design: shapefiles are a
    driver-side interchange format here (see module docstring); big
    layers belong in parquet."""
    cols = [c for c in df.columns if c != geom_col]
    records = [
        (
            bytes(r[geom_col]) if r[geom_col] is not None else None,
            {c: r[c] for c in cols},
        )
        for r in df.select(geom_col, *cols).collect()
    ]
    write_shapefile_zip(path, records, prj_wkt=prj_wkt)
