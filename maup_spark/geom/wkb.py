"""WKB (well-known binary) codec, pure numpy/struct.

The engine stores every geometry column as ``binary`` WKB, the same
interchange format the reference relies on for 2-D coercion
(/root/reference/maup/smart_repair.py:111-112).  Only 2-D little-endian
WKB is produced; both byte orders are accepted on read.

Geometry payload convention used across the package (see
``maup_spark.geom.base.Geometry``):

- Point            -> ndarray shape (2,)
- LineString       -> ndarray shape (N, 2)
- Polygon          -> list[ndarray (N, 2)]  (exterior first, closed rings)
- MultiPoint       -> ndarray shape (N, 2)
- MultiLineString  -> list[ndarray (N, 2)]
- MultiPolygon     -> list[list[ndarray (N, 2)]]
- GeometryCollection -> list[Geometry]
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_TYPE_NAMES = {
    WKB_POINT: "Point",
    WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon",
    WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString",
    WKB_MULTIPOLYGON: "MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    return struct.pack("<I", len(ring)) + ring.tobytes()


def dumps_point(xy) -> bytes:
    return b"\x01" + struct.pack("<I", WKB_POINT) + struct.pack("<dd", float(xy[0]), float(xy[1]))


def dumps_linestring(coords) -> bytes:
    return b"\x01" + struct.pack("<I", WKB_LINESTRING) + _ring_bytes(np.asarray(coords))


def dumps_polygon(rings) -> bytes:
    out = [b"\x01", struct.pack("<I", WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        out.append(_ring_bytes(np.asarray(ring)))
    return b"".join(out)


def _dumps_multi(code: int, parts: list[bytes]) -> bytes:
    return b"\x01" + struct.pack("<I", code) + struct.pack("<I", len(parts)) + b"".join(parts)


def dumps_multipoint(coords) -> bytes:
    return _dumps_multi(WKB_MULTIPOINT, [dumps_point(c) for c in np.asarray(coords)])


def dumps_multilinestring(lines) -> bytes:
    return _dumps_multi(WKB_MULTILINESTRING, [dumps_linestring(l) for l in lines])


def dumps_multipolygon(polys) -> bytes:
    return _dumps_multi(WKB_MULTIPOLYGON, [dumps_polygon(p) for p in polys])


def dumps_geometrycollection(wkbs: list[bytes]) -> bytes:
    return _dumps_multi(WKB_GEOMETRYCOLLECTION, wkbs)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _fmt(self, little: bool, ch: str) -> str:
        return ("<" if little else ">") + ch

    def read(self):
        buf, pos = self.buf, self.pos
        little = buf[pos] == 1
        (code,) = struct.unpack_from(self._fmt(little, "I"), buf, pos + 1)
        self.pos = pos + 5
        # EWKB (PostGIS) flag bits: Z=0x80000000, M=0x40000000,
        # SRID=0x20000000.  Z/M carry extra coordinates we cannot
        # silently drop -> reject; SRID carries a 4-byte payload that
        # must be SKIPPED (consuming it as coordinates silently corrupts)
        if code & 0xC0000000:
            raise ValueError(
                f"unsupported EWKB Z/M dimensionality (code 0x{code:08x}); "
                "this engine is strictly 2-D"
            )
        if code & 0x20000000:
            self.pos += 4  # skip the SRID payload
            code &= ~0x20000000
        if code >= 1000:  # ISO WKB Z(+1000)/M(+2000)/ZM(+3000) types
            raise ValueError(
                f"unsupported ISO WKB dimensionality (code {code}); "
                "this engine is strictly 2-D"
            )
        if code == WKB_POINT:
            (x, y) = struct.unpack_from(self._fmt(little, "dd"), buf, self.pos)
            self.pos += 16
            return code, np.array([x, y])
        if code == WKB_LINESTRING:
            return code, self._ring(little)
        if code == WKB_POLYGON:
            (n,) = struct.unpack_from(self._fmt(little, "I"), buf, self.pos)
            self.pos += 4
            return code, [self._ring(little) for _ in range(n)]
        if code in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
            (n,) = struct.unpack_from(self._fmt(little, "I"), buf, self.pos)
            self.pos += 4
            parts = [self.read() for _ in range(n)]
            if code == WKB_MULTIPOINT:
                return code, (
                    np.array([p for _, p in parts]) if parts else np.empty((0, 2))
                )
            if code == WKB_GEOMETRYCOLLECTION:
                return code, parts  # list of (code, payload) pairs
            return code, [p for _, p in parts]
        raise ValueError(f"unsupported WKB geometry code {code}")

    def _ring(self, little: bool) -> np.ndarray:
        (n,) = struct.unpack_from(self._fmt(little, "I"), self.buf, self.pos)
        self.pos += 4
        arr = np.frombuffer(
            self.buf, dtype=("<f8" if little else ">f8"), count=2 * n, offset=self.pos
        ).reshape(n, 2)
        self.pos += 16 * n
        return arr.astype(np.float64)


def loads(buf: bytes):
    """Parse WKB -> (type_code, payload); see module docstring for payloads.

    Truncated / malformed buffers raise ValueError naming the problem
    instead of leaking numpy/struct internals from deep inside a Spark
    worker."""
    try:
        return _Reader(buf).read()
    except (struct.error, IndexError) as ex:
        raise ValueError(
            f"malformed WKB ({len(buf)} bytes): {ex}"
        ) from ex
