"""Text geometry sources: newline-delimited GeoJSON and WKT → WKB.

The reference world ingests geometry through geopandas.read_file
(shapefile/GeoJSON); this engine's interchange column is 2-D
little-endian WKB (geom/wkb.py).  These adapters bridge the common
text formats a reference user would arrive with:

- ``read_geojson``: newline-delimited GeoJSON features (GeoJSONSeq —
  the big-data framing: one Feature per line, splittable by byte
  range, so a 100 TB crawl of features scans in parallel like any
  text source).  Parsing runs in ``mapInPandas`` (Arrow batches; text
  → structure is genuine Python work, the legitimate UDF slot), and
  emits (properties JSON string, geom_type, geometry WKB).
- ``wkt_to_wkb_col`` / ``wkb_to_wkt_col``: column transforms for WKT
  CSVs and for exporting back to text.

Shapefile ingestion is NOT provided: the format is unsplittable,
zip-bound and needs a sidecar-file stack this container doesn't carry
— convert to GeoJSONSeq upstream (ogr2ogr does this in one line).

Parsers are from scratch (regex tokenizer + recursive descent for
WKT; json module for GeoJSON) over the package's own WKB writer —
no shapely/geopandas anywhere.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom import wkb as W

# ---------------------------------------------------------------- GeoJSON


def geojson_geom_to_wkb(g: dict) -> bytes:
    """GeoJSON geometry object → WKB.  Coordinates beyond (x, y) are
    rejected (the engine is strictly 2-D, same as its EWKB reader)."""
    t = g.get("type")
    c = g.get("coordinates")
    if t == "Point":
        _check_xy(c)
        return W.dumps_point(c)
    if t == "LineString":
        [_check_xy(p) for p in c]
        return W.dumps_linestring(c)
    if t == "Polygon":
        [_check_xy(p) for ring in c for p in ring]
        return W.dumps_polygon(c)
    if t == "MultiPoint":
        [_check_xy(p) for p in c]
        return W.dumps_multipoint(c)
    if t == "MultiLineString":
        [_check_xy(p) for line in c for p in line]
        return W.dumps_multilinestring(c)
    if t == "MultiPolygon":
        [_check_xy(p) for poly in c for ring in poly for p in ring]
        return W.dumps_multipolygon(c)
    if t == "GeometryCollection":
        return W.dumps_geometrycollection(
            [geojson_geom_to_wkb(part) for part in g.get("geometries", [])]
        )
    raise ValueError(f"unsupported GeoJSON geometry type: {t!r}")


def _check_xy(p) -> None:
    if len(p) != 2:
        raise ValueError(
            f"only 2-D coordinates supported, got {len(p)}-element position"
        )


def read_geojson(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """Newline-delimited GeoJSON features → DataFrame[properties
    (JSON string), geom_type, geometry (WKB binary)].

    ``strict=False`` drops unparseable lines instead of failing the
    job (crawl-grade input hygiene); parse errors surface per line
    with the offending prefix otherwise."""
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            props, gtypes, wkbs = [], [], []
            for line in pdf["value"]:
                if not line or line.isspace():
                    continue
                try:
                    feat = json.loads(line)
                    geom = feat["geometry"] if feat.get("type") == "Feature" else feat
                    buf = geojson_geom_to_wkb(geom)
                    gtype = geom["type"]
                    prop = json.dumps(
                        feat.get("properties") or {}, sort_keys=True
                    )
                except (ValueError, KeyError, TypeError) as ex:
                    if strict:
                        raise ValueError(
                            f"bad GeoJSON line {line[:80]!r}: {ex}"
                        ) from ex
                    continue
                props.append(prop)
                gtypes.append(gtype)
                wkbs.append(buf)
            yield pd.DataFrame(
                {"properties": props, "geom_type": gtypes, "geometry": wkbs}
            )

    return lines.mapInPandas(
        parse, "properties string, geom_type string, geometry binary"
    )


# ------------------------------------------------------------------- WKT

_WKT_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(.*)$", re.S)
_NUM = re.compile(r"[-+0-9.eE]+")


def _parse_nested(s: str):
    """Parse a balanced-paren WKT coordinate body into nested lists:
    numbers split on whitespace, siblings split on commas."""
    s = s.strip()
    if not s.startswith("("):
        # leaf: "x y"
        return [float(v) for v in _NUM.findall(s)]
    # split top-level comma-separated children inside the outer parens
    if not s.endswith(")"):
        raise ValueError(f"unbalanced WKT parens near {s[:40]!r}")
    body = s[1:-1]
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced WKT parens near {body[:40]!r}")
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    if depth != 0:
        raise ValueError(f"unbalanced WKT parens near {body[:40]!r}")
    parts.append(body[start:])
    return [_parse_nested(p) for p in parts]


def wkt_to_wkb(s: str) -> bytes:
    """WKT → WKB, 2-D only.  Supports the seven OGC types + EMPTY."""
    m = _WKT_HEAD.match(s)
    if not m:
        raise ValueError(f"not WKT: {s[:40]!r}")
    name, rest = m.group(1).upper(), m.group(2).strip()
    if name in ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
                "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
        if rest.upper().startswith("EMPTY"):
            empty = {
                "POINT": lambda: W.dumps_multipoint([]),  # no empty point in WKB
                "LINESTRING": lambda: W.dumps_linestring([]),
                "POLYGON": lambda: W.dumps_polygon([]),
                "MULTIPOINT": lambda: W.dumps_multipoint([]),
                "MULTILINESTRING": lambda: W.dumps_multilinestring([]),
                "MULTIPOLYGON": lambda: W.dumps_multipolygon([]),
                "GEOMETRYCOLLECTION": lambda: W.dumps_geometrycollection([]),
            }
            return empty[name]()
    if name == "GEOMETRYCOLLECTION":
        if not (rest.startswith("(") and rest.endswith(")")):
            raise ValueError(f"unbalanced WKT parens near {rest[:40]!r}")
        body = rest[1:-1]
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(body[start:i])
                start = i + 1
        parts.append(body[start:])
        return W.dumps_geometrycollection([wkt_to_wkb(p) for p in parts])

    coords = _parse_nested(rest)
    try:
        if name == "POINT":
            return W.dumps_point(coords[0] if isinstance(coords[0], list) else coords)
        if name == "LINESTRING":
            return W.dumps_linestring(coords)
        if name == "POLYGON":
            return W.dumps_polygon(coords)
        if name == "MULTIPOINT":
            # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
            flat = [p[0] if isinstance(p[0], list) else p for p in coords]
            return W.dumps_multipoint(flat)
        if name == "MULTILINESTRING":
            return W.dumps_multilinestring(coords)
        if name == "MULTIPOLYGON":
            return W.dumps_multipolygon(coords)
    except (TypeError, IndexError) as ex:
        raise ValueError(f"malformed {name} coordinates: {ex}") from ex
    raise ValueError(f"unsupported WKT type: {name!r}")


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) else repr(v)


def _fmt_xy(p) -> str:
    return f"{_fmt_num(p[0])} {_fmt_num(p[1])}"


def wkb_to_wkt(buf: bytes) -> str:
    """WKB → canonical WKT (ints unsuffixed, shortest float repr)."""
    code, payload = W.loads(buf)
    return _wkt_of(code, payload)


def _wkt_of(code: int, payload) -> str:
    if code == W.WKB_POINT:
        return f"POINT ({_fmt_xy(payload)})"
    if code == W.WKB_LINESTRING:
        if len(payload) == 0:
            return "LINESTRING EMPTY"
        return "LINESTRING (" + ", ".join(_fmt_xy(p) for p in payload) + ")"
    if code == W.WKB_POLYGON:
        if len(payload) == 0:
            return "POLYGON EMPTY"
        rings = ", ".join(
            "(" + ", ".join(_fmt_xy(p) for p in ring) + ")" for ring in payload
        )
        return f"POLYGON ({rings})"
    if code == W.WKB_MULTIPOINT:
        if len(payload) == 0:
            return "MULTIPOINT EMPTY"
        return (
            "MULTIPOINT (" + ", ".join(f"({_fmt_xy(p)})" for p in payload) + ")"
        )
    if code == W.WKB_MULTILINESTRING:
        if len(payload) == 0:
            return "MULTILINESTRING EMPTY"
        lines = ", ".join(
            "(" + ", ".join(_fmt_xy(p) for p in line) + ")" for line in payload
        )
        return f"MULTILINESTRING ({lines})"
    if code == W.WKB_MULTIPOLYGON:
        if len(payload) == 0:
            return "MULTIPOLYGON EMPTY"
        polys = ", ".join(
            "("
            + ", ".join(
                "(" + ", ".join(_fmt_xy(p) for p in ring) + ")" for ring in poly
            )
            + ")"
            for poly in payload
        )
        return f"MULTIPOLYGON ({polys})"
    if code == W.WKB_GEOMETRYCOLLECTION:
        if len(payload) == 0:
            return "GEOMETRYCOLLECTION EMPTY"
        return (
            "GEOMETRYCOLLECTION ("
            + ", ".join(_wkt_of(c, p) for c, p in payload)
            + ")"
        )
    raise ValueError(f"unsupported WKB type code {code}")


def wkt_to_wkb_col(col: str = "wkt") -> F.Column:
    """Column transform: WKT string → WKB binary (Arrow-batched)."""

    @F.pandas_udf("binary")
    def conv(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else wkt_to_wkb(v))

    return conv(F.col(col))


def wkb_to_wkt_col(col: str = "geometry") -> F.Column:
    """Column transform: WKB binary → canonical WKT string."""

    @F.pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else wkb_to_wkt(bytes(v)))

    return conv(F.col(col))
