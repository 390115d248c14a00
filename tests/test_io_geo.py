"""GeoJSONSeq / WKT source adapters (io/geo.py)."""

import json

import pytest

from maup_spark.geom import wkb as W
from maup_spark.io.geo import (
    geojson_geom_to_wkb,
    read_geojson,
    wkb_to_wkt,
    wkb_to_wkt_col,
    wkt_to_wkb,
    wkt_to_wkb_col,
)

CASES = [
    "POINT (1 2)",
    "POINT (-1.5 2.25)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "POLYGON EMPTY",
    "MULTIPOLYGON EMPTY",
]


@pytest.mark.parametrize("wkt", CASES)
def test_wkt_roundtrip(wkt):
    assert wkb_to_wkt(wkt_to_wkb(wkt)) == wkt


def test_wkt_whitespace_and_case():
    a = wkt_to_wkb("  polygon(( 0 0 ,4 0, 4 4 ,0 4,0 0 ))")
    b = wkt_to_wkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert a == b


@pytest.mark.parametrize(
    "bad",
    ["POLYGON ((0 0, 1 1", "CIRCLE (0 0, 1)", "", "POLYGON 0 0 1 1"],
)
def test_wkt_malformed_raises(bad):
    with pytest.raises(ValueError):
        wkt_to_wkb(bad)


def test_geojson_matches_wkt():
    gj = {
        "type": "Polygon",
        "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
    }
    assert geojson_geom_to_wkb(gj) == wkt_to_wkb(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    )
    with pytest.raises(ValueError, match="2-D"):
        geojson_geom_to_wkb({"type": "Point", "coordinates": [1, 2, 3]})


def test_read_geojson_seq(spark, tmp_path):
    feats = [
        {
            "type": "Feature",
            "properties": {"name": f"f{i}", "pop": i * 10},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[i, 0], [i + 1, 0], [i + 1, 1], [i, 1], [i, 0]]],
            },
        }
        for i in range(20)
    ] + [{"type": "Point", "coordinates": [9.5, 9.5]}]  # bare geometry line
    p = tmp_path / "f.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in feats) + "\n\n")

    df = read_geojson(spark, str(p))
    rows = df.collect()
    assert len(rows) == 21
    by_type = {r["geom_type"] for r in rows}
    assert by_type == {"Polygon", "Point"}
    poly0 = [r for r in rows if '"name": "f0"' in r["properties"]][0]
    code, rings = W.loads(bytes(poly0["geometry"]))
    assert code == W.WKB_POLYGON and len(rings) == 1 and len(rings[0]) == 5

    # strict mode fails on garbage; lenient drops it
    bad = tmp_path / "bad.geojsonl"
    bad.write_text('{"type": "Feature"}\n' + json.dumps(feats[0]) + "\n")
    with pytest.raises(Exception):
        read_geojson(spark, str(bad)).collect()
    assert read_geojson(spark, str(bad), strict=False).count() == 1


def test_wkt_columns_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, f"POINT ({i} {i + 1})") for i in range(10)], "id long, wkt string"
    )
    out = (
        df.withColumn("geometry", wkt_to_wkb_col("wkt"))
        .withColumn("wkt2", wkb_to_wkt_col("geometry"))
        .collect()
    )
    assert all(r["wkt"] == r["wkt2"] for r in out)
