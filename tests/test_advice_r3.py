"""Regression tests for the round-2 ADVICE.md findings.

- max_bucket must cap PER BAND (a pair is suppressed only when every
  matching band is hot), checked against a semantic reference computed
  from the actual signatures;
- frame_sample must not throw on sub-8-byte video payloads;
- expand_to must key grouped subtraction by a real row id (duplicate
  identical targets don't crash / don't merge arbitrary groups);
- connected_components must raise instead of returning unconverged labels.
"""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, sq_wkb


def _semantic_lsh_pairs(sig_rows, cap):
    """Reference implementation of the documented max_bucket semantics:
    pair (a, b) is emitted iff some band's keys match AND that band's
    bucket is within the cap."""
    from maup_spark.functions.dedup import N_BANDS

    keys = {
        r["doc_id"]: tuple(
            f"{r[f'm{2 * b}']}_{r[f'm{2 * b + 1}']}" for b in range(N_BANDS)
        )
        for r in sig_rows
    }
    bucket_sizes: dict[tuple[int, str], int] = {}
    for bands in keys.values():
        for b, k in enumerate(bands):
            bucket_sizes[(b, k)] = bucket_sizes.get((b, k), 0) + 1
    pairs = set()
    for a, b in combinations(sorted(keys), 2):
        for band in range(len(keys[a])):
            k = keys[a][band]
            if k == keys[b][band] and (
                cap is None or bucket_sizes[(band, k)] <= cap
            ):
                pairs.add((a, b))
                break
    return pairs


@pytest.mark.parametrize("cap", [None, 3, 10])
def test_minhash_max_bucket_per_band_semantics(spark, cap):
    from maup_spark.functions.dedup import minhash_lsh_pairs, minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    sig_rows = minhash_signatures(docs).collect()
    expected = _semantic_lsh_pairs(sig_rows, cap)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, max_bucket=cap).collect()
    }
    assert got == expected


def test_minhash_max_bucket_actually_caps(spark):
    """With many exact duplicates every band bucket is hot: a small cap
    must remove those pairs, and a huge cap must equal the uncapped set."""
    from maup_spark.functions.dedup import minhash_lsh_pairs

    dup = spark.range(30).selectExpr(
        "id AS doc_id", "'the same boilerplate text again and again' AS text"
    )
    assert minhash_lsh_pairs(dup, max_bucket=5).count() == 0
    assert minhash_lsh_pairs(dup, max_bucket=1000).count() == 30 * 29 // 2


def test_frame_sample_short_payload_no_crash(spark):
    from maup_spark.functions.multimodal import frame_sample

    rows = [
        (1, "video", b"abc", (640, 480)),  # < 8 bytes: no sampleable frame
        (2, "video", b"0123456789abcdef0123456789abcdef", (640, 480)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int>",
    )
    out = frame_sample(media).collect()
    ids = {r["media_id"] for r in out}
    assert ids == {2}  # short payload dropped, not a runtime error


def test_expand_to_duplicate_targets(spark):
    """Two byte-identical target rows must not crash the grouped
    subtract; absorbing their (identical) leftovers is idempotent."""
    from maup_spark.geom.base import Geometry
    from maup_spark.operators.repair import expand_to

    source = spark.createDataFrame(
        [("a", sq_wkb(0, 0, 1, 1))], "id string, geometry binary"
    )
    target = spark.createDataFrame(
        [(sq_wkb(0, 0, 1, 2),), (sq_wkb(0, 0, 1, 2),)], "geometry binary"
    )
    out = expand_to(source, target, id_col="id").collect()
    assert len(out) == 1
    g = Geometry.from_wkb(out[0]["geometry"])
    assert g.area == pytest.approx(2.0, abs=1e-9)


def test_connected_components_raises_on_max_iter(spark):
    from maup_spark.operators.components import connected_components

    nodes = spark.range(64).withColumnRenamed("id", "node")
    edges = (
        spark.range(63)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1)
    # and converges fine with the default budget
    lab = connected_components(nodes, edges).collect()
    assert {r["comp"] for r in lab} == {0}
