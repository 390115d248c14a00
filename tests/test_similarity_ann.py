"""ANN quality gates: the Lloyd-trained IVF quantizer must beat (or
match) the stride stand-in at equal nprobe, measured as recall@k
against the exact brute-force neighbors."""

import numpy as np
import pytest

from tests.conftest import SF_DIR


def _ground_truth(spark, k=5, query_stride=50):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    truth = {}
    for qi in np.nonzero(ids % query_stride == 0)[0]:
        sims = V @ V[qi]
        sims[qi] = -np.inf
        top = ids[np.argsort(-sims)[:k]]
        truth[int(ids[qi])] = set(int(t) for t in top)
    return truth


def _recall(out_rows, truth, k=5):
    got = {}
    for r in out_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / (k * len(truth))


def test_kmeans_quantizer_recall_at_least_stride(spark):
    """In the regime where the quantizer actually matters (enough
    centroids that a bad partition loses neighbors: stride 31 → 16
    centroids over this 500-vector corpus), Lloyd training beats the
    stride stand-in by a wide margin at equal probe budget (measured
    0.48 vs 0.34 recall@5 at nprobe=3)."""
    from maup_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    truth = _ground_truth(spark)
    r_stride = _recall(
        ivf_topk(
            emb, quantizer="stride", centroid_stride=31, nprobe=3
        ).collect(),
        truth,
    )
    r_kmeans = _recall(
        ivf_topk(
            emb,
            quantizer="kmeans",
            centroid_stride=31,
            nprobe=3,
            kmeans_iter=2,
        ).collect(),
        truth,
    )
    assert r_kmeans >= r_stride + 0.05, (r_kmeans, r_stride)


def test_kmeans_centroids_shape_and_empty_cluster_guard(spark):
    from maup_spark.functions.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_iter=2).collect()
    assert len(cents) >= 2
    dims = {len(r["cv"]) for r in cents}
    assert dims == {64}
    # ids survive as cluster keys and vectors are finite
    for r in cents:
        assert all(np.isfinite(v) for v in r["cv"])


def test_ivf_rejects_unknown_quantizer(spark):
    from maup_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError):
        ivf_topk(emb, quantizer="nope").collect()
