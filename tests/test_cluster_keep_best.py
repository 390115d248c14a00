"""End-to-end near-dup clustering (minhash pairs -> connected
components -> keep_best): closed-form cluster structure on a corpus
with engineered duplicate chains, and cross-parallelism determinism."""

from pyspark.sql import functions as F

from maup_spark.functions.dedup import keep_best, minhash_lsh_pairs
from maup_spark.operators.components import connected_components


def _chain_corpus(spark):
    """Three exact copies of doc A (ids 1,2,3), two of doc B (ids
    10,11), and unique docs 20..24.  Exact copies share every shingle
    so LSH must pair them; the uniques share none."""
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base_b = "one two three four five six seven eight nine ten"
    rows = [(1, base_a), (2, base_a), (3, base_a), (10, base_b), (11, base_b)]
    rows += [
        (20 + i, f"unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e")
        for i in range(5)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cluster(spark, docs):
    pairs = minhash_lsh_pairs(docs)
    comp = connected_components(
        docs.select(F.col("doc_id").alias("node")),
        pairs,
        src_col="doc_a",
        dst_col="doc_b",
    )
    return comp


class TestClusterKeepBest:
    def test_chain_components(self, spark):
        docs = _chain_corpus(spark)
        comp = {r.node: r.comp for r in _cluster(spark, docs).collect()}
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == 10
        for i in range(5):
            assert comp[20 + i] == 20 + i  # singletons keep their id

    def test_keep_best_selects_per_cluster(self, spark):
        docs = _chain_corpus(spark)
        comp = _cluster(spark, docs)
        # score = doc_id so "best" is the numerically largest member
        clustered = comp.select(
            "comp", F.col("node").alias("doc_id"), F.col("node").alias("s")
        )
        out = {
            r.comp: (r.doc_id, r.n_members)
            for r in keep_best(clustered, "comp", "s", min_members=2).collect()
        }
        assert out == {1: (3, 3), 10: (11, 2)}

    def test_transitive_chain_one_cluster(self, spark):
        # A~B and B~C but A!~C (suffix drift): components must still
        # merge all three via transitivity
        t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
        rows = [(1, t), (2, t + " tailA"), (3, t + " tailA tailB")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        comp = {r.node: r.comp for r in _cluster(spark, docs).collect()}
        assert comp[1] == comp[2] == comp[3] == 1

    def test_deterministic_across_parallelism(self, spark):
        docs = _chain_corpus(spark)
        a = _cluster(spark, docs.repartition(1)).collect()
        b = _cluster(spark, docs.repartition(16)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
