"""weighted_sample (functions/text.py): exact parity with a local
Python replica of the A-Res key math, weight semantics, determinism,
and the distributed top-K plan shape."""

import hashlib
import math

from pyspark.sql import functions as F

from maup_spark.functions.text import weighted_sample


def _key(doc_id, w, salt="ws"):
    h = hashlib.md5(f"{doc_id}#{salt}".encode()).hexdigest()[:15]
    u = float(int(h, 16)) / float(1 << 60)
    return -math.log(u) / w


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


class TestWeightedSample:
    def test_matches_python_replica_exactly(self, spark):
        rows = [(i, (i % 7) + 1) for i in range(500)]
        got = {r.doc_id for r in weighted_sample(_df(spark, rows), 50, "w").collect()}
        want = {i for i, w in sorted(rows, key=lambda t: (_key(*t), t[0]))[:50]}
        assert got == want

    def test_heavy_weight_dominates(self, spark):
        # one row carries 10^6x the weight of 99 others: its Exp(w) key
        # is ~10^6x smaller in expectation; with this fixed hash it wins
        rows = [(i, 1) for i in range(1, 100)] + [(0, 1_000_000)]
        got = weighted_sample(_df(spark, rows), 1, "w").first()
        assert got.doc_id == 0

    def test_nonpositive_weights_excluded(self, spark):
        rows = [(1, 0), (2, -5), (3, 7)]
        got = [r.doc_id for r in weighted_sample(_df(spark, rows), 3, "w").collect()]
        assert got == [3]

    def test_without_replacement_and_k_cap(self, spark):
        rows = [(i, 1) for i in range(10)]
        got = [r.doc_id for r in weighted_sample(_df(spark, rows), 4, "w").collect()]
        assert len(got) == len(set(got)) == 4

    def test_deterministic_across_parallelism(self, spark):
        rows = [(i, (i * 13) % 9 + 1) for i in range(400)]
        a = weighted_sample(_df(spark, rows).repartition(1), 30, "w").collect()
        b = weighted_sample(_df(spark, rows).repartition(16), 30, "w").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_consistent_under_corpus_growth(self, spark):
        # a row sampled from the small corpus stays sampled when only
        # LIGHTER competitors arrive (its key is unchanged; consistent
        # hashing) — the cache-validity property stratified_sample has
        rows = [(i, 5) for i in range(100)]
        small = {r.doc_id for r in weighted_sample(_df(spark, rows), 10, "w").collect()}
        grown_rows = rows + [(1000 + i, 1) for i in range(50)]
        grown = {
            r.doc_id
            for r in weighted_sample(_df(spark, grown_rows), 10, "w").collect()
        }
        # keys of the original rows are unchanged; any displacement can
        # only come from a new row whose key beats an incumbent's
        kept = small & grown
        displaced = small - grown
        for d in displaced:
            assert max(_key(n, 1) for n in range(1000, 1050)) < _key(d, 5) or any(
                _key(n, 1) < _key(d, 5) for n in range(1000, 1050)
            )
        assert len(kept) >= 5  # sanity: growth did not reshuffle everything

    def test_plan_top_k_not_global_sort(self, spark):
        df = _df(spark, [(i, 1) for i in range(10)])
        plan = (
            weighted_sample(df, 3, "w")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan
