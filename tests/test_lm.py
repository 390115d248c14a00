"""Corpus-frequency LM filter (functions/lm.py): closed-form training
counts, integer familiarity, OOV accounting, bucket edges, and
cross-parallelism determinism."""

from pyspark.sql import functions as F

from maup_spark.functions.lm import lm_score, lm_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLmTrain:
    def test_counts_and_fam_closed_form(self, spark):
        docs = _docs(spark, [(1, "a a a a b b c"), (2, "a b  c")])
        got = {r.w: (r.cnt, r.fam) for r in lm_train(docs).collect()}
        # fam = floor(log2 cnt): 6 -> 2, 3 -> 1, 2 -> 1
        assert got == {"a": (5, 2), "b": (3, 1), "c": (2, 1)}

    def test_fam_log2_boundaries(self, spark):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 2, 3, 4, 8])]
        # one doc at a time so cnt is exactly n
        for (i, text), n, want in zip(rows, [1, 2, 3, 4, 8], [0, 1, 1, 2, 3]):
            got = lm_train(_docs(spark, [(i, text)])).first()
            assert (got.cnt, got.fam) == (n, want)

    def test_max_vocab_tie_breaks_by_token(self, spark):
        docs = _docs(spark, [(1, "z y x z y x q")])
        got = [r.w for r in lm_train(docs, max_vocab=2).collect()]
        # x y z all cnt=2 -> lexicographically first two survive
        assert sorted(got) == ["x", "y"]

    def test_empty_tokens_dropped(self, spark):
        docs = _docs(spark, [(1, "a  a   a")])
        rows = lm_train(docs).collect()
        assert {r.w for r in rows} == {"a"}
        assert rows[0].cnt == 3


class TestLmScore:
    def test_oov_and_sums(self, spark):
        train = _docs(spark, [(1, "a a a a b b")])  # a:4(fam 2), b:2(fam 1)
        lm = lm_train(train)
        score = lm_score(_docs(spark, [(7, "a b zz a")]), lm).first()
        assert score.doc_id == 7
        assert score.n_tokens == 4 and score.n_oov == 1
        assert score.fam_sum == 2 + 1 + 0 + 2
        assert score.fam_mean_e6 == round(1e6 * 5 / 4)

    def test_bucket_edges(self, spark):
        # craft fam_mean exactly at the head/tail thresholds
        train = _docs(spark, [(1, " ".join(["h"] * 16) + " " + " ".join(["t"] * 2))])
        lm = lm_train(train)  # h: fam 4, t: fam 1
        out = {
            r.doc_id: r.bucket
            for r in lm_score(
                _docs(spark, [(1, "h"), (2, "t t"), (3, "zz")]), lm
            ).collect()
        }
        assert out == {1: "head", 2: "tail", 3: "tail"}

    def test_zero_token_doc_emits_no_row(self, spark):
        lm = lm_train(_docs(spark, [(1, "a")]))
        out = lm_score(_docs(spark, [(1, "a"), (2, " ")]), lm)
        assert [r.doc_id for r in out.collect()] == [1]

    def test_deterministic_across_parallelism(self, spark):
        rows = [(i, " ".join(f"w{(i * j) % 23}" for j in range(20)))
                for i in range(300)]
        docs = _docs(spark, rows)
        lm = lm_train(docs, max_vocab=10)
        a = lm_score(docs.repartition(1), lm).collect()
        b = lm_score(docs.repartition(16), lm).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_plan_broadcast_join_no_window(self, spark):
        docs = _docs(spark, [(1, "a b c")])
        lm = lm_train(docs)
        plan = lm_score(docs, lm)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Window" not in plan
        assert "SortMergeJoin" not in plan
