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


class TestLm2:
    def test_bigram_counts_closed_form(self, spark):
        from maup_spark.functions.lm import lm2_train

        docs = _docs(spark, [(1, "a b a b c"), (2, "a b")])
        got = {r.g: (r.cnt, r.fam) for r in lm2_train(docs).collect()}
        # bigrams: doc1 = "a b","b a","a b","b c"; doc2 = "a b"
        assert got["a b"] == (3, 1)
        assert got["b a"] == (1, 0)
        assert got["b c"] == (1, 0)

    def test_backoff_math_closed_form(self, spark):
        from maup_spark.functions.lm import lm2_score, lm2_train, lm_train

        train = _docs(spark, [(1, "x y x y x y z z z z z z z z")])
        lm1 = lm_train(train)   # z: cnt 8 fam 3; x: 3 fam 1; y: 3 fam 1
        lm2 = lm2_train(train, max_vocab=2)  # top-2 bigrams: "x y"(3),"z z"(7)
        # doc: "x y" hits bigram table (fam2); "y q" unseen, q OOV -> 0;
        # "q z" unseen, z fam1 3 -> backoff 2
        r = lm2_score(_docs(spark, [(9, "x y q z")]), lm2, lm1).first()
        assert r.n_bigrams == 3 and r.n_hits2 == 1
        f2_xy = {x.g: x.fam for x in lm2.collect()}["x y"]
        assert r.fam_sum == f2_xy + 0 + 2

    def test_short_docs_emit_no_row(self, spark):
        from maup_spark.functions.lm import lm2_score, lm2_train, lm_train

        train = _docs(spark, [(1, "a b")])
        out = lm2_score(
            _docs(spark, [(1, "solo"), (2, "")]),
            lm2_train(train), lm_train(train),
        ).collect()
        assert out == []

    def test_plan_broadcast_no_window(self, spark):
        from maup_spark.functions.lm import lm2_score, lm2_train, lm_train

        docs = _docs(spark, [(i, f"w{i} w{(i+1) % 5} common") for i in range(20)])
        plan = (
            lm2_score(docs, lm2_train(docs), lm_train(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Window" not in plan and "SortMergeJoin" not in plan
