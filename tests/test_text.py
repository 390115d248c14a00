

def test_skew_report(spark):
    from maup_spark.telemetry import skew_report

    df = spark.createDataFrame(
        [(k,) for k in ["hot"] * 90 + ["a", "b", "c", "d", "e"] * 2],
        "k string",
    )
    rep = skew_report(df, "k", top_n=3)
    assert rep["n_keys"] == 6 and rep["n_rows"] == 100
    assert rep["max"] == 90 and rep["top"][0] == ("hot", 90)
    assert abs(rep["skew_ratio"] - 90 / (100 / 6)) < 1e-9
    assert [k for k, _ in rep["top"][1:]] == ["a", "b"]  # count-desc, key tiebreak


class TestNormalizeText:
    def _norm(self, spark, text):
        from maup_spark.functions.text import normalize_text

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return normalize_text(df).collect()[0]["norm_text"]

    def test_closed_form(self, spark):
        assert (
            self._norm(spark, "  Hello,   WORLD!! 42  \t(ok)")
            == "hello world 42 ok"
        )

    def test_unicode_letters_kept(self, spark):
        # \p{L} keeps accented letters; punctuation between them drops
        assert self._norm(spark, "Déjà-Vu: Ünïcode") == "déjàvu ünïcode"

    def test_idempotent(self, spark):
        from maup_spark.functions.text import normalize_text

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate([
                "A.B,C;D", "x  y\tz", "ALL CAPS!!", "", "42-7=35?",
                "ünïcode Déjà  vu", "a\nb\r\nc",
            ])],
            "doc_id long, text string",
        )
        from pyspark.sql import functions as F

        once = normalize_text(docs).select("doc_id", F.col("norm_text").alias("text"))
        twice = normalize_text(once)
        bad = twice.filter(F.col("text") != F.col("norm_text")).collect()
        assert bad == []

    def test_empty_and_symbol_only(self, spark):
        assert self._norm(spark, "") == ""
        assert self._norm(spark, "!!! ??? ...") == ""

    def test_pure_projection_plan(self, spark):
        from maup_spark.functions.text import normalize_text

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            normalize_text(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


class TestChunkDocuments:
    def _chunks(self, spark, text, mx, ov):
        from maup_spark.functions.text import chunk_documents

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_documents(df, max_tokens=mx, overlap=ov).orderBy(
            "chunk_idx"
        ).collect()
        return [r["chunk_text"] for r in rows]

    def test_closed_form(self, spark):
        got = self._chunks(spark, "a b c d e f g", 4, 1)
        assert got == ["a b c d", "d e f g", "g"]

    def test_no_overlap(self, spark):
        assert self._chunks(spark, "a b c d e", 2, 0) == ["a b", "c d", "e"]

    def test_every_token_covered_and_overlap_exact(self, spark):
        toks = [f"t{i}" for i in range(100)]
        got = self._chunks(spark, " ".join(toks), 16, 4)
        # reassembling with the overlap dropped reproduces the doc
        rebuilt = got[0].split(" ")
        for c in got[1:]:
            rebuilt += c.split(" ")[4:]
        assert rebuilt == toks
        # consecutive chunks share exactly 4 tokens (except a short tail)
        for a, b in zip(got, got[1:]):
            assert a.split(" ")[-4:] == b.split(" ")[:4] or len(b.split(" ")) < 16

    def test_short_doc_one_chunk(self, spark):
        assert self._chunks(spark, "x", 32, 8) == ["x"]
        assert self._chunks(spark, "", 32, 8) == [""]

    def test_overlap_bound(self, spark):
        from maup_spark.functions.text import chunk_documents

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        try:
            chunk_documents(df, max_tokens=4, overlap=4)
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_pure_projection_plan(self, spark):
        from maup_spark.functions.text import chunk_documents

        df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        plan = (
            chunk_documents(df, 2, 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Python" not in plan
