

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
