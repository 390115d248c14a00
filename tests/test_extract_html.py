"""html:binary -> text extraction: the north_star per-row invariant
("byte-identical extracted text per url") over datagen.web_pages, plus
adversarial text-node round-trips (entities-as-text, tags-as-text,
multibyte, whitespace-significant strings).

Reference scope note: mggg/maup has no web surface; this operator
serves the graft's pages-table input shape (url, warc_ts, html:binary,
text, lang)."""

from pyspark.sql import functions as F

from maup_spark.datagen import _HTML_PREFIX, _HTML_SUFFIX, escape_html_text, web_pages
from maup_spark.functions.webtext import extract_text

SF = "/root/testdata/sf0.001"

ADVERSARIAL = [
    "plain ascii",
    "a & b < c > d & e",
    "literal <script>alert('x')</script> inside text",
    "already-escaped &amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;",
    "unicode é 漢字 \U0001f680  nbsp-char",
    "comment markers --> and <!-- in text",
    "",
    "  leading/trailing  and\n\nblank\nlines  ",
    "</p></body> premature closers & <p attr=\"x\"> openers",
]


def _pages_from_texts(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    html = F.concat(
        F.lit(_HTML_PREFIX), escape_html_text(F.col("text")), F.lit(_HTML_SUFFIX)
    )
    return docs.select("doc_id", "text", F.encode(html, "UTF-8").alias("html"))


def test_adversarial_round_trip(spark):
    out = (
        extract_text(_pages_from_texts(spark, ADVERSARIAL))
        .select("doc_id", "text", "text_extracted")
        .collect()
    )
    assert len(out) == len(ADVERSARIAL)
    for r in out:
        assert r.text_extracted == r.text, (
            f"doc {r.doc_id}: {r.text_extracted!r} != {r.text!r}"
        )


def test_web_pages_byte_identical_invariant(spark):
    pages = web_pages(spark, SF)
    # schema is exactly the input_hint shape
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
    out = extract_text(pages)
    n_total = out.count()
    # byte-identity: compare the UTF-8 encodings, not just the strings
    n_bad = out.filter(
        F.encode("text_extracted", "UTF-8") != F.encode("text", "UTF-8")
    ).count()
    assert n_total > 0 and n_bad == 0


def test_extract_plan_is_pure_projection(spark):
    plan = extract_text(web_pages(spark, SF))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, plan


def test_streaming_extract_matches_batch(spark, tmp_path):
    """Extraction is stateless, so the batch operator composes directly
    onto the stream: file-sink output must be byte-equal to the batch
    extraction of the same pages."""
    from maup_spark.streaming.extract_stream import streaming_extract_text

    pages = web_pages(spark, SF)
    src = str(tmp_path / "pagesrc")
    pages.repartition(5).write.parquet(src)

    q = streaming_extract_text(
        spark,
        src,
        checkpoint_dir=str(tmp_path / "pageckpt"),
        output_dir=str(tmp_path / "pageout"),
    )
    q.awaitTermination(240)

    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "pageout")).collect())
    )
    want = sorted(
        map(
            tuple,
            extract_text(pages)
            .select("url", "warc_ts", "lang", "text_extracted")
            .collect(),
        )
    )
    assert got == want and len(got) > 0
