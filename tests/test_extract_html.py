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


def test_extract_links_semantics(spark):
    """Outlink harvest: commented-out and script-embedded links are NOT
    links; attributed/mixed-case anchors are; empty anchors don't leak
    text (byte-identity preserved alongside the link structure)."""
    from maup_spark.functions.webtext import extract_links

    html = (
        '<html><body><A class="x" HREF="https://a.example.com/1"></A>'
        '<!-- <a href="https://commented.example.com/"></a> -->'
        '<script>var s = \'<a href="https://scripted.example.com/"></a>\';'
        "</script>"
        '<a href="https://b.example.com/2"></a></body></html>'
    )
    df = spark.createDataFrame([("https://src.example.com/0", html)],
                               "url string, page string")
    edges = extract_links(
        df.select("url", F.encode("page", "UTF-8").alias("html"))
    )
    got = sorted((r.src_url, r.dst_url) for r in edges.collect())
    assert got == [
        ("https://src.example.com/0", "https://a.example.com/1"),
        ("https://src.example.com/0", "https://b.example.com/2"),
    ]


def test_link_graph_hub_hot_key(spark):
    """Closed form at sf0.001: hub indegree == corpus size; each source
    host has outdegree 2x its pages; byte-identity still holds with the
    link blocks in the page."""
    from maup_spark.functions.webtext import extract_links, host_degree_stats

    pages = web_pages(spark, SF)
    n_docs = pages.count()
    stats = host_degree_stats(extract_links(pages), top_n=50).collect()
    by_host = {r.host: r for r in stats}
    hub = by_host["hub.example.com"]
    assert (hub.indegree, hub.n_pages, hub.outdegree) == (n_docs, 0, 0)
    for host, r in by_host.items():
        if host != "hub.example.com":
            assert r.outdegree == 2 * r.n_pages
    # the invariant survives the link structure
    bad = (
        extract_text(pages)
        .filter(F.col("text_extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_lang_filter_pushes_down_to_pages_scan(spark, tmp_path):
    """The ingest-edge lang filter must reach the parquet scan as a
    PushedFilter (row-group stats skip non-matching groups) and prune
    the html column when only text columns are selected — at 10^12
    pages reading html bytes you then throw away IS the job cost."""
    src = str(tmp_path / "pages")
    web_pages(spark, SF).write.parquet(src)
    df = (
        spark.read.parquet(src)
        .filter(F.col("lang") == "en")
        .select("url", "lang", "text")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert rs and "html" not in rs.group(1), rs.group(1) if rs else plan
    assert df.count() > 0


# ---------------------------------------------------------------------------
# Envelope pins (round 7, VERDICT item): extract_text is a REGEX
# extractor whose byte-identity contract holds on the datagen grammar;
# these fixtures pin its deterministic behavior on HTML constructs
# OUTSIDE that grammar so any future regex change that silently shifts
# the envelope fails here rather than in an oracle.
# ---------------------------------------------------------------------------


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html.encode("utf-8"),)], "html binary")
    return extract_text(df).collect()[0]["text_extracted"]


def test_envelope_cdata_block_is_dropped(spark):
    # CDATA is not in the supported grammar: the generic <[^>]*> pass
    # consumes from '<' to the FIRST '>', which for a ]]>-terminated
    # block is the whole construct — content inside CDATA is DROPPED,
    # not emitted as text (real HTML5 parsers emit it for foreign
    # content).  Pinned, documented in extract_text.
    assert _extract_one(spark, "a<![CDATA[x < y]]>b") == "ab"


def test_envelope_script_with_closing_tag_in_string(spark):
    # '</script>' inside a JS string literal ends the block early (the
    # non-greedy block regex cannot know about JS strings): the REST of
    # the script body leaks through tag-stripping as text.  Pinned.
    html = '<script>var s = "</script>"; real();</script>after'
    assert _extract_one(spark, html) == '"; real();after'


def test_envelope_conditional_comment_dropped_whole(spark):
    # IE conditional comments are ordinary comments to the regex: the
    # whole block, including its inner markup, is dropped at step 2.
    html = "x<!--[if IE]><p>ie only</p><![endif]-->y"
    assert _extract_one(spark, html) == "xy"


def test_envelope_gt_inside_attribute_leaks(spark):
    # '>' inside a quoted attribute value terminates the generic tag
    # match early; the remainder of the attribute leaks as text.  The
    # datagen grammar never emits '>' in attributes, so the oracle
    # contract is unaffected.  Pinned.
    assert _extract_one(spark, '<a title="a>b">x</a>') == 'b">x'


def test_envelope_nested_comment_markers(spark):
    # '<!--' ... '-->' pairs match non-greedily left to right: the
    # first '-->' closes the comment, so a nested '<!--' does not
    # extend it and the trailing 'b-->' survives as text.  Pinned.
    assert _extract_one(spark, "a<!-- outer <!-- inner -->b-->c") == "ab-->c"
