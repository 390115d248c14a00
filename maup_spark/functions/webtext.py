"""Web-crawl hygiene operators: URL canonicalization + crawl dedup,
host/domain analytics, benchmark-contamination detection, and
deterministic source upsampling (temperature mixing).

The reference has no web surface (maup is geometry-only); these are
training-data-pipeline extensions for the Common-Crawl-style pages
table of the north_star (url, warc_ts, html, text, lang).  Every path
is JVM built-ins only — regexp/array HOFs for canonicalization, one
hash-agg for dedup, broadcast join + one agg for contamination — and
every step has a closed-form ANSI-SQL oracle (maup_spark.queries).

Scale design (10^12 pages):
- ``canonicalize_url`` is a pure projection (regexp + array_sort over
  the split query string) — codegen, zero shuffle.
- ``url_dedup`` keeps the earliest crawl per canonical URL with ONE
  ``min(struct(...))`` hash aggregation: map-side partial combine
  absorbs recrawl-heavy URLs (the hot keys of a crawl), no window.
- ``host_stats`` is a hash-agg on host + TakeOrderedAndProject for the
  top-N — the driver never sees more than ``top_n`` rows.
- ``contamination_check`` builds the benchmark gram set (eval suites
  are ~10^5 docs — tiny vs the corpus) and BROADCASTS it; corpus grams
  are deduped per-document BEFORE the explode (``array_distinct`` is
  per-row JVM work), so the only shuffle is the final per-doc count
  aggregation, which is map-side combinable and keyed by doc_id (no
  hot key: one document contributes a bounded number of rows).
- ``upsample_by_source`` replicates rows via ``explode(sequence(...))``
  with the fractional copy decided by the same 60-bit md5 consistent
  hash as ``stratified_sample`` — pure projection + explode, no
  shuffle, deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters stripped by canonicalization (the usual crawl
# noise: analytics campaign tags + click ids + referrer tags).  Keep in
# sync with the oracle regex in maup_spark/queries.py.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonicalize_url(df: DataFrame, url_col: str = "url",
                     out_col: str = "canon_url") -> DataFrame:
    """Append a canonical-URL column: lowercase scheme+host, strip
    ``www.``, default ports, fragments, and tracking params; sort the
    surviving query params; drop a trailing ``/`` and an empty ``?``.

    Two crawls of the same logical page (http vs https+www vs utm-
    tagged) canonicalize identically.  Pure codegen projection."""
    u = F.col(url_col)
    # 1. drop the fragment
    u = F.regexp_replace(u, "#.*$", "")
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    # 2. lowercase scheme://host[:port] (path stays case-sensitive)
    origin = F.lower(F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    path = F.regexp_replace(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    # 3. strip www. and default ports from the origin
    origin = F.regexp_replace(origin, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    origin = F.regexp_replace(origin, r"^(http://[^/:]*):80$", r"$1")
    origin = F.regexp_replace(origin, r"^(https://[^/:]*):443$", r"$1")
    # 4. drop tracking params, sort the rest for order-insensitivity
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    # 5. trailing slash off the path; re-attach a non-empty query
    path = F.regexp_replace(path, "/$", "")
    canon = F.when(qs == "", F.concat(origin, path)).otherwise(
        F.concat(origin, path, F.lit("?"), qs)
    )
    return df.withColumn(out_col, canon)


def url_dedup(pages_df: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", keep_url: bool = True) -> DataFrame:
    """Crawl-level dedup: one row per canonical URL — the EARLIEST
    crawl wins (ties broken by raw url for determinism), plus the
    recrawl count.

    ONE ``min(struct(ts, url))`` aggregation.  The struct buffer makes
    Spark plan a partial+final SortAggregate (hash agg needs mutable
    primitive buffers), which is still SKEW-SAFE: ``partial_min``
    combines map-side, so a recrawl-hot URL (the crawl frontier's hot
    key) collapses to one row per input partition before the exchange
    — the anti-pattern this engine bans is the per-key *window*, not a
    partial-combining sort agg.  The cost is a per-partition sort by
    canon_url; pipelines that only need (canon_url, first_ts,
    n_crawls) — e.g. a recrawl scheduler — pass ``keep_url=False`` for
    the all-numeric twin, a pure ``HashAggregate``.

    Returns (canon_url, url?, warc_ts, n_crawls)."""
    canon = canonicalize_url(pages_df, url_col=url_col)
    if not keep_url:
        return canon.groupBy("canon_url").agg(
            F.min(F.col(ts_col)).alias(ts_col),
            F.count("*").alias("n_crawls"),
        )
    agg = canon.groupBy("canon_url").agg(
        F.min(F.struct(F.col(ts_col), F.col(url_col))).alias("__first"),
        F.count("*").alias("n_crawls"),
    )
    return agg.select(
        "canon_url",
        F.col(f"__first.{url_col}").alias(url_col),
        F.col(f"__first.{ts_col}").alias(ts_col),
        "n_crawls",
    )


def host_of(url_col) -> "F.Column":
    """Lowercased host with ``www.`` stripped (JVM regexp)."""
    host = F.lower(F.regexp_extract(url_col, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def host_stats(pages_df: DataFrame, url_col: str = "url",
               text_col: str = "text", lang_col: str = "lang",
               top_n: int = 100) -> DataFrame:
    """Per-host corpus analytics: page count, total extracted chars,
    distinct languages — top ``top_n`` hosts by page count.

    Hash-agg on host (map-side combinable; a mega-host is absorbed by
    partial aggregation) + ``orderBy().limit()`` which Spark plans as
    TakeOrderedAndProject (distributed per-partition top-K, no single-
    partition sort).  Returns (host, n_pages, total_chars, n_langs)."""
    return (
        pages_df.select(
            host_of(F.col(url_col)).alias("host"),
            F.length(F.col(text_col)).alias("__chars"),
            F.col(lang_col).alias("__lang"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("__chars").alias("total_chars"),
            F.countDistinct("__lang").alias("n_langs"),
        )
        .orderBy(F.desc("n_pages"), "host")
        .limit(top_n)
    )


def _word_grams(text_col, n: int):
    """Whitespace-token n-grams as a JVM array column (arrays_zip of
    shifted slices — no Python, no explode yet; see functions/grams.py
    for why the old transform-over-sequence shape was quadratic)."""
    from .grams import gram_array_col

    return gram_array_col(text_col, n)


def benchmark_grams(bench_docs: DataFrame, text_col: str = "text",
                    n: int = 8) -> DataFrame:
    """The distinct word-n-gram set of an eval/benchmark suite.
    Benchmark suites are ~10^5 documents — small enough that the
    resulting gram table broadcast-joins against the corpus."""
    return (
        bench_docs.select(
            F.explode(F.array_distinct(_word_grams(F.col(text_col), n))).alias("gram")
        )
        .distinct()
    )


def contamination_check(
    docs: DataFrame,
    bench_docs: DataFrame = None,
    text_col: str = "text",
    n: int = 8,
    bench_grams: DataFrame = None,
) -> DataFrame:
    """Benchmark-contamination detection (the decontamination step of
    a training pipeline): for every corpus document, the fraction of
    its distinct word ``n``-grams that appear in the benchmark suite.

    Shape: per-row ``array_distinct`` dedups grams BEFORE the explode
    (no (doc, gram) distinct shuffle), the benchmark gram set is
    BROADCAST (eval suites are tiny vs a 10^12-page corpus), and the
    only exchange is the final per-doc count agg — map-side combinable,
    keyed by doc_id so no hot key exists.  Returns
    (doc_id, n_grams, n_matched, contamination) for docs with ≥1 gram;
    filter ``contamination >= tau`` downstream to drop leaked docs.

    Pass ``bench_grams`` (a ``benchmark_grams(...)`` result, ideally
    ``.persist()``-ed) instead of ``bench_docs`` when scoring many
    batches against one benchmark — e.g. the streaming twin — so the
    gram aggregation computes once, not per call."""
    if bench_grams is None:
        if bench_docs is None:
            raise ValueError("pass bench_docs or bench_grams")
        bench_grams = benchmark_grams(bench_docs, text_col=text_col, n=n)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_word_grams(F.col(text_col), n))).alias("gram"),
    )
    bench = F.broadcast(bench_grams.withColumn("__hit", F.lit(1)))
    return (
        grams.join(bench, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_matched"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_matched",
            (F.col("n_matched") / F.col("n_grams")).alias("contamination"),
        )
    )


def pack_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 1_000_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Token-stream sharding (the pack-and-write step of a pretraining
    pipeline): conceptually concatenate all documents in ``id_col``
    order into one token stream and cut it every ``tokens_per_shard``
    tokens; each document gets its global ``start_offset`` in the
    stream and the ``shard_id`` containing that start (documents may
    straddle a cut — the standard offset-based packing of a token
    stream).

    The global prefix sum runs as a TWO-LEVEL scan, never a global
    window over rows: documents cumulate inside fixed id-range blocks
    (``Window.partitionBy(block)`` — per-key row count bounded by
    ``block`` BY CONSTRUCTION, so no data-dependent hot key exists),
    block subtotals cumulate in a second window over the block table
    (n_docs/block rows — 10^6 rows of two BIGINTs at 10^12 docs; add a
    third level before that is ever large), and the block offsets
    BROADCAST back.  Output is identical at any parallelism (the order
    is the id order, not the partition order).

    ``order_cols`` (default ``[id_col]``) is the composite stream
    order: rows cumulate in lexicographic ``order_cols`` order, so a
    (doc_id, copy_idx) or (mix_id, chunk_idx) key needs NO arithmetic
    packing into one BIGINT (which overflows/collides at 10^12-doc
    scale — see pipeline.build_pack).  ``id_col`` (the FIRST order
    col) must stay numeric: it drives the block arithmetic.

    Returns (*order_cols, n_tokens, start_offset, shard_id)."""
    order = list(order_cols) if order_cols else [id_col]
    if order[0] != id_col:
        raise ValueError("id_col must lead order_cols (block arithmetic)")
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(
        *order,
        n_tok.alias("n_tokens"),
        F.floor(F.col(id_col) / block).alias("__blk"),
    )
    w_local = (
        Window.partitionBy("__blk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__cum", F.sum("n_tokens").over(w_local))
    blocks = base.groupBy("__blk").agg(F.sum("n_tokens").alias("__bsum"))
    w_blk = Window.orderBy("__blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = blocks.withColumn(
        "__off", F.coalesce(F.sum("__bsum").over(w_blk), F.lit(0))
    )
    out = local.join(F.broadcast(offs.select("__blk", "__off")), "__blk")
    start = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    return out.select(
        *order,
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / tokens_per_shard).cast("long").alias("shard_id"),
    )


def upsample_by_source(
    docs: DataFrame,
    weights: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "upsample",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic corpus mixing with weights ≥ 0 (temperature
    upsampling): weight ``w`` yields ``floor(w)`` copies of every row
    plus one more iff ``u(id) < frac(w)``, where ``u`` is the same
    60-bit md5 consistent hash as ``stratified_sample`` — so expected
    multiplicity is exactly ``w``, output is identical at any
    parallelism, and a grown corpus keeps prior copies stable.

    Pure projection + ``explode(sequence(1, n_copies))`` — no shuffle,
    no RNG state.  Output adds ``copy_idx`` (1-based) so downstream
    shuffles (e.g. a pack-and-shard write) can spread replicas."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col), F.lit(f"#{salt}"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(w)
    n_copies = (F.floor(w) + F.when(u < w - F.floor(w), 1).otherwise(0)).cast("int")
    return (
        docs.withColumn("__n", n_copies)
        .filter(F.col("__n") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


# ---------------------------------------------------------------------------
# PII scrubbing (the C4/Dolma/RefinedWeb redaction stage)
# ---------------------------------------------------------------------------

# Shared regex grammar for PII detection.  Both Spark (Java regex) and
# the DuckDB oracle (RE2) interpret these identically: no
# backreferences, no lookaround — plain character classes, bounded
# quantifiers and \b word boundaries only.  Keep in sync with the
# oracle SQL in maup_spark/queries.py.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction order matters (an email's host can contain digit.digit
# runs); counts are taken on the ORIGINAL text so they are
# order-independent, replacement is email -> phone -> ip.
_PII_STAGES = (
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
    ("ipv4", PII_IPV4_RE, "<IP>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Detect and redact emails, intl-format phone numbers, and IPv4
    addresses (the standard pre-training PII pass, cf. C4/Dolma).

    Adds ``n_email``/``n_phone``/``n_ipv4`` (match counts on the
    original text) and ``out_col`` (the redacted text, matches
    replaced by ``<EMAIL>``/``<PHONE>``/``<IP>`` in that order).

    100% codegen projection (``regexp_count`` + chained
    ``regexp_replace``) — zero shuffle, no Python; at 10^12 pages this
    is a free rider on whatever scan feeds it.  Scrubbing is
    idempotent: the replacement tokens contain no digits or ``@`` so
    no pattern can match the redacted output (tested)."""
    t = F.col(text_col)
    out = df
    clean = t
    for name, pat, repl in _PII_STAGES:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(t, F.lit(pat)).cast("long"))
        clean = F.regexp_replace(clean, pat, repl)
    return out.withColumn(out_col, clean)


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level PII exposure report: total matches and affected-doc
    counts per PII class.  ONE hash aggregation over the ``pii_scrub``
    projection (map-side combinable, no keys — a scalar agg)."""
    scrubbed = pii_scrub(df, text_col=text_col)
    aggs = []
    for name, _, _ in _PII_STAGES:
        c = F.col(f"n_{name}")
        aggs.append(F.sum(c).alias(f"total_{name}"))
        aggs.append(F.sum((c > 0).cast("long")).alias(f"docs_with_{name}"))
    return scrubbed.agg(*aggs)


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most frequent word n-grams with document frequency —
    the boilerplate-discovery report (the top of this table at crawl
    scale IS the nav-bar/cookie-banner/footer list that line_dedup and
    substring_dedup then remove; run it BEFORE choosing thresholds).

    DataFrame[gram, n_occurrences, n_docs], top_k rows by occurrence
    count (ties broken by gram).  Per-row `array_distinct` feeds the
    doc-frequency sum WITHOUT a (gram, doc) distinct shuffle; ONE
    map-side-combinable hash-agg + distributed top-K
    (TakeOrderedAndProject) — a corpus-wide boilerplate gram is
    absorbed by partial combine, never a hot key."""
    per_doc = docs.select(
        F.explode(_word_grams(F.col(text_col), n)).alias("gram")
    ).groupBy("gram").agg(F.count("*").alias("n_occurrences"))
    dist = docs.select(
        F.explode(F.array_distinct(_word_grams(F.col(text_col), n))).alias("gram")
    ).groupBy("gram").agg(F.count("*").alias("n_docs"))
    return (
        per_doc.join(dist, "gram")
        .orderBy(F.desc("n_occurrences"), "gram")
        .limit(top_k)
    )


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus governance report: document count, total and
    mean characters, mean whitespace-token count — the table a mixture
    policy (``upsample_by_source`` weights) is decided from.

    ONE map-side-combinable hash-agg keyed by source (a mega-source is
    absorbed by partial combine); integer sums plus one final division
    per mean, so the output is hash-stable cross-engine."""
    t = F.col(text_col)
    n_tok = F.size(F.split(t, " "))
    agg = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(t)).alias("total_chars"),
        F.sum(n_tok.cast("long")).alias("total_tokens"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.round(F.lit(1e6) * F.col("total_chars") / F.col("n_docs"))
        .cast("long")
        .alias("mean_chars_e6"),
        F.round(F.lit(1e6) * F.col("total_tokens") / F.col("n_docs"))
        .cast("long")
        .alias("mean_tokens_e6"),
    )


def host_blocklist_filter(
    pages_df: DataFrame,
    blocklist_df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop every page whose canonical host (lowercased, ``www.``
    stripped — the ``host_of`` grammar) appears in the blocklist — the
    C4-style badlist stage, run at ingest before any text processing.

    The blocklist (10^4-10^6 domains — tiny vs 10^12 pages) is
    BROADCAST into a left-anti hash join: one scan, zero wide
    shuffles, rows pass through untouched.  ``blocklist_df`` carries
    canonical hosts in ``host_col`` (normalize with ``host_of`` when
    sourcing from raw URLs)."""
    bl = F.broadcast(
        blocklist_df.select(F.col(host_col).alias("__bl_host")).distinct()
    )
    return pages_df.join(
        bl,
        host_of(F.col(url_col)) == F.col("__bl_host"),
        "left_anti",
    )


# -- main-content extraction (html:binary -> text) --------------------------
# Decode order is load-bearing: block elements whose CONTENT is not
# text (comments / script / style / title) go first, then every
# remaining tag, then entity decode with ``&amp;`` strictly LAST (the
# inverse of escaping ``&`` strictly first) so already-escaped entities
# in the source text round-trip byte-identically.
_HTML_BLOCK_RES = (
    r"(?s)<!--.*?-->",
    r"(?is)<script[^>]*>.*?</script\s*>",
    r"(?is)<style[^>]*>.*?</style\s*>",
    r"(?is)<title[^>]*>.*?</title\s*>",
)
_HTML_ENTITIES = (  # (entity, char); &amp; MUST stay last
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(
    pages_df: DataFrame,
    html_col: str = "html",
    out_col: str = "text_extracted",
    charset: str = "UTF-8",
) -> DataFrame:
    """Extract the text content of an HTML page stored as a ``binary``
    column (the north_star pages table carries ``html:binary``).

    Deterministic extraction spec (the per-row invariant "byte-identical
    extracted text per url" is pytest-gated against datagen.web_pages and
    driver-gated by the ``extract_text_pages`` oracle):

    1. decode the bytes as ``charset``;
    2. drop comment / ``<script>`` / ``<style>`` / ``<title>`` blocks
       INCLUDING their content (non-greedy to the closing tag,
       case-insensitive, dotall);
    3. drop every remaining tag (``<[^>]*>`` — attributes and mixed
       case included);
    4. decode the standard entities, ``&amp;`` last.

    Scale: a pure projection — one regexp_replace chain inside
    whole-stage codegen, zero shuffle, zero Python.  At 10^12 pages
    this is scan-bound; filters on other columns still push down
    because nothing here blocks pruning.

    ENVELOPE (pinned by tests/test_extract_html.py): this is a regex
    extractor, byte-exact on the datagen HTML grammar; constructs
    outside it behave deterministically but not like an HTML5 parser —
    CDATA blocks are dropped whole (content included); a ``</script>``
    inside a JS string ends the script block early and the remainder
    leaks as text; IE conditional comments drop as ordinary comments;
    a ``>`` inside a quoted attribute value terminates the tag match
    early and the attribute tail leaks as text."""
    s = F.decode(F.col(html_col), charset)
    for pat in _HTML_BLOCK_RES:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, r"<[^>]*>", "")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return pages_df.withColumn(out_col, s)


def extract_links(
    pages_df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    charset: str = "UTF-8",
) -> DataFrame:
    """Harvest outlinks: one row per ``href="..."`` in the page, as
    (src_url, dst_url).  Comments and script/style blocks are dropped
    first (a commented-out link is not a link), then
    ``regexp_extract_all`` pulls every href in document order.

    Scale: projection + ``explode`` (Generate) — the fan-out is
    per-row JVM work, no shuffle.  Downstream graph aggregations
    (degree stats, host graph) are hash-aggs over the emitted edges;
    hub pages (every crawl has them) arrive pre-spread across
    partitions because edges inherit the SOURCE page's partitioning."""
    s = F.decode(F.col(html_col), charset)
    for pat in _HTML_BLOCK_RES[:3]:  # comments, script, style
        s = F.regexp_replace(s, pat, "")
    hrefs = F.regexp_extract_all(s, F.lit(r'(?i)<a\s[^>]*href="([^"]*)"'), 1)
    return pages_df.withColumn("dst_url", F.explode(hrefs)).select(
        F.col(url_col).alias("src_url"), "dst_url"
    )


def host_degree_stats(edges_df: DataFrame, top_n: int = 20) -> DataFrame:
    """Host-level link-graph degrees from an edge table
    (src_url, dst_url): per host, pages hosted, outdegree (edges from
    its pages) and indegree (edges into its pages), top-N by indegree
    (full (indegree DESC, host) tie-break so the top-K set is
    deterministic).

    ONE pass over the edge table (round 7): each edge fans out to a
    (src_host, out) and a (dst_host, in) contribution row and one
    bounded hash-agg computes all three degrees — the former
    per-direction formulation scanned ``edges_df`` twice, and when the
    edges come straight from ``extract_links`` each scan re-ran the
    whole HTML regex chain.  Still map-side combinable (a hub host
    with 10^9 inlinks collapses to partial counts per partition, never
    a hot shuffle key) + TakeOrderedAndProject."""
    contrib = edges_df.select(
        F.explode(
            F.array(
                F.struct(
                    host_of(F.col("src_url")).alias("host"),
                    F.lit(1).alias("out"),
                    F.col("src_url").alias("page"),
                    F.lit(0).alias("ind"),
                ),
                F.struct(
                    host_of(F.col("dst_url")).alias("host"),
                    F.lit(0).alias("out"),
                    F.lit(None).cast("string").alias("page"),
                    F.lit(1).alias("ind"),
                ),
            )
        ).alias("__c")
    ).select("__c.host", "__c.out", "__c.page", "__c.ind")
    return (
        contrib.groupBy("host")
        .agg(
            F.count_distinct("page").alias("n_pages"),
            F.sum("out").cast("bigint").alias("outdegree"),
            F.sum("ind").cast("bigint").alias("indegree"),
        )
        .orderBy(F.desc("indegree"), "host")
        .limit(top_n)
    )
