"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: every stage is a hash aggregation or equi-join on a
*derived key* (fingerprint, band key, signature) — never an all-pairs
comparison.  The only quadratic work is within LSH buckets, whose size
is bounded by construction.  Hashes are md5 hex strings (lexicographic
MIN is engine-portable); shingles come from a window ``lead`` over
``posexplode`` so the tokenizer is pure JVM.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
N_BANDS = 4  # bands of 2 minhashes each
SHINGLE = 3  # word-level shingle width
SIMHASH_BITS = 16  # one bit per md5 nibble (top bit of each)


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters by content hash: one row per duplicated
    fingerprint with the canonical (minimum) doc id and the member count.
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_members"))
        .filter(F.col("n_members") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = SHINGLE) -> DataFrame:
    """Word-level k-shingles, fully JVM-side: arrays_zip of shifted
    token-array slices (functions/grams.py) — no window shuffle (a
    lead-window formulation costs a shuffle+sort per doc), and no
    token-array reference inside a lambda body (the old
    transform-over-sequence shape re-split the text once per shingle)."""
    from .grams import gram_array_sql

    toks = f"split({text_col}, ' ')"
    return docs.selectExpr(
        "doc_id", f"explode({gram_array_sql(toks, k)}) AS shingle"
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n: int = N_MINHASH
) -> DataFrame:
    """Per-doc MinHash signature: numeric MIN of 32-bit md5 substrings
    — one aggregation, TWO md5 calls per shingle.

    Permutation i draws hex digits [8·(i%4)+1, 8·(i%4)+8] of
    md5(shingle#⌊i/4⌋): four independent 32-bit hashes per digest, so
    8 permutations cost 2 digests (the original one-digest-per-
    permutation family spent 8 md5 calls per shingle row; measured
    like-for-like at 10^6 docs the stage is ~17% faster — the 47M-row
    shingle shuffle, not md5, is the dominant cost).  32-bit mins are
    plenty: a cross-doc accidental min collision is ~2⁻³² per
    permutation and a candidate pair needs a full 64-bit band to agree.

    BIGINT (not the md5 hex string) matters physically: min(string) has
    an immutable aggregation buffer, so Spark plans SortAggregate —
    a per-partition SORT of every shingle row.  min(bigint) stays in
    HashAggregate with map-side partial combine.  The hex-substring
    value is portable (DuckDB: CAST('0x'||substr(md5(..),p,8) AS
    BIGINT))."""
    sh = shingles(docs, text_col)
    digests = {
        d: F.md5(F.concat(F.col("shingle"), F.lit(f"#{d}")))
        for d in range((n + 3) // 4)
    }
    aggs = [
        F.min(
            F.conv(
                F.substring(digests[i // 4], 8 * (i % 4) + 1, 8), 16, 10
            ).cast("bigint")
        ).alias(f"m{i}")
        for i in range(n)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_bucket: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band
    (band = concatenation of 2 consecutive minhashes).  Equi-join on
    the band key — the scalable shape; bucket sizes bound the quadratic
    work.

    CANONICAL-BAND dedup (no ``.distinct()`` exchange): a pair is
    emitted only from the FIRST band whose keys match — the "no earlier
    band matched" conjuncts run as post-join filters, so each pair
    appears exactly once and the output set equals the any-band-match
    set with no distinct exchange.

    ``strategy="single_join"``: explode each signature row to
    (band, key) and self-equi-join ONCE on (band, key) — one exchange
    of the 4×-exploded projection (and Spark reuses it for both join
    sides), where the round-3 ``"multi_join"`` shape ran N_BANDS
    self-joins that shuffled the signature projection 8×.  Both
    strategies emit the identical pair set (parity-tested).  Measured
    at 10^6 docs (warm signature cache, local[32]): capped single 4.7 s
    vs multi 7.9 s; UNCAPPED single 12.1 s vs multi 4.0 s — with an
    unbounded hot bucket the single join concentrates the quadratic
    bucket work plus the carried m-vector width into one exchange,
    while per-band joins shuffle narrow rows.  Hence ``"auto"``
    (default): single_join when ``max_bucket`` bounds bucket sizes
    (the production web-scale config), multi_join for uncapped
    exact-LSH semantics.

    ``max_bucket`` drops runaway buckets (boilerplate shingle sets at
    web scale) per band before its join — a quadratic-blowup guard.
    Capping is PER BAND: a doc in a hot band-b bucket is excluded from
    band b's join only, and stays a candidate in every other band; a
    capped earlier band also stops vetoing later bands (its "no earlier
    band matched" conjunct is waived), so a pair is suppressed only if
    EVERY band where its keys match is over the cap.  None keeps every
    bucket (exact LSH semantics, the default)."""
    # materialize the signatures once: they feed both sides of the self-
    # join(s) — without this the shingle explode + minhash aggregation
    # re-runs once per plan reference (8× under multi_join: 98 s → 41 s
    # at 10^6 docs, scripts/bench_scale.py).  MEMORY_AND_DISK persist,
    # not localCheckpoint: localCheckpoint truncates lineage without
    # durable storage, so losing one executor on a real cluster makes
    # the cached blocks unrecoverable and fails the job mid-band-join;
    # persist keeps the lineage and recomputes just the lost partitions.
    if strategy == "auto":
        strategy = "single_join" if max_bucket is not None else "multi_join"
    mh = minhash_signatures(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)

    def bkey(b: int) -> F.Column:
        return F.concat_ws("_", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"))

    wide = mh
    if max_bucket is not None:
        # per-band hot flags (hot tables are tiny: only keys over the cap)
        for b in range(N_BANDS):
            hot = (
                mh.select(bkey(b).alias(f"__hk{b}"))
                .groupBy(f"__hk{b}")
                .count()
                .filter(F.col("count") > max_bucket)
                .drop("count")
            )
            wide = (
                wide.join(F.broadcast(hot), bkey(b) == F.col(f"__hk{b}"), "left")
                .withColumn(f"__hot{b}", F.col(f"__hk{b}").isNotNull())
                .drop(f"__hk{b}")
            )
    else:
        for b in range(N_BANDS):
            wide = wide.withColumn(f"__hot{b}", F.lit(False))

    if strategy == "multi_join":
        out = None
        for b in range(N_BANDS):
            a = wide.alias("a")
            c = wide.alias("b")
            cond = (
                F.concat_ws("_", F.col(f"a.m{2 * b}"), F.col(f"a.m{2 * b + 1}"))
                == F.concat_ws("_", F.col(f"b.m{2 * b}"), F.col(f"b.m{2 * b + 1}"))
            ) & (F.col("a.doc_id") < F.col("b.doc_id"))
            # matching keys ⇒ both sides share the hot flag; test one
            cond = cond & ~F.col(f"a.__hot{b}")
            for j in range(b):
                # a capped band j could not have emitted the pair, so a
                # band-j key match there must not veto this band
                earlier_no_emit = (
                    (F.col(f"a.m{2 * j}") != F.col(f"b.m{2 * j}"))
                    | (F.col(f"a.m{2 * j + 1}") != F.col(f"b.m{2 * j + 1}"))
                    | F.col(f"a.__hot{j}")
                )
                cond = cond & earlier_no_emit
            part = a.join(c, cond).select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            out = part if out is None else out.unionByName(part)
        return out
    if strategy != "single_join":
        raise ValueError(f"unknown strategy {strategy!r}")

    # single_join: one (band, key) explode, one self-equi-join.  Rows
    # carry the full m-vector + hot flags so the canonical-band veto
    # evaluates post-join with plain column compares (codegen, O(bands)
    # per pair).  Rows whose OWN band is hot are dropped pre-join —
    # equivalent to the multi_join per-band exclusion.  The flagged
    # projection is persisted too: both join sides derive from it, and
    # without this the 4 hot-flag broadcast joins over the signature
    # table run once per side (visible in PLANS.md as duplicated
    # BroadcastHashJoin subtrees).
    wide = wide.persist(StorageLevel.MEMORY_AND_DISK)
    exploded = (
        wide.select(
            "doc_id",
            *[F.col(f"m{i}") for i in range(N_MINHASH)],
            *[F.col(f"__hot{b}") for b in range(N_BANDS)],
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        bkey(b).alias("key"),
                        F.col(f"__hot{b}").alias("hot"),
                    )
                    for b in range(N_BANDS)
                ])
            ).alias("__bk"),
        )
        .select("*", F.col("__bk.band").alias("band"), F.col("__bk.key").alias("key"))
        .filter(~F.col("__bk.hot"))
        .drop("__bk")
    )
    a = exploded.alias("a")
    c = exploded.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    # canonical band, statically unrolled: for every j < band, band j
    # must NOT have emitted the pair (keys differ, or band j was capped)
    for j in range(N_BANDS - 1):
        cond = cond & (
            (F.col("a.band") <= F.lit(j))
            | (F.col(f"a.m{2 * j}") != F.col(f"b.m{2 * j}"))
            | (F.col(f"a.m{2 * j + 1}") != F.col(f"b.m{2 * j + 1}"))
            | F.col(f"a.__hot{j}")
        )
    return a.join(c, cond).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )


def ngram_jaccard(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact shingle-set Jaccard for each LSH candidate pair."""
    cand = minhash_lsh_pairs(docs, text_col)
    ssets = shingles(docs, text_col).distinct()
    sizes = ssets.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(
            ssets.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            ssets.select(F.col("doc_id").alias("__d2"), F.col("shingle").alias("__s2")),
            (F.col("doc_b") == F.col("__d2")) & (F.col("shingle") == F.col("__s2")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ni"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", n_bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash over unigram tokens: bit i = sign of Σ_tokens ±1, where
    the ±1 is the top bit of md5-nibble i (bits 32-63 draw from a
    second, salted md5).  Emitted as a bitstring so the representation
    is engine-portable (no 64-bit int ops).

    ``n_bits`` defaults to the 16-bit ORACLE config (portable to the
    ANSI-SQL twin); production near-dup detection wants ``n_bits=64``
    — 16 bits over a shared-vocabulary web corpus collide heavily
    (measured: ~28% of all pairs land within Hamming 3 at 16 bits on
    the synthetic corpus vs ~0 genuine at 64)."""
    if not 1 <= n_bits <= 64:
        raise ValueError(f"n_bits must be in [1, 64], got {n_bits}")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .withColumn("h", F.md5(F.col("w")))
    )
    if n_bits > 32:
        toks = toks.withColumn("h2", F.md5(F.concat(F.col("w"), F.lit("#b"))))

    def nibble(i: int) -> F.Column:
        src = F.col("h") if i < 32 else F.col("h2")
        return F.substring(src, (i % 32) + 1, 1)

    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    nibble(i).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
                ).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(n_bits)
        ]
    )
    bits = F.concat(
        *[
            F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )
    return sums.select("doc_id", bits.alias("simhash"))


SIMHASH_BAND_BITS = 4  # 16-bit signature -> 4 bands of 4 bits


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = SIMHASH_BAND_BITS,
    n_bits: int = SIMHASH_BITS,
    strategy: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — the pair-
    generation stage the reference-style pipelines run after
    ``simhash_signatures`` (Charikar/Manku-Jain-Sarma construction).

    Pigeonhole LSH: a pair within Hamming ``max_hamming`` of a
    ``SIMHASH_BITS``-bit signature must agree exactly on at least one of
    ``SIMHASH_BITS / band_bits`` bands when ``max_hamming < n_bands``
    — so candidates come from equi-joins on band substrings (the
    scalable shape; never all-pairs), then the exact Hamming distance
    filters within buckets.  Uses the same CANONICAL-BAND emit as
    ``minhash_lsh_pairs``: a pair is emitted only from the first band
    whose keys match, so no ``.distinct()`` exchange is needed.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b.  Band keys and
    ≤32-bit integer chunks of the signature are projected ONCE PER ROW
    before the joins; per candidate pair the work is then plain column
    equality plus ``bit_count(xor)`` — the first cut evaluated the
    bitstring character-by-character inside the post-join filters
    (~128 substring calls per pair) and spent 162 s at 10^6 docs where
    this shape spends ~23 s (scripts/bench_scale.py).  The hamming
    VALUE is unchanged, so the oracle keeps its portable character-
    compare formulation.

    Scale knobs: the default (16-bit sigs, 4-bit bands) is the ORACLE
    config — only 16 buckets per band, so per-band fan-in is n/16 and
    the join degenerates toward all-pairs on a big corpus.  Production
    = ``n_bits=64, band_bits=16`` (the Manku-Jain-Sarma WWW'07 split):
    65,536 buckets per band, Hamming ≤ 3 still pigeonhole-guaranteed
    across the 4 bands.
    """
    if strategy == "auto":
        # same bounded-bucket rule as minhash_lsh_pairs: the single
        # exploded join wins when buckets are fine-grained (64-bit/16-bit
        # production config: 65k buckets/band, measured tie-to-better at
        # 10^6), but a coarse config (16-bit/4-bit oracle twin: 16
        # buckets/band) concentrates the n/16-sized buckets' quadratic
        # work into one exchange — keep the per-band joins there
        strategy = "single_join" if band_bits >= 8 else "multi_join"
    if n_bits % band_bits != 0:
        raise ValueError(f"band_bits {band_bits} must divide n_bits {n_bits}")
    n_bands = n_bits // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_bands ({max_hamming} >= {n_bands}):"
            " a qualifying pair could differ in every band and be missed"
        )
    n_chunks = (n_bits + 31) // 32
    sigs = (
        simhash_signatures(docs, text_col, n_bits=n_bits)
        .select(
            "doc_id",
            *[
                F.substring("simhash", b * band_bits + 1, band_bits).alias(f"k{b}")
                for b in range(n_bands)
            ],
            *[
                F.conv(
                    F.substring("simhash", c * 32 + 1, min(32, n_bits - c * 32)),
                    2,
                    10,
                )
                .cast("long")
                .alias(f"h{c}")
                for c in range(n_chunks)
            ],
        )
        # MEMORY_AND_DISK, not localCheckpoint: keeps lineage so a lost
        # executor recomputes its partitions instead of failing the job
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    hamming = None
    for c in range(n_chunks):
        term = F.bit_count(
            F.col(f"a.h{c}").bitwiseXOR(F.col(f"b.h{c}"))
        )
        hamming = term if hamming is None else hamming + term

    if strategy == "multi_join":
        out = None
        for b in range(n_bands):
            a = sigs.alias("a")
            c = sigs.alias("b")
            cond = (F.col(f"a.k{b}") == F.col(f"b.k{b}")) & (
                F.col("a.doc_id") < F.col("b.doc_id")
            )
            for j in range(b):
                cond = cond & (F.col(f"a.k{j}") != F.col(f"b.k{j}"))
            part = a.join(c, cond).select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                hamming.cast("int").alias("hamming"),
            )
            out = part if out is None else out.unionByName(part)
        return out.filter(F.col("hamming") <= max_hamming)
    if strategy != "single_join":
        raise ValueError(f"unknown strategy {strategy!r}")

    # single_join: explode to (band, key), ONE self-equi-join on it,
    # canonical-band veto statically unrolled post-join (same shape as
    # minhash_lsh_pairs; rows carry the k-vector + h-chunks so per-pair
    # work stays plain column compares + bit_count)
    exploded = sigs.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"k{b}").alias("key"))
                for b in range(n_bands)
            ])
        ).alias("__bk"),
    ).select(
        "doc_id",
        *[F.col(f"k{b}") for b in range(n_bands)],
        *[F.col(f"h{c}") for c in range(n_chunks)],
        F.col("__bk.band").alias("band"),
        F.col("__bk.key").alias("key"),
    )
    a = exploded.alias("a")
    c = exploded.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for j in range(n_bands - 1):
        cond = cond & (
            (F.col("a.band") <= F.lit(j)) | (F.col(f"a.k{j}") != F.col(f"b.k{j}"))
        )
    return (
        a.join(c, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 8,
    scope: str = "corpus",
) -> DataFrame:
    """Exact-substring duplication stats per document — the
    "Deduplicating Training Data" (Lee et al. 2021) ExactSubstr pass at
    a fixed match threshold.  A substring of ``min_len`` tokens that
    occurs more than once in the corpus is a duplicated span; the
    operator reports, per doc, how many duplicated ``min_len``-grams it
    contains and how many of its tokens are covered by the UNION of
    their spans (the quantity an ExactSubstr filter cuts on).

    Two docs share an exact substring of >= L tokens iff they share an
    L-token gram, so the distributed equivalent of the paper's suffix
    array is gram-key grouping: the suffix array exists to find
    arbitrary-length matches in O(n) single-node memory; at a fixed
    threshold the equi-group on gram keys gives the identical duplicate
    set with Spark-native shuffles.  Plan shape: JVM gram explode
    (zero shuffle) -> groupBy(gkey) occurrence count (map-side partial
    combine absorbs hot grams — corpus-wide boilerplate 8-grams are
    Zipf-hot, and a Window.partitionBy(gkey) would funnel every
    occurrence of one gram into ONE task, which AQE can never split;
    the hash-agg + join-back shape is both combinable and AQE
    skew-join eligible) -> join dup-key set back to the gram table ->
    per-doc ordered window sweep for interval union + hash-agg (per-doc
    partitions are bounded by doc length).  Gram keys are 60-bit
    md5-prefix BIGINTs (the engine's HashAggregate-friendly idiom, see
    minhash_signatures).

    ``scope="corpus"`` counts any repeat (cross-doc or within-doc, the
    paper's semantics); ``scope="cross_doc"`` requires the gram in >= 2
    distinct docs.  Returns DataFrame[doc_id, n_tokens, dup_grams,
    dup_token_cov] with a row for EVERY doc (zeros when clean)."""
    from pyspark.sql import Window

    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2 tokens")
    from .grams import gram_array_sql

    toks = f"split({text_col}, ' ')"
    grams = docs.selectExpr(
        "doc_id",
        f"posexplode({gram_array_sql(toks, L)}) AS (pos, gram)",
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("gkey"),
    )
    if scope == "corpus":
        dup_keys = (
            grams.groupBy("gkey")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .select("gkey")
        )
    elif scope == "cross_doc":
        # two-stage distinct agg: partial on (gkey, doc_id) first, so a
        # hot gram's rows combine map-side before any exchange
        dup_keys = (
            grams.groupBy("gkey")
            .agg(F.count_distinct("doc_id").alias("__nd"))
            .filter(F.col("__nd") > 1)
            .select("gkey")
        )
    else:
        raise ValueError(f"unknown scope {scope!r}")
    dup = grams.join(dup_keys, "gkey")
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = dup.select(
        "doc_id",
        "pos",
        F.greatest(
            F.col("pos") + F.lit(L)
            - F.greatest(F.col("pos"), F.max(F.col("pos") + F.lit(L)).over(wd)),
            F.lit(0),
        ).alias("__cov"),
    )
    per_doc = swept.groupBy("doc_id").agg(
        F.count("*").alias("dup_grams"),
        F.sum("__cov").cast("bigint").alias("dup_token_cov"),
    )
    base = docs.selectExpr(
        "doc_id", f"CAST(size(split({text_col}, ' ')) AS BIGINT) AS n_tokens"
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_grams", F.lit(0)).cast("bigint").alias("dup_grams"),
        F.coalesce("dup_token_cov", F.lit(0)).cast("bigint").alias("dup_token_cov"),
    )


def keep_best(
    clustered: DataFrame,
    cluster_col: str,
    score_col: str,
    id_col: str = "doc_id",
    min_members: int = 1,
) -> DataFrame:
    """Duplicate-cluster representative selection (the RefinedWeb-style
    "keep the best copy" policy): per cluster, keep the member with the
    HIGHEST ``score_col``, ties broken by the LOWEST ``id_col`` — fully
    deterministic at any parallelism (``max_by`` alone is not: its tie
    choice is arrival-order).

    Numeric ids take ONE hash aggregation via lexicographic
    ``max(struct(score, -id))`` — map-side partial combine absorbs any
    hot cluster (a corpus-wide boilerplate cluster collapses to one row
    per input partition before the exchange), no per-key window.  A
    non-numeric (e.g. string/url) id can't be negated, so the generic
    path runs TWO hash aggs joined on the cluster: per-cluster max
    score, then ``min(id)`` among rows AT that score — same combine
    properties, one extra (cluster-keyed, pre-reduced) join.
    ``min_members`` > 1 restricts the output to genuine duplicate
    clusters.

    Returns (cluster_col, id_col, score_col, n_members)."""
    from pyspark.sql.types import NumericType

    if isinstance(clustered.schema[id_col].dataType, NumericType):
        best = clustered.groupBy(cluster_col).agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("s"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("__b"),
            F.count("*").alias("n_members"),
        )
        if min_members > 1:
            best = best.filter(F.col("n_members") >= min_members)
        return best.select(
            cluster_col,
            (-F.col("__b.nid")).alias(id_col),
            F.col("__b.s").alias(score_col),
            "n_members",
        )
    top = clustered.groupBy(cluster_col).agg(
        F.max(score_col).alias("__s"),
        F.count("*").alias("n_members"),
    )
    if min_members > 1:
        top = top.filter(F.col("n_members") >= min_members)
    winners = (
        clustered.join(top, cluster_col)
        .filter(F.col(score_col) == F.col("__s"))
        .groupBy(cluster_col)
        .agg(
            F.min(id_col).alias(id_col),
            F.first("__s").alias("__s2"),
            F.first("n_members").alias("n_members"),
        )
    )
    return winners.select(
        cluster_col,
        id_col,
        F.col("__s2").alias(score_col),
        "n_members",
    )
