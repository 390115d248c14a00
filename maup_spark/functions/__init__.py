from .text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    line_dedup,
    normalize_text,
    repetition_score,
    stratified_sample,
    text_stats,
    token_count,
    weighted_sample,
)
from .dedup import (
    exact_dedup,
    keep_best,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
    simhash_signatures,
)
from .dsir import (
    dsir_ratio,
    dsir_score,
    dsir_select,
    hashed_gram_counts,
    merge_gram_counts,
)
from .lm import lm_score, lm_train
from .webtext import pii_scrub, pii_stats
from .profile import profile_table
from .similarity import ann_lsh_pairs, cosine_topk, embedding_dedup, ivf_topk
from .webtext import (
    canonicalize_url,
    contamination_check,
    host_stats,
    pack_shards,
    upsample_by_source,
    url_dedup,
)

__all__ = [
    "ann_lsh_pairs",
    "bpe_token_count",
    "canonicalize_url",
    "contamination_check",
    "cosine_topk",
    "doc_fingerprint",
    "dsir_ratio",
    "dsir_score",
    "dsir_select",
    "embedding_dedup",
    "hashed_gram_counts",
    "exact_dedup",
    "host_stats",
    "ivf_topk",
    "keep_best",
    "lang_id",
    "line_dedup",
    "lm_score",
    "lm_train",
    "merge_gram_counts",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "normalize_text",
    "pack_shards",
    "pii_scrub",
    "pii_stats",
    "profile_table",
    "repetition_score",
    "simhash_pairs",
    "simhash_signatures",
    "stratified_sample",
    "text_stats",
    "token_count",
    "upsample_by_source",
    "url_dedup",
    "weighted_sample",
]
