from .text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    line_dedup,
    repetition_score,
    stratified_sample,
    text_stats,
    token_count,
)
from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
    simhash_signatures,
)
from .profile import profile_table
from .similarity import ann_lsh_pairs, cosine_topk, embedding_dedup, ivf_topk

__all__ = [
    "ann_lsh_pairs",
    "bpe_token_count",
    "cosine_topk",
    "doc_fingerprint",
    "embedding_dedup",
    "exact_dedup",
    "ivf_topk",
    "lang_id",
    "line_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "profile_table",
    "repetition_score",
    "simhash_pairs",
    "simhash_signatures",
    "stratified_sample",
    "text_stats",
    "token_count",
]
