from .text import doc_fingerprint, lang_id, text_stats, token_count
from .dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard, simhash_signatures
from .similarity import ann_lsh_pairs, cosine_topk

__all__ = [
    "ann_lsh_pairs",
    "cosine_topk",
    "doc_fingerprint",
    "exact_dedup",
    "lang_id",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "simhash_signatures",
    "text_stats",
    "token_count",
]
