from .assign_stream import streaming_assign_counts, streaming_points
from .contamination_stream import streaming_decontaminate
from .crawl_stream import streaming_crawl_dedup
from .dsir_stream import streaming_dsir_filter
from .lm_stream import streaming_lm_filter
from .pii_stream import streaming_pii_scrub
from .sessions import sessionize_batch, streaming_sessionize

__all__ = [
    "sessionize_batch",
    "streaming_assign_counts",
    "streaming_crawl_dedup",
    "streaming_decontaminate",
    "streaming_dsir_filter",
    "streaming_lm_filter",
    "streaming_pii_scrub",
    "streaming_points",
    "streaming_sessionize",
]
