"""Column-function library: text analysis and vector math."""

from meta_frame_spark.functions.text import (
    bpe_token_count,
    bpe_tokens,
    char_count,
    char_entropy,
    language_id,
    language_scores,
    normalize_text,
    normalize_text_unicode,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    strip_html,
    token_count,
    tokens,
    with_text_stats,
)
from meta_frame_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
)

__all__ = [
    "bpe_token_count",
    "bpe_tokens",
    "char_count",
    "char_entropy",
    "cosine_similarity",
    "dot",
    "l2_distance",
    "l2_norm",
    "language_id",
    "language_scores",
    "normalize_text",
    "normalize_text_unicode",
    "punct_ratio",
    "quality_score",
    "rolling_fingerprint",
    "stopword_ratio",
    "strip_html",
    "token_count",
    "tokens",
    "with_text_stats",
]
