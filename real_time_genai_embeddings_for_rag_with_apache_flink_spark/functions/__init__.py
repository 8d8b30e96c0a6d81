from .vector import cosine_similarity, dot, l2_norm, l2_normalize
from .text import (
    language_guess,
    normalized_text,
    quality_score,
    token_count,
    doc_fingerprint,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "language_guess",
    "normalized_text",
    "quality_score",
    "token_count",
    "doc_fingerprint",
]
