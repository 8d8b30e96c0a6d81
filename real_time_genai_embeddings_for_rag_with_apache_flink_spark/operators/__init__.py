from .normalize import filter_nonempty_text, normalize, parse_raw, to_sink_docs
from .embed import DeterministicEmbedder, embed

__all__ = [
    "parse_raw",
    "normalize",
    "filter_nonempty_text",
    "to_sink_docs",
    "DeterministicEmbedder",
    "embed",
]
