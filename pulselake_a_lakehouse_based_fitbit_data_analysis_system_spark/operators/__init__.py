from . import (
    agg,
    dedup,
    joins,
    merge,
    multimodal,
    neardup,
    sampling,
    similarity,
    text,
    topk,
)

__all__ = [
    "agg",
    "dedup",
    "joins",
    "merge",
    "multimodal",
    "neardup",
    "sampling",
    "similarity",
    "text",
    "topk",
]
