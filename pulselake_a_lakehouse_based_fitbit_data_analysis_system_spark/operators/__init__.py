from . import agg, dedup, joins, merge, multimodal, neardup, similarity, text, topk

__all__ = [
    "agg",
    "dedup",
    "joins",
    "merge",
    "multimodal",
    "neardup",
    "similarity",
    "text",
    "topk",
]
