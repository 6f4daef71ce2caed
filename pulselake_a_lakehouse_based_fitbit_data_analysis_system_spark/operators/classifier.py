"""Model inference as a map-side Column expression.

A fastText-style linear bag-of-words classifier is the workhorse
quality/language filter of large corpus pipelines (e.g. the CCNet /
LLaMA "looks like a reference page" gate). At 100 TB the inference
step must be a pure map — no shuffle, no Python — so the model here is
a broadcast literal: the vocabulary→weight table becomes a
``create_map`` literal Column and scoring is a left fold over the
token array (``F.aggregate``), all inside whole-stage codegen.

Weights are INTEGER milli-units and the score is an exact integer sum,
so the result is bit-identical across engines and partition orders —
a float dot product would drift in the last ulps with fold order.
The decision is ``score_mb > 0`` (sigmoid is monotone, so thresholding
the logit at 0 is thresholding the probability at 0.5; callers that
want the probability can apply ``1/(1+exp(-score_mb/1000))``
downstream without affecting checkability).

This file is where a real deployment would also put ONNX/JAX scoring
via ``mapInPandas`` — the multimodal operators show that Arrow shape;
the linear path stays JVM-side on purpose.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linear_bow_score(
    df: DataFrame,
    text_col: str,
    weights_mb: Mapping[str, int],
    bias_mb: int = 0,
    score_col: str = "score_mb",
    label_col: str = "label",
) -> DataFrame:
    """Score every row with a linear bag-of-words model.

    ``score = bias + Σ_tokens weight[token]`` (missing tokens weigh 0),
    in integer milli-units; ``label = score > 0``. Tokenization is the
    corpus convention used across the text operators: split on single
    spaces (documents are pre-normalized).

    A NULL ``text_col`` yields a NULL score and NULL label (unknown
    in, unknown out) — filter or coalesce upstream to score them as
    empty documents instead.

    Plan shape: zero exchanges — the model is a literal map, the fold
    runs per row. Vocabulary size is bounded by what fits in a literal
    (~10⁴ terms comfortably); beyond that, broadcast-join an exploded
    token table against a weights DataFrame instead (same result, one
    shuffle for the regroup).
    """
    if not weights_mb:
        raise ValueError("weights_mb must contain at least one term")
    entries: list[Column] = []
    for tok, w in weights_mb.items():
        entries += [F.lit(tok), F.lit(int(w)).cast("long")]
    wmap = F.create_map(*entries)
    toks = F.split(F.col(text_col), " ")
    score = F.aggregate(
        toks,
        F.lit(int(bias_mb)).cast("long"),
        lambda acc, t: acc + F.coalesce(F.element_at(wmap, t), F.lit(0).cast("long")),
    )
    return df.withColumn(score_col, score).withColumn(
        label_col, F.col(score_col) > 0
    )
