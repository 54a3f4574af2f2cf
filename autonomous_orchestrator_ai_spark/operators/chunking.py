"""Fixed-window text chunking — splitting documents into overlapping
context-window-sized pieces, the step between a curated corpus and a
training/RAG-ready one. (The reference stops at whole-document rows; this
is the beyond-reference training-pipeline surface.)

All chunk math is ``sequence``/``explode``/``substr`` — JVM-side,
whole-stage-codegen, no Python. Explode multiplies rows by
ceil(len/stride), which is bounded and uniform, so partition sizing scales
linearly with input bytes: no skew beyond the document-length
distribution itself, and at 100 TB the explode happens AFTER the parquet
scan's column pruning (only the text + id columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_text"]


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 400,
    stride: int = 300,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per chunk: chunk starts at 0, stride, 2*stride, ... while
    the start is inside the document, each chunk is ``size`` chars (the
    final ones run short). ``size > stride`` gives ``size - stride`` chars
    of overlap. Empty/NULL documents yield no chunks.

    Output: ``keep_cols + [chunk_idx, chunk_start, chunk_text]``.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    keep = list(keep_cols or [c for c in df.columns if c != text_col])
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.length(text) - F.lit(1), F.lit(stride)
    )
    return (
        df.filter(F.length(text) > 0)
        .select(*keep, text.alias("__t"), F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(
            *keep,
            "chunk_idx",
            "chunk_start",
            F.col("__t")
            .substr(F.col("chunk_start") + F.lit(1), F.lit(size))
            .alias("chunk_text"),
        )
    )
