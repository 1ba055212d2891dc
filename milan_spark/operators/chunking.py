"""Document chunking for training/RAG pipelines (beyond the reference —
the training-pipeline tier of SURVEY.md §7 phase 6; Milan has no string or
array operators at all, §2.2).

Splits documents into fixed-size token windows with a configurable stride
(overlapping when ``stride < window``), the standard pre-processing step
before embedding or sequence packing. The whole operator is one narrow
JVM-side projection + a bounded explode:

- tokenization and window slicing are Spark SQL higher-order expressions
  (``transform`` over a stride ``sequence``, one O(window) ``slice`` per
  chunk — total work O(n_tokens · window / stride) per doc, no quadratic
  re-scan);
- no shuffle anywhere: chunk rows inherit the input partitioning, so at
  100 TB this pipelines into a downstream ``pack_sequences`` /
  embedding stage without an exchange;
- fan-out is bounded by ceil(n_tokens / stride) rows per doc, each
  carrying ≤ window tokens — output size is a constant factor of input
  size, never quadratic.

Chunk rule (deterministic, engine-independent): starts s = 1, 1+stride,
1+2·stride, … while s ≤ n_tokens; the chunk is tokens [s, s+window-1]
(the final chunks are shorter); an empty token list yields no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from milan_spark.operators.text import tokenize


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens) — one row per chunk."""
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}, {stride}")
    toks = tokenize(text_col)
    n = F.array_size(toks)
    # greatest(n, 1) keeps the sequence bounds valid for empty docs; the
    # n >= 1 guard below drops the spurious chunk those docs would emit
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s, window)).alias("chunk_text"),
            F.least(F.lit(window), n - s + 1).cast("int").alias("n_chunk_tokens"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.explode(F.when(n >= 1, chunks).otherwise(F.array())).alias("__c"),
    ).select(id_col, "__c.chunk_idx", "__c.chunk_text", "__c.n_chunk_tokens")
