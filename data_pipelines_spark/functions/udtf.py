"""Python UDTF surface (table-valued functions).

The reference has no UDTFs (SURVEY.md §2.11); this is the engine's
extension point for one-row-to-many transformations that need Python —
here a text chunker, the shape LLM pipelines use to split documents
into training windows with overlap. (Pure splitting could be done with
native explode; the UDTF form is for chunkers that carry Python
state/logic — tokenizer-aware boundaries, sentence models.)

Registered per-session via :func:`register_udtfs`; usable from SQL as
``LATERAL chunk_text(text, size, overlap)``.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no int, start int, chunk string")
class ChunkText:
    """Split a document into fixed-size character windows with overlap."""

    def eval(self, text: str, size: int = 100, overlap: int = 20):  # noqa: D102
        if size <= 0 or overlap < 0 or overlap >= size:
            # Fail loudly: size<=0 degenerates to empty chunks and a
            # NEGATIVE overlap silently skips (size..size-overlap) chars
            # between windows — data loss a training pipeline would
            # never notice.
            raise ValueError(
                f"chunk_text requires 0 <= overlap < size, got "
                f"size={size}, overlap={overlap}"
            )
        if not text:
            return
        step = max(size - overlap, 1)
        i = 0
        chunk_no = 0
        while i < len(text):
            yield chunk_no, i, text[i : i + size]
            chunk_no += 1
            i += step


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
