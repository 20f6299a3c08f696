"""Batched model inference over Arrow batches — the D5 ML-inference
shape (reference `assets/sentinel/upscaling.py:36-61`: per-task Python
handlers pushing tiles through a GPU model via `client.submit`).

Spark-first mapping: `mapInPandas`, with the model constructed ONCE
per partition and reused across that partition's Arrow batches — the
load cost (weights from disk, GPU context) amortizes over rows,
exactly what `predict_batch_udf` does, but with an explicit factory so
the call site controls construction and the operator stays dependency
free. The actual model in this environment is a STUB by necessity (no
torch/onnx in the container); the stub is deterministic so results are
assertable, and the Spark-side plumbing — schema, batch shapes,
per-partition amortization, NULL handling — is real and tested.

At 100 TB: inference is embarrassingly parallel (a narrow map), so the
only scale concerns are (a) model loads — once per partition, keep
partitions coarse via `spark.sql.files.maxPartitionBytes`; (b) batch
size — bound by `spark.sql.execution.arrow.maxRecordsPerBatch`, which
is the knob that matches GPU memory; (c) result size — an embedding
column multiplies bytes/row, so project inputs away before wide
downstream shuffles.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_infer(
    df: DataFrame,
    make_model: Callable[[], Callable],
    input_cols: Sequence[str],
    output_col: str,
    output_type: str,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Run ``model(batch_df) -> list`` over every Arrow batch.

    ``make_model`` is called once per PARTITION (not per batch, not per
    row) and must return a callable taking the batch as a pandas
    DataFrame restricted to ``input_cols`` and returning one output
    value per row (list / ndarray / Series, length == len(batch)).
    ``keep_cols`` are passed through unchanged (default: all input
    columns); the output lands in ``output_col`` typed ``output_type``.

    Rows where EVERY input column is null skip the model and produce a
    null output — a model never sees fully-missing inputs, and missing
    media degrade to null features instead of a per-batch crash.
    """
    import pandas as pd

    if not input_cols:
        raise ValueError("input_cols must be non-empty")
    keep = list(keep_cols) if keep_cols is not None else list(input_cols)
    missing = [c for c in (*input_cols, *keep) if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if output_col in keep:
        raise ValueError(
            f"output_col {output_col!r} collides with a kept column"
        )
    out_schema = ", ".join(
        [f"`{c}` {dt}" for c, dt in df.select(*keep).dtypes]
        + [f"`{output_col}` {output_type}"]
    )
    in_cols = list(input_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = make_model()
        for pdf in batches:
            out = pdf[keep].copy()
            mask = pdf[in_cols].notna().any(axis=1)
            preds = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
            if mask.any():
                got = model(pdf.loc[mask, in_cols])
                preds[mask] = pd.Series(list(got), index=pdf.index[mask], dtype=object)
            out[output_col] = preds
            yield out

    return df.select(*dict.fromkeys((*keep, *in_cols))).mapInPandas(run, out_schema)


def _stub_text_embedder(dim: int) -> Callable[[], Callable]:
    """Factory for the deterministic stand-in embedding model: each
    text hashes to a unit vector (md5-seeded float draws, l2
    normalized). Stable across partitionings, runs, and machines —
    which is the property the tests pin; swap in a real
    sentence-transformer factory with the same signature for actual
    semantics."""

    def make() -> Callable:
        def embed(pdf):
            out = []
            for t in pdf.iloc[:, 0]:
                h = hashlib.md5(str(t).encode("utf-8")).hexdigest()
                vals = []
                # Expand the digest to dim floats by counter mode over
                # hex strings (VARCHAR-only md5 chaining, so an ANSI-SQL
                # oracle can replay the draw bit-for-bit).
                i = 0
                while len(vals) < dim:
                    blk = hashlib.md5(f"{h}-{i}".encode("ascii")).digest()
                    vals.extend(b / 255.0 - 0.5 for b in blk)
                    i += 1
                vals = vals[:dim]
                norm = math.sqrt(sum(v * v for v in vals)) or 1.0
                out.append([v / norm for v in vals])
            return out

        return embed

    return make


def embed_texts(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    make_model: Callable[[], Callable] | None = None,
) -> DataFrame:
    """Text -> embedding column, the corpus-side half of the
    chunk -> embed -> index pipeline (:func:`~data_pipelines_spark.
    operators.corpus.chunk_documents` upstream, the ANN joins in
    `operators.similarity` downstream). ``(id_col, out_col)`` rows,
    array<double> of length ``dim``, null text -> null embedding.

    The default model is the deterministic stub (see module docstring);
    pass ``make_model`` to plug a real encoder with the same
    one-call-per-partition contract.
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    out = batch_infer(
        df,
        make_model or _stub_text_embedder(dim),
        input_cols=[text_col],
        output_col=out_col,
        output_type="array<double>",
        keep_cols=[id_col],
    )
    return out.select(F.col(id_col), F.col(out_col))
