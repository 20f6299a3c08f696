"""Distributed URL ingestion (reference S9).

The reference's ingestion scripts fetch GRIB/NetCDF payloads over HTTP
before conversion (SURVEY.md §2.1 maps this outside the relational
core). Spark-native form: fan the URL list out across executors with
per-task bounded retries — the `operators/taskmap.py` policy — and
return payloads as a binary-column DataFrame that feeds straight into
the decode tier (`operators/multimodal.py`, `sources/raster.py`).

Pure stdlib (urllib); tested hermetically with ``file://`` URLs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

FETCH_SCHEMA = (
    "url string, ok boolean, attempts int, n_bytes long, "
    "content binary, error string"
)


def fetch_binary(
    spark: SparkSession,
    urls: list[str],
    timeout_sec: float = 30.0,
    max_retries: int = 2,
    num_slots: int | None = None,
) -> DataFrame:
    """Fetch every URL across the cluster → (url, ok, attempts,
    n_bytes, content, error).

    Failures are captured per row, never raised — one dead mirror must
    not kill a 10k-file ingestion job; the manifest row records it for
    a retry pass. ``num_slots`` bounds fan-out (defaults to one slot
    per URL, capped by the cluster's parallelism).
    """
    slots = min(
        num_slots or max(len(urls), 1),
        spark.sparkContext.defaultParallelism,
    )
    url_df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(
        max(slots, 1)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        for pdf in batches:
            out = {k: [] for k in
                   ("url", "ok", "attempts", "n_bytes", "content", "error")}
            for url in pdf["url"]:
                content, err, attempt = None, "", 0
                for attempt in range(1, max_retries + 2):
                    try:
                        with urllib.request.urlopen(url, timeout=timeout_sec) as r:
                            content = r.read()
                        err = ""
                        break
                    except Exception as e:  # captured, not raised
                        err = f"{type(e).__name__}: {e}"
                out["url"].append(url)
                out["ok"].append(content is not None)
                out["attempts"].append(attempt)
                out["n_bytes"].append(len(content) if content is not None else 0)
                out["content"].append(content)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return url_df.mapInPandas(run, FETCH_SCHEMA)
