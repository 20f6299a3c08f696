"""Asset-graph orchestration: named, dependency-ordered materialization.

The reference organizes all work as Dagster assets — named tables with
declared lineage, materialized to storage, re-run on a schedule with a
retry policy (`data_pipelines/assets/*`, `jobs.py:9-29`). This module
is the engine's Spark-native equivalent: an asset is a function from
upstream DataFrames to a DataFrame; the graph resolves dependency
order, materializes each asset to parquet (optionally Hive-partitioned,
reference D4), retries per asset (reference D6), and supports subset
selection like Dagster's asset selection (`jobs.py:16-18`).

Deliberately thin: scheduling/cron stays external (`spark-submit` +
cron, or any orchestrator), matching SURVEY.md §2.9's mapping. What
belongs in-engine is exactly what affects the data: lineage order,
storage layout, idempotent overwrite semantics, and failure isolation.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Asset:
    name: str
    fn: Callable[..., DataFrame] | None  # fn(spark, **upstream DataFrames);
    # None marks a SOURCE asset: parquet materialized by ingestion
    # outside the graph (reference: upstream Dagster assets /
    # IO-manager inputs), read but never written here.
    deps: tuple[str, ...] = ()
    partition_cols: tuple[str, ...] = ()
    description: str = ""


@dataclass
class MaterializeResult:
    name: str
    path: str
    rows: int
    seconds: float
    attempts: int


class AssetGraph:
    def __init__(self) -> None:
        self._assets: dict[str, Asset] = {}

    def add(self, asset: Asset) -> "AssetGraph":
        if asset.name in self._assets:
            raise ValueError(f"duplicate asset: {asset.name}")
        self._assets[asset.name] = asset
        return self

    def source(self, name: str, description: str = "") -> "AssetGraph":
        """Declare an externally-materialized parquet input."""
        return self.add(Asset(name, None, description=description))

    def asset(
        self,
        name: str,
        deps: tuple[str, ...] = (),
        partition_cols: tuple[str, ...] = (),
        description: str = "",
    ):
        """Decorator registration, Dagster-@asset-shaped."""

        def deco(fn):
            self.add(Asset(name, fn, deps, partition_cols, description))
            return fn

        return deco

    def topo_order(self, select: list[str] | None = None) -> list[str]:
        """Dependency-closed topological order of the selected assets
        (whole graph when ``select`` is None)."""
        wanted: set[str] = set()

        def expand(name: str) -> None:
            if name in wanted:
                return
            if name not in self._assets:
                raise KeyError(f"unknown asset: {name}")
            wanted.add(name)
            for d in self._assets[name].deps:
                expand(d)

        for name in select if select is not None else list(self._assets):
            expand(name)

        order: list[str] = []
        done: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in done:
                return
            if name in visiting:
                raise ValueError(f"dependency cycle through {name}")
            visiting.add(name)
            for d in self._assets[name].deps:
                visit(d)
            visiting.discard(name)
            done.add(name)
            order.append(name)

        for name in sorted(wanted):
            visit(name)
        return order

    def materialize(
        self,
        spark: SparkSession,
        root_dir: str,
        select: list[str] | None = None,
        max_retries: int = 2,
    ) -> dict[str, MaterializeResult]:
        """Materialize assets in dependency order to
        ``root_dir/<name>`` parquet, retrying each asset up to
        ``max_retries`` times (reference retry policy shape,
        `jobs.py:9-11`). Upstream inputs are read BACK from their
        materialized parquet — each asset is a clean checkpoint, like
        the reference's IO-manager boundary."""
        results: dict[str, MaterializeResult] = {}
        for name in self.topo_order(select):
            asset = self._assets[name]
            path = os.path.join(root_dir, name)
            if asset.fn is None:  # source asset: verify it exists, don't write
                # Hadoop-FS probe, not os.path: root_dir may be an
                # object-store URI (same contract as
                # sources.materialize.dataset_exists).
                from data_pipelines_spark.sources.materialize import (
                    dataset_exists,
                )

                if not dataset_exists(spark, path):
                    raise FileNotFoundError(
                        f"source asset {name} not materialized at {path}"
                    )
                continue
            inputs = {
                d: spark.read.parquet(os.path.join(root_dir, d))
                for d in asset.deps
            }
            start = time.perf_counter()
            last_err: Exception | None = None
            for attempt in range(1, max_retries + 2):
                try:
                    df = asset.fn(spark, **inputs)
                    writer = df.write.mode("overwrite")
                    if asset.partition_cols:
                        writer = writer.partitionBy(*asset.partition_cols)
                    writer.parquet(path)
                    rows = spark.read.parquet(path).count()
                    results[name] = MaterializeResult(
                        name, path, rows, round(time.perf_counter() - start, 3),
                        attempt,
                    )
                    last_err = None
                    break
                except Exception as e:  # retry per asset, fail the run if exhausted
                    last_err = e
            if last_err is not None:
                raise RuntimeError(f"asset {name} failed after retries") from last_err
        return results


def flood_asset_graph() -> AssetGraph:
    """The reference's flood job as an asset graph (SURVEY.md §3.1):
    thresholds + discharge → detailed forecast → summary forecast.
    Source assets are expected to be materialized by ingestion
    (``transformed_discharge``, ``rp_combined_thresholds`` parquet)."""
    from data_pipelines_spark.operators.flood import (
        add_control_member,
        compute_detailed_forecast,
        compute_summary_forecast,
    )

    g = AssetGraph()
    g.source("transformed_discharge", "long-form ensemble discharge (ingested)")
    g.source("rp_combined_thresholds", "per-cell return-period thresholds")

    @g.asset("detailed_forecast", deps=("transformed_discharge", "rp_combined_thresholds"))
    def detailed(spark, transformed_discharge, rp_combined_thresholds):
        return add_control_member(
            compute_detailed_forecast(transformed_discharge, rp_combined_thresholds)
        )

    @g.asset("summary_forecast", deps=("detailed_forecast",))
    def summary(spark, detailed_forecast):
        return compute_summary_forecast(detailed_forecast)

    return g
