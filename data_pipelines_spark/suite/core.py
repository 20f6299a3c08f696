"""Flood-engine flagship queries over the driver's synthetic tables.

The driver grades correctness on TPC-H-ish tables (TESTDATA.md), so the
flood operators are exercised here through a schema mapping
(FIXTURES.md §F7): ``lineitem`` plays the long-form ensemble fact —
cell ≈ l_partkey, step ≈ l_linenumber, ensemble member ≈ row — and
``part`` plays the per-cell return-period threshold table. The *same
operator code* (`operators/flood.py`) that runs the geo pipeline runs
these queries; the DuckDB oracles restate the semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.operators.flood import (
    compute_detailed_forecast,
    flood_pipeline,
)
from data_pipelines_spark.session import tune
from data_pipelines_spark.sources.tables import load_table
from data_pipelines_spark.suite._registry import make_registry

QUERIES, ORACLES, register = make_registry()

ISSUED = "2026-08-01"

# Shared SQL prologue: lineitem → forecast long-form, part → thresholds.
_FLOOD_CTES = f"""
forecast AS (
    SELECT
        l_orderkey                          AS number,
        CAST(l_linenumber AS BIGINT)        AS step,
        ROUND(CAST(l_partkey AS DOUBLE), 3) AS latitude,
        ROUND(CAST(0.025 AS DOUBLE), 3)     AS longitude,
        DATE '{ISSUED}'                     AS issued_on,
        DATE '{ISSUED}' + l_linenumber      AS valid_for,
        l_quantity                          AS dis24
    FROM lineitem
),
thresholds AS (
    SELECT
        ROUND(CAST(p_partkey AS DOUBLE), 3)       AS latitude,
        ROUND(CAST(0.025 AS DOUBLE), 3)           AS longitude,
        ROUND(p_retailprice % 40, 0) + 5          AS threshold_2y,
        ROUND(p_retailprice % 40, 0) + 15         AS threshold_5y,
        ROUND(p_retailprice % 40, 0) + 30         AS threshold_20y
    FROM part
),
joined AS (
    SELECT f.latitude, f.longitude, f.issued_on, f.valid_for, f.step, f.dis24,
           CASE WHEN f.dis24 >= t.threshold_2y  THEN 1 ELSE 0 END AS exceed_2y,
           CASE WHEN f.dis24 >= t.threshold_5y  THEN 1 ELSE 0 END AS exceed_5y,
           CASE WHEN f.dis24 >= t.threshold_20y THEN 1 ELSE 0 END AS exceed_20y
    FROM forecast f
    LEFT JOIN thresholds t
        ON f.latitude = t.latitude AND f.longitude = t.longitude
),
detailed AS (
    SELECT latitude, longitude, issued_on, valid_for, step,
           min(dis24)                               AS min_dis,
           CAST(quantile_cont(dis24, 0.25) AS DOUBLE) AS q1_dis,
           CAST(quantile_cont(dis24, 0.5)  AS DOUBLE) AS median_dis,
           CAST(quantile_cont(dis24, 0.75) AS DOUBLE) AS q3_dis,
           max(dis24)                               AS max_dis,
           CAST(avg(exceed_2y)  AS DOUBLE)          AS p_above_2y,
           CAST(avg(exceed_5y)  AS DOUBLE)          AS p_above_5y,
           CAST(avg(exceed_20y) AS DOUBLE)          AS p_above_20y
    FROM joined
    GROUP BY 1, 2, 3, 4, 5
)
"""


def _forecast_inputs(spark, sf_dir):
    # No spread() here, deliberately. The flood dataflow is pure JVM
    # codegen (broadcast join + conditional flags + partial agg fused
    # into the scan stage): even when the local fixture scans as ONE
    # partition, the serialized work is cheap per row, and forcing a
    # round-robin exchange of the whole fact table costs more than the
    # parallelism it buys (driver bench r02: 3.14 s -> 6.49 s). spread()
    # stays reserved for Python/CPU-bound stages (minhash, spatial exact
    # test) where per-row work dwarfs one exchange. At real scale the
    # scan is many-split and this question disappears entirely.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    issued = F.to_date(F.lit(ISSUED))
    forecast = li.select(
        F.col("l_orderkey").alias("number"),
        F.col("l_linenumber").cast("long").alias("step"),
        F.col("l_partkey").cast("double").alias("latitude"),
        F.lit(0.025).cast("double").alias("longitude"),
        issued.alias("issued_on"),
        F.date_add(issued, F.col("l_linenumber")).alias("valid_for"),
        F.col("l_quantity").alias("dis24"),
    )
    base = F.round(F.col("p_retailprice") % 40, 0)
    thresholds = part.select(
        F.col("p_partkey").cast("double").alias("latitude"),
        F.lit(0.025).cast("double").alias("longitude"),
        (base + 5).alias("threshold_2y"),
        (base + 15).alias("threshold_5y"),
        (base + 30).alias("threshold_20y"),
    )
    return forecast, thresholds


@register(
    "flood_detailed_forecast",
    f"WITH {_FLOOD_CTES} SELECT * FROM detailed",
)
def flood_detailed_forecast(spark, sf_dir):
    """A1/J1/F1/F5: broadcast threshold join → exceedance flags → exact
    ensemble quantiles + probabilities per (cell, day)."""
    tune(spark)
    forecast, thresholds = _forecast_inputs(spark, sf_dir)
    return compute_detailed_forecast(forecast, thresholds)


_SUMMARY_SQL = f"""
WITH {_FLOOD_CTES},
with_control AS (
    SELECT *,
           max(CASE WHEN step = 1 THEN median_dis END)
               OVER (PARTITION BY latitude, longitude) AS control_dis,
           max(CASE WHEN step BETWEEN 1 AND 10 THEN p_above_2y END)
               OVER (PARTITION BY latitude, longitude) AS max_2y_start,
           CASE WHEN p_above_20y >= 0.3 THEN 4
                WHEN p_above_5y  >= 0.3 THEN 3
                WHEN p_above_2y  >= 0.3 THEN 2
                ELSE 1 END AS cond
    FROM detailed
),
peak AS (
    SELECT latitude, longitude,
           step      AS peak_step,
           valid_for AS peak_day,
           CASE WHEN step IN (1, 2, 3) AND max_2y_start >= 0.30 THEN 'BB'
                WHEN step > 10 AND max_2y_start < 0.30 THEN 'GC'
                ELSE 'GB' END AS peak_timing
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY latitude, longitude
            ORDER BY cond DESC, median_dis DESC, step ASC) AS rn
        FROM with_control
    )
    WHERE rn = 1
),
tendency AS (
    SELECT latitude, longitude,
           max(median_dis)  AS max_median_dis,
           min(median_dis)  AS min_median_dis,
           max(control_dis) AS control_dis,
           max(max_dis)     AS max_max_dis,
           min(min_dis)     AS min_min_dis
    FROM with_control
    GROUP BY 1, 2
),
tendency_lab AS (
    SELECT *,
           CASE WHEN max_median_dis > control_dis * CAST(1.10 AS DOUBLE) THEN 'U'
                WHEN min_median_dis <= control_dis * CAST(0.90 AS DOUBLE)
                     AND max_median_dis <= control_dis * CAST(1.10 AS DOUBLE) THEN 'D'
                ELSE 'C' END AS tendency
    FROM tendency
),
intensity AS (
    SELECT latitude, longitude,
           max(p_above_20y) AS max_p_above_20y,
           max(p_above_5y)  AS max_p_above_5y,
           max(p_above_2y)  AS max_p_above_2y
    FROM detailed
    GROUP BY 1, 2
),
intensity_lab AS (
    SELECT *,
           CASE WHEN max_p_above_20y >= 0.30 THEN 'P'
                WHEN max_p_above_5y  >= 0.30 THEN 'R'
                WHEN max_p_above_2y  >= 0.30 THEN 'Y'
                ELSE 'G' END AS intensity
    FROM intensity
)
SELECT p.latitude, p.longitude, p.peak_step, p.peak_day, p.peak_timing,
       t.max_median_dis, t.min_median_dis, t.control_dis,
       t.max_max_dis, t.min_min_dis, t.tendency,
       i.max_p_above_20y, i.max_p_above_5y, i.max_p_above_2y, i.intensity,
       'POLYGON ((' ||
       CAST(CAST(ROUND(p.longitude - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ' ' ||
       CAST(CAST(ROUND(p.latitude  - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ',' ||
       CAST(CAST(ROUND(p.longitude - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ' ' ||
       CAST(CAST(ROUND(p.latitude  + 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ',' ||
       CAST(CAST(ROUND(p.longitude + 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ' ' ||
       CAST(CAST(ROUND(p.latitude  + 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ',' ||
       CAST(CAST(ROUND(p.longitude + 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ' ' ||
       CAST(CAST(ROUND(p.latitude  - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ',' ||
       CAST(CAST(ROUND(p.longitude - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) || ' ' ||
       CAST(CAST(ROUND(p.latitude  - 0.025, 3) AS DECIMAL(12, 3)) AS VARCHAR) ||
       '))' AS wkt
FROM peak p
LEFT JOIN tendency_lab t  ON p.latitude = t.latitude AND p.longitude = t.longitude
LEFT JOIN intensity_lab i ON p.latitude = i.latitude AND p.longitude = i.longitude
WHERE i.intensity <> 'G'
"""


@register("flood_summary_forecast", _SUMMARY_SQL)
def flood_summary_forecast(spark, sf_dir):
    """The full flagship dataflow: detailed forecast → control-member
    window → peak-timing argmax / tendency / intensity classifications →
    merged summary with WKT cell geometry (SURVEY.md §3.1 stage 4)."""
    tune(spark)
    forecast, thresholds = _forecast_inputs(spark, sf_dir)
    _, summary = flood_pipeline(forecast, thresholds)
    return summary
