"""Flood-operator unit tests.

Ports the reference's inline-golden boundary cases
(`data_pipelines_tests/flood/test_transforms.py`) onto the Spark
operators: tendency boundaries at exactly 1.10x / 0.90x control,
intensity bands at exactly 0.30, peak-timing BB/GC/GB rules including
the huge-median decoy at low severity.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from data_pipelines_spark.operators.flood import (
    add_control_member,
    compute_detailed_forecast,
    compute_intensity,
    compute_peak_timing,
    compute_summary_forecast,
    compute_tendency,
    filter_by_upstream_area,
)

ISSUED = dt.date(2026, 8, 1)


def _detailed_row(
    lat, step, median, p2=0.0, p5=0.0, p20=0.0, control=100.0,
    min_dis=None, max_dis=None,
):
    return {
        "latitude": lat,
        "longitude": 0.025,
        "issued_on": ISSUED,
        "valid_for": ISSUED + dt.timedelta(days=step),
        "step": step,
        "min_dis": min_dis if min_dis is not None else median - 1.0,
        "q1_dis": median - 0.5,
        "median_dis": median,
        "q3_dis": median + 0.5,
        "max_dis": max_dis if max_dis is not None else median + 1.0,
        "p_above_2y": p2,
        "p_above_5y": p5,
        "p_above_20y": p20,
        "control_dis": control,
    }


def _detailed_df(spark, rows):
    from data_pipelines_spark.schemas import DETAILED_FORECAST

    return spark.createDataFrame(rows, DETAILED_FORECAST)


# ---------------------------------------------------------------- A1 --


def test_detailed_forecast_quantiles_and_probabilities(spark):
    forecast = spark.createDataFrame(
        [
            # cell (1.025, 0.025): 4 members at step 1, dis24 = 10,20,30,40
            (m, 1, 1.025, 0.025, ISSUED, ISSUED + dt.timedelta(days=1), d)
            for m, d in enumerate([10.0, 20.0, 30.0, 40.0])
        ],
        "number long, step long, latitude double, longitude double, "
        "issued_on date, valid_for date, dis24 double",
    )
    thresholds = spark.createDataFrame(
        [(1.025, 0.025, 15.0, 25.0, 35.0)],
        "latitude double, longitude double, threshold_2y double, "
        "threshold_5y double, threshold_20y double",
    )
    out = compute_detailed_forecast(forecast, thresholds).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["min_dis"] == 10.0 and r["max_dis"] == 40.0
    # Exact linear-interpolation quantiles (type-7): q1=17.5, med=25, q3=32.5
    assert r["q1_dis"] == 17.5
    assert r["median_dis"] == 25.0
    assert r["q3_dis"] == 32.5
    # dis24 >= threshold: 2y → {20,30,40} = 0.75; 5y → {30,40} = 0.5; 20y → {40} = 0.25
    assert r["p_above_2y"] == 0.75
    assert r["p_above_5y"] == 0.5
    assert r["p_above_20y"] == 0.25


def test_unrounded_float_keys_would_miss_join(spark):
    """The reference's float-key hazard test (`test_transforms.py:73-121`):
    keys differing by float noise join correctly only because the engine
    rounds both sides to 3 decimals."""
    forecast = spark.createDataFrame(
        [(0, 1, 1.02500000001, 0.025, ISSUED, ISSUED, 100.0)],
        "number long, step long, latitude double, longitude double, "
        "issued_on date, valid_for date, dis24 double",
    )
    thresholds = spark.createDataFrame(
        [(1.02499999999, 0.025, 50.0, 60.0, 70.0)],
        "latitude double, longitude double, threshold_2y double, "
        "threshold_5y double, threshold_20y double",
    )
    r = compute_detailed_forecast(forecast, thresholds).collect()[0].asDict()
    assert r["p_above_2y"] == 1.0  # joined despite float noise


# ------------------------------------------------------- tendency F6 --


@pytest.mark.parametrize(
    "medians,control,expected",
    [
        # strictly above 1.10x control somewhere → increasing
        ([100.0, 111.0], 100.0, "U"),
        # max exactly at 1.10x → NOT increasing; min not <= 0.9x → stagnant
        ([100.0, 110.0], 100.0, "C"),
        # min exactly at 0.90x and max <= 1.10x → decreasing
        ([90.0, 100.0], 100.0, "D"),
        # min just above 0.90x → stagnant (reference boundary case)
        ([90.00001, 100.0], 100.0, "C"),
        # both branches possible: max > 1.10x wins (precedence)
        ([89.0, 112.0], 100.0, "U"),
    ],
)
def test_tendency_boundaries(spark, medians, control, expected):
    rows = [
        _detailed_row(1.025, step=i + 1, median=m, control=control)
        for i, m in enumerate(medians)
    ]
    out = compute_tendency(_detailed_df(spark, rows)).collect()
    assert out[0]["tendency"] == expected


# ------------------------------------------------------ intensity F6 --


@pytest.mark.parametrize(
    "p2,p5,p20,expected",
    [
        (0.0, 0.0, 0.30, "P"),   # exactly 0.30 fires the band
        (0.0, 0.30, 0.29, "R"),
        (0.30, 0.29, 0.0, "Y"),
        (0.29, 0.1, 0.0, "G"),
        (1.0, 1.0, 1.0, "P"),    # precedence P > R > Y
    ],
)
def test_intensity_boundaries(spark, p2, p5, p20, expected):
    rows = [_detailed_row(1.025, step=1, median=100.0, p2=p2, p5=p5, p20=p20)]
    out = compute_intensity(_detailed_df(spark, rows)).collect()
    assert out[0]["intensity"] == expected


# ---------------------------------------------------- peak timing F6 --


def test_peak_timing_black_border(spark):
    # peak (highest severity) at step 2, early 2y prob >= 0.30 → BB
    rows = [
        _detailed_row(1.025, step=1, median=50.0, p2=0.35),
        _detailed_row(1.025, step=2, median=60.0, p2=0.6, p5=0.4),
        _detailed_row(1.025, step=3, median=40.0, p2=0.2),
    ]
    r = compute_peak_timing(_detailed_df(spark, rows)).collect()[0].asDict()
    assert r["peak_step"] == 2
    assert r["peak_timing"] == "BB"
    assert r["peak_day"] == ISSUED + dt.timedelta(days=2)


def test_peak_timing_grayed_color_beyond_day10(spark):
    # peak after day 10 with early max 2y prob < 0.30 → GC
    rows = [_detailed_row(1.025, step=s, median=10.0, p2=0.1) for s in range(1, 11)]
    rows.append(_detailed_row(1.025, step=15, median=10.0, p2=0.9, p5=0.5))
    r = compute_peak_timing(_detailed_df(spark, rows)).collect()[0].asDict()
    assert r["peak_step"] == 15
    assert r["peak_timing"] == "GC"


def test_peak_timing_decoy_huge_median_low_severity(spark):
    """Reference decoy case (`test_transforms.py:2385-2388`): a huge
    median at LOW severity must not beat a smaller median at HIGHER
    severity — condition ranks before median in the argmax."""
    rows = [
        _detailed_row(1.025, step=1, median=10_000.0, p2=0.0),       # decoy, cond 1
        _detailed_row(1.025, step=4, median=50.0, p2=0.5),           # cond 2 → peak
    ]
    r = compute_peak_timing(_detailed_df(spark, rows)).collect()[0].asDict()
    assert r["peak_step"] == 4
    assert r["peak_timing"] == "GB"  # peak_step not in 1-3, max_2y_start >= 0.3


def test_peak_timing_tie_breaks_on_step(spark):
    # identical (condition, median) at steps 3 and 5 → deterministic step 3
    rows = [
        _detailed_row(1.025, step=5, median=50.0, p2=0.5),
        _detailed_row(1.025, step=3, median=50.0, p2=0.5),
    ]
    r = compute_peak_timing(_detailed_df(spark, rows)).collect()[0].asDict()
    assert r["peak_step"] == 3


# ----------------------------------------------- control + summary  --


def test_add_control_member_distributes_step1_median(spark):
    rows = [
        _detailed_row(1.025, step=1, median=77.0),
        _detailed_row(1.025, step=2, median=88.0),
    ]
    df = _detailed_df(spark, rows).drop("control_dis")
    out = {r["step"]: r["control_dis"] for r in add_control_member(df).collect()}
    assert out == {1: 77.0, 2: 77.0}


def test_summary_drops_gray_and_adds_wkt(spark):
    rows = [
        # gray cell: all probabilities below 0.30
        _detailed_row(1.025, step=1, median=10.0, p2=0.1),
        # yellow cell at lat 2.025
        _detailed_row(2.025, step=1, median=10.0, p2=0.5),
    ]
    out = compute_summary_forecast(_detailed_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["latitude"] == 2.025
    assert r["intensity"] == "Y"
    assert r["wkt"] == (
        "POLYGON ((0.000 2.000,0.000 2.050,0.050 2.050,0.050 2.000,0.000 2.000))"
    )


# ------------------------------------------------- upstream filter  --


def test_filter_by_upstream_area(spark):
    """Seeded-random equivalence in the reference's style
    (`test_upstream_filtering.py`): only cells with uparea >= threshold
    survive, matched by nearest-grid alignment."""
    import numpy as np

    rng = np.random.default_rng(42)
    lats = np.round(np.arange(0.025, 1.025, 0.05), 3)
    lons = np.round(np.arange(10.025, 11.025, 0.05), 3)
    cells = [(float(la), float(lo)) for la in lats for lo in lons]
    keep = set(map(tuple, rng.choice(cells, size=25, replace=False)))

    discharge = spark.createDataFrame(
        [
            (m, 1, la, lo, None, None, 100.0)
            for m in range(3)
            for la, lo in cells
        ],
        "number long, step long, latitude double, longitude double, "
        "time timestamp, valid_time timestamp, dis24 double",
    )
    # uparea grid offset by tiny float noise — nearest alignment must fix
    uparea = spark.createDataFrame(
        [
            (la + 1e-9, lo - 1e-9, 300_000.0 if (la, lo) in keep else 100.0)
            for la, lo in cells
        ],
        "latitude double, longitude double, uparea double",
    )
    out = filter_by_upstream_area(discharge, uparea, threshold=250_000.0)
    got = {(r["latitude"], r["longitude"]) for r in out.collect()}
    assert got == keep
    assert out.count() == 25 * 3


def test_summary_single_pass_equals_modular(spark):
    rows = []
    for lat in (1.025, 2.025, 3.025):
        for s in range(1, 12):
            rows.append(
                _detailed_row(
                    lat,
                    step=s,
                    median=50.0 + (s * 7 % 13) + lat,
                    p2=((s * 3) % 10) / 10.0,
                    p5=((s * 5) % 10) / 20.0,
                    p20=((s * 7) % 10) / 30.0,
                    control=50.0 + lat,
                )
            )
    df = _detailed_df(spark, rows)
    fused = compute_summary_forecast(df, single_pass=True)
    modular = compute_summary_forecast(df, single_pass=False)
    cols = sorted(fused.columns)
    assert cols == sorted(modular.columns)
    f = sorted([tuple(r[c] for c in cols) for r in fused.collect()])
    m = sorted([tuple(r[c] for c in cols) for r in modular.collect()])
    assert f == m
