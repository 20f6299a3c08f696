#!/usr/bin/env python
"""A/B probe (r15, VERDICT item 7): q1_pricing_summary's money math in
integer cents vs the current DECIMAL formulation.

Rationale: Spark's Decimal multiply has no compact-long fast path (it
always routes through java.math.BigDecimal), so q1 pays two BigDecimal
multiplies per lineitem row for sum_disc_price / sum_charge. An
integer-cents formulation does the same arithmetic in longs:

    cents  = cast(cast(l_extendedprice as decimal(18,2)) * 100 as long)
    d100   = cast(cast(1.0 - l_discount as decimal(8,2)) * 100 as long)
    t100   = cast(cast(1.0 + l_tax      as decimal(8,2)) * 100 as long)
    disc_e4   = cents * d100          -- 1e-4 currency units
    charge_e6 = cents * d100 * t100   -- 1e-6 currency units

and converts the six group sums back through exact decimal division at
the end, so every emitted double is bit-identical (both paths correctly
round the same rational).

Overflow: ANSI mode makes both the per-row multiply and the long SUM
throw loudly on overflow. Bounds: per-row charge_e6 <= 1e8 * 110 * 110
~= 1.2e12; a single-level long sum overflows 2^63 past ~7.6e6 TB-scale
rows per group — the probe also times a TWO-LEVEL variant (salted
partial sums) that bounds each first-level group.

The probe asserts bit-identical output (exact float equality on the
collected rows) before timing; timings are interleaved min-of-N.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipelines_spark.session import get_spark, tune  # noqa: E402
from data_pipelines_spark.sources.tables import load_table  # noqa: E402
from data_pipelines_spark.suite.analytics import q1_pricing_summary  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q1_cents(spark, sf_dir, salt_buckets: int = 0):
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    d100 = ((F.lit(1.0) - F.col("l_discount")).cast("decimal(8,2)") * 100).cast(
        "long"
    )
    t100 = ((F.lit(1.0) + F.col("l_tax")).cast("decimal(8,2)") * 100).cast("long")
    de2 = (F.col("l_discount").cast("decimal(8,2)") * 100).cast("long")
    rows = li.where(
        F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        cents.alias("__cents"),
        (cents * d100).alias("__disc_e4"),
        (cents * d100 * t100).alias("__charge_e6"),
        de2.alias("__de2"),
    )
    cnt = F.count(F.lit(1))

    def finish(g):
        # exact decimal division, then the same double casts as the
        # decimal formulation (cast of an exact decimal is correctly
        # rounded, so the bits match)
        base_d = (F.col("__c").cast("decimal(38,6)") / 100).cast("double")
        return g.select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty"),
            base_d.alias("sum_base_price"),
            (F.col("__d4").cast("decimal(38,6)") / 10000)
            .cast("double")
            .alias("sum_disc_price"),
            (F.col("__c6").cast("decimal(38,6)") / 1000000)
            .cast("double")
            .alias("sum_charge"),
            (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
            (base_d / F.col("count_order")).alias("avg_price"),
            (
                (F.col("__e2").cast("decimal(38,6)") / 100).cast("double")
                / F.col("count_order")
            ).alias("avg_disc"),
            "count_order",
        )

    if salt_buckets:
        salt = F.pmod(F.xxhash64("l_quantity", "__cents"), F.lit(salt_buckets))
        lvl1 = rows.groupBy("l_returnflag", "l_linestatus", salt.alias("__s")).agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("__cents").alias("__c"),
            F.sum("__disc_e4").alias("__d4"),
            F.sum("__charge_e6").alias("__c6"),
            F.sum("__de2").alias("__e2"),
            cnt.alias("count_order"),
        )
        lvl2 = lvl1.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("__c").alias("__c"),
            F.sum("__d4").alias("__d4"),
            F.sum("__c6").alias("__c6"),
            F.sum("__e2").alias("__e2"),
            F.sum("count_order").alias("count_order"),
        )
        return finish(lvl2)
    g = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("__cents").alias("__c"),
        F.sum("__disc_e4").alias("__d4"),
        F.sum("__charge_e6").alias("__c6"),
        F.sum("__de2").alias("__e2"),
        cnt.alias("count_order"),
    )
    return finish(g)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="q1-cents-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")

    forms = {
        "decimal_current": lambda: q1_pricing_summary(spark, SF_DIR),
        "cents_1level": lambda: q1_cents(spark, SF_DIR),
        "cents_2level": lambda: q1_cents(spark, SF_DIR, salt_buckets=1024),
    }
    base = {
        (r[0], r[1]): tuple(r) for r in forms["decimal_current"]().collect()
    }
    for name in ("cents_1level", "cents_2level"):
        got = {(r[0], r[1]): tuple(r) for r in forms[name]().collect()}
        assert got == base, f"{name} differs:\n{base}\nvs\n{got}"
    print(f"equivalence OK over {len(base)} groups (exact float equality)")

    times: dict[str, list[float]] = {k: [] for k in forms}
    for rep in range(reps):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"q1-ab {name} rep{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        # drop rep 0 (JIT warmup) from the min
        print(f"{name}: min={min(ts[1:]):.3f}s runs={[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
