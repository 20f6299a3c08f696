"""Zonal-statistics operator tests — including the dense-output
contract (zero rows for empty groups) the reference's golden parity
depends on (`global_forest_watch.py:200-209`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.operators.zonal import (
    basin_pixel_areas,
    coarsen_sum,
    dense_zonal_count,
    treeloss_per_basin,
    yearly_loss_masks,
)


def _zoned(spark):
    # pixels with basin id + lossyear; basin 2 has NO loss pixels.
    rows = [
        (1, 10.0, 0.0, 1),
        (1, 10.5, 0.0, 1),
        (1, 11.0, 0.5, 2),
        (1, 11.5, 0.5, 0),   # no loss
        (2, 20.0, 5.0, 0),   # basin 2: all zero
        (2, 20.5, 5.0, 0),
    ]
    return spark.createDataFrame(
        rows, "id long, x double, y double, lossyear long"
    )


def _zones(spark):
    return spark.createDataFrame([(1,), (2,)], "id long")


def test_dense_zonal_count_emits_zero_groups(spark):
    out = dense_zonal_count(
        _zoned(spark), _zones(spark), years=(1, 2, 3)
    ).collect()
    got = {(r["id"], r["year"]): r["loss_incidents"] for r in out}
    # dense: 2 basins x 3 years = 6 rows, zeros included
    assert len(got) == 6
    assert got[(1, 2001)] == 2
    assert got[(1, 2002)] == 1
    assert got[(1, 2003)] == 0
    assert got[(2, 2001)] == 0 and got[(2, 2002)] == 0 and got[(2, 2003)] == 0


def test_coarsen_sum_blocks(spark):
    df = spark.createDataFrame(
        [(x, y, 1.0) for x in range(4) for y in range(4)],
        "x long, y long, mask double",
    )
    out = coarsen_sum(df, block_x=2, block_y=2).collect()
    assert len(out) == 4
    assert all(r["mask_sum"] == 4.0 for r in out)


def test_yearly_loss_masks_long_form(spark):
    out = yearly_loss_masks(_zoned(spark), years=(1, 2)).collect()
    assert {(r["year"], r["mask"]) for r in out} == {(1, 1), (2, 1)}
    assert len(out) == 3  # two year-1 pixels + one year-2 pixel


def test_basin_pixel_areas_deterministic_first_cell(spark):
    out = basin_pixel_areas(_zoned(spark), pixel_size_deg=0.05).collect()
    areas = {r["id"]: r["pixel_area_km2"] for r in out}
    assert set(areas) == {1, 2}
    # ~ (0.05 deg)^2 at low latitude ≈ 30.9 km2; sanity band
    assert 25 < areas[1] < 35


def test_treeloss_per_basin_joins_area(spark):
    out = treeloss_per_basin(
        _zoned(spark), _zones(spark), pixel_size_deg=0.05
    )
    rows = out.collect()
    assert len(rows) == 2 * 22  # dense over default 22 years
    assert all(r["pixel_area_km2"] is not None for r in rows)


def test_salted_agg_matches_plain_groupby(spark):
    """Two-stage salted aggregation must equal the direct groupBy on a
    skewed distribution (one hot key holding ~90% of rows)."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.plans.skew import salted_agg

    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_salt_is_retry_deterministic(spark):
    """The salt must be a pure function of row content: identical
    results (and identical per-bucket stage-1 partials) regardless of
    how the input happens to be partitioned — the property that makes
    the shuffle key stable under task retry. Position-derived salts
    (spark_partition_id / monotonically_increasing_id) fail this."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.plans.skew import salted_agg

    df = spark.range(2_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    aggs = {"s": ("v", "sum"), "c": ("v", "count")}

    def stage1_partials(frame):
        # reproduce the internal salt and materialize the stage-1 groups
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in frame.columns]), F.lit(8))
        return sorted(
            (r["k"], r["__salt"], r["s"], r["c"])
            for r in frame.withColumn("__salt", salt)
            .groupBy("k", "__salt")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )

    base = stage1_partials(df)
    for parts in (1, 7, 32):
        assert stage1_partials(df.repartition(parts)) == base

    out = sorted(
        (r["k"], r["s"], r["c"]) for r in salted_agg(df, ["k"], aggs).collect()
    )
    for parts in (1, 7, 32):
        redo = sorted(
            (r["k"], r["s"], r["c"])
            for r in salted_agg(df.repartition(parts), ["k"], aggs).collect()
        )
        assert redo == out

    # the plan must not contain position-derived (retry-unstable) sources
    plan = salted_agg(df, ["k"], aggs)._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    assert "SPARK_PARTITION_ID" not in plan.upper()
    # salt_on narrows the hash to a named stable column
    narrow = salted_agg(df, ["k"], aggs, salt_on=["rid"])
    assert sorted((r["k"], r["s"], r["c"]) for r in narrow.collect()) == out


def _skew_fixture(spark):
    from pyspark.sql import functions as F

    fact = spark.range(5_000).select(
        F.when(F.col("id") % 5 < 4, F.lit("HOT"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 11).cast("string")))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    # one row with a NULL key (never matches; must survive left joins)
    fact = fact.unionByName(
        spark.createDataFrame([(None, -1.0)], "k string, v double")
    )
    dim = spark.createDataFrame(
        [("HOT", "celebrity")] + [(f"u{i}", f"d{i}") for i in range(11)]
        + [("unmatched", "x")],
        "k string, attr string",
    )
    return fact, dim


def test_skew_split_join_matches_plain_join(spark):
    from data_pipelines_spark.plans.skew import skew_split_join

    fact, dim = _skew_fixture(spark)
    for how in ("inner", "left", "left_semi", "left_anti"):
        from collections import Counter

        plain = Counter(map(tuple, fact.join(dim, ["k"], how).collect()))
        split = skew_split_join(
            fact, dim, ["k"], how=how, min_count=1_000, top_k=4
        )
        assert Counter(map(tuple, split.collect())) == plain, how
        # explicit hot list skips the count job, same answer
        pinned = skew_split_join(fact, dim, ["k"], how=how, hot_keys=["HOT"])
        assert Counter(map(tuple, pinned.collect())) == plain, how


def test_skew_split_join_hot_branch_broadcasts(spark):
    from data_pipelines_spark.plans.skew import skew_split_join

    fact, dim = _skew_fixture(spark)
    plan = (
        skew_split_join(fact, dim, ["k"], hot_keys=["HOT"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # no positional (retry-unstable) sources anywhere in the routing
    assert "monotonically_increasing_id" not in plan
    assert "SPARK_PARTITION_ID" not in plan.upper()


def test_skew_split_join_no_hot_keys_degenerates_to_plain(spark):
    from data_pipelines_spark.plans.skew import skew_split_join

    fact, dim = _skew_fixture(spark)
    from collections import Counter

    out = skew_split_join(fact, dim, ["k"], min_count=10**9)
    assert Counter(map(tuple, out.collect())) == Counter(
        map(tuple, fact.join(dim, ["k"], "inner").collect())
    )
    # degenerates to a single join (the fixture's own unionByName is
    # still in the plan, so count joins rather than grepping Union)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]  # AQE echoes the pre-adaptive plan too
    )
    import re as _re

    assert len(_re.findall(r"(?:SortMerge|BroadcastHash|ShuffledHash)Join", plan)) == 1


def test_skew_split_join_composite_keys(spark):
    from pyspark.sql import functions as F

    from data_pipelines_spark.plans.skew import skew_split_join

    fact = spark.range(2_000).select(
        (F.col("id") % 3).alias("a"),
        F.when(F.col("id") % 4 < 3, F.lit("x")).otherwise(F.lit("y")).alias("b"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(i, c, f"{i}{c}") for i in range(3) for c in ("x", "y", "z")],
        "a long, b string, attr string",
    )
    plain = sorted(map(tuple, fact.join(dim, ["a", "b"], "inner").collect()))
    auto = skew_split_join(fact, dim, ["a", "b"], min_count=300, top_k=8)
    assert sorted(map(tuple, auto.collect())) == plain
    pinned = skew_split_join(fact, dim, ["a", "b"], hot_keys=[(0, "x"), (1, "x")])
    assert sorted(map(tuple, pinned.collect())) == plain


def test_treeloss_join_broadcasts_the_area_side(spark):
    """J8's plan pin: the per-basin area side is one row per basin —
    it must broadcast, and nothing in the chain may fall back to a
    nested-loop or Cartesian plan."""
    from pyspark.sql import functions as F

    from data_pipelines_spark.operators.zonal import treeloss_per_basin
    from data_pipelines_spark.plans.audit import assert_plan

    zoned = spark.range(0, 5000).select(
        (F.col("id") % 340 - 170).alias("x"),
        (F.col("id") % 160 - 80).alias("y"),
        (F.col("id") % 7).alias("lossyear"),
        (F.col("id") % 11).alias("id"),
    )
    out = treeloss_per_basin(zoned, zoned, 0.25, id_col="id")
    out.collect()
    # BroadcastNestedLoop is PRESENT by design: the dense (basin x
    # year) universe is a deliberate bounded cross join (plans/dense) —
    # |basins| x 22 rows, dimension-sized. What must hold: the area
    # attach is a broadcast HASH join, and nothing degenerates to a
    # non-broadcast Cartesian.
    plan = assert_plan(
        out,
        forbid=["CartesianProduct"],
        require=["BroadcastHashJoin"],
    )
    from data_pipelines_spark.plans.audit import plan_string

    final = plan_string(out, final_only=True)
    assert final.count("BroadcastNestedLoop") == 1, plan
