"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
through Spark's built-in ``hll_*`` functions).

The 100 TB pattern this enables: a daily job reduces each partition's
facts to one HllSketch row per (day, dimension) — kilobytes instead of
the raw keys — and any later question ("distinct users last 90 days",
"unique domains per source this quarter") is answered by UNIONING the
stored sketches, never rescanning the facts. ``approx_count_distinct``
alone cannot do this: its estimate is not re-mergeable once collected,
while HLL sketch state unions losslessly at equal configuration.

Both operators are one map-side-combined aggregation; sketch size is
bounded by ``lgk`` (2^lgk buckets, ~0.5-1 KB at the default 12 with
~2-3% relative error), independent of cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Reduce to one HLL sketch of ``value_col``'s distinct values per
    group: (group_cols..., sketch_col binary, n_distinct_approx).

    Store these rows (e.g. partitioned by day); re-aggregate later with
    :func:`merge_distinct_counts`. ``lgk`` must match across every
    sketch that will ever be unioned — keep it with the store.
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lgk)))
    return df.groupBy(*group_cols).agg(
        sk.alias(sketch_col),
    ).withColumn(
        "n_distinct_approx",
        F.hll_sketch_estimate(F.col(sketch_col)),
    )


def merge_distinct_counts(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "distinct_sketch",
    keep_sketch: bool = False,
) -> DataFrame:
    """Union stored sketches to a coarser grain and estimate:
    (group_cols..., n_distinct_approx[, sketch_col]).

    Unions never double count: a value present in many input sketches
    contributes once, so rolling up daily sketches estimates the true
    distinct count of the union within the sketch's error envelope
    (asserted in tests; sketches still in sparse mode union bit-exactly
    with the direct sketch, a dense-mode union may differ from it by a
    fraction of a percent — both stay inside the envelope). Pass
    ``group_cols=[]`` for a global count; ``keep_sketch=True`` retains
    the merged sketch for further cascading (day → month → year).
    """
    merged = F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    out = sketches.groupBy(*group_cols).agg(merged).withColumn(
        "n_distinct_approx", F.hll_sketch_estimate(F.col("__merged"))
    )
    if keep_sketch:
        return out.withColumnRenamed("__merged", sketch_col)
    return out.drop("__merged")


def _validated_weight(weight_col: str | None, fn_name: str):
    """Per-row weight expression with a loud guard, or a literal 1.

    Validates the RAW column, then casts: casting long first would
    truncate -0.5 → 0 (evading the sign check), 2.7 → 2 (silent data
    change), and non-numerics → NULL → 0. The double view is lossless
    for the sign/integrality tests on any numeric input; NaN needs its
    own test (NaN != floor(NaN) is NULL in SQL, so it would slip
    through the inequality alone). try_cast, not cast: under ANSI mode
    a malformed string would raise CAST_INVALID_INPUT before the guard
    runs; try_cast maps it to NULL so the guard's own (diagnosable)
    error fires. NULL weights contribute 0."""
    if weight_col is None:
        return F.lit(1).cast("long")
    raw = F.col(weight_col)
    wd = raw.try_cast("double")
    bad = raw.isNotNull() & (
        wd.isNull() | F.isnan(wd) | (wd < 0) | (wd != F.floor(wd))
    )
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    f"{fn_name}: {weight_col} must be a "
                    "non-negative integer, got "
                ),
                raw.cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.coalesce(raw.cast("long"), F.lit(0)))


def histogram_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    hist_col: str = "hist",
    weight_col: str | None = None,
) -> DataFrame:
    """Reduce each group to a fixed-bin histogram of ``value_col`` —
    the mergeable-quantile counterpart of :func:`distinct_sketch`:
    ``(group_cols..., hist array<bigint>[n_bins], n_below, n_above,
    n_null, n)``.

    A daily job stores one histogram row per (day, dimension) — a few
    hundred longs instead of the raw values — and any later window's
    quantiles/drift come from SUMMING the stored rows
    (:func:`merge_histogram_sketches`), never rescanning the facts.
    ``approx_percentile`` cannot do this: its sketch is gone once the
    estimate is collected. The price is a fixed domain: ``[lo, hi)``
    split into ``n_bins`` equal bins, chosen once and kept with the
    store (mismatched binning must never be merged). Out-of-range
    values are counted (``n_below``/``n_above``) but carry no position
    beyond the edge — quantiles falling there clamp to lo/hi. NaN
    values are folded into ``n_null`` (they have no order position).

    One map-side-combined aggregation; every expression is native (the
    bin counts are ``n_bins`` conditional sums in a single pass), so
    the scan fuses and nothing is collected. Exact-count semantics:
    merged histograms are bit-identical to a direct histogram of the
    union (integer sums — no estimator variance), and quantile error
    is bounded by one bin width.

    ``weight_col``: each row contributes its (non-negative, integral)
    weight instead of 1 to the bins and the below/above/null tallies —
    the token-weighted length distribution ("p50 doc length by tokens
    contributed") instead of the doc-weighted one. Quantiles-from-store
    and drift then read as weighted quantiles/PSI with no change. NULL
    weights contribute 0; everything else invalid raises — negative,
    fractional, NaN, or non-numeric weights — validated on the RAW
    column before any cast, so a -0.5 cannot truncate to 0 and slip
    past the sign check, and a non-numeric string cannot silently
    become 0. ``n`` stays a plain row count in both modes.
    """
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    v = F.col(value_col).cast("double")
    wt = _validated_weight(weight_col, "histogram_sketch")
    width = (float(hi) - float(lo)) / n_bins
    idx = F.floor((v - F.lit(float(lo))) / F.lit(width))
    in_range = v.isNotNull() & ~F.isnan(v) & (v >= lo) & (v < hi)
    # values exactly at hi-ulp can floor to n_bins via fp roundoff
    idx = F.least(idx, F.lit(n_bins - 1))
    zero = F.lit(0).cast("long")
    bins = F.array(
        *[
            F.coalesce(
                F.sum(F.when(in_range & (idx == i), wt).otherwise(zero)),
                zero,
            ).cast("long")
            for i in range(n_bins)
        ]
    )
    return df.groupBy(*group_cols).agg(
        bins.alias(hist_col),
        F.coalesce(
            F.sum(F.when(v.isNotNull() & ~F.isnan(v) & (v < lo), wt).otherwise(zero)),
            zero,
        ).cast("long").alias("n_below"),
        F.coalesce(
            F.sum(F.when(v.isNotNull() & ~F.isnan(v) & (v >= hi), wt).otherwise(zero)),
            zero,
        ).cast("long").alias("n_above"),
        F.coalesce(
            F.sum(F.when(v.isNull() | F.isnan(v), wt).otherwise(zero)), zero
        ).cast("long").alias("n_null"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_histogram_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    n_bins: int,
    hist_col: str = "hist",
) -> DataFrame:
    """Roll stored histograms up to a coarser grain by element-wise
    integer sum — exact (no estimator variance): the merged histogram
    equals a direct histogram of the union, asserted in tests. Inputs
    must share the store's binning (lo/hi/n_bins). Pass
    ``group_cols=[]`` for a global roll-up.
    """
    summed = F.array(
        *[
            F.coalesce(F.sum(F.element_at(F.col(hist_col), i + 1)), F.lit(0))
            .cast("long")
            for i in range(n_bins)
        ]
    )
    return sketches.groupBy(*group_cols).agg(
        summed.alias(hist_col),
        F.coalesce(F.sum("n_below"), F.lit(0)).cast("long").alias("n_below"),
        F.coalesce(F.sum("n_above"), F.lit(0)).cast("long").alias("n_above"),
        F.coalesce(F.sum("n_null"), F.lit(0)).cast("long").alias("n_null"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
    )


def histogram_quantiles(
    sketches: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int,
    hist_col: str = "hist",
) -> DataFrame:
    """Estimate quantiles from stored histograms:
    ``(group_cols..., q, value)`` — one row per requested quantile.

    Deterministic linear interpolation inside the covering bin
    (``left_edge + width * remaining/bin_count``); below/above-range
    mass clamps to lo/hi (it has no position beyond the edge — that is
    the fixed-domain trade-off, documented on the sketch). Error is
    bounded by one bin width. Plan shape: posexplode to
    (group, bin, count) — ``n_bins`` rows per group, never data-sized —
    cumulative sum over the bin order, then one min_by per (group, q).
    Groups whose in-range mass is zero return NULL.
    """
    for q in quantiles:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile out of [0,1]: {q}")
    from pyspark.sql import Window

    width = (float(hi) - float(lo)) / n_bins
    base = sketches.select(
        *group_cols,
        F.col("n_below"),
        (F.col("n_below") + F.aggregate(
            F.col(hist_col), F.lit(0).cast("long"), lambda a, x: a + x
        ) + F.col("n_above")).alias("__mass"),
        F.posexplode(F.col(hist_col)).alias("__bin", "__cnt"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__bin") if group_cols else (
        Window.orderBy("__bin")
    )
    cum = base.withColumn("__cum", F.sum("__cnt").over(w))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "__target", F.col("q") * F.col("__mass").cast("double")
    )
    covering = F.col("__cum") + F.col("n_below") >= F.col("__target")
    frac = (
        F.col("__target") - F.col("n_below") - (F.col("__cum") - F.col("__cnt"))
    ) / F.col("__cnt").cast("double")
    value = (
        F.lit(float(lo))
        + F.lit(width) * (F.col("__bin") + F.greatest(F.lit(0.0), F.least(F.lit(1.0), frac)))
    )
    picked = (
        joined.where(covering & (F.col("__cnt") > 0))
        .groupBy(*group_cols, "q")
        .agg(
            F.min_by(
                F.round(value, 9), F.struct(F.col("__bin"))
            ).alias("__v"),
            F.max("__mass").alias("__mass2"),
        )
    )
    # quantile target beyond the last bin's cumulative in-range mass
    # (above-range values) clamps to hi; all-mass-out-of-range or empty
    # groups need the edge cases handled off the base rows:
    edges = (
        joined.groupBy(*group_cols, "q")
        .agg(
            F.max("__mass").alias("__mass"),
            F.max(F.col("__cum") + F.col("n_below")).alias("__inmass"),
            F.max("__target").alias("__t"),
            F.max("n_below").alias("__nb"),
        )
    )
    # Null-safe join: GROUP BY forms a NULL group whose quantiles must
    # compute like any other's — a plain equi join would leave them NULL
    # (the NULL-group-loss class the round-5 probe sweep chased).
    pk = picked.select(
        *[F.col(g).alias(f"__pg{i}") for i, g in enumerate(group_cols)],
        F.col("q").alias("__pq"),
        "__v",
        "__mass2",
    )
    cond = F.col("q") == F.col("__pq")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__pg{i}"))
    return (
        edges.join(pk, cond, "left")
        .select(
            *group_cols,
            "q",
            F.when(F.col("__mass") == 0, F.lit(None).cast("double"))
            .when(F.col("__t") <= F.col("__nb"), F.lit(float(lo)))
            .when(F.col("__t") > F.col("__inmass"), F.lit(float(hi)))
            .otherwise(F.col("__v"))
            .alias("value"),
        )
    )


def histogram_drift(
    baseline: DataFrame,
    current: DataFrame,
    group_cols: Sequence[str],
    n_bins: int,
    hist_col: str = "hist",
    epsilon: float = 1e-4,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between two histogram-sketch tables
    sharing one binning: ``(group_cols..., psi, n_baseline, n_current)``
    per group — the drift gate between a dataset snapshot and its
    predecessor (alert thresholds in the literature: <0.1 stable,
    0.1-0.25 moderate, >0.25 shifted).

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i) over bin shares p (current)
    and q (baseline), with below/above-range mass as two extra
    pseudo-bins so out-of-domain drift is visible rather than silent.
    Empty bins are floored at ``epsilon`` share (standard smoothing —
    PSI is undefined at zero). Arithmetic is over the two rows' arrays
    only (never data-sized); the result is rounded to ``round_to``
    decimals so independent engines reproduce it bit-for-bit (ln ulp
    differences — same contract as BM25's idf rounding). Groups present
    on one side only are reported with NULL psi (nothing to compare —
    appearance/disappearance IS the drift signal; the mass columns
    carry it). ``n_baseline``/``n_current`` are each side's compared
    mass — the array totals (row counts for count sketches, weight
    sums for weighted ones)."""
    b = merge_histogram_sketches(baseline, group_cols, n_bins, hist_col)
    c = merge_histogram_sketches(current, group_cols, n_bins, hist_col)

    def shares(df, side):
        ext = F.concat(
            F.array(F.col("n_below")), F.col(hist_col), F.array(F.col("n_above"))
        )
        # Compared mass comes from the arrays themselves (below + bins
        # + above) rather than n - n_null: identical for count-mode
        # sketches, and the only correct denominator for weighted
        # sketches (where n is a row count but the tallies are weight
        # sums).
        mass = F.aggregate(
            ext, F.lit(0).cast("long"), lambda a, x: a + x
        )
        tot = mass.cast("double")
        return df.select(
            *group_cols,
            F.when(
                tot > 0,
                F.transform(
                    ext,
                    lambda x: F.greatest(
                        F.lit(float(epsilon)), x.cast("double") / tot
                    ),
                ),
            ).alias(f"__p_{side}"),
            mass.alias(f"n_{side}"),
        )

    bs, cs = shares(b, "baseline"), shares(c, "current")
    if group_cols:
        nb = bs.withColumnsRenamed({g: f"__gb_{g}" for g in group_cols})
        nc = cs.withColumnsRenamed({g: f"__gc_{g}" for g in group_cols})
        cond = None
        for g in group_cols:
            eq = F.col(f"__gb_{g}").eqNullSafe(F.col(f"__gc_{g}"))
            cond = eq if cond is None else (cond & eq)
        joined = nb.join(nc, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"__gb_{g}"), F.col(f"__gc_{g}")).alias(g)
                for g in group_cols
            ],
            "__p_baseline", "__p_current", "n_baseline", "n_current",
        )
    else:
        joined = bs.crossJoin(cs)
    psi = F.round(
        F.aggregate(
            F.zip_with(
                F.col("__p_current"),
                F.col("__p_baseline"),
                lambda p, q: (p - q) * F.log(p / q),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        round_to,
    )
    return joined.select(
        *group_cols,
        F.when(
            F.col("__p_baseline").isNotNull() & F.col("__p_current").isNotNull(),
            psi,
        ).alias("psi"),
        F.coalesce(F.col("n_baseline"), F.lit(0)).cast("long").alias("n_baseline"),
        F.coalesce(F.col("n_current"), F.lit(0)).cast("long").alias("n_current"),
    )


def _cms_bucket(value: Column, row: int, width: int, portable: bool) -> Column:
    """Counter index of ``value`` in depth-row ``row``: an independent
    hash per row via a row-distinct salt. Fast path: xxhash64 (JVM,
    engine-stable). Portable path: first 8 md5 hex chars, reproducible
    in any engine with md5 (the simhash/minhash portability pattern) —
    used when the sketch must be replayed by an external oracle."""
    if portable:
        h = F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit(f"cms{row}:"), value), "UTF-8")),
                1, 8,
            ),
            16, 10,
        ).cast("long")
    else:
        h = F.xxhash64(value, F.lit(row))
    return F.pmod(h, F.lit(width)).cast("int")


def frequency_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Count-min frequency sketch as a RELATIONAL store — the third
    member of the mergeable-store family (HLL = distinct counts,
    histogram = value distribution, count-min = per-item frequency):
    one row per (group_cols..., depth_row, bucket) with the summed hit
    count. A daily job stores depth x width counter rows per dimension
    — bounded state, independent of the item universe — and any later
    frequency question ("how often did THIS url/token/id appear last
    quarter") is answered from the stored rows via
    :func:`frequency_estimate`, never rescanning the facts.

    Shape: ONE map-side-combined aggregation (each input row
    contributes ``depth`` (row, bucket) keys via a narrow posexplode);
    output is at most groups x depth x width rows. Merging to a coarser
    grain is an integer sum (:func:`merge_frequency_sketches`) —
    exact, so roll-ups never change estimates computed afterwards.

    Estimates overcount only (classic count-min guarantee: collisions
    inflate, never deflate — min over ``depth`` independent rows bounds
    the inflation at ~2n/width with probability 1-2^-depth). NULL
    values are excluded (they have no identity to count; count NULLs
    with an ordinary conditional sum). ``width``/``depth``/``portable``
    are the store's identity — keep them constant for its lifetime.
    """
    if width <= 0 or depth <= 0:
        raise ValueError(f"need positive width/depth, got {width}x{depth}")
    v = F.col(value_col).cast("string")
    buckets = F.array(
        *[_cms_bucket(v, r, width, portable) for r in range(depth)]
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.posexplode(buckets).alias("depth_row", "bucket"))
        .groupBy(*group_cols, "depth_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def merge_frequency_sketches(
    sketches: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Roll stored count-min rows up to a coarser grain by integer sum
    — exact: the merged sketch is identical to a direct sketch of the
    union (same hashes ⇒ same buckets; counts add). Inputs must share
    the store's width/depth/portable identity."""
    return sketches.groupBy(*group_cols, "depth_row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def frequency_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str],
    values: Sequence[str],
    width: int = 1024,
    depth: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Estimated count of each probe value per group from a stored
    count-min sketch: (group_cols..., value, est_cnt). ``est_cnt`` is
    the min over the ``depth`` rows' counters (0 when a counter row is
    absent — an empty bucket was never written). The probe list is
    caller-provided and dimension-sized (decontamination probes, a
    stopword list, suspect hot keys) — it broadcasts; the sketch side
    is read with one pruned semi-joinable filter on (depth_row,
    bucket), never rescanned facts. Estimates never undercount; they
    equal the true count when the value's buckets are collision-free
    (asserted exactly in tests at test sizes).
    """
    if not values:
        schema_cols = ", ".join(f"`{g}` string" for g in group_cols)
        empty = f"{schema_cols}, value string, est_cnt long" if group_cols else (
            "value string, est_cnt long"
        )
        return sketch.sparkSession.createDataFrame([], empty)
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(v,) for v in values], "value string")
    probe = probe.select(
        "value",
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.col("value"), r, width, portable)
                    for r in range(depth)
                ]
            )
        ).alias("depth_row", "bucket"),
    )
    joined = sketch.join(
        F.broadcast(probe), ["depth_row", "bucket"], "right"
    ).select(
        *group_cols, "value", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    # a probe row missing from the sketch for SOME group but present
    # for others: the right join above only yields NULL groups when the
    # (depth_row, bucket) hit no group at all. Per-group mins therefore
    # need the group universe x probe grid; build it from the sketch's
    # distinct groups so absent counters read 0 for every real group.
    if group_cols:
        groups = sketch.select(*group_cols).distinct()
        grid = groups.crossJoin(
            F.broadcast(
                probe.select("value", "depth_row", "bucket").distinct()
            )
        )
        joined = grid.join(
            sketch, [*group_cols, "depth_row", "bucket"], "left"
        ).select(
            *group_cols, "value",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    return joined.groupBy(*group_cols, "value").agg(
        F.min("cnt").cast("long").alias("est_cnt")
    )


def topk_sketch(
    df: DataFrame,
    key_col: str,
    k: int,
    batch_col: str,
) -> DataFrame:
    """Mergeable top-k (heavy hitters) summary as relational rows —
    the fourth member of the store family (HLL = distinct, histogram =
    distribution, count-min = per-item frequency, this = WHICH items
    dominate).

    Per batch: exact counts → keep the k most frequent keys
    (deterministic tie-break on the key) with the (k+1)-th count
    SUBTRACTED from every kept counter — the Misra-Gries compression,
    which is what makes summaries mergeable with bounded error
    (Agarwal et al., "Mergeable Summaries", PODS 2012). Output one row
    per kept key: (batch, key, counter, decrement); ``counter`` is a
    LOWER bound on the batch count and ``counter + decrement`` an
    upper bound.

    Scale shape: the count aggregation is a map-side-combined groupBy;
    the per-batch rank is a window over each batch's DISTINCT keys
    (already aggregated — not the row stream). Batches are whatever
    unit arrives independently (a day, a file, a partition id derived
    from CONTENT so replays are deterministic); state per batch is k
    rows forever after.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = df.groupBy(batch_col, key_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(batch_col).orderBy(
        F.col("cnt").desc(), F.col(key_col)
    )
    ranked = counts.withColumn("rk", F.row_number().over(w))
    d_b = ranked.where(F.col("rk") == k + 1).select(
        F.col(batch_col), F.col("cnt").alias("__d")
    )
    return (
        ranked.where(F.col("rk") <= k)
        .join(d_b, batch_col, "left")
        .select(
            F.col(batch_col).alias("batch"),
            F.col(key_col).alias("key"),
            (F.col("cnt") - F.coalesce(F.col("__d"), F.lit(0)))
            .alias("counter"),
            F.coalesce(F.col("__d"), F.lit(0)).alias("decrement"),
        )
        .where(F.col("counter") > 0)
    )


def merge_topk_sketches(store: DataFrame, k: int) -> DataFrame:
    """Merge per-batch top-k summaries into one: counters sum by key,
    then the union is re-compressed to k rows (subtract the (k+1)-th
    summed counter, drop non-positive). Output: (key, est_min,
    max_err, rank) — the true total count of every emitted key lies in
    ``[est_min, est_min + max_err]``, where ``max_err`` accumulates
    every batch's decrement plus the merge's own.

    The candidate set entering the merge is at most (batches x k) rows
    — bounded by construction — so the final rank runs on a small
    frame, not the corpus.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    summed = store.groupBy("key").agg(F.sum("counter").alias("est"))
    total_d = store.select("batch", "decrement").distinct().agg(
        F.coalesce(F.sum("decrement"), F.lit(0)).alias("d_batches")
    )
    w = Window.orderBy(F.col("est").desc(), F.col("key"))
    ranked = summed.withColumn("rk", F.row_number().over(w))
    d2 = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == k + 1, F.col("est"))), F.lit(0)
        ).alias("__d2")
    )
    return (
        ranked.where(F.col("rk") <= k)
        .crossJoin(F.broadcast(total_d))
        .crossJoin(F.broadcast(d2))
        .select(
            "key",
            (F.col("est") - F.col("__d2")).alias("est_min"),
            (F.col("d_batches") + F.col("__d2")).alias("max_err"),
            F.col("rk").alias("rank"),
        )
        .where(F.col("est_min") > 0)
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
    weight_col: str | None = None,
) -> DataFrame:
    """Reduce each group to a DDSketch — the mergeable RELATIVE-error
    quantile store (Masson, Rim & Lee, "DDSketch: a fast and fully-
    mergeable quantile sketch with relative-error guarantees",
    VLDB 2019) — as long-form rows ``(group_cols..., side, bucket,
    cnt)``.

    Where :func:`histogram_sketch` needs a fixed ``[lo, hi)`` domain
    chosen up front (quantile error = one absolute bin width), DDSketch
    buckets on a LOG grid: value x > 0 lands in bucket
    ``ceil(log_γ(x))`` with ``γ = (1+α)/(1−α)``, so any quantile read
    back from the store is within relative error ``α`` of the true
    value at any magnitude — the right contract for long-tailed
    positives (latencies, token counts, prices). ``side`` is the sign
    (+1/-1 mirrored log buckets, 0 for exact zeros); NULL/NaN rows are
    dropped (they have no order position). The bucket count is bounded
    by the DATA RANGE, not the data size: log_γ(max/min) ≈ 1000 rows
    per side at α=1% across nine decades — no collapse step needed at
    any realistic span, which keeps the store exactly mergeable.

    Merging (:func:`merge_quantile_sketches`) is a key-wise integer
    sum — merged stores are BIT-IDENTICAL to the store of the union
    (no estimator variance), so daily rows roll up to any window
    without rescanning facts, the same contract as every other store
    in this module. One map-side-combined groupBy; all expressions
    native.

    Cross-engine note: the bucket index rounds the log ratio to 12
    decimals before ``ceil`` so both Spark (java.lang.Math.log) and a
    replaying SQL engine (libm log) — each correctly rounded to ≤1 ulp
    but not bit-identical — agree on every bucket unless a value sits
    within ~1e-12 of a bucket edge (the same float-stability
    convention as ``histogram_quantiles``'s round-to-9).

    ``weight_col``: non-negative integral row weights, validated on
    the raw column (shared guard with :func:`histogram_sketch`).
    """
    import math

    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    v = F.col(value_col).cast("double")
    wt = _validated_weight(weight_col, "quantile_sketch")
    side = (
        F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    )
    bucket = F.when(v == 0, F.lit(0)).otherwise(
        F.ceil(F.round(F.log(F.abs(v)) / F.lit(math.log(gamma)), 12))
    )
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(
            *group_cols,
            side.cast("int").alias("side"),
            bucket.cast("int").alias("bucket"),
        )
        .agg(F.sum(wt).cast("long").alias("cnt"))
        .where(F.col("cnt") > 0)
    )


def merge_quantile_sketches(
    store: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Roll stored DDSketch rows up to a coarser grain by key-wise
    integer sum — exact: the merged store equals the store of the
    union bit for bit (asserted in tests). Inputs must share ``alpha``
    (the log base IS the bucket grid — keep it with the store; rows
    bucketed at different α must never be merged). Pass
    ``group_cols=[]`` for a global roll-up."""
    return (
        store.groupBy(*group_cols, "side", "bucket")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("cnt"))
        .where(F.col("cnt") > 0)
    )


def quantile_sketch_values(
    store: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    alpha: float,
) -> DataFrame:
    """Read quantiles back from a DDSketch store:
    ``(group_cols..., q, value)`` — each within relative error ``α``
    of the true quantile of the sketched data (the DDSketch
    guarantee; asserted against exact quantiles in tests).

    Bucket i on side s estimates its members as ``s·2γ^i/(γ+1)`` (the
    log-bucket midpoint in relative terms); ordering is ``(side,
    side·bucket)`` ascending — most-negative first, zeros, then
    positives. Plan shape: a per-group running sum over the store rows
    (store size is range-bounded, never data-sized), one broadcast of
    the requested quantiles, one min_by per (group, q). Empty groups
    return no rows; ``q`` outside the mass (can't happen for q in
    [0,1] with cnt ≥ 1) is clamped by the covering-bucket rule.
    """
    import math

    from pyspark.sql import Window

    for q in quantiles:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile out of [0,1]: {q}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    order = F.col("side").cast("long") * F.col("bucket").cast("long")
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy("side", order.alias("__ord"))
    wall = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = store.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__mass", F.sum("cnt").over(wall)
    )
    qdf = store.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "__target",
        F.greatest(F.lit(1.0), F.col("q") * F.col("__mass").cast("double")),
    )
    est = (
        F.col("side").cast("double")
        * F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("bucket").cast("double"))
        / F.lit(gamma + 1.0)
    )
    value = F.when(F.col("side") == 0, F.lit(0.0)).otherwise(est)
    return (
        joined.where(F.col("__cum") >= F.col("__target"))
        .groupBy(*group_cols, "q")
        .agg(
            F.min_by(
                value, F.struct(F.col("side"), order.alias("__o"))
            ).alias("value")
        )
    )


def quantile_sketch_drift(
    baseline: DataFrame,
    current: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1e-4,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between two DDSketch stores sharing
    one ``alpha``: ``(group_cols..., psi, n_baseline, n_current)`` —
    :func:`histogram_drift`'s contract on the RELATIVE-error store
    (log buckets adapt to the data, so long-tailed positives drift-
    check without choosing a domain up front; a mass shift into
    never-before-seen magnitudes shows up as new buckets rather than
    clamped edge mass).

    The support is the UNION of the two sides' (side, bucket) keys per
    group; a bucket absent on one side takes the ``epsilon`` share
    floor (standard PSI smoothing). Per-group terms are summed over a
    SORTED in-row array — bucket counts are range-bounded, never
    data-sized — so the float sum has one fixed order and independent
    engines (and re-runs under different partitionings) reproduce the
    rounded result exactly. Groups present on one side only report
    NULL psi (appearance IS the signal; the mass columns carry it).
    """
    b = merge_quantile_sketches(baseline, group_cols)
    c = merge_quantile_sketches(current, group_cols)

    def prepped(df, side_name):
        tot = (
            df.groupBy(*group_cols)
            .agg(F.sum("cnt").cast("long").alias(f"n_{side_name}"))
        )
        return df, tot

    b, bt = prepped(b, "baseline")
    c, ct = prepped(c, "current")

    bkeyed = b.select(
        *[F.col(g).alias(f"__gb_{g}") for g in group_cols],
        F.col("side").alias("__sb"),
        F.col("bucket").alias("__bb"),
        F.col("cnt").alias("__cb"),
    )
    ckeyed = c.select(
        *[F.col(g).alias(f"__gc_{g}") for g in group_cols],
        F.col("side").alias("__sc"),
        F.col("bucket").alias("__bc"),
        F.col("cnt").alias("__cc"),
    )
    cond = (F.col("__sb") == F.col("__sc")) & (F.col("__bb") == F.col("__bc"))
    for g in group_cols:
        cond = cond & F.col(f"__gb_{g}").eqNullSafe(F.col(f"__gc_{g}"))
    joined = bkeyed.join(ckeyed, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__gb_{g}"), F.col(f"__gc_{g}")).alias(g)
            for g in group_cols
        ],
        F.coalesce(F.col("__sb"), F.col("__sc")).alias("__side"),
        F.coalesce(F.col("__bb"), F.col("__bc")).alias("__bucket"),
        F.coalesce(F.col("__cb"), F.lit(0)).cast("long").alias("__cb2"),
        F.coalesce(F.col("__cc"), F.lit(0)).cast("long").alias("__cc2"),
    )

    def attach(df, tot, names):
        t = tot.select(
            *[F.col(g).alias(f"__tg_{g}") for g in group_cols],
            *names,
        )
        jc = F.lit(True)
        for g in group_cols:
            jc = jc & F.col(g).eqNullSafe(F.col(f"__tg_{g}"))
        return df.join(F.broadcast(t), jc, "left").drop(
            *[f"__tg_{g}" for g in group_cols]
        )

    joined = attach(joined, bt, ["n_baseline"])
    joined = attach(joined, ct, ["n_current"])

    q = F.greatest(
        F.lit(float(epsilon)),
        F.col("__cb2").cast("double") / F.col("n_baseline").cast("double"),
    )
    p = F.greatest(
        F.lit(float(epsilon)),
        F.col("__cc2").cast("double") / F.col("n_current").cast("double"),
    )
    term = F.struct(
        F.col("__side"), F.col("__bucket"), ((p - q) * F.log(p / q)).alias("t")
    )
    agg = joined.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(term)).alias("__terms"),
        F.max("n_baseline").alias("n_baseline"),
        F.max("n_current").alias("n_current"),
    )
    psi = F.round(
        F.aggregate(
            F.col("__terms"), F.lit(0.0), lambda a, x: a + x["t"]
        ),
        round_to,
    )
    return agg.select(
        *group_cols,
        F.when(
            F.col("n_baseline").isNotNull() & F.col("n_current").isNotNull(),
            psi,
        ).alias("psi"),
        F.coalesce(F.col("n_baseline"), F.lit(0)).cast("long").alias("n_baseline"),
        F.coalesce(F.col("n_current"), F.lit(0)).cast("long").alias("n_current"),
    )
