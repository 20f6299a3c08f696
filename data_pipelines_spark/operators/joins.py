"""Join operators beyond plain equi-joins.

- :func:`asof_join` — merge-asof ("latest right row at or before the
  left timestamp, per key"). The reference's nearest-grid alignment
  (J6, `utils/flood/filter_by_upstream.py:63-67`) is the 2-D spatial
  cousin of this 1-D temporal operator; both reduce to deterministic
  single-shuffle plans.
- :func:`interval_join` — point-in-interval (range) join via bin
  bucketing, for the case where BOTH sides are large and there is no
  equi key: Spark's native plan for ``p BETWEEN s AND e`` is a
  nested-loop join (broadcast if one side is small, cartesian
  otherwise), which is quadratic. Binning turns it into an equi
  shuffle join at the cost of replicating each interval once per
  covered bin.

Scale notes: the classic formulations of as-of are a range join (O(n·m)
explosion) or a per-key collect; this implementation is the
union-and-window form — one shuffle on the key, one local sort, linear
state — which survives arbitrarily large inputs and skewed keys (AQE
splits skewed partitions; the window itself is streaming-evaluated).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the latest right
    row with ``right_ts <= left_ts`` (direction='backward'; 'forward'
    gives the earliest right row at-or-after).

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (nondeterministic ties are the caller's bug, not silently resolved).

    NULL timestamps match nothing (merge-asof semantics): NULL-ts right
    rows are dropped — under the windows below, NULLS FIRST ordering
    would otherwise leak such a row's value to every left row EARLIER
    than any real right row — and a NULL-ts left row comes back with
    NULL value columns (both orderings place it before every right
    row). NULL KEYS match nothing either (SQL equi-join and pandas
    merge_asof agree): NULL-key right rows are dropped — the window
    partitioning would otherwise pool them with NULL-key LEFT rows and
    hand those rows a value no equi join would produce — and a
    NULL-key left row comes back with NULL value columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    marker = F.lit(1)
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", marker)
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    right_ok = F.col(right_ts).isNotNull()
    for k in key_cols:
        right_ok = right_ok & F.col(k).isNotNull()
    r_tagged = (
        right.where(right_ok)
        .select(
            *key_cols, F.col(right_ts).alias("__ts"), *value_cols
        ).withColumn("__is_left", F.lit(0))
    )
    left_cols = [c for c in left.columns]
    merged = l_tagged.select(
        *left_cols, *value_cols, "__ts", "__is_left"
    ).unionByName(
        r_tagged.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c not in key_cols
                else F.col(c)
                for c in left_cols
            ],
            *value_cols,
            "__ts",
            "__is_left",
        )
    )

    if direction == "backward":
        # Rights sort before lefts at equal ts so "at or before" includes
        # the equal-timestamp right row.
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # desc_nulls_first so a NULL-ts LEFT row precedes every right
        # row (sees nothing → NULL), mirroring asc's nulls-first in the
        # backward direction.
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.desc_nulls_first("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = merged.select(
        *left_cols,
        "__is_left",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")


def _to_number(df: DataFrame, col: str) -> Column:
    """Numeric view of a point/bound column for binning only — the join
    predicate itself compares the ORIGINAL values, so the cast's
    precision only has to be good enough to land each value in the
    right bin (epoch seconds for timestamps: exact; a value at x.9 s
    and a bound at x.1 s share bin floor(x/w) regardless).

    Dates and timestamps map into the SAME domain (epoch seconds) so a
    timestamp point can bin against date-typed interval bounds — in
    day units a date-side bin would sit ~86400x away from the point's
    second-unit bin and every true pair would silently miss its
    rendezvous (the exact predicate itself coerces date↔timestamp
    fine; only the binning needs the shared unit)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        # Integer epoch seconds. The cast truncates toward zero (not
        # floor) for pre-1970 instants, but any MONOTONE map keeps
        # s <= p <= e ordered in the image, which is all binning needs.
        return F.col(col).cast("long")
    if isinstance(dt, T.DateType):
        return (
            F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
            * F.lit(86400).cast("long")
        )
    return F.col(col)


def _bin_domain(df: DataFrame, col: str) -> str:
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType | T.TimestampNTZType | T.DateType):
        return "temporal"
    return "numeric"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    key_cols: Sequence[str] = (),
    how: str = "inner",
    closed: str = "both",
    max_bins_per_interval: int | None = 4096,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_col, end_col]`` range contains ``point_col`` (plus optional
    equi ``key_cols``), without a nested-loop plan.

    ``closed='both'`` matches SQL ``BETWEEN`` (s <= p <= e);
    ``closed='left'`` gives the half-open s <= p < e that tumbling
    windows use. ``how`` is ``inner`` | ``left`` | ``left_semi``
    (semi returns point rows that fall in at least one interval,
    deduplicated by the join itself).

    ``bin_width`` is in the column domain's units: SECONDS for any
    temporal columns (dates bin as midnight epoch seconds, so
    timestamp points join date-bounded intervals correctly), plain
    value units for numeric columns; mixing temporal and numeric
    domains raises (their bins could never align).

    Plan shape: points get one bin key ``floor(p / bin_width)``;
    intervals explode to one row per covered bin (``sequence`` over
    [floor(s/w), floor(e/w)]); the join is then a plain equi shuffle
    join on (bin, *key_cols) with the exact range predicate as a
    post-filter. Each true (point, interval) pair meets in EXACTLY one
    bin — the point's own — so inner/left multiplicities are correct
    with no distinct pass.

    At 100 TB: shuffle volume is |points| + |intervals| x bins-per-
    interval; pick ``bin_width`` near the typical interval span so the
    replication factor stays O(1). A runaway interval (one spanning the
    whole timeline) would silently explode to millions of rows —
    ``max_bins_per_interval`` turns that into a loud executor-side
    error instead (None disables). Hot bins (a time range everyone
    touches) are ordinary shuffle skew: AQE's skew-join splitting
    applies because the join is a vanilla SortMergeJoin/SHJ after the
    rewrite. Invalid intervals (NULL bounds or end < start) match
    nothing under SQL semantics and are dropped before the explode.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"unknown how: {how}")
    if closed not in ("both", "left"):
        raise ValueError(f"unknown closed: {closed}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns) - set(key_cols)
    if how != "left_semi" and overlap:
        raise ValueError(
            f"ambiguous output columns {sorted(overlap)}: rename one side "
            "(key_cols are exempt — they are coalesced by the equi join)"
        )
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError("'__bin' is reserved by interval_join; rename it")
    domains = {
        _bin_domain(points, point_col),
        _bin_domain(intervals, start_col),
        _bin_domain(intervals, end_col),
    }
    if len(domains) > 1:
        raise ValueError(
            "interval_join point and bound columns mix temporal and "
            "numeric types; cast them to one domain (bins would never "
            "align across domains)"
        )

    w = F.lit(int(bin_width)).cast("long")
    lo = F.floor(_to_number(intervals, start_col) / w).cast("long")
    hi = F.floor(_to_number(intervals, end_col) / w).cast("long")
    bins = F.sequence(lo, hi)
    if max_bins_per_interval is not None:
        bins = F.when(
            hi - lo < F.lit(int(max_bins_per_interval)), bins
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: interval covers more than "
                        f"{max_bins_per_interval} bins of width {bin_width} "
                        "(start="
                    ),
                    F.col(start_col).cast("string"),
                    F.lit(", end="),
                    F.col(end_col).cast("string"),
                    F.lit("); widen bin_width or raise max_bins_per_interval"),
                )
            ).cast("array<long>")
        )
    ivals = (
        intervals.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) >= F.col(start_col))
        )
        .withColumn("__bin", F.explode(bins))
        .alias("__i")
    )
    pts = points.withColumn(
        "__bin", F.floor(_to_number(points, point_col) / w).cast("long")
    ).alias("__p")

    upper = (
        F.col(f"__p.{point_col}") <= F.col(f"__i.{end_col}")
        if closed == "both"
        else F.col(f"__p.{point_col}") < F.col(f"__i.{end_col}")
    )
    cond = (
        (F.col("__p.__bin") == F.col("__i.__bin"))
        & (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
        & upper
    )
    for k in key_cols:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))

    if how == "left_semi":
        return pts.join(ivals, cond, "left_semi").drop("__bin")
    joined = pts.join(ivals, cond, how)
    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}") for c in intervals.columns if c not in key_cols
    ]
    return joined.select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bin_width: int,
    key_cols: Sequence[str] = (),
    how: str = "inner",
    closed: str = "both",
    left_id_col: str | None = None,
    max_bins_per_interval: int | None = 4096,
) -> DataFrame:
    """Join interval rows to interval rows that OVERLAP them (sessions ×
    outages, forecasts × observation windows) — the range×range sibling
    of :func:`interval_join`, again without a nested-loop plan.

    ``closed='both'`` treats intervals as closed (touching endpoints
    overlap: ``ls <= re AND rs <= le``); ``closed='left'`` as half-open
    ``[s, e)`` (touching does not overlap: ``ls < re AND rs < le`` —
    the tumbling-window convention). ``bin_width`` follows
    :func:`interval_join`'s domain rules (seconds for temporal bounds,
    value units for numeric; mixing domains raises).

    Plan shape: BOTH sides explode to one row per covered bin and meet
    in a plain equi shuffle join on (bin, *key_cols) with the exact
    overlap predicate as a post-filter. An overlapping pair shares every
    bin the overlap spans — the join additionally requires the met bin
    to be the OVERLAP START's bin (``floor(max(ls, rs) / w)``), which
    both sides provably cover, so each true pair is emitted EXACTLY
    once with no distinct pass.

    ``how='inner'`` returns the pairs; ``how='left_semi'`` returns left
    rows having at least one overlap — implemented as a semi join of
    the ORIGINAL left frame against the matched ``left_id_col`` values
    (required for semi; the exploded replicas can't be deduplicated
    without an identity), preserving the left frame's own multiplicity.

    Invalid intervals (NULL bounds, end < start) match nothing and are
    dropped from BOTH sides before the explode, per SQL comparison
    semantics. Runaway intervals trip ``max_bins_per_interval``
    loudly (on either side) instead of silently exploding the shuffle.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unknown how: {how}")
    if closed not in ("both", "left"):
        raise ValueError(f"unknown closed: {closed}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how == "left_semi" and left_id_col is None:
        raise ValueError("left_semi needs left_id_col to identify left rows")
    ls, le = left_bounds
    rs, re_ = right_bounds
    overlap_cols = set(left.columns) & set(right.columns) - set(key_cols)
    if how == "inner" and overlap_cols:
        raise ValueError(
            f"ambiguous output columns {sorted(overlap_cols)}: rename one "
            "side (key_cols are exempt)"
        )
    reserved = {"__bin", "__s"}
    if reserved & set(left.columns) or reserved & set(right.columns):
        raise ValueError("'__bin'/'__s' are reserved by interval_overlap_join")
    domains = {
        _bin_domain(left, ls), _bin_domain(left, le),
        _bin_domain(right, rs), _bin_domain(right, re_),
    }
    if len(domains) > 1:
        raise ValueError(
            "interval_overlap_join bounds mix temporal and numeric types; "
            "cast them to one domain (bins would never align)"
        )

    w = F.lit(int(bin_width)).cast("long")

    def exploded(df: DataFrame, s: str, e: str, side: str) -> DataFrame:
        lo = F.floor(_to_number(df, s) / w).cast("long")
        hi = F.floor(_to_number(df, e) / w).cast("long")
        bins = F.sequence(lo, hi)
        if max_bins_per_interval is not None:
            bins = F.when(
                hi - lo < F.lit(int(max_bins_per_interval)), bins
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"interval_overlap_join: {side} interval covers "
                            f"more than {max_bins_per_interval} bins of "
                            f"width {bin_width} (start="
                        ),
                        F.col(s).cast("string"),
                        F.lit(", end="),
                        F.col(e).cast("string"),
                        F.lit("); widen bin_width or raise the cap"),
                    )
                ).cast("array<long>")
            )
        return (
            df.where(
                F.col(s).isNotNull()
                & F.col(e).isNotNull()
                & (F.col(e) >= F.col(s))
            )
            .withColumn("__s", _to_number(df, s))
            .withColumn("__bin", F.explode(bins))
        )

    l = exploded(left, ls, le, "left").alias("__l")
    r = exploded(right, rs, re_, "right").alias("__r")

    if closed == "both":
        pred = (F.col(f"__l.{ls}") <= F.col(f"__r.{re_}")) & (
            F.col(f"__r.{rs}") <= F.col(f"__l.{le}")
        )
    else:
        pred = (F.col(f"__l.{ls}") < F.col(f"__r.{re_}")) & (
            F.col(f"__r.{rs}") < F.col(f"__l.{le}")
        )
    start_bin = F.floor(
        F.greatest(F.col("__l.__s"), F.col("__r.__s")) / w
    ).cast("long")
    cond = (
        (F.col("__l.__bin") == F.col("__r.__bin"))
        & (F.col("__l.__bin") == start_bin)
        & pred
    )
    for k in key_cols:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))

    pairs = l.join(r, cond, "inner")
    if how == "left_semi":
        matched = pairs.select(
            F.col(f"__l.{left_id_col}").alias("__mid")
        ).distinct()
        return left.join(
            matched, F.col(left_id_col) == F.col("__mid"), "left_semi"
        )
    out_cols = [F.col(f"__l.{c}") for c in left.columns] + [
        F.col(f"__r.{c}") for c in right.columns if c not in key_cols
    ]
    return pairs.select(*out_cols)
