"""Bloom-filter pre-filtering for semi/anti joins whose build side is
too large to broadcast exactly.

The decontamination/blocklist shape (`operators/corpus.py:
contamination_check`, `functions/web.py:filter_blocked_domains`)
broadcasts the build side's distinct keys — right up to the point
where a benchmark suite or URL blocklist has billions of keys and the
exact broadcast stops fitting. The classic scale answer is a Bloom
filter: a bit array such that "bit not set" proves absence, so the
probe side can discard definite-misses locally and only the small
might-contain remainder pays the exact (shuffle) join. False positives
are harmless — the exact join re-checks them — so the END RESULT IS
EXACTLY the plain semi/anti join, at a fraction of the shuffle volume.

Everything here is native Spark SQL (xxhash64 → bit positions, bit_or
aggregation into 64-bit words, map lookup + forall on probe) — no
Python in the hot path, and the sketch is recomputation-deterministic
(content-derived hashes, order-insensitive bit_or), so task retries
rebuild identical bits.

Sizing: ``num_bits = -n·ln(fpp)/ln²2`` bits for ``n`` keys — ~1.2 GB
of words at n=1e9/fpp=1%, which exceeds what a single broadcast row
should carry; the practical envelope for THIS implementation is
n ≲ 1e8 (~120 MB). Past that, shard the build side and intersect
verdicts, or lean on AQE's runtime bloom pruning
(spark.sql.optimizer.runtime.bloomFilter.enabled) for plain joins.

Spark itself injects runtime bloom filters under AQE for *inner/semi
join pruning* it can see through; this module is for the cases it
can't: explicit anti joins (decontamination), pre-aggregated probe
columns, and reusing one sketch across several queries.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_type(dt: T.DataType) -> T.DataType | None:
    """Canonical type whose xxhash64 is value-stable within the family.

    ``xxhash64`` hashes the PHYSICAL representation, so INT 5 and
    BIGINT 5 produce different hashes — a silent all-false-negative
    filter if the two sides of a join type their key differently (the
    plain join would just coerce). Integral types canonicalize to
    long and float to double (value-preserving widenings); other
    families must match exactly."""
    if isinstance(
        dt, T.ByteType | T.ShortType | T.IntegerType | T.LongType
    ):
        return T.LongType()
    if isinstance(dt, T.FloatType | T.DoubleType):
        return T.DoubleType()
    return None


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``expected_items`` keys at
    false-positive rate ``fpp``; num_bits is rounded up to a multiple
    of 64 (whole words)."""
    if expected_items <= 0:
        expected_items = 1
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    # Cap k: for degenerate tiny builds the word-rounding inflates m,
    # and the "optimal" m/n·ln2 would demand dozens of probe hashes for
    # no real fpp gain (16 hashes already drive fpp below any target
    # this sizing produces).
    k = min(16, max(1, round(m / expected_items * math.log(2))))
    return m, k


def _positions(col: Column, num_bits: int, num_hashes: int, seed: int) -> Column:
    """array<long> of ``num_hashes`` bit positions in [0, num_bits) —
    xxhash64 of (value, hash-index) so the k hashes are independent and
    content-derived (retry-stable)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def _bit(pos: Column) -> Column:
    # shiftleft with a COLUMN shift amount (the PySpark wrapper only
    # takes a literal, the SQL function takes any int expression)
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int,
    seed: int = 42,
) -> DataFrame:
    """Aggregate ``df[col]`` into a Bloom filter as (word_idx int,
    bits long) rows — at most ``num_bits/64`` rows regardless of input
    size, and typically far fewer while the filter is sparse.

    One pass over the build side: k positions per key (array, no
    shuffle), explode, bit_or-aggregate per 64-bit word. Partial
    aggregation collapses repeats map-side, so the shuffle carries at
    most num_bits/64 rows per task. NULL keys are skipped (they can
    never equi-match, mirroring SQL join semantics).
    """
    ex = df.where(F.col(col).isNotNull()).select(
        F.explode(_positions(F.col(col), num_bits, num_hashes, seed)).alias(
            "__pos"
        )
    )
    return (
        ex.select(
            (F.col("__pos") / 64).cast("int").alias("word_idx"),
            _bit(F.col("__pos")).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def with_bloom_contains(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    seed: int = 42,
    out_col: str = "might_contain",
) -> DataFrame:
    """Annotate ``df`` with a boolean: false ⇒ ``col`` is DEFINITELY
    not in the set the Bloom filter was built from; true ⇒ maybe.

    The word table is packed into ONE row holding a word_idx→bits map
    and broadcast; the probe is then a narrow map lookup + forall over
    the k positions, entirely inside codegen. NULL probe values get
    false (a NULL never equi-matches anything). Missing map entries
    read as all-zero words, so a filter built from an EMPTY set says
    false for everything. ``num_bits``/``num_hashes``/``seed`` must
    match the build call — a mismatch silently degrades to garbage
    verdicts, so keep them paired (bloom_filter_join does).
    """
    packed = bloom.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("__bloom")
    )
    pos = _positions(F.col(col), num_bits, num_hashes, seed)
    hit = F.when(F.col(col).isNull(), F.lit(False)).otherwise(
        F.forall(
            pos,
            lambda p: (
                F.coalesce(
                    F.element_at(F.col("__bloom"), (p / 64).cast("int")),
                    F.lit(0).cast("long"),
                ).bitwiseAND(_bit(p))
                != 0
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn(out_col, hit)
        .drop("__bloom")
    )


def bloom_filter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str | None = None,
    how: str = "left_semi",
    fpp: float = 0.01,
    expected_items: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Exact semi/anti join of ``probe`` against ``build``'s keys with a
    Bloom pre-filter: result is IDENTICAL to
    ``probe.join(build_keys, on, how)``, but only might-contain probe
    rows ever reach the exact join.

    - ``left_semi``: might-contain rows are re-verified by an exact
      semi join (false positives die there).
    - ``left_anti``: definite-miss rows pass immediately (no false
      negatives, so this is safe); might-contain rows go through an
      exact anti join and the survivors are unioned back.

    ``expected_items`` sizes the filter; when omitted, an eager
    count() of the build keys runs first (one cheap aggregate job —
    pass the estimate at 100 TB to keep the plan fully lazy). The
    shuffle the exact join pays is |matches| + fpp·|probe| rows
    instead of |probe|, and the build side's keys are shuffled, not
    broadcast — the regime where the exact broadcast no longer fits.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"unknown how: {how}")
    reserved = {"__bf_key", "__bf_might", "__bf_probe"} & set(probe.columns)
    if reserved:
        raise ValueError(
            f"{sorted(reserved)} are reserved by bloom_filter_join; rename"
        )
    build_col = build_col or probe_col

    # xxhash64 is type-sensitive: INT 5 and BIGINT 5 hash differently,
    # and a sketch built on one and probed with the other reports every
    # key as a definite miss — silently WRONG results where the plain
    # join would simply coerce. Mismatched key types hash through a
    # value-preserving canonical widening (integral→long, float→double)
    # on BOTH sides; family-crossing mismatches fail loudly.
    p_dt = probe.schema[probe_col].dataType
    b_dt = build.schema[build_col].dataType
    canon = None
    if p_dt != b_dt:
        pc, bc = _hash_type(p_dt), _hash_type(b_dt)
        if pc is None or pc != bc:
            raise ValueError(
                f"bloom_filter_join key types differ ({p_dt.simpleString()} "
                f"vs {b_dt.simpleString()}) and are not both integral or "
                "both floating-point; cast one side explicitly"
            )
        canon = pc

    bkey = F.col(build_col).cast(canon) if canon else F.col(build_col)
    keys = build.select(bkey.alias("__bf_key")).where(
        F.col("__bf_key").isNotNull()
    )
    n = expected_items if expected_items is not None else keys.count()
    num_bits, num_hashes = bloom_params(n, fpp)
    words = bloom_build(keys, "__bf_key", num_bits, num_hashes, seed)
    if canon:
        probe_hash_col = "__bf_probe"
        probe_in = probe.withColumn(
            probe_hash_col, F.col(probe_col).cast(canon)
        )
    else:
        probe_hash_col = probe_col
        probe_in = probe
    probed = with_bloom_contains(
        probe_in, probe_hash_col, words, num_bits, num_hashes, seed, "__bf_might"
    )
    # The exact join compares the ORIGINAL probe values (Spark coerces
    # the comparison the same way the canonical cast does).
    cond = F.col(probe_col) == F.col("__bf_key")
    drop_cols = ["__bf_might"] + (["__bf_probe"] if canon else [])
    if how == "left_semi":
        return (
            probed.where(F.col("__bf_might"))
            .drop(*drop_cols)
            .join(keys, cond, "left_semi")
        )
    definite = probed.where(~F.col("__bf_might")).drop(*drop_cols)
    survivors = (
        probed.where(F.col("__bf_might"))
        .drop(*drop_cols)
        .join(keys, cond, "left_anti")
    )
    return definite.unionByName(survivors)
