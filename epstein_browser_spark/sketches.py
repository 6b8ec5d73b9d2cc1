"""Bounded-summary operators: sketches and frontiers.

The missing warehouse family after r5's relational/graph/text close-out:
probabilistic summaries whose STATE is bounded regardless of input size
(HyperLogLog distinct counting, count-min frequency estimation, Bloom
membership) plus the 2-D Pareto frontier (skyline). All four kernels are
engine-portable by construction — every hash is the repo's canonical
md5-hex-prefix integer draw (`conv(substring(md5(x),1,n),16,10)`, the
ordering.shard_shuffle / textstats contract), every register update is
integer arithmetic, and the single float each sketch emits is derived
from exact integers in one correctly-rounded IEEE expression — so each
operator carries a full DuckDB value oracle (q144–q147).

Scale design (the reason these exist at 100 TB):

- ``hll_distinct``: per-group distinct counts without the
  `count(distinct)` re-shuffle of raw values — state is m=2^p registers
  per group, built by a partial-aggregable ``max`` (registers merge by
  pointwise max, exactly how a 1000-executor map-side combine wants it).
- ``cms_sketch``: frequency estimates for point lookups from a
  depth×width integer grid — the full-vocabulary shuffle of an exact
  census collapses to depth·width counters, again pure partial-agg
  ``sum``.
- ``bloom_positions``: a broadcastable set-membership prefilter — the
  dim side becomes ≤ k·|dim| distinct bit positions (≤ m total), so the
  fact table is gated by a broadcast semi-join instead of a corpus-wide
  shuffle on the join key.
- ``skyline_2d``: grid-pruned Pareto frontier — per-bin maxima (one
  partial agg) + a driver-side suffix-max over ≤ n_bins scalars prune
  every point dominated from a strictly-higher bin; the exact dominance
  check then runs only among same-bin survivors via an EQUI-join on the
  bin (AQE-splittable), never an all-pairs product.

Reference scope note: the reference app (actuallyrizzn/epstein-browser)
has no sketch surface — these are the beyond-reference training-pipeline
operators the build brief mandates, value-oracled like the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "md5_int",
    "hll_register_cols",
    "hll_census",
    "hll_merge_registers",
    "hll_distinct",
    "cms_sketch",
    "cms_estimate",
    "cms_merge",
    "bloom_positions",
    "skyline_2d",
]


def md5_int(expr: Column, ndigits: int) -> Column:
    """Canonical engine-portable integer draw: the first ``ndigits`` hex
    digits of md5 as a BIGINT (matches queries' `_md5_int_sql` DuckDB
    restatement). ONE definition for every consumer (HLL/CMS/Bloom here,
    the q150 fingerprint) so the Spark side cannot drift from the SQL
    oracles digit-count by digit-count."""
    return F.conv(F.substring(F.md5(expr), 1, ndigits), 16, 10).cast("long")


_md5_int = md5_int  # internal alias, kept for the kernels below


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_TAIL_BITS = 32  # rank domain: rho in [1, 33]
_TAIL_MOD = 1 << HLL_TAIL_BITS
# alpha_m * m^2 * 2^33 for m=256 — ONE double literal computed once, so
# the estimate is a single IEEE division of engine-identical operands.
HLL_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(
    1 << (HLL_TAIL_BITS + 1)
)


def hll_register_cols(value: Column, seed: str = "hll0"):
    """The HLL register draw as reusable columns: (register index, rho).
    The 40-bit md5 draw splits into an 8-bit register index and a 32-bit
    tail; rho = leading-zero count of the tail + 1 computed EXACTLY as
    ``33 - length(bin(tail))`` (both engines print minimal binary).
    Shared by the batch census (hll_distinct) and the streaming register
    table (streaming.hll_user_registers_stream) so the two surfaces
    cannot drift."""
    h = _md5_int(F.concat_ws(":", F.lit(seed), value.cast("string")), 10)
    reg = (
        h.bitwiseAND(F.lit((HLL_M - 1) * _TAIL_MOD)) / F.lit(_TAIL_MOD)
    ).cast("long")  # top 8 bits, exact: the masked value / 2^32
    tail = h % _TAIL_MOD
    rho = F.when(tail == 0, F.lit(HLL_TAIL_BITS + 1)).otherwise(
        F.lit(HLL_TAIL_BITS + 1) - F.length(F.bin(tail))
    )
    return reg, rho


def hll_census(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table (group_cols + ``reg`` + ``m`` = max rho)
    into the per-group census: (n_regs_hit, sum_scaled, hll_est). The
    harmonic-mean denominator ``sum(2^-M_j)`` is emitted as the EXACT
    integer ``sum_scaled = sum(2^(33-M_j))`` (each term a power of two
    ≤ 2^33; 256 terms need ≤ 41 mantissa bits, so even its double image
    is exact); empty registers contribute 2^33 each; hll_est is the one
    correctly-rounded IEEE division HLL_ALPHA_NUM / sum_scaled. A
    ≤ 256-rows-per-group fold — cheap enough to run at every read of a
    persisted or streamed register table.

    Duplicate (group, reg) rows — the shape a union-max MERGE of two
    register tables produces (two stream runs, stream + batch backfill,
    re-appended sink output) — are folded by max first, so merging is
    literally ``hll_census(a.unionByName(b), cols)``; without the
    pre-fold a duplicated register would double-count n_regs_hit and
    the harmonic sum."""
    regs = regs.groupBy(*group_cols, "reg").agg(F.max("m").alias("m"))
    census = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_TAIL_BITS + 1} - m)")
        ).alias("_present"),
    )
    sum_scaled = (
        F.col("_present")
        + (F.lit(HLL_M) - F.col("n_regs_hit"))
        * F.lit(1 << (HLL_TAIL_BITS + 1)).cast("long")
    ).alias("sum_scaled")
    est = (F.lit(HLL_ALPHA_NUM) / F.col("sum_scaled").cast("double")).alias(
        "hll_est"
    )
    return census.select(*group_cols, "n_regs_hit", sum_scaled).select(
        "*", est
    )


def hll_merge_registers(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-max merge of two register tables built with the SAME seed
    — the distributive property that makes HLL state shippable: sketch
    shards (or days, or a base corpus and an increment) independently,
    merge the tiny register tables, census once. Output has one row per
    (group, reg) again, suitable for re-merging or hll_census."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("m").alias("m"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    seed: str = "hll0",
    with_exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count census (Flajolet et al. 2007),
    integer-exact up to the final division.

    The 40-bit md5 draw splits into an 8-bit register index and a 32-bit
    tail; ``rho`` = leading-zero count of the tail + 1 computed EXACTLY as
    ``33 - length(bin(tail))`` (both engines print minimal binary), so
    every register value is an integer both engines agree on. The
    harmonic-mean denominator ``sum(2^-M_j)`` is emitted as the EXACT
    integer ``sum_scaled = sum(2^(33-M_j))`` (each term a power of two
    ≤ 2^33; 256 terms need ≤ 41 mantissa bits, so even its double image
    is exact) and the estimate is the one division
    ``HLL_ALPHA_NUM / sum_scaled`` — correctly rounded, hence
    engine-identical. Empty registers contribute 2^33 each.

    ``with_exact`` joins the true ``count(distinct)`` alongside as the
    labeled audit baseline (same contract as q22's exact-cosine twin):
    at 100 TB you drop it and keep only the register aggregation, which
    is partial-aggregable (registers merge by max) — the point of the
    sketch.
    """
    # NULLs drop before hashing, matching count_distinct's NULL
    # semantics (concat_ws would otherwise hash every NULL as the bare
    # seed — a phantom distinct value); a group whose values are all
    # NULL is absent from the output on both sides, consistently.
    df = df.filter(F.col(value_col).isNotNull())
    reg, rho = hll_register_cols(F.col(value_col), seed)
    regs = (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("m"))
    )
    out = hll_census(regs, group_cols)
    if not with_exact:
        return out
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(value_col).alias("n_exact")
    )
    joined = out.join(F.broadcast(exact), group_cols)
    err = F.floor(
        (F.col("hll_est") - F.col("n_exact").cast("double"))
        * F.lit(1000.0)
        / F.col("n_exact").cast("double")
    ).cast("long")
    return joined.select(
        *group_cols, "n_exact", "n_regs_hit", "sum_scaled", "hll_est",
        err.alias("err_permille"),
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms0",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of an item stream:
    ``depth`` independent md5 rows hashing each occurrence into ``width``
    buckets; returns the depth×width counter grid as rows
    ``(row, bucket, cnt)`` — ≤ depth·width rows however large the input.
    The 6-hex draw space 16^6 is divisible by any power-of-two width, so
    the bucket draw is unbiased. One partial-aggregable shuffle with
    depth·width groups."""
    if width < 1 or ((1 << 24) % width) != 0:
        raise ValueError(
            f"width must divide 16^6 for an unbiased hex-prefix draw; "
            f"got {width}"
        )
    rows = df.select(
        F.col(item_col).alias("_item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    )
    bucket = F.pmod(
        _md5_int(
            F.concat_ws(
                ":", F.lit(seed), F.col("row").cast("string"), F.col("_item")
            ),
            6,
        ),
        F.lit(width),
    )
    return (
        rows.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms0",
) -> DataFrame:
    """Point-query the count-min grid for each candidate item: the
    estimate is ``min`` over the depth rows of the candidate's bucket
    counters — ≥ the true count always, with overshoot bounded by the
    collision mass. The grid (≤ depth·width rows) broadcasts; the probe
    is a broadcast equi-join, never a shuffle of the candidate set.
    A bucket with no occupants has no grid row and counts as 0 (LEFT
    join + coalesce), so an item that never appeared in the stream —
    and whose buckets happen to be empty — correctly estimates 0
    instead of inheriting only its non-empty buckets' collision mass or
    vanishing from the output."""
    probes = candidates.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    ).select(
        item_col,
        "row",
        F.pmod(
            _md5_int(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("row").cast("string"),
                    F.col(item_col),
                ),
                6,
            ),
            F.lit(width),
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-add merge of two count-min grids built with the SAME
    (depth, width, seed): counts are additive, so shards/increments
    sketch independently and their ≤ depth·width-row grids sum into
    one. Output is again one row per (row, bucket)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16  # bit positions
BLOOM_K = 3


def bloom_positions(
    col: Column, k: int = BLOOM_K, m: int = BLOOM_M, seed: str = "bl0"
) -> Column:
    """The ``k`` Bloom bit positions of a key as an int array — the
    filter itself is just the DISTINCT positions of the keyed set (≤ k·n,
    ≤ m rows), which broadcasts. 6-hex draw, power-of-two ``m`` for an
    unbiased modulus."""
    if m < 1 or ((1 << 24) % m) != 0:
        raise ValueError(
            f"m must divide 16^6 for an unbiased hex-prefix draw; got {m}"
        )
    return F.array(
        *[
            F.pmod(
                _md5_int(
                    F.concat_ws(
                        ":", F.lit(seed), F.lit(str(i)), col.cast("string")
                    ),
                    6,
                ),
                F.lit(m),
            )
            for i in range(k)
        ]
    )


# ---------------------------------------------------------------------------
# 2-D Pareto skyline
# ---------------------------------------------------------------------------


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    n_bins: int = 256,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Pareto frontier maximizing BOTH ``x_col`` and ``y_col`` (minimize a
    dimension by negating it upstream). A point is dominated iff another
    point is ≥ in both dims and > in at least one; identical duplicate
    points do not dominate each other, so both survive.

    Grid-pruned, never all-pairs: (1) per-x-bin max-y partial agg
    (≤ n_bins rows); (2) a driver-side suffix-max over those ≤ n_bins
    scalars (bounded collect, the repo's scalar-fixpoint budget) gives,
    for every bin, the best y in any STRICTLY higher bin — any point at
    or below it is dominated by a strictly-greater-x point and is pruned
    map-side; (3) the exact dominance check runs only among same-bin
    survivors, as a LEFT ANTI EQUI-join on the bin (AQE-splittable).
    Same-bin sufficiency is provable: a dominator has x' ≥ x, so it is
    never in a lower bin, and if it were in a strictly higher bin the
    suffix-max prefilter would already have pruned the point; dominator
    chains terminate at surviving same-bin points by the same argument.
    Worst case (all points in one bin, e.g. constant x) degrades to the
    per-bin pair check — the irreducible cost when the frontier itself
    is O(n). Output is frontier-sized."""
    integral = ("byte", "short", "int", "long", "integer", "bigint",
                "smallint", "tinyint")
    for c in (x_col, y_col):
        dt = dict(df.select(x_col, y_col).dtypes)[c]
        if dt not in integral:
            raise TypeError(
                f"skyline_2d requires integral coordinates; {c!r} is "
                f"{dt} — cast('long') would TRUNCATE and silently "
                f"reorder the dominance relation (scale fractional "
                f"scores to integers upstream)"
            )
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    # the projected points feed FOUR evaluations (bounds agg, bin-max
    # collect, both sides of the survivor anti-join) — materialize them
    # once so an expensive upstream (q146 tokenizes the corpus) runs
    # once. Backend choice mirrors dedup.py: default localCheckpoint
    # (executor storage — right at job scale), or pass scratch_dir to
    # spill the projected (id, x, y) table to PARQUET and re-read — the
    # corpus-scale path, where 10^12 rows of executor-storage blocks
    # would dwarf cluster memory but four column-pruned parquet scans
    # of a 3-column scratch table are cheap.
    if scratch_dir is not None:
        pts.write.mode("overwrite").parquet(scratch_dir)
        pts = df.sparkSession.read.parquet(scratch_dir)
    else:
        pts = pts.localCheckpoint()
    lo, hi = pts.agg(F.min("x"), F.max("x")).first()
    if lo is None:
        return pts.select("id", "x", "y")
    bw = max(1, (hi - lo + 1 + n_bins - 1) // n_bins)
    binned = pts.withColumn(
        "xbin", F.expr(f"(x - {lo}) div {bw}")
    )
    bin_max = {
        r["xbin"]: r["my"]
        for r in binned.groupBy("xbin").agg(F.max("y").alias("my")).collect()
    }
    suffix: dict[int, int] = {}
    best = None
    for b in sorted(bin_max, reverse=True):
        if best is not None:
            suffix[b] = best
        best = bin_max[b] if best is None else max(best, bin_max[b])
    if suffix:
        spark = df.sparkSession
        suff_df = spark.createDataFrame(
            [(int(b), int(s)) for b, s in suffix.items()],
            "xbin bigint, _suff bigint",
        )
        # a point at or below the best y of any STRICTLY higher bin is
        # dominated by that strictly-greater-x point — prune map-side
        # after a broadcast join of the ≤ n_bins suffix rows
        survivors = (
            binned.join(F.broadcast(suff_df), "xbin", "left")
            .filter(F.col("_suff").isNull() | (F.col("y") > F.col("_suff")))
            .drop("_suff")
        )
    else:
        survivors = binned
    a = survivors.alias("a")
    b = survivors.select("xbin", "x", "y").alias("b")
    dominated = (
        (F.col("b.xbin") == F.col("a.xbin"))
        & (F.col("b.x") >= F.col("a.x"))
        & (F.col("b.y") >= F.col("a.y"))
        & ((F.col("b.x") > F.col("a.x")) | (F.col("b.y") > F.col("a.y")))
    )
    return a.join(b, on=dominated, how="left_anti").select("id", "x", "y")
