"""Temporal join operators Spark lacks as built-ins: as-of (point-in-time)
and range (point-in-interval) joins, in shapes that survive 10^12-row
inputs.

Both avoid the naive formulations that die at scale: an as-of join as a
join-then-rank is O(per-key probes × refs); a range join without an
equality key plans a cartesian/BroadcastNestedLoop scan. Here:

* :func:`asof_join` is ZERO joins — both inputs ride one window
  partitioned by the key, ordered so reference rows sort before probe
  rows at equal timestamps, and ``last(payload, ignorenulls)`` over the
  running frame is exactly the <= match. One shuffle on the key, then a
  partition-local sort: the merge-scan shape, with AQE handling key skew.
* :func:`range_join_binned` explodes each interval into the fixed-width
  time bins it covers and equi-joins points on (key, bin), keeping the
  exact range predicate as a post-filter. Join fan-out is proportional to
  true matches (plus bin-boundary slop), the shuffle key is
  high-cardinality, and a point lives in exactly one bin so no dedup pass
  is needed.

* :func:`salted_join` spreads a skew-hot join key over ``n_salts``
  shuffle partitions by salting the big side deterministically and
  replicating the small side once per salt — the classic remedy when the
  small side is too big to broadcast and AQE's skew-join split cannot
  help (it only splits sort-merge partitions; a hot key inside a
  shuffled hash join stage, or feeding stateful/streaming operators,
  still lands on one task).

Query-surface instances with DuckDB value oracles: q62 (as-of) and q63
(range) in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    on: list[str],
    ts_col: str,
    payload: list[str],
    tiebreak: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """For each probe row, the ``payload`` columns of the LATEST ref row
    with ``ref.ts_col <= probe.ts_col`` in the same ``on`` key group.

    Ties: refs sharing the match timestamp resolve to the greatest
    ``tiebreak`` tuple (default: the payload columns), deterministically.
    ``how='inner'`` drops probes with no preceding ref; ``'left'`` keeps
    them with null payload. Probe and payload column names must be
    disjoint; both inputs must carry ``on`` + ``ts_col``.

    The payload is carried through the window as ONE struct, so the
    result row's payload columns always come from the SAME ref row —
    filling each column independently would stitch values from different
    refs whenever payload columns are individually null, and would
    misclassify a match as absent under ``inner`` when the first payload
    column happens to be null.
    """
    tiebreak = payload if tiebreak is None else tiebreak
    overlap = set(payload) & set(probes.columns)
    if overlap:
        raise ValueError(f"payload columns collide with probe columns: {overlap}")
    ref_cols = list(dict.fromkeys([*on, ts_col, *payload, *tiebreak]))
    u = probes.withColumn("_is_probe", F.lit(1)).unionByName(
        refs.select(*ref_cols).withColumn("_is_probe", F.lit(0)),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_is_probe").asc(),  # refs before probes at equal ts => <=
            *[F.col(c).asc() for c in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(
        "_payload",
        F.last(
            F.when(F.col("_is_probe") == 0, F.struct(*payload)),
            ignorenulls=True,
        ).over(w),
    )
    for c in payload:
        out = out.withColumn(c + suffix, F.col("_payload")[c])
    out_names = {c + suffix for c in payload}
    helpers = [
        c for c in dict.fromkeys([*payload, *tiebreak])
        if c not in probes.columns and c not in out_names
    ]
    out = out.filter(F.col("_is_probe") == 1)
    if how == "inner":
        out = out.filter(F.col("_payload").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.drop("_is_probe", "_payload", *helpers)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    same ``on`` key and ``start_col <= ts_col < end_col`` (end-exclusive).

    Each interval explodes into the ``bin_seconds``-wide bins it covers
    (bounded by max interval length / bin width; pick ``bin_seconds`` so
    that bound is small), points land in exactly one bin, and the exact
    range predicate runs as a post-filter on the (key, bin) equi-join.
    Empty intervals (``end <= start``) match nothing — they are filtered
    before the bin explode, which also guards Spark's descending
    ``sequence(hi, lo)`` surprise. Point/interval column names must be
    disjoint apart from ``on``.

    Bins are true FLOOR divisions over epoch MICROseconds — not
    ``unix_timestamp`` (which drops fractional seconds) and not
    ``cast('long')`` (which truncates toward zero): either would misbin a
    point in an interval's last partial second, or any pre-1970
    timestamp, outside the interval's exploded bins and silently lose the
    match even though it passes the exact post-filter.
    """

    def _floor_bin(us_col: str) -> Column:
        # exact floor division on longs: subtracting the (always
        # non-negative) pmod makes the numerator exactly divisible, so
        # integer `div` is the floor for negative epochs too
        d = bin_seconds * 1_000_000
        return F.expr(f"({us_col} - pmod({us_col}, {d})) div {d}")

    def _micros(c: str) -> Column:
        # unix_micros requires TIMESTAMP; the cast is a no-op there and
        # maps TIMESTAMP_NTZ wall times through the session zone — the
        # SAME monotone mapping on both sides, so bin membership is
        # preserved and the exact post-filter still runs on the raw cols
        return F.unix_micros(F.col(c).cast("timestamp"))

    iv = intervals.filter(F.col(end_col) > F.col(start_col))
    bins = (
        iv.withColumn("_s_us", _micros(start_col))
        # end-exclusive: the last covered micro is end-1
        .withColumn("_e_us", _micros(end_col) - 1)
        .withColumn(
            "_bin",
            F.explode(F.sequence(_floor_bin("_s_us"), _floor_bin("_e_us"))),
        )
        .drop("_s_us", "_e_us")
    )
    pts = points.withColumn(
        "_t_us", _micros(ts_col)
    ).withColumn("_bin", _floor_bin("_t_us")).drop("_t_us")
    return (
        bins.join(pts, [*on, "_bin"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bin")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: ``skewed`` (the big, hot-keyed side)
    joined to ``small`` with the key space widened by a salt.

    The big side's salt is ``xxhash64(whole row) % n_salts`` —
    deterministic (safe under task retry) and uniform over a hot key's
    rows as long as the rows differ anywhere; the small side is
    replicated once per salt value, so every (big row, small row) pair
    meets on exactly one (key, salt) partition and join multiplicity is
    EXACTLY that of the plain join (parity-tested, including duplicate
    small-side keys). Cost: the small side shuffles n_salts× — the
    explicit trade against the hot task's wall-clock.

    Prefer, in order: ``F.broadcast(small)`` when it fits; AQE skew-join
    for plain sort-merge stages; this when neither applies (small too
    big to broadcast, or the downstream operator pins partitioning).
    ``how`` supports inner and left (the skewed side is preserved —
    right/full would need the salt on the other side)."""
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    overlap = set(skewed.columns) & set(small.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns: {sorted(overlap)}")
    if "_salt" in skewed.columns or "_salt" in small.columns:
        # withColumn would silently clobber it and the final drop would
        # delete the user's data — refuse instead
        raise ValueError("inputs must not carry a '_salt' column")
    big = skewed.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]),
            F.lit(n_salts),
        ).cast("int"),
    )
    rep = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return big.join(rep, [*on, "_salt"], how).drop("_salt")
