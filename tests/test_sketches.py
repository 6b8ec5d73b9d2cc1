"""Semantic pins for the bounded-summary operators (sketches.py):
HyperLogLog, count-min, Bloom positions, and the 2-D skyline — each
checked against an independent pure-Python brute force, plus the
structural guarantees each sketch owes its user (merge associativity,
one-sided error, no false negatives, dominance correctness on
adversarial shapes)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import sketches


def _md5_int(s: str, ndigits: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:ndigits], 16)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_brute(values, seed="hll0"):
    """Pure-Python register table → (n_regs_hit, sum_scaled, est)."""
    regs = {}
    for v in values:
        h = _md5_int(f"{seed}:{v}", 10)
        reg, tail = h >> 32, h & 0xFFFFFFFF
        rho = 33 - tail.bit_length() if tail else 33
        regs[reg] = max(regs.get(reg, 0), rho)
    present = sum(1 << (33 - m) for m in regs.values())
    sum_scaled = present + (256 - len(regs)) * (1 << 33)
    return len(regs), sum_scaled, sketches.HLL_ALPHA_NUM / sum_scaled


def test_hll_matches_brute_force(spark):
    vals = [f"user{i}" for i in range(500)] * 3  # duplicates are no-ops
    df = spark.createDataFrame(
        [(v, "g") for v in vals], "v string, g string"
    )
    row = sketches.hll_distinct(df, ["g"], "v").first()
    n_hit, sum_scaled, est = _hll_brute(vals)
    assert row["n_exact"] == 500
    assert row["n_regs_hit"] == n_hit
    assert row["sum_scaled"] == sum_scaled
    assert row["hll_est"] == est  # exactly: one IEEE division both sides


def test_hll_register_merge_is_pointwise_max(spark):
    """The scale property: sketching two halves separately and merging
    registers by max equals sketching the whole — what makes the
    aggregation map-side combinable on 1000 executors."""
    a = [f"k{i}" for i in range(300)]
    b = [f"k{i}" for i in range(150, 450)]  # overlapping halves
    _, _, est_whole = _hll_brute(a + b)
    regs = {}
    for half in (a, b):
        for v in half:
            h = _md5_int(f"hll0:{v}", 10)
            reg, tail = h >> 32, h & 0xFFFFFFFF
            rho = 33 - tail.bit_length() if tail else 33
            regs[reg] = max(regs.get(reg, 0), rho)
    merged = sum(1 << (33 - m) for m in regs.values()) + (
        256 - len(regs)
    ) * (1 << 33)
    assert sketches.HLL_ALPHA_NUM / merged == est_whole


def test_hll_partition_invariance(spark):
    df = spark.createDataFrame(
        [(f"u{i % 400}", "g") for i in range(2000)], "v string, g string"
    )
    one = sketches.hll_distinct(df.coalesce(1), ["g"], "v").first()
    many = sketches.hll_distinct(df.repartition(7), ["g"], "v").first()
    assert one.asDict() == many.asDict()


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def _cms_brute(items, depth=4, width=256, seed="cms0"):
    grid = {}
    for it in items:
        for r in range(depth):
            b = _md5_int(f"{seed}:{r}:{it}", 6) % width
            grid[(r, b)] = grid.get((r, b), 0) + 1
    def query(it):
        return min(
            grid.get((r, _md5_int(f"{seed}:{r}:{it}", 6) % width), 0)
            for r in range(depth)
        )
    return grid, query


def test_cms_matches_brute_force_and_is_one_sided(spark):
    items = [f"w{i % 37}" for i in range(1000)] + ["hot"] * 55
    df = spark.createDataFrame([(i,) for i in items], "item string")
    sketch = sketches.cms_sketch(df, "item", depth=4, width=64)
    grid, query = _cms_brute(items, depth=4, width=64)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    assert got == grid
    cand = spark.createDataFrame(
        [("hot",), ("w0",), ("w36",)], "item string"
    )
    est = {
        r["item"]: r["cms_est"]
        for r in sketches.cms_estimate(
            sketch, cand, "item", depth=4, width=64
        ).collect()
    }
    true = {"hot": 55, "w0": 28, "w36": 27}
    for k, t in true.items():
        assert est[k] == query(k)
        assert est[k] >= t  # one-sided: never undercounts


def test_cms_rejects_biased_width(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        sketches.cms_sketch(df, "item", width=100)  # not a divisor of 16^6


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_in_range(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    pos = keys.select(
        F.explode(sketches.bloom_positions(F.col("k"), k=3, m=512)).alias(
            "p"
        )
    )
    lohi = pos.agg(F.min("p"), F.max("p")).first()
    assert 0 <= lohi[0] and lohi[1] < 512
    # membership of the inserted set always passes: every key's own
    # positions are in the filter by construction
    filt = {r["p"] for r in pos.distinct().collect()}
    for i in range(200):
        mine = [
            _md5_int(f"bl0:{j}:{i}", 6) % 512 for j in range(3)
        ]
        assert all(p in filt for p in mine)


def test_bloom_rejects_biased_m():
    with pytest.raises(ValueError):
        sketches.bloom_positions(F.lit(1), m=1000)


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def _sky_brute(pts):
    out = []
    for i, (ix, iy) in pts:
        dominated = any(
            bx >= ix and by >= iy and (bx > ix or by > iy)
            for _, (bx, by) in pts
        )
        if not dominated:
            out.append((i, ix, iy))
    return sorted(out)


def _sky_run(spark, pts, n_bins=8):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts], "id bigint, x bigint, y bigint"
    )
    got = sketches.skyline_2d(df, "id", "x", "y", n_bins=n_bins).collect()
    return sorted((r["id"], r["x"], r["y"]) for r in got)


@pytest.mark.parametrize(
    "pts",
    [
        # random-ish cloud
        [(i, ((i * 37) % 101, (i * 53) % 97)) for i in range(120)],
        # constant x: everything lands in ONE bin (prefilter no-op) —
        # only the max-y points (incl. duplicates) survive
        [(i, (5, i % 10)) for i in range(30)],
        # perfect anti-chain diagonal: EVERY point is on the frontier
        [(i, (i, 100 - i)) for i in range(50)],
        # identical duplicate points: none dominates the other
        [(1, (3, 3)), (2, (3, 3)), (3, (1, 1))],
        # single point
        [(7, (42, 42))],
        # chain: each dominated by the next
        [(i, (i, i)) for i in range(20)],
    ],
)
def test_skyline_matches_brute_force(spark, pts):
    assert _sky_run(spark, pts) == _sky_brute(pts)


def test_skyline_bin_count_does_not_change_answer(spark):
    pts = [(i, ((i * 17) % 257, (i * 29) % 251)) for i in range(200)]
    assert (
        _sky_run(spark, pts, n_bins=1)
        == _sky_run(spark, pts, n_bins=16)
        == _sky_run(spark, pts, n_bins=1024)
        == _sky_brute(pts)
    )


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_cms_absent_item_estimates_zero_not_dropped(spark):
    """An item that never appeared in the stream must come back (not be
    inner-joined away) and must estimate 0 when its buckets are empty —
    empty grid cells count as 0 via the LEFT join."""
    df = spark.createDataFrame([("only",)], "item string")
    sketch = sketches.cms_sketch(df, "item", depth=4, width=64)
    cand = spark.createDataFrame(
        [("only",), ("never-seen-key",)], "item string"
    )
    est = {
        r["item"]: r["cms_est"]
        for r in sketches.cms_estimate(
            sketch, cand, "item", depth=4, width=64
        ).collect()
    }
    _, query = _cms_brute(["only"], depth=4, width=64)
    assert set(est) == {"only", "never-seen-key"}
    assert est["only"] == query("only") == 1
    assert est["never-seen-key"] == query("never-seen-key")


def test_hll_nulls_match_count_distinct_semantics(spark):
    """NULL values drop before hashing (count_distinct ignores them);
    an all-NULL group is absent from the output entirely."""
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", None), ("g1", "b"), ("g2", None)],
        "g string, v string",
    )
    rows = {r["g"]: r for r in
            sketches.hll_distinct(df, ["g"], "v").collect()}
    assert set(rows) == {"g1"}
    assert rows["g1"]["n_exact"] == 2
    n_hit, sum_scaled, est = _hll_brute(["a", "b"])
    assert rows["g1"]["sum_scaled"] == sum_scaled
    assert rows["g1"]["hll_est"] == est


def test_skyline_rejects_fractional_coordinates(spark):
    df = spark.createDataFrame(
        [(1, 1.9, 2.0)], "id bigint, x double, y double"
    )
    with pytest.raises(TypeError, match="integral"):
        sketches.skyline_2d(df, "id", "x", "y")


# ---------------------------------------------------------------------------
# merge helpers: the distributive property, explicitly
# ---------------------------------------------------------------------------


def test_hll_merge_registers_equals_whole(spark):
    """Sketching two overlapping shards and union-max-merging their
    register tables yields the SAME census as sketching the whole —
    including across duplicated (group, reg) rows, which hll_census now
    also folds defensively."""
    a_vals = [f"k{i}" for i in range(250)]
    b_vals = [f"k{i}" for i in range(100, 400)]
    mk = lambda vals: spark.createDataFrame(
        [(v, "g") for v in vals], "v string, g string"
    )

    def regs(df):
        from pyspark.sql import functions as F
        reg, rho = sketches.hll_register_cols(F.col("v"))
        return (
            df.select("g", reg.alias("reg"), rho.alias("rho"))
            .groupBy("g", "reg").agg(F.max("rho").alias("m"))
        )

    merged = sketches.hll_merge_registers(
        regs(mk(a_vals)), regs(mk(b_vals)), ["g"]
    )
    got = sketches.hll_census(merged, ["g"]).first()
    whole = sketches.hll_distinct(
        mk(a_vals + b_vals), ["g"], "v", with_exact=False
    ).first()
    assert got.asDict() == whole.asDict()
    # and the census is safe even on an UNFOLDED union (dup reg rows)
    raw_union = regs(mk(a_vals)).unionByName(regs(mk(b_vals)))
    assert sketches.hll_census(raw_union, ["g"]).first().asDict() \
        == whole.asDict()


def test_cms_merge_equals_whole(spark):
    a_items = [f"w{i % 9}" for i in range(200)]
    b_items = [f"w{i % 13}" for i in range(150)] + ["hot"] * 20
    mk = lambda items: spark.createDataFrame(
        [(i,) for i in items], "item string"
    )
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketches.cms_merge(
            sketches.cms_sketch(mk(a_items), "item", depth=3, width=32),
            sketches.cms_sketch(mk(b_items), "item", depth=3, width=32),
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketches.cms_sketch(
            mk(a_items + b_items), "item", depth=3, width=32
        ).collect()
    }
    assert merged == whole


def test_skyline_scratch_dir_backend_matches(spark, tmp_path):
    """The parquet-scratch materialization (the corpus-scale path) and
    the default localCheckpoint produce the identical frontier."""
    pts = [(i, ((i * 37) % 101, (i * 53) % 97)) for i in range(150)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts], "id bigint, x bigint, y bigint"
    )
    via_ckpt = sorted(
        (r["id"], r["x"], r["y"])
        for r in sketches.skyline_2d(df, "id", "x", "y").collect()
    )
    via_scratch = sorted(
        (r["id"], r["x"], r["y"])
        for r in sketches.skyline_2d(
            df, "id", "x", "y", scratch_dir=str(tmp_path / "pts")
        ).collect()
    )
    assert via_ckpt == via_scratch == _sky_brute(pts)
