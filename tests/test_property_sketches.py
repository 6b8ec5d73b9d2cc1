"""Property-based parity for the round-5 close-out kernels: on ARBITRARY
(hypothesis-generated, adversarially shrunk) inputs the distributed
kernels must agree exactly with their pure-Python brute forces — beyond
the example-based pins in test_sketches.py / test_graph.py. Example
counts are small because each example is a full Spark round-trip; the
generators are tuned to force the nasty shapes (duplicate points, ties,
single-bin collapses, chains, multi-root forests) at tiny sizes."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from epstein_browser_spark import sketches
from epstein_browser_spark.graph import tree_closure


def _md5_int(s: str, ndigits: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:ndigits], 16)


# ---------------------------------------------------------------------------
# skyline: tiny coordinate range (0..9) forces duplicates, ties, and
# degenerate one-bin layouts at every run
# ---------------------------------------------------------------------------

_POINTS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=30,
)


def _sky_brute(pts):
    out = []
    for i, (ix, iy) in pts:
        if not any(
            bx >= ix and by >= iy and (bx > ix or by > iy)
            for _, (bx, by) in pts
        ):
            out.append((i, ix, iy))
    return sorted(out)


@settings(max_examples=8, deadline=None)
@given(_POINTS, st.sampled_from([1, 4, 256]))
def test_skyline_property(spark, points, n_bins):
    pts = list(enumerate(points))
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts], "id bigint, x bigint, y bigint"
    )
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in sketches.skyline_2d(
            df, "id", "x", "y", n_bins=n_bins
        ).collect()
    )
    assert got == _sky_brute(pts)


# ---------------------------------------------------------------------------
# tree_closure: random ACYCLIC forests — parent of node i is drawn from
# the nodes BELOW i (or none), so every generated case is a valid forest
# with arbitrary branching, multiple roots, and chains
# ---------------------------------------------------------------------------

_PARENT_DRAWS = st.lists(
    st.integers(min_value=-3, max_value=10_000), min_size=1, max_size=22
)


def _forest(draws):
    parent = {}
    for i, d in enumerate(draws):
        parent[i] = None if (i == 0 or d < 0) else d % i
    return parent


def _closure_brute(parent):
    out = {}
    for n in parent:
        d, cur = 0, n
        while parent[cur] is not None:
            cur = parent[cur]
            d += 1
        out[n] = (cur, d)
    return out


@settings(max_examples=8, deadline=None)
@given(_PARENT_DRAWS)
def test_tree_closure_property(spark, draws):
    parent = _forest(draws)
    df = spark.createDataFrame(
        [(n, p) for n, p in parent.items()], "node bigint, parent bigint"
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in tree_closure(df, "node", "parent").collect()
    }
    assert got == _closure_brute(parent)


# ---------------------------------------------------------------------------
# HLL + CMS: register/grid state must equal the pure-Python build exactly
# on arbitrary value multisets (small alphabet forces collisions)
# ---------------------------------------------------------------------------

_VALUES = st.lists(
    st.text(alphabet="abc:|0", min_size=0, max_size=6),
    min_size=1,
    max_size=50,
)


@settings(max_examples=6, deadline=None)
@given(_VALUES)
def test_hll_state_property(spark, values):
    df = spark.createDataFrame(
        [(v, "g") for v in values], "v string, g string"
    )
    row = sketches.hll_distinct(df, ["g"], "v").first()
    regs = {}
    for v in set(values):
        h = _md5_int(f"hll0:{v}", 10)
        reg, tail = h >> 32, h & 0xFFFFFFFF
        rho = 33 - tail.bit_length() if tail else 33
        regs[reg] = max(regs.get(reg, 0), rho)
    sum_scaled = sum(1 << (33 - m) for m in regs.values()) + (
        256 - len(regs)
    ) * (1 << 33)
    assert row["n_exact"] == len(set(values))
    assert row["sum_scaled"] == sum_scaled
    assert row["hll_est"] == sketches.HLL_ALPHA_NUM / sum_scaled


@settings(max_examples=6, deadline=None)
@given(_VALUES)
def test_cms_grid_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "item string")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketches.cms_sketch(
            df, "item", depth=3, width=16
        ).collect()
    }
    grid = {}
    for it in values:
        for r in range(3):
            b = _md5_int(f"cms0:{r}:{it}", 6) % 16
            grid[(r, b)] = grid.get((r, b), 0) + 1
    assert got == grid
