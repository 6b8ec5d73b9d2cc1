"""Link-graph operators: integer-exact PageRank over a domain graph.

Web-corpus curation ranks domains by link authority before weighting or
filtering them (Common Crawl's harmonic-centrality rankings, RefinedWeb's
domain triage): a domain linked from many reputable domains is kept or
upsampled; an orphan link-farm is down-weighted. The engine therefore
needs an iterative fixed-round graph propagation — the second iterative
family next to connected_components (dedup.py), with the same execution
discipline: per-round localCheckpoint, scalar-only driver traffic, and a
shuffle plan that reuses one edge partitioning across every round.

All arithmetic is INTEGER (micro-rank units + integer division), so the
result is bit-equal on any engine that restates the same recurrence —
DuckDB value-oracles the whole 5-round loop (q123), the same discipline
as the k-means Lloyd loop (q74) and the KL/entropy micro-nat queries.
Float PageRank would diverge across engines in summation order alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_stats", "tree_closure"]


def tree_closure(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> DataFrame:
    """Transitive closure of a forest — (node, root, depth) for every
    node, given one row per node with its parent (NULL for roots). The
    Spark-native equivalent of SQL's ``WITH RECURSIVE`` ancestor walk
    (which Spark lacks), built by POINTER DOUBLING rather than
    depth-at-a-time iteration: the state (v, anc, d) means "anc is an
    ancestor of v at distance d"; each round substitutes anc's own
    pointer — (v, anc, d) ⋈ (anc, anc', d') → (v, anc', d+d') — so the
    known-ancestor distance DOUBLES per round and a depth-D hierarchy
    settles in ceil(log2 D) joins, not D (the difference between 7
    rounds and 100 on a 100-level BOM). Roots self-map with distance 0,
    making settled rows fixpoints of the same join — no special-casing
    in the loop body.

    Execution discipline matches the repo's other iterative kernels
    (connected_components, pagerank): one equi-join shuffle per round,
    localCheckpoint to truncate lineage, scalar-only driver traffic
    (the unsettled count), loud failure on malformed input — a parent
    referencing a node absent from the input raises up front (the
    doubling join would silently drop the row), a self-loop or longer
    cycle raises after ``max_rounds`` joins (settlement is re-checked
    AFTER the final join, so ``max_rounds`` joins really do cover depth
    ``2**max_rounds``).

    Multi-parent rows (a DAG, not a forest) would fan out the join;
    callers own pre-deduping to one parent per node.
    """
    src = nodes.select(
        F.col(node_col).cast("long").alias("node"),
        F.col(parent_col).cast("long").alias("parent"),
    )
    dangling = (
        src.filter(F.col("parent").isNotNull())
        .select(F.col("parent").alias("node"))
        .join(src.select("node"), "node", "left_anti")
        .limit(1)
        .collect()
    )
    if dangling:
        raise ValueError(
            f"tree_closure: parent {dangling[0]['node']} is referenced "
            f"but absent from the input — the closure would silently "
            f"drop its subtree"
        )
    state = src.select(
        "node",
        F.coalesce(F.col("parent"), F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint()
    # true roots only (parent IS NULL): a self-loop row also has
    # node == anc in the state encoding but is a 1-cycle, not a root —
    # it must stay unsettled and hit the max_rounds error
    roots = src.filter(F.col("parent").isNull()).select(
        F.col("node").alias("root_node")
    )

    def _unsettled(st) -> int:
        return st.join(
            roots, st.anc == F.col("root_node"), "left_anti"
        ).count()

    def _done(st):
        return st.select("node", F.col("anc").alias("root"), "depth")

    if _unsettled(state) == 0:
        return _done(state)
    for _ in range(max_rounds):  # max_rounds joins, checked AFTER each
        a = state.alias("a")
        b = state.select(
            F.col("node").alias("b_node"),
            F.col("anc").alias("b_anc"),
            F.col("depth").alias("b_depth"),
        ).alias("b")
        state = (
            a.join(b, F.col("a.anc") == F.col("b.b_node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.b_anc").alias("anc"),
                (F.col("a.depth") + F.col("b.b_depth")).alias("depth"),
            )
            .localCheckpoint()
        )
        if _unsettled(state) == 0:
            return _done(state)
    raise RuntimeError(
        f"tree_closure did not settle in {max_rounds} rounds — the "
        f"parent relation likely contains a cycle (not a forest)"
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_permille: int = 850,
    unit: int = 1_000_000,
) -> DataFrame:
    """Fixed-round integer PageRank: (node, rank_micro) for every node in
    ``edges`` (src, dst — duplicate edges should be pre-deduped; each
    distinct edge carries one vote).

    The recurrence, in rank micro-units (``unit`` = the starting mass per
    node):

        r0(n)   = unit
        rk(n)   = unit*(1000-d)//1000  +  (d * Σ_{(s,n)∈E} rk-1(s) div deg(s)) div 1000

    with d = ``damping_permille``. Integer division at BOTH steps makes
    every round engine-exact. Dangling nodes (no out-edges) simply drop
    their damped mass — the standard "removed dangling mass" variant;
    deterministic, and restated identically in the SQL oracle. Overflow
    headroom: the widest intermediate is damping_permille * m with
    m <= n_nodes * unit, so int64 holds up to ~1.08e10 nodes at the
    defaults (850 * 1e6) — an order of magnitude above any real
    domain graph; shrink ``unit`` for larger node counts.

    Scale shape (a 10^8-node domain graph, 10^10 edges): the edge table is
    hash-partitioned on ``src`` ONCE and localCheckpoint'd; every round's
    contribution join then moves only the |nodes|-sized rank table to the
    edge layout, and the per-dst sum is an ordinary partial agg. Rounds are
    fixed (``iters``), not converged — production PageRank runs a fixed
    round budget so the cost is known up front; per-round localCheckpoint
    keeps the plan O(1) deep exactly like connected_components (on a real
    cluster use spark.checkpoint with a checkpoint dir).
    """
    if iters < 1:
        raise ValueError("pagerank needs at least one iteration")
    if not 0 <= damping_permille <= 1000:
        raise ValueError("damping_permille must be in [0, 1000]")

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # one edge layout reused by every round: partitioned on the join key
    e = edges.join(deg, "src").repartition("src").localCheckpoint(eager=True)

    base = unit * (1000 - damping_permille) // 1000
    ranks = nodes.select(
        "node", F.lit(unit).cast("long").alias("rank_micro")
    )
    for _ in range(iters):
        contrib = (
            e.join(
                ranks.select(F.col("node").alias("src"), "rank_micro"),
                "src",
            )
            .select("dst", F.expr("rank_micro div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(
                contrib.select(F.col("dst").alias("node"), "m"),
                "node",
                "left",
            )
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damping_permille} *"
                    " coalesce(m, CAST(0 AS BIGINT))) div 1000 AS BIGINT)"
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient over
    an (src, dst) edge table, treated as an UNDIRECTED simple graph
    (self-loops dropped, duplicate/reverse edges collapsed).

    Returns ``(node, degree, n_triangles, clustering_permille)`` where
    ``clustering_permille = (2000 * n_triangles) div (degree * (degree-1))``
    for degree >= 2, else 0 — all-integer, so engine-exact.

    Algorithm is node-iterator++ (the MapReduce-classic degree
    orientation, Suri & Vassilvitskii WWW'11 / Cohen's "Graph Twiddling"):
    every undirected edge is oriented from its LOWER-rank endpoint to its
    higher, rank = (degree, node) lexicographic. Each triangle then has
    exactly one "apex" (its minimum-rank vertex) and is found once, by
    joining the apex's two out-edges (a wedge) against the oriented edge
    closing it. Orientation is what makes this web-scale: wedge count per
    node is bounded by its OUT-degree squared, and out-degree under degree
    orientation is O(sqrt(m)) — a celebrity domain with 10^7 undirected
    neighbours contributes only wedges among its few HIGHER-degree peers,
    instead of 10^14 raw wedges. Both wedge-build and closure are plain
    equi-join shuffles (AQE-skew-splittable; a lexicographic orientation
    would have the same plan but unbounded hub wedges).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    withdeg = und.join(da, "a").join(db, "b")
    lower_is_a = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_is_a, F.col("degb")).otherwise(F.col("dega")).alias("dv"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, "u").filter(
        (F.col("o1.dv") < F.col("o2.dv"))
        | ((F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v")))
    ).select(
        F.col("u").alias("x"),
        F.col("o1.v").alias("y"),
        F.col("o2.v").alias("z"),
    )
    closing = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
            F.expr(
                "CASE WHEN degree >= 2 THEN (2000 * coalesce(n_triangles,"
                " CAST(0 AS BIGINT))) div (degree * (degree - 1))"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("clustering_permille"),
        )
    )
