"""Graph analytics over co-occurrence graphs — fixed-point PageRank.

The dedup layer already owns connected components (``dedup.py``:
propagation + log-round star contraction); this module adds the other
canonical iterative graph primitive. The engineering problem with
oracle-gating an ITERATIVE float algorithm is that every iteration
compounds summation-order nondeterminism — Σ contrib over in-edges is
a float sum, partitioning-dependent in the last ulps, and K iterations
amplify it. The fix is the ``temperature_mix`` move (integer weight
algebra) applied to the whole algorithm: ranks live in integer
MICRO-UNITS (``scale`` = 10^12 per unit of probability mass), every
per-edge contribution is an integer division ``rank div degree``, the
damping update is ``(15·scale) div (100·N) + (85·Σ) div 100`` — all
BIGINT operations both engines define identically, so K chained
iterations stay BIT-exact cross-engine and the oracle can replay them
as K generated (unrolled) CTE stages, same single-source pattern as
``zvalue_oracle_sql`` / ``bpe_oracle_sql``.

Semantics: standard damped PageRank (d = 0.85) on the UNDIRECTED
distinct co-occurrence graph, teleport mass split evenly, dangling
nodes keep teleport share only (no dangling-mass redistribution —
documented simplification; the co-purchase graph's dangling set is
parts never co-ordered, which is exactly the long tail the ranking is
meant to sink). Integer division drops sub-micro-unit remainders, so
total mass decays by < N micro-units per iteration — a bias of 1e-12
per node per step, far below any ranking decision, and IDENTICAL in
both engines (the point is determinism, not mass conservation).

100 TB design: the edge list and degree table build once and persist
across the K joins (cache + ``_cached_inputs`` contract); each
iteration is one hash join edges⋈ranks (both sides partitioned by the
join key — co-partitioning is stable across iterations, so AQE reuses
the layout) plus one map-side-combinable BIGINT sum. Co-occurrence
fan-out is bounded by order size (≤ items-per-order² pairs per
order), never corpus-quadratic. K is a fixed small constant — the
plan is K-deep, not iterative-until-convergence (convergence-checked
variants belong in a driver loop over checkpointed tables; this is
the mart-shaped K-step form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_away

SCALE = 10**12

# (r13 A/B toggle) SHUFFLE_HASH hints on triangle_stats' wedge/closing
# joins — r12 added them on probe evidence, but the round-12 driver
# measured part_triangles slower in BOTH its runs (32c and 8c), so the
# round-13 interleaved A/B arbitrates with this flag. Plan-build-time
# read; default keeps current behavior.
_WEDGE_SHJ_HINTS = True


def _wedge_hint(df: DataFrame) -> DataFrame:
    return df.hint("shuffle_hash") if _WEDGE_SHJ_HINTS else df


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct directed edges (src, dst): parts appearing in the same
    order, both directions, no self-loops."""
    li = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    ).distinct()
    a = li.select("ok", F.col("part").alias("src"))
    b = li.select(F.col("ok").alias("__okb"), F.col("part").alias("dst"))
    return (
        a.join(b, (F.col("ok") == F.col("__okb")) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )


def build_copurchase_graph(
    lineitem: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The graph INDEX: (deg_edges, nodes) — distinct directed edges
    with out-degree folded in, and the vertex set. Build-once/query-
    many state (the ``_ivf_index`` pattern): callers that iterate or
    re-query should build this once, persist/checkpoint it, and pass
    it to :func:`pagerank_copurchase` — the build (the only lineitem-
    scale shuffle in the algorithm) amortizes across every downstream
    ranking run, exactly like an ANN index amortizes across queries.
    """
    edges = copurchase_edges(lineitem)
    # degree folds INTO the edge list once — every iteration's
    # message pass is then a single src-keyed join against the ranks
    # frame; the edge side's shuffle happens once at materialization
    # and the per-iteration cost is one ranks shuffle + one dst-keyed
    # map-side-combinable sum.
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    deg_edges = edges.join(deg, "src")
    nodes = lineitem.select(F.col("l_partkey").alias("part")).distinct()
    return deg_edges, nodes


def pagerank_copurchase(
    lineitem: DataFrame,
    iters: int = 5,
    scale: int = SCALE,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """K-step fixed-point PageRank over the part co-purchase graph.

    Output: (l_partkey, pagerank_scaled BIGINT micro-units,
    pagerank DOUBLE display copy) ordered by part key. The BIGINT
    column is the primary, bit-exact result; the double is derived
    from it by one division and 9-dp rounding.

    ``graph``: a prebuilt :func:`build_copurchase_graph` pair (the
    caller owns its persistence). When absent, the graph builds
    inline and is cached for the K iterations with the
    ``_cached_inputs`` release contract.
    """
    if graph is not None:
        deg_edges, nodes = graph
        owned: tuple[DataFrame, ...] = ()
    else:
        deg_edges, nodes = build_copurchase_graph(lineitem)
        deg_edges = deg_edges.cache()
        nodes = nodes.cache()
        owned = (deg_edges, nodes)
    n1 = nodes.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "part", F.expr(f"CAST({scale} AS BIGINT) div __n").alias("__r")
    )
    for _ in range(iters):
        contrib = (
            deg_edges
            .join(ranks.select(F.col("part").alias("src"), "__r"), "src")
            .select("dst", F.expr("__r div __deg").alias("__c"))
        )
        sums = contrib.groupBy("dst").agg(
            F.sum("__c").cast("long").alias("__s")
        )
        ranks = (
            nodes.join(sums, nodes.part == sums.dst, "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "part",
                (
                    F.expr(f"CAST({15 * scale} AS BIGINT) div (100 * __n)")
                    + F.expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100")
                ).alias("__r"),
            )
        )
    out = ranks.select(
        F.col("part").alias("l_partkey"),
        F.col("__r").alias("pagerank_scaled"),
        round_away(F.col("__r").cast("double") / F.lit(float(scale)), 9).alias(
            "pagerank"
        ),
    ).orderBy("l_partkey")
    out._cached_inputs = owned  # type: ignore[attr-defined]
    return out


def pagerank_oracle_sql(iters: int = 5, scale: int = SCALE) -> str:
    """DuckDB twin of :func:`pagerank_copurchase` — the K iterations
    unroll into K generated CTE stages from the SAME (iters, scale)
    literals (single-source pattern)."""
    stages = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        stages.append(
            f"""c{i} AS (
    SELECT e.dst, {prev}.r // deg.deg AS c
    FROM e JOIN {prev} ON {prev}.part = e.src JOIN deg ON deg.src = e.src
),
s{i} AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c{i} GROUP BY dst),
r{i} AS (
    SELECT nodes.part,
        CAST({15 * scale} AS BIGINT) // (100 * nn.n)
            + (85 * coalesce(s{i}.s, 0)) // 100 AS r
    FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON s{i}.dst = nodes.part
)"""
        )
    chain = ",\n".join(stages)
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
e AS (
    SELECT DISTINCT a.part AS src, b.part AS dst
    FROM li a JOIN li b USING (ok) WHERE a.part <> b.part
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
    SELECT part, CAST({scale} AS BIGINT) // nn.n AS r FROM nodes CROSS JOIN nn
),
{chain}
SELECT part AS l_partkey, r AS pagerank_scaled,
    round(CAST(r AS DOUBLE) / {float(scale)!r}, 9) AS pagerank
FROM r{iters}
ORDER BY part
"""


def triangle_stats(
    lineitem: DataFrame,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficients on
    the co-purchase graph — the standard degree-ordered algorithm
    (Chiba–Nishizeki / "compact-forward"): orient every undirected
    edge from the lower (degree, id) endpoint to the higher, build
    wedges only from each node's ORIENTED out-edges, and close them
    against the oriented edge set. The orientation bounds out-degree
    by O(√E), so the wedge join is Σ outdeg² ≲ E^1.5 instead of
    Σ deg² — the difference between a plan that survives heavy-hub
    graphs and one that doesn't. Every count is an integer (exact
    cross-engine); the clustering coefficient 2T/(d(d−1)) is one
    division + 6-dp rounding.

    Output: (l_partkey, degree, triangles, clustering_coef) for every
    vertex, NULL coefficient where degree < 2.

    ``graph``: the same prebuilt :func:`build_copurchase_graph` pair
    PageRank takes — (src, dst, __deg) IS the edge+degree layout this
    algorithm needs, so the expensive distinct-edge build amortizes
    across both graph queries via one session memo.
    """
    if graph is not None:
        deg_edges, nodes_in = graph
        deg = deg_edges.select(
            "src", F.col("__deg").alias("deg")
        ).distinct()
        # (r12 optimization) deg_edges ALREADY carries deg(src) as
        # __deg — re-joining the (node, deg) frame onto the edge list
        # repeated a full edge-sized shuffle join for a value the
        # memoized index materialized; only the DST degree needs
        # attaching. Same values, one Exchange+join fewer.
        ed = deg_edges.select(
            "src", "dst", F.col("__deg").alias("__degs")
        ).join(
            deg.select(
                F.col("src").alias("dst"), F.col("deg").alias("__degd")
            ),
            "dst",
        )
        nodes = nodes_in
    else:
        e = copurchase_edges(lineitem)  # both directions, distinct
        deg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        # rank-carrying edge list: (src, dst, deg_src, deg_dst)
        ed = (
            e.join(deg, "src")
            .join(
                deg.select(
                    F.col("src").alias("dst"), F.col("deg").alias("__degd")
                ),
                "dst",
            )
            .select("src", "dst", F.col("deg").alias("__degs"), "__degd")
        )
        nodes = lineitem.select(F.col("l_partkey").alias("part")).distinct()
    lower = (F.col("__degs") < F.col("__degd")) | (
        (F.col("__degs") == F.col("__degd")) & (F.col("src") < F.col("dst"))
    )
    oriented = ed.filter(lower).select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("__degd").alias("__dv"),
    )
    o1 = oriented.select("u", F.col("v").alias("a"), F.col("__dv").alias("__da"))
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("b"), F.col("__dv").alias("__db")
    )
    # (r12 optimization) SHUFFLE_HASH on both wedge-phase joins — the
    # part_kcore lesson: sort-merge re-sorts the full oriented edge
    # list on each side, while a per-partition hash build from the
    # edge side needs no broadcast fit and no sort. Build sides are
    # edge-bounded (E/2 rows each), never the Σ outdeg² wedge stream.
    wedges = o1.join(_wedge_hint(o2), "u").filter(
        (F.col("__da") < F.col("__db"))
        | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b")))
    )
    closing = oriented.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    tri = wedges.join(_wedge_hint(closing), ["a", "b"]).select(
        "u", "a", "b"
    )
    per_node = (
        tri.select(F.explode(F.array("u", "a", "b")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    # (r12 optimization) the vertex spine comes from the memoized
    # graph index when one is passed (``nodes`` above) instead of a
    # second full lineitem scan + distinct — build_copurchase_graph
    # derives it with the identical expression.
    d = deg.select(F.col("src").alias("part"), F.col("deg"))
    coef = (
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double")
    )
    return (
        nodes.join(d, "part", "left")
        .join(per_node, "part", "left")
        .select(
            F.col("part").alias("l_partkey"),
            F.coalesce("deg", F.lit(0).cast("long")).alias("degree"),
            F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles"),
        )
        .select(
            "l_partkey",
            "degree",
            "triangles",
            F.when(F.col("degree") >= 2, round_away(coef, 6)).alias(
                "clustering_coef"
            ),
        )
        .orderBy("l_partkey")
    )


TRIANGLE_STATS_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
e AS (
    SELECT DISTINCT a.part AS src, b.part AS dst
    FROM li a JOIN li b USING (ok) WHERE a.part <> b.part
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
ed AS (
    SELECT e.src, e.dst, ds.deg AS degs, dd.deg AS degd
    FROM e JOIN deg ds ON ds.src = e.src JOIN deg dd ON dd.src = e.dst
),
oriented AS (
    SELECT src AS u, dst AS v, degd AS dv
    FROM ed
    WHERE degs < degd OR (degs = degd AND src < dst)
),
wedges AS (
    SELECT o1.u, o1.v AS a, o2.v AS b
    FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u
    WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)
),
tri AS (
    SELECT w.u, w.a, w.b
    FROM wedges w JOIN oriented c ON c.u = w.a AND c.v = w.b
),
pn AS (
    SELECT t.part, CAST(count(*) AS BIGINT) AS triangles
    FROM (
        SELECT u AS part FROM tri
        UNION ALL SELECT a FROM tri
        UNION ALL SELECT b FROM tri
    ) t GROUP BY t.part
),
nodes AS (SELECT DISTINCT l_partkey AS part FROM lineitem)
SELECT n.part AS l_partkey,
    coalesce(d.deg, 0)       AS degree,
    coalesce(pn.triangles, 0) AS triangles,
    CASE WHEN coalesce(d.deg, 0) >= 2
         THEN round(2.0 * coalesce(pn.triangles, 0)
                    / (d.deg * (d.deg - 1)), 6)
    END AS clustering_coef
FROM nodes n
LEFT JOIN deg d ON d.src = n.part
LEFT JOIN pn ON pn.part = n.part
ORDER BY n.part
"""


# The co-purchase edge + degree CTE text shared by the generated graph
# oracles (pagerank's copy predates this constant and is kept verbatim
# — same text, different var bindings).
COPURCHASE_EDGE_CTES = """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
e AS (
    SELECT DISTINCT a.part AS src, b.part AS dst
    FROM li a JOIN li b USING (ok) WHERE a.part <> b.part
)"""


def kcore_peel(
    lineitem: DataFrame,
    k: int = 80,
    iters: int = 8,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """R-round k-peel over the part co-purchase graph — the third
    consumer of the shared graph index (VERDICT r6 #6): survivors of
    ``iters`` rounds of "drop every node with fewer than ``k``
    surviving neighbors", with their final-round surviving degree.
    When the peel reaches its fixpoint within ``iters`` rounds (it
    does at every tested SF — 6 rounds at k=80; the round-7 pytest
    pins this), the output IS the classic k-core with in-core
    degrees; the fixed round count is what makes the semantics
    bit-identical cross-engine and the oracle a finite unrolled CTE
    chain (the ``pagerank_oracle_sql`` move — a recursive-closure
    oracle would be O(V²) on this near-dense graph and die at scale).

    Monotonicity makes each round ONE join + one map-side-combinable
    count: survivors only shrink, so a node removed earlier can never
    re-qualify, and round r needs only "count each node's neighbors
    inside round r−1's survivor set, keep counts ≥ k" — no
    membership re-intersection on the src side. Every quantity is an
    integer; there is nothing to drift.

    100 TB design: the edge build amortizes via the shared
    ``_copurchase_graph`` session memo; each round shuffles at most
    one (node, count) row per surviving node, and the survivor frame
    feeds exactly one downstream join so the K-deep lazy plan stays
    linear in ``iters`` (no per-round checkpoint needed).
    """
    if graph is not None:
        deg_edges, _nodes = graph
        edges = deg_edges.select("src", "dst")
    else:
        edges = copurchase_edges(lineitem)
    surv = edges.select("src").distinct()
    for _ in range(iters):
        # SHUFFLE_HASH on the survivor side: a sort-merge join would
        # re-sort the full edge list EVERY round (8 sorts of the
        # graph, measured ~30% slower at sf0.1); hashing builds from
        # the node-bounded survivor set per partition — unlike a
        # broadcast it never requires single-node fit, so the hint is
        # safe at any graph scale (VERDICT r5's forced-broadcast
        # lesson respected).
        surv = (
            edges.join(
                surv.select(F.col("src").alias("dst")).hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
            .filter(F.col("core_degree") >= k)
        )
    return surv.select(
        F.col("src").alias("l_partkey"), "core_degree"
    ).orderBy("l_partkey")


def kcore_oracle_sql(k: int = 80, iters: int = 8) -> str:
    """DuckDB twin of :func:`kcore_peel` — ``iters`` unrolled peel
    stages generated from the SAME (k, iters) literals."""
    stages = []
    for i in range(1, iters + 1):
        stages.append(
            f"""s{i} AS (
    SELECT e.src AS u, CAST(count(*) AS BIGINT) AS c
    FROM e JOIN s{i - 1} ON e.dst = s{i - 1}.u
    GROUP BY e.src HAVING count(*) >= {k}
)"""
        )
    chain = ",\n".join(stages)
    return f"""
WITH {COPURCHASE_EDGE_CTES},
s0 AS (SELECT DISTINCT src AS u FROM e),
{chain}
SELECT u AS l_partkey, c AS core_degree
FROM s{iters}
ORDER BY u
"""


def connected_components(
    lineitem: DataFrame,
    iters: int = 8,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """K-round min-label propagation over the part co-purchase graph
    — the fourth consumer of the shared graph index (VERDICT r7 #3):
    every part labeled with the minimum part key reachable within
    ``iters`` hops, plus the size of its label group. Whenever every
    component's diameter is ≤ ``iters`` (true at every tested SF —
    the round-8 pytest pins equality against the exact star-
    contraction kernel, ``dedup.py:dedup_clusters_star``), the output
    IS classic connected components: the community labels k-core's
    survivor set doesn't give (WHICH parts cluster together, not just
    which are dense). The fixed round count is what keeps the
    semantics bit-identical cross-engine and the oracle a finite
    unrolled CTE chain (the ``kcore_oracle_sql`` move — a recursive
    reachability closure would be O(|C|²) rows on this near-dense
    graph and die at scale).

    Every quantity is an integer (labels are part keys, sizes are
    counts); there is nothing to drift.

    100 TB design: the edge build amortizes via the shared
    ``_copurchase_graph`` session memo. SELF-LOOPS are appended to
    the edge list once, so each round is ONE edges⋈labels hash join
    (SHUFFLE_HASH on the node-bounded label side — a sort-merge join
    would re-sort the full edge list every round, the measured k-core
    lesson) feeding a map-side-combinable MIN; min(own, neighbors)
    falls out of the self-loop, so the label frame is referenced
    exactly ONCE per round and the K-deep lazy plan stays LINEAR in
    ``iters`` (the min(own, nbr_min) left-join form references it
    twice per round — a 2^K logical-plan blowup, 511 SortMergeJoins
    at K=8, caught by tools/explain_audit.py; the eigen/MATERIALIZED
    lesson on the Spark side). Label state is one row per vertex; one
    final ``localCheckpoint`` feeds the two output consumers (sizes +
    labels) without recomputing the chain.
    """
    if graph is not None:
        deg_edges, nodes = graph
        edges = deg_edges.select("src", "dst")
    else:
        edges = copurchase_edges(lineitem)
        nodes = lineitem.select(F.col("l_partkey").alias("part")).distinct()
    loops = nodes.select(
        F.col("part").alias("src"), F.col("part").alias("dst")
    )
    edges2 = edges.unionByName(loops)
    labels = nodes.select(
        F.col("part").alias("node"), F.col("part").alias("lbl")
    )
    for _ in range(iters):
        labels = (
            edges2.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("lbl")
                ).hint("shuffle_hash"),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("lbl").alias("lbl"))
            .withColumnRenamed("src", "node")
        )
    labels = labels.localCheckpoint()
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("node").alias("l_partkey"),
            F.col("lbl").alias("component_id"),
            "component_size",
        )
        .orderBy("l_partkey")
    )


def components_oracle_sql(iters: int = 8) -> str:
    """DuckDB twin of :func:`connected_components` — ``iters``
    unrolled min-propagation stages generated from the SAME literal.
    Every l{i} stage is referenced twice (label carry + neighbor
    lookup), so each MUST be ``AS MATERIALIZED`` — inlined CTEs
    double per stage and the query never returns (the
    ``eigen_oracle_sql`` lesson)."""
    stages = []
    for i in range(1, iters + 1):
        stages.append(
            f"""n{i} AS MATERIALIZED (
    SELECT e.src AS node, min(q.lbl) AS nm
    FROM e JOIN l{i - 1} q ON q.node = e.dst
    GROUP BY e.src
),
l{i} AS MATERIALIZED (
    SELECT p.node, least(p.lbl, coalesce(n.nm, p.lbl)) AS lbl
    FROM l{i - 1} p LEFT JOIN n{i} n USING (node)
)"""
        )
    chain = ",\n".join(stages)
    return f"""
WITH {COPURCHASE_EDGE_CTES},
l0 AS MATERIALIZED (
    SELECT DISTINCT l_partkey AS node, l_partkey AS lbl FROM lineitem
),
{chain},
sz AS (
    SELECT lbl, CAST(count(*) AS BIGINT) AS component_size
    FROM l{iters} GROUP BY lbl
)
SELECT node AS l_partkey, lbl AS component_id, component_size
FROM l{iters} JOIN sz USING (lbl)
ORDER BY node
"""


def copurchase_rules(lineitem: DataFrame, top_k: int = 50) -> DataFrame:
    """Market-basket association rules over order baskets — the
    canonical recsys/warehouse workload the graph family's edge list
    implies but never priced: top-``top_k`` part pairs by pair
    support, with support, directed confidences and lift.

    Exactness: every support is an exact integer count of distinct
    baskets; the three ratios are single float divisions of those
    integers (identical operands both engines), 6-dp rounded; the
    top-k cut is a deterministic (count desc, a asc, b asc) rank —
    no ties can flip membership.

    100 TB design: pair generation is the same per-order fan-out
    bound as :func:`copurchase_edges` (Σ items-per-order², never
    corpus-quadratic); item and pair supports are map-side-combinable
    counts; the final rank touches pair-grain rows only. The
    ``n_orders`` scalar broadcasts.
    """
    basket = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    ).distinct()
    n_orders = basket.select("ok").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    item = basket.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("__ni")
    )
    a = basket.select("ok", F.col("part").alias("part_a"))
    b = basket.select(F.col("ok").alias("__okb"), F.col("part").alias("part_b"))
    pair = (
        a.join(b, (F.col("ok") == F.col("__okb")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_orders"))
    )
    # top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, NO single-partition global sort); the rank window then
    # runs over top_k rows only.
    from pyspark.sql import Window

    from ..functions.core import single_partition_key

    top = pair.orderBy(
        F.desc("pair_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(top_k)
    # single-partition BY DESIGN: the window ranks <= top_k post-limit
    # rows; the non-foldable constant key is the repo's marker for
    # that contract (plan-invariant test enforces it)
    w = Window.partitionBy(single_partition_key("part_a")).orderBy(
        F.desc("pair_orders"), F.asc("part_a"), F.asc("part_b")
    )
    ranked = (
        top.withColumn("rule_rank", F.row_number().over(w).cast("long"))
        .join(item.select(F.col("part").alias("part_a"), F.col("__ni").alias("__na")), "part_a")
        .join(item.select(F.col("part").alias("part_b"), F.col("__ni").alias("__nb")), "part_b")
        .crossJoin(F.broadcast(n_orders))
    )
    nab = F.col("pair_orders").cast("double")
    return ranked.select(
        "rule_rank",
        "part_a",
        "part_b",
        "pair_orders",
        F.col("__na").alias("orders_a"),
        F.col("__nb").alias("orders_b"),
        round_away(nab / F.col("__n").cast("double"), 6).alias("support"),
        round_away(nab / F.col("__na").cast("double"), 6).alias("conf_a_to_b"),
        round_away(nab / F.col("__nb").cast("double"), 6).alias("conf_b_to_a"),
        round_away(
            (nab * F.col("__n").cast("double"))
            / (F.col("__na").cast("double") * F.col("__nb").cast("double")),
            6,
        ).alias("lift"),
    ).orderBy("rule_rank")


def copurchase_rules_oracle_sql(top_k: int = 50) -> str:
    """DuckDB twin of :func:`copurchase_rules` — same integer
    supports, same deterministic rank, same single-division ratios
    (generated from the same ``top_k`` literal)."""
    return f"""
WITH basket AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
),
nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM basket),
item AS (
    SELECT part, CAST(count(*) AS BIGINT) AS ni FROM basket GROUP BY part
),
pair AS (
    SELECT a.part AS part_a, b.part AS part_b,
        CAST(count(*) AS BIGINT) AS pair_orders
    FROM basket a JOIN basket b
      ON a.ok = b.ok AND a.part < b.part
    GROUP BY 1, 2
),
rk AS (
    SELECT *, CAST(row_number() OVER (
        ORDER BY pair_orders DESC, part_a ASC, part_b ASC) AS BIGINT)
        AS rule_rank
    FROM pair
)
SELECT rk.rule_rank, rk.part_a, rk.part_b, rk.pair_orders,
    ia.ni AS orders_a, ib.ni AS orders_b,
    round(CAST(rk.pair_orders AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
        AS support,
    round(CAST(rk.pair_orders AS DOUBLE) / CAST(ia.ni AS DOUBLE), 6)
        AS conf_a_to_b,
    round(CAST(rk.pair_orders AS DOUBLE) / CAST(ib.ni AS DOUBLE), 6)
        AS conf_b_to_a,
    round((CAST(rk.pair_orders AS DOUBLE) * CAST(nn.n AS DOUBLE))
          / (CAST(ia.ni AS DOUBLE) * CAST(ib.ni AS DOUBLE)), 6) AS lift
FROM rk
JOIN item ia ON ia.part = rk.part_a
JOIN item ib ON ib.part = rk.part_b
CROSS JOIN nn
WHERE rk.rule_rank <= {int(top_k)}
ORDER BY rk.rule_rank
"""


def degree_distribution(
    lineitem: DataFrame,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Degree histogram of the co-purchase graph — the one-page
    summary every graph pipeline prints before choosing an algorithm
    (a power-law tail means orientation tricks and skew salts; a flat
    histogram means plain hash joins are fine). Output: one row per
    distinct degree (0 included — parts never co-purchased) with node
    count and share.

    Exactness: degrees and counts are exact integers; ``node_share``
    is one division of two BIGINTs, 6-dp rounded.

    100 TB design: degree is already folded into the shared graph
    index (``__deg`` on the edge list), so this is one
    map-side-combinable count over node-grain rows plus a 1-row
    broadcast total — no edge-scale shuffle at all when the memo is
    passed.
    """
    if graph is not None:
        deg_edges, nodes = graph
        deg = deg_edges.select("src", "__deg").distinct()
    else:
        e = copurchase_edges(lineitem)
        deg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("__deg")
        )
        nodes = lineitem.select(F.col("l_partkey").alias("part")).distinct()
    node_deg = nodes.join(
        deg.select(F.col("src").alias("part"), "__deg"), "part", "left"
    ).select(
        F.coalesce("__deg", F.lit(0).cast("long")).alias("degree")
    )
    hist = node_deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    total = hist.agg(F.sum("n_nodes").cast("long").alias("__t"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "degree",
            "n_nodes",
            round_away(
                F.col("n_nodes").cast("double") / F.col("__t").cast("double"),
                6,
            ).alias("node_share"),
        )
        .orderBy("degree")
    )


DEGREE_DISTRIBUTION_SQL = f"""
WITH {COPURCHASE_EDGE_CTES},
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
nd AS (
    SELECT coalesce(d.deg, CAST(0 AS BIGINT)) AS degree
    FROM nodes n LEFT JOIN deg d ON d.src = n.part
),
hist AS (
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM nd GROUP BY 1
),
t AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS total FROM hist)
SELECT degree, n_nodes,
    round(CAST(n_nodes AS DOUBLE) / CAST(total AS DOUBLE), 6) AS node_share
FROM hist CROSS JOIN t
ORDER BY degree
"""


def link_prediction_cn(
    lineitem: DataFrame,
    seed_mod: int = 200,
    per_seed: int = 5,
    graph: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over the co-purchase graph —
    the "you may also buy" recommender: for every SEED part
    (``l_partkey % seed_mod == 0`` — the query-set convention the ANN
    tiers use), the ``per_seed`` best NON-adjacent partner parts by
    shared-neighbor count, with the neighborhood-Jaccard score.

    The query-set shape is the scale decision: exact ALL-pairs
    common-neighbor counting is Σ deg(center)² wedges — ~300 M on
    this uniform-degree corpus at sf0.1 (measured), and hub-capping
    cannot prune a graph whose degrees all sit near the mean. Seeding
    bounds the fan to Σ_{seed} Σ_{n∈N(seed)} deg(n) ≈ |seeds|·d̄² —
    linear in the seed count, the same query-set economics as
    :func:`~..similarity.ann_cosine_topk`. Production recommenders
    run exactly this shape (predictions for the items in today's
    batch, not for every pair in the catalog).

    Exactness: common-neighbor counts and degrees are exact integers;
    the per-seed rank is (cn desc, partner asc) — no float in the
    cut; ``jaccard`` = cn / (deg_a + deg_b − cn) is one division of
    exact integers, 6-dp rounded.

    Plan shape: seed adjacency filters the edge list (pushes to the
    memo scan), one center-keyed join expands seed wedges, the count
    is map-side combinable on (seed, partner), existing edges leave
    via anti-join, and the top-``per_seed`` window is partitioned by
    seed — thousands of independent partitions, no global sort.
    """
    if graph is not None:
        deg_edges, _nodes = graph
        e = deg_edges.select("src", "dst")
        deg = deg_edges.select("src", "__deg").distinct()
    else:
        e = copurchase_edges(lineitem)
        deg = e.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("__deg")
        )
    seed_adj = e.filter(F.col("src") % seed_mod == 0).select(
        F.col("src").alias("part_a"), F.col("dst").alias("__n")
    )
    wedge = seed_adj.join(
        e.select(F.col("src").alias("__n"), F.col("dst").alias("part_b")),
        "__n",
    ).filter(F.col("part_b") != F.col("part_a"))
    cn = wedge.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors")
    )
    non_edge = cn.join(
        e.select(F.col("src").alias("part_a"), F.col("dst").alias("part_b")),
        ["part_a", "part_b"],
        "left_anti",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("part_a").orderBy(
        F.desc("common_neighbors"), F.asc("part_b")
    )
    da = deg.select(F.col("src").alias("part_a"), F.col("__deg").alias("degree_a"))
    db = deg.select(F.col("src").alias("part_b"), F.col("__deg").alias("degree_b"))
    return (
        non_edge.withColumn("pred_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pred_rank") <= per_seed)
        .join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "pred_rank",
            "part_b",
            "common_neighbors",
            "degree_a",
            "degree_b",
            round_away(
                F.col("common_neighbors").cast("double")
                / (
                    F.col("degree_a") + F.col("degree_b")
                    - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("part_a", "pred_rank")
    )


def link_prediction_oracle_sql(seed_mod: int = 200, per_seed: int = 5) -> str:
    """DuckDB twin of :func:`link_prediction_cn` — same seed wedges,
    same anti-join, same integer per-seed rank and single-division
    Jaccard (generated from the same literals)."""
    return f"""
WITH {COPURCHASE_EDGE_CTES},
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
wedge AS (
    SELECT e1.src AS part_a, e2.dst AS part_b
    FROM e e1 JOIN e e2 ON e1.dst = e2.src
    WHERE e1.src % {int(seed_mod)} = 0 AND e2.dst <> e1.src
),
cn AS (
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS common_neighbors
    FROM wedge GROUP BY 1, 2
),
ne AS (
    SELECT cn.* FROM cn
    LEFT JOIN e ON e.src = cn.part_a AND e.dst = cn.part_b
    WHERE e.src IS NULL
),
rk AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY part_a
        ORDER BY common_neighbors DESC, part_b ASC) AS BIGINT)
        AS pred_rank
    FROM ne
)
SELECT rk.part_a, rk.pred_rank, rk.part_b, rk.common_neighbors,
    da.deg AS degree_a, db.deg AS degree_b,
    round(CAST(rk.common_neighbors AS DOUBLE)
          / CAST(da.deg + db.deg - rk.common_neighbors AS DOUBLE), 6)
        AS jaccard
FROM rk
JOIN deg da ON da.src = rk.part_a
JOIN deg db ON db.src = rk.part_b
WHERE rk.pred_rank <= {int(per_seed)}
ORDER BY rk.part_a, rk.pred_rank
"""
