"""Graph analytics over the relational tables — iterative algorithms
kept bit-exact across engines via fixed-point integer arithmetic.

The near-dup clustering operator (operators/dedup.neardup_clusters)
already covers connected components; this module adds the other
canonical distributed-graph workload, PageRank, expressed as plain
DataFrame joins + aggregations (the GraphX/Pregel loop is just
``join edges -> groupBy dst -> sum`` per superstep — no RDDs needed).

Determinism strategy (same spirit as x_kmeans_lloyd_exact's decimal
means): ranks live as BIGINT fixed-point (1.0 == 10^9). Every step is
integer division and integer sums, which both engines evaluate
identically regardless of aggregation order — so three full supersteps
stay under the driver's value-hash gate. Float PageRank would differ
in low bits by partial-agg order; fixed-point is also how you'd make a
100 TB PageRank run reproducible across cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..registry import register
from ..sources.catalog import load

_PR_ITERS = 3
_FP = 1_000_000_000  # fixed-point scale: 1.0 rank unit


_PAGERANK_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey::VARCHAR AS c_node,
                  's' || l.l_suppkey::VARCHAR AS s_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src),
pr(iter, node, rank) AS (
  SELECT 0, src, {_FP}::BIGINT FROM deg
  UNION ALL
  SELECT p.iter + 1, e.dst,
         {_FP * 15 // 100} + (85 * sum(p.rank // d.deg)) // 100
  FROM pr p
  JOIN deg d ON p.node = d.src
  JOIN edges e ON e.src = p.node
  WHERE p.iter < {_PR_ITERS}
  GROUP BY p.iter + 1, e.dst
)
SELECT node, rank FROM pr WHERE iter = {_PR_ITERS}
"""


@register(
    "x_pagerank",
    oracle=_PAGERANK_ORACLE,
    doc="Fixed-point PageRank over the undirected customer-supplier "
    "trade graph (edge iff a customer ordered from a supplier; both "
    "directions, so no dangling nodes): 3 full supersteps of "
    "rank' = 0.15 + 0.85 * sum(rank/deg), all in BIGINT fixed-point "
    "(1.0 == 1e9; integer division + integer sums are "
    "aggregation-order-independent, so the iterated result is "
    "bit-identical across engines AND cluster layouts — the float "
    "version is not). Spark side is the Pregel superstep as "
    "DataFrames: join(ranks, edges on src) -> groupBy(dst) -> sum, "
    "one key-shuffle per iteration, degree table joined on the same "
    "src key; DuckDB twin is a recursive CTE. At 100 TB: pre-partition "
    "edges by src so each superstep is a co-located join plus one "
    "shuffle on dst.",
    tags=("extension", "iterative", "graph"),
)
def x_pagerank(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c_node"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst")))
    # Lazy localCheckpoint (the dedup-CC idiom): every superstep joins
    # the edge table, and without the lineage cut each iteration would
    # re-derive lineitem->orders->distinct from scratch — the plan
    # re-executes the base derivation once per superstep (observed 19 s
    # -> ~3 s at sf0.1). Same trick MLlib uses in iterative algorithms.
    edges = edges.transform(lineage_cut_lazy)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src")

    ranks = deg.select(F.col("src").alias("node"), F.lit(_FP).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = edges_deg.join(
            ranks, edges_deg.src == ranks.node
        ).select("dst", F.expr("rank div deg").alias("contrib"))
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"{_FP * 15 // 100} + (85 * s) div 100").alias("rank"),
            )
        )
    return ranks


_TRIANGLE_ORACLE = """
WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst
  FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM oriented e1
  JOIN oriented e2 ON e2.src = e1.src AND e2.dst <> e1.dst
  JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT count(*) FROM edges)::BIGINT AS n_edges,
       (SELECT sum(deg * (deg - 1) // 2) FROM deg)::BIGINT AS n_wedges,
       n_triangles,
       3.0 * n_triangles / (SELECT sum(deg * (deg - 1) // 2) FROM deg)::DOUBLE
         AS global_clustering
FROM tri
"""


@register(
    "x_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc="Degree-oriented triangle counting over the part co-order "
    "graph (parts are adjacent iff some order contains both). The "
    "classic distributed formulation (Cohen / Suri-Vassilvitskii "
    "MapReduce triangle counting): canonicalize edges (u<v), orient "
    "every edge from its lower-(degree, id) endpoint to the higher "
    "one, and count paths e1=(a,b), e2=(a,c) closed by e3=(b,c). "
    "Orientation makes each triangle counted exactly once AND bounds "
    "the join fan-out per node by O(sqrt(E)) on skewed graphs — the "
    "all-pairs wedge join without orientation explodes on hub nodes. "
    "Output is the one-row graph census (nodes, edges, wedges, "
    "triangles, global clustering 3T/W — a single IEEE division, "
    "bit-exact both engines). At 100 TB: edges pre-partitioned by "
    "src co-locate both wedge-join probes; the per-order pair "
    "explosion is bounded by max order width (7 here), never "
    "quadratic in the table.",
    tags=("extension", "graph"),
)
def x_triangle_count(spark, sf_dir):
    pp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = pp.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("v")
    )
    edges = (
        pp.join(b, (pp.l_orderkey == b.o2) & (pp.l_partkey < b.v))
        .select(F.col("l_partkey").alias("u"), "v")
        .distinct()
    )
    # The wedge join consumes `edges` three times; cut the lineage so
    # the per-order pair explosion runs once (the pagerank idiom).
    edges = edges.transform(lineage_cut_lazy)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    lower = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .transform(lineage_cut_lazy)
    )
    e2 = oriented.select(F.col("src").alias("src2"), F.col("dst").alias("dst2"))
    e3 = oriented.select(F.col("src").alias("src3"), F.col("dst").alias("dst3"))
    # Scale adjudication (r9 sf1 proof, PROGRESS.jsonl): the first sf1
    # measurement read 64.5 MB -> 7.4 GB shuffle (115x for 10x edges),
    # which is a BROADCAST-THRESHOLD artifact, not quadratic growth —
    # at sf0.1 `oriented` fits the 64 MB broadcast and the wedge
    # stream never travels; at sf1 it doesn't, so the stream shuffles
    # once. The algorithmic quantities scale exactly 10x (wedges,
    # triangles, edges — disjoint replica subgraphs), and a rewrite
    # that pre-aggregated wedges by closing pair (b,c) to force
    # map-side combine was measured STRICTLY WORSE: same 7.4 GB at
    # sf1 (the pairs are too spread for partial combine) while
    # forfeiting the broadcast plan at small scale (750 MB and +48%
    # wall at sf0.1). The raw wedge stream at 3 BIGINTs/row IS the
    # minimal payload; orientation already bounds its size by
    # sum(outdeg^2). Keep the broadcast-when-possible form.
    tri = (
        oriented.join(
            e2, (F.col("src2") == F.col("src")) & (F.col("dst2") != F.col("dst"))
        )
        .join(e3, (F.col("src3") == F.col("dst")) & (F.col("dst3") == F.col("dst2")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    census = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(deg * (deg - 1) div 2)").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(census)
        .crossJoin(n_edges)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges").cast("double")).alias(
                "global_clustering"
            ),
        )
    )


_KCORE_K = 48
_KCORE_ROUNDS = 3

_KCORE_EDGES_SQL = """
pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey::VARCHAR AS c_node,
                  's' || l.l_suppkey::VARCHAR AS s_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
)
"""


def _kcore_oracle() -> str:
    # fixed peel rounds unrolled as plain CTEs (a recursive CTE may
    # reference itself only once, but each round needs the remaining
    # set on BOTH edge endpoints)
    ctes = ["r0 AS (SELECT DISTINCT src AS node FROM edges)"]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"r{r} AS (SELECT e.src AS node FROM edges e "
            f"JOIN r{r - 1} a ON e.src = a.node "
            f"JOIN r{r - 1} b ON e.dst = b.node "
            f"GROUP BY 1 HAVING count(*) >= {_KCORE_K})"
        )
    rounds = "\nUNION ALL\n".join(
        f"SELECT {r}::INT AS round, (SELECT count(*) FROM r{r})::BIGINT AS n_nodes"
        for r in range(_KCORE_ROUNDS + 1)
    )
    return f"WITH {_KCORE_EDGES_SQL}, {', '.join(ctes)}\n{rounds}"


@register(
    "x_kcore_peel",
    oracle=_kcore_oracle(),
    doc=f"k-core decomposition by iterative peeling (k={_KCORE_K}, "
    f"{_KCORE_ROUNDS} fixed rounds on the customer-supplier bipartite "
    "graph): each round drops nodes whose degree WITHIN the surviving "
    "subgraph is below k, and removals cascade (sf0.01 census: 1600 -> "
    "193 -> 148 -> 55). Per round: two semi-joins against the "
    "surviving node set + one degree aggregate — all key-partitioned "
    "shuffles; the node set is localCheckpoint'ed per round (the same "
    "round-boundary cut as pagerank) so round R never re-derives "
    "rounds 1..R-1. Integer degrees make every round bit-exact, so "
    "the ITERATED cascade sits under the hash gate via unrolled-CTE "
    "SQL. Output is the per-round survivor census (stable schema at "
    "any scale; membership is the r-th CTE).",
    tags=("extension", "graph", "iterative"),
)
def x_kcore_peel(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c_node"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionByName(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    ).transform(lineage_cut_lazy)

    nodes = edges.select(F.col("src").alias("node")).distinct().transform(
        lineage_cut_lazy
    )
    census = [(0, nodes.count())]
    for r in range(1, _KCORE_ROUNDS + 1):
        surv = (
            edges.join(nodes.withColumnRenamed("node", "src"), "src")
            .join(nodes.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        ).transform(lineage_cut_lazy)
        census.append((r, surv.count()))
        nodes = surv
    return spark.createDataFrame(census, "round int, n_nodes long")


_BFS_ROUNDS = 3
_BFS_SEED_MAX = 8  # seeds: customer nodes with custkey < 8


_BFS_EDGES_SQL = """
pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS c_node,
                  l.l_suppkey * 2 + 1 AS s_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
)
"""


def _bfs_oracle() -> str:
    ctes = [
        f"l0 AS (SELECT DISTINCT src AS node FROM edges "
        f"WHERE src % 2 = 0 AND src < {2 * _BFS_SEED_MAX})",
        "r0 AS (SELECT node FROM l0)",
    ]
    for r in range(1, _BFS_ROUNDS + 1):
        ctes.append(
            f"l{r} AS (SELECT DISTINCT e.dst AS node "
            f"FROM edges e JOIN l{r - 1} f ON e.src = f.node "
            f"EXCEPT SELECT node FROM r{r - 1})"
        )
        ctes.append(
            f"r{r} AS (SELECT node FROM r{r - 1} "
            f"UNION SELECT node FROM l{r})"
        )
    layers = "\nUNION ALL\n".join(
        f"SELECT {r}::INT AS dist, (SELECT count(*) FROM l{r})::BIGINT AS n_nodes"
        for r in range(_BFS_ROUNDS + 1)
    )
    return f"WITH {_BFS_EDGES_SQL}, {', '.join(ctes)}\n{layers}"


@register(
    "x_bfs_layers",
    oracle=_bfs_oracle(),
    doc=f"Multi-source BFS over the customer-supplier bipartite graph "
    f"(integer-encoded nodes: even = customer, odd = supplier — narrow "
    f"8-byte shuffle keys; seeds: customer nodes with key < {_BFS_SEED_MAX}; "
    f"{_BFS_ROUNDS} frontier expansions): per round, the frontier "
    "joins the edge table (key-partitioned shuffle), new nodes = "
    "neighbors EXCEPT already-reached, both sets "
    "localCheckpoint'ed at round boundaries (the pagerank/k-core "
    "cut). Set semantics are exact — no float anywhere — so the "
    "iterated layer census sits under the hash gate via unrolled-CTE "
    "SQL. The Pregel SSSP/reachability primitive next to pagerank "
    "(value propagation), k-core (peeling), and CC (label "
    "convergence); output is the per-distance layer census.",
    tags=("extension", "graph", "iterative"),
)
def x_bfs_layers(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Integer-encoded nodes (even = customer 2k, odd = supplier 2k+1):
    # the frontier joins ship 8-byte BIGINTs instead of 'c12345'
    # strings — the r7 shuffle audit measured the string form at
    # 40.7 MB shuffle write at sf0.1; narrow keys halve it.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
        .unionByName(
            pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
        )
        .transform(lineage_cut_lazy)
    )
    frontier = (
        edges.filter(
            (F.col("src") % 2 == 0) & (F.col("src") < 2 * _BFS_SEED_MAX)
        )
        .select(F.col("src").alias("node"))
        .distinct()
        .transform(lineage_cut_lazy)
    )
    reached = frontier
    census = [(0, frontier.count())]
    for r in range(1, _BFS_ROUNDS + 1):
        frontier = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .exceptAll(reached)
            .distinct()
            .transform(lineage_cut_lazy)
        )
        reached = reached.unionByName(frontier).distinct().transform(
            lineage_cut_lazy
    )
        census.append((r, frontier.count()))
    return spark.createDataFrame(census, "dist int, n_nodes long")
