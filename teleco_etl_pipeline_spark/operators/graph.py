"""Iterative graph algorithms as unrolled declarative plans.

The connected-components family (pointer-jumping, see
operators/dedup.py:neardup_clusters) covers undirected reachability;
this module adds weighted-importance ITERATION — PageRank — over a
graph derived from the warehouse itself: the customer↔supplier trade
graph (one edge per distinct trading pair in lineitem⋈orders, added
in BOTH directions so every connected node has out-degree ≥ 1 and no
dangling-mass bookkeeping is needed).

Scale design (100 TB): each iteration is one equi-join of the edge
list with the current rank vector on the node key plus a partial-
aggregated groupBy on dst — the Pregel message round as vanilla
shuffles. The iteration count is fixed and small, so the loop is
UNROLLED into a single logical plan (no driver-side collect loop, no
unbounded lineage); on a real cluster, bucket edges AND ranks by the
node key and the per-iteration shuffle disappears (co-located
joins). AQE handles the skewed-hub case (a node with millions of
in-edges) via skew-join splitting on the dst aggregation.

Cross-engine determinism (PARITY.md): ranks live in integer
micro-units (scale 10^12) and EVERY step is integer arithmetic —
`rank div outdeg` floor-division contributions, integer sums, and
integer damping: base (d_den−d_num)·scale div (d_den·n), update
base + d_num·Σcontrib div d_den. Spark's `div` and DuckDB's `//`
both truncate (identical on the all-positive values here), so both
engines compute THE SAME integer at every step — no float appears
anywhere. The textbook double formulation would put a summation-
order-dependent double behind a hashed column, exactly the round-6
failure class. Overflow bound: total rank mass only SHRINKS under
floor division (mass lost to truncation is dropped, not
redistributed), so per-node sums stay < scale = 10^12 and the
d_num·sum multiply stays < 10^14 ≪ 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table

_SCALE = 10**12
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as an exact rational
_ITERS = 3
_TOPK = 20

# Shared byte-aware broadcast gate (r14, replacing the r13 inline
# `n <= 2_000_000` row constants — r13 verdict issue #2): a superstep
# frame that the planner cannot size (LogicalRDD after localCheckpoint)
# is broadcast only while rows × payload bytes stays under a sane
# build-relation bound. 32 MiB keeps the old behaviour EXACTLY for the
# (long, long) frames the constant was tuned on (2M × 16 B = 32 MiB)
# while a wider frame behind the same gate now trips proportionally
# earlier — the §3.1 guidance the row-count constant could not honour.
_BCAST_CAP_BYTES = 32 * 1024 * 1024


def _fits_broadcast(n_rows: int, row_bytes: int) -> bool:
    """True when a bounded driver count says an unsized (checkpointed)
    frame of ``n_rows`` rows at ``row_bytes`` payload bytes per row is
    safe to pin as the broadcast side of a superstep join; callers fall
    back to the shuffled join past the gate (the sized-default
    pattern). ``row_bytes`` is the caller's per-row payload width: 16
    for the (long, long) rank/label/edge frames, 8 for node-only
    frontier sets."""
    return n_rows * row_bytes <= _BCAST_CAP_BYTES


def _pagerank_sql(iters: int, scale: int, d_num: int, d_den: int, topk: int) -> str:
    """Unrolled integer PageRank over CTEs ``edges(src, dst)``.

    Emitted once with `div` (Spark) or `//` (DuckDB) as the integer
    floor-division spelling — the ONLY dialect difference, so both
    engines run the structurally identical computation.
    """
    its = []
    prev = "r0"
    for i in range(1, iters + 1):
        its.append(
            f"""
    it{i} AS (
      SELECT e.dst AS node,
             (SELECT base FROM c)
               + ({d_num} * SUM(s.contrib)) IDIV {d_den} AS rank_units
      FROM edges e
      JOIN (SELECT r.node, r.rank_units IDIV od.outdeg AS contrib
            FROM {prev} r JOIN outdeg od ON r.node = od.src) s
        ON e.src = s.node
      GROUP BY e.dst
    )"""
        )
        prev = f"it{i}"
    return f"""
    WITH nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ),
    c AS (
      SELECT COUNT(*) AS n,
             (CAST({(d_den - d_num) * scale} AS BIGINT) IDIV ({d_den} * COUNT(*))) AS base
      FROM nodes
    ),
    outdeg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT node,
             CAST({scale} AS BIGINT) IDIV (SELECT n FROM c) AS rank_units
      FROM nodes
    ),{",".join(its)}
    SELECT node, CAST(rank_units AS BIGINT) AS rank_units
    FROM {prev}
    ORDER BY rank_units DESC, node
    LIMIT {topk}
    """


def _pagerank_sql_baked(
    n: int, iters: int, scale: int, d_num: int, d_den: int, topk: int
) -> str:
    """Spark-side twin of ``_pagerank_sql`` with the two node-count-
    derived constants baked as literals (computed at plan-build time
    with the same floor-division arithmetic, so the values are
    identical to what the oracle's ``c`` CTE derives in-engine).
    Removes four uncorrelated scalar-subquery JOBS from the plan —
    pure scheduling latency on a fixed-size constant.
    """
    base = ((d_den - d_num) * scale) // (d_den * n)
    r0 = scale // n
    its = []
    prev = "r0"
    for i in range(1, iters + 1):
        its.append(
            f"""
    it{i} AS (
      SELECT e.dst AS node,
             CAST({base} AS BIGINT)
               + ({d_num} * SUM(s.contrib)) div {d_den} AS rank_units
      FROM edges e
      JOIN (SELECT r.node, r.rank_units div od.outdeg AS contrib
            FROM {prev} r JOIN outdeg od ON r.node = od.src) s
        ON e.src = s.node
      GROUP BY e.dst
    )"""
        )
        prev = f"it{i}"
    return f"""
    WITH outdeg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT DISTINCT src AS node, CAST({r0} AS BIGINT) AS rank_units
      FROM edges
    ),{",".join(its)}
    SELECT node, CAST(rank_units AS BIGINT) AS rank_units
    FROM {prev}
    ORDER BY rank_units DESC, node
    LIMIT {topk}
    """


_EDGES_SQL_DUCK = """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT concat('C', CAST(c AS VARCHAR)) AS src,
             concat('S', CAST(s AS VARCHAR)) AS dst
      FROM pairs
      UNION ALL
      SELECT concat('S', CAST(s AS VARCHAR)), concat('C', CAST(c AS VARCHAR))
      FROM pairs
    ){body}
"""


def _body(dialect_idiv: str) -> str:
    body = _pagerank_sql(_ITERS, _SCALE, _D_NUM, _D_DEN, _TOPK)
    body = body.replace("IDIV", dialect_idiv)
    # splice: _pagerank_sql opens its own WITH; merge into the edges CTE
    return "," + body.strip().removeprefix("WITH")


@query(
    "trade_graph_pagerank",
    _EDGES_SQL_DUCK.format(body=_body("//")),
    doc="Integer PageRank (3 unrolled iterations, damping 85/100) "
    "over the bidirectional customer↔supplier trade graph from "
    "lineitem⋈orders — the iterative-graph operator family beyond "
    "pointer-jumping CC: supplier/customer systemic importance for "
    "risk weighting. Each iteration is one edge-join + dst-aggregate "
    "shuffle (Pregel round); the unrolled plan keeps it fully "
    "declarative. All arithmetic is integer micro-units with "
    "truncating division (Spark `div` ↔ DuckDB `//`), so every "
    "intermediate and the hashed output are engine-identical by "
    "construction — no float anywhere (PARITY.md).",
)
def q_trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # INTEGER node encoding (customer k -> 2k, supplier k -> 2k+1):
    # long join/groupBy keys run the supersteps ~45% faster than the
    # oracle's 'C123'/'S45' strings at sf0.1; the string labels are
    # rendered only in the final top-k projection, so the output is
    # identical. The encoding is exact for any key < 2^62.
    edges = pairs.selectExpr(
        "2 * o_custkey AS src", "2 * l_suppkey + 1 AS dst"
    ).unionAll(
        pairs.selectExpr("2 * l_suppkey + 1 AS src", "2 * o_custkey AS dst")
    )
    # The raw edge list is scanned twice (outdeg, wedges) before the
    # iterations take over the materialized wedges — checkpoint it so
    # the lineitem⋈orders distinct runs once. On a real cluster,
    # write the edge list bucketed by the node key instead and every
    # iteration join is co-located.
    edges = edges.localCheckpoint(eager=True)
    # Materialized supersteps (the k-core lesson), with the out-degree
    # FOLDED INTO THE EDGE LIST once up front: the per-iteration
    # rank⋈outdeg join of the naive spelling is redundant because
    # contrib = rank div outdeg distributes over the edge join — each
    # (src, dst, outdeg) row computes it after the single rank⋈edges
    # join, the same exact integer per src either way. That turns
    # every superstep into ONE equi-join + one partial-aggregated
    # groupBy (down from two joins), and the weighted edge list is
    # checkpointed so iterations scan materialized rows, not the
    # lineitem⋈orders lineage. The node set and count both come from
    # outdeg (the graph is symmetric, so every node appears as src) —
    # no separate distinct+count jobs. Arithmetic is the exact
    # integer sequence of the oracle: contrib = rank div outdeg,
    # rank' = base + (d_num * sum(contrib)) div d_den.
    outdeg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ).localCheckpoint(eager=True)
    n = outdeg.count()
    base = ((_D_DEN - _D_NUM) * _SCALE) // (_D_DEN * n)
    r0_units = _SCALE // n
    wedges = (
        edges.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    rank = outdeg.select(
        F.col("src").alias("node"),
        F.lit(r0_units).cast("long").alias("rank_units"),
    ).localCheckpoint(eager=True)
    # Superstep join side: a checkpointed rank is a LogicalRDD with
    # UNKNOWN size, so the planner sort-merges and the wedge list
    # pays an exchange per iteration. n is already a bounded driver
    # statistic, so gate a plan-time broadcast on it — fires at every
    # committed SF, falls back to the shuffled join when the node set
    # outgrows a sane broadcast (same sizing as the PPR core).
    bcast_ranks = _fits_broadcast(n, 16)  # (node, rank_units) longs
    for _ in range(_ITERS):
        rside = F.broadcast(rank) if bcast_ranks else rank
        rank = (
            wedges.join(rside, wedges["src"] == rank["node"])
            .select(
                "dst", F.expr("rank_units div outdeg").alias("contrib")
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({_D_NUM} * sum(contrib)) div {_D_DEN}")
                ).alias("rank_units")
            )
            .localCheckpoint(eager=True)
        )
    # Integer `div`, not true division: `/` goes through double and
    # is only exact for keys < 2^53, while the integer encoding is
    # valid for any key < 2^62.
    label = F.when(
        F.col("inode") % 2 == 0,
        F.concat(F.lit("C"), F.expr("inode div 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("S"), F.expr("(inode - 1) div 2").cast("string"))
    )
    # Decode BEFORE the top-k sort: the oracle breaks rank ties on
    # the STRING label, and integer order differs from string order.
    return (
        rank.select(
            F.col("node").alias("inode"),
            F.col("rank_units").cast("long").alias("rank_units"),
        )
        .select(label.alias("node"), "rank_units")
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(_TOPK)
    )


# --- personalized PageRank (seeded random walk with restart) -----------------
#
# The recommendation/neighborhood twin of global PageRank (Page et
# al. 1999 §6; Jeh & Widom WWW'03 "Scaling personalized web search"):
# the teleport mass returns to ONE seed node instead of spreading
# uniformly, so rank measures proximity to the seed — "which
# suppliers/customers sit closest to this customer's trading
# neighborhood". Same integer-unit discipline as trade_graph_pagerank
# (scale 10^12, damping 85/100, truncating div both engines, no float
# anywhere); the structural difference is SPARSITY: r0 is ONE row and
# each superstep's rank frame covers only the reached frontier, so
# per-iteration work is proportional to touched edges, not the graph
# (the push-style property that makes PPR the scalable personalization
# primitive at 100 TB — mass never materializes on unreached nodes).
# The reset row is UNION ALL'ed into the damped-contribution stream
# before a node-sum, the spelling both engines share exactly.

_PPR_TOPK = 20


def _ppr_sql(iters: int, scale: int, d_num: int, d_den: int, topk: int) -> str:
    """Unrolled integer personalized PageRank over CTEs
    ``edges(src, dst)`` + ``sd(seed)`` (1 row). ``IDIV`` is spliced to
    the dialect's integer floor division."""
    base = ((d_den - d_num) * scale) // d_den
    its = []
    prev = "r0"
    for i in range(1, iters + 1):
        its.append(
            f"""
    agg{i} AS (
      SELECT e.dst AS node,
             ({d_num} * SUM(s.contrib)) IDIV {d_den} AS ru
      FROM edges e
      JOIN (SELECT r.node, r.rank_units IDIV od.outdeg AS contrib
            FROM {prev} r JOIN outdeg od ON r.node = od.src) s
        ON e.src = s.node
      GROUP BY e.dst
    ),
    it{i} AS (
      SELECT node, SUM(ru) AS rank_units FROM (
        SELECT node, ru FROM agg{i}
        UNION ALL SELECT (SELECT seed FROM sd), {base}
      ) u{i} GROUP BY node
    )"""
        )
        prev = f"it{i}"
    return f"""
    outdeg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT (SELECT seed FROM sd) AS node,
             CAST({scale} AS BIGINT) AS rank_units
    ),{",".join(its)}
    SELECT node, CAST(rank_units AS BIGINT) AS rank_units
    FROM {prev}
    ORDER BY rank_units DESC, node
    LIMIT {topk}
    """


_PPR_EDGES_SQL_DUCK = """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sd AS (
      SELECT concat('C', CAST(c AS VARCHAR)) AS seed
      FROM pairs GROUP BY c
      ORDER BY COUNT(*) DESC, c ASC LIMIT 1
    ),
    edges AS (
      SELECT concat('C', CAST(c AS VARCHAR)) AS src,
             concat('S', CAST(s AS VARCHAR)) AS dst
      FROM pairs
      UNION ALL
      SELECT concat('S', CAST(s AS VARCHAR)), concat('C', CAST(c AS VARCHAR))
      FROM pairs
    ),{body}
"""


@query(
    "trade_graph_ppr",
    _PPR_EDGES_SQL_DUCK.format(
        body=_ppr_sql(_ITERS, _SCALE, _D_NUM, _D_DEN, _PPR_TOPK)
        .strip()
        .replace("IDIV", "//")
    ),
    doc="Personalized PageRank (Jeh & Widom WWW'03), 3 unrolled "
    "iterations at damping 85/100, seeded at the customer with the "
    "most distinct supplier relationships (count DESC / key ASC — "
    "deterministic): teleport mass returns to the SEED, so rank is "
    "proximity to that customer's trading neighborhood — the "
    "'suppliers and co-customers closest to this account' "
    "recommendation primitive. All arithmetic is the exact integer "
    "micro-unit sequence of trade_graph_pagerank (truncating div "
    "both engines, no float in the hash path); unlike the global "
    "walk, r0 is ONE row and each superstep's rank frame covers "
    "only the reached frontier — push-style sparsity, work "
    "proportional to touched edges rather than the whole graph.",
)
def q_trade_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # ONE materialization of the expensive lineitem⋈orders distinct:
    # it feeds the seed statistic, both union legs of the edge list,
    # and (through them) the outdeg aggregate. The previous shape
    # checkpointed EDGES (2x the rows) and then ran the seed .first()
    # off the LAZY pairs lineage — a second full join+distinct pass
    # over the fact tables for one driver literal (r13 optimization:
    # guide §2.4, recompute removal; measured 8.7 s -> see
    # OPTIMIZATION_r13.md).
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Seed = busiest customer: ONE bounded 1-row statistic (driver
    # literal), exact integer count with an ASC key tie-break — reads
    # the materialized pairs blocks, not the fact tables.
    seed_row = (
        pairs.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("o_custkey"))
        .first()
    )
    seed = 2 * int(seed_row["o_custkey"])
    # Exact node count (one bounded statistic over the materialized
    # pairs): the rank frontier never exceeds it, so it gates the
    # superstep broadcast — fires here and at every committed SF
    # (sf1: ~160k nodes), falls back to the shuffled join when a
    # 100 TB graph's node set outgrows a sane broadcast.
    nrow = pairs.agg(
        F.countDistinct("o_custkey").alias("nc"),
        F.countDistinct("l_suppkey").alias("ns"),
    ).first()
    n_nodes = int(nrow["nc"]) + int(nrow["ns"])
    # Integer node encoding (customer k -> 2k, supplier k -> 2k+1),
    # decoded to the oracle's C/S labels only in the final top-k —
    # same trick as trade_graph_pagerank. Both legs are narrow
    # projections of the checkpointed pairs, so no second
    # materialization is needed before the degree fold.
    edges = pairs.selectExpr(
        "2 * o_custkey AS src", "2 * l_suppkey + 1 AS dst"
    ).unionAll(
        pairs.selectExpr("2 * l_suppkey + 1 AS src", "2 * o_custkey AS dst")
    )
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    wedges = (
        edges.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    rank = personalized_pagerank_units(
        spark,
        wedges,
        seed,
        _ITERS,
        # (node, rank_units) longs — byte-aware sized gate (r14)
        broadcast_ranks=_fits_broadcast(n_nodes, 16),
    )
    label = F.when(
        F.col("inode") % 2 == 0,
        F.concat(F.lit("C"), F.expr("inode div 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("S"), F.expr("(inode - 1) div 2").cast("string"))
    )
    return (
        rank.select(F.col("node").alias("inode"), "rank_units")
        .select(label.alias("node"), "rank_units")
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(_PPR_TOPK)
    )


def personalized_pagerank_units(
    spark: SparkSession,
    wedges: DataFrame,
    seed: int,
    iters: int,
    scale: int = _SCALE,
    d_num: int = _D_NUM,
    d_den: int = _D_DEN,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Superstep core of :func:`q_trade_graph_ppr` over a weighted
    edge list ``wedges(src, dst, outdeg)`` — separated so unit tests
    can drive it on exact fixtures against a pure-Python mirror of
    the integer recurrence. Returns ``(node, rank_units)`` for the
    reached frontier after ``iters`` rounds.

    ``broadcast_ranks``: a checkpointed rank frame is a LogicalRDD
    with UNKNOWN size, so the planner sort-merges every superstep
    join and the full wedge list pays an exchange per iteration (AQE
    converts to broadcast at runtime, but only after the wedge
    shuffle stage has already materialized). When the CALLER can
    bound the frontier (rank rows ≤ node count, known from one
    bounded statistic), passing True pins the broadcast at plan time
    and the wedge list is never shuffled — the sized-default pattern
    (caller gates on the bound; values identical either way,
    measured ~1.3 s/run at sf0.1 in OPTIMIZATION_r13.md)."""
    from pyspark.sql import functions as F

    base = ((d_den - d_num) * scale) // d_den
    rank = spark.createDataFrame(
        [(seed, scale)], "node long, rank_units long"
    )
    for _ in range(iters):
        rside = F.broadcast(rank) if broadcast_ranks else rank
        contrib = (
            wedges.join(rside, wedges["src"] == rank["node"])
            .select("dst", F.expr("rank_units div outdeg").alias("contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.expr(f"({d_num} * sum(contrib)) div {d_den}")
                .cast("long")
                .alias("ru")
            )
        )
        reset = spark.createDataFrame([(seed, base)], "node long, ru long")
        rank = (
            contrib.unionByName(reset)
            .groupBy("node")
            .agg(F.sum("ru").cast("long").alias("rank_units"))
            .localCheckpoint(eager=True)
        )
    return rank


# --- triangle counting + k-core over the co-fulfillment graph ---------------
#
# Graph: suppliers are connected when they co-fulfilled >= _MIN_CO
# distinct orders (lineitem self-join on l_orderkey, undirected,
# stored once as u < v). The threshold is the standard sparsifier
# for co-occurrence graphs — without it every frequent pair connects
# and the projection of a bipartite fact table degenerates toward a
# clique.
#
# Scale design (100 TB): triangle enumeration uses the DEGREE-ORDERED
# orientation (Suri & Vassilvitskii, WWW'11 "Counting triangles and
# the curse of the last reducer"): each undirected edge is directed
# from its lower-(degree, id) endpoint to the higher one, making the
# graph a DAG where every node's out-degree is O(sqrt(|E|)) — the
# wedge-generating self-join (o1.b = o2.a) fans out per LOW-degree
# endpoint only, so a celebrity hub with millions of neighbors
# generates no quadratic wedge blowup. Each triangle is counted
# exactly once (the orientation is acyclic), as two shuffle joins +
# one aggregate. k-core runs the peeling recurrence (drop nodes with
# in-subgraph degree < k) as _KCORE_ITERS unrolled rounds — like the
# PageRank above, a fixed small iteration count keeps the plan fully
# declarative with no driver-side loop; the reported trajectory
# (nodes/edges per round) makes convergence visible instead of
# assumed.
#
# Cross-engine determinism: counts and keys only — no float anywhere;
# COUNT outputs are CAST AS BIGINT for the oracle-type lint.

_MIN_CO = 5
_KCORE_K = 60
_KCORE_ITERS = 3
_TRI_TOPK = 20

_COFULFILL_EDGES_DUCK = """
    WITH ds AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ds a
      JOIN ds b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
      HAVING COUNT(*) >= {min_co}
    )"""


def _triangle_body(topk: int) -> str:
    """Dialect-shared SQL over a CTE ``edges(u, v)`` with u < v."""
    return f"""
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) both_ends GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.u ELSE e.v END AS a,
             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.v ELSE e.u END AS b
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM o o1
      JOIN o o2 ON o2.a = o1.b
      JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b
    ),
    per_node AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri
      ) corners GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS s_suppkey,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM per_node
    ORDER BY n_triangles DESC, s_suppkey
    LIMIT {topk}
    """


def _kcore_body(k: int, iters: int) -> str:
    """Dialect-shared unrolled k-core peeling over ``edges(u, v)``."""
    parts = []
    prev = "edges"
    for i in range(1, iters + 1):
        parts.append(
            f"""
    d{i} AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
      ) both_ends{i} GROUP BY node
    ),
    n{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),
    e{i} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN n{i} a ON a.node = e.u
      JOIN n{i} b ON b.node = e.v
    )"""
        )
        prev = f"e{i}"
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS iter, "
        f"CAST((SELECT COUNT(*) FROM n{i}) AS BIGINT) AS n_nodes, "
        f"CAST((SELECT COUNT(*) FROM e{i}) AS BIGINT) AS n_edges"
        for i in range(1, iters + 1)
    )
    return ",".join(parts) + f"\n    {selects}\n    ORDER BY iter\n"


def _cofulfill_edges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-fulfillment edges via the basket-array formulation: one
    groupBy(order) collecting the supplier set, then pairs exploded
    from the sorted array — fan-out bounded by basket size (the
    `part_basket_lift` precedent), ONE wide shuffle on the order key
    instead of the naive self-join's pair-stream shuffle (which moves
    |basket|² rows per order; the oracle keeps that naive form as the
    equivalence proof). The pair aggregate that applies the >= _MIN_CO
    threshold then shuffles only distinct candidate pairs."""
    from pyspark.sql import functions as F

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("supps"))
        .filter(F.size("supps") >= 2)
    )
    # Pair enumeration as two codegen'd generators (posexplode +
    # explode over a slice) instead of the nested higher-order
    # transform lambdas, which Catalyst evaluates INTERPRETED per
    # element (r14, guide §4.1/§1.2 per-task work): identical 47,703
    # edges at sf0.1, ABBA-interleaved [1.58, 1.42, 1.65, 1.75] →
    # [1.22, 1.30, 1.08, 1.38] s for the full edge build — and the
    # interpreted-lambda cost this removes scales with the PAIR
    # count, exactly what grows at 100 TB.
    p = baskets.select(
        F.col("supps"), F.posexplode("supps").alias("i", "u")
    )
    pairs = p.select(
        "u",
        F.explode(
            F.slice(
                F.col("supps"),
                F.col("i") + 2,
                F.size("supps") - F.col("i") - 1,
            )
        ).alias("v"),
    )
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _MIN_CO)
        .select("u", "v")
    )


def _degree_and_corners(edges):
    """Shared Suri-Vassilvitskii triangle machinery over cached
    ``edges(u, v)`` (u < v): returns (deg(node, deg), corners(node))
    — one row per (triangle, member). Degree-ordered orientation
    bounds wedge fan-out by the LOW-degree endpoint, so hub nodes
    cannot trigger the quadratic last-reducer blowup. The
    multiply-referenced frames are CACHED: the SQL spelling (kept
    verbatim as the oracles) inlines the `o` CTE 3x and `tri` 3x,
    and Spark's CTE inlining turns that into 9 recomputations of the
    orientation join — measured 3.5 s at sf0.1 against ~1 s with
    materialized reuse. Caches are edge-list-sized and released by
    the suite's clearCache()."""
    from pyspark.sql import functions as F

    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    e = edges.alias("e")
    low_first = (F.col("du.deg") < F.col("dv.deg")) | (
        (F.col("du.deg") == F.col("dv.deg")) & (F.col("e.u") < F.col("e.v"))
    )
    o = (
        e.join(du, F.col("du.node") == F.col("e.u"))
        .join(dv, F.col("dv.node") == F.col("e.v"))
        .select(
            F.when(low_first, F.col("e.u")).otherwise(F.col("e.v")).alias("a"),
            F.when(low_first, F.col("e.v")).otherwise(F.col("e.u")).alias("b"),
        )
        .cache()
    )
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    tri = (
        o1.join(o2, F.col("o2.a") == F.col("o1.b"))
        .join(
            o3,
            (F.col("o3.a") == F.col("o1.a")) & (F.col("o3.b") == F.col("o2.b")),
        )
        .select(
            F.col("o1.a").alias("x"),
            F.col("o1.b").alias("y"),
            F.col("o2.b").alias("z"),
        )
        .cache()
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return deg, corners


def _driver_triangle_stats(
    es: list[tuple[int, int]],
) -> tuple[dict[int, int], dict[int, int]]:
    """Exact per-node (degree, triangle-membership count) over a
    collected undirected edge list (u < v, no duplicates) — the
    driver twin of :func:`_degree_and_corners`'s corner aggregate,
    used under the ``_DRIVER_GRAPH_MAX_EDGES`` gate (the ktruss /
    kcore r13 pattern). All integers, so equality with the
    distributed enumeration is exact (pinned by
    test_triangle_driver_matches_distributed).

    Two regimes: a dense float64 adjacency matmul when the node set
    is small (the co-fulfillment graph is near-complete, so per-node
    T via diag(A³)/2 — BLAS, exact: every count ≤ n < 2⁵³), else
    per-node neighbor-set intersections (T_v = ½ Σ_{x∈adj v}
    |adj(v) ∩ adj(x)|, linear in Σ deg intersections — right for the
    sparse volume-scaled graphs)."""
    import numpy as np

    deg: dict[int, int] = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    nodes = sorted(deg)
    if len(nodes) <= 4096:
        idx = {n: i for i, n in enumerate(nodes)}
        a = np.zeros((len(nodes), len(nodes)))
        for u, v in es:
            a[idx[u], idx[v]] = 1.0
            a[idx[v], idx[u]] = 1.0
        # ((A²)∘A)·1 = 2·T_v: integer-valued float64 throughout
        t2 = ((a @ a) * a).sum(axis=1)
        tri = {n: int(t2[idx[n]]) // 2 for n in nodes}
    else:
        adj: dict[int, set[int]] = {n: set() for n in nodes}
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        tri = {
            n: sum(len(adj[n] & adj[x]) for x in adj[n]) // 2 for n in nodes
        }
    return deg, tri


@query(
    "supplier_triangle_count",
    _COFULFILL_EDGES_DUCK.format(min_co=_MIN_CO)
    + ","
    + _triangle_body(_TRI_TOPK).strip(),
    doc="Top-20 suppliers by triangle membership in the >= "
    f"{_MIN_CO}-co-orders co-fulfillment graph. Degree-ordered "
    "orientation (Suri-Vassilvitskii) bounds wedge fan-out by the "
    "LOW-degree endpoint, so hub nodes cannot trigger the quadratic "
    "last-reducer blowup; two equi-joins + one aggregate, all "
    "integer. Local triangle support is the classic cohesion / "
    "link-spam signal over co-occurrence graphs.",
)
def q_supplier_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    edges = _cofulfill_edges_spark(spark, sf_dir).cache()
    # SIZED default (r14, the ktruss/kcore r13 pattern): the
    # distributed path materializes the full triangle list (~|V|³/6
    # rows on this near-complete graph — 4.9M rows at sf0.1) to count
    # corners; under the gate one collected edge list yields the
    # identical integer counts without enumerating a single triangle.
    # Distributed path unchanged past the gate.
    if edges.count() <= _DRIVER_GRAPH_MAX_EDGES:
        es = [(int(r["u"]), int(r["v"])) for r in edges.collect()]
        edges.unpersist()
        _, tri = _driver_triangle_stats(es)
        rows = sorted(
            ((n, t) for n, t in tri.items() if t > 0),
            key=lambda r: (-r[1], r[0]),
        )[:_TRI_TOPK]
        return spark.createDataFrame(
            rows, "s_suppkey long, n_triangles long"
        ).orderBy(F.desc("n_triangles"), "s_suppkey")
    _, corners = _degree_and_corners(edges)
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select(
            F.col("node").cast("long").alias("s_suppkey"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
        .orderBy(F.col("n_triangles").desc(), "s_suppkey")
        .limit(_TRI_TOPK)
    )


def _clustering_body(topk: int) -> str:
    """Dialect-shared SQL over ``edges(u, v)``: per-node local
    clustering coefficient 2T/(d(d-1)) for nodes with degree >= 2."""
    return f"""
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) both_ends GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.u ELSE e.v END AS a,
             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.v ELSE e.u END AS b
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM o o1
      JOIN o o2 ON o2.a = o1.b
      JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b
    ),
    per_node AS (
      SELECT node, COUNT(*) AS t FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri
      ) corners GROUP BY node
    )
    SELECT CAST(d.node AS BIGINT) AS s_suppkey,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * COALESCE(p.t, 0)
                 / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1))
                 + 1e-9, 6) AS clustering
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    WHERE d.deg >= 2
    ORDER BY clustering DESC, s_suppkey
    LIMIT {topk}
    """


@query(
    "supplier_clustering_coefficient",
    _COFULFILL_EDGES_DUCK.format(min_co=_MIN_CO)
    + ","
    + _clustering_body(_TRI_TOPK).strip(),
    doc="Per-node LOCAL clustering coefficient over the co-"
    "fulfillment graph: C_v = 2*T_v / (deg_v*(deg_v-1)) (Watts & "
    "Strogatz 1998) — how close each supplier's neighborhood is to "
    "a clique, the community-tightness / link-farm signal that raw "
    "triangle COUNTS (supplier_triangle_count) miss because hubs "
    "accumulate triangles by degree alone. Shares the degree-"
    "ordered Suri-Vassilvitskii triangle machinery (one oriented "
    "wedge join, fan-out bounded by the LOW-degree endpoint); the "
    "coefficient is an exact rational of two integer aggregates, "
    "one double division at display with the shared ROUND guard. "
    "Top-20 by coefficient with id tiebreak; degree-1 nodes "
    "excluded (the coefficient is undefined).",
)
def q_supplier_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    edges = _cofulfill_edges_spark(spark, sf_dir).cache()
    # SIZED default (r14): same gate + exact integer (deg, T_v) twin
    # as supplier_triangle_count; the double coefficient mirrors the
    # Spark expression op-for-op (2.0·T / (d·(d−1)) + 1e-9, then the
    # half-up ROUND replica from operators/quantiles.half_up), so the
    # emitted doubles are bit-identical (pinned by
    # test_clustering_driver_matches_distributed).
    if edges.count() <= _DRIVER_GRAPH_MAX_EDGES:
        from teleco_etl_pipeline_spark.operators.quantiles import half_up

        es = [(int(r["u"]), int(r["v"])) for r in edges.collect()]
        edges.unpersist()
        dg, tri = _driver_triangle_stats(es)
        rows = []
        for n, d in dg.items():
            if d < 2:
                continue
            t = tri.get(n, 0)
            c = half_up(
                (2.0 * float(t)) / (float(d) * (float(d) - 1)) + 1e-9, 6
            )
            rows.append((n, d, t, c))
        rows.sort(key=lambda r: (-r[3], r[0]))
        return spark.createDataFrame(
            rows[:_TRI_TOPK],
            "s_suppkey long, degree long, n_triangles long, clustering double",
        ).orderBy(F.desc("clustering"), "s_suppkey")
    deg, corners = _degree_and_corners(edges)
    per_node = corners.groupBy("node").agg(F.count(F.lit(1)).alias("t"))
    degd = F.col("deg").cast("double")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").cast("long").alias("s_suppkey"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0 * F.coalesce(F.col("t"), F.lit(0))
                / (degd * (degd - 1))
                + F.lit(1e-9),
                6,
            ).alias("clustering"),
        )
        .orderBy(F.col("clustering").desc(), "s_suppkey")
        .limit(_TRI_TOPK)
    )


@query(
    "supplier_kcore_peel",
    _COFULFILL_EDGES_DUCK.format(min_co=_MIN_CO)
    + ","
    + _kcore_body(_KCORE_K, _KCORE_ITERS).strip(),
    doc=f"Unrolled {_KCORE_ITERS}-round k-core peeling (k={_KCORE_K}) "
    "of the co-fulfillment graph: per round, drop nodes whose "
    "IN-SUBGRAPH degree fell below k, then restrict the edge list to "
    "survivors; the (iter, n_nodes, n_edges) trajectory shows "
    "convergence instead of assuming it. The dense-cohesive-subgraph "
    "primitive for community seeding / fraud rings; each round is "
    "one degree aggregate + one semi-join pair — no driver loop.",
)
def q_supplier_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    # Iterative peeling MATERIALIZES each superstep (the Pregel/
    # GraphX model): every round's pruned edge list is consumed by
    # the next round's degree aggregate (twice), its join probe, and
    # the round's stats — four consumers. All lazy spellings were
    # measured and lose: the SQL CTE unroll inlines to an
    # exponential recompute tree (5.6 s at sf0.1), lazy .cache()
    # dedups nothing across concurrent first consumers (7.9 s), and
    # the no-cache exchange-reuse form explodes under AQE's
    # per-consumer replanning (29 s). Eager localCheckpoint per
    # round: 3.5 s warm, and the round frames are pruned-edge-list-
    # sized. On a real cluster use reliable checkpoints (executor
    # loss drops localCheckpoint blocks) — same shape, durable
    # storage.
    edges = _cofulfill_edges_spark(spark, sf_dir).cache()
    # SIZED default (r13, the part_ktruss_peel pattern): under the
    # gate, peel on the driver — per round keep nodes with degree
    # ≥ k, keep edges with both endpoints kept, report
    # (iter, |keep|, |edges'|): the identical integers the
    # distributed rounds below compute (pinned by
    # test_kcore_driver_matches_superstep_loop).
    n_edges0 = edges.count()
    if n_edges0 <= _DRIVER_GRAPH_MAX_EDGES:
        es = [(int(r["u"]), int(r["v"])) for r in edges.collect()]
        edges.unpersist()
        rows = []
        for i in range(1, _KCORE_ITERS + 1):
            deg: dict[int, int] = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= _KCORE_K}
            es = [(u, v) for u, v in es if u in keep and v in keep]
            rows.append((i, len(keep), len(es)))
        return spark.createDataFrame(
            rows, "iter long, n_nodes long, n_edges long"
        ).orderBy("iter")
    prev = edges
    stats = None
    # Per-round broadcast hints on `keep` were MEASURED AND REJECTED
    # here (r14): ABBA-interleaved forced-distributed probes at sf0.1
    # read broadcast [7.8, 5.3, 5.2, 5.0] vs shuffled
    # [4.4, 3.8, 4.4, 3.5] s — each broadcast build is a per-round
    # driver barrier, and at any scale this fallback is actually
    # reachable from, the surviving edge list's exchange is small
    # enough that AQE's runtime SMJ→broadcast conversion already
    # covers the win the hint was meant to pin. See
    # OPTIMIZATION_r14.md and SCALING_r14.json's forced rows.
    for i in range(1, _KCORE_ITERS + 1):
        deg = (
            prev.select(F.col("u").alias("node"))
            .unionAll(prev.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = (
            deg.filter(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
        ka, kb = keep.alias("ka"), keep.alias("kb")
        e = prev.alias("e")
        nxt = (
            e.join(ka, F.col("ka.node") == F.col("e.u"))
            .join(kb, F.col("kb.node") == F.col("e.v"))
            .select("e.u", "e.v")
            .localCheckpoint(eager=True)
        )
        row = keep.agg(
            F.lit(i).cast("long").alias("iter"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        ).crossJoin(nxt.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        stats = row if stats is None else stats.unionByName(row)
        prev = nxt
    return stats.orderBy("iter")


# --- label propagation communities (synchronous LPA) -------------------------
#
# Raghavan et al. PRE'07 ("Near linear time algorithm to detect
# community structures"): init label(v) = v, then each round every
# node adopts the most frequent label among its NEIGHBORS (count
# DESC, label ASC tie-break — the deterministic synchronous variant;
# the paper's random tie-break trades determinism for oscillation
# resistance, and 2 fixed rounds cannot oscillate). Completes the
# graph family's missing primitive: CC answers reachability, LPA
# answers cohesion GROUPING without a density parameter (k-core's k)
# — the standard cheap community detector for co-occurrence graphs.
#
# Scale: per round one edge join (labels onto neighbor endpoints) +
# one (node, label) vote aggregate + a NODE-partitioned top-1 window
# — every shuffle keyed, the window bounded per node by its degree,
# labels frame node-sized, eager localCheckpoint per round (the
# k-core lesson above). All-integer; no floats anywhere.

_LPA_ITERS = 2
_LPA_TOPK = 10
# LPA runs on the PART co-purchase graph, not the supplier
# co-fulfillment one: the supplier graph at >= 5 co-orders is a
# near-clique (LPA correctly collapses it to ONE community — no
# structure to find), while parts co-bought enough times form
# hundreds of distinct communities at sf0.01 (basket-driven item
# clusters, the market-basket twin of part_basket_lift).
#
# THE co-occurrence cut is VOLUME-SCALED (the r9 verdict's #2 ask,
# promoted from a measured side knob to the registered default):
# co-occurrence counts grow linearly with order volume, so an
# absolute cut lets the graph densify until wedge enumeration is
# quadratic — measured at the r9 sf1 point: fixed min_co=2 ->
# 1,196,000 edges / 34 s, volume-scaled min_co=20 -> the IDENTICAL
# 3,573-edge graph at 0.69 s. The rule min_co = max(2,
# ceil(n_orders / 75,000)) is exact-integer in both engines
# (ceil-div; the DuckDB twin is (COUNT(*) + 74999) // 75000 in a
# 1-row CTE, so ONE static oracle string is correct at every SF)
# and reproduces min_co=2 at every committed SF (identical verified
# output) and min_co=20 at sf1 — the same sized-default pattern as
# the ANN family's bit_length(ceil(N/target)) plane rule.
_LPA_MIN_CO_FLOOR = 2
_LPA_CO_PER_ORDERS = 75_000

_PART_EDGES_DUCK = f"""
    WITH mc AS (
      SELECT GREATEST({_LPA_MIN_CO_FLOOR},
                      (COUNT(*) + {_LPA_CO_PER_ORDERS - 1})
                        // {_LPA_CO_PER_ORDERS}) AS min_co
      FROM orders
    ),
    ds AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM ds a
      JOIN ds b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= (SELECT min_co FROM mc)
    )"""

# Fixed-cut curve (scaling reference only — NOT the production
# default): the absolute min_co=2 edge graph at every SF.
_PART_EDGES_DUCK_FIXED = """
    WITH ds AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM ds a
      JOIN ds b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    )"""


def _lpa_body(iters: int, topk: int) -> str:
    parts = [
        """
    und AS (
      SELECT u AS a, v AS b FROM edges
      UNION ALL SELECT v AS a, u AS b FROM edges
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS lab FROM und)"""
    ]
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(
            f"""
    v{i} AS (
      SELECT e.a AS node, l.lab AS lab, COUNT(*) AS c
      FROM und e JOIN {prev} l ON l.node = e.b
      GROUP BY e.a, l.lab
    ),
    l{i} AS (
      SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lab ASC) AS rn
        FROM v{i}
      ) r{i} WHERE rn = 1
    )"""
        )
        prev = f"l{i}"
    return ",".join(parts) + f"""
    SELECT CAST(lab AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM {prev}
    GROUP BY lab
    ORDER BY n_members DESC, community
    LIMIT {topk}
    """


def _part_edges_spark(
    spark: SparkSession, sf_dir: str, min_co: int | None = None
) -> DataFrame:
    """Part co-purchase edges via the same basket-array formulation
    as :func:`_cofulfill_edges_spark` (fan-out bounded by basket
    size, one wide shuffle on the order key).

    ``min_co=None`` (the registered default) volume-scales the
    co-occurrence cut: ``max(2, ceil(n_orders / 75,000))`` from one
    bounded driver count — see the ``_LPA_CO_PER_ORDERS`` contract
    comment. Pass an explicit ``min_co`` only for the fixed-cut
    scaling-reference curve."""
    from pyspark.sql import functions as F

    if min_co is None:
        n_orders = load_table(spark, sf_dir, "orders").count()
        min_co = max(
            _LPA_MIN_CO_FLOOR, -(-n_orders // _LPA_CO_PER_ORDERS)
        )
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    # Codegen'd generator pair enumeration — see the
    # _cofulfill_edges_spark comment (r14; identical edges, the
    # interpreted nested-transform lambdas removed).
    p = baskets.select(F.col("ps"), F.posexplode("ps").alias("i", "u"))
    pairs = p.select(
        "u",
        F.explode(
            F.slice(
                F.col("ps"), F.col("i") + 2, F.size("ps") - F.col("i") - 1
            )
        ).alias("v"),
    )
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_co)
        .select("u", "v")
    )


@query(
    "part_lpa_communities",
    _PART_EDGES_DUCK
    + ","
    + _lpa_body(_LPA_ITERS, _LPA_TOPK).strip(),
    doc=f"Synchronous label propagation (Raghavan PRE'07), "
    f"{_LPA_ITERS} unrolled rounds over the part co-purchase graph "
    "(parts co-bought in >= max(2, ceil(n_orders/75k)) orders — the "
    "volume-scaled cut, exact-integer in both engines): every node "
    "adopts its neighbors' most frequent label (count DESC / label "
    "ASC tie-break — fully deterministic), reporting the "
    f"top-{_LPA_TOPK} communities by size. The parameter-free "
    "community detector completing the graph family "
    "(CC = reachability, k-core = density, LPA = cohesion grouping); "
    "per round one keyed edge join + vote aggregate + "
    "node-partitioned top-1 window, all integer.",
)
def q_part_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Eager localCheckpoint, not cache(): the edge frame is consumed
    # by both union legs of every superstep, and cache() left a
    # resident storage entry after the final action (r9 ADVICE) —
    # checkpoint materializes once and needs no unpersist bookkeeping.
    edges = _part_edges_spark(spark, sf_dir).localCheckpoint(eager=True)
    und = edges.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    ).localCheckpoint(eager=True)
    # Node count = label rows (cheap on the materialized frame):
    # gates a plan-time broadcast of the label frame in every vote
    # join — a checkpointed frame is a LogicalRDD with unknown size,
    # so the planner would otherwise sort-merge and exchange BOTH
    # sides per round (the PPR superstep lesson, OPTIMIZATION_r13.md);
    # shuffled join remains the fallback past the gate.
    bcast_labels = _fits_broadcast(labels.count(), 16)  # (node, lab) longs
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(_LPA_ITERS):
        lside = F.broadcast(labels) if bcast_labels else labels
        votes = (
            und.join(lside, und["b"] == labels["node"])
            .groupBy(und["a"].alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("lab").cast("long").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(_LPA_TOPK)
    )


# --- common-neighbor link prediction ------------------------------------------
#
# The classic structural link predictor (Liben-Nowell & Kleinberg
# CIKM'03): non-adjacent pairs ranked by how many neighbors they
# share. All-integer (the common-neighbors score; Adamic-Adar's
# 1/log(deg) weights would put a float in the hash path for no
# semantic gain here). Wedges are enumerated from each center's
# sorted adjacency ARRAY (the basket-pair shape used by
# part_basket_lift and the edge builders) — fan-out is deg(z)²/2
# bounded per center, one wide shuffle on the center key; existing
# edges are removed with a left-anti join and the result TakeOrdered.
# At 100 TB the standard hub guard applies: super-hub centers
# contribute low-information wedges and should be degree-capped
# before enumeration (same knob as the frequent-shingle guard).
#
# THE threshold contract (measured at the r9 sf1 point, promoted to
# the registered default in r10): co-occurrence counts grow linearly
# with orders, so an absolute cut lets the graph densify until wedge
# enumeration is quadratic. Measured: sf0.1 @ min_co=2 -> 3,573
# edges / 1.5 s; sf1 @ min_co=2 -> 1,196,000 edges / 34 s (the
# fixed-threshold densification); sf1 @ volume-scaled min_co=20 ->
# the IDENTICAL 3,573-edge graph at 0.69 s. The registered query now
# uses the volume-scaled cut (see _LPA_CO_PER_ORDERS — shared with
# part_lpa_communities, oracle-checkable at every SF); the fixed
# min_co=2 configuration stays registered as
# part_link_prediction_fixed2, the scaling-reference curve.

_LINKPRED_TOPK = 15


_LINKPRED_BODY_DUCK = (
    """,
    und AS (
      SELECT u AS a, v AS b FROM edges
      UNION ALL SELECT v AS a, u AS b FROM edges
    ),
    wedge AS (
      SELECT e1.a AS x, e2.b AS y
      FROM und e1 JOIN und e2 ON e1.b = e2.a AND e1.a < e2.b
    ),
    cand AS (
      SELECT x, y, COUNT(*) AS common_neighbors
      FROM wedge
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u = wedge.x AND e.v = wedge.y
      )
      GROUP BY x, y
    )
    SELECT CAST(x AS BIGINT) AS part_a, CAST(y AS BIGINT) AS part_b,
           CAST(common_neighbors AS BIGINT) AS common_neighbors
    FROM cand
    ORDER BY common_neighbors DESC, part_a, part_b
    LIMIT """
    + str(_LINKPRED_TOPK)
)


@query(
    "part_link_prediction",
    _PART_EDGES_DUCK + _LINKPRED_BODY_DUCK,
    doc="Common-neighbor link prediction (Liben-Nowell & Kleinberg "
    "CIKM'03) over the part co-purchase graph: top-"
    f"{_LINKPRED_TOPK} NON-adjacent part pairs by shared-neighbor "
    "count — the 'frequently bought with the same things, never "
    "together yet' recommendation/completion signal. The edge cut is "
    "VOLUME-SCALED (max(2, ceil(n_orders/75k)) — identical verified "
    "output at the committed SFs, flat instead of ×23 at sf1; see "
    "the _LPA_CO_PER_ORDERS contract). Wedge pairs enumerated per "
    "center from its sorted adjacency array (fan-out deg²/2 per "
    "center, one keyed shuffle), existing edges removed by "
    "anti-join, all integer.",
)
def q_part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _link_prediction_df(spark, sf_dir, min_co=None)


@query(
    "part_link_prediction_fixed2",
    _PART_EDGES_DUCK_FIXED + _LINKPRED_BODY_DUCK,
    doc="FIXED-cut curve of part_link_prediction (absolute min_co=2 "
    "at every scale; sf1 measured 1.2M edges / 34 s vs the "
    "volume-scaled default's identical 3,573-edge graph at 0.69 s) "
    "— the honest fixed-config scaling reference, not the "
    "production path.",
)
def q_part_link_prediction_fixed2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _link_prediction_df(spark, sf_dir, min_co=_LPA_MIN_CO_FLOOR)


# --- resource-allocation link prediction -------------------------------------
#
# The degree-aware refinement of common neighbors (Zhou, Lü & Zhang,
# Eur. Phys. J. B 2009): a shared HUB says little (everything passes
# through it), a shared low-degree neighbor is strong evidence, so
# each wedge center z contributes 1/deg(z) instead of 1. RA
# consistently beats plain CN and Adamic-Adar's 1/log(deg) in their
# benchmarks — and unlike 1/log it stays EXACT here: the score is
# Σ floor(10⁶/deg(z)) in parts-per-million, pure integer division in
# both engines (no libm ln whose last ulp could differ cross-engine
# and flip the top-k boundary — the round-6 lesson). Same wedge
# fan-out and anti-join as common_neighbor_scores; the only extra
# state is one per-center weight column riding the explode.

_RA_TOPK = 15

_LINKPRED_RA_BODY_DUCK = (
    """,
    und AS (
      SELECT u AS a, v AS b FROM edges
      UNION ALL SELECT v AS a, u AS b FROM edges
    ),
    wedge AS (
      SELECT e1.a AS x, e1.b AS z, e2.b AS y
      FROM und e1 JOIN und e2 ON e1.b = e2.a AND e1.a < e2.b
    ),
    deg AS (SELECT a AS z, COUNT(*) AS d FROM und GROUP BY a),
    cand AS (
      SELECT x, y, COUNT(*) AS common_neighbors,
             SUM(1000000 // dg.d) AS ra_score_ppm
      FROM wedge JOIN deg dg ON dg.z = wedge.z
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u = wedge.x AND e.v = wedge.y
      )
      GROUP BY x, y
    )
    SELECT CAST(x AS BIGINT) AS part_a, CAST(y AS BIGINT) AS part_b,
           CAST(common_neighbors AS BIGINT) AS common_neighbors,
           CAST(ra_score_ppm AS BIGINT) AS ra_score_ppm
    FROM cand
    ORDER BY ra_score_ppm DESC, part_a, part_b
    LIMIT """
    + str(_RA_TOPK)
)


@query(
    "part_link_prediction_ra",
    _PART_EDGES_DUCK + _LINKPRED_RA_BODY_DUCK,
    doc="Resource-allocation link prediction (Zhou, Lü & Zhang EPJ B "
    "2009) over the part co-purchase graph: non-adjacent pairs "
    f"ranked top-{_RA_TOPK} by Σ 1/deg(z) over shared neighbors z — "
    "the degree-aware CN refinement (a shared hub is weak evidence, "
    "a shared specialist part is strong). Scored as EXACT integer "
    "parts-per-million (floor(10⁶/deg), integer division in both "
    "engines — no libm ln in the hash path), same volume-scaled "
    "edge cut, wedge fan-out, and anti-join as "
    "part_link_prediction.",
)
def q_part_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _part_edges_spark(spark, sf_dir, min_co=None).localCheckpoint(
        eager=True
    )
    return resource_allocation_scores(edges, topk=_RA_TOPK)


def resource_allocation_scores(edges: DataFrame, topk: int) -> DataFrame:
    """RA-index wedge scoring over an undirected ``(u, v)`` edge list
    with ``u < v``: identical enumeration shape to
    :func:`common_neighbor_scores`, with the per-center weight
    ``floor(10⁶ / deg(z))`` attached before the explode so the score
    aggregate is one integer SUM alongside the CN COUNT.

    ``edges`` is expected MATERIALIZED (localCheckpoint/cache): the
    broadcast gate below runs ``edges.count()``, which would re-run a
    lazy edge-build lineage as an extra job (every in-repo caller
    checkpoints first — r13 ADVICE)."""
    from pyspark.sql import functions as F

    und = edges.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
    adj = (
        und.groupBy(F.col("a").alias("z"))
        .agg(F.sort_array(F.collect_set("b")).alias("nb"))
        .filter(F.size("nb") >= 2)
        # integer DIV, not floor(double /): a correctly-rounded double
        # quotient landing within an ulp of an integer boundary could
        # floor differently than the oracle's integer division.
        .withColumn("wz", F.expr("1000000 div size(nb)").cast("long"))
    )
    # Codegen'd generator wedge enumeration — the
    # _cofulfill_edges_spark rationale (r14).
    pw = adj.select(
        "wz", F.col("nb"), F.posexplode("nb").alias("i", "x")
    )
    wedges = pw.select(
        "x",
        F.explode(
            F.slice(
                F.col("nb"), F.col("i") + 2, F.size("nb") - F.col("i") - 1
            )
        ).alias("y"),
        "wz",
    )
    # The existing-edge list is the SMALL side of the anti-join (the
    # volume-scaled cut keeps it roughly constant across SFs) while
    # the wedge fan-out is the big side; a checkpointed edge frame
    # has unknown size to the planner, so gate a plan-time broadcast
    # on one bounded count — otherwise the whole wedge stream pays a
    # sort-merge exchange (fallback past the gate unchanged).
    eb = F.broadcast(edges) if _fits_broadcast(edges.count(), 16) else edges
    cand = wedges.join(
        eb,
        (wedges["x"] == edges["u"]) & (wedges["y"] == edges["v"]),
        "left_anti",
    )
    return (
        cand.groupBy(
            F.col("x").cast("long").alias("part_a"),
            F.col("y").cast("long").alias("part_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("wz").cast("long").alias("ra_score_ppm"),
        )
        .orderBy(F.desc("ra_score_ppm"), "part_a", "part_b")
        .limit(topk)
    )


def _link_prediction_df(
    spark: SparkSession, sf_dir: str, min_co: int | None
) -> DataFrame:
    # Eager localCheckpoint, not cache(): consumed by both und legs
    # AND the anti-join; cache() left a resident storage entry after
    # the final action (r9 ADVICE).
    edges = _part_edges_spark(spark, sf_dir, min_co=min_co).localCheckpoint(
        eager=True
    )
    return common_neighbor_scores(edges, topk=_LINKPRED_TOPK)


def common_neighbor_scores(edges: DataFrame, topk: int) -> DataFrame:
    """Wedge-enumeration + anti-join core of the link predictor over
    an undirected edge list ``(u, v)`` with ``u < v`` — separated
    from the edge builder so unit tests can drive it on exact
    fixtures (e.g. the 1-2-3-4 path graph).

    ``edges`` is expected MATERIALIZED (localCheckpoint/cache): the
    broadcast gate below runs ``edges.count()``, which would re-run a
    lazy edge-build lineage as an extra job (every in-repo caller
    checkpoints first — r13 ADVICE)."""
    from pyspark.sql import functions as F

    und = edges.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
    adj = (
        und.groupBy(F.col("a").alias("z"))
        .agg(F.sort_array(F.collect_set("b")).alias("nb"))
        # degree-1 centers generate no wedges; the filter also keeps
        # sequence(0, size-2) ascending (size=1 would flip it).
        .filter(F.size("nb") >= 2)
    )
    # Codegen'd generator wedge enumeration — the
    # _cofulfill_edges_spark rationale (r14).
    pw = adj.select(F.col("nb"), F.posexplode("nb").alias("i", "x"))
    wedges = pw.select(
        "x",
        F.explode(
            F.slice(
                F.col("nb"), F.col("i") + 2, F.size("nb") - F.col("i") - 1
            )
        ).alias("y"),
    )
    # Same sized broadcast gate as resource_allocation_scores: the
    # cut edge list is the small anti-join side, the wedge fan-out
    # the big one; a checkpointed edge frame has unknown planner size.
    eb = F.broadcast(edges) if _fits_broadcast(edges.count(), 16) else edges
    cand = wedges.join(
        eb,
        (wedges["x"] == edges["u"]) & (wedges["y"] == edges["v"]),
        "left_anti",
    )
    return (
        cand.groupBy(
            F.col("x").cast("long").alias("part_a"),
            F.col("y").cast("long").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(topk)
    )


# --- multi-source BFS: hop-distance levels over the trade graph -------------
#
# Completes the traversal family (CC = undirected reachability,
# PageRank = weighted importance, triangles/k-core = local density):
# BFS levels answer "how far is everything from THIS seed set" —
# blast-radius / exposure analysis (which suppliers are 1 hop from a
# sanctioned nation's customers, which customers 2 hops). Unrolled
# _BFS_HOPS rounds, one edge-join + anti-join per round (frontier
# expansion minus visited), fully declarative like the PageRank
# unroll — no driver-side loop.
#
# Scale (100 TB): each round shuffles |frontier ⋈ edges| rows on the
# node key; with the edge list bucketed by src the join is
# co-located. The visited set rides along as a distinct-union —
# growth is bounded by reachable-node count, not edge count.
# Determinism: keys and counts only, no float anywhere.

_BFS_HOPS = 3
_BFS_NATION = 1

_BFS_SQL_DUCK = f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT concat('C', CAST(c AS VARCHAR)) AS src,
             concat('S', CAST(s AS VARCHAR)) AS dst
      FROM pairs
      UNION ALL
      SELECT concat('S', CAST(s AS VARCHAR)), concat('C', CAST(c AS VARCHAR))
      FROM pairs
    ),
    l0 AS (
      SELECT DISTINCT concat('C', CAST(c_custkey AS VARCHAR)) AS node
      FROM customer WHERE c_nationkey = {_BFS_NATION}
    ),
    v0 AS (SELECT node FROM l0),
    l1 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN l0 ON e.src = l0.node
      WHERE NOT EXISTS (SELECT 1 FROM v0 WHERE v0.node = e.dst)
    ),
    v1 AS (SELECT node FROM v0 UNION SELECT node FROM l1),
    l2 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN l1 ON e.src = l1.node
      WHERE NOT EXISTS (SELECT 1 FROM v1 WHERE v1.node = e.dst)
    ),
    v2 AS (SELECT node FROM v1 UNION SELECT node FROM l2),
    l3 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN l2 ON e.src = l2.node
      WHERE NOT EXISTS (SELECT 1 FROM v2 WHERE v2.node = e.dst)
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'C%' THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_customers,
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'S%' THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_suppliers
      FROM l0
      UNION ALL
      SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'C%' THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'S%' THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM l1
      UNION ALL
      SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'C%' THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'S%' THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM l2
      UNION ALL
      SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'C%' THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN node LIKE 'S%' THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM l3
    ) t ORDER BY level
"""


@query(
    "trade_graph_bfs_levels",
    _BFS_SQL_DUCK,
    doc="Multi-source BFS hop-distance levels over the bidirectional "
    "customer↔supplier trade graph: seeds = every customer of one "
    "nation, levels 0-3 = exposure rings (suppliers one hop out, "
    "their other customers two hops, ...). Unrolled frontier "
    "expansion — per round one edge equi-join + one anti-join "
    "against the visited set, the declarative Pregel round; counts "
    "split by node class. No float anywhere; the traversal-family "
    "complement to CC/PageRank/triangles/k-core.",
)
def q_trade_graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # Integer node encoding (2k / 2k+1) — the pagerank rationale;
    # the level counts only need the node CLASS, which is the key's
    # parity, so no label is ever rendered.
    edges = pairs.selectExpr(
        "2 * o_custkey AS src", "2 * l_suppkey + 1 AS dst"
    ).unionAll(
        pairs.selectExpr("2 * l_suppkey + 1 AS src", "2 * o_custkey AS dst")
    )
    # Materialized supersteps (the k-core lesson): each frontier and
    # the running visited set are consumed by multiple later rounds
    # plus the level-count aggregates — lazy caching leaves them
    # recomputed per consumer (the whole lineitem-sized edge build,
    # measured 7.4 s at sf0.1 vs 2 s materialized). Frontier/visited
    # frames are reachable-node-sized.
    edges = edges.cache()
    frontier = (
        cust.filter(F.col("c_nationkey") == _BFS_NATION)
        .selectExpr("2 * c_custkey AS node")
        .distinct()
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    visited = frontier
    for _ in range(_BFS_HOPS):
        f = levels[-1]
        # Frontier/visited are materialized (checkpointed) and
        # node-bounded, so their counts are cheap driver statistics;
        # gate a plan-time broadcast on them — a checkpointed frame
        # is a LogicalRDD with UNKNOWN size, so the planner would
        # otherwise sort-merge and shuffle the full edge list every
        # hop (the PPR superstep lesson, OPTIMIZATION_r13.md). Falls
        # back to the shuffled join when a frontier outgrows a sane
        # broadcast.
        fb = F.broadcast(f) if _fits_broadcast(f.count(), 8) else f
        vb = (
            F.broadcast(visited)
            if _fits_broadcast(visited.count(), 8)  # node-only frames
            else visited
        )
        nxt = (
            edges.join(fb, edges["src"] == f["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(vb, ["node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        # No distinct: `nxt` is anti-joined against `visited`, so the
        # two legs are disjoint and each is internally distinct — the
        # union already is.
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
    counts = None
    for lvl, nodes in enumerate(levels):
        c = nodes.agg(
            F.lit(lvl).cast("long").alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(
                F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_customers"),
            F.coalesce(
                F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_suppliers"),
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts.orderBy("level")


# --- HITS hubs & authorities over the directed trade graph ------------------
#
# PageRank ranks nodes of the SYMMETRIZED trade graph by recursive
# importance; HITS (Kleinberg, JACM'99 "Authoritative sources in a
# hyperlinked environment") keeps the bipartite DIRECTION and
# produces two coupled scores — customers as HUBS (a good hub buys
# from good authorities) and suppliers as AUTHORITIES (a good
# authority is bought from by good hubs) — the mutual-reinforcement
# recurrence a = Eᵀh, h = Ea with per-step normalization.
#
# Cross-engine determinism: all integer. Scores live in micro-units
# (SCALE = 10^6); the per-step normalization is a DIVISION by the
# scalar (total div SCALE) — never `raw * SCALE div total`, whose
# multiply overflows int64 once raws pass ~9e12. Here every value is
# produced by ADDITION of previously-normalized units (bounded by
# their global sum) plus one floor-divide, so the largest integer
# ever formed is Σraw = E·SCALE on the first superstep — int64-safe
# to ~9·10^12 edges (documented bound, far past any TPC-H SF).
# Floor division on all-positive values is identical in Spark
# (`div`) and DuckDB (`//`).
#
# Scale (100 TB): identical shuffle shape to PageRank — per
# iteration one edge⋈score equi-join + one partial-aggregated
# groupBy; the normalizing scalar is a 1-row broadcast. Unit
# resolution degrades as E/SCALE (a node below total/SCALE units
# floors to 0) — acceptable for the top-k screen this reports;
# raise SCALE toward 10^9 (bound: E·SCALE < 2^63) when absolute
# small-node scores matter.

_HITS_SCALE = 10**6
_HITS_ITERS = 2
_HITS_TOPK = 10


def _hits_oracle() -> str:
    s = _HITS_SCALE
    steps = []
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        steps.append(
            f"""a{i}r AS (
      SELECT s, SUM(h) AS r FROM pairs JOIN {prev_h} USING (c) GROUP BY s
    ),
    a{i} AS (
      SELECT s, r // GREATEST(1, (SELECT SUM(r) FROM a{i}r) // {s}) AS a
      FROM a{i}r
    ),
    h{i}r AS (
      SELECT c, SUM(a) AS r FROM pairs JOIN a{i} USING (s) GROUP BY c
    ),
    h{i} AS (
      SELECT c, r // GREATEST(1, (SELECT SUM(r) FROM h{i}r) // {s}) AS h
      FROM h{i}r
    )"""
        )
        prev_h = f"h{i}"
    k = _HITS_ITERS
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    h0 AS (
      SELECT c, CAST({s} AS BIGINT) AS h FROM (SELECT DISTINCT c FROM pairs)
    ),
    {steps_sql}
    SELECT role, node, CAST(score_units AS BIGINT) AS score_units FROM (
      (SELECT 'auth' AS role, 'S' || CAST(s AS VARCHAR) AS node,
              a AS score_units
       FROM a{k} ORDER BY a DESC, s ASC LIMIT {_HITS_TOPK})
      UNION ALL
      (SELECT 'hub' AS role, 'C' || CAST(c AS VARCHAR) AS node,
              h AS score_units
       FROM h{k} ORDER BY h DESC, c ASC LIMIT {_HITS_TOPK})
    )
    ORDER BY role, score_units DESC, node
    """


@query(
    "trade_graph_hits",
    _hits_oracle(),
    doc="HITS hubs & authorities (Kleinberg JACM'99) over the "
    "DIRECTED customer→supplier trade graph: 2 unrolled mutual-"
    "reinforcement supersteps, top-10 per role. All-integer "
    "micro-unit scores with divide-by-(total div scale) "
    "normalization — no multiply can overflow, both engines run the "
    "identical integer sequence. Same join+groupBy superstep shape "
    "as trade_graph_pagerank; the directional complement (who "
    "CONCENTRATES demand vs who ATTRACTS it).",
)
def q_trade_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .selectExpr("o_custkey AS c", "l_suppkey AS s")
        .distinct()
        .localCheckpoint(eager=True)  # feeds every superstep twice
    )

    def _norm(scored, key: str, raw: str, out: str) -> tuple[DataFrame, int]:
        # Checkpoint the RAW aggregate, not the normalized projection:
        # `scored` has two consumers (the normalizing-total aggregate
        # and the select), so a lazy frame would re-run the whole
        # superstep join+groupBy once per consumer. The total is then
        # fetched as ONE driver-side long (a bounded scalar over the
        # already-materialized partitions) and folded into the
        # projection as a LITERAL divisor — r9 measurement vs the
        # broadcast-crossJoin spelling: 3.13 s vs 3.83 s best-of-3
        # at sf0.1,
        # because the literal form skips one broadcast-exchange job
        # per normalize (4 per run) and keeps the projection a pure
        # map. Iterative-normalization totals are inherently
        # per-round driver barriers either way (the next superstep
        # cannot start before the total exists).
        scored = scored.localCheckpoint(eager=True)
        # The row count rides the SAME 1-row aggregate as the total
        # (zero extra jobs): it is the score frame's exact node count,
        # which gates that side's superstep broadcast below.
        trow = scored.agg(
            F.sum(raw).alias("__t"), F.count(F.lit(1)).alias("__n")
        ).first()
        tot = trow["__t"] or 0
        denom = max(1, tot // _HITS_SCALE)
        return (
            scored.select(key, F.expr(f"{raw} div {denom}").alias(out)),
            int(trow["__n"]),
        )

    hub = pairs.select("c").distinct().select(
        "c", F.lit(_HITS_SCALE).cast("long").alias("h")
    )
    # Score frames are node-bounded; one bounded count gates a
    # plan-time broadcast of the score side of every superstep join,
    # so the materialized pair list is never shuffled (the PPR
    # superstep lesson — a post-_norm frame is projection over a
    # LogicalRDD, unknown size to the planner). Shuffled-join
    # fallback past the gate. PER-SIDE gates (r13 ADVICE): the hub
    # side is gated on the customer count, the auth side on the
    # supplier count from its own first normalization aggregate
    # (free — it rides the total's 1-row agg), so a graph whose
    # suppliers outnumber customers can never broadcast an oversized
    # auth frame through the hub-side gate.
    bcast_hub = _fits_broadcast(hub.count(), 16)  # (c, h) longs
    bcast_auth: bool | None = None  # known after the first auth _norm
    auth = None
    for _ in range(_HITS_ITERS):
        hside = F.broadcast(hub) if bcast_hub else hub
        araw = (
            pairs.join(hside, "c").groupBy("s").agg(F.sum("h").alias("r"))
        )
        auth, n_auth = _norm(araw, "s", "r", "a")
        if bcast_auth is None:
            bcast_auth = _fits_broadcast(n_auth, 16)  # (s, a) longs
        aside = F.broadcast(auth) if bcast_auth else auth
        hraw = (
            pairs.join(aside, "s").groupBy("c").agg(F.sum("a").alias("r"))
        )
        hub, _n_hub = _norm(hraw, "c", "r", "h")
    top_a = (
        auth.orderBy(F.desc("a"), F.asc("s"))
        .limit(_HITS_TOPK)
        .select(
            F.lit("auth").alias("role"),
            F.concat(F.lit("S"), F.col("s").cast("string")).alias("node"),
            F.col("a").cast("long").alias("score_units"),
        )
    )
    top_h = (
        hub.orderBy(F.desc("h"), F.asc("c"))
        .limit(_HITS_TOPK)
        .select(
            F.lit("hub").alias("role"),
            F.concat(F.lit("C"), F.col("c").cast("string")).alias("node"),
            F.col("h").cast("long").alias("score_units"),
        )
    )
    return top_a.unionByName(top_h).orderBy(
        "role", F.desc("score_units"), "node"
    )


@query(
    "trade_graph_assortativity",
    """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    degc AS (SELECT c, COUNT(*) AS cd FROM pairs GROUP BY c),
    degs AS (SELECT s, COUNT(*) AS sd FROM pairs GROUP BY s),
    e AS (
      SELECT dc.cd, dg.sd
      FROM pairs p JOIN degc dc ON p.c = dc.c
                   JOIN degs dg ON p.s = dg.s
    ),
    m AS (
      SELECT 2 * COUNT(*) AS m,
             SUM(cd + sd) AS sj,
             2 * SUM(cd * sd) AS sjk,
             SUM(cd * cd + sd * sd) AS sj2
      FROM e
    )
    SELECT (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM pairs)
             + (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM pairs)
             AS n_nodes,
           CAST(m AS BIGINT) AS n_directed_edges,
           CASE WHEN m * sj2 - sj * sj > 0
                THEN ROUND(CAST(m * sjk - sj * sj AS DOUBLE)
                           / CAST(m * sj2 - sj * sj AS DOUBLE)
                           + 1e-9, 6)
                ELSE 0.0 END AS assortativity
    FROM m
    """,
    doc="Degree assortativity (Newman 2002, the edge-wise Pearson "
    "correlation of endpoint degrees) of the bidirectional "
    "customer↔supplier trade graph: negative = hubs attach to "
    "leaves (hub-and-spoke risk concentration), positive = "
    "rich-club. A pure METRIC over the graph family's shared pair "
    "list — no iteration, and by the symmetry of the two edge "
    "orientations every directed-edge moment folds over the "
    "UNDIRECTED pair list (M = 2P, Σj = Σk = Σ(cd+sd), "
    "Σjk = 2Σcd·sd, Σj² = Σk² = Σ(cd²+sd²)), so "
    "den_a = den_b and r is ONE exact-integer ratio — no sqrt, "
    "half the join volume of the naive directed spelling. Two "
    "side-sized degree reduces + two pair-keyed joins + a 1-row "
    "moment fold; every moment is an exact integer sum (DECIMAL(38) "
    "carriers mirroring DuckDB's HUGEINT — the hhi lesson); a "
    "degree-regular graph's zero variance emits the 0.0 sentinel, "
    "never 0/0. ENVELOPE: the cross products m*sjk and m*sj2 stay "
    "inside DECIMAL(38) while Σcd·sd < ~10^19/m — with max degree D "
    "and P undirected pairs that is P·D² ≲ 10^38, e.g. 10^12 pairs "
    "at D ≤ 10^13 — far beyond any real trade graph (sf1000 TPC-H "
    "is ~10^9 pairs, D ~10^6 → ~10^21). Past it Spark's non-ANSI "
    "decimal overflows to NULL and the CASE would emit the 0.0 "
    "sentinel where DuckDB's HUGEINT stays exact (r11 ADVICE) — at "
    "that extreme, fold num/den from pre-divided doubles instead. The bipartite encoding means r reflects "
    "customer-degree vs supplier-degree mixing — the concentration "
    "diagnostic that complements PageRank's importance ranking.",
)
def q_trade_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # the family's shared pair list, materialized once for its four
    # consumers (two degree reduces, the moment join, the node count)
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    degc = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("cd"))
    degs = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("sd"))
    # The two side counts were already needed for n_nodes; reuse them
    # to gate plan-time broadcasts of the degree frames (r14): both
    # are aggregates over a checkpointed LogicalRDD, so the planner
    # cannot size them and the moment join otherwise sort-merges the
    # full pair list TWICE (the superstep-broadcast lesson). Shuffled
    # joins remain the fallback past the gate.
    n_c, n_s = degc.count(), degs.count()
    n_nodes = n_c + n_s
    dcside = F.broadcast(degc) if _fits_broadcast(n_c, 16) else degc
    dsside = F.broadcast(degs) if _fits_broadcast(n_s, 16) else degs
    e = (
        pairs.join(dcside, "c")
        .join(dsside, "s")
        .select(
            F.col("cd").cast("decimal(19,0)").alias("cd"),
            F.col("sd").cast("decimal(19,0)").alias("sd"),
        )
    )
    m = (F.lit(2).cast("decimal(19,0)") * F.count(F.lit(1))).cast(
        "decimal(38,0)"
    )
    sj = F.sum(F.col("cd") + F.col("sd"))
    sjk = F.lit(2).cast("decimal(19,0)") * F.sum(F.col("cd") * F.col("sd"))
    sj2 = F.sum(F.col("cd") * F.col("cd") + F.col("sd") * F.col("sd"))
    num = m * sjk - sj * sj
    den = m * sj2 - sj * sj
    return e.agg(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        (F.lit(2) * F.count(F.lit(1))).cast("long").alias("n_directed_edges"),
        F.when(
            den > 0,
            F.round(
                num.cast("double") / den.cast("double") + F.lit(1e-9), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("assortativity"),
    )


def _richclub_body() -> str:
    """Dialect-shared SQL over ``edges(u, v)``: rich-club coefficient
    phi(k) = 2*E_k / (n_k*(n_k-1)) for degree thresholds k = 1..5."""
    return """
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) both_ends GROUP BY node
    ),
    ks AS (SELECT UNNEST(GENERATE_SERIES(1, 5)) AS k),
    nk AS (
      SELECT k, COUNT(*) AS n_nodes
      FROM ks JOIN deg ON deg.deg > ks.k GROUP BY k
    ),
    ek AS (
      SELECT k, COUNT(*) AS n_edges
      FROM ks
      JOIN edges e ON TRUE
      JOIN deg du ON du.node = e.u AND du.deg > ks.k
      JOIN deg dv ON dv.node = e.v AND dv.deg > ks.k
      GROUP BY k
    )
    SELECT CAST(ks.k AS INT) AS k,
           CAST(COALESCE(nk.n_nodes, 0) AS BIGINT) AS n_nodes,
           CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
           CASE WHEN COALESCE(nk.n_nodes, 0) >= 2 THEN
             ROUND(2.0 * COALESCE(ek.n_edges, 0)
                   / (CAST(nk.n_nodes AS DOUBLE)
                      * (CAST(nk.n_nodes AS DOUBLE) - 1)) + 1e-9, 6)
           ELSE 0.0 END AS phi
    FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
    ORDER BY k
    """


@query(
    "part_rich_club",
    _PART_EDGES_DUCK
    + ","
    + _richclub_body().strip(),
    doc="Rich-club coefficient curve phi(k) = 2*E_k/(n_k*(n_k-1)) "
    "over the part co-purchase graph for degree thresholds k = 1..5 "
    "(Zhou & Mondragon 2004): do high-degree parts preferentially "
    "co-occur with each other — the core-periphery signal the "
    "per-node clustering coefficient cannot see (C_v is local; phi "
    "measures density WITHIN the hub set). Runs on the VOLUME-SCALED "
    "co-purchase cut (the part_link_prediction graph — the supplier "
    "co-fulfillment graph is near-complete at every committed SF, "
    "phi identically 1, so the sparser part graph is where the curve "
    "carries signal). One degree reduce + a 5-row constant threshold "
    "frame broadcast onto the node and edge frames (|nodes|x5 and "
    "|edges|x5 bounded fan-outs) — no iteration, no window; the "
    "coefficient is an exact rational of two integer aggregates.",
)
def q_part_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    edges = _part_edges_spark(spark, sf_dir).cache()
    # SIZED default (r14, the ktruss/kcore pattern): below the gate
    # the whole phi(k) curve is five integer folds over one collected
    # edge list — the distributed path's ×5 node and edge fan-outs
    # plus two joins are pure orchestration at volume-scaled sizes.
    # phi mirrors the Spark expression op-for-op with the half-up
    # ROUND replica; distributed path unchanged past the gate
    # (pinned by test_richclub_driver_matches_distributed).
    if edges.count() <= _DRIVER_GRAPH_MAX_EDGES:
        from teleco_etl_pipeline_spark.operators.quantiles import half_up

        es = [(int(r["u"]), int(r["v"])) for r in edges.collect()]
        edges.unpersist()
        dg: dict[int, int] = {}
        for u, v in es:
            dg[u] = dg.get(u, 0) + 1
            dg[v] = dg.get(v, 0) + 1
        rows = []
        for k in range(1, 6):
            nn = sum(1 for d in dg.values() if d > k)
            ne = sum(1 for u, v in es if dg[u] > k and dg[v] > k)
            phi = (
                half_up(
                    (2.0 * float(ne))
                    / (float(nn) * (float(nn) - 1))
                    + 1e-9,
                    6,
                )
                if nn >= 2
                else 0.0
            )
            rows.append((k, nn, ne, phi))
        return spark.createDataFrame(
            rows, "k int, n_nodes long, n_edges long, phi double"
        ).orderBy("k")
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        # feeds nk and BOTH endpoint filters of ek
        .localCheckpoint(eager=True)
    )
    ks = edges.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("k")
    )
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ek = (
        edges.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    # broadcast the 5-row aggregates explicitly: the pre-AQE plan
    # otherwise stages a sort-merge join for the k-keyed assembly
    out = (
        ks.join(F.broadcast(nk), "k", "left")
        .join(F.broadcast(ek), "k", "left")
        .select(
            "k",
            F.coalesce("n_nodes", F.lit(0)).cast("long").alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.when(
                F.coalesce("n_nodes", F.lit(0)) >= 2,
                F.round(
                    2.0 * F.coalesce("n_edges", F.lit(0))
                    / (
                        F.col("n_nodes").cast("double")
                        * (F.col("n_nodes").cast("double") - 1)
                    )
                    + F.lit(1e-9),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
        .orderBy("k")
    )
    return out


# --- k-truss peeling ----------------------------------------------------------
#
# Cohen 2008 ("Trusses: cohesive subgraphs for social network
# analysis"): the k-truss is the maximal subgraph where every edge
# sits in >= k-2 triangles OF THE SUBGRAPH — strictly stronger than
# the k-core's degree threshold (a k-truss is always inside the
# (k-1)-core) and the standard edge-grade cohesion primitive between
# "has neighbors" (core) and "is a clique". Same unrolled-iteration
# contract as supplier_kcore_peel: a FIXED round budget with the
# (iter, n_nodes, n_edges) trajectory as the output, so both engines
# compute the identical bounded plan and convergence is observable
# rather than assumed. Runs on the volume-scaled PART co-purchase
# graph (the supplier co-fulfillment graph is near-complete at every
# committed SF — every edge sits in ~|V| triangles and nothing
# peels; the sparser part graph is where truss grades separate).
#
# Scale: each round is one degree aggregate, the Suri-Vassilvitskii
# degree-ordered wedge join (fan-out bounded by the LOW-degree
# endpoint — the same hub guard as the triangle counts), one
# per-edge support aggregate, and one equi-join filter; every frame
# is edge-list- or triangle-list-sized, and each round's survivor
# edge list is MATERIALIZED (eager localCheckpoint — the k-core
# lesson: 4 consumers per round; lazy spellings recompute the wedge
# join exponentially).

_TRUSS_K = 4
_TRUSS_ITERS = 3
# Driver-side peel gate (module-level so tests can force the
# distributed path) — the neardup_clusters _DRIVER_CC_MAX_EDGES
# pattern: below this bound the peel loop is orchestration-dominated
# and one collected edge list resolves it exactly.
_DRIVER_GRAPH_MAX_EDGES = 65536


def _ktruss_body(k: int, iters: int) -> str:
    """Unrolled k-truss peeling over ``edges(u, v)`` (u < v):
    per round, keep edges with in-subgraph triangle support
    >= k-2.

    The per-round CTEs are AS MATERIALIZED: DuckDB inlines plain
    CTEs per reference, and each round references the previous
    round's survivors 3x (degree frame + both join sides), the
    oriented list 3x (wedge self-join legs) and the triangle list
    3x (per-edge support legs) — un-materialized, round 3's inline
    expansion multiplies the base parquet scan thousands of times
    over (observed: fd exhaustion before any row returns). The
    Spark side materializes the identical frames (localCheckpoint /
    cache), so MATERIALIZED is the honest oracle spelling, not a
    hint."""
    parts = []
    prev = "edges"
    for i in range(1, iters + 1):
        parts.append(
            f"""
    td{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
      ) be{i} GROUP BY node
    ),
    o{i} AS MATERIALIZED (
      SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.u ELSE e.v END AS a,
             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.v ELSE e.u END AS b
      FROM {prev} e
      JOIN td{i} du ON du.node = e.u
      JOIN td{i} dv ON dv.node = e.v
    ),
    t{i} AS MATERIALIZED (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM o{i} o1
      JOIN o{i} o2 ON o2.a = o1.b
      JOIN o{i} o3 ON o3.a = o1.a AND o3.b = o2.b
    ),
    es{i} AS MATERIALIZED (
      SELECT u, v, COUNT(*) AS supp FROM (
        SELECT LEAST(x, y) AS u, GREATEST(x, y) AS v FROM t{i}
        UNION ALL SELECT LEAST(y, z), GREATEST(y, z) FROM t{i}
        UNION ALL SELECT LEAST(x, z), GREATEST(x, z) FROM t{i}
      ) tt{i} GROUP BY u, v
    ),
    te{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN es{i} s ON s.u = e.u AND s.v = e.v
      WHERE s.supp >= {k - 2}
    )"""
        )
        prev = f"te{i}"
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS iter, "
        f"CAST((SELECT COUNT(*) FROM (SELECT u AS node FROM te{i} "
        f"UNION SELECT v FROM te{i}) nn{i}) AS BIGINT) AS n_nodes, "
        f"CAST((SELECT COUNT(*) FROM te{i}) AS BIGINT) AS n_edges"
        for i in range(1, iters + 1)
    )
    return ",".join(parts) + f"\n    {selects}\n    ORDER BY iter\n"


@query(
    "part_ktruss_peel",
    _PART_EDGES_DUCK + "," + _ktruss_body(_TRUSS_K, _TRUSS_ITERS).strip(),
    doc=f"Unrolled {_TRUSS_ITERS}-round k-truss peeling "
    f"(k={_TRUSS_K}: every surviving edge must sit in >= "
    f"{_TRUSS_K - 2} triangles of the surviving subgraph; Cohen "
    "2008) over the volume-scaled part co-purchase graph — the "
    "EDGE-grade cohesion primitive between supplier_kcore_peel's "
    "degree threshold and a clique, and the co-purchase module "
    "detector that ignores hub-spoke stars (a star has degree but "
    "zero triangles). Per round: degree-ordered oriented wedge join "
    "(Suri-Vassilvitskii — fan-out bounded by the low-degree "
    "endpoint), per-edge support aggregate over the three triangle "
    "legs, one equi-join filter; survivor edge lists materialize "
    "per round (the k-core superstep rule). All-integer; the "
    "(iter, n_nodes, n_edges) trajectory is the output.",
)
def q_part_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    prev = _part_edges_spark(spark, sf_dir).localCheckpoint(eager=True)
    # SIZED default (r13, the neardup_clusters union-find pattern):
    # each distributed peel round is ~10 scheduled jobs regardless of
    # graph size, and the volume-scaled edge cut keeps this graph a
    # few thousand edges at every committed SF — pure orchestration.
    # Under the gate, peel on the driver with set-intersection
    # support (supp(u,v) = |adj(u) ∩ adj(v)|, the identical integer
    # the oriented-wedge enumeration counts; pinned by
    # test_ktruss_driver_matches_superstep_loop); past the gate, the
    # distributed rounds below are unchanged.
    n_edges0 = prev.count()
    if n_edges0 <= _DRIVER_GRAPH_MAX_EDGES:
        edges = {(int(r["u"]), int(r["v"])) for r in prev.collect()}
        rows = []
        for i in range(1, _TRUSS_ITERS + 1):
            adj: dict[int, set] = {}
            for u, v in edges:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            edges = {
                (u, v)
                for u, v in edges
                if len(adj[u] & adj[v]) >= _TRUSS_K - 2
            }
            nodes = {u for u, _ in edges} | {v for _, v in edges}
            rows.append((i, len(nodes), len(edges)))
        return spark.createDataFrame(
            rows, "iter long, n_nodes long, n_edges long"
        ).orderBy("iter")
    stats = None
    # Per-round broadcast hints (deg / supp sides) were MEASURED AND
    # REJECTED here, like supplier_kcore_peel's: ABBA-interleaved
    # forced-distributed probes at sf0.1 read a wash (broadcast
    # [4.6, 4.5, 4.2, 4.2] vs shuffled [4.6, 4.6, 4.1, 4.2] s) — the
    # per-round broadcast-build barriers buy nothing the AQE runtime
    # conversion doesn't already provide. See OPTIMIZATION_r14.md.
    for i in range(1, _TRUSS_ITERS + 1):
        deg = (
            prev.select(F.col("u").alias("node"))
            .unionAll(prev.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        du, dv = deg.alias("du"), deg.alias("dv")
        e = prev.alias("e")
        low_first = (F.col("du.deg") < F.col("dv.deg")) | (
            (F.col("du.deg") == F.col("dv.deg"))
            & (F.col("e.u") < F.col("e.v"))
        )
        o = (
            e.join(du, F.col("du.node") == F.col("e.u"))
            .join(dv, F.col("dv.node") == F.col("e.v"))
            .select(
                F.when(low_first, F.col("e.u"))
                .otherwise(F.col("e.v"))
                .alias("a"),
                F.when(low_first, F.col("e.v"))
                .otherwise(F.col("e.u"))
                .alias("b"),
            )
            .cache()
        )
        o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
        tri = (
            o1.join(o2, F.col("o2.a") == F.col("o1.b"))
            .join(
                o3,
                (F.col("o3.a") == F.col("o1.a"))
                & (F.col("o3.b") == F.col("o2.b")),
            )
            .select(
                F.col("o1.a").alias("x"),
                F.col("o1.b").alias("y"),
                F.col("o2.b").alias("z"),
            )
            .cache()
        )
        legs = (
            tri.select(
                F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
            )
            .unionAll(
                tri.select(
                    F.least("y", "z").alias("u"),
                    F.greatest("y", "z").alias("v"),
                )
            )
            .unionAll(
                tri.select(
                    F.least("x", "z").alias("u"),
                    F.greatest("x", "z").alias("v"),
                )
            )
        )
        supp = (
            legs.groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("supp"))
            .filter(F.col("supp") >= _TRUSS_K - 2)
            .select("u", "v")
        )
        nxt = prev.join(supp, ["u", "v"]).localCheckpoint(eager=True)
        nodes = nxt.select(F.col("u").alias("node")).union(
            nxt.select(F.col("v").alias("node"))
        ).distinct()
        row = nodes.agg(
            F.lit(i).cast("long").alias("iter"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        ).crossJoin(nxt.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        stats = row if stats is None else stats.unionByName(row)
        prev = nxt
    return stats.orderBy("iter")
