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
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.selectExpr(
        "concat('C', CAST(o_custkey AS STRING)) AS src",
        "concat('S', CAST(l_suppkey AS STRING)) AS dst",
    ).unionAll(
        pairs.selectExpr(
            "concat('S', CAST(l_suppkey AS STRING)) AS src",
            "concat('C', CAST(o_custkey AS STRING)) AS dst",
        )
    )
    # The edge list feeds every iteration's join plus outdeg/nodes/n —
    # ~8 plan references; uncached, the lineitem⋈orders distinct would
    # re-execute per reference (an unrolled-iteration tax Spark's CTE
    # inlining doesn't dedup). Same LIFETIME contract as the PPJoin
    # caches: lazy plan, released by the suite runner's clearCache()
    # between queries (bench.py does), MEMORY_AND_DISK so worst case
    # is recompute, never OOM. On a real cluster, write the edge list
    # bucketed by the node key instead and every iteration join is
    # co-located.
    edges = edges.cache()
    # Node count fixed at build time (one bounded scalar aggregate —
    # the IVF/PQ "fit at build, bake as literal" precedent); it also
    # fills the edge cache so every iteration joins against memory.
    n = edges.select("src").distinct().count()
    body = _pagerank_sql_baked(n, _ITERS, _SCALE, _D_NUM, _D_DEN, _TOPK)
    sql = "WITH edges AS (SELECT src, dst FROM {edges})," + body.strip().removeprefix(
        "WITH"
    )
    return spark.sql(sql, edges=edges)
