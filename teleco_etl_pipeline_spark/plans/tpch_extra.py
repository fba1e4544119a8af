"""Additional TPC-H-derived plan shapes
(Q2/Q4/Q8/Q9/Q10/Q11/Q12/Q15/Q16/Q17/Q19/Q20/Q21).

Together with plans/analytics.py (Q1/Q3/Q5/Q7/Q13/Q14/Q18/Q22
shapes) this completes the TPC-H analytic pattern family; Q6's
no-join filtered aggregate shape is subsumed by the conditional
aggregate queries in plans/relational.py.

Each query here exists for its PLAN SHAPE, not its business meaning —
the catalog keeps one tested instance of every major analytic
join/subquery pattern a warehouse user writes. The testdata has no
``partsupp`` table and lineitem
carries no commit/receipt dates or ship modes, so predicates are
adapted to the columns that exist while keeping each query's
structural signature (the thing Catalyst actually plans) intact:

- Q2  → correlated-MIN join-back (keep rows equal to their group's
  aggregate)
- Q4  → EXISTS-driven semi join feeding an aggregation
- Q8  → conditional-sum ratio over a two-fact, five-dim join tree
- Q9  → unanchored LIKE dim filter under a (nation, year) aggregate
- Q10 → date-pruned fact⋈fact rollup to customer grain + top-k
- Q11 → GROUP BY ... HAVING against a global scalar subquery
- Q12 → conditional two-way counts on a fact↔fact join
- Q15 → aggregate, then equality against the aggregate's own MAX
  (scalar subquery over a derived table)
- Q16 → NOT IN as a broadcast null-aware hash anti join +
  COUNT(DISTINCT)
- Q17 → per-key average subquery joined back to the same fact
- Q19 → OR-of-ANDs disjunctive predicate across join inputs
- Q20 → IN over an aggregate-with-HAVING itself IN-filtered
  (doubly-nested decorrelation)
- Q21 → EXISTS + NOT-EXISTS self-joins on the same fact

Scale notes are per-query; the global rules: dims broadcast, facts
shuffle at most once per join key, scalar subqueries run as separate
tiny jobs (``DataFrame.scalar()``), never as 1-row joined relations
(which Catalyst would plan as BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from teleco_etl_pipeline_spark.plans.registry import query
from teleco_etl_pipeline_spark.sources.tables import load_table


def _disc_price():
    """Decimal-exact discounted price (both engines sum decimals
    exactly, so the final cast-to-double is bit-identical)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


@query(
    "priority_exists_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H-Q4-shaped EXISTS aggregation: the subquery lowers to a "
    "LEFT SEMI join (each order tested once, lineitem never "
    "duplicated into the agg), then a single count shuffle on "
    "priority. Date filter pushes to the orders scan.",
)
def q_priority_exists_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        ords.join(li, ords["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "linestatus_priority_matrix",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H-Q12-shaped conditional matrix on a fact↔fact join: "
    "both counts come out of ONE join + ONE aggregation (SUM CASE), "
    "never two passes; the shipdate filter prunes lineitem before "
    "the join shuffle.",
)
def q_linestatus_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_linestatus")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        ords.join(li, ords["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_rev AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    doc="TPC-H-Q15-shaped argmax over an aggregate: supplier revenue "
    "agg, MAX over that agg as a true scalar subquery "
    "(DataFrame.scalar — a second tiny job over the |suppliers|-row "
    "aggregate, NOT a window over it), equality on the EXACT decimal "
    "sum so ties are engine-independent, supplier dim broadcast in.",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("total_rev"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    top = rev.filter(
        F.col("total_rev") == rev.agg(F.max("total_rev").alias("m")).scalar()
    )
    return F.broadcast(sup).join(
        top, F.col("s_suppkey") == F.col("l_suppkey")
    ).select(
        "s_suppkey",
        "s_name",
        F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
    )


@query(
    "nation_balance_share",
    """
    WITH nb AS (
      SELECT n_name, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      WHERE c_acctbal > 0.0
      GROUP BY n_name
    )
    SELECT n_name, ROUND(CAST(bal AS DOUBLE), 2) AS total_bal
    FROM nb
    WHERE CAST(bal AS DOUBLE) > (SELECT CAST(SUM(bal) AS DOUBLE) * 0.045 FROM nb)
    """,
    doc="TPC-H-Q11-shaped HAVING-vs-global-scalar: per-nation balance "
    "totals kept only if above 4.5% of the GLOBAL total. The "
    "global total is a scalar subquery over the already-aggregated "
    "|nations|-row table (micro-job), not a second scan of customer. "
    "Decimal sums keep the threshold comparison exact-identical "
    "across engines.",
)
def q_nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .select("c_nationkey", "c_acctbal")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nb = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"))
    )
    thr = nb.agg(
        (F.sum("bal").cast("double") * F.lit(0.045)).alias("t")
    ).scalar()
    return nb.filter(F.col("bal").cast("double") > thr).select(
        "n_name", F.round(F.col("bal").cast("double"), 2).alias("total_bal")
    )


@query(
    "small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey AS pq_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H-Q17-shaped correlated-average guard: per-part average "
    "quantity joined back onto the same fact. The average is "
    "decimal-sum/count (exact in both engines — a plain double AVG "
    "is summation-order-dependent and can flip boundary rows). At "
    "100 TB the brand filter broadcasts into BOTH lineitem passes "
    "so the per-part agg only computes for the ~1/25 of parts that "
    "survive; Spark sees the filtered part dim under a broadcast "
    "semi join on each side.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Restrict BOTH the revenue side and the average side to the
    # brand's parts before any shuffle — the oracle's unrestricted pq
    # CTE computes averages for every part, but extra groups can't
    # change the joined result, so the plans agree on values while
    # this one aggregates ~25× less data.
    li_brand = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
    pq = li_brand.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_brand.join(pq, li_brand["l_partkey"] == pq["pq_partkey"])
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "disjunctive_revenue",
    """
    SELECT ROUND(CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 0) AS DOUBLE), 2)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H-Q19-shaped OR-of-ANDs: Catalyst extracts the common "
    "single-side conjuncts (brand∈{...} onto the part scan, quantity "
    "range onto lineitem) as pushed pre-join filters, keeping the "
    "cross-side disjunction as the join's residual condition — the "
    "classic disjunctive-pushdown test.",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(
            # COALESCE: an empty match set must yield 0.0 in both
            # engines (Spark SUM→NULL vs DuckDB→pandas NaN differ).
            F.round(
                F.coalesce(F.sum(_disc_price()), F.lit(0)).cast("double"), 2
            ).alias("revenue")
        )
    )


@query(
    "sole_return_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H-Q21-shaped blame query (sole at-fault supplier in "
    "multi-supplier orders): EXISTS → LEFT SEMI and NOT EXISTS → "
    "LEFT ANTI self-joins on the same fact, equi on l_orderkey with "
    "a non-equi suppkey residual; finished by TakeOrderedAndProject "
    "with a full (numwait DESC, s_name) tiebreak so the LIMIT is "
    "deterministic across engines.",
)
def q_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l1_orderkey"),
            F.col("l_suppkey").alias("l1_suppkey"),
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l3_orderkey"),
            F.col("l_suppkey").alias("l3_suppkey"),
        )
    )
    waiting = (
        l1.join(
            F.broadcast(ords), F.col("l1_orderkey") == F.col("o_orderkey")
        )
        .join(
            l2,
            (F.col("l2_orderkey") == F.col("l1_orderkey"))
            & (F.col("l2_suppkey") != F.col("l1_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l1_orderkey"))
            & (F.col("l3_suppkey") != F.col("l1_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(sup), F.col("l1_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "market_share",
    """
    WITH vol AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part      ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n1.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                      / SUM(volume) AS DOUBLE) + 1e-9, 4) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H-Q8-shaped market share: one nation's fraction of "
    "region revenue per year — a conditional-sum ratio on top of the "
    "catalog's deepest join tree (two facts + five dims, both nation "
    "roles). All dims broadcast; the only shuffles are the "
    "orders⋈customer and lineitem⋈orders fact joins and the final "
    "tiny per-year aggregate. Decimal-exact sums before the double "
    "division, per the engine's cross-engine ratio rule.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), "n_regionkey"
    )
    reg = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Customer side resolves to ASIA custkeys via broadcast dims, then
    # the two fact joins shuffle on their own keys.
    asia_cust = cust.join(
        F.broadcast(n1.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("c_nationkey") == F.col("c_nkey"),
    ).select("c_custkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_7", _disc_price()
                        ).otherwise(F.lit(0))
                    )
                    / F.sum(_disc_price())
                ).cast("double")
                + 1e-9,
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "product_profit",
    """
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM l_shipdate) AS o_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
             AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H-Q9-shaped product profit by supplier nation and year: "
    "an unanchored LIKE '%red%' (Catalyst lowers it to a pushable "
    "StringContains filter on the broadcast part side) over a "
    "fact⋈3-dim tree, grouped on (nation, year). One lineitem "
    "shuffle for the final aggregate; everything else broadcasts.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 2).alias("profit")
        )
    )


@query(
    "returned_item_report",
    """
    SELECT c_custkey, c_name, n_name AS nation,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H-Q10-shaped returned-item report: top 20 customers by "
    "returned revenue in one quarter. Date-pruned orders join "
    "return-filtered lineitem on orderkey, then one shuffle up to "
    "customer grain; nation broadcasts; the LIMIT plans as "
    "TakeOrderedAndProject (no global sort) with a c_custkey "
    "tiebreak so the cut is deterministic across engines.",
)
def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1995-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "supplier_class_counts",
    """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H-Q16-shaped supplier counts per part class with a NOT IN "
    "exclusion subquery. NOT IN is NOT a plain anti join — it must "
    "drop every probe row if the subquery yields a NULL — so the "
    "Spark side uses the null-aware anti-join pattern "
    "(`key == sub OR isnull(key == sub)`, left_anti, broadcast "
    "build), which Catalyst plans as a BroadcastHashJoin with "
    "isNullAwareAntiJoin rather than a nested-loop scan. "
    "COUNT(DISTINCT) adds the two-phase distinct-aggregate shape.",
)
def q_supplier_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13)
        )
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    eq = F.col("l_suppkey") == F.col("s_suppkey")
    return (
        li.join(F.broadcast(bad_sup), eq | F.isnull(eq), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "heavy_part_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 400
    )
    """,
    doc="TPC-H-Q20-shaped nested-subquery supplier filter: an IN over "
    "an aggregate-with-HAVING whose input is itself IN-filtered by a "
    "dim predicate — the doubly-nested decorrelation shape. Lowers "
    "to: part filter broadcast-semi into lineitem, one groupBy "
    "shuffle on l_suppkey, HAVING on the decimal-exact quantity sum, "
    "then a semi join into supplier. l_quantity is integral, so the "
    "double sum is order-independent and the HAVING boundary is "
    "engine-stable.",
)
def q_heavy_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    heavy = (
        li.join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
    )


@query(
    "min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   + 1e-9, 4) AS unit_cost
      FROM lineitem
      GROUP BY 1, 2
    ), best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY 1
    )
    SELECT p_partkey, s_name, unit_cost
    FROM cost
    JOIN best ON cost.l_partkey = best.l_partkey
             AND cost.unit_cost = best.min_cost
    JOIN part     ON p_partkey = cost.l_partkey
    JOIN supplier ON s_suppkey = cost.l_suppkey
    WHERE p_size <= 5
    """,
    doc="TPC-H-Q2-shaped cheapest-supplier lookup: per-(part, "
    "supplier) unit cost, then keep only rows equal to their part's "
    "minimum (ties kept, as in the SQL join-back). The oracle writes "
    "the classic aggregate-and-join-back; the Spark side decorrelates "
    "to a window MIN over the cost aggregate instead, because the "
    "join-back form makes Catalyst aggregate the fact TWICE (no "
    "common-subexpression sharing across the self-reference) while "
    "the window form scans lineitem once and only reshuffles the "
    "tiny (part, supplier) aggregate. Equality on a ROUND()ed double "
    "from decimal-exact sums cast to double BEFORE dividing — "
    "bit-identical IEEE value in both engines.",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    # Broadcast-semi-filter lineitem on the small-part set BEFORE the
    # aggregation: per-partkey minima are unaffected by dropping other
    # partkeys, and both the agg and window shuffles shrink ~10×
    # (p_size <= 5 keeps ~1/10 of parts).
    cost = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                + 1e-9,
                4,
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "unit_cost")
    )


@query(
    "forecast_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS promo_revenue_gain,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the pure "
    "filter-and-aggregate probe — every conjunct (date range, "
    "discount band, quantity cap) is a raw-column comparison, so "
    "ALL of them reach the parquet scan as PushedFilters and the "
    "post-scan plan is a single partial-agg; decimal product "
    "accumulation keeps the sum exact under any partitioning. The "
    "query every storage layout change (clustering, Z-order, "
    "partitioning) is measured against.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.filter(f).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("promo_revenue_gain"),
        F.count(F.lit(1)).alias("n_lines"),
    )
