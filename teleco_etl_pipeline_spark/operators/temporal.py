"""Temporal join operators: as-of join and banded range join.

Neither exists in the reference (SURVEY.md §2.3: "No theta/range/
as-of/interval joins") or as a Spark built-in; both are staples of
time-series/feature-store workloads, so the engine provides them as
compositions of shuffle-friendly primitives — never a theta-join
cross product, never a UDF:

- ``asof_join``: the sort-merge formulation. Union both sides tagged,
  one window pass per key ordered by time carries the latest right
  value forward (`last(..., ignorenulls=True)`), filter back to left
  rows. Cost = ONE shuffle of |L|+|R| on the key — the same plan a
  native as-of join would produce; no per-row lookups, no explosion.
  At 100 TB this beats the broadcast-bucketed alternatives whenever
  both sides are large.
- ``banded_range_join``: uniform-width interval join rewritten as an
  equi-join on the band id (floor(x / width)) — the standard trick
  that turns an O(|L|·|R|) theta join into a hash join. For bands
  spanning k widths, explode the k candidate ids (overlap factor k,
  same shape as the hopping-window rewrite in plans/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"  # 1 = right (state), 0 = left (probe)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the most recent right-side
    ``value_cols`` with ``right.ts <= left.ts`` (``<`` when
    ``strict``) and equal keys; NULLs when no prior right row.

    Left columns are preserved; right value columns are appended.
    Within one (key, ts) tie the right row sorts before the left row
    (inclusive semantics) or after (strict).
    """
    lcols = left.columns
    l_tagged = left.withColumn(_SIDE, F.lit(0))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r_tagged = right.select(
        *key_cols, ts_col, *value_cols, F.lit(1).alias(_SIDE)
    )
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged)

    # Inclusive: right(ts) must be visible to left(ts) at the same
    # timestamp → sort right rows first (descending side). Strict:
    # right rows last.
    side_order = F.col(_SIDE).desc() if not strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        F.col(_SIDE),
        *[F.last(v, ignorenulls=True).over(w).alias(f"__asof_{v}") for v in value_cols],
    )
    out = filled.filter(F.col(_SIDE) == 0).drop(_SIDE)
    for v in value_cols:
        out = out.drop(v).withColumnRenamed(f"__asof_{v}", v)
    return out


def _register_queries() -> None:
    from pyspark.sql import SparkSession

    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "asof_last_purchase",
        """
        SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
               COALESCE(p.value, -1.0) AS last_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        doc="As-of join: each click annotated with the user's most "
        "recent prior purchase value (feature-store point-in-time "
        "lookup). Sort-merge formulation — one shuffle of |L|+|R|, "
        "no explosion; oracle is DuckDB's native ASOF JOIN.",
    )
    def q_asof_last_purchase(spark: SparkSession, sf_dir: str):
        ev = load_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        out = asof_join(
            clicks, purchases, key_cols=["user_id"], ts_col="ts", value_cols=["value"]
        )
        from teleco_etl_pipeline_spark.functions import epoch_us

        return out.select(
            "event_id",
            "user_id",
            epoch_us("ts").alias("ts_us"),
            # NULL-double hashes differ cross-engine (None vs NaN via
            # pandas) — sentinel the no-prior-purchase case on both sides.
            F.coalesce(F.col("value"), F.lit(-1.0)).alias("last_purchase_value"),
        )

    @query(
        "banded_price_join",
        """
        SELECT band_label, COUNT(*) AS n_items
        FROM lineitem l
        JOIN (SELECT band_id, 'band_' || band_id AS band_label
              FROM (SELECT unnest(range(0, 12)) AS band_id)) b
          ON l.l_extendedprice >= band_id * 10000
         AND l.l_extendedprice <  (band_id + 1) * 10000
        GROUP BY band_label
        """,
        doc="Range/interval join rewritten as an equi-join on the "
        "computed band id (floor(price/width)) — O(|L|·|R|) theta "
        "join → hash join; the oracle runs the literal range "
        "predicate to prove equivalence.",
    )
    def q_banded_price_join(spark: SparkSession, sf_dir: str):
        li = load_table(spark, sf_dir, "lineitem")
        bands = spark.range(12).select(
            F.col("id").alias("band_id"),
            F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band_label"),
        )
        joined = banded_range_join(li, bands, "l_extendedprice", width=10000.0)
        return joined.groupBy("band_label").agg(F.count(F.lit(1)).alias("n_items"))


_register_queries()


def banded_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    band_id_col: str = "band_id",
    width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` rows to uniform bands ``[band_id*width,
    (band_id+1)*width)`` as a pure equi-join on the computed band id.
    ``bands`` must be keyed by ``band_id_col``; tiny band tables
    broadcast automatically."""
    keyed = fact.withColumn(
        band_id_col, F.floor(F.col(value_col) / F.lit(width)).cast("long")
    )
    return keyed.join(bands, band_id_col, how)


def trailing_distinct_count(
    pairs: DataFrame,
    date_col: str,
    key_col: str,
    window_days: int = 7,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact trailing-``window_days`` COUNT(DISTINCT key) per observed
    day — the operator window functions cannot express (DISTINCT is
    invalid over a RANGE frame) and sketches only approximate.

    Shape: dedup to (key, day) FIRST (the big cardinality drop from
    event-scale to key×days-scale), then explode each pair onto the
    ≤``window_days`` report days it contributes to and count distinct
    per day. Work is O(w·|key×days|) under key-partitioned shuffles —
    versus a days×keys range join, which is O(days·|key×days|) and
    has no shardable equi-key. The explode factor is the window
    length, independent of data size, so the plan survives 100 TB as
    long as key×days does (the smallest exact state ANY engine needs
    for this answer). Report days are restricted to observed days via
    semi-join so quiet days don't appear with partial windows."""
    du = pairs.select(F.col(date_col).alias("_d"), key_col).distinct()
    covered = du.select(
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), window_days - 1))
        ).alias(date_col),
        key_col,
    )
    days = du.select(F.col("_d").alias(date_col)).distinct()
    return (
        covered.join(days, date_col, "left_semi")
        .groupBy(date_col)
        .agg(F.count_distinct(key_col).alias(out_col))
    )


def locf_grid_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Gap-fill a sparse event series onto a dense per-key time grid
    with last-observation-carried-forward (LOCF) — the standard
    feature-store/time-series densification the reference's daily
    snapshot exports approximate with full refreshes.

    Plan: (1) one window pass picks each (key, bucket)'s closing value
    (latest ts, tie-break on ``tiebreak_col`` for determinism under
    duplicate timestamps); (2) per-key grids are generated with
    ``sequence`` + ``explode`` from the key's first bucket to the
    GLOBAL max bucket (scalar subquery — no join node), so every key
    ends at the same as-of frontier; (3) a left join plants closing
    values on the grid and ``last(..., ignorenulls=True)`` carries
    them forward. Starting each key at its own first observation
    means the fill is never null, keeping the output schema
    non-nullable-clean.

    Scale: output is grid-sized (keys × buckets), not event-sized;
    both the closing-value window and the LOCF window shuffle on the
    key, and the explode is map-side. Integer `div` bucket arithmetic
    on epoch micros — exact, engine-portable, timezone-independent
    (cf. plans/events.py).
    """
    ev = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_us_col).alias("ts_us"),
        F.col(value_col).alias("value"),
        F.col(tiebreak_col).alias("tb"),
    ).withColumn("bucket", F.expr(f"ts_us div {bucket_us}"))
    w_close = Window.partitionBy("key", "bucket").orderBy(
        F.desc("ts_us"), F.desc("tb")
    )
    closing = (
        ev.withColumn("rn", F.row_number().over(w_close))
        .filter(F.col("rn") == 1)
        .select("key", "bucket", "value")
    )
    gmax = ev.agg(F.max("bucket").alias("mx")).scalar()
    grid = (
        ev.groupBy("key")
        .agg(F.min("bucket").alias("mn"))
        .select("key", F.explode(F.sequence(F.col("mn"), gmax)).alias("bucket"))
    )
    w_locf = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(closing, ["key", "bucket"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket",
            F.last("value", ignorenulls=True).over(w_locf).alias("value_locf"),
        )
        .orderBy(key_col, "bucket")
    )


def _register_locf_query() -> None:
    from teleco_etl_pipeline_spark.functions import epoch_us
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "events_locf_daily",
        r"""
        WITH ev AS (
          SELECT user_id AS key, epoch_us(ts) AS ts_us, value, event_id AS tb,
                 epoch_us(ts) // 86400000000 AS bucket
          FROM events
        ), closing AS (
          SELECT key, bucket, value FROM (
            SELECT key, bucket, value,
                   ROW_NUMBER() OVER (PARTITION BY key, bucket
                                      ORDER BY ts_us DESC, tb DESC) AS rn
            FROM ev)
          WHERE rn = 1
        ), gmax AS (SELECT MAX(bucket) AS mx FROM ev),
        grid AS (
          SELECT key, unnest(generate_series(mn, (SELECT mx FROM gmax))) AS bucket
          FROM (SELECT key, MIN(bucket) AS mn FROM ev GROUP BY key)
        )
        SELECT g.key AS user_id, g.bucket,
               LAST_VALUE(c.value IGNORE NULLS) OVER (
                 PARTITION BY g.key ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        FROM grid g LEFT JOIN closing c
          ON g.key = c.key AND g.bucket = c.bucket
        ORDER BY user_id, g.bucket
        """,
        doc="Daily LOCF gap-fill per user over the events table: "
        "dense grid from each user's first day to the global max "
        "day, carrying the day's closing value forward through "
        "gaps. Window + sequence/explode + left join; output is "
        "grid-sized, not event-sized.",
    )
    def q_events_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", epoch_us("ts").alias("ts_us"), "value", "event_id"
        )
        return locf_grid_fill(ev)


_register_locf_query()


def rolling_mean_over_grid(
    grid: DataFrame,
    key_col: str = "user_id",
    bucket_col: str = "bucket",
    value_col: str = "value_locf",
    window_buckets: int = 7,
) -> DataFrame:
    """Trailing ``window_buckets``-bucket moving average over a DENSE
    grid (gap-filled, e.g. :func:`locf_grid_fill` output) — the
    feature-engineering step after densification. On a dense grid a
    ROWS frame equals a RANGE frame, so the cheap frame is correct by
    construction. Reuses the grid's per-key partitioning: Catalyst
    plans this window in the same exchange as the LOCF fill when
    composed (both partition by key, order by bucket).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(-(window_buckets - 1), Window.currentRow)
    )
    return grid.select(
        key_col,
        bucket_col,
        F.round(F.avg(value_col).over(w) + F.lit(1e-9), 4).alias("rolling_mean"),
    )


def _register_rolling_query() -> None:
    from teleco_etl_pipeline_spark.functions import epoch_us
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "events_rolling_7d",
        r"""
        WITH ev AS (
          SELECT user_id AS key, epoch_us(ts) AS ts_us, value, event_id AS tb,
                 epoch_us(ts) // 86400000000 AS bucket
          FROM events
        ), closing AS (
          SELECT key, bucket, value FROM (
            SELECT key, bucket, value,
                   ROW_NUMBER() OVER (PARTITION BY key, bucket
                                      ORDER BY ts_us DESC, tb DESC) AS rn
            FROM ev)
          WHERE rn = 1
        ), gmax AS (SELECT MAX(bucket) AS mx FROM ev),
        grid AS (
          SELECT key, unnest(generate_series(mn, (SELECT mx FROM gmax))) AS bucket
          FROM (SELECT key, MIN(bucket) AS mn FROM ev GROUP BY key)
        ), locf AS (
          SELECT g.key, g.bucket,
                 LAST_VALUE(c.value IGNORE NULLS) OVER (
                   PARTITION BY g.key ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
          FROM grid g LEFT JOIN closing c
            ON g.key = c.key AND g.bucket = c.bucket
        )
        SELECT key AS user_id, bucket,
               ROUND(AVG(v) OVER (PARTITION BY key ORDER BY bucket
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 4)
               AS rolling_mean
        FROM locf
        ORDER BY user_id, bucket
        """,
        doc="Trailing 7-day moving average per user composed on the "
        "LOCF-densified daily grid — gap-fill then window features, "
        "the standard feature-store pattern. Dense grid makes the "
        "ROWS frame exact; both windows share one per-user shuffle.",
    )
    def q_events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", epoch_us("ts").alias("ts_us"), "value", "event_id"
        )
        return rolling_mean_over_grid(locf_grid_fill(ev))


_register_rolling_query()


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """For every left row, attach the right-side row NEAREST in time
    (either direction) with equal keys — the bidirectional variant of
    :func:`asof_join` (pandas ``merge_asof(direction='nearest')``;
    no Spark or reference equivalent, SURVEY.md §2.3).

    Same sort-merge shape as :func:`asof_join`: union both sides
    tagged, ONE shuffle on the key, then two frames over the same
    sort — a backward running ``last(ignorenulls)`` (right rows at or
    before, because equal-ts right rows sort ahead of left rows) and
    a forward running ``first(ignorenulls)`` starting at the current
    row (strictly-after right rows). The closer candidate wins; the
    backward one on exact distance ties. Sort order includes the
    right row's ``tiebreak_col`` so duplicate-timestamp right rows
    resolve identically in any engine. Appends ``nearest_<value>``
    and ``nearest_delta_us`` (-1 sentinel when the key has no right
    rows at all — NULL doubles hash differently cross-engine).

    Cost: one shuffle of |L|+|R|; the two frames reuse the same sort
    within the partition. No theta join, no explosion — at 100 TB
    this is the plan a native nearest-join would pick.
    """
    lcols = left.columns
    l_tagged = (
        left.withColumn(_SIDE, F.lit(0))
        .withColumn("__r_ts", F.lit(None).cast("long"))
        .withColumn("__r_val", F.lit(None).cast(right.schema[value_col].dataType))
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_us_col),
        F.col(tiebreak_col),
        F.lit(1).alias(_SIDE),
        F.col(ts_us_col).alias("__r_ts"),
        F.col(value_col).alias("__r_val"),
    )
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col(ts_us_col).asc(), F.col(_SIDE).desc(), F.col(tiebreak_col).asc()]
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    scanned = unioned.select(
        *lcols,
        F.col(_SIDE),
        F.last("__r_ts", ignorenulls=True).over(w_back).alias("__b_ts"),
        F.last("__r_val", ignorenulls=True).over(w_back).alias("__b_val"),
        F.first("__r_ts", ignorenulls=True).over(w_fwd).alias("__f_ts"),
        F.first("__r_val", ignorenulls=True).over(w_fwd).alias("__f_val"),
    ).filter(F.col(_SIDE) == 0)

    ts = F.col(ts_us_col)
    back_d = ts - F.col("__b_ts")
    fwd_d = F.col("__f_ts") - ts
    use_back = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (back_d <= fwd_d)
    )
    return scanned.select(
        *lcols,
        F.when(F.col("__b_ts").isNull() & F.col("__f_ts").isNull(), F.lit(-1.0))
        .when(use_back, F.col("__b_val"))
        .otherwise(F.col("__f_val"))
        .alias(f"nearest_{value_col}"),
        F.when(F.col("__b_ts").isNull() & F.col("__f_ts").isNull(), F.lit(-1))
        .when(use_back, back_d)
        .otherwise(fwd_d)
        .cast("long")
        .alias("nearest_delta_us"),
    )


def _register_nearest_query() -> None:
    from pyspark.sql import SparkSession

    from teleco_etl_pipeline_spark.functions import epoch_us
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "asof_nearest_purchase",
        """
        WITH u AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 0 AS side, NULL::BIGINT AS r_ts, NULL::DOUBLE AS r_val
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, user_id, epoch_us(ts),
                 1, epoch_us(ts), value
          FROM events WHERE event_type = 'purchase'
        ), scanned AS (
          SELECT event_id, user_id, ts_us, side,
                 LAST_VALUE(r_ts IGNORE NULLS) OVER wb AS b_ts,
                 LAST_VALUE(r_val IGNORE NULLS) OVER wb AS b_val,
                 FIRST_VALUE(r_ts IGNORE NULLS) OVER wf AS f_ts,
                 FIRST_VALUE(r_val IGNORE NULLS) OVER wf AS f_val
          FROM u
          WINDOW
            wb AS (PARTITION BY user_id ORDER BY ts_us, side DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (PARTITION BY user_id ORDER BY ts_us, side DESC, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id, ts_us,
               CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN -1.0
                    WHEN f_ts IS NULL THEN b_val
                    WHEN b_ts IS NULL THEN f_val
                    WHEN ts_us - b_ts <= f_ts - ts_us THEN b_val
                    ELSE f_val END AS nearest_value,
               CAST(CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN -1
                         WHEN f_ts IS NULL THEN ts_us - b_ts
                         WHEN b_ts IS NULL THEN f_ts - ts_us
                         WHEN ts_us - b_ts <= f_ts - ts_us THEN ts_us - b_ts
                         ELSE f_ts - ts_us END AS BIGINT) AS nearest_delta_us
        FROM scanned WHERE side = 0
        """,
        doc="Nearest-in-time join: each click annotated with the "
        "same user's temporally closest purchase in EITHER direction "
        "(merge_asof direction='nearest'). One-shuffle sort-merge "
        "formulation; oracle replays the identical two-frame window "
        "logic in DuckDB SQL since its native ASOF JOIN is "
        "backward-only.",
    )
    def q_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", epoch_us("ts").alias("ts_us")
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", epoch_us("ts").alias("ts_us"), "value"
        )
        out = asof_nearest_join(
            clicks,
            purchases,
            key_cols=["user_id"],
            ts_us_col="ts_us",
            value_col="value",
            tiebreak_col="event_id",
        )
        return out.select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("nearest_value").alias("nearest_value"),
            "nearest_delta_us",
        )


_register_nearest_query()


def _register_dq_temporal_queries() -> None:
    """Operational-DQ temporal reports (round-11 second session):
    calendar completeness, ingestion-burst detection, and arrival
    overdispersion — the three time-axis health checks a 100 TB
    event/fact pipeline runs before trusting downstream windows."""
    from pyspark.sql import SparkSession

    from teleco_etl_pipeline_spark.functions import epoch_us
    from teleco_etl_pipeline_spark.plans.registry import query
    from teleco_etl_pipeline_spark.sources.tables import load_table

    @query(
        "orders_calendar_gap_report",
        """
        WITH days AS (
          SELECT DISTINCT o_orderpriority AS pr, o_orderdate AS d
          FROM orders
        ), gaps AS (
          SELECT pr, d, LAG(d) OVER (PARTITION BY pr ORDER BY d) AS pd
          FROM days
        )
        SELECT pr AS o_orderpriority,
               strftime(MIN(d), '%Y-%m-%d') AS first_day,
               strftime(MAX(d), '%Y-%m-%d') AS last_day,
               CAST(date_diff('day', MIN(d), MAX(d)) + 1 AS BIGINT)
                 AS span_days,
               CAST(COUNT(*) AS BIGINT) AS active_days,
               CAST(date_diff('day', MIN(d), MAX(d)) + 1 - COUNT(*)
                    AS BIGINT) AS missing_days,
               CAST(COALESCE(MAX(date_diff('day', pd, d) - 1), 0)
                    AS BIGINT) AS longest_gap_days
        FROM gaps GROUP BY pr ORDER BY pr
        """,
        doc="Calendar completeness report — the backfill-health check "
        "every incremental pipeline needs: per order priority, the "
        "active-vs-span day counts and the LONGEST run of missing "
        "days (the classic gaps-and-islands LAG formulation on the "
        "DISTINCT (key, day) grid, so everything after the first "
        "reduce is key×days sized, never fact-sized). A non-zero "
        "longest_gap over a supposedly-continuous feed is the "
        "load-window-skipped signal that row counts alone miss. "
        "All-integer output + ISO date strings.",
    )
    def q_orders_calendar_gap_report(spark: SparkSession, sf_dir: str):
        o = load_table(spark, sf_dir, "orders")
        days = o.select(
            F.col("o_orderpriority").alias("pr"),
            F.col("o_orderdate").alias("d"),
        ).distinct()
        w = Window.partitionBy("pr").orderBy("d")
        gaps = days.select("pr", "d", F.lag("d").over(w).alias("pd"))
        span = F.datediff(F.max("d"), F.min("d")) + 1
        return (
            gaps.groupBy(F.col("pr").alias("o_orderpriority"))
            .agg(
                F.date_format(F.min("d"), "yyyy-MM-dd").alias("first_day"),
                F.date_format(F.max("d"), "yyyy-MM-dd").alias("last_day"),
                span.cast("long").alias("span_days"),
                F.count(F.lit(1)).cast("long").alias("active_days"),
                (span - F.count(F.lit(1))).cast("long").alias("missing_days"),
                F.coalesce(
                    F.max(F.datediff(F.col("d"), F.col("pd")) - 1), F.lit(0)
                )
                .cast("long")
                .alias("longest_gap_days"),
            )
            .orderBy("o_orderpriority")
        )

    @query(
        "events_burst_report",
        """
        WITH seq AS (
          SELECT event_type, user_id,
                 epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id)) AS gap_us
          FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               CAST(COUNT(*) FILTER (WHERE gap_us <= 60000000)
                    AS BIGINT) AS n_within_1m,
               CAST(COUNT(*) FILTER (WHERE gap_us <= 3600000000)
                    AS BIGINT) AS n_within_1h,
               CAST(MIN(gap_us) // 1000000 AS BIGINT) AS min_gap_s
        FROM seq GROUP BY event_type ORDER BY event_type
        """,
        doc="Ingestion-burst / rapid-fire detector: per event type, "
        "how many same-user same-type events arrive within 1 minute "
        "and 1 hour of the previous one, plus the minimum observed "
        "inter-arrival gap — the duplicate-delivery and bot-burst "
        "screen run before trusting at-least-once event feeds. One "
        "(user,type) LAG window (a single shuffle that any "
        "sessionization already pays); gaps are exact epoch-micro "
        "integers, timezone-independent.",
    )
    def q_events_burst_report(spark: SparkSession, sf_dir: str):
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id", "event_type").orderBy(
            epoch_us("ts"), F.col("event_id")
        )
        seq = ev.select(
            "event_type",
            (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
        )
        cnt_if = lambda c: F.count(F.when(c, F.lit(1)))  # noqa: E731
        return (
            seq.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.count("gap_us").cast("long").alias("n_gaps"),
                cnt_if(F.col("gap_us") <= 60_000_000)
                .cast("long")
                .alias("n_within_1m"),
                cnt_if(F.col("gap_us") <= 3_600_000_000)
                .cast("long")
                .alias("n_within_1h"),
                F.expr("CAST(min(gap_us) div 1000000 AS BIGINT)").alias(
                    "min_gap_s"
                ),
            )
            .orderBy("event_type")
        )

    @query(
        "events_arrival_dispersion",
        """
        WITH hc AS (
          SELECT event_type,
                 epoch_us(ts) // 3600000000 AS hr,
                 COUNT(*) AS c
          FROM events GROUP BY event_type, hr
        )
        SELECT event_type,
               CAST(MAX(hr) - MIN(hr) + 1 AS BIGINT) AS span_hours,
               CAST(COUNT(*) AS BIGINT) AS observed_hours,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CASE WHEN MAX(hr) > MIN(hr) THEN
                 ROUND(CAST((MAX(hr) - MIN(hr) + 1) * SUM(c * c)
                            - SUM(c) * SUM(c) AS DOUBLE)
                       / CAST(SUM(c) * (MAX(hr) - MIN(hr)) AS DOUBLE)
                       + 1e-9, 6)
               ELSE 0.0 END AS dispersion
        FROM hc GROUP BY event_type ORDER BY event_type
        """,
        doc="Arrival overdispersion (index of dispersion, variance/"
        "mean of per-hour counts over the FULL observed hour span — "
        "empty hours count as zeros via the span algebra, no grid "
        "materialized): ~1 for Poisson arrivals, >>1 for bursty/"
        "campaign traffic, <1 for rate-limited feeds — the "
        "traffic-shape screen behind anomaly thresholds. D = "
        "(n·Σc² − T²)/(T·(n−1)) with n = span hours, all moments "
        "exact int64 from one (type, hour) reduce; one CR division "
        "at the end. Hour buckets are epoch-micro integer division — "
        "timezone-independent.",
    )
    def q_events_arrival_dispersion(spark: SparkSession, sf_dir: str):
        ev = load_table(spark, sf_dir, "events")
        hc = (
            ev.select("event_type", epoch_us("ts").alias("us"))
            .groupBy(
                "event_type",
                F.expr("CAST(us div 3600000000 AS BIGINT)").alias("hr"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )
        n = F.max("hr") - F.min("hr") + 1
        t = F.sum("c")
        # Moments in DECIMAL(38) mirroring the oracle's HUGEINT-exact
        # arithmetic (int64 n·Σc² wraps for bursty multi-1e9-row
        # groups); whole numerator/denominator each take ONE CR cast
        # to double, then the single CR division — same op sequence
        # as the SQL. A single-bucket history (span == 1) has an
        # undefined variance: 0.0 on both engines, never 0/0.
        cd = F.col("c").cast("decimal(19,0)")
        nd = (F.max("hr") - F.min("hr") + 1).cast("decimal(19,0)")
        td = F.sum(cd)
        num = nd * F.sum(cd * cd) - td * td
        den = td * (F.max("hr") - F.min("hr")).cast("decimal(19,0)")
        return (
            hc.groupBy("event_type")
            .agg(
                n.cast("long").alias("span_hours"),
                F.count(F.lit(1)).cast("long").alias("observed_hours"),
                t.cast("long").alias("n_events"),
                F.when(
                    F.max("hr") > F.min("hr"),
                    F.round(
                        num.cast("double") / den.cast("double")
                        + F.lit(1e-9),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("dispersion"),
            )
            .orderBy("event_type")
        )


_register_dq_temporal_queries()
