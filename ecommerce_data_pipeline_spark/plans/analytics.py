"""Product-analytics and incremental-maintenance queries (SURVEY.md §2
extensions): event funnels, retention cohorts, mergeable incremental
rollups, and percentile-position windows.

The funnel/cohort tier models the analyses the reference's event stream
feeds downstream (transactions_mock_data.py event taxonomy); the
incremental rollup demonstrates the partial-aggregate merge property that
makes the engine's aggregation tier restartable/streamable at 100 TB
(state + delta → same result as full recompute, verified by the oracle
being the plain full-table aggregation).

Timestamp parity: load_table normalizes events.ts to a microsecond
TIMESTAMP for any stored layout (epoch-nanos int64 in older testdata,
TIMESTAMP_NTZ now — see sources/readers.py); oracle-side CASTs of ts to
TIMESTAMP are no-ops on the current layout and a matching truncation on
the old one, so both engines always order on identical microsecond
instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans._helpers import dec, dsum, sql_dsum
from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.plans.scale import pin_if_cluster
from ecommerce_data_pipeline_spark.sources.readers import load_table


@register(
    "event_funnel_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (
      SELECT user_id, MIN(ts) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    tags=("extension", "analytics", "events"),
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each stage must occur strictly
    after the user's first completion of the previous stage.

    Three hash aggregates keyed by user_id plus two user-keyed joins —
    every shuffle is on the same key, so AQE coalesces them into one
    exchange lineage; no windows, no driver collects. The classic
    sessionized-funnel form every event pipeline needs.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        # persist: consumed by the click stage AND the stage-count agg —
        # unpersisted, each consumer re-executes the events scan
        .persist()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .persist()  # same: feeds the purchase stage and its own count
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    totals = e.agg(F.countDistinct("user_id").alias("n_users"))
    return (
        totals.crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_viewed"))))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click"))))
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
    ),
    cohort AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id)
    SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', c.cohort_day, e.d) AS INT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_active_users
    FROM e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("extension", "analytics", "events"),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each subsequent active day offset.

    The cohort relation is |users|-sized (small next to events) and joins
    back on user_id — at 100 TB the cohort side is the broadcast/bucketed
    side and the wide events scan aggregates map-side first.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohort = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        e.join(cohort, "user_id")
        .groupBy(
            # publish as timestamp: both engines print naive midnight,
            # matching the oracle's CAST(cohort_day AS TIMESTAMP)
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@register(
    "incremental_rollup_merge",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1
    """,
    tags=("extension", "incremental", "aggregate"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: a pre-aggregated STATE (orders
    before 1997-01-01) merged with a DELTA partial aggregate (orders on or
    after) by summing partials — the mergeability contract that lets the
    rollup be maintained incrementally (per micro-batch or per ingest
    day) instead of recomputed.

    The oracle is the FULL recompute, so the driver proves
    merge(state, delta) == recompute — decimal partial sums make the
    merge exact. Both partials aggregate map-side before the single
    month-keyed shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        # o_orderdate is a TIMESTAMP column; date_trunc keeps it one on
        # both engines, so the published month is timestamp-typed twice.
        return df.groupBy(F.date_trunc("month", "o_orderdate").alias("o_month")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("price_partial"),
        )

    state = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("o_month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("price_partial").cast("double").alias("total_price"),
        )
    )


@register(
    "window_percentile_position",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_d,
           CAST(ntile(10) OVER w AS INT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def window_percentile_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over balance within market segment
    (W1 completion — the relative-position analytics the rank/dense_rank
    query doesn't cover). Ordering includes the key for tie-free ntile.
    Partitioned by segment — no global window."""
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_d"),
        F.ntile(10).over(w).alias("decile"),
    )


@register(
    "events_activity_grid",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
      FROM events
    ),
    span AS (
      SELECT user_id, MIN(day) AS dmin, MAX(day) AS dmax FROM e
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(g AS DATE) AS day
      FROM span, unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS t(g)
    ),
    daily AS (
      SELECT user_id, day, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM e GROUP BY user_id, day
    )
    SELECT g.user_id,
           CAST(g.day AS VARCHAR) AS day,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.day_value, 0.0) AS day_value,
           CAST(d.user_id IS NULL AS BOOLEAN) AS is_gap
    FROM grid g LEFT JOIN daily d
      ON g.user_id = d.user_id AND g.day = d.day
    """,
    tags=("extension", "analytics", "timeseries"),
)
def events_activity_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-user daily activity grid: one row per (user, day)
    for every day between the user's first and last event — zero-filled
    where the user was silent — the dense time-series shape downstream
    models (churn, forecasting) require, which raw event logs never have.

    Grid generation is distributed: `sequence(dmin, dmax)` explodes
    per-user spans locally (no driver loop, no global calendar join), so
    at 100 TB the grid work partitions by user exactly like every other
    events-tier operator. The daily rollup joins back on the same
    (user, day) key; days published as ISO strings (date-type parity).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"), "value"
    )
    span = e.groupBy("user_id").agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(dmin, dmax, interval 1 day)")).alias("day"),
    )
    daily = e.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "day_value"
        ),
    )
    d = daily.alias("d")
    return (
        grid.alias("g")
        .join(
            d,
            (F.col("g.user_id") == F.col("d.user_id"))
            & (F.col("g.day") == F.col("d.day")),
            "left",
        )
        .select(
            F.col("g.user_id").alias("user_id"),
            F.col("g.day").cast("string").alias("day"),
            F.coalesce("d.n_events", F.lit(0)).alias("n_events"),
            F.coalesce("d.day_value", F.lit(0.0)).alias("day_value"),
            F.col("d.user_id").isNull().alias("is_gap"),
        )
    )


@register(
    "user_path_mining",
    oracle="""
    WITH paths AS (
      SELECT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             string_agg(event_type, '>' ORDER BY CAST(ts AS TIMESTAMP),
                        event_id) AS path,
             COUNT(*) AS n_events
      FROM events
      GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
    )
    SELECT path, n_events AS path_len_events,
           COUNT(*) AS n_user_days
    FROM paths
    GROUP BY path, n_events
    HAVING COUNT(*) >= 3
    """,
    tags=("extension", "analytics", "sequence"),
)
def user_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-journey mining: per (user, day) the ordered event-type
    path (view>click>purchase...), then the frequency of each distinct
    path across all user-days — the sequence-pattern rollup product
    analytics derives funnels and anomaly signatures from.

    Path assembly is a hash aggregate keyed by (user, day): collect the
    day's events as (ts, event_id, type) structs, array_sort (ts then
    event_id — unique, so the path string is deterministic), join with
    '>'. The frequency rollup then re-keys by the path string itself.
    Both shuffles are on high-cardinality keys; no windows, no global
    ordering anywhere.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    paths = e.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("path_len_events"),
    )
    return (
        paths.groupBy("path", "path_len_events")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .where(F.col("n_user_days") >= 3)
    )


@register(
    "association_rules_brands",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM basket),
    item AS (SELECT brand, COUNT(*) AS cnt FROM basket GROUP BY brand),
    pair AS (
      SELECT a.brand AS antecedent, c.brand AS consequent,
             COUNT(*) AS pair_count
      FROM basket a JOIN basket c
        ON a.okey = c.okey AND a.brand <> c.brand
      GROUP BY a.brand, c.brand
    )
    SELECT p.antecedent, p.consequent, p.pair_count,
           ROUND(p.pair_count * 1.0 / n.n_orders, 6) AS support,
           ROUND(p.pair_count * 1.0 / ia.cnt, 6) AS confidence,
           ROUND((p.pair_count * 1.0 * n.n_orders) / (ia.cnt * 1.0 * ic.cnt),
                 6) AS lift
    FROM pair p
    JOIN item ia ON p.antecedent = ia.brand
    JOIN item ic ON p.consequent = ic.brand
    CROSS JOIN n
    WHERE p.pair_count >= 5
    """,
    tags=("extension", "analytics", "market-basket"),
)
def association_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets (antecedent
    brand -> consequent brand) with support / confidence / lift — the
    co-purchase signal recommendation and assortment analytics start
    from.

    Plan shape for 100 TB: the basket relation (distinct order x brand)
    comes from one broadcast join (part is a dim) + one hash distinct
    keyed by order; the pair expansion is a self-join co-located on
    l_orderkey (both sides share the same shuffle key, ~k^2 rows per
    order for k≈4 distinct brands), immediately re-aggregated onto the
    tiny (brand, brand) key space. Item counts and the grand total are
    one extra aggregation each, broadcast back onto the 600-row rule
    table. Ratios are single integer->double divisions with identical
    parenthesization in the oracle, so support/confidence/lift match
    bit-for-bit at 6dp.
    """
    from pyspark.sql.functions import broadcast

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    basket = (
        li.join(broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        # persist: four consumers (grand total, item counts, both pair
        # sides) — unpersisted, each re-executes the fact join+distinct
        .persist()
    )
    n_orders = basket.select(
        F.countDistinct("okey").alias("n_orders")
    )
    item = basket.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = basket.alias("a")
    c = basket.alias("c")
    pair = (
        a.join(
            c,
            (F.col("a.okey") == F.col("c.okey"))
            & (F.col("a.brand") != F.col("c.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("antecedent"),
            F.col("c.brand").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= 5)
    )
    ia = item.select(
        F.col("brand").alias("antecedent"), F.col("cnt").alias("cnt_a")
    )
    ic = item.select(
        F.col("brand").alias("consequent"), F.col("cnt").alias("cnt_c")
    )
    return (
        pair.join(broadcast(ia), "antecedent")
        .join(broadcast(ic), "consequent")
        .crossJoin(broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.round(F.col("pair_count") * 1.0 / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(F.col("pair_count") * 1.0 / F.col("cnt_a"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("pair_count") * 1.0 * F.col("n_orders"))
                / (F.col("cnt_a") * 1.0 * F.col("cnt_c")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "copurchase_graph_stats",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pk < b.pk
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM edges
        UNION ALL
        SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
    ),
    agg AS (
      SELECT COUNT(*) AS n_nodes,
             SUM(degree * (degree - 1) / 2) AS n_wedges,
             MAX(degree) AS max_degree
      FROM deg
    )
    SELECT agg.n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           agg.max_degree,
           tri.n_triangles,
           CAST(agg.n_wedges AS BIGINT) AS n_wedges,
           ROUND(3.0 * tri.n_triangles / agg.n_wedges, 6)
             AS clustering_coeff
    FROM agg CROSS JOIN tri
    """,
    tags=("extension", "graph"),
)
def copurchase_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase graph topology profile: nodes = parts, edges = 'ever
    bought together in one order'; reports edge/degree structure,
    exact triangle count, and the global clustering coefficient
    (3*triangles / wedges) — the graph-shape diagnostics a
    recommendation pipeline runs before committing to graph features.

    Triangle counting is the canonical distributed-join formulation:
    orient every edge along a total order, then two hash joins —
    edges⋈edges on the shared middle vertex to enumerate oriented
    wedges, closed against the edge set itself. The orientation used
    here is BY DEGREE (ties by id), not by id: every edge points from
    its lower-degree endpoint to its higher-degree one, so a hub with
    degree d contributes C(out,2) wedges with out = O(sqrt(m)) instead
    of C(d,2) — the refinement that keeps the wedge intermediate
    bounded on power-law graphs at 100 TB. The published counts are
    orientation-invariant, so the oracle runs the simpler id-ordered
    form and must agree exactly. Degree histogram and wedge counts are
    exact integer aggregations of the edge list.
    """
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        # persist: the edge list feeds the degree union (2x), the
        # orientation join, and the closure join — unpersisted, every
        # consumer re-ran the basket self-join+distinct (measured 27.9 s
        # at sf0.1 before these cuts, 36 scan nodes in the plan)
        .persist()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()  # consumed as both du and dv
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        # persist: three self-join sides in the triangle closure
        .persist()
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src"))
            & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(F.count(F.lit(1)).alias("n_triangles"))
    )
    agg = deg.select(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            (F.col("degree") * (F.col("degree") - 1) / 2).cast("long")
        ).alias("n_wedges"),
        F.max("degree").alias("max_degree"),
    )
    n_edges = edges.select(F.count(F.lit(1)).alias("n_edges"))
    return (
        agg.crossJoin(tri)
        .crossJoin(n_edges)
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            "n_triangles",
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


@register(
    "ewma_user_value",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(
             list_reduce(
               list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
               (acc, x) -> acc * 0.75 + x * 0.25
             ), 6) AS ewma_value
    FROM events
    GROUP BY user_id
    """,
    tags=("extension", "analytics", "timeseries"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.25) of each user's
    event values in time order — the recency-weighted activity signal
    behind engagement scores and anomaly baselines, and the classic
    'inherently sequential' recurrence engines claim needs imperative
    code.

    Expressed relationally anyway: collect each user's values as an
    array sorted by (ts, event_id) (unique tiebreak -> deterministic
    order), seed the fold with the first value, then one
    ``F.aggregate`` pass applies s = 0.75*s + 0.25*x. The oracle's
    list_reduce folds the identically-ordered list with the identical
    expression, so the doubles match bit-for-bit at 6dp — sequential
    determinism without a single-reducer window. State is one array per
    user (~tens of events); at 100 TB you'd bound it with a slice to
    the trailing window before folding, same shape.
    """
    ev = load_table(spark, sf_dir, "events")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), vals.alias("vals"))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.aggregate(
                    F.slice(F.col("vals"), F.lit(2), F.size("vals") - 1),
                    F.element_at("vals", 1),
                    lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25),
                ),
                6,
            ).alias("ewma_value"),
        )
    )


@register(
    "attribution_last_touch",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             value
      FROM events
    ),
    touched AS (
      SELECT *,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type
                             END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type
      FROM e
    )
    SELECT COALESCE(touch_type, 'direct') AS attributed_channel,
           COUNT(*) AS n_purchases,
           {sql_dsum('value')} AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch_type, 'direct')
    """,
    tags=("extension", "analytics", "attribution"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent preceding non-purchase interaction (view/click/signup/error;
    'direct' when the purchase is the user's first event) and roll up
    purchases and value per attributed channel — the standard marketing
    attribution rollup.

    The 'most recent preceding' lookup is last_value(... IGNORE NULLS)
    over a per-user frame ENDING ONE ROW BEFORE current — no self-join,
    no per-event scan-back; one window pass partitioned by user (the
    same shuffle key as every events-tier operator), then a hash rollup
    onto the 5-channel key. Value sums are exact decimal. At 100 TB:
    users partition independently; frame state is one running value per
    partition row — O(1) memory per user regardless of history length.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch_type", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("touch_type", F.lit("direct")).alias(
                "attributed_channel"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("attributed_value"),
        )
    )


@register(
    "rolling_7d_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    fanned AS (
      SELECT DISTINCT user_id, CAST(g AS DATE) AS window_end
      FROM daily,
           unnest(generate_series(day, day + INTERVAL 6 DAY,
                                  INTERVAL 1 DAY)) AS t(g)
    ),
    bounds AS (SELECT MAX(day) AS dmax FROM daily)
    SELECT CAST(f.window_end AS VARCHAR) AS window_end,
           COUNT(*) AS active_users_7d
    FROM fanned f CROSS JOIN bounds b
    WHERE f.window_end <= b.dmax
    GROUP BY f.window_end
    """,
    tags=("extension", "analytics", "timeseries"),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active-user counts (the WAU curve): for every day,
    the number of DISTINCT users seen in the trailing 7-day window —
    the metric COUNT(DISTINCT) OVER a sliding frame cannot express
    (distinct doesn't decompose over frames).

    The scalable reformulation: shrink events to distinct (user, day)
    pairs first (the big reduction), fan each pair to the <=7 window
    ends it contributes to (sequence explode — bounded, local), distinct
    again to collapse multi-day users per window, then a plain count per
    window end. Every step is a hash shuffle on high-cardinality keys;
    the 7x fan-out happens AFTER the daily dedup, so at 100 TB the
    fanned relation is 7 x |user-days|, not 7 x |events|. Trailing
    windows that extend past the last observed day are clipped (both
    engines), so counts cover only fully-observable days.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    fanned = daily.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("window_end"),
    ).distinct()
    bounds = daily.select(F.max("day").alias("dmax"))
    from pyspark.sql.functions import broadcast

    return (
        fanned.crossJoin(broadcast(bounds))
        .where(F.col("window_end") <= F.col("dmax"))
        .groupBy(F.col("window_end").cast("string").alias("window_end"))
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


@register(
    "winsorized_price_stats",
    oracle="""
    WITH cuts AS (
      SELECT o_orderpriority,
             CAST(quantile_cont(o_totalprice, 0.05) AS DOUBLE) AS p05,
             CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95
      FROM orders GROUP BY o_orderpriority
    ),
    clipped AS (
      SELECT o.o_orderpriority,
             CAST(CASE WHEN o.o_totalprice < c.p05 THEN c.p05
                       WHEN o.o_totalprice > c.p95 THEN c.p95
                       ELSE o.o_totalprice END AS DECIMAL(18,4)) AS w,
             CASE WHEN o.o_totalprice < c.p05
                  OR o.o_totalprice > c.p95 THEN 1 ELSE 0 END AS clip
      FROM orders o JOIN cuts c ON o.o_orderpriority = c.o_orderpriority
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(clip) AS BIGINT) AS n_clipped,
           ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 4) AS winsorized_mean
    FROM clipped
    GROUP BY o_orderpriority
    """,
    tags=("extension", "ml-prep", "robust-stats"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean: clip order totals to their group's
    [P5, P95] band, then average — the outlier-resistant location
    estimate feature pipelines prefer over raw means when upstream data
    can glitch (and the counterpart of the z-score REJECTION gate:
    winsorizing keeps the row, tames the value).

    Two passes, both group-keyed: exact interpolated percentiles per
    priority class (same PERCENTILE_CONT parity as percentiles_exact),
    broadcast the 5-row cut table back onto the fact scan, clip, and
    aggregate. Clipped values are cast to DECIMAL(18,4) BEFORE summation
    (percentile cuts are 4dp-exact here), so the mean is
    order-independent exact arithmetic — no float accumulation even
    though the clip boundaries are interpolated doubles.
    """
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    cuts = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    w = (
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(18,4)")
    )
    clip = (
        (F.col("o_totalprice") < F.col("p05"))
        | (F.col("o_totalprice") > F.col("p95"))
    ).cast("int")
    return (
        o.join(broadcast(cuts), "o_orderpriority")
        .select("o_orderpriority", w.alias("w"), clip.alias("clip"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clip").cast("long").alias("n_clipped"),
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)), 4
            ).alias("winsorized_mean"),
        )
    )


@register(
    "activity_streaks",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    anchored AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS anchor
      FROM daily
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS streak_len
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak
    FROM streaks
    GROUP BY user_id
    """,
    tags=("extension", "analytics", "sequence"),
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (gaps-and-islands): the
    engagement shape behind habit metrics ('7-day streak') and churn
    features. An island of consecutive days shares the invariant
    day - row_number() = const; grouping on that anchor yields streak
    lengths, then a per-user rollup reports total active days, streak
    count, and the longest run.

    Everything is keyed by user: one partitioned window (row_number over
    the user's distinct days — no global ordering), two hash
    aggregations. The distinct-day dedup happens BEFORE the window, so
    the windowed relation is |user-days|, not |events|. Date arithmetic
    (date - int) is identical in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = daily.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").cast("long").alias("longest_streak"),
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM orders
      WHERE o_totalprice >= 1
    ),
    n AS (SELECT COUNT(*) AS total FROM digits)
    SELECT d AS first_digit,
           COUNT(*) AS observed,
           ROUND(COUNT(*) * 1.0 / n.total, 6) AS observed_freq,
           ROUND(log10(1.0 + 1.0 / d), 6) AS benford_freq,
           ROUND(COUNT(*) * 1.0 / n.total - log10(1.0 + 1.0 / d), 6)
             AS deviation
    FROM digits CROSS JOIN n
    GROUP BY d, n.total
    """,
    tags=("extension", "profiling", "audit"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals: observed
    leading-digit frequencies against the log10(1 + 1/d) expectation —
    the forensic-audit screen for fabricated or truncated monetary data
    (real multiplicative amounts follow Benford; synthetic uniform data,
    like this fixture, visibly deviates — the deviation column IS the
    signal).

    Digit extraction goes through the DECIMAL(18,2) string form on both
    engines (double formatting differs cross-engine; decimal formatting
    doesn't). One projection + one 9-group aggregate with the total
    re-broadcast — a single pass at any scale. The frequency ratio and
    the log expectation are each a single double expression, identical
    both sides at 6dp.
    """
    from pyspark.sql.functions import broadcast

    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    digits = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(dec("o_totalprice").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    n = digits.select(F.count(F.lit(1)).alias("total"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return (
        digits.crossJoin(broadcast(n))
        .groupBy("d", "total")
        .agg(F.count(F.lit(1)).alias("observed"))
        .select(
            F.col("d").alias("first_digit"),
            "observed",
            F.round(F.col("observed") * 1.0 / F.col("total"), 6).alias(
                "observed_freq"
            ),
            F.round(benford, 6).alias("benford_freq"),
            F.round(
                F.col("observed") * 1.0 / F.col("total") - benford, 6
            ).alias("deviation"),
        )
    )


@register(
    "top_spenders_per_nation",
    oracle=f"""
    WITH spend AS (
      SELECT n.n_name, c.c_custkey, c.c_name,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_custkey, c.c_name
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY n_name ORDER BY revenue DESC, c_custkey
      ) AS rnk
      FROM spend
    )
    SELECT n_name, c_custkey, c_name, revenue, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    tags=("extension", "analytics", "window"),
)
def top_spenders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by lifetime spend per nation — the canonical
    top-k-per-group report. Aggregation first (shrinks the window input
    to one row per customer), then a rank window per nation that plans
    as WindowGroupLimit: each map task keeps a 3-heap per nation, so the
    window shuffle carries O(groups · k), not O(customers). Decimal
    accumulation, id tiebreak — fully deterministic cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # nation always broadcasts (25 rows at any scale); customer is a BIG
    # dim at target scale — leave that join to AQE (shuffle join with
    # runtime broadcast conversion when stats allow)
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            "revenue",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "events_hourly_seasonality",
    oracle="""
    WITH g AS (
      SELECT CAST(isodow(ts) AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hod,
             count(*) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_events) AS total FROM g)
    SELECT dow, hod, n_events, n_users, total_value,
           round(n_events * 1.0 / (SELECT total FROM tot), 6) AS share
    FROM g
    """,
    tags=("extension", "events", "seasonality"),
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality grid: event volume / distinct users / value by
    (ISO day-of-week × hour-of-day) with each cell's share of total —
    the load-shape profile behind capacity planning and anomaly
    baselines. One aggregation into a ≤168-row grid; the share
    normalization is a broadcast join against a one-row total (never a
    global window)."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        F.dayofweek(F.date_sub(F.col("ts"), 1)).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
    )
    tot = g.agg(F.sum("n_events").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n_events",
        "n_users",
        "total_value",
        F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
    )


@register(
    "supplier_concentration_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_type, l.l_suppkey,
             {sql_dsum('l.l_extendedprice')} AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, l.l_suppkey
    ),
    tot AS (SELECT p_type, SUM(revenue) AS total, count(*) AS n_suppliers
            FROM rev GROUP BY p_type)
    SELECT r.p_type,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
           round(SUM((r.revenue / t.total) * (r.revenue / t.total)), 6) AS hhi
    FROM rev r JOIN tot t ON r.p_type = t.p_type
    GROUP BY r.p_type, t.n_suppliers
    """,
    tags=("extension", "analytics", "concentration"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per product type via the Herfindahl-
    Hirschman index (Σ share² — 1/n = perfect competition, 1 = monopoly):
    the supply-risk metric next to the Gini/Pareto tier. Two p_type-keyed
    aggregations and a join — decimal revenue accumulation keeps the
    shares cross-engine exact before the single double division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(dsum("l_extendedprice").alias("revenue"))
    )
    tot = rev.groupBy("p_type").agg(
        F.sum("revenue").alias("total"), F.count(F.lit(1)).alias("n_suppliers")
    )
    share = F.col("revenue") / F.col("total")
    return (
        rev.join(tot, "p_type")
        .groupBy("p_type", "n_suppliers")
        .agg(F.round(F.sum(share * share), 6).alias("hhi"))
        .select(
            "p_type",
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            "hhi",
        )
    )


@register(
    "repeat_purchase_interval",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             date_diff('microsecond', prev_ts, ts) / 86400e6 AS gap_days
      FROM p WHERE prev_ts IS NOT NULL
    )
    SELECT count(*) AS n_intervals,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_repeat_buyers,
           round(avg(gap_days), 4) AS avg_gap_days,
           round(CAST(quantile_cont(gap_days, 0.5) AS DOUBLE), 4) AS median_gap_days,
           round(CAST(quantile_cont(gap_days, 0.9) AS DOUBLE), 4) AS p90_gap_days
    FROM gaps
    """,
    tags=("extension", "analytics", "retention"),
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution — the repeat-buying cadence
    behind churn models and replenishment campaigns: per-user gaps from
    a user-partitioned lag, then one summary row (count / buyers / mean /
    exact p50 / p90 of gap days). The window shuffles on user_id like
    the sessionizer; the percentile runs over the |purchase|-sized gap
    relation, with the approx twin as the documented 100 TB swap."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        p.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (
                (F.col("ts").cast("double") - F.col("prev_ts").cast("double"))
                / 86400.0
            ).alias("gap_days"),
        )
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.count_distinct("user_id").alias("n_repeat_buyers"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.5)), 4).alias("median_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.9)), 4).alias("p90_gap_days"),
    )


@register(
    "discount_quantity_lift",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(l_discount * 20) AS INT) AS disc_bucket,
             l_quantity
      FROM lineitem
    ),
    base AS (SELECT avg(l_quantity) AS baseline FROM b WHERE disc_bucket = 0)
    SELECT disc_bucket,
           count(*) AS n_lines,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_quantity) / (SELECT baseline FROM base), 6) AS qty_lift
    FROM b GROUP BY disc_bucket
    """,
    tags=("extension", "analytics", "pricing"),
)
def discount_quantity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount→quantity lift curve: average order quantity per 5%%
    discount bucket relative to the undiscounted baseline — the
    price-sensitivity read behind promotion planning. One bucketed
    aggregation; the baseline is a broadcast one-row join (never a
    global window)."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor(F.col("l_discount") * 20).cast("int").alias("disc_bucket"),
        "l_quantity",
    )
    g = b.groupBy("disc_bucket").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.avg("l_quantity").alias("avg_qty_raw"),
    )
    base = g.filter(F.col("disc_bucket") == 0).select(
        F.col("avg_qty_raw").alias("baseline")
    )
    return g.crossJoin(F.broadcast(base)).select(
        "disc_bucket",
        "n_lines",
        F.round("avg_qty_raw", 6).alias("avg_qty"),
        F.round(F.col("avg_qty_raw") / F.col("baseline"), 6).alias("qty_lift"),
    )


@register(
    "events_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    stats AS (SELECT avg(n) AS mu, stddev_pop(n) AS sigma FROM daily)
    SELECT day, n,
           round((n - (SELECT mu FROM stats)) / (SELECT sigma FROM stats), 6)
             AS zscore,
           abs(n - (SELECT mu FROM stats))
             > 2 * (SELECT sigma FROM stats) AS is_anomaly
    FROM daily
    """,
    tags=("extension", "events", "anomaly"),
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags: each day's event count z-scored
    against the series mean/σ (|z| > 2 ⇒ anomaly) — the monitoring
    baseline on the ingest feed. One daily aggregation; the series
    stats come back as a broadcast one-row join (never a global
    window), so the pattern holds on a years-long 100 TB feed."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
        (F.abs(F.col("n") - F.col("mu")) > 2 * F.col("sigma")).alias(
            "is_anomaly"
        ),
    )


@register(
    "nation_trade_balance",
    oracle=f"""
    WITH sell AS (
      SELECT s.s_nationkey AS nationkey,
             {sql_dsum('l.l_extendedprice')} AS supplied_value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey
    ),
    buy AS (
      SELECT c.c_nationkey AS nationkey,
             {sql_dsum('o.o_totalprice')} AS purchased_value
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT n.n_name,
           coalesce(sell.supplied_value, 0) AS supplied_value,
           coalesce(buy.purchased_value, 0) AS purchased_value,
           round(coalesce(sell.supplied_value, 0)
                 - coalesce(buy.purchased_value, 0), 2) AS trade_balance
    FROM nation n
    LEFT JOIN sell ON n.n_nationkey = sell.nationkey
    LEFT JOIN buy ON n.n_nationkey = buy.nationkey
    """,
    tags=("extension", "analytics", "tpch-shape"),
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: value supplied (lineitem→supplier side)
    minus value purchased (orders→customer side) — two independent fact
    aggregations meeting on the dimension key, a shape no single TPC-H
    query exercises. Each fact aggregates map-side to |nations| rows
    before the broadcast joins onto the 25-row nation table."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sell = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(dsum("l_extendedprice").alias("supplied_value"))
    )
    buy = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(dsum("o_totalprice").alias("purchased_value"))
    )
    return (
        nation.join(sell, nation.n_nationkey == sell.nationkey, "left")
        .join(buy, nation.n_nationkey == buy.nationkey, "left")
        .select(
            "n_name",
            F.coalesce("supplied_value", F.lit(0.0)).alias("supplied_value"),
            F.coalesce("purchased_value", F.lit(0.0)).alias("purchased_value"),
            F.round(
                F.coalesce("supplied_value", F.lit(0.0))
                - F.coalesce("purchased_value", F.lit(0.0)),
                2,
            ).alias("trade_balance"),
        )
    )


@register(
    "order_fanout_distribution",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines,
           count(*) AS n_orders,
           round(count(*) * 1.0 / (SELECT count(*) FROM per_order), 6)
             AS order_share
    FROM per_order GROUP BY n_lines
    """,
    tags=("extension", "profiling", "fanout"),
)
def order_fanout_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout profile: the distribution of lines-per-order (how many
    orders have 1, 2, … lineitems) — the statistic that prices every
    orders⋈lineitem join and flags fanout drift in incoming data. A
    two-level aggregation (key → count, count → histogram): the first
    keyed on the join key, the second on the tiny count domain; the
    total comes back as a broadcast one-row join."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    hist = per_order.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))
    total = per_order.agg(F.count(F.lit(1)).alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "n_lines",
        "n_orders",
        F.round(F.col("n_orders") / F.col("total"), 6).alias("order_share"),
    )


@register(
    "price_size_regression_by_brand",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           round(regr_slope(p_retailprice, p_size), 6) AS slope,
           round(regr_intercept(p_retailprice, p_size), 6) AS intercept,
           round(regr_r2(p_retailprice, p_size), 6) AS r2
    FROM part GROUP BY p_brand
    """,
    tags=("extension", "stats", "regression"),
)
def price_size_regression_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED linear regression: price ~ size fitted independently per
    brand (slope/intercept/R²) — the per-segment trend surface behind
    pricing curves and drift monitors. One hash aggregation: regr_*
    aggregates are sum-decomposable, so each group's fit reduces
    map-side like any other partial aggregate (contrast the global
    regressions in zipf_fit/heaps_law_fit)."""
    part = load_table(spark, sf_dir, "part")
    x, y = F.col("p_size").cast("double"), F.col("p_retailprice").cast("double")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@register(
    "segment_share_shift_quarterly",
    oracle=f"""
    WITH q AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('quarter', o.o_orderdate) AS TIMESTAMP) AS quarter,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT quarter, SUM(revenue) AS q_total FROM q GROUP BY quarter),
    shares AS (
      SELECT q.segment, q.quarter,
             q.revenue / t.q_total AS share
      FROM q JOIN tot t ON q.quarter = t.quarter
    )
    SELECT segment, quarter,
           round(share, 6) AS share,
           round(share - lag(share) OVER (PARTITION BY segment ORDER BY quarter),
                 6) AS share_shift
    FROM shares
    """,
    tags=("extension", "analytics", "trend"),
)
def segment_share_shift_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue-share shift per market segment — the
    mix-drift monitor (is BUILDING gaining share?). Segment×quarter
    aggregation, per-quarter totals joined back (the share denominator),
    then a segment-PARTITIONED lag window for the shift — all keys are
    low-cardinality dimensions, so every stage stays tiny no matter the
    fact volume."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    q = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("quarter", "o_orderdate").alias("quarter"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    tot = q.groupBy("quarter").agg(F.sum("revenue").alias("q_total"))
    shares = q.join(F.broadcast(tot), "quarter").select(
        "segment", "quarter", (F.col("revenue") / F.col("q_total")).alias("share")
    )
    w = Window.partitionBy("segment").orderBy("quarter")
    return shares.select(
        "segment",
        "quarter",
        F.round("share", 6).alias("share"),
        F.round(F.col("share") - F.lag("share").over(w), 6).alias("share_shift"),
    )


@register(
    "holt_linear_forecast",
    # Holt's linear-trend exponential smoothing (level+trend recursion)
    # — sequential like PAV/MMR, and like them its bounded recursion has
    # an exact SQL twin: a recursive CTE stepping month-by-month. Both
    # engines run the IDENTICAL IEEE sequence — the same double
    # approximations of alpha=0.8/beta=0.2 combined in the same
    # operation order, l_new computed once and reused in the trend
    # update on both sides — on identical inputs (exact-decimal monthly
    # revenue published as double), so level/trend/fitted agree
    # bit-for-bit before the 2dp rounding (applied engine-side via
    # F.round/round, both HALF-AWAY — Python's banker's round would
    # diverge on dyadic halfway values like x.125).
    oracle="""
    WITH RECURSIVE pts0 AS (
      SELECT o_orderpriority AS g,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1, 2
    ),
    pts AS (
      SELECT g, month, y,
             row_number() OVER (PARTITION BY g ORDER BY month) AS i
      FROM pts0
    ),
    rec(g, i, l, b) AS (
      SELECT p.g, CAST(1 AS BIGINT), p.y,
             (SELECT y FROM pts p2 WHERE p2.g = p.g AND p2.i = 2) - p.y
      FROM pts p WHERE p.i = 1
      UNION ALL
      SELECT r.g, r.i + 1,
             0.8 * p.y + 0.2 * (r.l + r.b),
             0.2 * ((0.8 * p.y + 0.2 * (r.l + r.b)) - r.l) + 0.8 * r.b
      FROM rec r JOIN pts p ON p.g = r.g AND p.i = r.i + 1
    )
    SELECT p.g AS o_orderpriority, p.month, round(p.y, 2) AS revenue,
           round(r.l, 2) AS level, round(r.b, 2) AS trend,
           round(prev.l + prev.b, 2) AS fitted
    FROM pts p
    JOIN rec r ON r.g = p.g AND r.i = p.i
    LEFT JOIN rec prev ON prev.g = p.g AND prev.i = p.i - 1
    """,
    tags=("extension", "forecasting", "grouped-map"),
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of monthly revenue per order priority
    (alpha = 0.8, beta = 0.2): per month, the level/trend state and the
    one-step-ahead fitted value (l+b of the previous month) — the
    capacity-planning forecast primitive. The cluster does the
    corpus-sized reduction (exact-decimal revenue per group-month,
    map-side combined); the recursion runs as grouped-map applyInPandas
    whose batch is bounded by the CALENDAR (months per group), never by
    row count — the PAV/MMR bounded-sequential contract."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(dsum("o_totalprice").alias("y"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month", kind="mergesort")
        y = [float(v) for v in pdf["y"]]
        n = len(y)
        levels = [y[0]]
        trends = [y[1] - y[0] if n >= 2 else None]
        fitted = [None]
        for t in range(1, n):
            l_prev, b_prev = levels[-1], trends[-1]
            fitted.append(l_prev + b_prev)
            l_new = 0.8 * y[t] + 0.2 * (l_prev + b_prev)
            b_new = 0.2 * (l_new - l_prev) + 0.8 * b_prev
            levels.append(l_new)
            trends.append(b_new)
        # no rounding here: Python round() is banker's (half-to-even)
        # while the oracle's round() is half-away — rounding happens
        # engine-side below with F.round (HALF_UP), which matches
        return pd.DataFrame(
            {
                "o_orderpriority": pdf["o_orderpriority"].to_numpy(),
                "month": pdf["month"].to_numpy(),
                "revenue": y,
                "level": levels,
                "trend": trends,
                "fitted": fitted,
            }
        )

    raw = pts.groupBy("o_orderpriority").applyInPandas(
        fit,
        "o_orderpriority string, month date, revenue double, "
        "level double, trend double, fitted double",
    )
    return raw.select(
        "o_orderpriority",
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round("level", 2).alias("level"),
        F.round("trend", 2).alias("trend"),
        F.round("fitted", 2).alias("fitted"),
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT a.d, a.rev AS rev, b.rev AS rev_pred
      FROM daily a JOIN daily b ON a.d = b.d + 7
    )
    SELECT CAST(CAST(d - DATE '1970-01-01' AS BIGINT) % 7 AS INT) AS dow_idx,
           COUNT(*) AS n_days,
           CAST(SUM(rev) AS DOUBLE) AS sum_actual,
           CAST(SUM(ABS(rev - rev_pred)) AS DOUBLE) AS sum_abs_err,
           round(CAST(SUM(ABS(rev - rev_pred)) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS wape
    FROM j GROUP BY 1
    """,
    tags=("extension", "analytics", "forecast"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue with
    the same weekday one week earlier, then score WAPE per weekday.

    The forecast "model" is a self-equi-join of the daily-revenue relation
    on d = d-7 — the standard walk-forward baseline every demand-forecast
    pipeline needs before anything fancier. Error accumulates in exact
    decimals end-to-end (daily sums, |actual-forecast|, weekday totals);
    the only float op is the final WAPE division, rounded at 6dp.

    dow_idx is days-since-epoch mod 7 (0 = Thursday) — an engine-neutral
    weekday key avoiding DATE_FORMAT/DAYOFWEEK locale divergence.

    Scale notes: daily aggregation is one hash agg keyed by date; the
    self-join is date-keyed (a few thousand rows per year of history
    regardless of fact size) — broadcastable; the weekday rollup has 7
    groups. Fact rows are touched exactly once.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    daily = o.groupBy("d").agg(F.sum(dec("o_totalprice")).alias("rev"))
    prev = daily.select(
        F.date_add("d", 7).alias("d"), F.col("rev").alias("rev_pred")
    )
    j = daily.join(prev, "d")
    abs_err = F.abs(F.col("rev") - F.col("rev_pred"))
    epoch = F.lit("1970-01-01").cast("date")
    return (
        j.groupBy((F.datediff("d", epoch) % 7).cast("int").alias("dow_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("rev").cast("double").alias("sum_actual"),
            F.sum(abs_err).cast("double").alias("sum_abs_err"),
            F.round(
                F.sum(abs_err).cast("double") / F.sum("rev").cast("double"), 6
            ).alias("wape"),
        )
    )


@register(
    "funnel_conversion_7d",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (
      SELECT user_id, MIN(ts) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT v.user_id, v.t_view,
             MAX(CASE WHEN e.ts > v.t_view
                       AND e.ts <= v.t_view + INTERVAL 7 DAY
                      THEN 1 ELSE 0 END) AS converted
      FROM v LEFT JOIN e
        ON e.user_id = v.user_id AND e.event_type = 'purchase'
      GROUP BY v.user_id, v.t_view
    )
    SELECT CAST(date_trunc('month', t_view) AS DATE) AS cohort_month,
           COUNT(*) AS n_viewers,
           CAST(SUM(converted) AS BIGINT) AS n_converted_7d,
           round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS cvr_7d
    FROM conv GROUP BY 1
    """,
    tags=("extension", "analytics", "events"),
)
def funnel_conversion_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed funnel: of users whose FIRST view fell in month M, how
    many purchased within 7 days of that first view — the deadline-bound
    conversion metric (distinct from event_funnel_conversion's
    unconstrained ordering: a purchase 3 weeks later counts there, not
    here).

    Plan shape: first-view hash agg keyed by user, one user-keyed left
    join against the purchase slice with the time bound as a join-side
    filter, then a month rollup — all shuffles on user_id, calendar-sized
    output. The integer conversion flag aggregates exactly; the rate is
    one double division rounded at 6dp.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_purchase")
    )
    conv = (
        v.join(p, "user_id", "left")
        .groupBy("user_id", "t_view")
        .agg(
            F.max(
                F.when(
                    (F.col("t_purchase") > F.col("t_view"))
                    & (
                        F.col("t_purchase")
                        <= F.col("t_view") + F.expr("INTERVAL 7 DAYS")
                    ),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return conv.groupBy(
        F.date_trunc("month", "t_view").cast("date").alias("cohort_month")
    ).agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.sum("converted").cast("bigint").alias("n_converted_7d"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("cvr_7d"),
    )


@register(
    "revenue_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS rev_cents
      FROM orders GROUP BY 1
    ),
    cur AS (
      SELECT day, rev_cents,
             SUM(rev_cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
             ROW_NUMBER() OVER (ORDER BY day) AS k,
             SUM(rev_cents) OVER () AS total,
             COUNT(*) OVER () AS nd
      FROM daily
    ),
    cs AS (
      SELECT day, rev_cents,
             CAST(nd * pfx - k * total AS BIGINT) AS cusum_scaled
      FROM cur
    )
    SELECT day,
           CAST(rev_cents AS DOUBLE) / 100 AS revenue,
           cusum_scaled,
           abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER ()
             AS is_changepoint
    FROM cs
    """,
    tags=("extension", "analytics", "anomaly"),
)
def revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily revenue series: the
    cumulative sum of deviations from the series mean, S_k = Σ_{i≤k}
    (x_i − x̄), peaks (in |S|) at the most likely mean-shift point — the
    classic offline change-point locator a revenue monitor runs when a
    drift alarm fires. Every day is emitted with its CUSUM value and the
    argmax day flagged.

    Exactness: the whole statistic stays in integer cents — S_k is
    computed SCALED by n_days (n·prefix_k − k·total, avoiding the mean
    division entirely), so cumulative sums, the peak comparison, and the
    flag are all exact BIGINT arithmetic with no float accumulation
    anywhere; only the reported revenue column touches double (one cast
    of an exact value). Scale shape: the fact table reduces map-side to
    one row per DAY before the ordered windows run, so the unavoidable
    single-partition global-order window sees ~thousands of rows
    regardless of input size (the events_daily_anomalies discipline,
    plus an ordered prefix sum).
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = o.groupBy(
        F.to_date("o_orderdate").cast("timestamp").alias("day")
    ).agg(F.sum(cents).alias("rev_cents"))
    w_ord = Window.orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cs = daily.select(
        "day",
        "rev_cents",
        (
            F.count(F.lit(1)).over(w_all) * F.sum("rev_cents").over(w_run)
            - F.row_number().over(w_ord) * F.sum("rev_cents").over(w_all)
        ).alias("cusum_scaled"),
    )
    return cs.select(
        "day",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        "cusum_scaled",
        (
            F.abs("cusum_scaled")
            == F.max(F.abs("cusum_scaled")).over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("is_changepoint"),
    )


# ONE home for the repeat-purchase episode definition (first order opens
# an episode; second order = event; otherwise right-censored at the
# global max order date; o_orderkey tie-break) — shared by the KM risk
# table and its log-rank significance test so the two can never
# desynchronize. SQL fragment + Spark helper are twins.
_SQL_EPISODES = """ranked AS (
      SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (SELECT o_custkey, o_orderdate AS f FROM ranked WHERE rn = 1),
    seconds AS (SELECT o_custkey, o_orderdate AS s FROM ranked WHERE rn = 2),
    g AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    episodes AS (
      SELECT fi.o_custkey,
             CASE WHEN se.s IS NOT NULL THEN 1 ELSE 0 END AS is_event,
             CASE WHEN se.s IS NOT NULL
                  THEN date_diff('day', fi.f, se.s)
                  ELSE date_diff('day', fi.f, (SELECT maxd FROM g))
             END AS t_days
      FROM firsts fi LEFT JOIN seconds se USING (o_custkey)
    )"""


def _repeat_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, is_event, t_days), one row per customer — the Spark
    twin of _SQL_EPISODES. The <=2-rows-per-customer ranked relation is
    persisted: firsts AND seconds consume it, and unpersisted the
    per-customer window shuffle over the fact table would execute
    twice."""
    o = load_table(spark, sf_dir, "orders")
    ranked = (
        o.select(
            "o_custkey",
            "o_orderdate",
            F.row_number()
            .over(
                Window.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .persist()
    )
    firsts = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("f")
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("s")
    )
    g = o.agg(F.max("o_orderdate").alias("maxd"))
    return (
        firsts.join(seconds, "o_custkey", "left")
        .crossJoin(F.broadcast(g))
        .select(
            "o_custkey",
            F.when(F.col("s").isNotNull(), 1).otherwise(0).alias("is_event"),
            F.when(F.col("s").isNotNull(), F.datediff("s", "f"))
            .otherwise(F.datediff("maxd", "f"))
            .alias("t_days"),
        )
    )


@register(
    "repeat_purchase_survival",
    oracle=f"""
    WITH {_SQL_EPISODES},
    b AS (
      SELECT CAST(t_days // 30 AS INT) AS month_bucket,
             SUM(is_event) AS d, SUM(1 - is_event) AS c
      FROM episodes GROUP BY 1
    ),
    r AS (
      SELECT month_bucket, d, c,
             (SELECT COUNT(*) FROM episodes)
               - COALESCE(SUM(d + c) OVER (ORDER BY month_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM b
    )
    SELECT month_bucket,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           ROUND(CAST(d AS DOUBLE) / at_risk, 6) AS hazard,
           ROUND(PRODUCT(1 - CAST(d AS DOUBLE) / at_risk)
                 OVER (ORDER BY month_bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS km_survival
    FROM r
    """,
    tags=("extension", "analytics", "statistics"),
)
def repeat_purchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival analysis of time-to-repeat-purchase: each
    customer's first order opens an episode that ends at their second
    order (event) or at the end of the observation window (right-censored
    — the single-order customers a naive repeat-rate metric silently
    drops). Emits the classic KM risk table per 30-day bucket: subjects
    at risk, events, censored, interval hazard d/r, and the KM survival
    curve Π(1 − d_j/r_j) — "probability a customer has not yet
    reordered by month k".

    Determinism: counts (d, c, at-risk) are exact integers; hazard is a
    single double division of exact ints; the KM product multiplies the
    ~bucket-count doubles SEQUENTIALLY in bucket order on both engines
    (window product over an ordered running frame — no tree
    re-association), so the 6dp rounding matches. Censoring-in-interval
    keeps the subject at risk for that interval (the standard actuarial
    convention), encoded identically in the 1-PRECEDING window frame.

    Scale shape: one per-customer window (same shuffle key the RFM and
    retention queries use) reduced to ≤2 rows/customer map-side, then a
    ~tens-of-rows bucket table where the ordered windows run — the
    global-order window never sees fact-table cardinality.
    """
    subj = _repeat_episodes(spark, sf_dir)
    b = subj.groupBy(
        F.expr("CAST(t_days DIV 30 AS INT)").alias("month_bucket")
    ).agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    n_subj = subj.agg(F.count(F.lit(1)).alias("n_subjects"))
    w_prev = Window.orderBy("month_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.orderBy("month_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = b.crossJoin(F.broadcast(n_subj)).select(
        "month_bucket",
        "d",
        "c",
        (
            F.col("n_subjects")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("at_risk"),
    )
    return r.select(
        "month_bucket",
        F.col("at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.round(F.col("d").cast("double") / F.col("at_risk"), 6).alias(
            "hazard"
        ),
        F.round(
            F.product(
                1 - F.col("d").cast("double") / F.col("at_risk")
            ).over(w_run),
            6,
        ).alias("km_survival"),
    )


@register(
    "attribution_position_based",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             value,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    touches AS (
      SELECT user_id, journey, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, journey
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, journey) AS m
      FROM e WHERE event_type <> 'purchase'
    ),
    purchases AS (
      SELECT user_id, journey,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS val_cents
      FROM e WHERE event_type = 'purchase'
    ),
    credits AS (
      SELECT t.event_type AS attributed_channel,
             CASE
               WHEN t.m = 1 THEN p.val_cents
               WHEN t.m = 2 AND t.rn = 1 THEN p.val_cents * 50 // 100
               WHEN t.m = 2 THEN p.val_cents - p.val_cents * 50 // 100
               WHEN t.rn = 1 OR t.rn = t.m THEN p.val_cents * 40 // 100
               ELSE (p.val_cents - 2 * (p.val_cents * 40 // 100)) // (t.m - 2)
                    + CASE WHEN t.rn = t.m - 1
                           THEN (p.val_cents - 2 * (p.val_cents * 40 // 100))
                                - (t.m - 2)
                                  * ((p.val_cents
                                      - 2 * (p.val_cents * 40 // 100))
                                     // (t.m - 2))
                           ELSE 0 END
             END AS credit_cents
      FROM touches t JOIN purchases p
        ON t.user_id = p.user_id AND t.journey = p.journey
      UNION ALL
      SELECT 'direct', p.val_cents
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = p.user_id
                          AND t.journey = p.journey)
    )
    SELECT attributed_channel,
           COUNT(*) AS n_credits,
           CAST(SUM(credit_cents) AS DOUBLE) / 100 AS attributed_value
    FROM credits
    GROUP BY attributed_channel
    """,
    tags=("extension", "analytics", "attribution"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase's
    credit is split across ALL touches in its journey — 40% to the first
    touch, 40% to the last, 20% shared by the middles (100% / 50-50 for
    1- and 2-touch journeys; 'direct' for touchless purchases) — the
    standard multi-touch complement to attribution_last_touch's
    winner-takes-all.

    Journeys segment at purchases: an event belongs to journey k when k
    purchases precede it in the user's (ts, event_id) order, so each
    journey carries at most one purchase and purchases never credit
    across each other.

    Exactness: credit is computed in integer CENTS with DIV splits — the
    40% shares truncate, the middle pool divides evenly, and the integer
    remainder is assigned deterministically to the last middle touch, so
    every journey's credits sum to the purchase value EXACTLY (no
    float-share leakage) and both engines agree bit-for-bit. Scale: all
    three windows and both joins share the user-id shuffle key (one
    exchange); the rollup is a 5-row hash aggregate.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    ev = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1)
            ).over(w_prev),
            F.lit(0),
        ).alias("journey"),
    )
    wj = Window.partitionBy("user_id", "journey")
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "journey",
            "event_type",
            F.row_number().over(wj.orderBy("ts", "event_id")).alias("rn"),
            F.count(F.lit(1)).over(wj).alias("m"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "journey",
        (dec("value") * 100).cast("long").alias("val_cents"),
    )
    first_last = F.expr("val_cents * 40 DIV 100")
    pool = F.col("val_cents") - 2 * first_last
    base = F.expr("(val_cents - 2 * (val_cents * 40 DIV 100)) DIV (m - 2)")
    credit = (
        F.when(F.col("m") == 1, F.col("val_cents"))
        .when(
            (F.col("m") == 2) & (F.col("rn") == 1),
            F.expr("val_cents * 50 DIV 100"),
        )
        .when(
            F.col("m") == 2,
            F.col("val_cents") - F.expr("val_cents * 50 DIV 100"),
        )
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("m")), first_last)
        .otherwise(
            base
            + F.when(
                F.col("rn") == F.col("m") - 1,
                pool - (F.col("m") - 2) * base,
            ).otherwise(0)
        )
    )
    credited = touches.join(purchases, ["user_id", "journey"]).select(
        F.col("event_type").alias("attributed_channel"),
        credit.alias("credit_cents"),
    )
    direct = (
        purchases.join(
            touches.select("user_id", "journey"),
            ["user_id", "journey"],
            "left_anti",
        )
        .select(
            F.lit("direct").alias("attributed_channel"),
            F.col("val_cents").alias("credit_cents"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("attributed_channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            (F.sum("credit_cents").cast("double") / 100).alias(
                "attributed_value"
            ),
        )
    )


# Markov attribution: fixed-point iteration count and integer scales,
# shared by the Spark DP and its recursive-CTE oracle twin. 32 steps of
# a substochastic chain bound the truncation error by (max row mass)^32
# — far below the 1e-6 probability grid itself.
_MARKOV_ITERS = 32
_MARKOV_PROB_SCALE = 1_000_000  # transition probs in micro-units
_MARKOV_P_SCALE = 1_000_000_000_000  # state values in pico-units


@register(
    "attribution_markov_removal",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    touches AS (
      SELECT user_id, journey, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, journey
                                ORDER BY ts, event_id) AS rn
      FROM e WHERE event_type <> 'purchase'
    ),
    purch AS (
      SELECT user_id, journey FROM e WHERE event_type = 'purchase'
    ),
    seq AS (
      SELECT t.user_id, t.journey, t.event_type AS src_ch, t.rn,
             LEAD(t.event_type) OVER (PARTITION BY t.user_id, t.journey
                                      ORDER BY t.rn) AS nxt
      FROM touches t
    ),
    trans_raw AS (
      SELECT s.src_ch AS src,
             COALESCE(s.nxt, CASE WHEN p.user_id IS NOT NULL THEN 'CONV'
                                  ELSE 'DROP' END) AS dst
      FROM seq s LEFT JOIN purch p
        ON s.user_id = p.user_id AND s.journey = p.journey
      UNION ALL
      SELECT 'START', src_ch FROM seq WHERE rn = 1
      UNION ALL
      SELECT 'START', 'CONV' FROM purch p
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = p.user_id
                          AND t.journey = p.journey)
    ),
    c AS (SELECT src, dst, COUNT(*) AS n FROM trans_raw GROUP BY 1, 2),
    tot AS (SELECT src, SUM(n) AS tot FROM c GROUP BY 1),
    -- MATERIALIZED: the recursive term references m/scenarios every
    -- iteration; inlined, DuckDB re-runs the whole window pipeline 32x
    -- (measured 84 s -> sub-second with materialization)
    m AS MATERIALIZED (
      SELECT c.src, c.dst,
             CAST((c.n * {_MARKOV_PROB_SCALE}) // t.tot AS BIGINT) AS prob
      FROM c JOIN tot t ON c.src = t.src
      UNION ALL SELECT 'CONV', 'CONV', {_MARKOV_PROB_SCALE}
      UNION ALL SELECT 'DROP', 'DROP', {_MARKOV_PROB_SCALE}
    ),
    channels AS (SELECT DISTINCT event_type AS ch FROM touches),
    scenarios AS MATERIALIZED (
      SELECT 'base' AS scn, CAST(NULL AS VARCHAR) AS removed
      UNION ALL SELECT ch, ch FROM channels
    ),
    states AS (
      -- explicit DISTINCT over UNION ALL: inside WITH RECURSIVE, DuckDB
      -- treats a bare UNION between these branches as UNION ALL and the
      -- duplicated absorbing state doubled every p (caught by the
      -- oracle diff: base_conversion 1.88 > 1)
      SELECT DISTINCT state FROM (
        SELECT src AS state FROM m UNION ALL SELECT dst FROM m
      ) u
    ),
    it(t, scn, state, p) AS (
      SELECT 0, s.scn, st.state,
             CAST(CASE WHEN st.state = 'CONV' THEN {_MARKOV_P_SCALE}
                       ELSE 0 END AS BIGINT)
      FROM scenarios s CROSS JOIN states st
      UNION ALL
      SELECT q.t + 1, q.scn, m.src,
             CAST(SUM(CASE WHEN s.removed IS NOT NULL AND m.dst = s.removed
                           THEN 0 ELSE m.prob * q.p END)
                  // {_MARKOV_PROB_SCALE} AS BIGINT)
      FROM it q
      JOIN m ON m.dst = q.state
      JOIN scenarios s ON s.scn = q.scn
      WHERE q.t < {_MARKOV_ITERS}
      GROUP BY q.t + 1, q.scn, m.src
    ),
    fin AS (SELECT scn, p FROM it
            WHERE t = {_MARKOV_ITERS} AND state = 'START'),
    base AS (SELECT p AS pb FROM fin WHERE scn = 'base'),
    eff AS (
      SELECT scn AS channel, p AS prem,
             CAST(CASE WHEN (SELECT pb FROM base) = 0 THEN 0
                       ELSE (((SELECT pb FROM base) - p)
                             * {_MARKOV_PROB_SCALE})
                            // (SELECT pb FROM base) END AS BIGINT)
               AS eff_scaled
      FROM fin WHERE scn <> 'base'
    )
    SELECT channel,
           ROUND(CAST((SELECT pb FROM base) AS DOUBLE)
                 / {_MARKOV_P_SCALE}, 6) AS base_conversion,
           ROUND(CAST(prem AS DOUBLE) / {_MARKOV_P_SCALE}, 6)
             AS removal_conversion,
           ROUND(CAST(eff_scaled AS DOUBLE) / {_MARKOV_PROB_SCALE}, 6)
             AS removal_effect,
           CASE WHEN (SELECT SUM(eff_scaled) FROM eff) > 0
                THEN ROUND(CAST(eff_scaled AS DOUBLE)
                           / (SELECT SUM(eff_scaled) FROM eff), 6)
           END AS attribution_share
    FROM eff
    """,
    tags=("extension", "analytics", "attribution"),
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution: model user journeys as
    a first-order chain over channels (+ START/CONV/DROP absorbing
    states), then credit each channel by how much the overall conversion
    probability DROPS when walks into that channel are lost — the
    data-driven attribution standard that, unlike positional rules,
    rewards channels by their causal role in the transition structure.

    Exactness across engines: transition probabilities are integers in
    micro-units ((count·1e6) DIV total) and the conversion fixpoint runs
    {_MARKOV_ITERS} synchronous iterations of p ← (Σ_j m_ij·p_j) DIV 1e6
    with p in pico-units — every step is integer arithmetic, so the
    Spark DP and the DuckDB recursive-CTE twin agree bit-for-bit, and
    removal effects are integer-scaled before the (deterministic) double
    division into shares. Products stay under 2^63 by construction
    (prob ≤ 1e6, p ≤ 1e12, ≤7 states).

    Scale shape: journey segmentation + transition extraction is the
    user-key window pass every events operator shares, reduced map-side
    to a ≤(channels+3)² count matrix; ONLY that matrix (≤ ~50 cells — a
    metadata-sized, dimension-bounded collect, the PCA/BPE trainer
    contract) comes to the driver for the 32-step integer DP; results
    re-enter Spark as a createDataFrame for the final rounding
    projection. A 100 TB event log changes nothing but the one
    aggregation pass.
    """
    ev = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1)).over(w_prev),
            F.lit(0),
        ).alias("journey"),
    )
    wj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "journey",
        "event_type",
        F.row_number().over(wj).alias("rn"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey"
    )
    wr = Window.partitionBy("user_id", "journey").orderBy("rn")
    seq = touches.select(
        "user_id",
        "journey",
        F.col("event_type").alias("src_ch"),
        "rn",
        F.lead("event_type").over(wr).alias("nxt"),
    )
    purch_flag = purch.withColumn("purchased", F.lit(True))
    touch_trans = (
        seq.join(purch_flag, ["user_id", "journey"], "left")
        .select(
            F.col("src_ch").alias("src"),
            F.coalesce(
                "nxt",
                F.when(F.col("purchased"), "CONV").otherwise("DROP"),
            ).alias("dst"),
        )
    )
    start_trans = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("src_ch").alias("dst")
    )
    direct_trans = purch.join(
        touches.select("user_id", "journey"), ["user_id", "journey"],
        "left_anti",
    ).select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    counts = (
        touch_trans.unionByName(start_trans)
        .unionByName(direct_trans)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # dimension-bounded collect: (channels+3)^2 cells at most
    rows = counts.collect()
    tot: dict[str, int] = {}
    for r in rows:
        tot[r["src"]] = tot.get(r["src"], 0) + r["n"]
    m = [
        (r["src"], r["dst"], r["n"] * _MARKOV_PROB_SCALE // tot[r["src"]])
        for r in rows
    ]
    m.append(("CONV", "CONV", _MARKOV_PROB_SCALE))
    m.append(("DROP", "DROP", _MARKOV_PROB_SCALE))
    states = sorted({s for s, _, _ in m} | {d for _, d, _ in m})
    channels = sorted(
        {r["src"] for r in rows} - {"START", "CONV", "DROP"}
    )

    def converge(removed: str | None) -> int:
        p = {s: (_MARKOV_P_SCALE if s == "CONV" else 0) for s in states}
        for _ in range(_MARKOV_ITERS):
            p = {
                s: sum(
                    0 if (removed is not None and dst == removed)
                    else prob * p[dst]
                    for src, dst, prob in m
                    if src == s
                )
                // _MARKOV_PROB_SCALE
                for s in states
            }
        return p["START"]

    pb = converge(None)
    eff = []
    for ch in channels:
        prem = converge(ch)
        eff_scaled = (
            0 if pb == 0 else (pb - prem) * _MARKOV_PROB_SCALE // pb
        )
        eff.append((ch, pb, prem, eff_scaled))
    total_eff = sum(x[3] for x in eff)
    out = spark.createDataFrame(
        [(ch, pb_, prem, es, total_eff) for ch, pb_, prem, es in eff],
        "channel string, pb long, prem long, eff_scaled long, total long",
    )
    return out.select(
        "channel",
        F.round(
            F.col("pb").cast("double") / _MARKOV_P_SCALE, 6
        ).alias("base_conversion"),
        F.round(
            F.col("prem").cast("double") / _MARKOV_P_SCALE, 6
        ).alias("removal_conversion"),
        F.round(
            F.col("eff_scaled").cast("double") / _MARKOV_PROB_SCALE, 6
        ).alias("removal_effect"),
        F.when(
            F.col("total") > 0,
            F.round(
                F.col("eff_scaled").cast("double") / F.col("total"), 6
            ),
        ).alias("attribution_share"),
    )


@register(
    "revenue_seasonal_decomposition",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS rev_cents
      FROM orders GROUP BY 1
    ),
    cur AS (
      SELECT d, rev_cents,
             CAST(CAST(d - DATE '1970-01-01' AS BIGINT) % 7 AS INT)
               AS dow_idx,
             SUM(rev_cents) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win7,
             COUNT(*) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      FROM daily
    ),
    det AS (
      SELECT *, CASE WHEN cnt7 = 7
                     THEN 7 * rev_cents - win7 END AS detrended_x7
      FROM cur
    ),
    sdow AS (
      SELECT dow_idx,
             SUM(detrended_x7) AS s_sum,
             COUNT(detrended_x7) AS s_cnt
      FROM det WHERE detrended_x7 IS NOT NULL
      GROUP BY dow_idx
    )
    SELECT CAST(det.d AS TIMESTAMP) AS day,
           det.dow_idx,
           CAST(det.rev_cents AS DOUBLE) / 100 AS revenue,
           CASE WHEN det.cnt7 = 7
                THEN ROUND(CAST(det.win7 AS DOUBLE) / 700, 6) END AS trend,
           ROUND(CAST(s.s_sum AS DOUBLE) / s.s_cnt / 700, 6) AS seasonal,
           CASE WHEN det.detrended_x7 IS NOT NULL
                THEN ROUND((CAST(det.detrended_x7 AS DOUBLE)
                            - CAST(s.s_sum AS DOUBLE) / s.s_cnt) / 700, 6)
           END AS residual
    FROM det LEFT JOIN sdow s ON det.dow_idx = s.dow_idx
    """,
    tags=("extension", "analytics", "seasonality"),
)
def revenue_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series: trend = centered 7-day moving average (NULL at the 3-day
    edges, the textbook convention), seasonal = day-of-week mean of the
    detrended series, residual = observed − trend − seasonal — the
    decomposition a forecasting pipeline runs before model fitting, and
    the anomaly monitor's deseasonalized baseline.

    Exactness scaffolding: revenue stays in integer cents; the detrended
    series is carried SCALED by 7 (7·rev − window-sum — exact BIGINT, no
    division), so the per-dow seasonal aggregation sums exact integers
    and each output value is at most two double divisions away from
    exact ints, written with identical parenthesization in both engines.
    dow is days-since-epoch mod 7 (the seasonal_naive_backtest
    engine-neutral key — no locale/ISO ambiguity).

    Scale shape: fact table reduces map-side to one row per day; the
    ordered moving-average window and the 7-row dow join run on that
    calendar-bounded relation (the revenue_cusum_changepoint exemption
    argument); the seasonal table broadcasts back.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("rev_cents")
    )
    epoch = F.lit("1970-01-01").cast("date")
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    cur = daily.select(
        "d",
        "rev_cents",
        (F.datediff("d", epoch) % 7).cast("int").alias("dow_idx"),
        F.sum("rev_cents").over(w7).alias("win7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    )
    det = cur.withColumn(
        "detrended_x7",
        F.when(
            F.col("cnt7") == 7, 7 * F.col("rev_cents") - F.col("win7")
        ),
    )
    sdow = (
        det.filter(F.col("detrended_x7").isNotNull())
        .groupBy("dow_idx")
        .agg(
            F.sum("detrended_x7").alias("s_sum"),
            F.count("detrended_x7").alias("s_cnt"),
        )
    )
    return det.join(F.broadcast(sdow), "dow_idx", "left").select(
        F.col("d").cast("timestamp").alias("day"),
        "dow_idx",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        F.when(
            F.col("cnt7") == 7,
            F.round(F.col("win7").cast("double") / 700, 6),
        ).alias("trend"),
        F.round(
            F.col("s_sum").cast("double") / F.col("s_cnt") / 700, 6
        ).alias("seasonal"),
        F.when(
            F.col("detrended_x7").isNotNull(),
            F.round(
                (
                    F.col("detrended_x7").cast("double")
                    - F.col("s_sum").cast("double") / F.col("s_cnt")
                )
                / 700,
                6,
            ),
        ).alias("residual"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS val_cents
      FROM orders
    ),
    cohort AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(d)) AS DATE) AS cohort_month
      FROM o GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort_month, COUNT(*) AS cohort_customers
      FROM cohort GROUP BY 1
    ),
    monthly AS (
      SELECT c.cohort_month,
             CAST((year(o.d) - year(c.cohort_month)) * 12
                  + (month(o.d) - month(c.cohort_month)) AS INT)
               AS month_offset,
             SUM(o.val_cents) AS rev_cents,
             COUNT(DISTINCT o.o_custkey) AS n_active
      FROM o JOIN cohort c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(m.cohort_month AS TIMESTAMP) AS cohort_month,
           m.month_offset,
           s.cohort_customers,
           m.n_active,
           CAST(m.rev_cents AS DOUBLE) / 100 AS period_revenue,
           CAST(SUM(m.rev_cents) OVER (PARTITION BY m.cohort_month
                  ORDER BY m.month_offset
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS cumulative_revenue,
           ROUND(CAST(SUM(m.rev_cents) OVER (PARTITION BY m.cohort_month
                   ORDER BY m.month_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / s.cohort_customers / 100, 6)
             AS ltv_per_customer
    FROM monthly m JOIN sized s ON m.cohort_month = s.cohort_month
    """,
    tags=("extension", "analytics", "cohort"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value accumulation triangle: customers grouped
    by first-order month, their revenue rolled up per month offset and
    ACCUMULATED along each cohort row — LTV-per-customer at offset k is
    the curve a growth model fits (the value complement to
    user_retention_cohorts' activity counts).

    Exactness: revenue accumulates as integer cents end-to-end (the
    cumulative window sums exact BIGINTs — association-free), published
    to double once per output column; month offsets are integer
    year/month arithmetic (no interval semantics to disagree on).
    Scale: cohort assignment is the |customers|-sized min-aggregate;
    the cumulative window partitions BY COHORT over ≤ months² triangle
    rows — never fact-sized, never a global window.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        (dec("o_totalprice") * 100).cast("long").alias("val_cents"),
    )
    cohort = o.groupBy("o_custkey").agg(
        F.trunc(F.min("d"), "month").alias("cohort_month")
    )
    sized = cohort.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    monthly = (
        o.join(cohort, "o_custkey")
        .groupBy(
            "cohort_month",
            (
                (F.year("d") - F.year("cohort_month")) * 12
                + (F.month("d") - F.month("cohort_month"))
            )
            .cast("int")
            .alias("month_offset"),
        )
        .agg(
            F.sum("val_cents").alias("rev_cents"),
            F.count_distinct("o_custkey").alias("n_active"),
        )
    )
    w_run = Window.partitionBy("cohort_month").orderBy("month_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        monthly.join(F.broadcast(sized), "cohort_month")
        .select(
            F.col("cohort_month").cast("timestamp").alias("cohort_month"),
            "month_offset",
            "cohort_customers",
            "n_active",
            (F.col("rev_cents").cast("double") / 100).alias("period_revenue"),
            (F.sum("rev_cents").over(w_run).cast("double") / 100).alias(
                "cumulative_revenue"
            ),
            F.round(
                F.sum("rev_cents").over(w_run).cast("double")
                / F.col("cohort_customers")
                / 100,
                6,
            ).alias("ltv_per_customer"),
        )
    )


@register(
    # Named for the estimator it actually implements: SIEGEL repeated
    # median (median of per-day median slopes), not Theil-Sen (median
    # over ALL pairwise slopes). Registered as `theilsen_revenue_trend`
    # through r5; renamed in r6 per ADVICE before the name ossified
    # (never driver-graded under the old name; BASELINE.md maps the one
    # BENCH_r05 row).
    "siegel_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
               AS x,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS c
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.x AS x1, (b.c - a.c) * 1.0 / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON a.x < b.x
    ),
    ranked AS (
      SELECT x1, s,
             row_number() OVER (PARTITION BY x1 ORDER BY s) AS rn,
             COUNT(*) OVER (PARTITION BY x1) AS cnt
      FROM pairs
    ),
    med_i AS (
      SELECT x1, AVG(s) AS m FROM ranked
      WHERE rn IN (CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT),
                   CAST(FLOOR((cnt + 2) / 2.0) AS BIGINT))
      GROUP BY x1
    ),
    mr AS (
      SELECT m,
             row_number() OVER (ORDER BY m) AS rn,
             COUNT(*) OVER () AS cnt
      FROM med_i
    ),
    slope AS (
      SELECT AVG(m) AS sc FROM mr
      WHERE rn IN (CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT),
                   CAST(FLOOR((cnt + 2) / 2.0) AS BIGINT))
    ),
    resid AS (
      SELECT daily.x, daily.c / 100.0 - (slope.sc / 100.0) * daily.x AS r,
             slope.sc AS sc
      FROM daily CROSS JOIN slope
    ),
    rr AS (
      SELECT r, sc,
             row_number() OVER (ORDER BY r) AS rn,
             COUNT(*) OVER () AS cnt
      FROM resid
    )
    SELECT CAST(MAX(cnt) AS BIGINT) AS n_days,
           round(MAX(sc) / 100.0, 6) AS slope_per_day,
           round(AVG(r), 6) AS intercept_19920101
    FROM rr
    WHERE rn IN (CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT),
                 CAST(FLOOR((cnt + 2) / 2.0) AS BIGINT))
    """,
    tags=("extension", "analytics", "robust-regression"),
)
def siegel_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median robust trend of daily revenue: for each
    day i take the median slope to every other day, then the median of
    those per-day medians — the 50%-breakdown robust regression a
    forecasting pipeline fits when the OLS trend
    (price_size_regression_by_brand) would chase promo/outage outliers.
    Intercept = median residual at the chosen slope, anchored at the
    calendar origin 1992-01-01 (data-independent constant).

    Scale shape: the fact table reduces map-side to one row per
    calendar day, so the O(days^2) pair enumeration (a broadcast
    inequality self-join) and the per-day median windows are bounded by
    the CALENDAR (~2.4k days -> ~3M pairs) at any corpus size — the
    revenue_cusum_changepoint exemption argument. The inner medians
    partition by day; only the final medians-of-~2.4k-rows run global.

    Engine parity: revenue stays in integer cents; every slope is one
    BIGINT-difference division (deterministic double), medians select
    by exact rank (avg of the two middle values — no interpolation
    ambiguity), and the only derived floats (residuals) multiply the
    shared slope double by an integer. Both engines therefore agree
    bit-wise before the 6dp output rounding.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = (
        o.groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            )
            .cast("long")
            .alias("x")
        )
        .agg(F.sum(cents).alias("c"))
        .persist()
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.col("a.x").alias("x1"),
        (
            (F.col("b.c") - F.col("a.c"))
            * F.lit(1.0)
            / (F.col("b.x") - F.col("a.x"))
        ).alias("s"),
    )

    def _median_ranks(cnt):
        lo = F.floor((cnt + 1) / F.lit(2.0)).cast("long")
        hi = F.floor((cnt + 2) / F.lit(2.0)).cast("long")
        return lo, hi

    wp = Window.partitionBy("x1").orderBy("s")
    wpc = Window.partitionBy("x1")
    ranked = pairs.select(
        "x1",
        "s",
        F.row_number().over(wp).alias("rn"),
        F.count(F.lit(1)).over(wpc).alias("cnt"),
    )
    lo, hi = _median_ranks(F.col("cnt"))
    med_i = (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("x1")
        .agg(F.avg("s").alias("m"))
    )
    wg = Window.orderBy("m")
    wgc = Window.partitionBy()
    mr = med_i.select(
        "m",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wgc).alias("cnt"),
    )
    lo, hi = _median_ranks(F.col("cnt"))
    slope = mr.filter((F.col("rn") == lo) | (F.col("rn") == hi)).agg(
        F.avg("m").alias("sc")
    )
    resid = daily.crossJoin(F.broadcast(slope)).select(
        (
            F.col("c") / F.lit(100.0)
            - (F.col("sc") / F.lit(100.0)) * F.col("x")
        ).alias("r"),
        "sc",
    )
    wr = Window.orderBy("r")
    rr = resid.select(
        "r",
        "sc",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wgc).alias("cnt"),
    )
    lo, hi = _median_ranks(F.col("cnt"))
    return rr.filter((F.col("rn") == lo) | (F.col("rn") == hi)).agg(
        F.max("cnt").cast("long").alias("n_days"),
        F.round(F.max("sc") / 100.0, 6).alias("slope_per_day"),
        F.round(F.avg("r"), 6).alias("intercept_19920101"),
    )


_IVM_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "incremental_join_view_merge",
    # Oracle = the FULL recompute of the join view; the Spark side must
    # reconstruct it from the IVM algebra, so a driver match proves
    # state + ΔL⋈O + L⋈ΔO + ΔL⋈ΔO == recompute.
    oracle=f"""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS o_month,
           o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_IVM_REV.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    tags=("extension", "incremental", "join"),
)
def incremental_join_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (classical IVM algebra):
    the view V = lineitem ⋈ orders aggregated to (order month, priority)
    revenue. With both base tables split into (old, delta) at the fixed
    cutoff 1997-01-01 — lineitem by l_shipdate, orders by o_orderdate,
    deliberately DIFFERENT clocks so every cross term is non-empty —
    the engine rebuilds V as

        V = L₀⋈O₀ (state) + ΔL⋈O₀ + L₀⋈ΔO + ΔL⋈ΔO

    with each term partially aggregated to the view key before a final
    merge-by-sum, and the oracle (the monolithic recompute) proves the
    algebra exact. incremental_rollup_merge is the single-table version
    of this contract; this is what a foreachBatch maintainer of an
    ENRICHED warehouse table must compute per micro-batch — at 100 TB
    the three delta terms touch only delta-sized join inputs (the state
    term is a materialized table read, simulated here by recomputing
    it), so maintenance cost scales with the batch, not the history.

    Exactness: revenue partials accumulate in DECIMAL(18,2)-derived
    exact decimals and the merge sums partials — associative by
    construction, so the final double equals the recompute bit-wise.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dec("l_discount")
    )

    l_old = li.filter(F.col("l_shipdate") < cutoff)
    l_new = li.filter(F.col("l_shipdate") >= cutoff)
    o_old = o.filter(F.col("o_orderdate") < cutoff)
    o_new = o.filter(F.col("o_orderdate") >= cutoff)

    def term(lpart: DataFrame, opart: DataFrame) -> DataFrame:
        return (
            lpart.join(
                opart,
                lpart["l_orderkey"] == opart["o_orderkey"],
            )
            .groupBy(
                F.date_trunc("month", "o_orderdate").alias("o_month"),
                "o_orderpriority",
            )
            .agg(
                F.count(F.lit(1)).alias("n_partial"),
                F.sum(rev).alias("rev_partial"),
            )
        )

    terms = (
        term(l_old, o_old)  # state (materialized in production)
        .unionByName(term(l_new, o_old))  # ΔL ⋈ O₀
        .unionByName(term(l_old, o_new))  # L₀ ⋈ ΔO
        .unionByName(term(l_new, o_new))  # ΔL ⋈ ΔO
    )
    return terms.groupBy("o_month", "o_orderpriority").agg(
        F.sum("n_partial").cast("long").alias("n_lines"),
        F.sum("rev_partial").cast("double").alias("revenue"),
    )


_XCORR_SEG_X = "BUILDING"
_XCORR_SEG_Y = "MACHINERY"
_XCORR_MAX_LAG = 7


@register(
    "revenue_xcorr_lags",
    oracle=f"""
    WITH daily AS (
      SELECT c_mktsegment AS segment, CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('{_XCORR_SEG_X}', '{_XCORR_SEG_Y}')
      GROUP BY 1, 2
    ),
    x AS (SELECT day, cents FROM daily WHERE segment = '{_XCORR_SEG_X}'),
    y AS (SELECT day, cents FROM daily WHERE segment = '{_XCORR_SEG_Y}'),
    lags AS (SELECT CAST(unnest(generate_series(-{_XCORR_MAX_LAG},
                                                {_XCORR_MAX_LAG})) AS INT)
               AS lag)
    SELECT l.lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(corr(CAST(x.cents AS DOUBLE), CAST(y.cents AS DOUBLE)), 6)
             AS xcorr
    FROM x CROSS JOIN lags l
    JOIN y ON y.day = x.day + l.lag
    GROUP BY l.lag
    """,
    tags=("extension", "analytics", "timeseries"),
)
def revenue_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two segments' daily revenue
    series (lags -7..+7): does BUILDING demand lead or trail MACHINERY
    demand, and by how many days — the lead-lag diagnostic behind
    demand-transfer and promotion-spillover analyses. corr(x_t, y_{t+l})
    per lag over the days where both series exist at that offset.

    Exactness: each day's revenue is an exact BIGINT cents sum (the
    revenue_cusum_changepoint discipline), so both engines correlate
    IDENTICAL values — the only float work is the corr moments, rounded
    to 6dp (precedent: stats_correlation, stable under repartitioning).
    Scale shape: the fact table reduces map-side to one row per
    (segment, day) first; the lag fan-out is a broadcast of the 15-row
    lag relation onto the calendar-bounded series, and the shifted join
    keys on (day + lag) — everything after the first aggregate is
    calendar-sized however large the input.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = (
        o.join(
            F.broadcast(
                c.select("c_custkey", "c_mktsegment").filter(
                    F.col("c_mktsegment").isin(_XCORR_SEG_X, _XCORR_SEG_Y)
                )
            ),
            o["o_custkey"] == c["c_custkey"],
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    x = daily.filter(F.col("segment") == _XCORR_SEG_X).select(
        F.col("day").alias("x_day"), F.col("cents").alias("x_cents")
    )
    y = daily.filter(F.col("segment") == _XCORR_SEG_Y).select(
        F.col("day").alias("y_day"), F.col("cents").alias("y_cents")
    )
    lags = spark.range(1).select(
        F.explode(
            F.lit(list(range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)))
        ).alias("lag")
    )
    pairs = x.crossJoin(F.broadcast(lags)).join(
        y, F.col("y_day") == F.date_add("x_day", F.col("lag").cast("int"))
    )
    return pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.corr(
                F.col("x_cents").cast("double"), F.col("y_cents").cast("double")
            ),
            6,
        ).alias("xcorr"),
    )


_LR_SEG_A = "BUILDING"
_LR_SEG_B = "MACHINERY"
# chi-square 1df critical value at alpha=0.05, a shared literal in both
# engines (the DCG-gain-table discipline: no quantile function in graded
# arithmetic)
_LR_CHI2_CRIT = 3.8414588206941


@register(
    "logrank_survival_test",
    oracle=f"""
    WITH {_SQL_EPISODES},
    subj AS (
      SELECT c.c_mktsegment AS grp, e.is_event,
             CAST(e.t_days // 30 AS INT) AS b
      FROM episodes e
      JOIN customer c ON e.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{_LR_SEG_A}', '{_LR_SEG_B}')
    ),
    per AS (
      SELECT grp, b, SUM(is_event) AS d, SUM(1 - is_event) AS c
      FROM subj GROUP BY grp, b
    ),
    grid AS (
      SELECT buckets.b, groups.grp,
             coalesce(per.d, 0) AS d, coalesce(per.c, 0) AS c
      FROM (SELECT DISTINCT b FROM per) buckets
      CROSS JOIN (SELECT DISTINCT grp FROM per) groups
      LEFT JOIN per ON per.b = buckets.b AND per.grp = groups.grp
    ),
    tot AS (SELECT grp, SUM(d + c) AS n FROM grid GROUP BY grp),
    risk AS (
      SELECT grid.b, grid.grp, grid.d,
             tot.n - coalesce(SUM(grid.d + grid.c) OVER (
               PARTITION BY grid.grp ORDER BY grid.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
      FROM grid JOIN tot ON grid.grp = tot.grp
    ),
    wide AS (
      SELECT b,
             SUM(CASE WHEN grp = '{_LR_SEG_A}' THEN d ELSE 0 END) AS d1,
             SUM(CASE WHEN grp = '{_LR_SEG_A}' THEN r ELSE 0 END) AS n1,
             SUM(CASE WHEN grp = '{_LR_SEG_B}' THEN d ELSE 0 END) AS d2,
             SUM(CASE WHEN grp = '{_LR_SEG_B}' THEN r ELSE 0 END) AS n2
      FROM risk GROUP BY b
    ),
    terms AS (
      SELECT b, d1,
             (d1 + d2) * CAST(n1 AS DOUBLE) / (n1 + n2) AS e1,
             CASE WHEN n1 + n2 > 1
                  THEN (d1 + d2) * (CAST(n1 AS DOUBLE) / (n1 + n2))
                       * (CAST(n2 AS DOUBLE) / (n1 + n2))
                       * (n1 + n2 - d1 - d2) / (n1 + n2 - 1)
                  ELSE 0.0 END AS v1
      FROM wide WHERE d1 + d2 > 0
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_event_buckets,
             list_aggregate(list(d1 - e1 ORDER BY b), 'sum') AS ome,
             list_aggregate(list(v1 ORDER BY b), 'sum') AS var1
      FROM terms
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot
            WHERE grp = '{_LR_SEG_A}') AS n_group_a,
           (SELECT CAST(n AS BIGINT) FROM tot
            WHERE grp = '{_LR_SEG_B}') AS n_group_b,
           n_event_buckets,
           ROUND(ome, 6) AS o_minus_e,
           ROUND(var1, 6) AS var_logrank,
           ROUND(ome * ome / var1, 6) AS chi2,
           ome * ome / var1 > {_LR_CHI2_CRIT} AS significant_5pct
    FROM folded
    """,
    tags=("extension", "stats", "survival", "hypothesis-test"),
)
def logrank_survival_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing two segments'
    time-to-repeat-purchase survival curves — the inference companion
    to repeat_purchase_survival's descriptive KM table: per 30-day
    bucket with events, observed group-A events minus the expected
    count under the null (hypergeometric mean d*n1/n), variance
    d*(n1/n)*(n2/n)*(n-d)/(n-1), chi2 = (sum O-E)^2 / sum Var with one
    degree of freedom; significance compares the UNROUNDED statistic to
    the 1df critical value inlined as a shared literal.

    Exactness: at-risk counts, events, and the bucket grid (dense outer
    product of observed buckets x both groups, so a bucket where only
    one group has activity still contributes the other's at-risk mass)
    are all integers; the two float folds run in BUCKET order on both
    engines (sort_array / list ORDER BY — sequential, no tree
    re-association). Scale shape: the per-customer episode extraction
    is the KM query's partitioned window; everything after is
    bucket-count-sized.
    """
    customer = load_table(spark, sf_dir, "customer")
    subj = (
        _repeat_episodes(spark, sf_dir)
        .join(
            F.broadcast(
                customer.select("c_custkey", "c_mktsegment").filter(
                    F.col("c_mktsegment").isin(_LR_SEG_A, _LR_SEG_B)
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("grp"),
            "is_event",
            F.expr("CAST(t_days DIV 30 AS INT)").alias("b"),
        )
    )
    per = subj.groupBy("grp", "b").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    ).persist()  # feeds the bucket grid, the group spine, and totals
    buckets = per.select("b").distinct()
    groups = per.select("grp").distinct()
    grid = (
        buckets.crossJoin(F.broadcast(groups))
        .join(per, ["b", "grp"], "left")
        .select(
            "b",
            "grp",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    tot = grid.groupBy("grp").agg(F.sum(F.col("d") + F.col("c")).alias("n"))
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = grid.join(F.broadcast(tot), "grp").select(
        "b",
        "grp",
        "d",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("r"),
    )
    wide = risk.groupBy("b").agg(
        F.sum(F.when(F.col("grp") == _LR_SEG_A, F.col("d")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("grp") == _LR_SEG_A, F.col("r")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("grp") == _LR_SEG_B, F.col("d")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("grp") == _LR_SEG_B, F.col("r")).otherwise(0)).alias("n2"),
    ).filter(F.col("d1") + F.col("d2") > 0)
    n_all = F.col("n1") + F.col("n2")
    d_all = F.col("d1") + F.col("d2")
    e1 = d_all * F.col("n1").cast("double") / n_all
    v1 = F.when(
        n_all > 1,
        d_all
        * (F.col("n1").cast("double") / n_all)
        * (F.col("n2").cast("double") / n_all)
        * (n_all - d_all)
        / (n_all - 1),
    ).otherwise(F.lit(0.0))
    terms = wide.select("b", (F.col("d1") - e1).alias("ome_t"), v1.alias("v1"))

    from ecommerce_data_pipeline_spark.plans._helpers import ordered_fold

    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_buckets"),
        ordered_fold("b", F.col("ome_t")).alias("ome"),
        ordered_fold("b", F.col("v1")).alias("var1"),
    )
    tot_a = tot.filter(F.col("grp") == _LR_SEG_A).select(
        F.col("n").cast("long").alias("n_group_a")
    )
    tot_b = tot.filter(F.col("grp") == _LR_SEG_B).select(
        F.col("n").cast("long").alias("n_group_b")
    )
    chi2 = F.col("ome") * F.col("ome") / F.col("var1")
    return (
        F.broadcast(tot_a)
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(folded))
        .select(
            "n_group_a",
            "n_group_b",
            "n_event_buckets",
            F.round("ome", 6).alias("o_minus_e"),
            F.round("var1", 6).alias("var_logrank"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > _LR_CHI2_CRIT).alias("significant_5pct"),
        )
    )


_ACF_MAX_LAG = 14


@register(
    "acf_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, cents FROM daily
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM idx),
    ssd AS (
      SELECT SUM((CAST(idx.cents AS HUGEINT) * tot.n - tot.s)
                 * (CAST(idx.cents AS HUGEINT) * tot.n - tot.s)) AS ssd
      FROM idx CROSS JOIN tot
    ),
    lags AS (SELECT CAST(unnest(generate_series(1, {_ACF_MAX_LAG})) AS INT)
               AS lag),
    num AS (
      SELECT l.lag,
             COUNT(*) AS n_pairs,
             SUM((CAST(a.cents AS HUGEINT) * tot.n - tot.s)
                 * (CAST(b.cents AS HUGEINT) * tot.n - tot.s)) AS num
      FROM idx a
      CROSS JOIN lags l
      JOIN idx b ON b.t = a.t + l.lag
      CROSS JOIN tot
      GROUP BY l.lag
    ),
    acf AS (
      SELECT num.lag, num.n_pairs,
             CAST(num.num AS DOUBLE) / CAST(ssd.ssd AS DOUBLE) AS r
      FROM num CROSS JOIN ssd
    )
    SELECT acf.lag,
           CAST(acf.n_pairs AS BIGINT) AS n_pairs,
           ROUND(acf.r, 6) AS acf,
           ROUND(tot.n * (tot.n + 2.0)
                 * SUM(acf.r * acf.r / (tot.n - acf.lag))
                   OVER (ORDER BY acf.lag
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS ljung_box_q
    FROM acf CROSS JOIN tot
    """,
    tags=("extension", "analytics", "timeseries", "hypothesis-test"),
)
def acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..14 with the
    cumulative Ljung-Box Q statistic — the whiteness diagnostic run on
    forecast residuals and the standard first look before fitting any
    time-series model (complements revenue_xcorr_lags' CROSS-series
    view with the series' own memory).

    Exactness: centered products are computed on n-SCALED integers
    ((n*x_t - S)(n*x_{{t+k}} - S) — the n^2 factor cancels in the
    num/SSD ratio), so numerator and denominator are exact
    HUGEINT/DECIMAL(38,0) aggregates and each r_k is ONE double
    division; Q accumulates the 14 r^2/(n-k) terms through an ordered
    14-row window. Scale shape: the fact table reduces to the calendar-
    bounded daily table first; the lag fan-out is a broadcast 14-row
    relation joined on day index (the revenue_xcorr_lags pattern).
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "cents"
    ).persist()  # feeds tot, ssd, and both sides of the lag join
    tot = idx.agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    d38 = "decimal(38,0)"
    dev = lambda c: F.col(c).cast(d38) * F.col("n") - F.col("s")  # noqa: E731
    ssd = (
        idx.crossJoin(F.broadcast(tot))
        .select((dev("cents") * dev("cents")).alias("sq"))
        .agg(F.sum("sq").alias("ssd"))
    )
    lags = spark.range(1).select(
        F.explode(F.lit(list(range(1, _ACF_MAX_LAG + 1)))).alias("lag")
    )
    a = idx.select(F.col("t").alias("ta"), F.col("cents").alias("ca"))
    b = idx.select(F.col("t").alias("tb"), F.col("cents").alias("cb"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .crossJoin(F.broadcast(tot))
        .select(
            "lag",
            (
                (F.col("ca").cast(d38) * F.col("n") - F.col("s"))
                * (F.col("cb").cast(d38) * F.col("n") - F.col("s"))
            ).alias("prod"),
        )
        .groupBy("lag")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("prod").alias("num"))
    )
    acf = num.crossJoin(F.broadcast(ssd)).select(
        "lag",
        "n_pairs",
        (F.col("num").cast("double") / F.col("ssd").cast("double")).alias("r"),
    )
    w_run = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return acf.crossJoin(F.broadcast(tot)).select(
        "lag",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("r", 6).alias("acf"),
        F.round(
            F.col("n")
            * (F.col("n") + 2.0)
            * F.sum(
                F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))
            ).over(w_run),
            6,
        ).alias("ljung_box_q"),
    )


_CROSTON_MIN_DATES = 3  # need >=2 intervals to smooth


@register(
    "croston_intermittent_demand",
    oracle=f"""
    WITH d AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS dem
      FROM lineitem GROUP BY 1, 2
    ),
    arr AS (
      SELECT l_partkey,
             COUNT(*) AS n_dates,
             list(dem ORDER BY day) AS sizes,
             list(day ORDER BY day) AS days
      FROM d GROUP BY l_partkey
      HAVING COUNT(*) >= {_CROSTON_MIN_DATES}
    ),
    iv AS (
      SELECT l_partkey, n_dates, sizes,
             [CAST(date_diff('day', days[CAST(i AS INT) - 1],
                             days[CAST(i AS INT)]) AS DOUBLE)
              for i in generate_series(2, len(days))] AS gaps
      FROM arr
    ),
    sm AS (
      SELECT l_partkey, n_dates,
             list_reduce(sizes, (acc, x) -> acc * 0.75 + x * 0.25) AS z,
             list_reduce(gaps, (acc, x) -> acc * 0.75 + x * 0.25) AS p
      FROM iv
    )
    SELECT l_partkey,
           CAST(n_dates AS BIGINT) AS n_demand_dates,
           ROUND(z, 6) AS smoothed_size,
           ROUND(p, 6) AS smoothed_interval_days,
           ROUND(z / p, 6) AS croston_daily_rate
    FROM sm
    """,
    tags=("extension", "analytics", "forecast", "timeseries"),
)
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (Croston 1972) for INTERMITTENT demand — the
    retail-standard forecast for slow movers, where ordinary smoothing
    (holt_linear_forecast) collapses toward zero between sparse demand
    events: smooth demand SIZES and inter-demand INTERVALS separately
    (only over the dates demand actually occurred), forecast rate =
    size / interval. Per part with at least _CROSTON_MIN_DATES (3)
    demand dates.

    Exactness: the ewma_user_value discipline — per-part arrays sorted
    by day, folds seeded with the first element, DYADIC smoothing
    weights (0.75/0.25 are exact doubles, per the architecture's
    lambda=0.5 rule) applied by identically-ordered list_reduce/
    F.aggregate on both engines; demand sizes and day gaps enter the
    folds as exact integers cast once to double. Scale shape: one hash
    aggregate to (part, day), one to per-part arrays (bounded by each
    part's demand-date count), zero windows and zero joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("double").alias("dem"))
    arr = (
        d.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_dates"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "dem"))),
                lambda s: s["dem"],
            ).alias("sizes"),
            F.array_sort(F.collect_list("day")).alias("days"),
        )
        .filter(F.col("n_dates") >= _CROSTON_MIN_DATES)
    )
    gaps = F.transform(
        F.sequence(F.lit(2), F.size("days")),
        lambda i: F.datediff(
            F.element_at("days", i), F.element_at("days", i - 1)
        ).cast("double"),
    )
    smooth = lambda col: F.aggregate(  # noqa: E731
        F.slice(col, F.lit(2), F.size(col) - 1),
        F.element_at(col, 1),
        lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25),
    )
    sm = arr.select(
        "l_partkey",
        "n_dates",
        smooth(F.col("sizes")).alias("z"),
        smooth(gaps).alias("p"),
    )
    return sm.select(
        "l_partkey",
        F.col("n_dates").cast("long").alias("n_demand_dates"),
        F.round("z", 6).alias("smoothed_size"),
        F.round("p", 6).alias("smoothed_interval_days"),
        F.round(F.col("z") / F.col("p"), 6).alias("croston_daily_rate"),
    )


# ---------------------------------------------------------------------------
# Generalized ESD (Rosner) outlier test over daily revenue (r9) — the
# formal iterative outlier TEST next to the MAD gate / CUSUM locator:
# up to k suspected outliers are trimmed one at a time (most extreme
# |x − mean| of the REMAINING series), and the number of genuine
# outliers is the largest i whose test statistic R_i exceeds the
# critical value lambda_i.

_ESD_K = 5
# Rosner critical values for alpha = 0.05, computed OFFLINE in pure
# Python (statistics.NormalDist inverse CDF + first-order Cornish-
# Fisher t correction) for the REFERENCE calendar n = 2399 — the
# sf0.01+ orders day grid (1995..2001); see GRADING_BACKLOG r9 and the
# huber/attribution_markov baked-constant precedent. lambda's
# n-sensitivity is tiny at this scale (n=1094 -> 4.08, n=2399 -> 4.25;
# <0.1% within +-500 days of the reference), and baking keeps the
# cross-engine arithmetic free of inverse-CDF evaluations, which have
# no exactness guarantee across libms. Recalibration = constant swap.
_ESD_LAMBDA = (4.248075, 4.247979, 4.247883, 4.247787, 4.247691)


def _esd_r_sql(x: str, n: str, s: str, ss: str) -> str:
    """Test statistic R = |x − mean| / sd from exact BIGINT moments —
    ONE textual home per engine side; /,*,−,abs,sqrt are all exactly
    rounded IEEE ops, so identical operation order => identical bits
    (the huber normal-equation discipline; sqrt is in the safe set,
    unlike exp/log/pow)."""
    mean = f"(CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE))"
    return (
        f"abs(CAST({x} AS DOUBLE) - {mean}) / "
        f"sqrt((CAST({ss} AS DOUBLE) - {mean} * CAST({s} AS DOUBLE))"
        f" / (CAST({n} AS DOUBLE) - 1.0))"
    )


def _esd_oracle() -> str:
    ctes = [
        """daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    )""",
        "a0 AS (SELECT day, rev_cents, rev_cents // 1000 AS rev_q"
        " FROM daily)",
    ]
    selects = []
    for i in range(1, _ESD_K + 1):
        lam = _ESD_LAMBDA[i - 1]
        r = _esd_r_sql("rev_q", "n", "s", "ss")
        ctes.append(
            f"""s{i} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev_q) AS BIGINT) AS s,
             CAST(SUM(rev_q * rev_q) AS BIGINT) AS ss
      FROM a{i - 1}
    )"""
        )
        ctes.append(
            f"""c{i} AS (
      SELECT day, rev_cents, rev_q, n, s, ss
      FROM a{i - 1} CROSS JOIN s{i}
      ORDER BY abs(rev_q * n - s) DESC, day LIMIT 1
    )"""
        )
        ctes.append(
            f"""a{i} AS (
      SELECT a{i - 1}.day, a{i - 1}.rev_cents, a{i - 1}.rev_q
      FROM a{i - 1}
      WHERE a{i - 1}.day NOT IN (SELECT day FROM c{i})
    )"""
        )
        selects.append(
            f"""SELECT CAST({i} AS INT) AS round_i, day,
             CAST(rev_cents AS DOUBLE) / 100 AS revenue,
             round({r}, 6) AS r_stat,
             CAST({lam!r} AS DOUBLE) AS lambda_crit,
             round({r}, 6) > {lam!r} AS exceeds
      FROM c{i}"""
        )
    ctes.append(
        "res AS (" + "\n      UNION ALL\n      ".join(selects) + ")"
    )
    ctes.append(
        """mx AS (
      SELECT CAST(MAX(CASE WHEN exceeds THEN round_i ELSE 0 END) AS INT)
               AS n_outliers
      FROM res
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes) + """
    SELECT round_i, day, revenue, r_stat, lambda_crit, exceeds,
           n_outliers, round_i <= n_outliers AS is_esd_outlier
    FROM res CROSS JOIN mx
    """
    )


@register(
    "generalized_esd_outlier_test",
    oracle=_esd_oracle(),
    tags=("extension", "analytics", "anomaly", "robust-statistics"),
)
def generalized_esd_outlier_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rosner's generalized ESD test on the daily revenue series: k = 5
    trim rounds, each removing the most extreme remaining day (argmax
    |x·n − S| — an EXACT integer ordering equal to |x − mean|'s, so the
    removal sequence can never diverge between engines; ties break on
    day), with test statistic R_i from exact BIGINT moments and baked
    critical values (see _ESD_LAMBDA). The declared outlier count is
    the LARGEST i with R_i > lambda_i — the property that makes ESD
    robust to masking, where a plain z-score gate stops at the first
    swamped round.

    Exactness: daily revenue accumulates as DECIMAL->BIGINT cents; the
    TEST series is the $10-quantized rev_cents div 1000 (integer div on
    both engines — the statistic is scale-invariant and quantization
    keeps SS = Sum(x^2) BIGINT-safe: ~2.4e13 at sf0.01, safe through
    ~sf30; beyond, recentre by a fixed constant — the huber bound
    discipline); R_i is one shared-text double expression over
    exactly-rounded IEEE ops (_esd_r_sql), rounded 6dp BEFORE the
    lambda comparison on both engines (the decile-bin gotcha).

    Scale shape: ONE fact aggregate builds the calendar-bounded daily
    relation (~2.4k rows), localCheckpointed so the k trim rounds -
    each a 1-row moments aggregate, a broadcast-1-row cross, a
    TakeOrdered(1) candidate pick, and an anti-join - replay over the
    materialized 2.4k rows with flat lineage (the SemDeDup CC
    precedent), never rescanning the fact. Every per-round relation is
    <= 2.4k rows; no windows, no fact-side shuffle beyond the first
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = (
        orders.groupBy(
            F.to_date("o_orderdate").cast("timestamp").alias("day")
        )
        .agg(F.sum(cents).alias("rev_cents"))
        .withColumn("rev_q", F.expr("rev_cents div 1000"))
        .localCheckpoint()
    )

    def r_col() -> F.Column:
        # mirror _esd_r_sql exactly: same op order on the same bits
        mean = F.col("s").cast("double") / F.col("n").cast("double")
        return F.abs(F.col("rev_q").cast("double") - mean) / F.sqrt(
            (F.col("ss").cast("double") - mean * F.col("s").cast("double"))
            / (F.col("n").cast("double") - F.lit(1.0))
        )

    active = daily
    per_round = []
    for i in range(1, _ESD_K + 1):
        lam = _ESD_LAMBDA[i - 1]
        stats = active.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rev_q").cast("long").alias("s"),
            F.sum(F.col("rev_q") * F.col("rev_q"))
            .cast("long")
            .alias("ss"),
        )
        cand = (
            active.crossJoin(F.broadcast(stats))
            .orderBy(
                F.abs(F.col("rev_q") * F.col("n") - F.col("s")).desc(),
                "day",
            )
            .limit(1)
        )
        per_round.append(
            cand.select(
                F.lit(i).cast("int").alias("round_i"),
                "day",
                (F.col("rev_cents").cast("double") / 100).alias("revenue"),
                F.round(r_col(), 6).alias("r_stat"),
                F.lit(lam).alias("lambda_crit"),
                (F.round(r_col(), 6) > F.lit(lam)).alias("exceeds"),
            )
        )
        if i < _ESD_K:
            active = active.join(
                F.broadcast(cand.select("day")), "day", "left_anti"
            ).localCheckpoint()
    res = per_round[0]
    for df in per_round[1:]:
        res = res.unionByName(df)
    mx = res.agg(
        F.max(
            F.when(F.col("exceeds"), F.col("round_i")).otherwise(0)
        )
        .cast("int")
        .alias("n_outliers")
    )
    return res.crossJoin(F.broadcast(mx)).select(
        "round_i",
        "day",
        "revenue",
        "r_stat",
        "lambda_crit",
        "exceeds",
        "n_outliers",
        (F.col("round_i") <= F.col("n_outliers")).alias("is_esd_outlier"),
    )


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend) per segment (r9) —
# the recursive-forecast member of the time-series tier next to
# seasonal_naive_backtest (non-recursive) and croston (demand): the fold
# state is (level, trend), updated per day with fixed DYADIC smoothing
# constants, so every arithmetic step is an exactly-rounded IEEE op and
# the whole 1.7k-step recursion is bit-identical cross-engine.

_HOLT_ALPHA = 0.25  # level smoothing — dyadic: *0.25 / *0.75 are single
_HOLT_BETA = 0.125  # trend smoothing — IEEE multiplies, no decimal dust


def _holt_sql() -> str:
    # NOT list_reduce: DuckDB 1.0's list_reduce evaluates struct_pack
    # fields with the accumulator REBOUND IN PLACE (a later field reads
    # the newly-written value of an earlier one — probed empirically:
    # sae := acc.tr returns the NEW tr), so a multi-field recursion
    # silently diverges. A recursive CTE over the day index has
    # standard semantics and mirrors the Spark fold 1:1.
    prev = "CASE WHEN h.i = 1 THEN x.v - h.lvl ELSE h.tr END"
    lvl = (
        f"CAST({_HOLT_ALPHA!r} AS DOUBLE) * x.v + "
        f"CAST({1 - _HOLT_ALPHA!r} AS DOUBLE) * (h.lvl + {prev})"
    )
    return f"""
    WITH RECURSIVE daily AS (
      SELECT c_mktsegment AS segment, CAST(o_orderdate AS DATE) AS day,
             CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS DOUBLE) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT segment, v,
             ROW_NUMBER() OVER (PARTITION BY segment ORDER BY day) AS i,
             CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT)
               AS n_days
      FROM daily
    ),
    holt AS (
      SELECT segment, i, n_days, v AS lvl,
             CAST(0.0 AS DOUBLE) AS tr, CAST(0.0 AS DOUBLE) AS sae
      FROM idx WHERE i = 1
      UNION ALL
      SELECT x.segment, x.i, x.n_days,
             {lvl} AS lvl,
             CAST({_HOLT_BETA!r} AS DOUBLE) * (({lvl}) - h.lvl)
               + CAST({1 - _HOLT_BETA!r} AS DOUBLE) * ({prev}) AS tr,
             h.sae + abs(x.v - (h.lvl + {prev})) AS sae
      FROM holt h JOIN idx x
        ON x.segment = h.segment AND x.i = h.i + 1
    )
    SELECT segment, n_days,
           round(lvl / 100, 4) AS level_end,
           round(tr / 100, 4) AS trend_end,
           round((lvl + CAST(7 AS DOUBLE) * tr) / 100, 4) AS forecast_7d,
           CASE WHEN n_days > 1
                THEN round(sae / (CAST(n_days AS DOUBLE)
                                  - CAST(1.0 AS DOUBLE)) / 100, 4)
                ELSE NULL END AS mae_1step
    FROM holt WHERE i = n_days
    """


@register(
    "holt_winters_level_trend",
    oracle=_holt_sql(),
    tags=("extension", "analytics", "forecast"),
)
def holt_winters_level_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over each segment's daily
    revenue series: level_t = alpha*x_t + (1-alpha)(level+trend),
    trend_t = beta*(level_t - level) + (1-beta)*trend, initialized the
    textbook way (l1 = x1, b1 = x2 - x1), with the one-step-ahead MAE
    accumulated inside the same fold. Emits the final level/trend, the
    7-day-ahead forecast level + 7*trend, and the backtest MAE —
    comparable against seasonal_naive_backtest's error.

    Cross-engine exactness WITHOUT unrolling 1.7k CTE rounds: the
    recursion folds over the day-ordered array via F.aggregate /
    list_reduce with a same-type struct accumulator, and every step is
    +, -, *, / on doubles with DYADIC constants (0.25/0.75/0.125/0.875)
    — all exactly-rounded IEEE ops in an identical textual order on
    both engines, so 1.7k chained roundings still land on the same
    bits (the ordered_fold discipline extended to a 2-state recursion).
    The day series v is the exact BIGINT cent total cast once to
    double (< 2^53, lossless).

    Scale shape: one fact aggregate to (segment, day) — calendar x
    segment bounded (~12k rows) — then a per-segment collect_list of
    <= 2.4k structs inside the aggregation buffer (dimension-bounded,
    the ordered_fold contract: NEVER over fact rows) and a 5-row
    result. The mae guard (n_days > 1) keeps a one-day segment NULL on
    both engines instead of Spark-NULL vs DuckDB-inf (the huber
    degenerate-case discipline)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cents = (dec("o_totalprice") * 100).cast("long")
    daily = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(cents).cast("double").alias("v"))
    )
    elem = lambda v: F.struct(  # noqa: E731 — one-expression adapter
        v.alias("lvl"),
        F.lit(0.0).alias("tr"),
        F.lit(0.0).alias("sae"),
        F.lit(1).cast("long").alias("n"),
    )
    series = daily.groupBy("segment").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: elem(s["v"]),
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )

    def merge(acc, e):
        prev = F.when(acc["n"] == 1, e["lvl"] - acc["lvl"]).otherwise(
            acc["tr"]
        )
        lvl = F.lit(_HOLT_ALPHA) * e["lvl"] + F.lit(1 - _HOLT_ALPHA) * (
            acc["lvl"] + prev
        )
        return F.struct(
            lvl.alias("lvl"),
            (
                F.lit(_HOLT_BETA) * (lvl - acc["lvl"])
                + F.lit(1 - _HOLT_BETA) * prev
            ).alias("tr"),
            (acc["sae"] + F.abs(e["lvl"] - (acc["lvl"] + prev))).alias(
                "sae"
            ),
            (acc["n"] + F.lit(1).cast("long")).alias("n"),
        )

    folded = series.select(
        "segment",
        "n_days",
        F.aggregate(
            F.slice(F.col("xs"), F.lit(2), F.size("xs") - 1),
            F.element_at("xs", 1),
            merge,
        ).alias("st"),
    )
    return folded.select(
        "segment",
        "n_days",
        F.round(F.col("st.lvl") / 100, 4).alias("level_end"),
        F.round(F.col("st.tr") / 100, 4).alias("trend_end"),
        F.round(
            (F.col("st.lvl") + F.lit(7.0) * F.col("st.tr")) / 100, 4
        ).alias("forecast_7d"),
        F.when(
            F.col("n_days") > 1,
            F.round(
                F.col("st.sae")
                / (F.col("n_days").cast("double") - F.lit(1.0))
                / 100,
                4,
            ),
        ).alias("mae_1step"),
    )


# ---------------------------------------------------------------------------
# Shapley-value multi-touch attribution (r9) — the game-theoretic member
# of the attribution tier (Shapley 1953; the marketing formulation of
# Dalessandro et al., "Causally motivated attribution for online
# advertising", ADKDD 2012): channels are players, the characteristic
# function v(S) is the total conversion value reachable using only
# channels in S, and each channel's credit is its exact Shapley value.
# The channel universe is small (|N| = k distinct non-purchase event
# types), so the 2^k coalition lattice is a METADATA-scale relation and
# the whole game solves with exact integer arithmetic: phi_i * k! is a
# BIGINT because every weight |S|!*(k-1-|S|)! and every marginal
# v(S+i)-v(S) is an integer (cents).


@register(
    "attribution_shapley_values",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             value,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey
      FROM events
    ),
    ch AS (
      SELECT event_type AS channel FROM events
      WHERE event_type <> 'purchase' GROUP BY 1
    ),
    chi AS (
      SELECT c1.channel,
             CAST(CAST(1 AS BIGINT) << (COUNT(*) - 1) AS BIGINT) AS bit
      FROM ch c1 JOIN ch c2 ON c2.channel <= c1.channel
      GROUP BY c1.channel
    ),
    kk AS (SELECT CAST(COUNT(*) AS INT) AS k FROM ch),
    jm AS (
      SELECT e.user_id, e.journey,
             CAST(bit_or(chi.bit) AS BIGINT) AS mask
      FROM e JOIN chi ON e.event_type = chi.channel
      WHERE e.event_type <> 'purchase'
      GROUP BY 1, 2
    ),
    conv AS (
      SELECT CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS val_cents,
             COALESCE(jm.mask, 0) AS mask
      FROM e p LEFT JOIN jm
        ON p.user_id = jm.user_id AND p.journey = jm.journey
      WHERE p.event_type = 'purchase'
    ),
    coal AS (
      SELECT mask, CAST(SUM(val_cents) AS BIGINT) AS v_cents,
             CAST(COUNT(*) AS BIGINT) AS n_j
      FROM conv GROUP BY mask
    ),
    subs AS (
      SELECT unnest(range(0, CAST(1 AS BIGINT) << k)) AS s, k FROM kk
    ),
    vs AS (
      SELECT subs.s, subs.k,
             CAST(COALESCE(SUM(CASE WHEN (coal.mask & subs.s) = coal.mask
                                    THEN coal.v_cents END), 0) AS BIGINT)
               AS v
      FROM subs CROSS JOIN coal
      GROUP BY 1, 2
    ),
    marg AS (
      SELECT chi.channel,
             factorial(bit_count(vs0.s))
               * factorial(vs0.k - 1 - bit_count(vs0.s))
               * (vs1.v - vs0.v) AS term
      FROM chi
      JOIN vs vs0 ON (vs0.s & chi.bit) = 0
      JOIN vs vs1 ON vs1.s = (vs0.s | chi.bit)
    ),
    phi AS (
      SELECT channel, CAST(SUM(term) AS BIGINT) AS phi_num
      FROM marg GROUP BY channel
    ),
    touched AS (
      SELECT chi.channel,
             CAST(COALESCE(SUM(CASE WHEN (coal.mask & chi.bit) <> 0
                                    THEN coal.n_j END), 0) AS BIGINT)
               AS touched_journeys
      FROM chi CROSS JOIN coal GROUP BY 1
    ),
    gv AS (
      SELECT CAST(MAX(CASE WHEN s = (CAST(1 AS BIGINT) << k) - 1
                           THEN v END) AS BIGINT) AS v_full,
             CAST(MAX(CASE WHEN s = 0 THEN v END) AS BIGINT) AS v_empty,
             CAST(MAX(k) AS INT) AS k
      FROM vs
    ),
    eff AS (SELECT CAST(SUM(phi_num) AS BIGINT) AS sum_phi FROM phi)
    SELECT phi.channel,
           touched.touched_journeys,
           CAST(phi.phi_num AS DOUBLE)
             / (CAST(factorial(gv.k) AS DOUBLE) * 100.0) AS shapley_value,
           CAST(gv.v_full - gv.v_empty AS DOUBLE) / 100.0
             AS attributable_value,
           CAST(eff.sum_phi
                - factorial(gv.k) * (gv.v_full - gv.v_empty) AS BIGINT)
             AS efficiency_gap_num
    FROM phi
    JOIN touched ON phi.channel = touched.channel
    CROSS JOIN gv CROSS JOIN eff
    """,
    tags=("extension", "analytics", "attribution"),
)
def attribution_shapley_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the journey framing shared
    with the position/Markov queries (journeys segment at purchases):
    each converting journey contributes its purchase value (cents) to
    the coalition = the SET of distinct channels it touched, v(S) sums
    the journeys whose coalition is a subset of S, and
    phi_i = sum over S not containing i of |S|!(k-1-|S|)!/k! *
    (v(S+i) - v(S)). Touchless (direct) conversions live in mask 0 =
    the empty coalition; they appear in EVERY v(S) and cancel in every
    marginal, so Shapley distributes exactly v(N) - v(empty) across
    channels — pinned in-band by efficiency_gap_num, which both engines
    must agree is identically 0.

    Exactness: phi_i * k! is a pure BIGINT (integer weights x integer
    cent marginals; k <= 5 so k! <= 120 and the numerator stays ~1e13
    even at sf100); the published shapley_value performs ONE double
    division by the shared text CAST(factorial(k) AS DOUBLE) * 100.0.

    Scale shape: the only fact-sized work is the journey window (shared
    (user_id) shuffle with the other attribution queries; scale_mode
    pins the windowed relation under spark.graft.scaleMode=cluster so
    its three consumers share ONE fact scan) and two hash
    aggregates — touch masks to (user, journey) and conversions to the
    <= 2^k-row coalition relation, localCheckpointed so the lattice
    algebra (subsets x coalitions cross joins, the vs0/vs1 self-joins,
    all broadcast, all <= 2^k * 2^k = 1024 pairs at k=5) replays over
    <= 32 materialized rows with flat lineage instead of rescanning the
    fact (the ESD discipline). Channel indexing is a broadcast
    self-join on the <= k-row channel relation — no global window."""
    ev = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = pin_if_cluster(
        spark,
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1)
                ).over(w_prev),
                F.lit(0),
            ).alias("journey"),
        ),
    )  # three consumers (ch, jm, conv) — cluster mode: ONE fact scan
    ch = (
        e.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"))
        .distinct()
        .localCheckpoint()  # <= k rows; feeds chi (twice) and kk
    )
    c1, c2 = ch.alias("c1"), ch.alias("c2")
    chi = (
        c1.join(F.broadcast(c2), F.col("c2.channel") <= F.col("c1.channel"))
        .groupBy(F.col("c1.channel").alias("channel"))
        .agg(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), "
                   "CAST(count(1) AS INT) - 1) AS BIGINT)").alias("bit")
        )
        .localCheckpoint()  # <= k rows; feeds jm, marg, touched
    )
    kk = ch.agg(F.count(F.lit(1)).cast("int").alias("k"))
    jm = (
        e.filter(F.col("event_type") != "purchase")
        .join(F.broadcast(chi), F.col("event_type") == F.col("channel"))
        .groupBy("user_id", "journey")
        .agg(F.bit_or("bit").cast("long").alias("mask"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(jm, ["user_id", "journey"], "left")
        .select(
            (dec("value") * 100).cast("long").alias("val_cents"),
            F.coalesce(F.col("mask"), F.lit(0).cast("long")).alias("mask"),
        )
    )
    coal = (
        conv.groupBy("mask")
        .agg(
            F.sum("val_cents").cast("long").alias("v_cents"),
            F.count(F.lit(1)).cast("long").alias("n_j"),
        )
        .localCheckpoint()  # <= 2^k rows; ends the fact lineage
    )
    subs = kk.select(
        "k",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr("shiftleft(CAST(1 AS BIGINT), k) - 1"),
            )
        ).alias("s"),
    )
    vs = (
        subs.crossJoin(F.broadcast(coal))
        .groupBy("s", "k")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("(mask & s) = mask"), F.col("v_cents")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("v")
        )
        .localCheckpoint()  # <= 2^k rows; feeds vs0, vs1, gv
    )
    vs0 = vs.select(
        F.col("s").alias("s0"), F.col("k").alias("k0"), F.col("v").alias("v0")
    )
    vs1 = vs.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    marg = (
        chi.join(F.broadcast(vs0), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(vs1), F.expr("s1 = (s0 | bit)"))
        .select(
            "channel",
            F.expr(
                "factorial(bit_count(s0)) "
                "* factorial(k0 - 1 - bit_count(s0)) * (v1 - v0)"
            ).alias("term"),
        )
    )
    phi = marg.groupBy("channel").agg(
        F.sum("term").cast("long").alias("phi_num")
    )
    touched = (
        chi.crossJoin(F.broadcast(coal))
        .groupBy("channel")
        .agg(
            F.coalesce(
                F.sum(F.when(F.expr("(mask & bit) <> 0"), F.col("n_j"))),
                F.lit(0),
            )
            .cast("long")
            .alias("touched_journeys")
        )
    )
    gv = vs.agg(
        F.max(
            F.when(
                F.expr("s = shiftleft(CAST(1 AS BIGINT), k) - 1"),
                F.col("v"),
            )
        )
        .cast("long")
        .alias("v_full"),
        F.max(F.when(F.col("s") == 0, F.col("v"))).cast("long").alias(
            "v_empty"
        ),
        F.max("k").cast("int").alias("k"),
    )
    eff = phi.agg(F.sum("phi_num").cast("long").alias("sum_phi"))
    return (
        phi.join(touched, "channel")
        .crossJoin(F.broadcast(gv))
        .crossJoin(F.broadcast(eff))
        .select(
            "channel",
            "touched_journeys",
            (
                F.col("phi_num").cast("double")
                / (F.expr("CAST(factorial(k) AS DOUBLE)") * F.lit(100.0))
            ).alias("shapley_value"),
            (
                (F.col("v_full") - F.col("v_empty")).cast("double")
                / F.lit(100.0)
            ).alias("attributable_value"),
            F.expr(
                "CAST(sum_phi - factorial(k) * (v_full - v_empty) AS BIGINT)"
            ).alias("efficiency_gap_num"),
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition certificate (r9) — the iterative-graph member of
# the graph tier next to copurchase_graph_stats (one-shot topology) and
# supplier_customer_pagerank (fixed-iteration value propagation): the
# k-core is the maximal subgraph where every node keeps degree >= k
# after repeatedly peeling low-degree nodes (Seidman 1983, "Network
# structure and minimum degree") — the standard density filter before
# graph-feature extraction. The peel is unrolled to a FIXED round count
# (the ESD/Markov precedent: data-independent plan shape on both
# engines) and the fixpoint is CERTIFIED in-band: the last two rounds'
# active counts must agree for converged=true, so "8 rounds was enough"
# is a graded value, not an assumption.

_KCORE_K = 3
_KCORE_MIN_SUPPORT = 2  # recurrent co-purchase: pairs bought together >= twice
_KCORE_ROUNDS = 12


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE home for the recurrent co-purchase edge relation (advisor r9:
    the construction was hand-copied six times across kcore / LPA /
    assortativity and their oracles — a support-threshold or tie-break
    edit to one copy would silently desync the graph family). Edges =
    unordered part pairs (u < v) bought together in >= _KCORE_MIN_SUPPORT
    distinct orders. Basket-bounded self-join (per-order pairs =
    C(basket, 2), never corpus^2 — the copurchase_graph_stats contract).
    Returned PERSISTED: every caller iterates or multi-consumes it;
    cleanup is harness-owned (the jaccard_pairs contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = basket.alias("a"), basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .agg(F.count(F.lit(1)).alias("_sup"))
        .filter(F.col("_sup") >= _KCORE_MIN_SUPPORT)
        .select("u", "v")
        .persist()
    )


def _copurchase_edges_sql() -> list[str]:
    """The DuckDB twin of :func:`_copurchase_edges`: the two CTE blocks
    (basket, edges) every graph-family oracle opens with — textually
    identical to the pre-factoring copies, so existing oracle hashes are
    unchanged."""
    return [
        """basket AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    )""",
        f"""edges AS MATERIALIZED (
      SELECT a.pk AS u, b.pk AS v
      FROM basket a JOIN basket b ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {_KCORE_MIN_SUPPORT}
    )""",
    ]


def _kcore_sql() -> str:
    ctes = [
        *_copurchase_edges_sql(),
        """v0 AS MATERIALIZED (
      SELECT u AS node FROM edges UNION SELECT v AS node FROM edges
    )""",
        """base AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v0) AS n_nodes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges
    )""",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT e.u AS node FROM edges e
        JOIN v{p} x ON e.u = x.node JOIN v{p} y ON e.v = y.node
        UNION ALL
        SELECT e.v AS node FROM edges e
        JOIN v{p} x ON e.u = x.node JOIN v{p} y ON e.v = y.node
      ) GROUP BY node
    )"""
        )
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {_KCORE_K})"
        )
    selects = [
        f"SELECT CAST({r} AS INT) AS round_i,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM v{r}) AS n_active"
        for r in range(_KCORE_ROUNDS + 1)
    ]
    ctes.append("per_round AS (" + "\n      UNION ALL\n      ".join(selects) + ")")
    last, prev = _KCORE_ROUNDS, _KCORE_ROUNDS - 1
    ctes.append(
        f"""conv AS (
      SELECT (SELECT COUNT(*) FROM v{last}) = (SELECT COUNT(*) FROM v{prev})
        AS converged,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM v{last}) AS n_in_core
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT per_round.round_i, per_round.n_active,
           base.n_nodes, base.n_edges,
           CAST({_KCORE_K} AS INT) AS core_k,
           conv.n_in_core, conv.converged
    FROM per_round CROSS JOIN base CROSS JOIN conv
    """
    )


@register(
    "kcore_peel_certificate",
    oracle=_kcore_sql(),
    tags=("extension", "graph", "iterative"),
)
def kcore_peel_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the RECURRENT co-purchase graph (edges = part pairs
    bought together in >= 2 distinct orders — the support threshold that
    strips one-off basket noise, leaving a graph a peel can actually
    bite: 1880 -> 935 nodes at sf0.01) by unrolled peeling: 12 rounds of
    (restrict edges to surviving endpoints -> recount degrees -> keep
    nodes with degree >= 3), emitting the active-node count after every
    round plus the convergence certificate (last two counts equal;
    since each round's survivor set is a subset of the previous one,
    equal COUNTS imply equal SETS, so converged=true proves the true
    k-core was reached inside the unroll budget on both engines).

    Exactness: pure integer set algebra — degrees, counts, subset
    filters; no floats anywhere.

    Scale shape: the edge list (basket-bounded self-join, the
    copurchase_graph_stats contract: per-order pairs = basket choose 2,
    never corpus squared) is persisted ONCE and every round consumes
    the one materialization via two left_semi joins; survivor sets are
    localCheckpointed per round (the iterative-algorithm discipline of
    dedup_clusters' CC loop) so round r+1's lineage starts from
    materialized rows, not a 2^r join tree. Each round is two
    node-keyed shuffles. Per-round survivor counts are 1-row collected
    scalars (the bounded-collect contract), which buys the FIXPOINT
    SHORT-CIRCUIT: once V_r == V_{r-1}, every later round is provably
    identical, so the loop stops executing and fills the remaining
    certificate rows with the converged count — at 100 TB the peel
    costs only as many distributed rounds as the graph actually needs
    (the oracle unrolls all rounds unconditionally; values identical
    because the filled counts ARE the fixpoint values)."""
    # persisted by the helper: consumed by every peel round + the edge count
    edges = _copurchase_edges(spark, sf_dir)
    active = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    base = (
        active.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(
            F.broadcast(
                edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            )
        )
    )
    counts = [active.count()]  # bounded collect: one scalar per round
    for _ in range(_KCORE_ROUNDS):
        if len(counts) >= 2 and counts[-1] == counts[-2]:
            # fixpoint reached: V_r == V_{r-1} (subset + equal count),
            # so every remaining round returns the same set — fill
            # without executing (matches the oracle's unconditional
            # unroll value-for-value)
            counts.append(counts[-1])
            continue
        e_act = edges.join(
            active, edges["u"] == active["node"], "left_semi"
        ).join(active, F.col("v") == active["node"], "left_semi")
        deg = (
            e_act.select(F.col("u").alias("node"))
            .unionAll(e_act.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        active = (
            deg.filter(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        counts.append(active.count())
    rounds_df = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)],
        "round_i int, n_active long",
    )
    return rounds_df.crossJoin(F.broadcast(base)).select(
        "round_i",
        "n_active",
        "n_nodes",
        "n_edges",
        F.lit(_KCORE_K).cast("int").alias("core_k"),
        F.lit(int(counts[-1])).cast("long").alias("n_in_core"),
        F.lit(bool(counts[-1] == counts[-2])).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Label-propagation community detection (r9) — the community member of
# the graph tier (Raghavan/Albert/Kumara 2007), in the DETERMINISTIC
# self-inclusive synchronous form: every node votes its own current
# label alongside its neighbors' (the damping that kills sync-LPA's
# bipartite flip-flop — probed: plain sync oscillates forever on this
# graph, self-inclusive reaches changed=0 by round 7 at sf0.01), ties
# broken by smallest label, so every round is a pure function of the
# previous labeling and both engines replay it bit-for-bit.

_LPA_ROUNDS = 8


def _lpa_sql() -> str:
    ctes = [
        *_copurchase_edges_sql(),
        """l0 AS MATERIALIZED (
      SELECT node, node AS label FROM (
        SELECT u AS node FROM edges UNION SELECT v AS node FROM edges
      )
    )""",
        """base AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l0) AS n_nodes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges
    )""",
    ]
    selects = []
    for r in range(1, _LPA_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""l{r} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM (
          SELECT node, label, COUNT(*) AS cnt FROM (
            SELECT e.u AS node, l{p}.label
            FROM edges e JOIN l{p} ON e.v = l{p}.node
            UNION ALL
            SELECT e.v AS node, l{p}.label
            FROM edges e JOIN l{p} ON e.u = l{p}.node
            UNION ALL
            SELECT node, label FROM l{p}
          ) GROUP BY node, label
        )
      ) WHERE rn = 1
    )"""
        )
        selects.append(
            f"""SELECT CAST({r} AS INT) AS round_i,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l{r} j
              JOIN l{p} o ON j.node = o.node
              WHERE j.label <> o.label) AS n_changed,
             (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM l{r})
               AS n_communities,
             (SELECT CAST(MAX(c) AS BIGINT)
              FROM (SELECT COUNT(*) AS c FROM l{r} GROUP BY label))
               AS biggest_community"""
        )
    ctes.append(
        "per_round AS (" + "\n      UNION ALL\n      ".join(selects) + ")"
    )
    last = _LPA_ROUNDS
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT per_round.round_i, per_round.n_changed,
           per_round.n_communities, per_round.biggest_community,
           base.n_nodes, base.n_edges,
           (SELECT n_changed FROM per_round WHERE round_i = {last}) = 0
             AS converged
    FROM per_round CROSS JOIN base
    """
    )


@register(
    "label_propagation_communities",
    oracle=_lpa_sql(),
    tags=("extension", "graph", "iterative"),
)
def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic self-inclusive synchronous LPA over the recurrent
    co-purchase graph (the kcore edge relation): 8 unrolled rounds of
    (count neighbor labels + own label -> adopt the most frequent,
    smallest label on ties), emitting per round the label-change count,
    the community count and the largest community size, plus the
    fixpoint certificate (round-8 changes == 0; changed=0 implies every
    later round is identical, so converged=true proves the final
    communities are THE fixpoint on both engines).

    Exactness: pure integer voting — counts, min-label ties; no floats.

    Scale shape: the support-thresholded edge list is persisted once
    (basket-bounded — the copurchase contract); each round is two
    node-keyed shuffles (vote scatter + argmax window partitioned BY
    NODE, never global) over the localCheckpointed labeling; per-round
    stats are bounded 1-row collects, which buy the kcore fixpoint
    short-circuit — converged rounds stop executing and fill the
    certificate with the provably-constant stats."""
    # persisted by the helper: consumed by every vote round + the edge count
    edges = _copurchase_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    n_nodes = labels.count()
    n_edges = edges.count()
    w_pick = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    stats = []  # (round, changed, n_comm, biggest)
    for r in range(1, _LPA_ROUNDS + 1):
        if stats and stats[-1][1] == 0:
            # fixpoint: identical labels produce identical votes — fill
            # without executing (matches the oracle's full unroll)
            stats.append((r,) + stats[-1][1:])
            continue
        votes = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label")
                ),
                "v",
            )
            .select(F.col("u").alias("node"), "label")
            .unionAll(
                edges.join(
                    labels.select(
                        F.col("node").alias("u"), F.col("label")
                    ),
                    "u",
                ).select(F.col("v").alias("node"), "label")
            )
            .unionAll(labels.select("node", "label"))
        )
        new_labels = (
            votes.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "node", "label", F.row_number().over(w_pick).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("j")
            .join(labels.alias("o"), F.col("j.node") == F.col("o.node"))
            .filter(F.col("j.label") != F.col("o.label"))
            .count()
        )
        agg = new_labels.groupBy("label").agg(
            F.count(F.lit(1)).alias("c")
        )
        row = agg.agg(
            F.count(F.lit(1)).alias("nc"), F.max("c").alias("big")
        ).first()
        labels = new_labels
        stats.append((r, changed, row["nc"], row["big"]))
    converged = stats[-1][1] == 0
    rounds_df = spark.createDataFrame(
        [
            (r, int(ch), int(nc), int(big))
            for r, ch, nc, big in stats
        ],
        "round_i int, n_changed long, n_communities long,"
        " biggest_community long",
    )
    return rounds_df.select(
        "round_i",
        "n_changed",
        "n_communities",
        "biggest_community",
        F.lit(int(n_nodes)).cast("long").alias("n_nodes"),
        F.lit(int(n_edges)).cast("long").alias("n_edges"),
        F.lit(bool(converged)).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Wilson score intervals for the funnel (r9) — the uncertainty rung of
# the funnel tier: event_funnel_conversion publishes point rates; the
# Wilson interval (Wilson 1927) is the binomial CI that stays inside
# [0,1] and behaves at small n / extreme p, which is exactly the deep
# end of a funnel. Closed-form in +,-,*,/,sqrt over exact counts, so
# the shared-text discipline gives bit-identical bounds cross-engine.

_WILSON_Z = 1.959963984540054  # Phi^-1(0.975), baked
_WILSON_Z2 = _WILSON_Z * _WILSON_Z


def _wilson_sql(lo: bool) -> str:
    """Shared-text Wilson bound over columns k (successes) and n
    (trials) — ONE textual home per engine side."""
    z = f"CAST({_WILSON_Z!r} AS DOUBLE)"
    z2 = f"CAST({_WILSON_Z2!r} AS DOUBLE)"
    ph = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    nn = "CAST(n AS DOUBLE)"
    sign = "-" if lo else "+"
    return (
        f"({ph} + {z2} / (2.0 * {nn}) {sign} {z} * "
        f"sqrt({ph} * (1.0 - {ph}) / {nn}"
        f" + {z2} / (4.0 * {nn} * {nn})))"
        f" / (1.0 + {z2} / {nn})"
    )


@register(
    "wilson_interval_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (
      SELECT user_id, MIN(ts) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e)
               AS n_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_v,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_p
    ),
    steps AS (
      SELECT 'view_of_users' AS step, n_users AS n, n_v AS k FROM counts
      UNION ALL
      SELECT 'click_after_view', n_v, n_c FROM counts
      UNION ALL
      SELECT 'purchase_after_click', n_c, n_p FROM counts
    )
    SELECT step, n AS n_trials, k AS n_successes,
           CASE WHEN n > 0
                THEN round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6)
           END AS rate,
           CASE WHEN n > 0 THEN round({_wilson_sql(True)}, 6)
           END AS wilson_lo,
           CASE WHEN n > 0 THEN round({_wilson_sql(False)}, 6)
           END AS wilson_hi
    FROM steps
    """,
    tags=("extension", "analytics", "events", "statistics"),
)
def wilson_interval_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score intervals for every step of the ordered
    view->click->purchase funnel (the event_funnel_conversion framing,
    counts shared verbatim): per step, trials = users completing the
    previous stage, successes = users completing this one, and the
    interval from the closed Wilson form over those exact integers —
    one shared-text expression per bound (sqrt and the four basic ops,
    all exactly-rounded IEEE), rounded 6dp on both engines; empty
    denominators publish NULL identically (the huber guard).

    Scale shape: identical to event_funnel_conversion — three user-
    keyed hash aggregates on one shuffled key, then 3-row scalar
    algebra."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .persist()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .persist()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        e.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .crossJoin(
            F.broadcast(v.agg(F.count(F.lit(1)).cast("long").alias("n_v")))
        )
        .crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).cast("long").alias("n_c")))
        )
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).cast("long").alias("n_p")))
        )
        .localCheckpoint()  # 1 row; feeds the three step selects
    )
    steps = (
        counts.select(
            F.lit("view_of_users").alias("step"),
            F.col("n_users").alias("n"),
            F.col("n_v").alias("k"),
        )
        .unionByName(
            counts.select(
                F.lit("click_after_view").alias("step"),
                F.col("n_v").alias("n"),
                F.col("n_c").alias("k"),
            )
        )
        .unionByName(
            counts.select(
                F.lit("purchase_after_click").alias("step"),
                F.col("n_c").alias("n"),
                F.col("n_p").alias("k"),
            )
        )
    )
    guard = F.col("n") > 0
    return steps.select(
        "step",
        F.col("n").alias("n_trials"),
        F.col("k").alias("n_successes"),
        F.when(
            guard,
            F.round(F.col("k").cast("double") / F.col("n").cast("double"), 6),
        ).alias("rate"),
        F.when(guard, F.round(F.expr(_wilson_sql(True)), 6)).alias(
            "wilson_lo"
        ),
        F.when(guard, F.round(F.expr(_wilson_sql(False)), 6)).alias(
            "wilson_hi"
        ),
    )


# ---------------------------------------------------------------------------
# Degree assortativity (r9) — the mixing-pattern member of the graph
# tier (Newman 2002): Pearson correlation of endpoint degrees over the
# edge list. Positive = hubs attach to hubs (social networks), negative
# = hub-and-spoke (technological/catalog graphs) — the one-number
# summary of which scaling regime the co-purchase graph lives in.


_COPURCHASE_CTES = ",\n    ".join(_copurchase_edges_sql())


@register(
    "degree_assortativity",
    oracle=f"""
    WITH {_COPURCHASE_CTES},
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges e JOIN deg du ON e.u = du.node
      JOIN deg dv ON e.v = dv.node
      UNION ALL
      SELECT dv.d, du.d
      FROM edges e JOIN deg du ON e.u = du.node
      JOIN deg dv ON e.v = dv.node
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs
    ),
    gstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(MAX(d) AS BIGINT) AS max_degree
      FROM deg
    )
    SELECT gstats.n_nodes,
           CAST(mom.m / 2 AS BIGINT) AS n_edges,
           gstats.max_degree,
           round(CAST(mom.sx AS DOUBLE) / CAST(mom.m AS DOUBLE), 4)
             AS mean_edge_degree,
           CASE WHEN mom.m * mom.sxx - mom.sx * mom.sx > 0
                THEN round(CAST(mom.m * mom.sxy - mom.sx * mom.sx
                                AS DOUBLE)
                           / CAST(mom.m * mom.sxx - mom.sx * mom.sx
                                  AS DOUBLE), 6)
           END AS assortativity_r
    FROM mom CROSS JOIN gstats
    """,
    tags=("extension", "graph"),
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the recurrent co-purchase graph
    (the kcore/LPA edge relation): every edge contributes BOTH ordered
    endpoint-degree pairs, so the x and y marginals coincide and
    Pearson r collapses to (M*Sxy - Sx^2) / (M*Sxx - Sx^2) over four
    exact BIGINT moments with ONE final division (zero-variance guard:
    a regular graph publishes NULL identically on both engines —
    the huber discipline).

    Magnitudes: M*Sxy <= 2E * (2E)^2 per the degree-sum bound — ~8e13
    at sf0.1's 3.4k recurrent edges, BIGINT-safe through ~sf100;
    beyond, recentre degrees by their mean (the huber bound note).

    Scale shape: the basket-bounded edge list is persisted (three
    consumers: the degree union x2 and the pair join), degrees are one
    hash aggregate, and the pair relation is two broadcast-degree
    joins — no windows, no iteration."""
    # persisted by the helper: degree union (2x) + the pair join
    edges = _copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist()  # du + dv sides and the node stats
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("xu"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("xv"))
    joined = edges.join(du, "u").join(dv, "v")
    pairs = joined.select(
        F.col("xu").alias("x"), F.col("xv").alias("y")
    ).unionAll(joined.select(F.col("xv").alias("x"), F.col("xu").alias("y")))
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    gstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("d").cast("long").alias("max_degree"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den_i = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.crossJoin(F.broadcast(gstats)).select(
        "n_nodes",
        F.expr("CAST(m div 2 AS BIGINT)").alias("n_edges"),
        "max_degree",
        F.round(
            F.col("sx").cast("double") / F.col("m").cast("double"), 4
        ).alias("mean_edge_degree"),
        F.when(den_i > 0, F.round(num / den_i.cast("double"), 6)).alias(
            "assortativity_r"
        ),
    )
