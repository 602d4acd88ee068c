"""Item-item collaborative filtering over the order/lineitem stream
(SURVEY.md §2 extensions — the recommendation tier an e-commerce
pipeline feeds from its fact stream).

Classic co-occurrence CF: two parts are similar when they appear in the
same orders more often than their individual popularity predicts. The
score is the cosine of the binary order-incidence vectors,
cooc(i,j) / sqrt(n_i * n_j) — counts are exact integers, sqrt/division
are single correctly-rounded IEEE ops, so the 6dp-rounded score is
bit-identical cross-engine.

Scale notes (100 TB): the pair generation is a self-equi-join on
l_orderkey — pair volume is Σ_orders m² where m is the per-order basket
size (bounded by business reality, ~single digits), never corpus².
The popularity relation is part-dimension-sized. The final ranking
window partitions by item over its candidate neighbors (≤ basket-mates
count), not a global sort. A cooc ≥ 2 support floor prunes the long
singleton tail before the join+window stages, the same support-pruning
contract as association_rules_brands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table

_MIN_COOC = 2
_TOP_NEIGHBORS = 3


def _cf_scored_pairs(li: DataFrame) -> DataFrame:
    """Symmetric scored neighbor relation (i, j, cooc, n_i, n_j, cos_sim)
    from a distinct (l_orderkey, l_partkey) incidence relation — the
    shared model-build under item_item_cf_topk (full-corpus neighbors)
    and cf_holdout_hitrate (train-split model). Persisted inputs are the
    caller's concern; this adds its own persist on the pair relation
    (consumed by both union branches)."""
    pop = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("i"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("j"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= _MIN_COOC)
        .persist()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "cooc")
    )
    return (
        sym.join(pop.withColumnRenamed("l_partkey", "i"), "i")
        .withColumnRenamed("n_orders", "n_i")
        .join(
            pop.select(
                F.col("l_partkey").alias("j"), F.col("n_orders").alias("n_j")
            ),
            "j",
        )
        .withColumn(
            "cos_sim",
            F.round(
                F.col("cooc").cast("double")
                / F.sqrt(
                    F.col("n_i").cast("double") * F.col("n_j").cast("double")
                ),
                6,
            ),
        )
    )


@register(
    "item_item_cf_topk",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pop AS (
      SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS i, b.l_partkey AS j, COUNT(*) AS cooc
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_COOC}
    ),
    sym AS (
      SELECT i, j, cooc FROM pairs
      UNION ALL
      SELECT j AS i, i AS j, cooc FROM pairs
    ),
    scored AS (
      SELECT sym.i, sym.j, sym.cooc,
             pi.n_orders AS n_i, pj.n_orders AS n_j,
             round(CAST(sym.cooc AS DOUBLE)
                   / sqrt(CAST(pi.n_orders AS DOUBLE)
                          * CAST(pj.n_orders AS DOUBLE)), 6) AS cos_sim
      FROM sym
      JOIN pop pi ON sym.i = pi.l_partkey
      JOIN pop pj ON sym.j = pj.l_partkey
    )
    SELECT i AS part_i, j AS part_j, cooc, n_i, n_j, cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY i
                                   ORDER BY cos_sim DESC, j ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {_TOP_NEIGHBORS}
    """,
    tags=("extension", "recommendation", "join"),
)
def item_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 co-purchased neighbors per part (_TOP_NEIGHBORS), scored by
    binary cosine over order incidence (support floor _MIN_COOC = 2).

    The basket self-join, popularity join, and ranking window all key on
    the part id, so AQE reuses one partitioning across the last two
    stages; the (orderkey-keyed) pair stage's volume is bounded by basket
    size squared per order.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # consumed by the popularity agg AND both sides of the pair
        # self-join — unpersisted, the distinct shuffle executes 3×
        .persist()
    )
    scored = _cf_scored_pairs(li)
    w = Window.partitionBy("i").orderBy(F.desc("cos_sim"), F.asc("j"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TOP_NEIGHBORS)
        .select(
            F.col("i").alias("part_i"),
            F.col("j").alias("part_j"),
            "cooc",
            "n_i",
            "n_j",
            "cos_sim",
            "rnk",
        )
    )


# Integer-micro DCG gain table (1e6/log2(rank+1), rounded once in Python
# and inlined as LITERALS in both engines — the JL-certificate precedent
# for keeping libm out of graded arithmetic entirely). _IDCG_MICRO[m] is
# the ideal DCG for a holdout basket of m relevant items (cumulative).
_GAIN_MICRO = (1000000, 630930, 500000, 430677, 386853)
_IDCG_MICRO = (1000000, 1630930, 2130930, 2561607, 2948460)
_REC_K = 5

_SQL_GAIN_CASE = "CASE rnk " + " ".join(
    f"WHEN {r + 1} THEN {g}" for r, g in enumerate(_GAIN_MICRO)
) + " END"
_SQL_IDCG_CASE = (
    f"CASE LEAST({_REC_K}, basket) "
    + " ".join(f"WHEN {m + 1} THEN {v}" for m, v in enumerate(_IDCG_MICRO))
    + " END"
)


@register(
    "cf_holdout_hitrate",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC,
                                         o_orderkey DESC) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_ord
      FROM orders
    ),
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li_tr AS (
      SELECT li.l_orderkey, li.l_partkey
      FROM li JOIN ranked ON li.l_orderkey = ranked.o_orderkey
      WHERE rn >= 2 AND n_ord >= 2
    ),
    hist AS (
      SELECT DISTINCT ranked.o_custkey, li.l_partkey
      FROM li JOIN ranked ON li.l_orderkey = ranked.o_orderkey
      WHERE rn >= 2 AND n_ord >= 2
    ),
    pop AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li_tr GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS i, b.l_partkey AS j, COUNT(*) AS cooc
      FROM li_tr a JOIN li_tr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_COOC}
    ),
    sym AS (
      SELECT i, j, cooc FROM pairs
      UNION ALL
      SELECT j AS i, i AS j, cooc FROM pairs
    ),
    scored AS (
      SELECT sym.i, sym.j,
             CAST(round(round(CAST(sym.cooc AS DOUBLE)
                              / sqrt(CAST(pi.n_orders AS DOUBLE)
                                     * CAST(pj.n_orders AS DOUBLE)), 6)
                        * 1000000) AS BIGINT) AS cos_micro
      FROM sym
      JOIN pop pi ON sym.i = pi.l_partkey
      JOIN pop pj ON sym.j = pj.l_partkey
    ),
    recs AS (
      SELECT h.o_custkey, s.j, SUM(s.cos_micro) AS score_micro
      FROM hist h JOIN scored s ON h.l_partkey = s.i
      LEFT JOIN hist seen ON seen.o_custkey = h.o_custkey
                         AND seen.l_partkey = s.j
      WHERE seen.l_partkey IS NULL
      GROUP BY h.o_custkey, s.j
    ),
    topk AS (
      SELECT o_custkey, j, rnk FROM (
        SELECT o_custkey, j,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY score_micro DESC, j ASC) AS rnk
        FROM recs
      ) WHERE rnk <= {_REC_K}
    ),
    testb AS (
      SELECT DISTINCT ranked.o_custkey, li.l_partkey
      FROM li JOIN ranked ON li.l_orderkey = ranked.o_orderkey
      WHERE rn = 1 AND n_ord >= 2
    ),
    bs AS (SELECT o_custkey, COUNT(*) AS basket FROM testb GROUP BY 1),
    hits AS (
      SELECT t.o_custkey,
             SUM({_SQL_GAIN_CASE}) AS dcg_micro,
             COUNT(*) AS n_hits
      FROM topk t JOIN testb b ON t.o_custkey = b.o_custkey
                              AND t.j = b.l_partkey
      GROUP BY t.o_custkey
    ),
    peruser AS (
      SELECT bs.o_custkey,
             CASE WHEN coalesce(hits.n_hits, 0) > 0 THEN 1 ELSE 0 END AS hit,
             round(CAST(coalesce(hits.dcg_micro, 0) AS DOUBLE)
                   / ({_SQL_IDCG_CASE}), 6) AS ndcg
      FROM bs LEFT JOIN hits ON bs.o_custkey = hits.o_custkey
    )
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(hit) AS BIGINT) AS n_hit,
           round(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS hit_rate,
           round(list_aggregate(list_sort(list(ndcg)), 'sum') / COUNT(*), 6)
             AS mean_ndcg
    FROM peruser JOIN customer ON peruser.o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("extension", "recommendation", "backtest", "certificate"),
)
def cf_holdout_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-basket-out backtest of the item-item CF recommender:
    every customer's most recent order is held out, the co-occurrence
    model trains on the remainder, each customer gets top-5
    recommendations scored by SUMMED neighbor similarity over their
    train history (classic itemCF scoring), and the held-out basket
    grades them — per-segment hit-rate@5 and mean NDCG@5. This is the
    recommender twin of markov_next_event_backtest: the quality
    certificate that turns the CF model from "produces neighbors" into
    "predicts future purchases measurably better than nothing".

    Exactness: similarity mass is accumulated in INTEGER MICROS (the
    6dp-rounded cosine times 1e6 — BIGINT sums, no float order
    dependence), and the DCG gain table 1e6/log2(r+1) is rounded once
    in Python and inlined as literals in BOTH engines, so per-user DCG
    and ideal-DCG are exact integers; the only floats are the final
    per-user ndcg division (rounded 6dp) and the segment-level sorted
    folds. Scale shape: everything keys on customer or part; the
    holdout split is a partitioned window over each customer's orders,
    the scoring join fans out history x neighbors (basket-bounded), and
    the per-user ranking window sees only that user's candidates.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w_u = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.row_number().over(w_u).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias(
                "n_ord"
            ),
        )
        .filter(F.col("n_ord") >= 2)
        .persist()  # feeds the train AND test branches
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()  # joined against both order splits
    )
    li_tr = (
        li.join(
            ranked.filter(F.col("rn") >= 2).select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .persist()  # feeds the CF model build AND the history relation
    )
    hist = li_tr.select("o_custkey", "l_partkey").distinct().persist()
    scored = _cf_scored_pairs(li_tr.select("l_orderkey", "l_partkey")).select(
        "i",
        "j",
        F.round(F.col("cos_sim") * 1e6, 0).cast("long").alias("cos_micro"),
    )
    recs = (
        hist.join(scored, hist["l_partkey"] == scored["i"])
        .groupBy("o_custkey", "j")
        .agg(F.sum("cos_micro").alias("score_micro"))
        .join(
            hist.select(
                F.col("o_custkey").alias("_cu"), F.col("l_partkey").alias("_pk")
            ),
            (F.col("o_custkey") == F.col("_cu")) & (F.col("j") == F.col("_pk")),
            "left_anti",
        )
    )
    w_rec = Window.partitionBy("o_custkey").orderBy(
        F.desc("score_micro"), F.asc("j")
    )
    topk = (
        recs.select("o_custkey", "j", F.row_number().over(w_rec).alias("rnk"))
        .filter(F.col("rnk") <= _REC_K)
    )
    testb = (
        li.join(
            ranked.filter(F.col("rn") == 1).select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_partkey")
        .distinct()
        .persist()  # grades hits AND sizes the ideal DCG
    )
    bs = testb.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("basket"))
    gain = F.element_at(
        F.lit(list(_GAIN_MICRO)), F.col("rnk").cast("int")
    ).cast("long")
    hits = (
        topk.join(
            testb.withColumnRenamed("l_partkey", "j"), ["o_custkey", "j"]
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(gain).alias("dcg_micro"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    idcg = F.element_at(
        F.lit(list(_IDCG_MICRO)),
        F.least(F.lit(_REC_K), F.col("basket")).cast("int"),
    ).cast("long")
    peruser = bs.join(hits, "o_custkey", "left").select(
        "o_custkey",
        F.when(F.coalesce(F.col("n_hits"), F.lit(0)) > 0, 1)
        .otherwise(0)
        .alias("hit"),
        F.round(
            F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("double") / idcg, 6
        ).alias("ndcg"),
    )
    return (
        peruser.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            peruser["o_custkey"] == customer["c_custkey"],
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("hit").cast("long").alias("n_hit"),
            F.round(F.sum("hit").cast("double") / F.count(F.lit(1)), 6).alias(
                "hit_rate"
            ),
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list("ndcg")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ndcg"),
        )
    )
