"""IVF (inverted-file) approximate nearest neighbor search.

The second scale path for similarity search (alongside the hyperplane
LSH in operators/similarity.py), mirroring the classic IVF design:

1. **Train** a coarse quantizer: k-means centroids over a sample of the
   corpus. The sample is tiny by construction, so Lloyd iterations run
   driver-side in NumPy (seconds for k≤4096·dim≤4096); only the final
   centroid matrix ships to executors.
2. **Assign** every corpus vector to its nearest centroid — one
   broadcast-join + argmin over k centroids, fully distributed. The
   (centroid_id → vectors) lists are the inverted file.
3. **Probe**: each query scores only the vectors in its ``nprobe``
   nearest centroid lists — corpus-scan cost drops ~k/nprobe-fold.

All scoring is the same codegen'd cosine fold as the exact path, so
results are directly comparable; recall is tuned by k and nprobe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions.vectors import cosine_similarity


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample_fraction: float | None = None,
    iterations: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """K-means (Lloyd) on a seeded corpus sample, driver-side NumPy.

    The driver-side collect is ALWAYS bounded: an optional seeded
    ``sample_fraction`` thins the corpus first, then ``limit(
    max_train_rows)`` hard-caps the rows pulled to the driver — so a
    100 TB corpus trains on at most ``max_train_rows`` vectors instead
    of OOMing the driver. Centroid quality needs only a sketch of the
    density, not the full corpus."""
    import numpy as np

    sample = corpus.select(vec_col)
    if sample_fraction is not None and sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    # deterministic cap: a bare LIMIT is partition-layout-dependent once
    # the corpus exceeds the cap (the pq.py trainer's documented bug,
    # same fix: rank by a content hash before the limit)
    sample = sample.orderBy(F.xxhash64(F.col(vec_col))).limit(max_train_rows)
    x = np.asarray([list(map(float, r[0])) for r in sample.collect()])
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iterations):
        # cosine assignment: normalize, argmax of dot products
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (xn @ cn.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cent]


def _nearest_centroids(
    vec: Column, centroids: list[list[float]], n: int
) -> Column:
    """Array of the ``n`` nearest centroid ids (by cosine), as a Column.

    Scores against each centroid are independent codegen'd folds; the
    top-n extraction sorts a k-element array per row (k is small).
    """
    scored = F.array(
        *[
            F.struct(
                cosine_similarity(vec, F.array(*[F.lit(x) for x in c])).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    # sort descending by score (negate), take n centroid ids
    top = F.slice(F.sort_array(scored, asc=False), 1, n)
    return F.transform(top, lambda t: t.getField("c"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's nprobe nearest inverted lists.

    Same output/determinism contract as cosine_topk (6dp rounding, id
    tiebreak). Scored fraction ≈ nprobe/n_centroids of the corpus.
    """
    centroids = train_centroids(
        corpus, n_centroids, vec_col=vec_col, seed=seed
    )
    c_assigned = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        _nearest_centroids(F.col(vec_col), centroids, 1).getItem(0).alias("list_id"),
    )
    q_probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_centroids(F.col(vec_col), centroids, nprobe)).alias(
            "list_id"
        ),
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cosine", "rnk")
    )
