"""Dedup + similarity-search queries (SURVEY.md §2.11 extension tier).

The exact variants (n-gram Jaccard, brute-force cosine) carry DuckDB
oracles; the LSH-accelerated variants (MinHash banding, SimHash, bucketed
ANN) are engine-specific (xxhash64 signatures) so they register
oracle=None → rows-only driver check, but tests/test_similarity.py pins
them against the exact variants (recall checks), which is stronger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from ecommerce_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    jaccard_pairs,
    lsh_bucketed_topk,
    minhash_lsh_neardup,
    simhash_neardup,
    simhash_table,
)
from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table

_SQL_TOKENS = "string_split_regex(lower(text), '[^a-z0-9]+')"

# Document-frequency cap for every shared-shingle pair join (and its
# oracle twin). A shingle appearing in d documents yields d²/2 self-join
# rows, so an uncapped hot shingle (boilerplate 3-gram) is quadratic at
# corpus scale; capping df bounds per-shingle fan-out at MAX_SHINGLE_DF²/2
# for one extra linear hash-aggregate. 64 ≈ 13% of the sf0.01 corpus and
# ~1% of sf0.1 — at real corpus scale the guidance is ~1e-4 × corpus size
# (see operators/similarity.py::jaccard_pairs).
MAX_SHINGLE_DF = 64

# Shared oracle CTE prefix: tokenized docs → distinct 3-gram shingles →
# df-capped shingle relation → per-doc capped set sizes. Mirrors
# df_capped_shingles + shingle_sets exactly.
_SQL_SHINGLES_CAPPED = f"""
    tok AS (SELECT doc_id, list_filter({_SQL_TOKENS}, t -> t <> '') AS ts FROM documents),
    sh_all AS (SELECT doc_id,
                      unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                            for i in generate_series(1, len(ts)-2)])) AS s
               FROM tok),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all
           JOIN (SELECT s FROM sh_all GROUP BY s
                 HAVING count(*) <= {MAX_SHINGLE_DF}) ok USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

# UNCAPPED shingle CTE — only for minhash_recall_vs_exact, whose contract
# is equality with the full exact-Jaccard relation (the LSH verify step
# runs on full shingle sets).
_SQL_SHINGLES_EXACT = f"""
    tok AS (SELECT doc_id, list_filter({_SQL_TOKENS}, t -> t <> '') AS ts FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                        for i in generate_series(1, len(ts)-2)])) AS s
           FROM tok),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


@register(
    "ngram_jaccard_neardup",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id1, id2, common,
           CAST(sa.n AS BIGINT) AS n1, CAST(sb.n AS BIGINT) AS n2,
           common * 1.0 / (sa.n + sb.n - common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.id1 = sa.doc_id
    JOIN sizes sb ON p.id2 = sb.doc_id
    WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8
    """,
    tags=("extension", "dedup"),
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.8) over
    df-capped shingles (df ≤ MAX_SHINGLE_DF).

    The ground-truth variant: explode shingles → df-cap → self-join →
    count. The cap bounds the self-join's per-shingle fan-out (the
    uncapped form is quadratic on a hot shingle — the r3 scale flag);
    the LSH variant below remains the 100 TB discovery path."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF)


@register(
    "prefix_filter_jaccard_join",
    # The oracle is the UNCAPPED exact-Jaccard pair relation — prefix
    # filtering is an exact algorithm (recall 1 by the AllPairs prefix
    # theorem), so its output must EQUAL the naive self-join's, unlike
    # the df-capped variant (changed semantics) or LSH (miss probability).
    oracle=f"""
    WITH {_SQL_SHINGLES_EXACT},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id1, id2, common,
           CAST(sa.n AS BIGINT) AS n1, CAST(sb.n AS BIGINT) AS n2,
           common * 1.0 / (sa.n + sb.n - common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.id1 = sa.doc_id
    JOIN sizes sb ON p.id2 = sb.doc_id
    WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8
    """,
    tags=("extension", "dedup"),
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.8 near-dup pairs via PREFIX FILTERING
    (AllPairs/PPJoin): shingles ranked by ascending global df, candidate
    join restricted to each doc's first |S|−⌈0.8|S|⌉+1 shingles, exact
    verify after. The third point of the dedup design space — exact AND
    scale-bounded (hot shingles sort out of every prefix), vs the
    df-capped exact join (changed semantics) and MinHash-LSH
    (~1e-6 miss). Oracle: the uncapped naive self-join."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # Cleanup note: the operator's ``out`` contract serves LOOP callers
    # (e.g. the incremental-neardup foreachBatch, which unpersists per
    # trigger). A registered plan is one-shot and must return a LAZY
    # DataFrame — it cannot unpersist without losing the multi-consumer
    # cache DURING execution — so repeated-execution harnesses own the
    # cleanup instead (bench.py clears the session cache between query
    # loops; Spark's LRU eviction bounds a single run).
    return prefix_filter_jaccard_pairs(docs, threshold_num=4, threshold_den=5)


@register(
    "dedup_clusters",
    # DuckDB replays the iterative label propagation as a recursive-CTE
    # transitive closure over the SAME exact-jaccard pair relation:
    # label(n) = min reachable node id — identical fixpoint, so the
    # cluster assignment is fully oracle-checked despite the Spark side
    # being an iterative (non-single-SQL) algorithm.
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    pairs AS (SELECT id1, id2
              FROM cand
              JOIN sizes sa ON cand.id1 = sa.doc_id
              JOIN sizes sb ON cand.id2 = sb.doc_id
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
    edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              UNION SELECT id2, id1 FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS node, least(u, min(v)) AS label
               FROM reach GROUP BY u)
    SELECT d.doc_id,
           CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS cluster_id,
           CAST(count(*) OVER (PARTITION BY coalesce(l.label, d.doc_id)) AS BIGINT)
             AS cluster_size
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
    """,
    tags=("extension", "dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assignment: exact-jaccard near-dup pairs →
    connected components (iterative min-label propagation,
    operators/graph.py) → every doc labeled with its component's min
    doc_id + cluster size. ``doc_id = cluster_id`` is the canonical
    keep-one-per-cluster dedup filter — pairs alone can't express it
    (a~b~c must collapse to ONE survivor even though (a,c) is no pair)."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF).select(
        "id1", "id2"
    )
    return dedup_cluster_assignment(docs, pairs)


@register(
    "minhash_lsh_neardup",
    oracle=None,  # xxhash64 signatures are engine-specific; tests pin
    # this against ngram_jaccard_neardup (exact recall check)
    tags=("extension", "dedup", "lsh"),
)
def minhash_lsh_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) candidates, verified with exact
    Jaccard ≥ 0.8 — the scale path: shuffle volume O(docs·bands), never
    all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_neardup(docs, threshold=0.8)


@register(
    "minhash_recall_vs_exact",
    # The oracle is the UNCAPPED exact-Jaccard pair relation: the LSH
    # path's verified output must EQUAL it (banding miss probability at
    # j≥0.8 with b=8,r=2 is <2e-6 — see minhash_lsh_neardup). A missed
    # pair shows up as a driver hash mismatch, so this row certifies the
    # MinHash+LSH family's recall, not just its row count.
    oracle=f"""
    WITH {_SQL_SHINGLES_EXACT},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id1, id2, common,
           CAST(sa.n AS BIGINT) AS n1, CAST(sb.n AS BIGINT) AS n2,
           common * 1.0 / (sa.n + sb.n - common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.id1 = sa.doc_id
    JOIN sizes sb ON p.id2 = sb.doc_id
    WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8
    """,
    tags=("extension", "dedup", "lsh"),
)
def minhash_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs graded against the EXACT relation.

    `minhash_lsh_neardup` itself is rows-only (xxhash64 signatures are
    engine-specific), but its exact-verified OUTPUT is engine-neutral:
    candidates that survive the exact-Jaccard verify step are precisely
    the true pairs, minus any pair all 8 bands missed. Registering the
    LSH path against the exact-pairs oracle turns the local recall
    pytest into a driver-certified hash match."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_neardup(docs, threshold=0.8)


@register(
    "simhash_signatures",
    oracle=None,  # xxhash64-based signature, engine-specific
    tags=("extension", "dedup", "simhash"),
)
def simhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 64-bit SimHash (bitwise majority over shingle hashes) +
    near-dup pairs at Hamming ≤ 7 found via byte-band pigeonholing."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash_table(docs).withColumnsRenamed({"id": "doc_id", "sig": "simhash"})
    pairs = simhash_neardup(docs, max_hamming=3)
    # publish signatures joined with each doc's near-dup degree
    deg = (
        pairs.select(F.col("id1").alias("doc_id"))
        .unionByName(pairs.select(F.col("id2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_neardups"))
    )
    return sigs.join(deg, "doc_id", "left").fillna(0, ["n_neardups"])


# Exact brute-force cosine top-10 for query vectors vec_id < 8 — the
# oracle for embedding_cosine_topk AND the three ANN recall certificates
# (each ANN family at its exhaustive setting must reproduce this relation
# bit-for-bit).
_SQL_EXACT_COSINE_TOPK = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.cand_id,
             round(list_dot_product(q.qv, c.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))),
                   6) AS cosine
      FROM c CROSS JOIN q
      WHERE c.cand_id <> q.query_id
    )
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """


@register(
    "embedding_cosine_topk",
    oracle=_SQL_EXACT_COSINE_TOPK,
    tags=("extension", "similarity"),
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 8 query vectors over the corpus —
    the exact ANN baseline. Query side broadcast; dot product is a
    codegen'd fold over array<float> cast to double (bit-identical to the
    oracle's list_dot_product); ranking on the 6dp-rounded score with id
    tiebreak is cross-engine deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(queries, emb, k=10)


@register(
    "embedding_lsh_topk",
    oracle=None,  # approximate: bucket contents are scheme-specific;
    # tests measure recall against embedding_cosine_topk
    tags=("extension", "similarity", "lsh"),
)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection multi-probe ANN (4 hyperplanes → 16
    buckets, probing the home bucket + all Hamming-1 neighbors): only
    ~(1+p)/2^p of the corpus is scored — the 100 TB path.

    Bucketing runs as the JVM fold (zero Python workers). The Arrow-matmul
    variant (`vectorized_bucketing=True`) is marginally faster on a quiet
    host (0.75 s vs 1.08 s here) but round-2 driver benching showed the
    Python-worker fork/IPC path degrades ~12× under host co-load (9.1 s)
    while the fold degrades linearly like every JVM stage — on shared
    infrastructure predictable wins. The vectorized form remains the right
    call when corpus × planes is large enough that matmul dominates worker
    startup (it is re-benchmarked per corpus in tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_bucketed_topk(
        queries, emb, dim=64, k=10, planes=4, vectorized_bucketing=False
    )


@register(
    "lsh_recall_vs_exact",
    # Certificate row for the hyperplane-LSH family: at the EXHAUSTIVE
    # probe setting (probe_hamming = planes → every bucket probed) the
    # approximate pipeline must reproduce the exact brute-force top-k
    # relation bit-for-bit. Recall is 1.0 by construction IF the
    # implementation is right — any bucketing, probe-mask, scoring, or
    # tiebreak bug (e.g. r4's probe_hamming≥2 silently delivering H≤1)
    # breaks the driver hash. Production-parameter recall (H≤1) is pinned
    # by tests/test_similarity.py::test_lsh_ann_recall_vs_bruteforce.
    oracle=_SQL_EXACT_COSINE_TOPK,
    tags=("extension", "similarity", "lsh", "certificate"),
)
def lsh_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN graded against the exact cosine relation: full
    multi-probe (all 2^planes buckets) must equal brute-force top-k —
    the embedding-family analogue of minhash_recall_vs_exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_bucketed_topk(
        queries, emb, dim=64, k=10, planes=4, probe_hamming=4,
        vectorized_bucketing=False,
    )


@register(
    "ivf_recall_vs_exact",
    # Certificate row for the IVF family: probing ALL inverted lists
    # (nprobe = n_centroids) must equal brute-force top-k. Exercises
    # k-means training, centroid assignment, probe explode, and the
    # rank/tiebreak contract end-to-end against an engine-neutral oracle.
    # Production-parameter recall (nprobe=4/16) is pinned by
    # tests/test_similarity.py::test_ivf_recall_vs_bruteforce.
    oracle=_SQL_EXACT_COSINE_TOPK,
    tags=("extension", "similarity", "ivf", "certificate"),
)
def ivf_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN graded against the exact cosine relation: all-list probe
    must equal brute-force top-k."""
    from ecommerce_data_pipeline_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(queries, emb, n_centroids=16, nprobe=16, k=10)


@register(
    "pq_recall_vs_exact",
    # Certificate row for the PQ family: with the re-rank shortlist
    # covering the whole corpus, ADC ordering can exclude nothing and the
    # exact re-rank must reproduce brute-force top-k. Exercises codebook
    # training, the zero-shuffle projection encode, ADC lookup, and
    # re-rank against an engine-neutral oracle. Production-parameter
    # recall (rerank=50) is pinned by
    # tests/test_similarity.py::test_pq_recall_and_determinism.
    oracle=_SQL_EXACT_COSINE_TOPK,
    tags=("extension", "similarity", "pq", "certificate"),
)
def pq_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN graded against the exact cosine relation: corpus-wide
    re-rank shortlist must equal brute-force top-k."""
    from ecommerce_data_pipeline_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return pq_topk(
        queries, emb, dim=64, m=8, k_codes=16, k=10, rerank=1_000_000
    )


@register(
    "simhash_recall_certificate",
    # SimHash cannot carry an equality certificate: unlike MinHash-LSH
    # (miss prob < 2e-6 at j≥0.8), a true near-dup pair CAN legitimately
    # land > 7 signature bits apart (measured: 1 of 256 exact pairs at
    # sf0.1 shares no byte-band at all). What IS exact at every scale is
    # the pigeonhole theorem behind the banding: two 64-bit signatures
    # within Hamming distance ≤ 7 MUST agree on ≥ 1 of the 8 byte-bands,
    # so every exact-Jaccard pair whose signatures are ≤ 7 apart must be
    # emitted by simhash_neardup. This row certifies that theorem-backed
    # recall (n_pigeonhole_misses = 0 — r4's shared-sentinel bug was
    # exactly the class of defect this catches) alongside the
    # oracle-computed exact-pair count, so the row is non-trivial: the
    # shingle/Jaccard pipeline must agree cross-engine on n_exact_pairs.
    oracle=f"""
    WITH {_SQL_SHINGLES_EXACT},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    exact AS (SELECT id1, id2
              FROM pairs p
              JOIN sizes sa ON p.id1 = sa.doc_id
              JOIN sizes sb ON p.id2 = sb.doc_id
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8)
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           CAST(0 AS BIGINT) AS n_pigeonhole_misses
    FROM exact
    """,
    tags=("extension", "dedup", "simhash", "certificate"),
)
def simhash_recall_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding recall certificate: count exact-Jaccard(≥0.8)
    pairs, and assert zero of those within signature-Hamming ≤ 7 are
    missed by the byte-band candidate generation (pigeonhole: ≤7 bit
    flips cannot dirty all 8 bands). Pairs where a side has no signature
    (< 3 tokens → no shingles) carry no Hamming evidence and are outside
    the claim — they are equally invisible to any simhash pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    exact = jaccard_pairs(docs, threshold=0.8).select("id1", "id2")
    sigs = simhash_table(docs)
    s1 = sigs.select(F.col("id").alias("id1"), F.col("sig").alias("s1"))
    s2 = sigs.select(F.col("id").alias("id2"), F.col("sig").alias("s2"))
    covered = (
        exact.join(s1, "id1")
        .join(s2, "id2")
        .filter(F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))) <= 7)
        .select("id1", "id2")
    )
    found = simhash_neardup(docs, max_hamming=7).select("id1", "id2")
    misses = covered.join(found, ["id1", "id2"], "left_anti")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_missed = misses.agg(F.count(F.lit(1)).alias("n_pigeonhole_misses"))
    # two 1-row aggregates — the broadcast crossJoin is metadata-sized
    return n_exact.crossJoin(n_missed)


@register(
    "embedding_cosine_neardup",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                 6) AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                6) >= 0.35
    """,
    tags=("extension", "dedup", "similarity"),
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine ≥ 0.35), blocked by
    label — the semantic-dedup primitive. Blocking bounds the pair space
    (at scale: replace label with an LSH bucket)."""
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from ecommerce_data_pipeline_spark.operators.similarity import (
        spread_for_fanout,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = spread_for_fanout(
        emb.select(
            F.col("vec_id").alias("id1"), F.col("label").alias("l1"),
            F.col("embedding").alias("e1"),
        )
    ).withColumn("n1", l2_norm("e1"))
    b = emb.select(
        F.col("vec_id").alias("id2"), F.col("label").alias("l2"),
        F.col("embedding").alias("e2"), l2_norm("embedding").alias("n2"),
    )
    return (
        a.join(b, (F.col("l1") == F.col("l2")) & (F.col("id1") < F.col("id2")))
        .select(
            "id1",
            "id2",
            F.round(cosine_with_norms("e1", "e2", "n1", "n2"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


@register(
    "multimodal_features",
    # The fixture text is pure ASCII (verified: octet_length == length for
    # all rows), so DuckDB can replay the stubbed byte-level decode with
    # ord(substring(...)) per position — the mapInPandas path becomes
    # fully oracle-checked, not rows-only.
    oracle="""
    WITH b AS (
      SELECT doc_id, ord(substring(text, CAST(i AS INT), 1)) AS byte
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
    ),
    h AS (
      SELECT doc_id, byte // 16 AS bucket, count(*) AS c
      FROM b GROUP BY doc_id, byte // 16
    ),
    full_h AS (
      SELECT d.doc_id,
             array_to_string(list(coalesce(h.c, 0) ORDER BY g.bucket), ',')
               AS byte_histogram
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, 16)) AS bucket) g
      LEFT JOIN h ON h.doc_id = d.doc_id AND h.bucket = g.bucket
      GROUP BY d.doc_id
    ),
    s AS (SELECT doc_id, sum(byte) AS total, count(*) AS n FROM b GROUP BY doc_id)
    SELECT d.doc_id AS media_id,
           CAST(length(d.text) AS BIGINT) AS n_bytes,
           CAST(s.total AS DOUBLE) / s.n AS byte_mean,
           f.byte_histogram,
           CAST(16 + ord(substring(d.text, 1, 1)) % 64 AS INT) AS width,
           CAST(16 + ord(substring(d.text, length(d.text), 1)) % 64 AS INT)
             AS height
    FROM documents d
    JOIN full_h f USING (doc_id) JOIN s USING (doc_id)
    """,
    tags=("extension", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → binary payload table
    (opaque media + typed metadata) → Arrow-batched mapInPandas feature
    extraction (decode step stubbed, see operators/multimodal.py). The
    histogram array is CSV-serialized in the public projection so the
    output is scalar-only (driver canonicalizer contract)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "byte_mean",
        F.concat_ws(
            ",", F.transform("byte_histogram", lambda x: x.cast("string"))
        ).alias("byte_histogram"),
        "width",
        "height",
    )


@register(
    "embedding_ivf_topk",
    oracle=None,  # approximate (coarse-quantizer probing); tests measure
    # recall against embedding_cosine_topk
    tags=("extension", "similarity", "ivf"),
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (16 lists), nprobe=4 — each query
    scores ~1/4 of the corpus (operators/ivf.py). The second index family
    next to hyperplane LSH; on clustered real-world embeddings the probe
    fraction drops much further."""
    from ecommerce_data_pipeline_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(queries, emb, n_centroids=16, nprobe=4, k=10)


@register(
    "embedding_pq_topk",
    oracle=None,  # approximate (compressed-code ADC prefilter); tests
    # measure recall against embedding_cosine_topk
    tags=("extension", "similarity", "pq"),
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 64-dim vectors encode
    to 8 one-byte codes (32× compression — at 100 TB the scan/shuffle
    unit shrinks accordingly), ADC table-lookup prefilter, exact cosine
    re-rank of the top 50. The third ANN family next to hyperplane LSH
    and IVF; same output contract as embedding_cosine_topk."""
    from ecommerce_data_pipeline_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return pq_topk(queries, emb, dim=64, m=8, k_codes=16, k=10, rerank=50)


@register(
    "clean_corpus_pipeline",
    # End-to-end training-corpus cleaning, fully oracle-checked: the
    # recursive CTE replays the connected-components fixpoint, then the
    # same filter → keep-min-per-cluster → per-source rollup.
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    pairs AS (SELECT id1, id2
              FROM cand
              JOIN sizes sa ON cand.id1 = sa.doc_id
              JOIN sizes sb ON cand.id2 = sb.doc_id
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
    edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              UNION SELECT id2, id1 FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS node, least(u, min(v)) AS label
               FROM reach GROUP BY u),
    filtered AS (
      SELECT d.doc_id, d.source,
             coalesce(l.label, d.doc_id) AS cluster_id,
             len(t.ts) AS n_tokens
      FROM documents d
      JOIN tok t USING (doc_id)
      LEFT JOIN labels l ON d.doc_id = l.node
      WHERE d.lang = 'en' AND len(t.ts) BETWEEN 10 AND 1000
    ),
    kept AS (
      SELECT *, min(doc_id) OVER (PARTITION BY cluster_id) AS keeper
      FROM filtered
    )
    SELECT source,
           CAST(COUNT(*) FILTER (doc_id = keeper) AS BIGINT) AS docs_kept,
           CAST(COUNT(*) FILTER (doc_id <> keeper) AS BIGINT) AS docs_dropped_neardup,
           CAST(SUM(n_tokens) FILTER (doc_id = keeper) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY source
    """,
    tags=("extension", "dedup", "pipeline"),
)
def clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data cleaning pass as ONE composed plan:
    language filter → token-length bounds → near-dup cluster keep-one
    (connected components over exact-jaccard pairs, min-id survivor) →
    per-source yield report (docs kept/dropped, tokens kept).

    Composition notes at scale: clusters are computed over the FULL
    corpus (pair discovery must see cross-language/any-length dups),
    filters apply before the survivor choice, and the survivor is the
    min doc id among FILTERED members — all window/join algebra, no
    driver data paths beyond the CC change counter."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignment,
    )
    from ecommerce_data_pipeline_spark.operators.text import token_count
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF).select(
        "id1", "id2"
    )
    clusters = dedup_cluster_assignment(docs, pairs).select(
        "doc_id", "cluster_id"
    )
    filtered = (
        docs.filter(F.col("lang") == "en")
        .select("doc_id", "source", token_count("text").alias("n_tokens"))
        .filter(F.col("n_tokens").between(10, 1000))
        .join(clusters, "doc_id")
    )
    w = Window.partitionBy("cluster_id")
    kept = filtered.withColumn("keeper", F.min("doc_id").over(w))
    is_keeper = F.col("doc_id") == F.col("keeper")
    return kept.groupBy("source").agg(
        F.sum(F.when(is_keeper, 1).otherwise(0)).cast("bigint").alias("docs_kept"),
        F.sum(F.when(is_keeper, 0).otherwise(1))
        .cast("bigint")
        .alias("docs_dropped_neardup"),
        F.sum(F.when(is_keeper, F.col("n_tokens")))
        .cast("bigint")
        .alias("tokens_kept"),
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    m AS (SELECT label, pos, avg(val) AS m FROM ex GROUP BY label, pos)
    SELECT label,
           array_to_string(list(printf('%.6f', round(m, 6)) ORDER BY pos), ',')
             AS centroid,
           CAST(count(*) AS BIGINT) AS dim
    FROM m GROUP BY label
    """,
    tags=("extension", "similarity", "vector-agg"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector AGGREGATION surface: per-label centroid (dimension-wise
    mean) of the embedding column — the distributed building block under
    IVF training, class prototypes, and mean-pooling. posexplode →
    two-phase avg per (label, pos) → re-assemble ordered; the centroid
    serializes as fixed-format %.6f CSV (scalar-only public projection;
    fixed format because Spark's double→string cast uses scientific
    notation for small magnitudes while DuckDB's does not)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: F.format_string("%.6f", F.round(s["m"], 6)),
                ),
            ).alias("centroid"),
            F.count(F.lit(1)).alias("dim"),
        )
    )


@register(
    "embedding_standardize_by_label",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    stats AS (
      SELECT label, pos, avg(val) AS m, stddev_pop(val) AS sd
      FROM ex GROUP BY label, pos
    ),
    z AS (
      SELECT e.vec_id, e.label, e.pos,
             CASE WHEN s.sd > 0 THEN (e.val - s.m) / s.sd ELSE 0.0 END AS zv
      FROM ex e JOIN stats s ON e.label = s.label AND e.pos = s.pos
    )
    SELECT vec_id, label,
           array_to_string(list(printf('%.6f', round(zv, 6)) ORDER BY pos), ',')
             AS z_embedding
    FROM z GROUP BY vec_id, label
    """,
    tags=("extension", "similarity", "vector-agg"),
)
def embedding_standardize_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label z-score standardization of the embedding column — the
    feature-normalization step before clustering/IVF training when label
    strata have different scales. posexplode → per-(label,pos)
    mean/stddev_pop (one hash aggregate) → rejoin → reassemble ordered.
    Both shuffles key on (label,pos) — at 100 TB the stats side is tiny
    (labels × dim rows) and broadcasts back onto the exploded stream.
    Zero-variance positions standardize to 0. Fixed-format %.6f CSV
    serialization (scalar-only public projection; precedent:
    embedding_label_centroids)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    stats = ex.groupBy("label", "pos").agg(
        F.avg("val").alias("m"), F.stddev_pop("val").alias("sd")
    )
    z = ex.join(F.broadcast(stats), ["label", "pos"]).select(
        "vec_id",
        "label",
        "pos",
        F.when(F.col("sd") > 0, (F.col("val") - F.col("m")) / F.col("sd"))
        .otherwise(F.lit(0.0))
        .alias("zv"),
    )
    return z.groupBy("vec_id", "label").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "zv"))),
                lambda s: F.format_string("%.6f", F.round(s["zv"], 6)),
            ),
        ).alias("z_embedding")
    )


@register(
    "incremental_neardup_delta",
    oracle=None,  # xxhash64 banding is engine-specific; pinned against
    # the full-corpus run in tests/test_similarity.py (exact equality on
    # the delta-touching pair set)
    tags=("extension", "dedup", "incremental"),
)
def incremental_neardup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus growth: docs with doc_id % 7 == 0 arrive as a
    delta batch against the rest (whose MinHash signature store is
    already persisted from 'yesterday'). Emits only the near-dup pairs
    the delta introduces — banding cost O(delta·bands), base text
    touched only for exact-verify candidates
    (operators/similarity.py::incremental_neardup)."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        incremental_neardup,
        signature_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 7 != 0)
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    base_sigs = signature_store(base)
    return incremental_neardup(base_sigs, base, delta, threshold=0.8)


@register(
    "incremental_recall_vs_exact",
    # Same certificate pattern as minhash_recall_vs_exact, applied to the
    # INCREMENTAL path: the delta-batch run must reproduce the exact
    # Jaccard≥0.8 relation restricted to delta-touching pairs (banding
    # miss probability <2e-6 at b=8,r=2). This grades the two properties
    # the incremental contract promises — no pair the delta introduces is
    # missed, and no base×base pair is re-emitted — as a driver hash row.
    oracle=f"""
    WITH {_SQL_SHINGLES_EXACT},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id1, id2, common,
           CAST(sa.n AS BIGINT) AS n1, CAST(sb.n AS BIGINT) AS n2,
           common * 1.0 / (sa.n + sb.n - common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.id1 = sa.doc_id
    JOIN sizes sb ON p.id2 = sb.doc_id
    WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8
      AND (id1 % 7 = 0 OR id2 % 7 = 0)
    """,
    tags=("extension", "dedup", "incremental", "certificate"),
)
def incremental_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup graded against the exact delta-touching
    pair relation (see oracle comment). Same plan as
    ``incremental_neardup_delta`` — that entry stays rows-only for the
    raw signature store; this one converts its recall into hash-graded
    driver signal."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        incremental_neardup,
        signature_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 7 != 0)
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    base_sigs = signature_store(base)
    return incremental_neardup(base_sigs, base, delta, threshold=0.8)


@register(
    "text_containment_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id1, id2, common,
           CAST(sa.n AS BIGINT) AS n1, CAST(sb.n AS BIGINT) AS n2,
           round(common * 1.0 / sa.n, 6) AS containment_1_in_2,
           round(common * 1.0 / sb.n, 6) AS containment_2_in_1
    FROM pairs p
    JOIN sizes sa ON p.id1 = sa.doc_id
    JOIN sizes sb ON p.id2 = sb.doc_id
    WHERE greatest(common * 1.0 / sa.n, common * 1.0 / sb.n) >= 0.9
    """,
    tags=("extension", "dedup", "containment"),
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment |A∩B|/|A| ≥ 0.9 in either
    direction — catches a document verbatim-included in a larger one
    (quotes, concatenated crawls, benchmark leakage), which symmetric
    Jaccard dilutes below any usable threshold as the size ratio grows.
    Same shared-shingle join shape as jaccard_pairs (shuffle keys on the
    shingle, never all-pairs, df-capped at MAX_SHINGLE_DF); only the
    normalization differs."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        df_capped_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = df_capped_shingles(docs, max_df=MAX_SHINGLE_DF).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"id": "id1", "n": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n": "n2"}), "id2")
        .withColumn("containment_1_in_2", F.round(F.col("common") / F.col("n1"), 6))
        .withColumn("containment_2_in_1", F.round(F.col("common") / F.col("n2"), 6))
        .filter(
            F.greatest("containment_1_in_2", "containment_2_in_1") >= 0.9
        )
    )
    return out.select(
        "id1", "id2", "common",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        "containment_1_in_2", "containment_2_in_1",
    )


@register(
    "cross_lang_duplicate_leakage",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    neardup AS (
      SELECT id1, id2
      FROM pairs p
      JOIN sizes sa ON p.id1 = sa.doc_id
      JOIN sizes sb ON p.id2 = sb.doc_id
      WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8
    )
    SELECT d1.lang AS lang1, d2.lang AS lang2,
           count(*) AS n_pairs,
           CAST(count(*) FILTER (d1.lang <> d2.lang) AS BIGINT)
             AS n_cross_lang
    FROM neardup n
    JOIN documents d1 ON n.id1 = d1.doc_id
    JOIN documents d2 ON n.id2 = d2.doc_id
    GROUP BY d1.lang, d2.lang
    """,
    tags=("extension", "dedup", "quality"),
)
def cross_lang_duplicate_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs bucketed by (lang1, lang2) — the audit that shows
    WHY dedup must run before language filtering: duplicates crossing a
    language label (mislabeled or translated boilerplate) would survive
    any per-language pipeline. Pair discovery is the exact-jaccard
    relation; the lang attribution is two broadcast joins against the
    doc metadata."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF).select(
        "id1", "id2"
    )
    meta = docs.select("doc_id", "lang")
    return (
        pairs.join(
            F.broadcast(meta.withColumnsRenamed({"doc_id": "id1", "lang": "lang1"})),
            "id1",
        )
        .join(
            F.broadcast(meta.withColumnsRenamed({"doc_id": "id2", "lang": "lang2"})),
            "id2",
        )
        .groupBy("lang1", "lang2")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("lang1") != F.col("lang2")).cast("long")).alias(
                "n_cross_lang"
            ),
        )
    )


@register(
    "embedding_norm_outliers",
    oracle="""
    WITH n AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS norm
      FROM embeddings
    ),
    stats AS (
      SELECT label, avg(norm) AS mu, stddev_pop(norm) AS sigma
      FROM n GROUP BY label
    )
    SELECT n.vec_id, n.label,
           round(n.norm, 6) AS norm,
           round((n.norm - s.mu) / s.sigma, 6) AS zscore,
           abs(n.norm - s.mu) > 2 * s.sigma AS is_outlier
    FROM n JOIN stats s ON n.label = s.label
    """,
    tags=("extension", "similarity", "anomaly"),
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity gate: per-label norm z-scores with |z| > 2
    outlier flags — catches corrupt/degenerate vectors (truncated
    uploads, zero rows, scale bugs) before they enter an index. One
    codegen'd norm fold per row, per-label stats broadcast back."""
    from ecommerce_data_pipeline_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", "label", l2_norm("embedding").alias("norm"))
    stats = n.groupBy("label").agg(
        F.avg("norm").alias("mu"), F.stddev_pop("norm").alias("sigma")
    )
    return n.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.round("norm", 6).alias("norm"),
        F.round((F.col("norm") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
        (F.abs(F.col("norm") - F.col("mu")) > 2 * F.col("sigma")).alias(
            "is_outlier"
        ),
    )


@register(
    "embedding_covariance_top_pairs",
    oracle="""
    WITH ex AS (
      SELECT vec_id, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    stats AS (
      SELECT a.pos AS pos_i, b.pos AS pos_j,
             round(covar_pop(a.val, b.val), 6) AS cov,
             round(corr(a.val, b.val), 4) AS corr
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos < b.pos
      GROUP BY a.pos, b.pos
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY abs(cov) DESC, pos_i, pos_j)
               AS rnk
      FROM stats
    )
    SELECT pos_i, pos_j, cov, corr, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 25
    """,
    tags=("extension", "similarity", "vector-agg"),
)
def embedding_covariance_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance of the embedding dimensions: the top-25
    most-covarying (i, j) pairs with covariance and Pearson correlation —
    the Gram/covariance building block under PCA whitening, redundancy
    audits (near-duplicate dimensions ⇒ wasted index width), and
    anisotropy checks before cosine retrieval.

    Shape: posexplode each vector once (rows × d), self-join on vec_id
    with pos_i < pos_j (rows × d²/2 pair terms — at d = 64 that is 2016
    cells; co-partitioned on vec_id so the fan-out never crosses the
    network), then ONE map-side-combined hash aggregate down to d²/2
    result cells; covar_pop/corr partials are mergeable sums. Ranking is
    on the ROUNDED covariance with (pos_i, pos_j) tiebreak so the top-25
    cut is identical across engines. At larger d the same plan holds
    with a row-sample sketch feeding it (covariance concentrates at
    O(1/√n)); the d² cell count, not the corpus, is the output size."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    a, b = ex.alias("a"), ex.alias("b")
    stats = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(
            F.col("a.pos").alias("pos_i"), F.col("b.pos").alias("pos_j")
        )
        .agg(
            F.round(F.covar_pop(F.col("a.val"), F.col("b.val")), 6).alias("cov"),
            F.round(F.corr(F.col("a.val"), F.col("b.val")), 4).alias("corr"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.abs(F.col("cov")).desc(), "pos_i", "pos_j")
    return (
        stats.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
        .select("pos_i", "pos_j", "cov", "corr", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "embedding_filtered_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, label, embedding::DOUBLE[] AS cv
          FROM embeddings),
    scored AS (
      SELECT q.query_id, c.cand_id,
             round(list_dot_product(q.qv, c.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cosine
      FROM c JOIN q ON c.label = q.qlabel AND c.cand_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
    tags=("extension", "similarity", "ann"),
)
def embedding_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-FILTERED similarity search: top-10 cosine neighbors
    restricted to candidates sharing the query's label — the filtered-ANN
    problem (RAG retrieval with a tenant/category/ACL predicate). The
    filter composes INTO the join, not after it: scoring joins on the
    label key, so only same-label candidates are ever scored (post-filter
    top-k would under-fill k; pre-filter at the index level is the
    standard answer, and relationally the label IS the join key — the
    per-label partitions are exactly an IVF-by-metadata layout). Ranking
    on the 6dp-rounded cosine with id tiebreak, the cosine_topk
    determinism contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from pyspark.sql import Window

    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        l2_norm("embedding").alias("qn"),
    )
    from ecommerce_data_pipeline_spark.operators.similarity import (
        spread_for_fanout,
    )

    c = spread_for_fanout(
        emb.select(
            F.col("vec_id").alias("cand_id"),
            "label",
            F.col("embedding").alias("cv"),
        )
    ).withColumn("cn", l2_norm("cv"))
    scored = c.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel"))
        & (F.col("cand_id") != F.col("query_id")),
    ).select(
        "query_id",
        "cand_id",
        F.round(cosine_with_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "cand_id", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH ex AS (
      SELECT vec_id, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    rng AS (
      SELECT pos, min(val) AS vmin, max(val) AS vmax,
             greatest((max(val) - min(val)) / 255.0, 1e-12) AS scale
      FROM ex GROUP BY pos
    ),
    err AS (
      SELECT ex.pos,
             abs(ex.val - (rng.vmin + round((ex.val - rng.vmin) / rng.scale)
                                       * rng.scale)) AS aerr
      FROM ex JOIN rng USING (pos)
    )
    SELECT err.pos,
           round(r.vmin, 6) AS vmin,
           round(r.vmax, 6) AS vmax,
           round(r.scale, 9) AS scale,
           round(avg(err.aerr), 9) AS avg_abs_err,
           round(max(err.aerr), 9) AS max_abs_err
    FROM err JOIN rng r USING (pos)
    GROUP BY err.pos, r.vmin, r.vmax, r.scale
    """,
    tags=("extension", "similarity", "compression"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding column
    with reconstruction-error audit: min/max range per dimension →
    255-step code grid → per-dim mean/max absolute reconstruction error.
    The 4× index-compression step (and its acceptance report) that
    precedes shipping a vector index; dimensions whose max error is an
    outlier want per-dim or PQ treatment instead.

    Shape: posexplode once; per-pos min/max is one map-side-combined
    aggregate (d rows), broadcast back onto the exploded stream for the
    error pass — two linear scans, no pairwise anything. The quantized
    code is round((v-min)/scale): same half-away-from-zero rounding on
    both engines; error stats rounded for cross-engine float summation."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    rng = ex.groupBy("pos").agg(
        F.min("val").alias("vmin"),
        F.max("val").alias("vmax"),
        F.greatest(
            (F.max("val") - F.min("val")) / 255.0, F.lit(1e-12)
        ).alias("scale"),
    )
    recon = F.col("vmin") + F.round(
        (F.col("val") - F.col("vmin")) / F.col("scale"), 0
    ) * F.col("scale")
    err = ex.join(F.broadcast(rng), "pos").withColumn(
        "aerr", F.abs(F.col("val") - recon)
    )
    return err.groupBy("pos", "vmin", "vmax", "scale").agg(
        F.round(F.avg("aerr"), 9).alias("avg_abs_err"),
        F.round(F.max("aerr"), 9).alias("max_abs_err"),
    ).select(
        "pos",
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        F.round("scale", 9).alias("scale"),
        "avg_abs_err",
        "max_abs_err",
    )


@register(
    "dedup_yield_curve",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    pairs AS (SELECT id1, id2,
                     common * 1.0 / (sa.n + sb.n - common) AS jaccard
              FROM cand
              JOIN sizes sa ON cand.id1 = sa.doc_id
              JOIN sizes sb ON cand.id2 = sb.doc_id
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.70),
    th AS (SELECT 0.70 + 0.05 * g AS threshold
           FROM generate_series(0, 5) AS t(g))
    SELECT CAST(round(th.threshold, 2) AS DOUBLE) AS threshold,
           CAST(count(p.id1) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT p.id2) AS BIGINT) AS n_docs_droppable
    FROM th LEFT JOIN pairs p ON p.jaccard >= th.threshold
    GROUP BY th.threshold
    """,
    tags=("extension", "dedup", "tuning"),
)
def dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup THRESHOLD sweep in one pass: for jaccard thresholds
    0.70–0.95 (step 0.05), how many pairs fire and how many documents
    become droppable (distinct higher-id member — the keep-min-id
    greedy). The tuning curve a curator reads before committing to a
    dedup threshold: the knee separates true duplicates from the
    near-miss cloud.

    One df-capped pair materialization (jaccard ≥ the loosest threshold)
    serves every point on the curve — the sweep is a 6-row broadcast
    range join over the already-tiny pair relation, so exploring 6
    thresholds costs the same shuffle work as scoring one."""
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, threshold=0.70, max_df=MAX_SHINGLE_DF
    ).select("id1", "id2", "jaccard")
    th = spark.range(6).select(
        F.round(0.70 + 0.05 * F.col("id"), 2).alias("threshold")
    )
    return (
        broadcast(th)
        .join(pairs, pairs["jaccard"] >= th["threshold"], "left")
        .groupBy("threshold")
        .agg(
            F.count("id1").alias("n_pairs"),
            F.count_distinct("id2").alias("n_docs_droppable"),
        )
    )


# Sign-grid bucket shared by semantic_dedup_pairs and its oracle:
# bucket b = Σ 2^i · [e_i ≥ 0] over the first `bits` dimensions. DuckDB
# lists are 1-indexed, Spark arrays 0-indexed — same element, same sign
# test. The REGISTERED queries run at the module default (6 bits = 64
# orthants — right for the sf0.01/sf0.1 corpora and frozen into their
# static oracle strings); at scale, callers size the grid from the
# corpus via ``sign_grid_bits`` — each extra bit halves expected bucket
# population, keeping the within-bucket all-pairs join ~linear in N.
_SIGN_GRID_BITS = 6


def sign_grid_bits(
    n_vectors: int,
    target_bucket_rows: int = 1024,
    min_bits: int = _SIGN_GRID_BITS,
    max_bits: int = 24,
) -> int:
    """Choose the orthant-grid width from corpus size: bits ≈
    log2(N / target_bucket_rows), clamped. Expected within-bucket pair
    volume is then Σ C(n_b, 2) ≈ N · target/2 — linear in N, not
    O(N²/2^bits) with a fixed grid. ``max_bits`` must not exceed the
    embedding dimension (sign bits beyond it don't exist); 24 covers
    any realistic embedding width."""
    import math

    if n_vectors <= target_bucket_rows:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(n_vectors / target_bucket_rows))))


def _sql_sign_bucket(bits: int) -> str:
    return " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )


def _sign_bucket_col(bits: int, col: str = "embedding"):
    """The Spark twin of ``_sql_sign_bucket``: one codegen'd projection.

    NULL-safe per bit: an index past the array end contributes 0 (the
    same semantics the SQL twin's CASE gives a NULL comparison), so
    bits > dim degrades to an effective min(bits, dim)-bit grid instead
    of NULLing every bucket and silently emptying the pair join.
    ``F.get`` (not ``[]``): ANSI mode makes out-of-bounds indexing THROW,
    get() returns NULL, which the coalesce then folds to bit 0."""
    bucket = None
    for i in range(bits):
        bit = (
            F.coalesce(F.get(F.col(col), i) >= 0, F.lit(False)).cast("int")
            * (1 << i)
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


_SQL_SIGN_BUCKET = _sql_sign_bucket(_SIGN_GRID_BITS)


def semantic_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    bits: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-orthant-blocked exact-cosine near-dup pairs — the
    parameterized operator behind ``semantic_dedup_pairs``. ``bits=None``
    sizes the grid from the corpus row count (one cheap count job; at
    100 TB pass the catalog's row count instead). Returns
    (id1, id2, bucket, cosine) with id1 < id2 and cosine ≥ threshold."""
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )

    from ecommerce_data_pipeline_spark.operators.similarity import (
        spread_for_fanout,
    )

    if bits is None:
        # one tiny job for both sizing inputs; clamp the grid to the
        # embedding dimension — sign bits beyond it don't exist, and an
        # unclamped grid would (before the NULL-safe bucket fix) have
        # NULLed every bucket on narrow embeddings
        stats = emb.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.size("embedding")).alias("dim"),
        ).first()
        bits = sign_grid_bits(
            stats["n"], max_bits=min(24, int(stats["dim"] or 24))
        )
    # norm once per VECTOR (interpreted HOF fold), not once per pair side;
    # the pair join below then runs a single fold per comparison. The
    # STREAM side is spread first (broadcast-join parallelism follows the
    # streamed side — see spread_for_fanout) so bucket/norm projection and
    # the per-pair scoring fold run across all cores.
    v = emb.select(F.col(id_col).alias("vec_id"), "embedding")
    a = (
        spread_for_fanout(
            v.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
        )
        .withColumn("bucket", _sign_bucket_col(bits, "e1"))
        .withColumn("n1", l2_norm("e1"))
    )
    b = v.select(
        F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"),
        _sign_bucket_col(bits, "e2").alias("bucket2"),
        l2_norm("e2").alias("n2"),
    )
    return (
        a.join(b, (F.col("bucket") == F.col("bucket2")) & (F.col("id1") < F.col("id2")))
        .select(
            "id1", "id2", "bucket",
            F.round(cosine_with_norms("e1", "e2", "n1", "n2"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@register(
    "semantic_dedup_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      {_SQL_SIGN_BUCKET} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           CAST(a.bucket AS INT) AS bucket,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                 6) AS cosine
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                6) >= 0.35
    """,
    tags=("extension", "dedup", "similarity"),
)
def semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs with DETERMINISTIC
    data-independent blocking: vectors agreeing on the sign of their
    first 6 dimensions (a 64-cell hypercube-orthant grid) are compared
    exactly; cross-bucket pairs are never materialized.

    Unlike ``embedding_cosine_neardup`` (label-blocked — needs metadata)
    this is the metadata-free scale path: the bucket is one codegen'd
    projection, the self-join shuffles both sides on the 6-bit key, and
    per-bucket fan-out is corpus/64 on average (add bits to subdivide —
    each extra sign bit halves expected bucket population, the same
    knob as LSH planes). Sign-agreement blocking is exact-oracle-able
    (unlike k-means cells): the recall contract is 'pairs within one
    orthant', which for near-duplicate vectors (cosine → 1) is almost
    always satisfied since a near-dup pair differs in few coordinates.

    The registered entry pins ``bits=_SIGN_GRID_BITS`` because its
    oracle string is frozen at registration; scale callers use
    ``semantic_neardup_pairs`` directly (bits=None → sized from corpus
    count, see ``sign_grid_bits``).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_neardup_pairs(emb, threshold=0.35, bits=_SIGN_GRID_BITS)


@register(
    "multimodal_chunk_dedup",
    # Payload bytes are the UTF-8 text (pure-ASCII fixture), so DuckDB
    # replays the binary chunk checksum as sha256 over the VARCHAR
    # prefix — same 64 bytes, same digest.
    oracle="""
    WITH chunks AS (
      SELECT doc_id, lower(sha256(substr(text, 1, 64))) AS chunk_sha
      FROM documents
    )
    SELECT chunk_sha,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS keeper_id,
           array_to_string(list_sort(list(doc_id)), ',') AS member_ids
    FROM chunks
    GROUP BY chunk_sha
    HAVING count(*) >= 2
    """,
    tags=("extension", "dedup", "multimodal"),
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level binary dedup over the multimodal payload column: the
    first fixed-size chunk (64 bytes — a stand-in for a content-defined
    chunk boundary) is hashed and payloads sharing a chunk digest are
    grouped into keeper + members. This is the CDC/storage-dedup shape
    for 100 TB media lakes: hashing is a per-row projection, the only
    shuffle is the hash-keyed groupBy, and the digest (32 bytes) — not
    the payload — is what moves. Groups are serialized as a sorted CSV
    of ids (same convention as collect_set_agg) for engine-neutral
    hashing."""
    media = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    chunk_sha = F.sha2(F.substring(F.col("payload"), 1, 64), 256)
    return (
        media.select(F.col("media_id").alias("doc_id"), chunk_sha.alias("chunk_sha"))
        .groupBy("chunk_sha")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias(
                "member_ids"
            ),
        )
        .filter(F.col("n_copies") >= 2)
    )


_HEX = "0123456789abcdef"
# 60-bit value of md5 digest column ``h`` as a digit polynomial (DuckDB
# has no conv(hex,16,10); value parity with Spark's conv — see
# plans/sketches.py::_poly_from_hex).
_SQL_H_POLY = " + ".join(
    f"(strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "leakage_safe_split",
    # Recursive-CTE transitive closure over the SAME capped exact-jaccard
    # pair relation as dedup_clusters, then the split is hashed from the
    # CLUSTER id (md5-poly, engine-portable) — every member of a near-dup
    # cluster lands in the same split by construction.
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    pairs AS (SELECT id1, id2
              FROM cand
              JOIN sizes sa ON cand.id1 = sa.doc_id
              JOIN sizes sb ON cand.id2 = sb.doc_id
              WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
    edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              UNION SELECT id2, id1 FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS node, least(u, min(v)) AS label
               FROM reach GROUP BY u),
    assigned AS (
      SELECT d.doc_id,
             CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS cluster_id
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
    ),
    hashed AS (
      SELECT doc_id, cluster_id,
             md5('split#' || CAST(cluster_id AS VARCHAR)) AS h
      FROM assigned
    )
    SELECT doc_id, cluster_id,
           CAST(({_SQL_H_POLY}) % 100 AS BIGINT) AS bucket,
           CASE WHEN ({_SQL_H_POLY}) % 100 < 80 THEN 'train'
                WHEN ({_SQL_H_POLY}) % 100 < 90 THEN 'validation'
                ELSE 'test' END AS split
    FROM hashed
    """,
    tags=("extension", "dedup", "ml-prep"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation/test split that CANNOT leak near-duplicates
    across splits: documents are first clustered by near-dup connected
    components (capped exact-jaccard pairs → min-label propagation),
    then the 80/10/10 assignment hashes the CLUSTER id, so every member
    of a duplicate cluster — including transitive a~b~c chains where
    (a,c) is not itself a pair — moves as one unit. Hashing the doc id
    instead (hash_split_train_test) is the classic eval-contamination
    bug: a test document's near-twin trains the model.

    Scale: the split adds one per-row projection on top of the cluster
    assignment (itself banded/capped + iterative label propagation); no
    new shuffle — and the assignment is stable under incremental corpus
    growth as long as cluster min-ids persist (pair with
    incremental_neardup_delta's signature store at 100 TB)."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignment,
    )
    from ecommerce_data_pipeline_spark.plans.sketches import _hash60

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF).select(
        "id1", "id2"
    )
    assigned = dedup_cluster_assignment(docs, pairs).select("doc_id", "cluster_id")
    bucket = (_hash60(F.col("cluster_id"), "split#") % 100).alias("bucket")
    return assigned.select("doc_id", "cluster_id", bucket).select(
        "doc_id",
        "cluster_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.when(F.col("bucket") < 80, F.lit("train"))
        .when(F.col("bucket") < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "embedding_pca_project",
    oracle=None,  # eigh has no SQL twin; tests pin variance ordering,
    # orthonormality, centering, and layout-independence instead
    tags=("extension", "similarity", "hygiene"),
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 PCA projection of the embedding corpus (whitening /
    anisotropy-correction prep): the d×d covariance is aggregated
    distributively (driver collect bounded by d², never rows — see
    operators/pca.py), eigh runs driver-side on 64×64, and the
    projection is a broadcast-literal dot per component — a pure linear
    scan. Full-corpus covariance here (fixture scale); at 100 TB the
    hash-ordered 100k sample is the default path."""
    from ecommerce_data_pipeline_spark.operators.pca import (
        pca_project,
        train_pca,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = train_pca(emb, k=4, max_train_rows=None)
    return pca_project(emb, model)


@register(
    "pca_variance_certificate",
    # Certificate pattern (cf. sketch_error_certificate): eigh itself has
    # no SQL twin, but its INVARIANTS do. total_variance is computed by
    # BOTH engines from raw data (Spark per-dim var_pop sum vs DuckDB
    # unnest+var_pop sum — a cross-engine check of the whole
    # posexplode→covariance aggregation path), and the booleans assert
    # the eigendecomposition against that measured value: Σλ = trace,
    # λ nonincreasing, eigenvector rows orthonormal, and — the property
    # a user of PCA actually relies on — the projected corpus has
    # per-component variance λ_j and zero cross-component covariance.
    # Tolerances are ≥1e3× the observed float noise (~1e-12); any real
    # defect flips a boolean → driver hash mismatch.
    oracle="""
    SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
           (SELECT CAST(max(len(embedding)) AS INT) FROM embeddings) AS dim,
           round((SELECT sum(v) FROM (
                    SELECT var_pop(val) AS v FROM (
                      SELECT generate_subscripts(embedding, 1) AS i,
                             unnest(embedding) AS val
                      FROM embeddings) GROUP BY i)), 4) AS total_variance,
           TRUE AS trace_matches_total_var,
           TRUE AS eigvals_nonincreasing,
           TRUE AS components_orthonormal,
           TRUE AS projection_var_matches_eigvals,
           TRUE AS projections_decorrelated
    """,
    tags=("extension", "similarity", "hygiene", "certificate", "eager"),
)
def pca_variance_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA accuracy certificate, making the eigh-based training
    (operators/pca.py — driver collect bounded by d², never rows)
    driver-gradable: the exact total variance is recomputed independently
    by both engines, and the spectrum/projection invariants are asserted
    within tolerance as booleans (see oracle comment). The projection
    checks run CLUSTER-side over the full corpus (one var/covar hash
    aggregate on the 4 projected components)."""
    import numpy as np

    from ecommerce_data_pipeline_spark.operators.pca import (
        PCAModel,
        pca_project,
        train_pca,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = train_pca(emb, k=64, max_train_rows=None)  # full spectrum
    evals = np.array(model.explained_variance)
    comps = np.array(model.components)
    tol = 1e-6 * float(evals[0])
    nonincreasing = bool(np.all(np.diff(evals) <= 1e-12))
    orthonormal = bool(
        np.abs(comps @ comps.T - np.eye(model.dim)).max() <= 1e-9
    )
    # project on the top-4 axes and measure component variance/covariance
    sub = PCAModel(
        dim=model.dim,
        k=4,
        mean=model.mean,
        components=model.components[:4],
        explained_variance=model.explained_variance[:4],
    )
    proj = pca_project(emb, sub, round_dp=9)
    pcs = [f"pc{j}" for j in range(1, 5)]
    stats = proj.agg(
        *[F.var_pop(c).alias(f"var_{c}") for c in pcs],
        *[
            F.covar_pop(a, b).alias(f"cov_{a}_{b}")
            for i, a in enumerate(pcs)
            for b in pcs[i + 1 :]
        ],
    ).first()
    var_ok = all(
        abs(stats[f"var_{c}"] - evals[j]) <= tol for j, c in enumerate(pcs)
    )
    decorr_ok = all(
        abs(stats[f"cov_{a}_{b}"]) <= tol
        for i, a in enumerate(pcs)
        for b in pcs[i + 1 :]
    )
    # cross-engine column: per-dim var_pop summed, same math as the oracle
    ex = emb.select(F.posexplode("embedding").alias("pos", "val"))
    pervar = ex.groupBy("pos").agg(
        F.var_pop(F.col("val").cast("double")).alias("v")
    )
    counts = emb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.max(F.size("embedding")).alias("dim"),
    )
    total = pervar.agg(F.round(F.sum("v"), 4).alias("total_variance"))
    # trace bound: 5e-5 rounding slack on the 4dp column + ample noise margin
    return (
        counts.crossJoin(F.broadcast(total))  # 1-row × 1-row
        .select(
            "n_vectors",
            "dim",
            "total_variance",
            (
                F.abs(F.lit(float(evals.sum())) - F.col("total_variance"))
                <= F.lit(1e-3)
            ).alias("trace_matches_total_var"),
            F.lit(nonincreasing).alias("eigvals_nonincreasing"),
            F.lit(orthonormal).alias("components_orthonormal"),
            F.lit(var_ok).alias("projection_var_matches_eigvals"),
            F.lit(decorr_ok).alias("projections_decorrelated"),
        )
    )


@register(
    "ivf_probe_recall_curve",
    oracle=None,  # k-means centroids are engine-specific; pytest pins
    # recall monotonicity in nprobe and the exact-at-full-probe limit
    tags=("extension", "similarity", "tuning"),
)
def ivf_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: recall@10 against brute-force cosine as a
    function of ``nprobe`` (1..4 of 8 centroids), from ONE pipeline.

    The ANN counterpart of ``dedup_yield_curve``: before committing a
    probe budget, a retrieval team reads where recall flattens. All
    probe depths share one centroid training, one corpus assignment and
    one scored-candidate relation (each candidate keeps the RANK of the
    probe that found it), and the exact baseline is computed once. A
    candidate found at probe_rank r is visible to every depth > r, so
    each scored row EXPLODES into its visible depths (≤4-fold, bounded
    fan-out) and ONE (query, depth)-partitioned window ranks all four
    curves simultaneously — one window pass, one semi-join, one
    aggregate for the whole curve (the per-depth-loop form ran 4 of
    each). Scored-fraction is reported alongside recall: the
    recall/cost trade IS the curve's point."""
    from ecommerce_data_pipeline_spark.operators.ivf import (
        _nearest_centroids,
        train_centroids,
    )
    from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from pyspark.sql import Window

    K, N_CENT, MAX_PROBE = 10, 8, 4
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    # single consumer since the one-window rewrite (one semi-join), so no
    # checkpoint: lazy composition lets the whole curve run as one job
    # (the checkpoint this replaced cost ~2 s of eager materialization)
    exact = cosine_topk(queries, emb, k=K).select("query_id", "cand_id")

    from ecommerce_data_pipeline_spark.operators.similarity import (
        spread_for_fanout,
    )

    centroids = train_centroids(emb, N_CENT)
    assigned = (
        spread_for_fanout(
            emb.select(
                F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
            )
        )
        .withColumn("cn", l2_norm("cv"))
        .withColumn(
            "list_id",
            _nearest_centroids("cv", centroids, 1).getItem(0),
        )
    )
    q_probes = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm("embedding").alias("qn"),
        F.posexplode(
            _nearest_centroids("embedding", centroids, MAX_PROBE)
        ).alias("probe_rank", "list_id"),
    )
    scored = (
        assigned.join(F.broadcast(q_probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            "probe_rank",
            F.round(cosine_with_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
        .localCheckpoint()
    )
    n_corpus = emb.count()
    n_q = queries.count()
    # candidate found at probe_rank r → visible at depths r+1..MAX_PROBE
    by_depth = scored.select(
        "query_id",
        "cand_id",
        "cosine",
        F.explode(
            F.sequence(F.col("probe_rank") + 1, F.lit(MAX_PROBE))
        ).alias("nprobe"),
    )
    frac = by_depth.groupBy("nprobe").agg(
        F.round(F.count(F.lit(1)) / F.lit(float(n_q * n_corpus)), 4).alias(
            "scored_fraction"
        )
    )
    w = Window.partitionBy("query_id", "nprobe").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    topk = (
        by_depth.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
        .select("query_id", "cand_id", "nprobe")
    )
    hits = topk.join(exact, ["query_id", "cand_id"], "left_semi")
    recall = hits.groupBy("nprobe").agg(
        F.round(F.count(F.lit(1)) / F.lit(float(n_q * K)), 4).alias(
            "recall_at_10"
        )
    )
    # left from frac (every depth has candidates: rank-0 finds feed all
    # depths) so a zero-recall depth still emits its row
    return frac.join(F.broadcast(recall), "nprobe", "left").select(
        F.col("nprobe").cast("int").alias("nprobe"),
        F.coalesce("recall_at_10", F.lit(0.0)).alias("recall_at_10"),
        "scored_fraction",
    )


@register(
    "semantic_dedup_keeplist",
    # The recursive CTE replays the connected-components fixpoint over
    # the SAME sign-orthant cosine pair relation as semantic_dedup_pairs
    # — the embedding-space mirror of clean_corpus_pipeline's oracle.
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e, {_SQL_SIGN_BUCKET} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                  6) >= 0.35
    ),
    edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              UNION SELECT id2, id1 FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS node, least(u, min(v)) AS label
               FROM reach GROUP BY u)
    SELECT emb.vec_id,
           CAST(coalesce(l.label, emb.vec_id) AS BIGINT) AS cluster_id,
           CAST(count(*) OVER (PARTITION BY coalesce(l.label, emb.vec_id)) AS BIGINT)
             AS cluster_size,
           (coalesce(l.label, emb.vec_id) = emb.vec_id) AS is_keeper
    FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.node
    """,
    tags=("extension", "dedup", "similarity", "pipeline"),
)
def semantic_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end: sign-orthant-blocked cosine near-dup pairs →
    connected components → every vector labeled with its cluster and a
    keep/drop verdict (min-id survivor per semantic cluster). The
    embedding-space mirror of clean_corpus_pipeline, fully
    oracle-checked including the transitive a~b~c collapse that pairwise
    output alone cannot express. Scale shape: the pair relation is
    orthant-bounded (semantic_dedup_pairs), label propagation is
    iterative min-label with localCheckpoint rounds (operators/graph.py),
    and the final labeling is one broadcast-size join back."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignment,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = semantic_dedup_pairs(spark, sf_dir).select("id1", "id2")
    assigned = dedup_cluster_assignment(
        emb, pairs, id_col="vec_id"
    ).withColumnsRenamed({"doc_id": "vec_id"})
    return assigned.select(
        "vec_id",
        "cluster_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("cluster_id") == F.col("vec_id")).alias("is_keeper"),
    )


@register(
    "embedding_drift_by_label",
    oracle="""
    WITH ex AS (
      SELECT label, vec_id % 2 AS half, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    m AS (SELECT label, half, pos, avg(val) AS m
          FROM ex GROUP BY label, half, pos),
    j AS (
      SELECT a.label, a.pos, a.m AS m0, b.m AS m1
      FROM m a JOIN m b ON a.label = b.label AND a.pos = b.pos
      WHERE a.half = 0 AND b.half = 1
    ),
    n AS (SELECT label,
                 count(DISTINCT vec_id) FILTER (vec_id % 2 = 0) AS n0,
                 count(DISTINCT vec_id) FILTER (vec_id % 2 = 1) AS n1
          FROM embeddings GROUP BY label)
    SELECT j.label,
           CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
           round(sqrt(sum((m0 - m1) * (m0 - m1))), 6) AS centroid_l2_drift,
           round(sum(m0 * m1)
                 / (sqrt(sum(m0 * m0)) * sqrt(sum(m1 * m1))), 6)
             AS centroid_cosine
    FROM j JOIN n ON j.label = n.label
    GROUP BY j.label, n.n0, n.n1
    """,
    tags=("extension", "similarity", "monitoring"),
)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the L2 distance
    and cosine between the centroids of two corpus halves (vec_id
    parity as the batch-split proxy — in production: before/after an
    encoder redeploy). A silently drifting encoder shifts centroids long
    before retrieval metrics notice; this is the cheap canary.

    Shape: posexplode → per-(label, half, pos) mean (two-phase agg) →
    pos-aligned self-join of the two d-length centroid relations →
    per-label fold to two scalars. Everything aggregates to
    labels × d cells before any join — corpus rows never meet each
    other, so the plan is a linear scan plus metadata-sized joins."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "val"),
    )
    m = ex.groupBy("label", "half", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    a = m.filter(F.col("half") == 0).select(
        "label", "pos", F.col("m").alias("m0")
    )
    b = m.filter(F.col("half") == 1).select(
        F.col("label").alias("label_b"), F.col("pos").alias("pos_b"),
        F.col("m").alias("m1"),
    )
    j = a.join(
        b,
        (F.col("label") == F.col("label_b")) & (F.col("pos") == F.col("pos_b")),
    )
    n = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)).alias("n1"),
    )
    drift = j.groupBy("label").agg(
        F.round(
            F.sqrt(F.sum((F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1")))),
            6,
        ).alias("centroid_l2_drift"),
        F.round(
            F.sum(F.col("m0") * F.col("m1"))
            / (
                F.sqrt(F.sum(F.col("m0") * F.col("m0")))
                * F.sqrt(F.sum(F.col("m1") * F.col("m1")))
            ),
            6,
        ).alias("centroid_cosine"),
    )
    return drift.join(n, "label").select(
        "label",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        "centroid_l2_drift",
        "centroid_cosine",
    )


@register(
    "embedding_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neg_id, label AS nlabel,
                 embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neg_id, c.nlabel AS neg_label,
             round(list_dot_product(q.qv, c.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))),
                   6) AS cosine
      FROM c JOIN q ON c.nlabel <> q.qlabel
    )
    SELECT query_id, neg_id, neg_label, cosine, rnk FROM (
      SELECT query_id, neg_id, neg_label, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neg_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    tags=("extension", "similarity", "ml-prep"),
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the 5
    most-similar vectors with a DIFFERENT label — the negatives that
    actually teach a bi-encoder something (random negatives are too easy
    and the gradient dies; see filtered-ANN's inverse: there the filter
    keeps the label, here it excludes it). The label predicate composes
    INTO the scoring join, so same-label candidates are never scored;
    ranking follows the cosine_topk contract (6dp, id tiebreak). At
    corpus scale the query side broadcasts and the scan is one pass —
    swap in lsh/ivf bucketing for the candidate generation exactly as in
    the ANN family when brute force stops paying."""
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        l2_norm("embedding").alias("qn"),
    )
    from ecommerce_data_pipeline_spark.operators.similarity import (
        spread_for_fanout,
    )

    c = spread_for_fanout(
        emb.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.col("embedding").alias("cv"),
        )
    ).withColumn("cn", l2_norm("cv"))
    scored = c.join(
        F.broadcast(q), F.col("neg_label") != F.col("qlabel")
    ).select(
        "query_id",
        "neg_id",
        "neg_label",
        F.round(cosine_with_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neg_id", "neg_label", "cosine", "rnk")
    )


@register(
    "knn_label_vote",
    # Deterministic end-to-end: the neighbor set follows the cosine_topk
    # contract (6dp rounding, id tiebreak) and the vote tie-break is
    # (votes desc, label asc), so both engines reproduce the exact same
    # predictions.
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                      label AS true_label
               FROM embeddings WHERE vec_id < 16),
    c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
                 label AS cand_label FROM embeddings),
    scored AS (
      SELECT q.query_id, c.cand_id, c.cand_label,
             round(list_dot_product(q.qv, c.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cosine
      FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
    ),
    knn AS (SELECT query_id, cand_label FROM (
      SELECT query_id, cand_label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored) WHERE rnk <= 10),
    votes AS (SELECT query_id, cand_label, count(*) AS n_votes
              FROM knn GROUP BY 1, 2),
    pred AS (SELECT query_id, cand_label AS predicted_label, n_votes FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, cand_label) AS r
      FROM votes) WHERE r = 1)
    SELECT p.query_id, t.true_label, p.predicted_label,
           CAST(p.n_votes AS BIGINT) AS n_votes,
           (t.true_label = p.predicted_label) AS correct
    FROM pred p
    JOIN (SELECT vec_id AS query_id, label AS true_label
          FROM embeddings WHERE vec_id < 16) t USING (query_id)
    """,
    tags=("extension", "similarity", "classification"),
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification over the embedding corpus: each
    query's 10 nearest neighbors (exact cosine, cosine_topk contract)
    vote with their labels; ties break (votes desc, label asc). The
    weak-label assignment / eval-probe step of embedding hygiene —
    ranking and voting are both one window pass over the queries×k
    relation; the corpus-sized work is exactly the cosine_topk scan,
    and the label join touches only the k·|queries| winner rows (swap in
    the IVF/LSH candidate generation at scale, as with the ANN family)."""
    from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 16)
    nn = cosine_topk(
        q.select("vec_id", "embedding"),
        emb.select("vec_id", "embedding"),
        k=10,
    )
    labels = emb.select("vec_id", "label")
    votes = (
        nn.join(
            labels.withColumnsRenamed(
                {"vec_id": "cand_id", "label": "cand_label"}
            ),
            "cand_id",
        )
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("cand_label")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "query_id",
            F.col("cand_label").alias("predicted_label"),
            "n_votes",
        )
    )
    truth = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "true_label",
        "predicted_label",
        "n_votes",
        (F.col("true_label") == F.col("predicted_label")).alias("correct"),
    )


@register(
    "mmr_diverse_topk",
    # Exact twin of the greedy MMR selection as a DuckDB RECURSIVE CTE
    # (precedent: semantic_dedup_keeplist's recursive-CTE fixpoint twin).
    # Cross-engine determinism: relevance and pairwise sims are both
    # 6dp-rounded with identical accumulation order, every argmax ties
    # on cand_id, and lambda = 0.5 keeps both weights EXACT doubles
    # (1 − 0.7 ≠ 0.3 in IEEE arithmetic — a 0.7/0.3 split would compute
    # different last-ulp scores in the two engines and could flip ties).
    oracle="""
    WITH RECURSIVE
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 16),
    c0 AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
           FROM embeddings),
    cand AS (
      SELECT query_id, cand_id, cv, rel FROM (
        SELECT q.query_id, c0.cand_id, c0.cv,
               round(list_dot_product(q.qv, c0.cv)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c0.cv, c0.cv))), 6) AS rel,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(q.qv, c0.cv)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c0.cv, c0.cv))), 6) DESC,
                          c0.cand_id) AS rnk
        FROM c0 CROSS JOIN q WHERE c0.cand_id <> q.query_id) WHERE rnk <= 20),
    mmr AS (
      SELECT query_id, [cand_id] AS chosen, 1 AS step
      FROM (SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, cand_id) AS r
            FROM cand) WHERE r = 1
      UNION ALL
      SELECT m.query_id,
             list_append(m.chosen, (
               SELECT c.cand_id FROM cand c
               WHERE c.query_id = m.query_id
                 AND NOT list_contains(m.chosen, c.cand_id)
               ORDER BY 0.5 * c.rel - 0.5 * (
                   SELECT max(round(list_dot_product(c.cv, c2.cv)
                         / (sqrt(list_dot_product(c.cv, c.cv))
                            * sqrt(list_dot_product(c2.cv, c2.cv))), 6))
                   FROM cand c2
                   WHERE c2.query_id = m.query_id
                     AND list_contains(m.chosen, c2.cand_id)
                 ) DESC, c.cand_id
               LIMIT 1)),
             m.step + 1
      FROM mmr m WHERE m.step < 5
    )
    SELECT query_id, CAST(generate_subscripts(chosen, 1) AS INT) AS mmr_rank,
           unnest(chosen) AS cand_id
    FROM mmr WHERE step = 5
    """,
    tags=("extension", "similarity", "diversity", "grouped-map"),
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-5 from each query's top-20
    cosine pool (lambda = 0.5) — the diversity sampler for
    retrieval-augmented training batches (operators/similarity.py::
    mmr_rerank: corpus-sized work is the cosine_topk scan; the greedy
    selection is a grouped-map batch bounded by the pool size)."""
    from ecommerce_data_pipeline_spark.operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding")
    return mmr_rerank(
        q, emb.select("vec_id", "embedding"), k=5, pool=20, lam=0.5
    )


# Truncated-dimension exact top-10 (cosine over the first d coordinates,
# same 6dp/id-tiebreak contract), joined against the full-dim top-10 —
# one UNION ALL branch per prefix width.
_SQL_MATRYOSHKA = " UNION ALL ".join(
    f"""
    SELECT {d} AS dims,
           CAST(count(*) AS BIGINT) AS matched,
           CAST((SELECT count(*) FROM full_topk) AS BIGINT) AS total
    FROM (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.cand_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(q.qv[1:{d}], c.cv[1:{d}])
                     / (sqrt(list_dot_product(q.qv[1:{d}], q.qv[1:{d}]))
                        * sqrt(list_dot_product(c.cv[1:{d}], c.cv[1:{d}]))), 6)
                   DESC, c.cand_id) AS rnk
        FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
      ) WHERE rnk <= 10
    ) t JOIN full_topk f USING (query_id, cand_id)
    """
    for d in (16, 32, 64)
)


@register(
    "matryoshka_recall_curve",
    # Matryoshka-representation-learning eval (Kusupati et al. 2022):
    # how much of the exact top-10 survives truncating the embedding to
    # its first d coordinates — the measurement behind "can we serve
    # 16-dim vectors and rerank with 64". Both engines compute exact
    # truncated and full top-10 sets under the shared 6dp/id-tiebreak
    # contract; recall is a ratio of the same integers, so the double
    # divides identically.
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    full_topk AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.cand_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(q.qv, c.cv)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(c.cv, c.cv))), 6)
                   DESC, c.cand_id) AS rnk
        FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
      ) WHERE rnk <= 10
    )
    SELECT dims, matched, total,
           round(matched * 1.0 / total, 6) AS recall_at_10
    FROM ({_SQL_MATRYOSHKA})
    ORDER BY dims
    """,
    tags=("extension", "similarity", "hygiene", "tuning"),
)
def matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of prefix-truncated embeddings (16/32/64 dims) against
    the full-dimension exact top-10 — ONE persisted full-topk relation
    joined by three truncated rankings. Each truncated ranking is the
    same broadcast-scan shape as cosine_topk over a sliced vector, so
    the corpus cost is 3 extra linear scans, not new pair volume; at
    serving scale the curve says which prefix width the ANN index can
    store (MRL-style) before rerank recall pays."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    corpus = emb.select("vec_id", "embedding")
    full = (
        cosine_topk(q, corpus, k=10)
        .select("query_id", "cand_id")
        .localCheckpoint()  # 3 join consumers; 80 rows
    )
    total = full.count()
    parts = []
    for d in (16, 32, 64):
        trunc = cosine_topk(
            q.select("vec_id", F.slice("embedding", 1, d).alias("embedding")),
            corpus.select(
                "vec_id", F.slice("embedding", 1, d).alias("embedding")
            ),
            k=10,
        ).select("query_id", "cand_id")
        parts.append(
            trunc.join(full, ["query_id", "cand_id"]).agg(
                F.lit(d).alias("dims"),
                F.count(F.lit(1)).alias("matched"),
                F.lit(total).alias("total"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "dims",
        "matched",
        "total",
        F.round(F.col("matched") * F.lit(1.0) / F.col("total"), 6).alias(
            "recall_at_10"
        ),
    )


@register(
    "dedup_quality_survivor",
    # Survivorship policy: within each near-dup cluster keep the doc
    # with the MOST tokens (most complete copy), tie-break min doc_id —
    # instead of the min-id keeper clean_corpus_pipeline uses. Token
    # count is an exact integer, so the argmax has zero float-tie risk
    # cross-engine. Same recursive-CTE transitive closure as the
    # leakage_safe_split oracle over the capped exact-jaccard pairs.
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES_CAPPED},
    cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    prs AS (SELECT id1, id2
            FROM cand
            JOIN sizes sa ON cand.id1 = sa.doc_id
            JOIN sizes sb ON cand.id2 = sb.doc_id
            WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
    edges AS (SELECT id1 AS u, id2 AS v FROM prs
              UNION SELECT id2, id1 FROM prs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    lbl AS (SELECT u AS node, least(u, min(v)) AS label
            FROM reach GROUP BY u),
    assigned AS (
      SELECT d.doc_id,
             CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS cluster_id,
             CAST(length(list_filter({_SQL_TOKENS}, t -> t <> ''))
                  AS INT) AS n_tokens
      FROM documents d LEFT JOIN lbl l ON d.doc_id = l.node
    )
    SELECT doc_id, cluster_id, n_tokens,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_tokens DESC, doc_id) = 1)
             AS is_survivor
    FROM assigned
    """,
    tags=("extension", "dedup", "survivorship"),
)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based dedup survivorship: every document gets its near-dup
    cluster id and a keep/drop verdict where the KEPT copy is the
    longest (token count, tie min id) — the curation policy when
    duplicates differ by truncation or boilerplate stripping and "first
    id wins" would keep the worst copy. One window over the
    cluster-assigned relation; cluster assignment itself is the banded/
    capped pair join + iterative min-label CC (operators/graph.py)."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        dedup_cluster_assignment,
    )
    from ecommerce_data_pipeline_spark.operators.text import token_count
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.8, max_df=MAX_SHINGLE_DF).select(
        "id1", "id2"
    )
    assigned = dedup_cluster_assignment(docs, pairs).select(
        "doc_id", "cluster_id"
    )
    with_q = assigned.join(
        docs.select("doc_id", token_count("text").alias("n_tokens")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return with_q.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random-projection distortion certificate.
# The ±1 sign matrix (Achlioptas 2003 — database-friendly JL: entries in
# {±1} preserve the JL guarantee) is derived from md5 parity at PLAN
# BUILD time in Python, then emitted as LITERALS into both the Spark
# expressions and the oracle SQL — the two engines share the exact
# projection by construction, with zero runtime hashing.
_JL_K = 8  # projected dimensions (from the corpus's 64)
_JL_D = 64


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"jl1#{j}#{i}".encode()).hexdigest()[:15], 16
            )
            % 2
            == 0
            else -1
            for i in range(_JL_D)
        ]
        for j in range(_JL_K)
    ]


_JL_SIGNS = _jl_signs()
_SQL_JL_ROWS = [
    "[" + ", ".join(f"{s}.0" for s in row) + "]" for row in _JL_SIGNS
]
_SQL_JL_PROJ = (
    "["
    + ", ".join(
        f"list_dot_product(embedding, {row})" for row in _SQL_JL_ROWS
    )
    + "]"
)
_SQL_JL_PD2 = "list_aggregate([" + ", ".join(
    f"(a.proj[{j + 1}] - b.proj[{j + 1}]) * (a.proj[{j + 1}] - b.proj[{j + 1}])"
    for j in range(_JL_K)
) + "], 'sum')"


@register(
    "jl_projection_certificate",
    oracle=f"""
    WITH e64 AS (
      -- DuckDB's list_dot_product ACCUMULATES IN FLOAT32 on FLOAT[]
      -- inputs (~1e-7 relative error — measured; large enough to flip
      -- integer-micro rounding). Promote once; Spark's fold casts each
      -- element to DOUBLE inside zip_with.
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
      FROM embeddings
    ),
    pr AS (
      SELECT vec_id,
             {_SQL_JL_PROJ} AS proj,
             list_dot_product(embedding, embedding) AS nn,
             embedding
      FROM e64
    ),
    pairs AS (
      SELECT a.vec_id AS id1,
             (a.nn - 2 * list_dot_product(a.embedding, b.embedding)) + b.nn
               AS orig_d2,
             {_SQL_JL_PD2} AS proj_d2
      FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1
    ),
    micro AS (
      SELECT CAST(round(proj_d2 / ({_JL_K}.0 * orig_d2) * 1000000, 0)
                  AS BIGINT) AS m
      FROM pairs WHERE orig_d2 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(SUM(m) / 1000000.0 / COUNT(*), 6) AS mean_ratio,
           round(MIN(m) / 1000000.0, 6) AS min_ratio,
           round(MAX(m) / 1000000.0, 6) AS max_ratio,
           round(SUM(CASE WHEN abs(m - 1000000) <= 300000 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS frac_within_30pct
    FROM micro
    """,
    tags=("extension", "similarity", "certificate"),
)
def jl_projection_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-preservation certificate for a 64→8 Achlioptas ±1
    random projection: for every consecutive-id vector pair, the ratio
    of projected to original squared L2 distance (scaled by 1/k, whose
    expectation is exactly 1), aggregated to mean/min/max and the
    fraction within ±30% — the check a pipeline runs before swapping
    the cheap projected distance in as an ANN pre-filter
    (embedding_pca_project is the data-dependent counterpart; JL is
    data-OBLIVIOUS, so it needs no training pass and composes with
    streaming ingest).

    Scale shape: the projection is a per-row map (k dot products
    against broadcast-literal sign rows), the evaluation pairs come
    from an equi-join on vec_id+1 (linear, not all-pairs), and the
    certificate aggregates ORDER-INDEPENDENT integers: each ratio is
    rounded to integer micros per pair, so the global SUM/MIN/MAX are
    exact whatever the partitioning — no sorted-fold needed (the
    unigram_logprob trick does not scale to one global row; this
    does).

    Engine parity: the sign matrix is generated from md5 parity in
    Python at plan-build time and inlined as literals in BOTH engines;
    dot products fold in index order (zip_with+aggregate vs
    list_dot_product, the embedding_cosine_topk precedent), and the
    ratio is rounded to 6dp micros before any aggregation.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def dot_lit(row):
        arr = "array(" + ", ".join(f"CAST({s} AS DOUBLE)" for s in row) + ")"
        return (
            f"aggregate(zip_with(embedding, {arr}, (x, y) ->"
            " CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        )

    pr = emb.select(
        "vec_id",
        F.array(*[F.expr(dot_lit(row)) for row in _JL_SIGNS]).alias("proj"),
        F.expr(
            "aggregate(zip_with(embedding, embedding, (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("nn"),
        "embedding",
    )
    a, b = pr.alias("a"), pr.alias("b")
    dab = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    pd2 = F.expr(
        "aggregate(zip_with(a.proj, b.proj, (x, y) ->"
        " (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + 1
    ).select(
        ((F.col("a.nn") - 2 * dab) + F.col("b.nn")).alias("orig_d2"),
        pd2.alias("proj_d2"),
    )
    micro = pairs.filter(F.col("orig_d2") > 0).select(
        F.round(
            F.col("proj_d2") / (F.lit(float(_JL_K)) * F.col("orig_d2"))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("m")
    )
    return micro.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.sum("m") / 1000000.0 / F.count(F.lit(1)), 6).alias(
            "mean_ratio"
        ),
        F.round(F.min("m") / 1000000.0, 6).alias("min_ratio"),
        F.round(F.max("m") / 1000000.0, 6).alias("max_ratio"),
        F.round(
            F.sum(
                F.when(F.abs(F.col("m") - 1000000) <= 300000, 1).otherwise(0)
            )
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("frac_within_30pct"),
    )


# ---------------------------------------------------------------------------
# MinHash band-tuning curve (r7): pick (bands, rows) from DATA, not folklore.

# (bands, rows-per-band) design points spanning the practical S-curve
# family: b·r = signature length 8..128.
_BAND_CONFIGS: tuple[tuple[int, int], ...] = (
    (4, 2),
    (8, 4),
    (16, 4),
    (8, 8),
    (16, 8),
    (32, 4),
)

# Detection probability of an LSH banding scheme at a pair similarity s
# is 1-(1-s^r)^b. Evaluated at each similarity-bin MIDPOINT in PYTHON at
# import time and baked as the SAME literal into the Spark constant
# relation and the oracle's VALUES list — cross-engine pow() last-ulp
# drift cannot exist when neither engine computes the pow.
_BAND_GRID: list[tuple[int, int, int, float, float]] = [
    (
        b,
        r,
        s_bin,
        round((s_bin + 0.5) / 20.0, 6),
        round(1.0 - (1.0 - ((s_bin + 0.5) / 20.0) ** r) ** b, 6),
    )
    for (b, r) in _BAND_CONFIGS
    for s_bin in range(1, 20)
]

_SQL_BAND_GRID = ", ".join(
    f"({b}, {r}, {s_bin}, {s_mid!r}, {p!r})"
    for (b, r, s_bin, s_mid, p) in _BAND_GRID
)


@register(
    "minhash_band_tuning_curve",
    # The observed pair-similarity histogram is the df-capped exact
    # Jaccard relation (same CTE as ngram_jaccard_neardup) at floor 0.05,
    # binned at 0.05 width; detection probabilities are import-time
    # Python constants shared verbatim by both engines (see _BAND_GRID).
    # floor(jaccard*20) is the same IEEE double op on both sides, so the
    # binning is bit-identical.
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jac AS (
      SELECT common * 1.0 / (sa.n + sb.n - common) AS jaccard
      FROM pairs p
      JOIN sizes sa ON p.id1 = sa.doc_id
      JOIN sizes sb ON p.id2 = sb.doc_id
      WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.05
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(jaccard * 20) AS INT), 19) AS s_bin,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM jac GROUP BY 1
    ),
    grid(b, r, s_bin, s_mid, p_detect) AS (VALUES {_SQL_BAND_GRID})
    SELECT CAST(g.b AS INT) AS b, CAST(g.r AS INT) AS r,
           CAST(g.s_bin AS INT) AS s_bin,
           CAST(g.s_mid AS DOUBLE) AS s_mid,
           c.n_pairs,
           CAST(g.p_detect AS DOUBLE) AS p_detect,
           round(c.n_pairs * g.p_detect, 4) AS expected_hits
    FROM binned c JOIN grid g USING (s_bin)
    """,
    tags=("extension", "dedup", "lsh", "tuning"),
)
def minhash_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding design curve, evaluated against the corpus's OWN pair
    similarity distribution: for each candidate (bands, rows) scheme and
    each 0.05-wide similarity bin, the number of observed pairs in the
    bin and the scheme's analytic detection probability at the bin
    midpoint — expected candidate volume per scheme falls straight out
    (expected_hits), which is how you pick b/r so the S-curve knee sits
    at your dedup threshold instead of guessing. Pipeline: the df-capped
    exact-Jaccard pair relation (bounded fan-out — the same scale story
    as ngram_jaccard_neardup), one hash-agg histogram (≤19 rows), and a
    broadcast join against a 114-row constant grid. Everything after the
    pair relation is metadata-scale."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.05, max_df=MAX_SHINGLE_DF)
    counts = (
        pairs.select(
            F.least(F.floor(F.col("jaccard") * 20), F.lit(19))
            .cast("int")
            .alias("s_bin")
        )
        .groupBy("s_bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    grid = spark.createDataFrame(
        _BAND_GRID, "b int, r int, s_bin int, s_mid double, p_detect double"
    )
    return counts.join(F.broadcast(grid), "s_bin").select(
        "b",
        "r",
        "s_bin",
        "s_mid",
        "n_pairs",
        "p_detect",
        F.round(F.col("n_pairs") * F.col("p_detect"), 4).alias(
            "expected_hits"
        ),
    )
