"""Recall/agreement tests for the LSH-accelerated dedup and ANN operators
(the rows-only queries): each is pinned against its exact counterpart.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample,
)
from ecommerce_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    jaccard_pairs,
    lsh_bucketed_topk,
    minhash_lsh_neardup,
    simhash_neardup,
)
from ecommerce_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def _pairs(df):
    return {(r["id1"], r["id2"]) for r in df.select("id1", "id2").collect()}


def test_minhash_lsh_matches_exact_jaccard(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = _pairs(jaccard_pairs(docs, threshold=0.8))
    lsh = _pairs(minhash_lsh_neardup(docs, threshold=0.8))
    assert exact, "expected planted near-dup pairs in the fixture"
    # LSH candidates are verified with exact jaccard → no false positives
    assert lsh <= exact
    # at j≥0.9 with b=4,r=4 the per-pair miss prob < 0.3%; the planted
    # fixture pairs are all ≥0.9 → expect full recall
    recall = len(lsh) / len(exact)
    assert recall == 1.0, f"LSH recall {recall} < 1.0 ({exact - lsh} missed)"


def test_simhash_finds_planted_neardups(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = _pairs(jaccard_pairs(docs, threshold=0.8))
    sim = _pairs(simhash_neardup(docs).select("id1", "id2"))
    # 64-bit simhash at hamming<=7: high recall on planted j>=0.9 pairs,
    # and no false positives on this corpus (measured precision 1.0)
    assert len(sim & exact) >= len(exact) * 0.75
    assert len(sim - exact) <= 5


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(queries, emb, k=10).collect()
    approx = lsh_bucketed_topk(queries, emb, dim=64, k=10, planes=4).collect()
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact}
    approx_set = {(r["query_id"], r["cand_id"]) for r in approx}
    # bucketed search scores ~1/64 of the corpus; nearest neighbors
    # cluster in the query's bucket, so recall should be well above the
    # random-baseline ~1.6%
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.25, f"multi-probe ANN recall {recall} too low"
    # every approx result must be a genuine same-bucket neighbor of the query
    assert all(r["cosine"] is not None for r in approx)


def test_multimodal_feature_schema_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = attach_binary_payload(docs)
    feats1 = extract_features(media).orderBy("media_id").collect()
    feats2 = extract_features(media).orderBy("media_id").collect()
    assert [r.asDict() for r in feats1] == [r.asDict() for r in feats2]
    r = feats1[0]
    assert len(r["byte_histogram"]) == 16
    assert sum(r["byte_histogram"]) == r["n_bytes"]
    assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80


def test_frame_sample_shapes(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = attach_binary_payload(docs)
    frames = frame_sample(media, n_frames=4, frame_bytes=8).collect()
    for r in frames:
        assert len(r["frames"]) == 4
        assert all(f is not None and len(f) <= 8 for f in r["frames"])


def test_pandas_cosine_matches_jvm_fold(spark):
    """The NumPy/BLAS batch scorer returns exactly the JVM fold's top-k
    (same 6dp rounding + tiebreak contract)."""
    from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk_pandas

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    jvm = {(r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
           for r in cosine_topk(queries, emb, k=10).collect()}
    pnd = {(r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
           for r in cosine_topk_pandas(queries, emb, k=10).collect()}
    assert jvm == pnd


def test_pandas_cosine_nondefault_column_names(spark):
    """Regression (ADVICE r4): the batch fn indexed the caller's
    id_col/vec_col, but the corpus select aliases to fixed names — any
    non-default names raised KeyError in the Python worker."""
    from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk_pandas

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        F.col("vec_id").alias("doc_key"), F.col("embedding").alias("vec")
    )
    queries = emb.filter(F.col("doc_key") < 4)
    renamed = {(r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
               for r in cosine_topk_pandas(
                   queries, emb, k=5, id_col="doc_key", vec_col="vec"
               ).collect()}
    default = {(r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
               for r in cosine_topk(
                   queries.select(F.col("doc_key").alias("vec_id"),
                                  F.col("vec").alias("embedding")),
                   emb.select(F.col("doc_key").alias("vec_id"),
                              F.col("vec").alias("embedding")),
                   k=5,
               ).collect()}
    assert renamed == default


def test_ivf_recall_vs_bruteforce(spark):
    from ecommerce_data_pipeline_spark.operators.ivf import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {(r["query_id"], r["cand_id"])
             for r in cosine_topk(queries, emb, k=10).collect()}
    approx_rows = ivf_topk(queries, emb, n_centroids=16, nprobe=4, k=10).collect()
    approx = {(r["query_id"], r["cand_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # probing 4/16 lists of near-uniform vectors ≈ 25% baseline; nearest
    # neighbors correlate with the query's lists, so demand better
    assert recall >= 0.3, f"IVF recall {recall} too low"
    # determinism: same seed → same result
    again = {(r["query_id"], r["cand_id"])
             for r in ivf_topk(queries, emb, n_centroids=16, nprobe=4, k=10).collect()}
    assert approx == again


def test_lsh_bucket_pandas_matches_fold(spark):
    """The vectorized (Arrow matmul) bucketing must agree with the JVM
    fold on the fixture — same sign bits, same buckets. (A projection at
    exactly 0.0 could differ under BLAS reordering; none exists in the
    fixture, and bucket ids are approximation plumbing either way.)"""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        lsh_bucket,
        lsh_bucket_pandas,
        random_hyperplanes,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    hp = random_hyperplanes(64, 8, seed=42)
    fold = {
        r["vec_id"]: r["b"]
        for r in emb.select("vec_id", lsh_bucket("embedding", hp).alias("b")).collect()
    }
    pand = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", lsh_bucket_pandas("embedding", hp).alias("b")
        ).collect()
    }
    assert fold == pand


def test_connected_components_transitive_chain(spark):
    """a-b, b-c, c-d is ONE cluster labeled min(a); pair lists alone
    can't express this — the operator exists for exactly this case."""
    from ecommerce_data_pipeline_spark.operators.graph import (
        connected_components,
        dedup_cluster_assignment,
    )

    edges = spark.createDataFrame(
        [(2, 7), (7, 9), (9, 4), (11, 12), (20, 21), (21, 20)],
        ["id1", "id2"],
    )
    labels = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert labels == {2: 2, 7: 2, 9: 2, 4: 2, 11: 11, 12: 11, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i,) for i in (2, 4, 7, 9, 11, 12, 20, 21, 99)], ["doc_id"]
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_cluster_assignment(docs, edges).collect()
    }
    assert out[99] == (99, 1)  # singleton: own cluster
    assert out[4] == (2, 4) and out[9] == (2, 4)
    assert out[12] == (11, 2)
    # keep-one-per-cluster filter leaves exactly the min ids
    keep = sorted(d for d, (c, _) in out.items() if d == c)
    assert keep == [2, 11, 20, 99]


def test_connected_components_rejects_nonpositive_max_iter(spark):
    """Regression (ADVICE r4): max_iter<=0 left the non-convergence
    guard's `changed` unbound → NameError instead of a clear error."""
    import pytest

    from ecommerce_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], ["id1", "id2"])
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(edges, max_iter=0)


def test_pq_recall_and_determinism(spark):
    """PQ ADC + exact re-rank: recall@10 vs brute force, deterministic
    across invocations, and the exact-cosine contract means every
    (query, cand) pair PQ returns carries the same 6dp cosine as the
    brute-force path."""
    from ecommerce_data_pipeline_spark.operators.pq import pq_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact_rows = cosine_topk(queries, emb, k=10).collect()
    exact = {(r["query_id"], r["cand_id"]) for r in exact_rows}
    exact_cos = {(r["query_id"], r["cand_id"]): r["cosine"] for r in exact_rows}
    approx_rows = pq_topk(queries, emb, dim=64, m=8, k_codes=16, k=10, rerank=50).collect()
    approx = {(r["query_id"], r["cand_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # 8×16 codebooks on near-uniform 64-dim vectors is a hard regime for
    # PQ; the 50-candidate exact re-rank recovers most of the headroom
    assert recall >= 0.3, f"PQ recall {recall} too low"
    for r in approx_rows:
        key = (r["query_id"], r["cand_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]
    again = {(r["query_id"], r["cand_id"])
             for r in pq_topk(queries, emb, dim=64, m=8, k_codes=16, k=10, rerank=50).collect()}
    assert approx == again


def test_pq_training_collect_is_bounded(spark):
    """The codebook trainer must cap its driver-side collect regardless
    of corpus size (the 100 TB rule)."""
    from ecommerce_data_pipeline_spark.operators.pq import train_pq_codebooks

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = train_pq_codebooks(emb, dim=64, m=8, k_codes=16, max_train_rows=64)
    assert len(books) == 8
    assert all(len(b) <= 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)


def test_incremental_neardup_matches_full_run(spark):
    """The incremental (delta vs signature-store) near-dup must equal the
    full-corpus LSH run restricted to pairs touching the delta — same
    banding, same exact verification, no base×base pairs."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        incremental_neardup,
        minhash_lsh_neardup,
        signature_store,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter(F.col("doc_id") % 7 != 0)
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    delta_ids = {r[0] for r in delta.select("doc_id").collect()}
    full = minhash_lsh_neardup(docs, threshold=0.8).collect()
    expected = {
        (r["id1"], r["id2"], round(r["jaccard"], 9))
        for r in full
        if r["id1"] in delta_ids or r["id2"] in delta_ids
    }
    inc = incremental_neardup(
        signature_store(base), base, delta, threshold=0.8
    ).collect()
    got = {(r["id1"], r["id2"], round(r["jaccard"], 9)) for r in inc}
    assert got == expected
    assert all(
        r["id1"] in delta_ids or r["id2"] in delta_ids for r in inc
    )


def test_df_cap_bounds_pair_join_volume(spark):
    """The r3 scale flag: an uncapped shared-shingle self-join is quadratic
    on a hot shingle — a boilerplate footer shared by every document puts
    df = corpus_size on each of its shingles, and the join fans out df^2.
    df_capped_shingles bounds per-shingle fan-out at max_df, making join
    volume linear in corpus size (<= max_df * shingle_rows)."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        df_capped_shingles,
        shingle_sets,
    )

    footer = (
        " subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact support for help unsubscribe at any "
        "time privacy policy available on our website thank you"
    )
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    reps = spark.range(10).withColumnRenamed("id", "rep")
    # 10x corpus of DISTINCT documents (rep token breaks duplicate text)
    # all sharing the same boilerplate footer — the realistic hot-key case
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" marker"), F.col("rep"), F.lit(footer)
        ).alias("text"),
    )

    # self-join volume = sum over shingles of df^2
    def join_volume(sh):
        return (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.sum(F.col("df") * F.col("df")).alias("vol"),
                F.max("df").alias("max_df"),
                F.sum("df").alias("rows"),
            )
            .first()
        )

    K = 64
    un = join_volume(shingle_sets(big))
    cap = join_volume(df_capped_shingles(big, max_df=K))
    assert cap["max_df"] <= K
    assert cap["vol"] <= K * cap["rows"]  # linear-in-corpus bound
    # every shingle's df is >= 10 after 10x replication, so the uncapped
    # volume is >= 10x the shingle rows; the cap must bite hard
    assert cap["vol"] < un["vol"] / 5


def test_pq_training_sample_layout_independent(spark):
    """The r4 determinism fix: the bounded training sample must not
    depend on partition layout (a bare LIMIT does). Same codebooks from
    a 1-partition and a 7-partition view of the same corpus."""
    from ecommerce_data_pipeline_spark.operators.pq import train_pq_codebooks

    emb = load_table(spark, SF_SMOKE, "embeddings")
    b1 = train_pq_codebooks(emb.coalesce(1), dim=64, m=8, k_codes=8, max_train_rows=40)
    b7 = train_pq_codebooks(emb.repartition(7), dim=64, m=8, k_codes=8, max_train_rows=40)
    assert b1 == b7


def test_pca_axes_and_projection(spark):
    """Variance ordering, orthonormality, centering, and partition-layout
    independence of the PCA operator (oracle=None ⇒ pinned here)."""
    from ecommerce_data_pipeline_spark.operators.pca import pca_project, train_pca
    from ecommerce_data_pipeline_spark.sources.readers import load_table

    emb = load_table(spark, SF_CORRECT, "embeddings")
    model = train_pca(emb, k=3, max_train_rows=None)
    # eigenvalues descending, all non-negative
    ev = model.explained_variance
    assert ev[0] >= ev[1] >= ev[2] >= 0
    # components orthonormal
    import numpy as np

    W = np.asarray(model.components)
    gram = W @ W.T
    assert np.allclose(gram, np.eye(3), atol=1e-9)
    proj = pca_project(emb, model, round_dp=4).toPandas().sort_values("vec_id")
    # projections are centered: mean of each pc ≈ 0
    for j in (1, 2, 3):
        assert abs(proj[f"pc{j}"].mean()) < 1e-2
    # empirical variance of pc1 >= pc2 >= pc3 (matches eigenvalue order)
    v = [proj[f"pc{j}"].var(ddof=0) for j in (1, 2, 3)]
    assert v[0] >= v[1] >= v[2]
    # layout independence: same model + projections after repartition(7)
    model2 = train_pca(emb.repartition(7), k=3, max_train_rows=None)
    assert np.allclose(np.asarray(model2.components), W, atol=1e-8)
    proj2 = (
        pca_project(emb.repartition(5), model2, round_dp=4)
        .toPandas()
        .sort_values("vec_id")
    )
    assert np.allclose(
        proj[["pc1", "pc2", "pc3"]].to_numpy(),
        proj2[["pc1", "pc2", "pc3"]].to_numpy(),
        atol=1e-3,
    )


def test_ivf_probe_recall_curve_monotone(spark):
    """Recall@10 must be non-decreasing in nprobe, scored fraction must
    grow with probe depth, and max-probe recall must clear a real floor
    (measured 0.74 at nprobe=4/8 on the fixture — well above the 50%
    scored-fraction baseline; assert ≥0.6 to keep headroom for testdata
    regeneration)."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        ivf_probe_recall_curve,
    )

    rows = {
        r["nprobe"]: r
        for r in ivf_probe_recall_curve(spark, SF_CORRECT).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    rec = [rows[p]["recall_at_10"] for p in (1, 2, 3, 4)]
    assert rec == sorted(rec)
    frac = [rows[p]["scored_fraction"] for p in (1, 2, 3, 4)]
    assert frac == sorted(frac)
    assert rec[-1] >= 0.6


def test_simhash_excludes_shingleless_docs(spark):
    """Sub-3-token docs carry no shingle evidence: they must be absent
    from the signature table and NEVER pair as hamming-0 near-dups (the
    old fillna(0) sentinel made 'red shoe' ~ 'blue hat')."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        simhash_neardup,
        simhash_table,
    )

    docs = spark.createDataFrame(
        [(1, "red shoe"), (2, "blue hat"),
         (3, "a proper document with several tokens of content"),
         (4, "a proper document with several tokens of substance")],
        ["doc_id", "text"],
    )
    sigs = {r["id"] for r in simhash_table(docs).collect()}
    assert sigs == {3, 4}
    pairs = {(r["id1"], r["id2"]) for r in simhash_neardup(docs).collect()}
    assert (1, 2) not in pairs


def test_multiprobe_hamming2_probes_more_and_recall_monotone(spark):
    """probe_hamming=2 must actually probe 2-bit-flip buckets (the old
    mask generator silently capped at H<=1): recall at H=2 >= recall at
    H=1 on the fixture, and the H=2 probe set is strictly larger."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {(r["query_id"], r["cand_id"])
             for r in cosine_topk(queries, emb, k=10).collect()}

    def recall(h):
        got = {(r["query_id"], r["cand_id"])
               for r in lsh_bucketed_topk(
                   queries, emb, dim=64, k=10, planes=4, probe_hamming=h
               ).collect()}
        return len(got & exact) / len(exact)

    assert recall(2) >= recall(1)
    import pytest

    with pytest.raises(ValueError, match="probe_hamming"):
        lsh_bucketed_topk(queries, emb, dim=64, planes=4, probe_hamming=5)


def test_sign_grid_bits_bound_pair_join_volume(spark):
    """The r4 scale flag: a FIXED 6-bit orthant grid makes the semantic
    near-dup self-join O(N²/64). sign_grid_bits sizes the grid from the
    corpus, so candidate-pair volume (Σ C(n_b, 2) over buckets) stays
    ~linear in N: a 10× corpus with corpus-sized bits must grow volume
    far less than the 100× a fixed grid implies."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        _sign_bucket_col,
        sign_grid_bits,
    )

    # chooser shape: fixed floor below target, log growth above, clamped
    assert sign_grid_bits(500, target_bucket_rows=1024) == 6
    assert sign_grid_bits(1 << 20, target_bucket_rows=1024) == 10
    assert sign_grid_bits(10 ** 12, target_bucket_rows=1024) == 24  # clamp

    dim = 32

    def synthetic(n):
        # deterministic pseudo-random signs: xxhash64(id, dim index)
        cols = F.array(
            *[
                (F.xxhash64(F.col("id"), F.lit(i)) % 1000 - 500.0) / 500.0
                for i in range(dim)
            ]
        )
        return spark.range(n).select(F.col("id").alias("vec_id"), cols.alias("embedding"))

    def pair_volume(n, target):
        bits = sign_grid_bits(n, target_bucket_rows=target, max_bits=dim)
        return (
            synthetic(n)
            .select(_sign_bucket_col(bits).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("nb"))
            .agg(F.sum(F.col("nb") * (F.col("nb") - 1) / 2).alias("vol"))
            .first()["vol"]
        )

    # small target so the 2k/20k corpora exercise the scaling regime
    v1 = pair_volume(2_000, target=64)
    v10 = pair_volume(20_000, target=64)
    assert v10 / v1 < 30, (
        f"pair volume grew {v10 / v1:.0f}× for a 10× corpus — grid not "
        "scaling (quadratic would be 100×)"
    )


def test_semantic_neardup_pairs_bits_param_matches_registered(spark):
    """The parameterized operator at the module-default bits must emit
    exactly the registered query's pairs (the frozen-oracle contract),
    and more bits can only REMOVE candidate pairs (orthant refinement)."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        _SIGN_GRID_BITS,
        semantic_dedup_pairs,
        semantic_neardup_pairs,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    reg = {(r["id1"], r["id2"]) for r in semantic_dedup_pairs(spark, SF_SMOKE).collect()}
    par = {
        (r["id1"], r["id2"])
        for r in semantic_neardup_pairs(emb, bits=_SIGN_GRID_BITS).collect()
    }
    assert reg == par
    finer = {
        (r["id1"], r["id2"])
        for r in semantic_neardup_pairs(emb, bits=_SIGN_GRID_BITS + 4).collect()
    }
    assert finer <= par


def test_recall_certificates_hold_on_smoke(spark):
    """The four driver certificates must hold at every SF, not just the
    driver's sf0.01: exhaustive-setting ANN == exact top-k, and zero
    pigeonhole misses for simhash banding."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        embedding_cosine_topk,
        ivf_recall_vs_exact,
        lsh_recall_vs_exact,
        pq_recall_vs_exact,
        simhash_recall_certificate,
    )

    exact = sorted(map(tuple, embedding_cosine_topk(spark, SF_SMOKE).collect()))
    for fn in (lsh_recall_vs_exact, ivf_recall_vs_exact, pq_recall_vs_exact):
        assert sorted(map(tuple, fn(spark, SF_SMOKE).collect())) == exact, fn.__name__
    [cert] = simhash_recall_certificate(spark, SF_SMOKE).collect()
    assert cert["n_pigeonhole_misses"] == 0
    assert cert["n_exact_pairs"] > 0


def test_mmr_rerank_invariants_and_nondefault_columns(spark):
    """MMR picks come from the relevance pool, rank 1 is the most
    relevant candidate, picks are distinct, and — the regression class
    the cosine_topk_pandas aliasing bug belonged to — non-default
    id/vec column names work end-to-end."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").withColumnsRenamed(
        {"vec_id": "eid", "embedding": "vec"}
    )
    q = emb.filter(F.col("eid") < 4).select("eid", "vec")
    pool = 10
    sel = mmr_rerank(
        q, emb.select("eid", "vec"), k=3, pool=pool, lam=0.5,
        id_col="eid", vec_col="vec",
    ).collect()
    nn = cosine_topk(
        q, emb.select("eid", "vec"), k=pool, id_col="eid", vec_col="vec"
    ).collect()
    pool_by_q = {}
    top1 = {}
    for r in nn:
        pool_by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        if r["rnk"] == 1:
            top1[r["query_id"]] = r["cand_id"]
    by_q = {}
    for r in sel:
        by_q.setdefault(r["query_id"], []).append((r["mmr_rank"], r["cand_id"]))
    assert set(by_q) == set(pool_by_q)
    for qid, picks in by_q.items():
        picks.sort()
        ids = [c for _, c in picks]
        assert len(ids) == 3 and len(set(ids)) == 3
        assert set(ids) <= pool_by_q[qid]
        assert ids[0] == top1[qid]  # first pick = pure relevance argmax


def test_pq_encode_drops_null_and_wrong_length_vectors(spark):
    """Regression (r5 review): the zero-shuffle encode must not emit
    codes for NULL/short vectors — they'd carry NULL fold distances and
    enter the ADC shortlist with garbage codes."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from ecommerce_data_pipeline_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).limit(50)
    books = train_pq_codebooks(emb, dim=64, m=8, k_codes=4)
    bad = spark.createDataFrame(
        [(9001, None), (9002, [0.1] * 3)],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    codes = pq_encode(emb.unionByName(bad), books)
    ids = {r["cand_id"] for r in codes.collect()}
    assert 9001 not in ids and 9002 not in ids
    assert len(ids) == 50  # every valid vector still encoded


def test_pq_encode_vectorized_bit_identical_to_fold(spark):
    """r13 optimization pin: the Arrow/NumPy encode (the default) must
    emit BIT-IDENTICAL codes to the JVM fold form — the kernel keeps
    every accumulation in the fold's sequential order and breaks
    distance ties toward the smaller code, so this holds exactly, not
    approximately. A drift here would silently change embedding_pq_topk
    shortlists."""
    from ecommerce_data_pipeline_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    books = train_pq_codebooks(emb, dim=64, m=8, k_codes=16)
    fold = {
        r["cand_id"]: list(r["codes"])
        for r in pq_encode(emb, books, vectorized=False).collect()
    }
    fast = {
        r["cand_id"]: list(r["codes"])
        for r in pq_encode(emb, books, vectorized=True).collect()
    }
    assert fold == fast


def test_sign_grid_bits_clamp_and_null_safe_bucket(spark):
    """Regression (r5 review): bits beyond the embedding dimension must
    degrade to an effective min(bits, dim)-bit grid — not NULL every
    bucket and silently return zero pairs."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        _sign_bucket_col,
        semantic_neardup_pairs,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    narrow = emb.select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")
    )
    # bits=6 over a 4-dim embedding: buckets must be non-NULL and equal
    # the 4-bit grid's buckets
    b6 = narrow.select(_sign_bucket_col(6).alias("b")).collect()
    b4 = narrow.select(_sign_bucket_col(4).alias("b")).collect()
    assert all(r["b"] is not None for r in b6)
    assert [r["b"] for r in b6] == [r["b"] for r in b4]
    # end-to-end: explicit oversized bits still yields the 4-bit result
    p_over = semantic_neardup_pairs(narrow, threshold=0.9, bits=6)
    p_four = semantic_neardup_pairs(narrow, threshold=0.9, bits=4)
    assert sorted(map(tuple, p_over.collect())) == sorted(
        map(tuple, p_four.collect())
    )


def test_cosine_pandas_zero_norm_matches_jvm_null_contract(spark):
    """Zero-norm vectors: the JVM path yields NULL cosine
    (cosine_with_norms), the pandas path yields 0/0 = NaN which Spark's
    Arrow ingestion masks to NULL — both twins must produce identical
    rows, with the zero-norm candidate ranked beyond k whenever k real
    candidates exist."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_pandas,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # zero-norm
        (4, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    jvm = sorted(map(tuple, cosine_topk(df, df, k=2).collect()))
    pds = sorted(map(tuple, cosine_topk_pandas(df, df, k=2).collect()))
    assert jvm == pds
    # zero-norm candidate never outranks real candidates
    for q, cand, cos, rnk in jvm:
        if q != 3:
            assert cand != 3


def test_incremental_neardup_tolerates_overlapping_delta(spark):
    """A delta containing ids already in base (re-delivery/backfill) must
    yield the same pairs as the disjoint delta — not inflated Jaccard
    from double-counted shingles or duplicated output rows."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        incremental_neardup,
        signature_store,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    clean = {
        tuple(r)
        for r in incremental_neardup(
            signature_store(base), base, delta, threshold=0.8
        ).collect()
    }
    # overlap: delta re-delivers half of base's docs verbatim
    overlap_delta = delta.unionByName(base.filter(F.col("doc_id") % 4 == 0))
    # pairs among re-delivered base docs were "found when base was
    # ingested" — the introduced-pairs contract only promises pairs with
    # at least one true-delta member, so compare on that subset
    dirty = {
        tuple(r)
        for r in incremental_neardup(
            signature_store(base), base, overlap_delta, threshold=0.8
        ).collect()
        if r["id1"] % 2 == 1 or r["id2"] % 2 == 1
    }
    clean_delta_touching = {
        t for t in clean if t[0] % 2 == 1 or t[1] % 2 == 1
    }
    assert dirty == clean_delta_touching


def test_prefix_filter_matches_uncapped_exact(spark):
    """Prefix filtering is an EXACT algorithm: its output must equal the
    naive uncapped self-join's, row for row (same pairs AND same
    common/n/jaccard values), on the fixture corpus."""
    from ecommerce_data_pipeline_spark.operators.similarity import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    naive = {
        tuple(r)
        for r in jaccard_pairs(docs, threshold=0.8, max_df=None).collect()
    }
    pf = {
        tuple(r)
        for r in prefix_filter_jaccard_pairs(docs, 4, 5).collect()
    }
    assert naive, "expected planted near-dup pairs in the fixture"
    assert pf == naive


def test_prefix_filter_candidate_volume_bounded(spark):
    """The scale property: hot (high-df) shingles sort LAST in the
    df-ascending prefix order, so they drop out of every prefix and the
    candidate join volume stays far below the naive self-join's — on the
    boilerplate-footer corpus of test_df_cap_bounds_pair_join_volume,
    without changing semantics (unlike the df cap)."""
    from pyspark.sql import Window
    from ecommerce_data_pipeline_spark.operators.similarity import (
        shingle_sets,
    )

    footer = (
        " subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact support for help unsubscribe at any "
        "time privacy policy available on our website thank you"
    )
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    reps = spark.range(10).withColumnRenamed("id", "rep")
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" marker"), F.col("rep"), F.lit(footer)
        ).alias("text"),
    )

    def join_volume(sh):
        return (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")).alias("vol"))
            .first()["vol"]
        )

    sh = shingle_sets(big, "doc_id", "text")
    df_tbl = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id")
    ranked = sh.join(df_tbl, "s").select(
        "id",
        "s",
        F.row_number().over(w.orderBy("df", "s")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("set_n"),
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("set_n") - F.expr("CAST((set_n*4 + 4) DIV 5 AS INT)") + 1
    ).select("id", "s")
    # the footer shingles have df >= 10x corpus replication; none may
    # survive into a prefix-side join key with quadratic fan-out
    assert join_volume(prefix) < join_volume(sh) / 5


def test_prefix_filter_rejects_bad_threshold(spark):
    import pytest

    from ecommerce_data_pipeline_spark.operators.similarity import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(docs, 0, 5)
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(docs, 6, 5)


def test_sign_grid_bits_keeps_pair_volume_subquadratic_at_10x(spark):
    """The r4 scale-killer's closing probe (VERDICT r5 task #4): a FIXED
    orthant grid makes SemDeDup's within-bucket all-pairs join O(N²/2^bits)
    — at 10× the corpus, 100× the pair volume. ``sign_grid_bits`` sizes
    the grid from N (each extra bit halves expected bucket population),
    so pair volume grows ~linearly. Pinned here on a 100k → 1M corpus of
    sign-balanced synthetic embeddings (idealized independent dims — the
    mechanism under test is the grid sizing, not a recall property):

      · bits(10N) > bits(N)  (the grid actually widens), and
      · volume(10N @ auto bits) ≤ 30 × volume(N @ auto bits)
        (~linear; the fixed-grid counterfactual is ~100×), and
      · the auto grid beats the frozen-at-bits(N) grid by ≥3×.

    Volume = Σ_buckets C(n_b, 2), computed as an aggregate — no pair is
    materialized, so the probe is cheap even at 1M rows.
    """
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        _sign_bucket_col,
        sign_grid_bits,
    )

    n_small = 100_000
    bits_small = sign_grid_bits(n_small)
    bits_big = sign_grid_bits(10 * n_small)
    assert bits_big > bits_small  # the grid widens with the corpus

    def synth(n: int, dims: int):
        # sign-balanced independent dims: per-(row, dim) Murmur3 hash →
        # uniform in [-0.5, 0.5) (sin(id·cᵢ) was tried first and rejected:
        # its signs correlate across dims, skewing bucket populations ~4×)
        arr = F.array(
            *[
                (F.pmod(F.hash(F.col("id"), F.lit(i)), F.lit(10_000)) / 10_000.0 - 0.5)
                for i in range(dims)
            ]
        )
        return spark.range(n).select(arr.alias("embedding"))

    def pair_volume(df, bits: int) -> int:
        return (
            df.select(_sign_bucket_col(bits).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("vol"))
            .first()["vol"]
        )

    dims = bits_big + 2
    vol_small = pair_volume(synth(n_small, dims), bits_small)
    vol_big_auto = pair_volume(synth(10 * n_small, dims), bits_big)
    vol_big_frozen = pair_volume(synth(10 * n_small, dims), bits_small)

    assert vol_big_auto <= 30 * vol_small  # ~linear growth, with slack
    assert vol_big_frozen >= 3 * vol_big_auto  # the sizing is what saves it


def test_band_tuning_grid_is_sound_and_curve_monotone(spark):
    """The baked (b, r, bin) grid must cover every config × every bin
    exactly once with probabilities that are valid and MONOTONE in
    similarity for each config (the S-curve property the tuning table
    exists to expose); the engine output must reproduce
    expected_hits = round(n_pairs * p) for every emitted row."""
    from ecommerce_data_pipeline_spark.plans.similarity_plans import (
        _BAND_CONFIGS,
        _BAND_GRID,
    )

    assert len(_BAND_GRID) == len(_BAND_CONFIGS) * 19
    by_cfg: dict[tuple, list] = {}
    for b, r, s_bin, s_mid, p in _BAND_GRID:
        assert 0.0 <= p <= 1.0
        assert abs(s_mid - (s_bin + 0.5) / 20.0) < 1e-9
        by_cfg.setdefault((b, r), []).append((s_bin, p))
    for cfg, pts in by_cfg.items():
        pts.sort()
        ps = [p for _, p in pts]
        assert all(a <= b2 for a, b2 in zip(ps, ps[1:])), cfg

    from ecommerce_data_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["minhash_band_tuning_curve"].fn(spark, SF_SMOKE).collect()
    assert rows, "no pairs above the 0.05 floor in the smoke corpus"
    for r in rows:
        assert abs(r["expected_hits"] - round(r["n_pairs"] * r["p_detect"], 4)) < 1e-9
        assert 1 <= r["s_bin"] <= 19
