"""Near-duplicate detection and similarity search at scale.

Three families (SURVEY.md §2.11, the BASELINE north-star extension tier):

1. **Exact n-gram Jaccard** (`jaccard_pairs`): explode distinct shingles →
   self-join on shingle → per-pair intersection counts → Jaccard. Exact,
   SQL-expressible (oracle-checkable), but all-pairs-sharing-a-shingle:
   only viable when shingle frequencies are bounded. The 100 TB path is:

2. **MinHash + LSH** (`minhash_signatures` / `lsh_candidate_pairs` /
   `minhash_lsh_neardup`): k seeded xxhash64 min-hashes per document,
   banded into b groups of r; documents colliding on any band become
   candidates; candidates are verified with exact Jaccard. Every stage is
   a join/groupBy on hash keys — shuffle volume is O(docs·b), independent
   of pairwise combinations.

3. **SimHash** (`simhash_table`): one 64-bit signature per document via
   bitwise majority vote over shingle hashes; near-dups = signatures
   within small Hamming distance, found by exact-matching byte bands
   (pigeonhole: d≤7 ⇒ at least one of 8 bytes equal).

Plus embedding-space search:

4. **Brute-force cosine top-k** (`cosine_topk`): query set × corpus via
   broadcast, JVM-side fold for the dot product, per-query window rank.
   The bucketed variant (`lsh_bucketed_topk`) hashes vectors through
   signed random projections and multi-probes the home bucket plus all
   Hamming-1 neighbors — the 100 TB path (operators/ivf.py holds the
   IVF coarse-quantizer alternative).

All hashing is seeded and deterministic — reruns produce identical
signatures (required for both the driver contract and idempotent
re-ingest).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions.vectors import (  # noqa: F401 — re-exported for callers
    cosine_similarity,
)
from ecommerce_data_pipeline_spark.operators.text import tokens

# --- exact Jaccard (oracle-checkable) --------------------------------------


def shingle_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) rows via posexplode + lead windows.

    Deliberately NOT the array-higher-order form (`transform(sequence)`
    building the shingle array in place): higher-order lambdas are
    interpreted, not codegen'd, and a single-file source keeps them on one
    core. Exploding tokens first (a) shuffles by id, spreading documents
    across all executors regardless of input file layout, and (b) keeps
    every downstream expression (lead/concat_ws/xxhash64) inside
    whole-stage codegen. Measured ~10× faster on the fixture corpus.
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    cols = [F.col("tok").alias("t0")] + [
        F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)
    ]
    sh = (
        tok.select("id", *cols)
        .filter(F.col(f"t{n-1}").isNotNull())
        .select("id", F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("s"))
    )
    return sh.distinct() if distinct else sh


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    return shingle_rows(docs, id_col, text_col, n, distinct=True)


def df_capped_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(id, shingle) relation with shingles of document-frequency > max_df
    removed.

    The DF count is one linear hash-aggregate over the shingle relation —
    no pair expansion — so the cap costs one extra shuffle on the shingle
    key and removes the quadratic hot-key blowup in any downstream
    shared-shingle self-join (a shingle in d docs yields d²/2 join rows;
    a boilerplate 3-gram at corpus scale is unbounded d). ``max_df=None``
    keeps the exact relation.
    """
    sh = shingle_sets(docs, id_col, text_col, n)
    if max_df is None:
        return sh
    ok = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("s")
    )
    return sh.join(ok, "s")


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
    out: dict | None = None,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold (exact).
    ``out``, when given, receives ``{"persisted": [...]}`` for loop
    callers to unpersist (the incremental_neardup cleanup contract).

    Returns (id1, id2, common, n1, n2, jaccard) with id1 < id2.

    ``max_df`` bounds the document frequency of shingles entering the
    self-join (and the set sizes — i.e. the semantics become "Jaccard
    over discriminative shingles", the IR df-filter convention). Without
    it the shared-shingle self-join is quadratic on a hot shingle, which
    is the 100 TB scale-killer; with it, join fan-out per shingle is
    ≤ max_df²/2. At corpus scale pass max_df ≈ 1e-4 × corpus size (and
    run exact-hash dedup FIRST — a cluster of k verbatim copies puts df≥k
    on every one of its shingles, so the cap would otherwise hide it).
    """
    # the shingle relation feeds three consumers (sizes + both join
    # sides); persist it so the explode+window shuffle runs once
    sh = df_capped_shingles(docs, id_col, text_col, n, max_df).persist()
    if out is not None:
        out["persisted"] = [sh]
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"id": "id1", "n": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n": "n2"}), "id2")
        .withColumn("jaccard", F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id1", "id2", "common", "n1", "n2", "jaccard")


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    out: dict | None = None,
) -> DataFrame:
    """EXACT Jaccard ≥ num/den pairs via prefix filtering (AllPairs /
    PPJoin family) — no df cap, no probabilistic miss.

    Same output contract as `jaccard_pairs` with ``max_df=None``
    (id1, id2, common, n1, n2, jaccard), but the candidate join runs on
    each document's PREFIX only: order a document's shingles by ascending
    global document frequency (ties by shingle value — a total order),
    keep the first ``|S| - ceil(t·|S|) + 1``. Theorem (Chaudhuri et al.
    SSJoin / Bayardo et al. AllPairs): for any pair with Jaccard ≥ t, the
    globally-smallest shared shingle sits inside BOTH prefixes — in doc A,
    every token ordered before it is outside the intersection, and
    |A| − |A∩B| ≤ |A| − ceil(t·|A|) such tokens exist — so the prefix
    equi-join finds every qualifying pair and exact verification drops
    the rest. Recall is exactly 1 by construction.

    Why this is the 100 TB exact path: hot (boilerplate) shingles carry
    the quadratic fan-out in the naive self-join, but they sort LAST in
    df order, so they fall out of prefixes entirely; candidate volume is
    driven by rare shingles whose fan-out is intrinsically small. The
    df-capped `jaccard_pairs` changes semantics to hit the same bound;
    MinHash-LSH keeps semantics but pays a ~1e-6 miss probability. This
    operator is exact AND bounded. PPJoin's LENGTH filter is applied in
    the candidate join (J ≥ t forces den·min(|A|,|B|) ≥ num·max — at
    sf0.1 it prunes 118.8k → 43.5k candidates); the positional/suffix
    refinements would only shrink the (already verified-away) false
    candidates further. Verification intersects the two candidate docs'
    sorted shingle ARRAYS row-locally (semi-filtered build, so its
    shuffle volume scales with candidates) instead of re-joining
    exploded shingle rows — see the inline measurement.

    The ceil uses integer arithmetic ((num·|S| + den − 1) div den):
    float ceil(0.8·n) rounds UP spuriously when 0.8·n lands above the
    true product (e.g. n = 5 → 4.0000000000000002 → 5), silently
    shortening the prefix below the theorem bound.

    ``out`` receives ``{"persisted": [...]}`` per the cleanup contract.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError(
            f"threshold must be in (0, 1]: got {threshold_num}/{threshold_den}"
        )
    threshold = threshold_num / threshold_den
    # the shingle relation feeds df counts, the ranked prefix, sizes and
    # both verify sides — persist so the explode+window shuffle runs once
    sh = shingle_rows(docs, id_col, text_col, n, distinct=True).persist()
    if out is not None:
        out["persisted"] = [sh]
    df_tbl = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # rank + set size in ONE window partition (same key → no extra
    # shuffle beyond the df join)
    w = Window.partitionBy("id")
    ranked = (
        sh.join(df_tbl, "s")
        .select(
            "id",
            "s",
            F.row_number().over(w.orderBy("df", "s")).alias("rk"),
            F.count(F.lit(1)).over(w).alias("set_n"),
        )
    )
    ceil_tn = F.expr(
        f"CAST((set_n * {threshold_num} + {threshold_den} - 1) "
        f"DIV {threshold_den} AS INT)"
    )
    # Carry set_n on every prefix row: candidate pairs then already know
    # both set sizes, so verification needs NO separate sizes
    # aggregation/joins (two shuffles fewer than the generic
    # verify_exact_jaccard path, which serves callers whose candidates
    # arrive without sizes, e.g. LSH).
    prefix = ranked.filter(F.col("rk") <= F.col("set_n") - ceil_tn + 1).select(
        "id", "s", "set_n"
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # PPJoin length filter: |∩| ≤ min(n1,n2) and |∪| ≥ max(n1,n2), so
    # J ≥ num/den forces den·min ≥ num·max — both inequalities below.
    # Sound (never drops a qualifying pair), and it prunes candidates
    # BEFORE the distinct+verify fan-out (measured at sf0.1: 118.8k →
    # 43.5k candidate pairs, 4.15 s → see docstring).
    length_ok = (
        (threshold_num * F.col("a.set_n") <= threshold_den * F.col("b.set_n"))
        & (threshold_num * F.col("b.set_n") <= threshold_den * F.col("a.set_n"))
    )
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id"))
            & length_ok,
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.set_n").alias("n1"),
            F.col("b.set_n").alias("n2"),
        )
        .distinct()
    )
    # Array-intersect verification: build each CANDIDATE doc's sorted
    # shingle array (broadcast-semi-filtered first, so the groupBy
    # shuffles candidate docs' shingles only — verify volume scales with
    # candidates, not corpus), then two hash joins and one row-local
    # array_intersect per pair. Replaces the previous
    # cand⋈sh(id1)⋈sh(id2,s)⋈sizes² chain: the exploded form paid a
    # candidate×shingle row fan-out through a sort-merge join plus a
    # re-aggregation (measured at sf0.1: 3.6 s → 2.0 s full query;
    # the unfiltered-sets variant measures 1.3 s here but only because
    # the fixture is dense — ~every doc is in some candidate pair, so
    # the semi-filter saves nothing at this SF while at 100 TB it is
    # the difference between shuffling the candidates' shingles and the
    # whole corpus's).
    cand = cand.persist()
    if out is not None:
        out["persisted"].append(cand)
    s1 = (
        sh.join(
            cand.select(F.col("id1").alias("id")).distinct(), "id", "left_semi"
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss1"))
        .withColumnsRenamed({"id": "id1"})
    )
    s2 = (
        sh.join(
            cand.select(F.col("id2").alias("id")).distinct(), "id", "left_semi"
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss2"))
        .withColumnsRenamed({"id": "id2"})
    )
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "common", F.size(F.array_intersect("ss1", "ss2")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "common", "n1", "n2", "jaccard")
    )


# --- MinHash + LSH (the scale path) -----------------------------------------


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, mh: array<bigint>) — k min-hashes over the document's shingles.

    Shape: shingle rows (codegen'd, distributed — see shingle_rows) →
    ONE hash aggregate with k MIN(xxhash64(shingle ∥ '#j')) columns.
    Documents with no shingles (< n tokens) are absent from the output
    (they can have no shingle-overlap with anything).

    The salt is concatenated into the hashed string rather than passed as
    an extra xxhash64 argument: inside expressions built from Python
    lambdas, PySpark drops the extra literal argument (all k positions
    collapse to the same hash — caught by the sf0.01 recall check); the
    concat form is immune everywhere.
    """
    sh = shingle_rows(docs, id_col, text_col, n, distinct=True)
    # delegate to THE signature scheme (minhash_signature_agg) — a fourth
    # inline copy of the salt format would silently desynchronize from
    # signature_store/incremental_neardup on a salt change
    return minhash_signature_agg(sh, num_hashes).select("id", "mh")


def minhash_signature_agg(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(id, n, mh) from a distinct (id, s) shingle relation: shingle
    count + MinHash signature in ONE aggregation pass. THE signature
    scheme of the dedup family — signature_store, minhash_lsh_neardup,
    and incremental_neardup all call this (previously three inline
    copies; a salt-format change now has exactly one home)."""
    mins = [
        F.min(F.xxhash64(F.concat(F.col("s"), F.lit(f"#{j}")))).alias(f"_m{j}")
        for j in range(num_hashes)
    ]
    return (
        sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"), *mins)
        .select(
            "id",
            "n",
            F.array(*[f"_m{j}" for j in range(num_hashes)]).alias("mh"),
        )
    )


def banded_signatures(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, band, sig) rows: each signature exploded into its b band
    hashes (shared by lsh_candidate_pairs and incremental_neardup)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    *[F.col("mh").getItem(i * rows + j) for j in range(rows)]
                ).alias("sig"),
            )
            for i in range(bands)
        ]
    )
    return sigs.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig")
    )


def verify_exact_jaccard(
    cand: DataFrame, sh1: DataFrame, sh2: DataFrame, sizes: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of LSH candidates: intersection count
    via the shingle relations (pre-filtered to candidates by the
    caller), sizes joined back, threshold filter. Shared output contract
    (id1, id2, common, n1, n2, jaccard).

    PRECONDITION (advisor r13): sh1/sh2 must be (id, s)-DISTINCT —
    array_intersect dedupes, so duplicated shingle rows would count
    differently than the retired join-count form did. Both callers
    satisfy it (shingle_rows distinct=True; the incremental path's
    anti-joins keep base/delta disjoint).

    r13 form (the prefix_filter_jaccard_pairs array-intersect shape,
    measured 3.6 s -> 2.0 s there): build each candidate doc's sorted
    shingle ARRAY once per side (one hash aggregate each), then two
    pair joins and a row-local array_intersect — instead of the
    exploded cand x shingle fan-out through a (id2, s)-keyed join plus
    a re-aggregation (two exchanges more, and the fan-out intermediate
    scales with candidates x shingles rather than candidates). A pair
    with zero common shingles produced no row in the join form; the
    common >= 1 filter keeps that contract for any threshold."""
    s1 = sh1.groupBy("id1").agg(F.sort_array(F.collect_list("s")).alias("ss1"))
    s2 = sh2.groupBy("id2").agg(F.sort_array(F.collect_list("s")).alias("ss2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "common", F.size(F.array_intersect("ss1", "ss2")).cast("long")
        )
        .filter(F.col("common") >= 1)
        .join(sizes.withColumnsRenamed({"id": "id1", "n": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n": "n2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "common", "n1", "n2", "jaccard")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows: int = 4,
    num_hashes: int | None = None,
) -> DataFrame:
    """(id1, id2) candidates: documents agreeing on all r hashes of ≥1 band.

    One explode (docs×b rows) + one self-join on (band, signature) — the
    join key is a 64-bit hash of the band slice, so skew is bounded by
    true duplicate clusters, not by popular shingles.

    Pass ``num_hashes`` (the signature length) to validate the banding
    geometry HERE, where the invariant lives: bands×rows beyond the
    signature indexes ``mh`` past its end, getItem yields NULL, xxhash64
    of NULLs collapses those bands to one constant, and the self-join
    silently degenerates toward all-pairs.
    """
    if num_hashes is not None and bands * rows != num_hashes:
        raise ValueError(
            f"bands*rows ({bands}*{rows}) must equal num_hashes ({num_hashes})"
        )
    banded = banded_signatures(signatures, bands, rows)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def minhash_lsh_neardup(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    rows: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    out: dict | None = None,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard ≥ threshold.

    Output matches `jaccard_pairs` minus any pair LSH missed: with b=8,
    r=2 the miss probability at j=0.9 is (1-j²)⁸ ≈ 1.7e-6 (b=4,r=4
    measurably missed real j≈0.9 pairs). The shorter bands admit more
    low-similarity candidates, but candidates are exact-verified, so
    false positives cost verification work only — the right trade for a
    dedup pipeline where recall is the product guarantee.

    ``out``, when given, receives ``{"persisted": [...]}`` so loop/
    notebook callers can unpersist after materializing (the
    incremental_neardup cleanup contract); one-shot query callers may
    ignore it.
    """
    if bands * rows != num_hashes:
        raise ValueError(
            f"bands*rows ({bands}*{rows}) must equal num_hashes ({num_hashes})"
        )
    # one shingle materialization feeds signatures, sizes, and both
    # verify-join sides (4 consumers — without persist the explode+window
    # shuffle re-runs for each)
    sh = shingle_rows(docs, id_col, text_col, n, distinct=True).persist()
    # one aggregation pass produces BOTH the signature and the set size
    per_doc = minhash_signature_agg(sh, num_hashes).persist()
    cand = lsh_candidate_pairs(
        per_doc.select("id", "mh"), bands, rows, num_hashes=num_hashes
    )
    sizes = per_doc.select("id", "n")
    # Verification cost scales with the CANDIDATE set, not the corpus:
    # semi-filter the shingle relation to candidate documents before the
    # pairwise intersection join (candidates ≪ corpus after banding, so
    # these semi-joins broadcast and the big relation never reshuffles).
    sh1 = sh.join(
        cand.select(F.col("id1").alias("id")).distinct(), "id", "left_semi"
    ).withColumnsRenamed({"id": "id1"})
    sh2 = sh.join(
        cand.select(F.col("id2").alias("id")).distinct(), "id", "left_semi"
    ).withColumnsRenamed({"id": "id2"})
    if out is not None:
        out["persisted"] = [sh, per_doc]
    return verify_exact_jaccard(cand, sh1, sh2, sizes, threshold)


# --- SimHash -----------------------------------------------------------------

_SIMHASH_BITS = 64


def simhash_table(
    docs: DataFrame,
    bits: int = _SIMHASH_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig): bitwise-majority SimHash over 3-gram shingle hashes.

    Distributed form: explode shingles → xxhash64 → ONE hash aggregate
    with `bits` codegen'd SUM(bit_b) columns → recombine the majority
    bits. Entirely whole-stage-codegen (an earlier array-accumulator
    `aggregate()` formulation ran ~25x slower, interpreted).

    3-gram shingles, not unigram tokens: with a small vocabulary unigram
    features saturate the signature (every doc shares most words).
    Shingle multiplicity is kept — classic frequency-weighted SimHash.
    """
    ex = shingle_rows(docs, id_col, text_col, 3, distinct=False).select(
        "id", F.xxhash64("s").alias("h")
    )
    bit_sums = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"_c{b}")
        for b in range(bits)
    ]
    counted = ex.groupBy("id").agg(F.count(F.lit(1)).alias("_n"), *bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        # bit 63 can't be written as 1<<63 (overflows signed long); its
        # two's-complement value is Long.MIN, and summing it with the
        # positive lower-bit masks composes the intended bit pattern
        mask = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + F.when(
            F.col(f"_c{b}") * 2 >= F.col("_n"), F.lit(mask).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    # documents with no shingles (< 3 tokens) are EXCLUDED, mirroring
    # the minhash path: they carry no shingle evidence, and assigning
    # them a shared sentinel signature (the old fillna(0)) made every
    # pair of unrelated short docs a hamming-0 "near-duplicate"
    return counted.select("id", sig.alias("sig"))


def simhash_neardup(
    docs: DataFrame,
    max_hamming: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id1, id2, hamming) pairs within Hamming distance ≤ max_hamming.

    64-bit signatures, 8 byte-bands: by pigeonhole any pair at distance
    ≤7 matches exactly on ≥1 band — candidates come from 8 exact-match
    self-joins, never a cross product. (The earlier 32-bit/4-band form
    measurably lost recall on true j≈0.9 pairs: expected bit-flips scale
    with signature width, so the wider signature separates better at the
    same relative threshold.)
    """
    sigs = simhash_table(docs, id_col=id_col, text_col=text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("sig"), i * 8).bitwiseAND(F.lit(255)).alias("bv"),
            )
            for i in range(8)
        ]
    )
    banded = sigs.select("id", "sig", F.explode(bands).alias("b")).select(
        "id", "sig", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding similarity search ---------------------------------------------


def spread_for_fanout(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition of the STREAM side before a broadcast
    scoring join.

    Broadcast-hash-join parallelism follows the streamed side's partition
    count, and a small parquet table (or a single-row-group file, like
    the bench fixture) arrives as ONE split — so the O(pairs·dim)
    interpreted cosine fold after the join would run in a single task no
    matter how many cores exist. One linear round-robin shuffle of the
    narrow pre-join relation is negligible against the quadratic-ish
    scoring fan-out it parallelizes, at any scale; with a genuinely
    multi-split scan it is a cheap no-op reshuffle.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """THE ANN-family output contract in one place: rank a
    (query_id, cand_id, cosine) relation per query by rounded score desc
    with the cand_id tie-break, keep the top k. Shared by cosine_topk,
    lsh_bucketed_topk, cosine_topk_pandas, ivf_topk, and pq_topk —
    previously five inline copies of the same six lines, where a
    tie-break or policy change had to be applied five times. NULL scores
    (zero-norm vectors, cosine_with_norms contract) sort last under
    desc, so they rank beyond k whenever k real candidates exist."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    Broadcast the (small) query set against the corpus; the dot product is
    a codegen'd fold. Ranking uses the score rounded to `round_digits`
    with an id tiebreak, making the k-set deterministic cross-engine.
    """
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )

    # norms once per side before the fan-out: the q×corpus scoring loop
    # then runs one interpreted fold per pair instead of three
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    # spread BEFORE the computed columns so the norm fold (and the
    # scoring fold after the join) run across all cores, not on the
    # scan's single input split
    c = spread_for_fanout(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    ).withColumn("cn", l2_norm("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine_with_norms("qv", "cv", "qn", "cn"), round_digits
            ).alias("cosine"),
        )
    )
    return rank_topk(scored, k)


def random_hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic signed-projection hyperplanes (public LSH scheme:
    Charikar, STOC'02 — random projections for cosine)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec_col: str | Column, hyperplanes: list[list[float]]) -> Column:
    """Bucket id = sign bits of the projections onto each hyperplane."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        # one array literal per plane (not one F.lit per coordinate —
        # that costs planes·dim py4j round-trips at plan-build time)
        plane = F.lit([float(x) for x in h])
        proj = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_pandas(
    vec_col: str | Column, hyperplanes: list[list[float]]
) -> Column:
    """Vectorized twin of ``lsh_bucket``: one Arrow-batched NumPy matmul
    computes every plane's projection sign at once, instead of p
    interpreted JVM folds per row. Wins once corpus × planes grows; the
    fold form stays the zero-Python-worker default for small inputs.

    Closure is self-contained (plane matrix captured by value) — the
    worker-pickling rule used by every Python-worker function here.

    Caveat: BLAS may reorder the dot-product accumulation vs the
    sequential JVM fold, so a projection EXACTLY at 0.0 could round to a
    different sign. Bucket ids are approximation plumbing (never
    oracle-compared), and both forms are individually deterministic.
    """
    from pyspark.sql.functions import pandas_udf

    planes = [list(map(float, h)) for h in hyperplanes]

    # no type hints on purpose: `from __future__ import annotations` makes
    # them strings this module can't resolve for pyspark's hint inference
    def _bucket(v):
        import numpy as np
        import pandas as pd

        hm = np.asarray(planes, dtype=np.float64)
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        signs = (m @ hm.T) > 0  # rows × planes
        weights = np.int64(1) << np.arange(hm.shape[0], dtype=np.int64)
        return pd.Series((signs @ weights).astype(np.int64))

    bucket = pandas_udf(_bucket, returnType="long")
    return bucket(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 4,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    vectorized_bucketing: bool = False,
) -> DataFrame:
    """Approximate top-k via multi-probe LSH: score only candidates whose
    bucket is within Hamming distance ``probe_hamming`` of the query's.

    With p planes the corpus splits into 2^p buckets; each query probes
    1 + p buckets (H≤1), so the scored fraction is ~(1+p)/2^p of the
    corpus. p and probe_hamming are the recall/cost knobs — clustered
    real-world embeddings concentrate neighbors in the home bucket,
    allowing more planes; this default is tuned for near-uniform vectors.
    """
    hp = random_hyperplanes(dim, planes, seed)
    # vectorized_bucketing: Arrow-batched matmul bucketing for large
    # corpora (benchmarked vs the fold form in tests/bench); the JVM fold
    # avoids Python workers entirely and wins at small scale.
    bucket_fn = lsh_bucket_pandas if vectorized_bucketing else lsh_bucket
    # each query probes its own bucket plus every bucket within
    # probe_hamming bit-flips (mask count = Σ C(planes, h) — the old
    # form silently capped at H≤1, delivering less recall than the knob
    # promised for probe_hamming ≥ 2)
    from itertools import combinations

    if not 0 <= probe_hamming <= planes:
        raise ValueError(
            f"probe_hamming ({probe_hamming}) must be in [0, planes={planes}]"
        )
    probe_masks = [0]
    for h in range(1, probe_hamming + 1):
        for bits in combinations(range(planes), h):
            probe_masks.append(sum(1 << b for b in bits))
    # project the home bucket ONCE, then derive the probe set from the
    # projected column — inlining lsh_bucket into every probe expression
    # would recompute the p interpreted projection folds per probe
    from ecommerce_data_pipeline_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )

    q_home = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
        bucket_fn(vec_col, hp).alias("_home"),
    )
    q = q_home.select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.array(
                *[
                    F.col("_home").bitwiseXOR(F.lit(m).cast("long"))
                    for m in probe_masks
                ]
            )
        ).alias("bucket"),
    )
    c = (
        spread_for_fanout(
            corpus.select(
                F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
            )
        )
        .withColumn("cn", l2_norm("cv"))
        .withColumn("bucket", bucket_fn("cv", hp))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_with_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
    )
    return rank_topk(scored, k)


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Vectorized twin of `cosine_topk`: per-Arrow-batch NumPy matmul.

    The JVM fold in `cosine_topk` evaluates one multiply-add at a time per
    element; here each corpus batch scores against ALL queries in a single
    BLAS `candidates @ queries.T` — the winning path once queries × dim is
    large (hundreds of queries, high-dim embeddings). The query matrix is
    collected driver-side (it is the small side by contract) and captured
    by value in the closure, so executors need neither this package nor a
    broadcast variable.

    Output and determinism contract match `cosine_topk` exactly
    (6dp-rounded score, id tiebreak) — asserted in tests.
    """
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = [list(map(float, r[1])) for r in q_rows]

    from pyspark.sql.types import DoubleType, StructField, StructType

    # id type derived from the input schema (pq_topk precedent) — a
    # hardcoded LONG broke string/int32 ids despite the parity contract
    id_type = queries.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("cand_id", id_type),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        qm = np.asarray(q_mat, dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1)
        qid = np.asarray(q_ids, dtype=object)  # id-type-agnostic
        for pdf in batches:
            # the corpus select below aliases to fixed names — index those,
            # not the caller's id_col/vec_col (which may differ)
            cm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cn = np.linalg.norm(cm, axis=1)
            # zero-norm vectors: numerator and denominator are both 0, so
            # 0/0 = NaN (never ±inf), and Spark's Arrow ingestion masks
            # NaN floats to NULL — reproducing cosine_with_norms' NULL
            # contract exactly (pinned by test_cosine_pandas_zero_norm
            # _matches_jvm_null_contract). errstate silences the expected
            # invalid-divide warning.
            with np.errstate(invalid="ignore"):
                sims = (cm @ qm.T) / np.outer(cn, qn)  # candidates × queries
            cids = pdf["vec_id"].to_numpy()
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qid, n_c),
                    "cand_id": np.tile(cids, n_q),
                    "cosine": np.round(sims.T.ravel(), round_digits),
                }
            )

    scored = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
        .mapInPandas(score, schema=out_schema)
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    return rank_topk(scored, k)


def signature_store(
    docs: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n, mh) — the persistable per-document MinHash state: shingle
    count + signature in ONE aggregation pass. This is what an
    incremental dedup pipeline stores between batches (bytes per doc)
    so corpus growth never re-reads old text."""
    sh = shingle_rows(docs, id_col, text_col, n, distinct=True)
    return minhash_signature_agg(sh, num_hashes)


def incremental_neardup(
    base_sigs: DataFrame,
    base_docs: DataFrame,
    delta_docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    rows: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs INTRODUCED by a delta batch: delta×(base ∪ delta),
    never base×base (those pairs were found when base was ingested).

    ``out``, when given, receives ``{"delta_sigs": <DataFrame>,
    "persisted": [<DataFrame>...]}`` — the delta's signature-store rows
    (so a caller landing them needn't recompute the shingle+minhash
    pass) and every relation this call persisted, for the caller to
    unpersist once the result is materialized. Long-running callers
    (the streaming foreachBatch loop) MUST do that cleanup: persists
    register with the session CacheManager and are never GC-reclaimed,
    so per-trigger invocations would otherwise accumulate cache entries
    without bound.

    The incremental-corpus contract: ``base_sigs`` is the persisted
    signature store (signature_store output) — base TEXT is touched only
    for the candidate docs that must be exact-verified (semi-filtered
    shingling; a production deployment stores shingles too and skips
    even that). Banding cost is O(delta·bands), not O(corpus·bands):
    only delta's bands probe the combined band table.

    Output schema matches minhash_lsh_neardup; equality with the
    full-corpus run restricted to delta-touching pairs is asserted in
    tests/test_similarity.py.
    """
    if bands * rows != num_hashes:
        # a mismatched geometry would index mh past its end: getItem
        # yields NULL, xxhash64-of-NULLs degenerates every band signature
        # and candidates silently collapse/vanish instead of erroring
        raise ValueError(
            f"bands*rows ({bands}*{rows}) must equal num_hashes ({num_hashes})"
        )
    # Disjointness is enforced HERE, not assumed: a delta id already in
    # base (re-delivered batch, overlapping backfill) would otherwise put
    # its signature in all_sigs twice and its shingles in sh_all twice —
    # duplicate ids still fan out the size join (duplicate rows, doubled
    # n1/n2), and they would violate verify_exact_jaccard's (id, s)-
    # distinct precondition (the r13 array_intersect form dedupes where
    # the retired join-count form inflated common to 2c). The delta
    # version wins on overlap.
    delta_ids = delta_docs.select(F.col(id_col).alias("id")).distinct()
    base_sigs = base_sigs.join(delta_ids, "id", "left_anti")
    base_docs = base_docs.join(
        delta_ids.withColumnsRenamed({"id": id_col}), id_col, "left_anti"
    )
    sh_delta = shingle_rows(delta_docs, id_col, text_col, n, distinct=True).persist()
    delta_sigs = minhash_signature_agg(sh_delta, num_hashes).persist()
    # persist: THREE consumers (the banded probe table + the two
    # size-join sides inside verify_exact_jaccard). When base_sigs is a
    # computed plan (the registered queries recompute it from text), an
    # unpersisted union re-ran the whole base shingle+minhash pipeline
    # three times — measured 46 parquet scans in the executed plan.
    # Narrow relation (id, n, mh): bytes per doc, cache-safe at scale.
    all_sigs = base_sigs.unionByName(delta_sigs).persist()

    a = banded_signatures(delta_sigs, bands, rows).alias("a")
    b = banded_signatures(all_sigs, bands, rows).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least("a.id", "b.id").alias("id1"),
            F.greatest("a.id", "b.id").alias("id2"),
        )
        .distinct()
        # persist: consumed by both cand_ids projections and the verify
        # join — unpersisted, the band self-join re-ran three times
        .persist()
    )
    # exact verification: delta shingles are in hand; base shingles are
    # recomputed ONLY for candidate base docs
    cand_ids = cand.select(F.col("id1").alias("id")).unionByName(
        cand.select(F.col("id2").alias("id"))
    ).distinct()
    base_cand_docs = base_docs.join(
        cand_ids.withColumnsRenamed({"id": id_col}), id_col, "left_semi"
    )
    sh_all = sh_delta.unionByName(
        shingle_rows(base_cand_docs, id_col, text_col, n, distinct=True)
    ).persist()  # both verify-join sides read it
    sh1 = sh_all.withColumnsRenamed({"id": "id1"})
    sh2 = sh_all.withColumnsRenamed({"id": "id2"})
    if out is not None:
        out["delta_sigs"] = delta_sigs
        out["persisted"] = [sh_delta, delta_sigs, all_sigs, cand, sh_all]
    return verify_exact_jaccard(
        cand, sh1, sh2, all_sigs.select("id", "n"), threshold
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    from each query's ``pool`` most-relevant candidates, greedily pick
    ``k`` that trade relevance against redundancy —
    score(c) = lam·rel(q,c) − (1−lam)·max_{s∈S} sim(c,s). The diversity
    sampler for retrieval-augmented training batches and eval panels.

    Scale shape: the corpus-sized work is exactly the ``cosine_topk``
    candidate scan; MMR itself is inherently sequential (each pick
    conditions on the set so far), so it runs as a grouped-map
    ``applyInPandas`` whose per-group batch is bounded by ``pool`` rows
    (pool × dim floats), never the corpus — the same bounded-batch
    contract as PAV calibration (operators/calibration.py).

    Determinism/cross-engine: relevance is the 6dp-rounded cosine_topk
    score; pairwise sims are rounded to 6dp with the SAME sequential
    dimension-order accumulation as the JVM fold (the numpy loop below
    adds one dimension at a time), and every argmax ties on cand_id —
    so a DuckDB recursive-CTE twin reproduces the selection exactly.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    nn = cosine_topk(queries, corpus, k=pool, id_col=id_col, vec_col=vec_col)
    cand = (
        nn
        # zero-norm vectors carry NULL cosine (cosine_with_norms contract);
        # they can reach the pool when a query has < pool non-NULL
        # candidates, and a zero-norm QUERY makes every rel NULL. Inside
        # pick() a zero norm would divide to NaN, whose tuple comparisons
        # are all-False — list-order-dependent selection instead of an
        # error. Undefined relevance is excluded up front instead.
        .filter(F.col("cosine").isNotNull())
        .join(
            corpus.select(
                F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
            ),
            "cand_id",
        )
        .select("query_id", "cand_id", F.col("cosine").alias("rel"), "cv")
    )

    # id type derived from the input schema (cosine_topk_pandas/pq_topk
    # precedent) — a hardcoded LONG would break string/int32 ids
    id_type = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("mmr_rank", IntegerType()),
            StructField("cand_id", id_type),
        ]
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["cand_id"].to_numpy())  # stable input order
        ids = pdf["cand_id"].to_numpy()[order]
        rel = pdf["rel"].to_numpy(dtype=np.float64)[order]
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["cv"].to_numpy()[order]]
        )
        n, d = V.shape
        # sequential dimension-order accumulation == the JVM fold's order
        dots = np.zeros((n, n))
        sq = np.zeros(n)
        for j in range(d):
            dots += V[:, j, None] * V[None, :, j]
            sq += V[:, j] * V[:, j]
        norms = np.sqrt(sq)
        sims = np.round(dots / (norms[:, None] * norms[None, :]), 6)
        chosen: list[int] = []
        remaining = list(range(n))
        while remaining and len(chosen) < k:
            if not chosen:
                scores = [(-rel[i], ids[i], i) for i in remaining]
            else:
                scores = [
                    (
                        -(lam * rel[i] - (1 - lam) * max(sims[i, c] for c in chosen)),
                        ids[i],
                        i,
                    )
                    for i in remaining
                ]
            _, _, best = min(scores)
            chosen.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "cand_id": ids[chosen],
            }
        )

    return cand.groupBy("query_id").applyInPandas(pick, out_schema)
