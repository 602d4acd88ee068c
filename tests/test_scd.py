"""SCD2 dimension-history merge semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.scd import scd2_init, scd2_merge

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "product_id string, category string, price double")


def test_scd2_full_lifecycle(spark):
    hist = scd2_init(
        _snap(spark, [("p1", "Books", 10.0), ("p2", "Toys", 20.0)]), T0
    )

    # t1: p1 price changes, p2 unchanged, p3 appears
    hist = scd2_merge(
        hist,
        _snap(spark, [("p1", "Books", 12.0), ("p2", "Toys", 20.0), ("p3", "Home", 5.0)]),
        "product_id",
        T1,
    )
    rows = {(r["product_id"], r["price"], r["is_current"], r["valid_to"])
            for r in hist.collect()}
    assert ("p1", 10.0, False, T1) in rows          # old version closed at t1
    assert ("p1", 12.0, True, None) in rows         # new version open
    assert ("p2", 20.0, True, None) in rows         # untouched
    assert ("p3", 5.0, True, None) in rows          # new key
    assert hist.count() == 4

    # t2: re-applying the same snapshot is a no-op (idempotence)
    hist2 = scd2_merge(
        hist,
        _snap(spark, [("p1", "Books", 12.0), ("p2", "Toys", 20.0), ("p3", "Home", 5.0)]),
        "product_id",
        T2,
    )
    assert hist2.count() == 4
    assert hist2.filter(F.col("is_current")).count() == 3

    # t2': p1 changes again — history keeps all three versions in order
    hist3 = scd2_merge(
        hist, _snap(spark, [("p1", "Books", 15.0)]), "product_id", T2
    )
    p1 = sorted(
        [(r["price"], r["valid_from"], r["valid_to"]) for r in
         hist3.filter(F.col("product_id") == "p1").collect()]
    )
    assert p1 == [(10.0, T0, T1), (12.0, T1, T2), (15.0, T2, None)]


def test_scd2_as_of_reconstruction(spark):
    """Point-in-time reads: the version valid at any timestamp is the one
    whose [valid_from, valid_to) interval contains it."""
    hist = scd2_init(_snap(spark, [("p1", "Books", 10.0)]), T0)
    hist = scd2_merge(hist, _snap(spark, [("p1", "Books", 12.0)]), "product_id", T1)
    hist = scd2_merge(hist, _snap(spark, [("p1", "Books", 15.0)]), "product_id", T2)

    def as_of(ts):
        return (
            hist.filter(
                (F.col("valid_from") <= F.lit(ts))
                & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
            )
            .select("price")
            .collect()[0]["price"]
        )

    assert as_of(datetime.datetime(2024, 1, 15)) == 10.0
    assert as_of(datetime.datetime(2024, 2, 15)) == 12.0
    assert as_of(datetime.datetime(2024, 3, 15)) == 15.0


def test_scd1_upsert_overwrites_inserts_preserves(spark):
    from ecommerce_data_pipeline_spark.operators.scd import scd1_upsert

    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "price"],
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (9, "z", 90.0)], ["k", "name", "price"]
    )
    out = {r["k"]: (r["name"], r["price"]) for r in scd1_upsert(current, updates, "k").collect()}
    assert out == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        3: ("c", 30.0),
        9: ("z", 90.0),
    }


def test_cdc_incremental_fold_equals_batch_compaction(spark):
    """Folding an ordered changelog through cdc_apply_increment one
    micro-batch at a time must equal one-shot cdc_compact of the full
    log — the associativity that makes the foreachBatch CDC sink
    correct. Includes delete-then-reinsert and upsert-after-delete
    lifecycles."""
    from ecommerce_data_pipeline_spark.operators.scd import (
        cdc_apply_increment,
        cdc_compact,
    )

    schema = "k string, seq long, op string, v double"
    log = [
        # k1: update, update -> final v=2
        ("k1", 1, "U", 1.0), ("k1", 4, "U", 2.0),
        # k2: update then delete -> gone
        ("k2", 2, "U", 9.0), ("k2", 5, "D", 0.0),
        # k3: delete (no prior), then reinsert -> v=7
        ("k3", 3, "D", 0.0), ("k3", 6, "U", 7.0),
        # k4: single insert -> v=4
        ("k4", 7, "U", 4.0),
    ]
    full = spark.createDataFrame(log, schema)
    oneshot = sorted(
        tuple(r) for r in cdc_compact(full, "k", ["seq"]).collect()
    )

    # fold in three seq-ordered micro-batches
    batches = [
        [r for r in log if r[1] <= 2],
        [r for r in log if 3 <= r[1] <= 5],
        [r for r in log if r[1] >= 6],
    ]
    snap = spark.createDataFrame([], schema)
    for b in batches:
        snap = cdc_apply_increment(
            snap, spark.createDataFrame(b, schema), "k", ["seq"]
        )
    folded = sorted(tuple(r) for r in snap.collect())

    assert folded == oneshot
    assert {r[0] for r in folded} == {"k1", "k3", "k4"}
    assert dict((r[0], r[3]) for r in folded) == {"k1": 2.0, "k3": 7.0, "k4": 4.0}


def test_cdc_compact_properties_random_logs(spark):
    """Property test: for random changelogs, compaction (a) keeps at
    most one row per key, (b) keeps exactly the max-seq row of keys
    whose latest op is U, (c) drops keys whose latest op is D, and
    (d) is idempotent (compacting a snapshot changes nothing)."""
    import random

    from ecommerce_data_pipeline_spark.operators.scd import cdc_compact

    rng = random.Random(7)
    schema = "k string, seq long, op string, v double"
    for trial in range(3):
        keys = [f"k{i}" for i in range(rng.randint(3, 12))]
        log, seq = [], 0
        for _ in range(rng.randint(10, 60)):
            seq += 1
            log.append(
                (rng.choice(keys), seq,
                 "D" if rng.random() < 0.3 else "U",
                 round(rng.uniform(0, 100), 2))
            )
        df = spark.createDataFrame(log, schema)
        snap = cdc_compact(df, "k", ["seq"])
        rows = snap.collect()

        latest = {}
        for k, s, op, v in log:
            if k not in latest or s > latest[k][0]:
                latest[k] = (s, op, v)
        expected = {
            k: (s, op, v) for k, (s, op, v) in latest.items() if op == "U"
        }
        assert {r.k for r in rows} == set(expected), f"trial {trial}"
        for r in rows:
            assert (r.seq, r.op, r.v) == expected[r.k], f"trial {trial}"
        # idempotence
        again = cdc_compact(snap, "k", ["seq"]).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_scd2_merge_compare_cols_subset_carries_all_columns(spark):
    """compare_cols narrows change DETECTION only — non-compared
    attributes must still be carried into the new versions (this
    previously dropped them and crashed the unionByName)."""
    import datetime as dt

    from ecommerce_data_pipeline_spark.operators.scd import scd2_init, scd2_merge

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    base = spark.createDataFrame(
        [(1, "Electronics", 10.0), (2, "Toys", 5.0)],
        "product_id long, category string, price double",
    )
    hist = scd2_init(base, t0)
    updates = spark.createDataFrame(
        [(1, "Electronics-renamed", 12.0), (2, "Toys", 5.0)],
        "product_id long, category string, price double",
    )
    out = scd2_merge(hist, updates, "product_id", t1, compare_cols=["price"])
    rows = {(r["product_id"], r["is_current"]): r for r in out.collect()}
    # product 1: price changed -> closed old + new current carrying the
    # UPDATED category column (it rides along even though un-compared)
    assert rows[(1, True)]["price"] == 12.0
    assert rows[(1, True)]["category"] == "Electronics-renamed"
    assert rows[(1, False)]["price"] == 10.0
    # product 2: price unchanged -> untouched, category compare skipped
    assert rows[(2, True)]["price"] == 5.0
    import pytest

    with pytest.raises(ValueError, match="compare_cols"):
        scd2_merge(hist, updates, "product_id", t1, compare_cols=["nope"])
