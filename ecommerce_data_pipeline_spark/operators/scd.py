"""Slowly-changing-dimension (type 2) merge — versioned dimension history.

The reference's EP1 only ever inserts new keys (``dimension_tables_mock.
py:61-73``): attribute changes to existing products/customers are lost.
SCD2 is the warehouse-standard fix — keep every version with a validity
interval. This is the natural extension of the engine's dimension-refresh
path (``ingest.refresh_dimension``) for feeds that update attributes.

Plan shape: changed-row detection is one join keyed on the business key
(broadcast when the update batch is small — the common case), and
interval maintenance touches only the affected keys' current rows. No
window over the whole dimension, no full rewrite of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(dim: DataFrame, as_of) -> DataFrame:
    """Bootstrap a versioned dimension from a plain snapshot."""
    return (
        dim.withColumn("valid_from", F.lit(as_of).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    as_of,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Merge an update snapshot into SCD2 history.

    - brand-new keys → inserted as current versions
    - changed attributes → old version closed (valid_to = as_of,
      is_current = false), new version opened
    - unchanged rows and non-current history → untouched

    Returns the full new history DataFrame (caller persists it —
    on a real deployment this is a MERGE INTO against a transactional
    table format; the logic is identical).
    """
    # attr_cols = every column CARRIED into new versions; compare_cols
    # only narrows the CHANGE DETECTION. Conflating the two (the old
    # behavior) dropped non-compared attributes from new versions and
    # crashed the final unionByName.
    attr_cols = [c for c in updates.columns if c != key and c not in META_COLS]
    cmp_cols = list(compare_cols) if compare_cols else attr_cols
    missing = [c for c in cmp_cols if c not in attr_cols]
    if missing:
        raise ValueError(f"compare_cols not in updates: {missing}")
    ts = F.lit(as_of).cast("timestamp")

    current = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    # compare update rows against the current version of their key;
    # null-safe equality so NULL→value and value→NULL count as changes
    upd = updates.select(key, *attr_cols)
    cur_cmp = current.select(
        F.col(key), *[F.col(c).alias(f"_cur_{c}") for c in cmp_cols]
    )
    unchanged_pred = F.lit(True)
    for c in cmp_cols:
        unchanged_pred = unchanged_pred & F.col(c).eqNullSafe(F.col(f"_cur_{c}"))
    # a key with no current row joins to all-null _cur columns, which a
    # legitimately-all-NULL update row would mimic — detect "has a current
    # version" with an explicit marker instead of attribute nulls
    cur_keys = current.select(key).withColumn("_has_cur", F.lit(True))
    joined = upd.join(cur_cmp, key, "left").join(cur_keys, key, "left")
    changed_or_new = joined.filter(
        F.col("_has_cur").isNull() | ~unchanged_pred
    ).select(key, *attr_cols)

    new_versions = scd2_init(changed_or_new, as_of)

    # close the displaced current versions
    displaced_keys = changed_or_new.join(cur_keys.drop("_has_cur"), key, "left_semi")
    to_close = current.join(displaced_keys.select(key), key, "left_semi")
    still_open = current.join(displaced_keys.select(key), key, "left_anti")
    closed_now = to_close.withColumn("valid_to", ts).withColumn(
        "is_current", F.lit(False)
    )

    return closed.unionByName(closed_now).unionByName(still_open).unionByName(
        new_versions
    )


def scd1_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD type-1 upsert: overwrite-in-place dimension maintenance —
    updated keys replace their old row, new keys insert, everything else
    passes through. No history kept (that is scd2_merge's job).

    Plan shape: ONE anti join (current rows whose key is not updated)
    plus a union — the update side is broadcast when small (the common
    dimension-refresh case), so the big current table never shuffles.
    """
    survivors = current.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates.select(*current.columns))


def cdc_compact(changelog: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """Compact an ordered upsert/delete changelog to its final snapshot:
    last writer wins per key (ordered by ``order_cols``, which must be a
    unique tiebreak), and keys whose latest op is ``'D'`` disappear.
    Expects an ``op`` column of 'U'/'D'; all other columns pass through.

    One shuffle on the key, a partitioned latest-row pick, a filter —
    the merge-on-read compaction shape (see the registered
    ``cdc_apply_snapshot`` query for the oracle-checked twin)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") == "U"))
        .drop("__rn")
    )


def cdc_apply_increment(
    snapshot: DataFrame, batch: DataFrame, key: str, order_cols: list[str]
) -> DataFrame:
    """Incrementally advance a compacted snapshot with one new changelog
    micro-batch: union the prior snapshot (its rows are implicit 'U'
    entries at their original order position) with the batch, then
    re-compact. Because compaction is associative over ordered batches,
    folding batches one at a time equals compacting the full log in one
    shot (pinned by test_cdc_incremental_fold_equals_batch_compaction) —
    the property that lets a foreachBatch sink maintain the snapshot
    with per-batch work proportional to |snapshot|+|batch|, never the
    full history.

    Caveat: the equivalence requires batches to partition the log in
    ``order_cols`` order (the streaming watermark guarantee). With
    cross-batch late data, a delete tombstone dropped at compaction
    time can no longer veto an older update arriving later — retain
    tombstones (filter ``op='D'`` only at read time) if the source can
    reorder across batches."""
    return cdc_compact(snapshot.unionByName(batch), key, order_cols)


def scd2_as_of(history: DataFrame, as_of) -> DataFrame:
    """Point-in-time (time-travel) read of an SCD2 history: the version
    of each key whose validity interval covers ``as_of``
    (valid_from <= t < valid_to, open current versions included). A pure
    filter — partition/file pruning applies when history is stored
    partitioned by valid_from, so reconstructing ANY past state is a
    pruned scan, never a replay."""
    ts = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    ).drop("valid_from", "valid_to", "is_current")
