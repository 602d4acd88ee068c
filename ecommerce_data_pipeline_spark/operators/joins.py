"""Join strategies: fact⋈dim enrichment, semi/anti, as-of, range.

Reference parity:
- J1: the Glue job "Read and join transactions with product and cusotmer
  dim tables" (name at ``transactions_mock_data.py:17``, trigger
  ``:105-123``) — enrich each fact row with both dimensions.
  ``enrich_facts`` broadcasts the dims explicitly: dims are tiny relative
  to the fact stream (10/run vs 100/run in the reference; MBs vs TBs at
  target scale), so the fact side never shuffles.
- J6 as-of / range joins are [builtin-gap] additions expressed as
  compositions of built-in ops (union-sort trick / non-equi condition), no
  custom physical operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich_facts(
    facts: DataFrame,
    dims: dict[str, DataFrame],
    how: str = "inner",
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: join the fact table with each dimension on its FK column.

    ``dims`` maps join-key column name → dimension DataFrame. With
    ``broadcast_dims`` the plan is N chained BroadcastHashJoins — zero
    shuffles of the fact side, the only plan that survives a 100 TB fact
    stream. FK integrity holds by construction in the reference
    (``transactions_mock_data.py:64-71``), so inner == left in row count.
    """
    out = facts
    for key, dim in dims.items():
        rhs = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(rhs, on=key, how=how)
    return out


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) within the same ``on`` key.

    Implemented with the union-sort trick: tag both sides, sort within the
    key by time, and carry the last-seen right row forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key — no per-row
    Python, no cross product — versus the naive non-equi join which
    explodes at scale.
    """
    if direction != "backward":
        raise ValueError("only 'backward' as-of is implemented")
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right.columns) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    )
    # right rows sort before left rows at equal timestamps (_side 0 < 1),
    # so an exact-tie right row IS visible to the left row (<= semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    keep = unioned.filter(F.col("_side") == 1)
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"right_{c}") for c in right.columns if c != on
    ]
    return keep.select(*cols)


def range_join(
    left: DataFrame, right: DataFrame, point: str, lo: str, hi: str
) -> DataFrame:
    """J6 range join: left.point ∈ [right.lo, right.hi).

    Plain non-equi condition; Spark plans BroadcastNestedLoopJoin when the
    range side is broadcast-able (the common case: a bucket/calendar table).
    """
    cond = (F.col(point) >= right[lo]) & (F.col(point) < right[hi])
    return left.join(F.broadcast(right), cond, "inner")


def as_of_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """``as_of_join``'s Arrow twin via ``cogroup().applyInPandas`` —
    the grouped-map physical strategy for as-of alignment.

    Both sides shuffle ONCE on the key (exactly like the union-sort
    form), then each key's two frames meet in a single Arrow batch where
    ``pandas.merge_asof`` (backward, tie-inclusive — the same semantics
    the union-sort form implements with the _side sort trick) does the
    alignment. Same output contract as ``as_of_join``: left columns +
    ``right_<col>`` for every non-key right column; the equivalence is
    asserted row-for-row in tests/test_operators.py.

    When to prefer which: the union-sort form stays entirely JVM-side
    (no Python workers — the repo default); this form is the template
    for per-key logic that ISN'T expressible as window carry-forward
    (interval intersection, per-key curve fitting, custom matchers) and
    costs one Arrow hop. A key whose rows exceed one Arrow batch is the
    scale limit — same per-group bound as every grouped-map operator.
    """
    import pandas as pd

    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    r_keep = [c for c in right.columns if c != on]
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(f"right_{f.name}", f.dataType, True)
            for f in right.schema.fields
            if f.name != on
        ]
    )
    out_names = [f.name for f in out_schema.fields]
    # pandas nullable dtype per right column: unmatched lefts get NaN
    # from merge_asof, which must round-trip to Spark NULL for EVERY
    # type — a bare float64 NaN would crash Arrow conversion for
    # narrower ints and silently arrive as NaN (not NULL) for doubles
    _NULLABLE = {
        ByteType: "Int8",
        ShortType: "Int16",
        IntegerType: "Int32",
        LongType: "Int64",
        FloatType: "Float32",
        DoubleType: "Float64",
    }
    nullable_casts = {
        f"right_{f.name}": _NULLABLE[type(f.dataType)]
        for f in right.schema.fields
        if f.name != on and type(f.dataType) in _NULLABLE
    }

    # Rename the right columns SPARK-side before the cogroup: when both
    # sides share lineage (e.g. two filters of one scan) identically-named
    # attributes carry the same exprId and the FlatMapCoGroupsInPandas
    # dedup can prune the right side's copy — some groups then arrive in
    # Python missing that column (observed: right frame without `ts` on
    # the events self-cogroup). Distinct names sidestep the ambiguity.
    right_renamed = right.select(
        F.col(on), *[F.col(c).alias(f"right_{c}") for c in r_keep]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=out_names)
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.drop(columns=[on])
        if r.empty:
            m = l.copy()
            for c in r_keep:
                m[f"right_{c}"] = None
        else:
            r = r.sort_values(f"right_{right_ts}", kind="mergesort")
            m = pd.merge_asof(
                l,
                r,
                left_on=left_ts,
                right_on=f"right_{right_ts}",
                direction="backward",
                allow_exact_matches=True,
            )
        # unmatched lefts: NaN -> pandas nullable dtype -> Spark NULL
        for c, dt in nullable_casts.items():
            m[c] = m[c].astype(dt)
        return m[out_names]

    return (
        left.groupBy(on)
        .cogroup(right_renamed.groupBy(on))
        .applyInPandas(merge, out_schema)
    )
