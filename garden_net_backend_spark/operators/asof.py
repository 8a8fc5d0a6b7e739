"""As-of (time-series) join — the temporal sibling of the genomic
nearest-range join (operators/interval.py; SURVEY J7 generalization).

``asof_join_backward(left, right, …)``: for every left row, the single
right row with the greatest ``right_time <= left_time`` within the same
key — the canonical "state at event time" join (quotes-to-trades,
last-click-before-purchase).

Physical plan: the union-sort pattern — tag both sides, sort within
each key by (time, side), run ``last(..., ignorenulls=True)`` over the
running window. One shuffle on the key, O(n log n), no range
explosion, no per-key cartesian. Window state is a single row, so skew
in the key distribution degrades gracefully (a hot key is one sorted
partition, not a quadratic join).

Equal timestamps: right rows sort BEFORE left rows at the same time
(inclusive ``<=``), and ties among right rows resolve to the greatest
``(time, tiebreak)`` struct — a total order, so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: latest right row with same ``key`` and
    ``right_time <= left_time``. Returns left columns + the right
    ``payload`` columns (NULL when no prior right row exists) +
    ``asof_time`` (the matched right time).

    ``tiebreak``: right-side column ordering ties at equal right_time
    (max wins); REQUIRED if (key, right_time) is not unique, else the
    match is nondeterministic.
    """
    l_keyed = left.withColumn("_lid", F.monotonically_increasing_id())
    l_tag = l_keyed.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        "_lid",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
        F.lit(None).cast("long").alias("_tb"),
    )
    tb = (
        F.col(tiebreak).cast("long")
        if tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast("long").alias("_lid"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        F.col(right_time).alias("_rt"),
        tb.alias("_tb"),
    )
    stream = r_tag.unionByName(l_tag)
    # right rows first at equal time (inclusive <=); among right ties the
    # max (_t, _tb) struct wins via the running max of a packed struct
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"), F.col("_tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_t").alias("t"),
            F.col("_tb").alias("tb"),
            F.struct(*[F.col(f"_r_{c}").alias(c) for c in payload]).alias("p"),
            F.col("_rt").alias("rt"),
        ),
    )
    matched = stream.withColumn("_best", F.last(packed, ignorenulls=True).over(w))
    out = matched.filter(F.col("_is_left") == 1).select(
        "_lid",
        F.col("_best.rt").alias("asof_time"),
        *[F.col(f"_best.p.{c}").alias(c) for c in payload],
    )
    return l_keyed.join(out, "_lid", "left").drop("_lid")
