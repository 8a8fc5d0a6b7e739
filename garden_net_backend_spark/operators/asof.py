"""As-of (time-series) join — the temporal sibling of the genomic
nearest-range join (operators/interval.py; SURVEY J7 generalization).

``asof_join_backward(left, right, …)``: for every left row, the single
right row with the greatest ``right_time <= left_time`` within the same
key — the canonical "state at event time" join (quotes-to-trades,
last-click-before-purchase).

Physical plan: the union-sort pattern — tag both sides, sort within
each key by (time, side), run ``last(..., ignorenulls=True)`` over the
running window, with the LEFT payload carried through the stream so
there is no join-back (and therefore no synthetic row id — a
monotonically_increasing_id join-back diverges between plan branches
when upstream partitioning is nondeterministic). One shuffle on the
key, O(n log n), no range explosion; a hot key is one sorted partition,
not a quadratic join.

Equal timestamps: right rows sort BEFORE left rows at the same time
(inclusive ``<=``), and ties among right rows resolve to the greatest
``(time, tiebreak)`` struct — a total order, so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
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
    ``right_time <= left_time``. Returns all left columns + the right
    ``payload`` columns (NULL when no prior right row exists) +
    ``asof_time`` (the matched right time).

    ``tiebreak``: right-side column ordering ties at equal right_time
    (max wins); REQUIRED if (key, right_time) is not unique, else the
    match is nondeterministic.
    """
    left_cols = left.columns
    rv_type = (
        "struct<"
        + ",".join(
            [f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload]
            + [f"_rt:{right.schema[right_time].dataType.simpleString()}"]
        )
        + ">"
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(None).cast("long").alias("_tb"),
    )
    tb = F.col(tiebreak).cast("long") if tiebreak is not None else F.lit(0).cast("long")
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(
            *[F.col(c).alias(c) for c in payload],
            F.col(right_time).alias("_rt"),
        ).alias("_rv"),
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
        F.struct(F.col("_t").alias("t"), F.col("_tb").alias("tb"), F.col("_rv").alias("rv")),
    )
    matched = stream.withColumn("_best", F.last(packed, ignorenulls=True).over(w))
    return matched.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        F.col("_best.rv._rt").alias("asof_time"),
        *[F.col(f"_best.rv.{c}").alias(c) for c in payload],
    )
