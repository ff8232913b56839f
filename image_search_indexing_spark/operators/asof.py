"""As-of (temporal nearest / latest-before) joins.

Reference J2: ``FullImageMetadata.java:295-320`` assigns each page record
the image capture whose timestamp is *closest* to the page timestamp
(TreeMap floor/ceiling, ties to floor). Spark has no native as-of join;
this implements it as a **union + window** plan: tag both sides, union on
the key, sort by (time, side-tag), and carry the last/nearest right-side
row to each left row with ``last(..., ignorenulls)`` — one shuffle on
(key), no per-group Python, skew handled by AQE.

``asof_backward`` = latest right row with rt <= lt (DuckDB ``ASOF JOIN``
semantics, used by the oracle); ``asof_nearest`` = the reference's
nearest-with-floor-ties (J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts (per key). Right rows must be unique per
    (key, right_ts) for determinism — pre-aggregate if not."""
    rp = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    lp = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    unioned = lp.withColumn("__r", F.lit(None).cast(rp.schema["__r"].dataType)).unionByName(
        rp.withColumn("__l", F.lit(None).cast(lp.schema["__l"].dataType))
    )
    # right rows sort before left rows at equal timestamps → "<=" semantics
    w = Window.partitionBy("__k").orderBy("__t", "__side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1).select("__l.*", "__match")
    for c in payload:
        out = out.withColumn(c, F.col("__match")[c])
    return out.drop("__match")


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Reference J2 semantics (FullImageMetadata.java:295-320): the right
    row whose timestamp is nearest to left_ts; exact ties → the floor
    (earlier) row. Built as backward ∪ forward carries + a nearest pick."""
    rp = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in [right_ts, *payload]]).alias("__r"),
    )
    lp = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    unioned = lp.withColumn("__r", F.lit(None).cast(rp.schema["__r"].dataType)).unionByName(
        rp.withColumn("__l", F.lit(None).cast(lp.schema["__l"].dataType))
    )
    wb = Window.partitionBy("__k").orderBy("__t", "__side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("__k").orderBy("__t", F.col("__side").desc()).rowsBetween(
        0, Window.unboundedFollowing
    )
    carried = unioned.withColumn("__b", F.last("__r", ignorenulls=True).over(wb)).withColumn(
        "__f", F.first("__r", ignorenulls=True).over(wf)
    )
    lt = F.col("__t")
    bd = lt - F.col("__b")[right_ts]
    fd = F.col("__f")[right_ts] - lt
    nearest = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(fd < bd, F.col("__f"))
        .otherwise(F.col("__b"))  # ties → floor (earlier), as in the TreeMap
    )
    out = carried.where(F.col("__side") == 1).withColumn("__m", nearest).select("__l.*", "__m")
    for c in payload:
        out = out.withColumn(c, F.col("__m")[c])
    return out.drop("__m")
