"""Event sessionization + time-window aggregation (batch forms).

The reference is purely batch-relational (SURVEY §2.9) — these
operators cover the driver's events table and mirror what the
streaming/ package does incrementally with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds the gap. Adds
    ``session_id`` = '<user>-<running count of session starts>'.

    One shuffle (partitionBy user); within-partition lag + running
    sum — the classic batch sessionizer, deterministic for a fixed
    (user, ts, event_id) order."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_start = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    sess_no = F.sum(is_start).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_no", sess_no).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_no").cast("string")),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session event count + duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double")), 3
        ).alias("duration_s"),
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregate via the built-in window() generator
    (identical semantics to the Structured Streaming variant in
    streaming/windows.py — same code path, batch source)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )
