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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per user, the earliest time of each step that
    falls STRICTLY AFTER the user's previous-step time (view →
    click → purchase — a later click does not count toward an
    earlier purchase). Returns one row per user who entered the
    funnel: (user, t_1 .. t_k) with t_i NULL from the first step the
    user never completed in order.

    Plan shape: step 1 is a type-filtered min-aggregate; every later
    step is the type-filtered event stream joined against the
    user-count-sized prior-times frame, filtered on the ordering,
    then min-aggregated — k-1 user-keyed shuffles over streams the
    type filter has already cut down (the filter pushes to the
    scan). No window over the raw event stream, no per-user
    collection; at 100 TB each step costs one filtered
    shuffle-aggregate."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        reached = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts__"))
            .join(out.select(user_col, prev), on=user_col)
            .filter(F.col("__ts__") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("__ts__").alias(f"t_{i}"))
        )
        out = out.join(reached, on=user_col, how="left")
    return out


def daily_count_anomalies(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-user daily-activity anomalies: days whose event count sits
    more than ``z_threshold`` sample standard deviations from the
    user's own mean — the data-quality monitor a pipeline runs over
    its event stream.

    Variance is computed from EXACT integer sums (n, Σc, Σc²) rather
    than stddev_samp: engines implement streaming one-pass moments
    whose accumulation order varies, while integer sums are exact and
    the closed form ((Σc² − (Σc)²/n)/(n−1)) is then the identical
    correctly-rounded IEEE expression everywhere — the engine-
    portability discipline the oracle hash depends on.

    Plan shape: one (user, day) count aggregation, then the user-level
    moments as a window over the user partitioning (one shuffle
    chain); output is anomaly-sized. Users with a single active day or
    zero variance have no defined z and are excluded."""
    from pyspark.sql import Window

    daily = (
        events.select(F.col(user_col), F.to_date(F.col(ts_col)).alias("day"))
        .groupBy(user_col, "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy(user_col)
    cnt = F.col("n_events").cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum("n_events").over(w).cast("double")
    sq = F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("double")
    var = (sq - s * s / n) / (n - 1)
    z = (cnt - s / n) / F.sqrt(var)
    return (
        daily.withColumn("__n__", n)
        .withColumn("__var__", var)
        .filter((F.col("__n__") > 1) & (F.col("__var__") > 0))
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(user_col, F.date_format("day", "yyyy-MM-dd").alias("day"), "n_events", "z")
    )
