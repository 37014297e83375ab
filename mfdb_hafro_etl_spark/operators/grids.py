"""Row generators / grid expansion (SURVEY S10, J8).

The reference materializes dense year×month×cell grids with
``expand.grid`` (reference R/initdb.R:56-59,506,531,565) — up to
~1.7M rows generated client-side in R. Here grids are generated
distributed with ``sequence``+``explode`` (no driver-side data, no
collect): at 100 TB the grid is a few generated partitions crossed
against a broadcast cell list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def year_month_grid(spark: SparkSession, year_lo: int, year_hi: int) -> DataFrame:
    """All (year, month) pairs in [year_lo, year_hi] × [1,12],
    generated distributed via spark.range (no driver loop)."""
    years = spark.range(year_lo, year_hi + 1).select(F.col("id").cast("int").alias("year"))
    return years.select(
        "year", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("month")
    )


def temperature_grid(
    spark: SparkSession,
    cells: DataFrame,
    cell_col: str,
    year_lo: int = 1900,
    year_hi: int = 2100,
    temperature: float = 3.0,
) -> DataFrame:
    """The reference's dense temperature grid (reference
    R/initdb.R:56-59): year×month×areacell with constant temperature.
    cells is dimension-sized → crossJoin(broadcast) keeps the big side
    partitioned by generated range."""
    return (
        year_month_grid(spark, year_lo, year_hi)
        .crossJoin(F.broadcast(cells.select(cell_col).dropDuplicates()))
        .withColumn("temperature", F.lit(temperature))
    )


def month_spread(
    df: DataFrame,
    value_col: str,
    out_col: str,
    divisor: float = 12.0,
) -> DataFrame:
    """J8: fan each annual row into 12 monthly rows with value/12 —
    the foreign/old landings month-spread (reference
    R/initdb.R:506,511,531,535,565,567). explode(sequence) instead of
    joining a materialized grid: stays narrow, no shuffle."""
    return df.withColumn(
        "month", F.explode(F.sequence(F.lit(1), F.lit(12)))
    ).withColumn(out_col, F.col(value_col) / F.lit(divisor))
