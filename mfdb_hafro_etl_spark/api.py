"""Query API over the measurement fact table (SURVEY §7 M6).

The reference loads MFDB so the downstream ``mfdb`` package can
answer aggregation questions — ``mfdb_sample_count(mdb, cols,
params)`` groups the fact table by requested dimensions under
taxonomy filters, ``mfdb_sample_totalweight`` multiplies count ×
mean weight (described at reference R/initdb_add_shrimp.R:208-214).
This module is that query surface, Spark-first: every call compiles
to one filtered, partially-aggregated scan — filters push down to
the parquet scan (partition pruning on ``data_source``/``year`` when
the fact table is partitioned that way), and the groupBy shuffles
only the aggregated rows.

Filter forms: ``{"year": (1995, 2000)}`` (inclusive range),
``{"species": ["COD", "HAD"]}`` (membership), ``{"vessel": "V1-1"}``
(equality).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_filters(df: DataFrame, filters: Mapping[str, object] | None) -> DataFrame:
    for col, spec in (filters or {}).items():
        c = F.col(col)
        if isinstance(spec, tuple) and len(spec) == 2:
            df = df.filter(c.between(*spec))
        elif isinstance(spec, (list, set, frozenset)):
            df = df.filter(c.isin(*sorted(spec)))
        else:
            df = df.filter(c == spec)
    return df


def _grouped(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None,
    aggs: Sequence[Column],
) -> DataFrame:
    return _apply_filters(fact, filters).groupBy(*group_by).agg(*aggs)


def sample_count(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None = None,
    count_col: str = "count",
) -> DataFrame:
    """mfdb_sample_count analog: total measured count per group."""
    return _grouped(
        fact, group_by, filters, [F.round(F.sum(count_col), 2).alias("total_count")]
    )


def sample_totalweight(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None = None,
    count_col: str = "count",
    weight_col: str = "weight",
) -> DataFrame:
    """mfdb_sample_totalweight analog: Σ(count × weight) per group
    (weight = per-fish mean weight, reference
    R/initdb_add_shrimp.R:208-214)."""
    return _grouped(
        fact,
        group_by,
        filters,
        [F.round(F.sum(F.col(count_col) * F.col(weight_col)), 2).alias("total_weight")],
    )


def sample_meanweight(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None = None,
    count_col: str = "count",
    weight_col: str = "weight",
) -> DataFrame:
    """mfdb_sample_meanweight analog: count-weighted mean per-fish
    weight per group (NULL on zero total count)."""
    total = F.sum(count_col)
    return _grouped(
        fact,
        group_by,
        filters,
        [
            F.round(
                F.when(total == 0, F.lit(None).cast("double")).otherwise(
                    F.sum(F.col(count_col) * F.col(weight_col)) / total
                ),
                4,
            ).alias("mean_weight")
        ],
    )


def sample_meanlength_stddev(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None = None,
    count_col: str = "count",
    length_col: str = "length",
) -> DataFrame:
    """mfdb_sample_meanlength_stddev analog: count-weighted mean AND
    standard deviation of length per group, in ONE aggregation pass
    via the closed form

        var = (Σc·x² − (Σc·x)²/Σc) / (Σc − 1)

    (frequency-weighted sample variance; c = measured count). Groups
    with Σc ≤ 1 get NULL stddev. The closed form needs only three
    partial sums, so the map-side combine stays a fixed-width row —
    the two-pass mean-then-residual formulation would need a second
    shuffle over the fact table."""
    c, x = F.col(count_col), F.col(length_col)
    total = F.sum(c)
    sum_cx = F.sum(c * x)
    sum_cx2 = F.sum(c * x * x)
    mean = F.when(total == 0, F.lit(None).cast("double")).otherwise(sum_cx / total)
    var = F.when(total <= 1, F.lit(None).cast("double")).otherwise(
        (sum_cx2 - sum_cx * sum_cx / total) / (total - 1)
    )
    return _grouped(
        fact,
        group_by,
        filters,
        [
            F.round(mean, 4).alias("mean_length"),
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("stddev_length"),
        ],
    )


def sample_rawdata(
    fact: DataFrame,
    columns: Sequence[str],
    filters: Mapping[str, object] | None = None,
) -> DataFrame:
    """mfdb_sample_rawdata analog: the filtered, projected fact rows
    themselves (no aggregation) — filters and the projection both
    push down to the scan."""
    return _apply_filters(fact, filters).select(*columns)


def sample_meanlength(
    fact: DataFrame,
    group_by: Sequence[str],
    filters: Mapping[str, object] | None = None,
    count_col: str = "count",
    length_col: str = "length",
) -> DataFrame:
    """Count-weighted mean length per group with NULL-safe zero
    handling (groups with zero total count yield NULL, not a
    divide-by-zero)."""
    total = F.sum(count_col)
    return _grouped(
        fact,
        group_by,
        filters,
        [
            F.round(
                F.when(total == 0, F.lit(None).cast("double")).otherwise(
                    F.sum(F.col(count_col) * F.col(length_col)) / total
                ),
                4,
            ).alias("mean_length")
        ],
    )
