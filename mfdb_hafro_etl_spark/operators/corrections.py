"""Correction overlay operator (SURVEY §2.10.9, J1+C1).

The reference left-joins ~12 hard-coded ``corrected_*`` tables and
applies ``nvl2(fix, fix, orig)`` per column (reference
R/shrimp_support_tables.R:2100-2132), plus rule-based
reclassification. The tables are ≤ ~700 rows (BASELINE.md) →
broadcast; the overlay is a single broadcast-hash join per correction
table with no shuffle of the fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.functions.conditionals import nvl2


def apply_correction(
    df: DataFrame,
    corrections: DataFrame,
    key: Sequence[str],
    fixes: dict[str, str],
) -> DataFrame:
    """Overlay fixes: for each (target_col -> fix_col) in ``fixes``,
    set target = nvl2(fix, fix, target) after a broadcast left join
    on ``key``. Exact nvl2 semantics per reference
    R/shrimp_support_tables.R:2112-2116."""
    keep = [c for c in corrections.columns if c in set(key) | set(fixes.values())]
    joined = df.alias("d").join(
        F.broadcast(corrections.select(*keep).alias("c")), on=list(key), how="left"
    )
    out_cols = []
    fixed = set(fixes)
    for c in df.columns:
        if c in fixed:
            out_cols.append(nvl2(F.col(f"c.{fixes[c]}"), F.col(f"c.{fixes[c]}"), F.col(f"d.{c}")).alias(c))
        elif c in key:
            out_cols.append(F.col(c))
        else:
            out_cols.append(F.col(f"d.{c}"))
    return joined.select(*out_cols)


def drop_bad_keys(df: DataFrame, bad: DataFrame, key: Sequence[str]) -> DataFrame:
    """The bad_synis_id exclusion list (reference
    R/shrimp_support_tables.R:39-53) — broadcast anti join."""
    return df.join(F.broadcast(bad.select(*key).dropDuplicates(list(key))), on=list(key), how="left_anti")
