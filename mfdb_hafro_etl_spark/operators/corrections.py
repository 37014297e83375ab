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

from mfdb_hafro_etl_spark.exprcache import column_template
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
    out_cols = _overlay_cols(
        tuple(df.columns), tuple(key), tuple(sorted(fixes.items()))
    )
    return joined.select(*out_cols)


@column_template
def _overlay_cols(
    cols: tuple[str, ...], key: tuple[str, ...], fixes: tuple[tuple[str, str], ...]
) -> tuple:
    """Per-output-column overlay expressions — memoized template
    (exprcache): a wide fact overlaid with several correction tables
    rebuilt one Column per fact column per table, every query."""
    fix_map = dict(fixes)
    out = []
    for c in cols:
        if c in fix_map:
            f = fix_map[c]
            out.append(nvl2(F.col(f"c.{f}"), F.col(f"c.{f}"), F.col(f"d.{c}")).alias(c))
        elif c in key:
            out.append(F.col(c))
        else:
            out.append(F.col(f"d.{c}"))
    return out


def drop_bad_keys(df: DataFrame, bad: DataFrame, key: Sequence[str]) -> DataFrame:
    """The bad_synis_id exclusion list (reference
    R/shrimp_support_tables.R:39-53) — broadcast anti join."""
    return df.join(F.broadcast(bad.select(*key).dropDuplicates(list(key))), on=list(key), how="left_anti")
