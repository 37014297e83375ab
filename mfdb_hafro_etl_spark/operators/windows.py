"""Window-function operators (SURVEY §2.5 W1-W4, §2.4 A3-A6).

The reference relies on file/read order for ``id = 1:n()`` and
duplicate-dropping (reference R/initdb.R:32;
R/shrimp_support_tables.R:464-475) — order-dependence the engine
engineers away with explicit orderBy (SURVEY §4 hazards). Every
helper here takes explicit ordering keys and is deterministic under
repartition/shuffle (property-tested).

Scale note: a Window.partitionBy over a high-cardinality key is a
single shuffle on that key; the global-order ``sequential_id`` is the
one intrinsically serial op — prefer ``zipWithIndex``-free
monotonically_increasing_id when ids only need uniqueness, and the
window form only for reference-exact dense ids on dimension-sized
data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequential_id(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "id",
    start: int = 1,
) -> DataFrame:
    """W1: deterministic ``mutate(id = 1:n())`` (reference
    R/initdb.R:32,166) — row_number over explicit order. Intended for
    dimension-sized frames (single-partition window)."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, (F.row_number().over(w) + start - 1).cast("int"))


def keep_first_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """A3/A6/W3/W4: deterministic ``distinct(keys, .keep_all=TRUE)`` /
    ``head(x,1)`` per group (reference R/initdb.R:338;
    R/initdb_add_shrimp.R:149; R/shrimp_support_tables.R:464-475).
    One shuffle on the group keys.

    Deterministic iff ``order_by`` totally orders each group's rows
    up to full-row equality — with a partial order, row_number
    tie-breaks on physical row order, which shuffling changes
    (exactly the reference hazard this operator exists to fix;
    property-tested in tests/test_determinism.py)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def with_group_count(
    df: DataFrame,
    keys: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """A4/W2: grouped count as a column without collapsing rows
    (reference R/initdb_add_shrimp.R:150-154 towcount)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(count_col, F.count(F.lit(1)).over(w))


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """F7: grouped filter n()>1 — duplicate detection (reference
    R/shrimp_support_tables.R:467-468,1919-1920)."""
    return with_group_count(df, keys, "__n__").filter(F.col("__n__") > 1).drop("__n__")
