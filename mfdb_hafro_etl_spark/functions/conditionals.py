"""Conditional helpers matching Oracle/R NULL semantics (SURVEY C1).

The reference leans on Oracle ``nvl``/``nvl2``/``decode`` and R
``ifelse`` chains (reference R/initdb.R:116,175-187,214-215;
R/shrimp_support_tables.R:2112-2116). Spark's three-valued logic
differs from R ``ifelse`` in filters, so every helper here states its
NULL policy explicitly (SURVEY §7 hard part (a)).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nvl(col: Column | str, default) -> Column:
    """Oracle NVL: first non-NULL of (col, default)."""
    return F.coalesce(_col(col), F.lit(default))


def nvl2(col: Column | str, if_not_null, if_null) -> Column:
    """Oracle NVL2(x, a, b): a when x IS NOT NULL else b.

    Used for the correction overlay ``nvl2(fix, fix, orig)``
    (reference R/shrimp_support_tables.R:2112-2116).
    """
    c = _col(col)
    a = _col(if_not_null) if isinstance(if_not_null, (Column, str)) else F.lit(if_not_null)
    b = _col(if_null) if isinstance(if_null, (Column, str)) else F.lit(if_null)
    return F.when(c.isNotNull(), a).otherwise(b)


def decode(col: Column | str, mapping: Iterable[tuple[object, object]], default=None) -> Column:
    """Oracle DECODE as a when-chain.

    Mirrors the 13-branch vessel-type decode (reference
    R/initdb.R:175-187). Oracle DECODE treats NULL == NULL as a match;
    we honor that: a NULL key in ``mapping`` matches NULL input.
    """
    c = _col(col)
    expr: Column | None = None
    for key, val in mapping:
        cond = c.isNull() if key is None else (c == F.lit(key))
        v = F.lit(val)
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))
