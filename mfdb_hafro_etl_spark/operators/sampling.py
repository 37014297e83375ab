"""Deterministic sampling / dataset-split operators (driver extension
scope — the train/valid/test plumbing of a training-data pipeline).

Everything is content-hash based, NOT RNG based: a row's split or
sample membership is a pure function of its id, so results are
reproducible across runs, engines, partitionings and cluster sizes —
``df.sample()``'s seed is partition-dependent and resamples when the
layout changes, which silently leaks test data across reruns at
scale. md5-derived buckets are uniform to ~2^-64 and reproducible in
ANSI SQL for the oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits. A 60-bit integer is NOT exactly
# representable in a double (exact only to 2^53) — portability comes
# from both engines performing the SAME correctly-rounded int→double
# conversion and IEEE division, not from exactness.
_BUCKET_HEX = 15
_BUCKET_MAX = float(16 ** _BUCKET_HEX)


def hash_unit(col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) value derived from md5(salt || id) — the
    deterministic replacement for rand(seed). Engine-portable because
    conv→double rounding and the division are identical
    correctly-rounded IEEE operations in Spark and the SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, _BUCKET_HEX), 16, 10).cast("double") / F.lit(_BUCKET_MAX)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Reproducible ~fraction sample: keeps rows whose hash_unit falls
    below ``fraction``. Membership is stable under repartition,
    re-run, and engine change; disjoint samples come from different
    salts."""
    return df.filter(hash_unit(id_col, salt) < fraction)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling: a row survives iff
    hash_unit(id) < rates[stratum]. The workhorse of corpus mixing —
    'keep 100% of books, 30% of web, 5% of logs' — with the same
    reproducibility guarantees as hash_split: membership is a pure
    function of (id, salt), independent of partitioning and engine.

    The rate lookup is a literal CASE expression (rates tables are
    policy-sized), so the whole operator is one codegen'd filter — no
    join, no shuffle, and the filter pushes to the scan when id and
    stratum are plain columns."""
    u = hash_unit(id_col, salt)
    rate: Column | None = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == name
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(u < rate)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment: cumulative
    hash_unit boundaries in the given order. Fractions must sum to
    1.0; every row lands in exactly one split, forever — the property
    that keeps held-out data held out across pipeline reruns."""
    splits = dict(splits or {"train": 0.98, "valid": 0.01, "test": 0.01})
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    u = hash_unit(id_col, salt)
    expr: Column | None = None
    names = list(splits)
    # cumulative boundaries via fsum of the prefix — repeated float
    # adds drift (0.8 + 0.1 = 0.9000000000000001), which would open a
    # ~1e-16 window where the engine boundary disagrees with the
    # documented/oracle literal (e.g. 0.9)
    import math

    for i, name in enumerate(names[:-1]):
        acc = math.fsum(splits[n] for n in names[: i + 1])
        expr = F.when(u < acc, F.lit(name)) if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def per_group_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-group sample — the distributed,
    reproducible replacement for per-group reservoir sampling: rank
    rows within each group by hash_unit(id) (id as tie-break for the
    measure-zero hash-collision case) and keep the k smallest.

    Scale shape: ONE window pass over the group partitioning — no
    collect, no per-group loop; at 100 TB this is a single shuffle
    on the group key, and skewed groups cost what any windowed
    top-k costs (AQE skew handling applies). Membership is a pure
    function of (id, salt) ∩ group top-k, so adding rows to a group
    only evicts the largest-hash members — the stable-under-append
    property reservoir sampling is used for."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_unit(id_col, salt).asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )
