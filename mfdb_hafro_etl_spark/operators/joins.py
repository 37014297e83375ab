"""Join operators (SURVEY §2.3 J1-J10).

The reference's single most load-bearing operator family. Spark
notes baked in here:

- dimension sides are broadcast explicitly (J3 note: species_key 30
  rows ... all broadcast-sized) — at 100 TB the fact side never
  shuffles for a dim lookup;
- the temporal (as-of) join J7 puts the range predicate INTO the join
  condition so Catalyst plans one broadcast-hash join + filter rather
  than an equi-join followed by a separate filter stage;
- keys are always explicit (the reference's natural joins J1 are a
  hazard — SURVEY §4 "known reference hazards").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Fact ⋈ broadcast(dimension). The J1/J2/J3 workhorse: the dim
    side is always broadcast (reference dims are ≤ ~1000 rows —
    SURVEY §2.3 broadcast note)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def temporal_join(
    left: DataFrame,
    registry: DataFrame,
    key: str,
    registry_key: str,
    event_date: str,
    valid_from: str,
    valid_to: str,
    *,
    closed: str = "right",
    how: str = "left",
    broadcast_registry: bool = True,
) -> DataFrame:
    """SCD-2 valid-time (as-of) resolution — J7.

    The reference does left_join on skip_nr then filters
    ``dags > i_gildi & dags <= ur_gildi`` (reference
    R/initdb.R:106-108) or ``l_dags < ur_gildi & l_dags > i_gildi``
    (R/initdb.R:348-349) — note the two call sites use different
    interval bounds; ``closed`` preserves each exactly
    (SURVEY §7 hard part (c)).

    closed='right'  → (from, to]   (initdb.R:108 semantics)
    closed='none'   → (from, to)   (initdb.R:349 semantics)

    Implemented as ONE join with the range predicate in the join
    condition: Catalyst broadcasts the registry and evaluates the
    band inside the hash join — no second shuffle, no post-filter
    stage. With a left join, events with no valid interval survive
    with NULL registry columns (the reference's NULL-tolerant arms).
    """
    ev = F.col(f"l.{event_date}")
    lo = F.col(f"r.{valid_from}")
    hi = F.col(f"r.{valid_to}")
    if closed == "right":
        band = (ev > lo) & (ev <= hi)
    elif closed == "none":
        band = (ev > lo) & (ev < hi)
    elif closed == "left":
        band = (ev >= lo) & (ev < hi)
    elif closed == "both":
        band = (ev >= lo) & (ev <= hi)
    else:
        raise ValueError(f"closed={closed!r}")
    cond = (F.col(f"l.{key}") == F.col(f"r.{registry_key}")) & band
    r = registry.alias("r")
    if broadcast_registry:
        # dimension-sized registry (the reference's vessel history):
        # broadcast-hash join, band evaluated inside the join
        r = F.broadcast(r)
    # else: equi-key sort-merge join with the band as a join filter —
    # the right plan when the registry is fact-sized
    return left.alias("l").join(r, on=cond, how=how)


def join_coalesce(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    prefer_right_when: Column | None = None,
    cols: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """J9: join then conditionally pick right-side duplicates of
    ``cols`` (reference R/initdb_add_shrimp.R:338-341 ``areacell =
    ifelse(kfteg %in% …, areacell.y, areacell.x)``). With no
    condition, falls back to plain coalesce(right, left)."""
    l, r = left.alias("l"), right.alias("r")
    out = l.join(F.broadcast(r), on=list(on), how=how)
    for c in cols:
        lc, rc = F.col(f"l.{c}"), F.col(f"r.{c}")
        if prefer_right_when is not None:
            picked = F.when(prefer_right_when, rc).otherwise(lc)
        else:
            picked = F.coalesce(rc, lc)
        out = out.withColumn(f"__{c}__", picked)
    keep = [c for c in left.columns if c not in cols]
    sel = [F.col(f"l.{c}") for c in keep]
    sel += [F.col(f"__{c}__").alias(c) for c in cols]
    sel += [F.col(f"r.{c}") for c in right.columns if c not in cols and c not in on and c not in left.columns]
    return out.select(*sel)


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J6: rows of left with no key match in right (the incremental
    'drop already-imported stations' idiom, reference
    R/initdb_add_shrimp.R:169)."""
    return left.join(right.select(*on).dropDuplicates(list(on)), on=list(on), how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J10: whitelist filter — cleaner than the reference's
    inner-join-on-key-only-table idiom (reference R/initdb.R:204,296)."""
    return left.join(F.broadcast(right.select(*on).dropDuplicates(list(on))), on=list(on), how="left_semi")
