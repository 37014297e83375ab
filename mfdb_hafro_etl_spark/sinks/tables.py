"""Materialization + dimensional-import sinks.

The reference has three kinds of write barrier (SURVEY §3):

- ``compute(name, temporary=FALSE, indexes=list('tow'))`` — a named,
  indexed, server-side checkpoint reused by several downstream
  pipelines (reference R/initdb.R:110,151,207). Spark-first
  restatement: :func:`materialize` — parquet checkpoint, optionally
  bucketed by the "index" column so the 2-5 downstream consumers
  (SURVEY §4 "intermediate reuse") re-join WITHOUT re-shuffling.
- ``dbWriteTable(overwrite=TRUE)`` / ``dbRemoveTable`` round trips
  (reference R/initdb.R:41,69,79-82) → plain overwrite writes.
- ``mfdb_import_survey(mdb, data_source, df)`` — idempotent
  replace-by-source fact import (reference R/initdb.R:286-288 et
  al.): re-importing a data_source replaces exactly that source's
  rows and leaves every other source untouched.
  :func:`replace_by_source` = dynamic partition overwrite into a
  fact table partitioned by ``data_source`` — the replace is a
  metadata swap of one partition, never a rewrite of the table, so
  at 100 TB an import touches only the new source's bytes.
  Taxonomy foreign keys must pre-exist (unknown vessels are
  pre-registered in bulk, reference R/initdb.R:230-279) →
  :func:`require_fk` is a broadcast anti-join gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "data_source"


def materialize(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | None = None,
    repartition_by: Sequence[str] | None = None,
    n_files: int | None = None,
) -> DataFrame:
    """S11: durable checkpoint — write parquet, read it back.

    ``repartition_by`` is the Spark analog of the reference's
    ``indexes=list('tow')``: cluster the files by the join key so
    every downstream consumer scans co-located runs of that key (and
    AQE can pick shuffle-free plans after the exchange reuse).
    """
    w = df
    if repartition_by:
        if n_files:
            w = w.repartition(n_files, *repartition_by)
        else:
            w = w.repartition(*repartition_by)
    writer = w.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return df.sparkSession.read.parquet(path)


def materialize_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
) -> DataFrame:
    """S11 with the "index" made physical: bucketed (and optionally
    sorted) saveAsTable on the join key. Every downstream consumer
    that joins or aggregates on ``bucket_by`` reads co-located,
    pre-sorted buckets — the shuffle (and with sort_by, the sort)
    disappears from THEIR plans, which is exactly what the
    reference's ``indexes=list('tow')`` bought its four consumers
    (reference R/initdb.R:151; SURVEY §4). Requires a catalog table
    (bucket metadata lives in the catalog, not the parquet files)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def replace_by_source(
    df: DataFrame,
    path: str,
    data_source: str,
    *,
    partition_col: str = PARTITION_COL,
    sub_partition_cols: Sequence[str] = (),
) -> None:
    """S15: idempotent fact import — replace all rows of one
    ``data_source``, leave every other source intact (reference
    mfdb_import_survey semantics, R/initdb.R:286-288).

    Dynamic partition overwrite: only the partitions present in
    ``df`` (exactly one source — we stamp the constant) are swapped.

    ``sub_partition_cols`` (e.g. ``["year"]``) adds the scale layout
    SURVEY §4 calls for: data_source/year/... directories give
    per-source replace AND dynamic partition pruning for the query
    API's year-range filters — a year-bounded sample_count scans only
    the matching year directories of each source.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.withColumn(partition_col, F.lit(data_source))
    # Cluster rows to the partition layout before the write: without
    # it every task writes a file into every (source, year) directory
    # it saw — tasks × partitions small files whose footers every
    # later read pays to list. REBALANCE (vs a plain repartition) is
    # the scale-safe form: AQE splits any over-large partition back
    # into multiple tasks, so one huge source/year can't serialize
    # into a single writer.
    out = out.hint("rebalance", partition_col, *sub_partition_cols)
    out.write.mode("overwrite").partitionBy(partition_col, *sub_partition_cols).parquet(path)


def read_fact(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned fact table (partition pruning on
    ``data_source`` comes free for per-source queries)."""
    return spark.read.parquet(path)


def fk_violations(
    fact: DataFrame, dim: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``fact`` whose ``keys`` don't exist in ``dim`` —
    broadcast left-anti join (SURVEY §3 entry 3: FK check before
    fact-table writes). NULL keys are not violations (the reference
    allows NULL vessel, R/initdb.R:288)."""
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else cond & c
    return fact.filter(cond).join(
        F.broadcast(dim.select(*keys).dropDuplicates(list(keys))),
        on=list(keys),
        how="left_anti",
    )


def require_fk(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    *,
    label: str = "dimension",
    sample: int = 5,
) -> DataFrame:
    """Fail an import whose taxonomy values aren't registered —
    mirrors mfdb's FK enforcement (SURVEY §1.3). Returns ``fact``
    unchanged when clean."""
    bad = fk_violations(fact, dim, keys)
    rows = bad.select(*keys).dropDuplicates(list(keys)).take(sample)
    if rows:
        vals = ", ".join(str(tuple(r)) for r in rows)
        raise ValueError(
            f"unregistered {label} keys {list(keys)}: {vals} "
            f"(register them in the dimension first, as the reference "
            f"pre-registers unknown vessels)"
        )
    return fact


def import_fact(
    df: DataFrame,
    path: str,
    data_source: str,
    *,
    taxonomies: dict[str, tuple[DataFrame, Sequence[str]]] | None = None,
) -> None:
    """The full mfdb_import_survey analog: validate every taxonomy
    FK, then replace-by-source. ``taxonomies`` maps a label to
    (dimension DataFrame, fact key columns)."""
    for label, (dim, keys) in (taxonomies or {}).items():
        df = require_fk(df, dim, keys, label=label)
    replace_by_source(df, path, data_source)
