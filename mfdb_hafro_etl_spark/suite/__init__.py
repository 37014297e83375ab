"""Query suite: one entry per implemented operator (SURVEY §2).

Each query is registered with an ANSI-SQL DuckDB oracle; the driver
hash-compares them at sf0.01 (CORRECTNESS gate). Column names are
aliased identically on both sides; float outputs are rounded on both
sides so cross-engine summation order can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query; ``sql`` is
    the DuckDB oracle (omit only for non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# Importing submodules populates the registries.
from mfdb_hafro_etl_spark.suite import relational  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import extensions  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import corpus_ops  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import pipelines  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import io_streaming  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import sketches  # noqa: E402,F401
from mfdb_hafro_etl_spark.suite import api_dim  # noqa: E402,F401
