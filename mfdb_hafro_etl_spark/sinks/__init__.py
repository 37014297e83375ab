"""Sinks: materialized checkpoints and the dimensional import layer
(SURVEY S11, S12, S14, S15)."""

from mfdb_hafro_etl_spark.sinks.tables import (
    fk_violations,
    import_fact,
    materialize,
    materialize_bucketed,
    read_fact,
    replace_by_source,
    require_fk,
)

__all__ = [
    "fk_violations",
    "import_fact",
    "materialize",
    "materialize_bucketed",
    "read_fact",
    "replace_by_source",
    "require_fk",
]
