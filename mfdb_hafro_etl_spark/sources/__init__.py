"""File sources: explicit-schema delimited readers, heterogeneous
multi-file glob ingest, tolerant per-entity fan-out, and the
fetch-then-distribute remote CSV reader (SURVEY S2, S3, S4, S6, S7)."""

from mfdb_hafro_etl_spark.sources.files import (
    read_jdbc,
    fan_out_tolerant,
    read_delimited,
    read_legacy_family,
    read_remote_csv,
    union_families,
)

__all__ = [
    "fan_out_tolerant",
    "read_delimited",
    "read_jdbc",
    "read_legacy_family",
    "read_remote_csv",
    "union_families",
]
