"""File sources: explicit-schema delimited readers, heterogeneous
multi-file glob ingest, and tolerant per-entity fan-out (SURVEY S2,
S3, S6, S7)."""

from mfdb_hafro_etl_spark.sources.files import (
    read_jdbc,
    fan_out_tolerant,
    read_delimited,
    read_legacy_family,
    union_families,
)

__all__ = [
    "fan_out_tolerant",
    "read_delimited",
    "read_legacy_family",
    "union_families",
]
