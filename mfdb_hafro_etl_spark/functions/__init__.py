"""Scalar Column helpers (SURVEY §2.8).

Everything here is pure Column algebra (JVM-side, codegen-friendly);
the single pandas_udf (point-in-polygon) lives in geo.py and is the
only Python-side scalar in the engine.
"""

from mfdb_hafro_etl_spark.functions.conditionals import decode, nvl, nvl2
from mfdb_hafro_etl_spark.functions.geo import haversine_nm, sr2d_lat, sr2d_lon, points_in_polygon
from mfdb_hafro_etl_spark.functions.domain import (
    areacell_encode,
    vessel_id,
    sex_recode,
    maturity_recode,
    range_bucket,
)

__all__ = [
    "decode",
    "nvl",
    "nvl2",
    "haversine_nm",
    "sr2d_lat",
    "sr2d_lon",
    "points_in_polygon",
    "areacell_encode",
    "vessel_id",
    "sex_recode",
    "maturity_recode",
    "range_bucket",
]
