"""Geospatial Column math (SURVEY C5).

- ``haversine_nm`` replaces the Oracle-side ``arcdist`` great-circle
  tow length (reference R/initdb.R:138) with pure Column algebra —
  JVM-side, codegen, no UDF.
- ``sr2d_lat``/``sr2d_lon`` decode the Icelandic rectangle code
  (``geo::sr2d``, reference R/initdb.R:33-35) in closed form.
- ``points_in_polygon`` replaces ``geo::geoinside`` (reference
  R/shrimp_support_tables.R:2242-2275). The reference had to collect
  to R because Oracle can't run it; here it is a vectorized
  pandas_udf (ray casting over numpy arrays) that runs distributed —
  the collect→compute round-trip disappears (SURVEY §3 entry 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EARTH_RADIUS_NM = 3437.74677078  # nautical miles (1.852 km/nm), matches geo::arcdist scale


def haversine_nm(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in nautical miles, pure Column algebra."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * EARTH_RADIUS_NM) * F.asin(F.sqrt(a))


def sr2d_lat(sr: Column) -> Column:
    """Center latitude of an Icelandic statistical rectangle code.

    The code packs lat/lon as ``(lat_deg - 60) * 100 + (lon_index)``;
    closed-form decode per geo::sr2d semantics (reference
    R/initdb.R:33): lat = floor(sr/100) + 60 + 0.25.
    """
    return F.floor(sr / 100) + F.lit(60.25)


def sr2d_lon(sr: Column) -> Column:
    """Center longitude (west negative): -(sr mod 100) - 0.5."""
    return -(sr % 100).cast("double") - F.lit(0.5)


def sr_area_nm2(sr: Column) -> Column:
    """Rectangle area in square nautical miles (geo::srA analog):
    0.5 deg lat × 1 deg lon scaled by cos(lat)."""
    lat = sr2d_lat(sr)
    return F.lit(30.0) * F.lit(60.0) * F.cos(F.radians(lat))


def points_in_polygon(poly_lat: list[float], poly_lon: list[float]):
    """Vectorized ray-casting point-in-polygon classifier.

    Returns a pandas_udf (lat, lon) -> boolean usable as a Column
    expression. The polygon is closed automatically. Matches
    geo::geoinside option=3 (inside test) semantics for simple
    polygons.
    """
    px = np.asarray(poly_lon, dtype=np.float64)
    py = np.asarray(poly_lat, dtype=np.float64)
    if px[0] != px[-1] or py[0] != py[-1]:
        px = np.append(px, px[0])
        py = np.append(py, py[0])

    @pandas_udf(T.BooleanType())
    def _inside(lat: pd.Series, lon: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        y = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        inside = np.zeros(len(x), dtype=bool)
        n = len(px) - 1
        for i in range(n):
            x1, y1, x2, y2 = px[i], py[i], px[i + 1], py[i + 1]
            crosses = ((y1 > y) != (y2 > y)) & (
                x < (x2 - x1) * (y - y1) / np.where(y2 == y1, np.inf, y2 - y1) + x1
            )
            inside ^= crosses
        return pd.Series(np.where(np.isnan(x) | np.isnan(y), None, inside))

    return _inside
