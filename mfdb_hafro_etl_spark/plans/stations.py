"""Stations pipeline — the spine of the groundfish ETL
(reference R/initdb.R:100-151).

stodvar (sampling stations) → vessel-history resolution (SCD-2
temporal join) → sampling-type decode → survey-timing bump → vessel
identity → gear mapping → areacell encode → haversine towlength →
areacell validation against reitmapping.

Scale notes: skipasaga/gear_mapping/reitmapping are dimension-sized →
broadcast joins; the one wide shuffle in the reference (compute() to
a server-side indexed table) becomes an optional partitioned-parquet
checkpoint at the sink, bucketed by tow for its four downstream
consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.functions.conditionals import nvl
from mfdb_hafro_etl_spark.functions.domain import (
    areacell_encode,
    survey_month_bump,
    vessel_id,
)
from mfdb_hafro_etl_spark.functions.geo import haversine_nm

# sampling-type decode (reference R/initdb.R:118-123)
SAMPLING_TYPE_DECODE = [
    ((1, 2, 8), "SEA"),
    ((10, 12, 20), "ADH"),
    ((30,), "IGFS"),
    ((35,), "AUT"),
    ((38,), "LOBS"),
]
SAMPLING_TYPE_DEFAULT = "SMN"

STATION_CLASSES = [1, 2, 8, 10, 12, 20, 30, 34, 35, 38]  # initdb.R:117

SENTINEL_DATE = "2100-01-01"  # initdb.R:108 to_date('01.01.2100')


def sampling_type(synaflokkur: F.Column) -> F.Column:
    expr = None
    for codes, label in SAMPLING_TYPE_DECODE:
        cond = synaflokkur.isin(*codes)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(SAMPLING_TYPE_DEFAULT))


def build_vessel_map(stodvar: DataFrame, skipasaga: DataFrame) -> DataFrame:
    """Resolve each sampling event to its vessel-history row
    (reference R/initdb.R:102-110).

    NULL policy preserved exactly: events with no vessel
    (nvl(skip,-999)==-999) or an open-ended registry interval
    (nvl(i_gildi, sentinel)==sentinel) survive the filter — R's
    three-arm OR with nvl guards, restated as explicit Spark
    predicates."""
    ev = stodvar.select("synis_id", "dags", "skip")
    reg = skipasaga.select(
        F.col("skip_nr").alias("skip"), "saga_nr", "i_gildi", "ur_gildi"
    )
    j = ev.join(F.broadcast(reg), on="skip", how="left")
    sentinel = F.lit(SENTINEL_DATE).cast("date")
    keep = (
        ((F.col("dags") > F.col("i_gildi")) & (F.col("dags") <= F.col("ur_gildi")))
        | (nvl(F.col("skip"), -999) == -999)
        | (nvl(F.col("i_gildi"), sentinel) == sentinel)
    )
    # skip stays on the stodvar side (it re-joins by synis_id); returning
    # it here would collide with stodvar's own column downstream
    return j.filter(keep).select("synis_id", "saga_nr")


def build_stations(
    stodvar: DataFrame,
    vessel_map: DataFrame,
    gear_mapping: DataFrame,
    reitmapping: DataFrame,
) -> DataFrame:
    """The stations table (reference R/initdb.R:113-147), column for
    column:

    - saga_nr = nvl(saga_nr, 0)
    - synaflokkur whitelist (F1)
    - sampling-type decode (C1) + survey timing bump (§2.10.3)
    - vessel = concat(skip,'-',saga_nr) with Oracle NULL-as-''
      concat semantics (§2.10.1)
    - areacell = 10*reitur + nvl(smareitur,1) (§2.10.2)
    - towlength = great-circle distance (C5; Oracle arcdist →
      Column-algebra haversine)
    - inner join reitmapping validates areacell (J3)
    """
    st = (
        stodvar.join(vessel_map, on="synis_id", how="left")
        .withColumn("saga_nr", nvl(F.col("saga_nr"), 0))
        .filter(F.col("synaflokkur").isin(STATION_CLASSES))
        .withColumn("sampling_type", sampling_type(F.col("synaflokkur")))
        .withColumn("man", survey_month_bump(F.col("man"), F.col("synaflokkur")))
        .withColumn("vessel", vessel_id(F.col("skip"), F.col("saga_nr")))
        .join(F.broadcast(gear_mapping), on="veidarfaeri", how="left")
        .select(
            "synis_id",
            "ar",
            "man",
            F.col("kastad_n_breidd").alias("lat"),
            F.col("kastad_v_lengd").alias("lon"),
            F.col("hift_n_breidd").alias("lat1"),
            F.col("hift_v_lengd").alias("lon1"),
            "gear",
            "sampling_type",
            F.col("dypi_kastad").alias("depth"),
            "vessel",
            "reitur",
            "smareitur",
        )
        .withColumn("areacell", areacell_encode(F.col("reitur"), F.col("smareitur")))
        .withColumn(
            "towlength",
            F.round(
                haversine_nm(F.col("lat"), F.col("lon"), F.col("lat1"), F.col("lon1")),
                6,
            ),
        )
        .drop("lat1", "lon1", "reitur", "smareitur")
        .join(
            F.broadcast(reitmapping.select(F.col("GRIDCELL").alias("areacell"))),
            on="areacell",
            how="inner",
        )
        .withColumnRenamed("synis_id", "tow")
        .withColumnRenamed("ar", "year")
        .withColumnRenamed("man", "month")
        .withColumnRenamed("lat", "latitude")
        .withColumnRenamed("lon", "longitude")
    )
    return st
