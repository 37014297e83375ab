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
    predicates.

    This standalone form mirrors the reference's materialized
    vessel_map table; build_stations does NOT consume it — rejoining
    a stodvar-derived frame back onto stodvar by synis_id is a
    large-large shuffle join, and attach_saga_nr fuses the same
    semantics into the broadcast registry join instead."""
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


def attach_saga_nr(stodvar: DataFrame, skipasaga: DataFrame) -> DataFrame:
    """Fused vessel-history resolution: one broadcast left join whose
    condition carries the temporal/sentinel arms, row-for-row
    equivalent to build_vessel_map + rejoin-by-synis_id (events with
    no vessel or no matching generation survive with NULL saga_nr;
    multiple matching generations fan out identically) but with ZERO
    shuffles — the reference's two-step shape only existed because
    Oracle materialized vessel_map as a table (SURVEY §3)."""
    reg = skipasaga.select(
        F.col("skip_nr").alias("__skip__"), "saga_nr", "i_gildi", "ur_gildi"
    )
    sentinel = F.lit(SENTINEL_DATE).cast("date")
    cond = (stodvar["skip"] == reg["__skip__"]) & (
        ((stodvar["dags"] > reg["i_gildi"]) & (stodvar["dags"] <= reg["ur_gildi"]))
        | (nvl(reg["i_gildi"], sentinel) == sentinel)
    )
    return stodvar.join(F.broadcast(reg), on=cond, how="left").drop(
        "__skip__", "i_gildi", "ur_gildi"
    )


def build_stations(
    stodvar: DataFrame,
    skipasaga: DataFrame,
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

    Every join in this plan is a broadcast (registry, gear, grid are
    dimension-sized) — the whole spine is shuffle-free map-side work.
    """
    st = (
        attach_saga_nr(stodvar, skipasaga)
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
