"""Shrimp incremental overlay pipeline (reference
R/initdb_add_shrimp.R:89-175 + shrimp_support_tables.R:2100-2132).

The reference's second entry point: fix the raw shrimp stations with
~12 hard-coded correction tables, reclassify, drop known-bad
samples, keep only stations NOT already imported by the groundfish
run (anti-join increment), assign fjord areacells, and compute the
per-(year, fjord, patch) tow count used by the weight-for-index
scaling.

Scale shape: every correction table is ≤ ~700 rows → broadcast
overlay joins (no fact shuffle); the anti-join against existing tows
broadcasts the tow list when dimension-sized; the towcount window is
the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.functions.domain import fjord_areacell
from mfdb_hafro_etl_spark.operators.corrections import apply_correction, drop_bad_keys

SHRIMP_CLASSES = [14, 37]  # synaflokkur; 37 reclassified → 14


def shrimp_station_fixes(
    stodvar: DataFrame,
    corrected_togtimi: DataFrame,
    corrected_toglengd: DataFrame,
    bad_synis_id: DataFrame,
) -> DataFrame:
    """Correction overlay + reclassification (reference
    R/shrimp_support_tables.R:2100-2132): per-column
    nvl2(fix, fix, orig) overlays, bad-sample exclusion, and the
    rule-based synaflokkur 37 → 14 reclassification."""
    df = apply_correction(
        stodvar, corrected_togtimi, key=["synis_id"], fixes={"togtimi": "togtimi_fx"}
    )
    df = apply_correction(
        df, corrected_toglengd, key=["synis_id"], fixes={"toglengd": "toglengd_fx"}
    )
    df = drop_bad_keys(df, bad_synis_id, ["synis_id"])
    return df.withColumn(
        "synaflokkur",
        F.when(F.col("synaflokkur") == 37, F.lit(14)).otherwise(F.col("synaflokkur")),
    )


def build_shrimp_stations(
    stodvar: DataFrame,
    corrected_togtimi: DataFrame,
    corrected_toglengd: DataFrame,
    bad_synis_id: DataFrame,
    existing_tows: DataFrame,
) -> DataFrame:
    """Incremental shrimp stations (reference
    R/initdb_add_shrimp.R:89-175):

    - fix overlay + 37→14 reclassification, keep shrimp classes
    - anti-join against already-imported tows (J6,
      initdb_add_shrimp.R:169)
    - fjord areacell = concat(skiki, '_', fjardarreitur)
      (§2.10.2 fjord variant, initdb_add_shrimp.R:23,118)
    - towcount = count over (ar, fjardarreitur, skiki) (W2/A4,
      initdb_add_shrimp.R:150-154)

    ``existing_tows``: one-column (synis_id) frame of tows already in
    the stations table.
    """
    fixed = shrimp_station_fixes(
        stodvar, corrected_togtimi, corrected_toglengd, bad_synis_id
    )
    # no broadcast hint on the already-imported set: it grows with
    # the fact table (every import adds tows), so the anti-join
    # strategy stays runtime-size-based — AQE broadcasts it while it
    # fits and falls back to a shuffled anti-join at corpus scale
    shr = fixed.filter(F.col("synaflokkur").isin(SHRIMP_CLASSES)).join(
        existing_tows.select("synis_id").dropDuplicates(),
        on="synis_id",
        how="left_anti",
    )
    w = Window.partitionBy("ar", "fjardarreitur", "skiki")
    return (
        shr.withColumn("areacell", fjord_areacell(F.col("skiki"), F.col("fjardarreitur")))
        .withColumn("towcount", F.count(F.lit(1)).over(w))
        .select(
            F.col("synis_id").alias("tow"),
            F.col("ar").alias("year"),
            F.col("man").alias("month"),
            "areacell",
            "skiki",
            "fjardarreitur",
            "togtimi",
            "toglengd",
            "towcount",
        )
    )
