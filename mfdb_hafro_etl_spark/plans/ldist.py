"""Length/age-distribution pipelines (reference R/initdb.R:200-319)
and the count-scaling transform skala_med_toldum2 (reference
R/shrimp_support_tables.R:2137-2212).

Spark-first restatement: the reference's three groupBy→rejoin rounds
become two window sums over (synis_id, tegund) — the partitioning is
reused across both windows, so the whole scaling transform costs two
shuffles (interval groupBy + window) instead of the reference's
implicit four server-side materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from mfdb_hafro_etl_spark.localrel import local_df

from mfdb_hafro_etl_spark.exprcache import column_template
from mfdb_hafro_etl_spark.functions.conditionals import nvl, nvl2
from mfdb_hafro_etl_spark.functions.domain import sex_recode

# default biomass parameters: tegund 41 (shrimp), a/b allometric +
# 0.1 length-interval scale (reference R/shrimp_support_tables.R:2137)
DEFAULT_BIOM_TEG: dict[int, tuple[float, float, float]] = {
    41: (0.000628641104521994, 2.84713109335131, 0.1)
}


def build_ratio(
    numer: DataFrame,
    corrected_afli: DataFrame | None = None,
    corrected_vigt_synis: DataFrame | None = None,
) -> DataFrame:
    """Sampling/biomass ratios with zero-divisor guards (reference
    R/shrimp_support_tables.R:2141-2151):

      r       = fj_talid==0 ? 1 : fj_talid / (fj_maelt==0 ? 1 : fj_maelt)
      biom.r  = afli==0 ? NA : afli / (vigt_synis==0 ? NA : vigt_synis)
      simplemean_wt = vigt_synis==0 ? NA : vigt_synis / (fj_maelt==0 ? NA : fj_maelt)

    Correction overlay nvl2(fix, fix, orig) applied first when the
    corrected_* tables are given.
    """
    df = numer
    if corrected_afli is not None:
        df = df.join(F.broadcast(corrected_afli), on=["synis_id", "tegund"], how="left")
        df = df.withColumn("afli", nvl2(F.col("afli_fx"), F.col("afli_fx"), F.col("afli"))).drop("afli_fx")
    if corrected_vigt_synis is not None:
        df = df.join(F.broadcast(corrected_vigt_synis), on=["synis_id", "tegund"], how="left")
        df = df.withColumn(
            "vigt_synis", nvl2(F.col("vigt_synis_fx"), F.col("vigt_synis_fx"), F.col("vigt_synis"))
        ).drop("vigt_synis_fx")
    return df.select(*_ratio_select_cols())


@column_template
def _ratio_select_cols() -> tuple:
    """build_ratio's output projection — memoized template
    (exprcache): identical fixed-name trees rebuilt by every
    ldist-family query."""
    null_d = F.lit(None).cast("double")
    r = F.when(F.col("fj_talid") == 0, F.lit(1.0)).otherwise(
        F.col("fj_talid") / F.when(F.col("fj_maelt") == 0, F.lit(1.0)).otherwise(F.col("fj_maelt"))
    )
    biom_r = F.when(F.col("afli") == 0, null_d).otherwise(
        F.col("afli") / F.when(F.col("vigt_synis") == 0, null_d).otherwise(F.col("vigt_synis"))
    )
    simplemean = F.when(F.col("vigt_synis") == 0, null_d).otherwise(
        F.col("vigt_synis") / F.when(F.col("fj_maelt") == 0, null_d).otherwise(F.col("fj_maelt"))
    )
    return [
        F.col("synis_id"),
        F.col("tegund"),
        r.alias("r"),
        biom_r.alias("biom_r"),
        simplemean.alias("simplemean_wt"),
        F.col("vigt_synis"),
        F.col("fj_maelt"),
    ]


def skala_med_toldum2(
    lengdir: DataFrame,
    numer: DataFrame,
    biom_teg: dict[int, tuple[float, float, float]] | None = None,
    corrected_afli: DataFrame | None = None,
    corrected_vigt_synis: DataFrame | None = None,
) -> DataFrame:
    """Count scaling + interval-allometric mean weight (reference
    R/shrimp_support_tables.R:2137-2212), formula for formula:

    1. length interval: round(lengd/s)*s (scaler 1/s; s==0/NA → 1)
    2. fjoldi_by_int: counts per (synis_id, tegund, interval)
    3. fjoldi_prop_weighted = fjoldi_by_int/fjoldi_sum * a * interval^b
       (NA when fjoldi_sum*a*interval^b == 0)
    4. biom_prop = interval's share of the weighted sum
    5. mean_wt = biom_prop * (vigt_synis/fjoldi_by_int) with the
       reference's exact NA guards
    6. fjoldi scaled by biom.r for biomass species else r

    Output: lengdir rows + (r, biom_r, mean_wt) with fjoldi scaled.
    """
    biom_teg = DEFAULT_BIOM_TEG if biom_teg is None else biom_teg
    spark = lengdir.sparkSession
    biom_rows = [(k, a, b, s) for k, (a, b, s) in sorted(biom_teg.items())]
    biom_mat = local_df(spark, biom_rows, "tegund INT, a DOUBLE, b DOUBLE, s DOUBLE")
    ratio = build_ratio(numer, corrected_afli, corrected_vigt_synis)

    base = (
        lengdir.join(F.broadcast(biom_mat), on="tegund", how="left")
        .withColumn("lengd_scaler", _interval_cols()[0][1])
        .withColumn("lengd_interval", _interval_cols()[1][1])
        .join(ratio, on=["synis_id", "tegund"], how="left")
    )

    # Stages 2-4 are pure window algebra over ONE partitioning: the
    # ratio join above already hashes both sides by (synis_id, tegund),
    # and every window below partitions by (synis_id, tegund[, interval])
    # — a superset clustering that HashPartitioning(synis_id, tegund)
    # satisfies — so the whole scaling transform runs with NO further
    # shuffle and NO self-join (the naive translation is groupBy +
    # join-back, which recomputes the upstream twice and adds a
    # large-large sort-merge join; .explain shows a single Exchange).
    stage = base.withColumns(dict(_window_sum_cols()))
    # interval^b quantized to 6 dp AT THE SOURCE: Java Math.pow and C
    # libm pow disagree by 1 ulp on ~10% of inputs (measured on the
    # shrimp exponent), and that ulp rides through the whole
    # mean-weight chain to occasionally flip the final 6 dp rounding
    # (1-in-46k rows at sf0.1). Quantizing the pow output makes every
    # downstream double bit-identical across engines; the 6 dp loss
    # (relative ~1e-10 at shrimp magnitudes) is far below the data's
    # precision. The oracle applies the identical ROUND(POW(..), 6).
    fpw, fpw_sum, biom_prop = _prop_cols()
    stage = (
        stage.withColumn("fjoldi_prop_weighted", fpw)
        .withColumn("fjoldi_prop_weighted_sum", fpw_sum)
        .withColumn("biom_prop", biom_prop)
    )

    biom_spp = sorted(biom_teg)
    mean_wt_col, fjoldi_scaled = _output_cols(tuple(biom_spp))
    out = (
        stage.withColumn("mean_wt", mean_wt_col)
        .withColumn("fjoldi", fjoldi_scaled)
        .drop(
            "vigt_synis",
            "fj_maelt",
            "simplemean_wt",
            "lengd_interval",
            "lengd_scaler",
            "a",
            "b",
            "s",
            "fjoldi_by_int",
            "fjoldi_sum",
            "__int_rn__",
            "fjoldi_prop_weighted",
            "fjoldi_prop_weighted_sum",
            "biom_prop",
        )
    )
    return out


@column_template
def _interval_cols() -> tuple:
    """Length-interval derivation (steps 1-2) — memoized template.
    SEQUENTIAL withColumn at the call site: lengd_interval references
    lengd_scaler, so the two must not share one withColumns
    projection."""
    scaler = F.when((F.col("s") == 0) | F.col("s").isNull(), F.lit(1.0)).otherwise(
        1 / F.col("s")
    )
    return [
        ("lengd_scaler", scaler),
        (
            "lengd_interval",
            F.round(F.col("lengd_scaler") * F.col("lengd"), 0) / F.col("lengd_scaler"),
        ),
    ]


@column_template
def _window_sum_cols() -> tuple:
    """Window algebra over the single (synis_id, tegund) partitioning
    (see the shuffle-shape note in skala_med_toldum2) — memoized
    template; the Window specs are themselves immutable JVM objects."""
    w_grp = Window.partitionBy("synis_id", "tegund")
    w_int = Window.partitionBy("synis_id", "tegund", "lengd_interval")
    return [
        ("fjoldi_by_int", F.sum("fjoldi").over(w_int)),
        ("fjoldi_sum", F.sum("fjoldi").over(w_grp)),
        # one-row-per-interval indicator so per-interval terms can
        # be re-aggregated at group grain without a join
        ("__int_rn__", F.row_number().over(w_int.orderBy(F.lit(1)))),
    ]


@column_template
def _prop_cols() -> tuple:
    """Steps 3-4 (weighted proportions) — memoized template. powc is
    quantized to 6 dp at the source (see the libm-pow note above)."""
    null_d = F.lit(None).cast("double")
    w_grp = Window.partitionBy("synis_id", "tegund")
    powc = F.round(F.pow("lengd_interval", F.col("b")), 6)
    fpw = F.when(
        F.col("fjoldi_sum") * F.col("a") * powc == 0,
        null_d,
    ).otherwise(F.col("fjoldi_by_int") / F.col("fjoldi_sum") * F.col("a") * powc)
    fpw_sum = F.sum(
        F.when(F.col("__int_rn__") == 1, F.col("fjoldi_prop_weighted")).otherwise(F.lit(0.0))
    ).over(w_grp)
    biom_prop = F.when(F.col("fjoldi_prop_weighted_sum") == 0, null_d).otherwise(
        F.col("fjoldi_prop_weighted") / F.col("fjoldi_prop_weighted_sum")
    )
    return [fpw, fpw_sum, biom_prop]


@column_template
def _output_cols(biom_spp: tuple) -> tuple:
    """Steps 5-6: mean_wt quantized to 6 dp on both engines —
    floor(x*1e6+0.5)/1e6, NOT F.round: Spark rounds the double's
    shortest decimal repr while DuckDB rounds the exact binary value,
    so 7-place values ending in 5 (e.g. biom_prop*(vigt/fjoldi) =
    0.0192125) diverge under round(); the floor construction is the
    same correctly-rounded IEEE multiply/add/floor/divide on both and
    mean_wt is nonnegative. Quantizing here makes the doubles
    entering the downstream weight chain bit-identical, so even
    exact decimal ties round identically. fjoldi scaled by biom_r
    for biomass species else r (step 6); keyed by the species
    tuple."""
    null_d = F.lit(None).cast("double")
    mean_wt = F.floor(
        F.col("biom_prop")
        * (
            F.when(F.col("vigt_synis") == 0, null_d).otherwise(F.col("vigt_synis"))
            / F.when(F.col("fjoldi_by_int") == 0, null_d).otherwise(F.col("fjoldi_by_int"))
        )
        * 1000000.0
        + 0.5
    ) / 1000000.0
    fjoldi = F.col("fjoldi") * F.when(
        F.col("tegund").isin(list(biom_spp)), F.col("biom_r")
    ).otherwise(F.col("r"))
    return [mean_wt, fjoldi]


def shrimp_weight_for_index(
    mean_wt: F.Column,
    towlength: F.Column,
    towcount: F.Column,
    size: F.Column,
) -> F.Column:
    """Shrimp weight-for-index scaling (SURVEY §2.10.6, reference
    R/initdb_add_shrimp.R:208-214):

        weight = (mean_wt / nvl(towlength, 1)) / towcount * nvl(size, 1)

    applied only for the index sampling types (the caller gates on
    sampling_type ∈ {XS, XINS, SEA})."""
    return (
        (mean_wt / F.coalesce(towlength, F.lit(1.0)))
        / towcount
        * F.coalesce(size, F.lit(1.0))
    )


def maturity_recode_full(kynthroski: F.Column, tegund: F.Column, sex: F.Column) -> F.Column:
    """Maturity recode incl. the species-9 female-only rule
    (reference R/initdb.R:217-219,302-304):

    tegund==9: kynthroski>2 & F → 2; kynthroski∈{1,2} & F → 1; else NA
    else:      kynthroski>1 → 2; ==1 → 1; else NA
    """
    null_i = F.lit(None).cast("int")
    special = F.when((kynthroski > 2) & (sex == "F"), F.lit(2)).when(
        kynthroski.isin(1, 2) & (sex == "F"), F.lit(1)
    ).otherwise(null_i)
    general = F.when(kynthroski > 1, F.lit(2)).when(kynthroski == 1, F.lit(1)).otherwise(null_i)
    return F.when(tegund == 9, special).otherwise(general)


def build_ldist(
    lengdir: DataFrame,
    species_key: DataFrame,
    stations: DataFrame,
    numer: DataFrame,
    biom_teg: dict[int, tuple[float, float, float]] | None = None,
) -> DataFrame:
    """Length-distribution fact rows (reference R/initdb.R:202-285):
    lengdir ⋈ species whitelist → count scaling → right-join stations
    (keep every station, zero-filled) → recodes."""
    scaled = skala_med_toldum2(
        lengdir.join(F.broadcast(species_key), on="tegund", how="inner"),
        numer,
        biom_teg,
    ).withColumnRenamed("synis_id", "tow")
    j = scaled.join(stations.drop("towlength"), on="tow", how="right")
    # dbplyr compiles the whole mutate into ONE SELECT, so the maturity
    # rule's kyn=='F' test sees the recoded sex and the ldist recode's
    # else-arm is '' (SQL CASE, not R NA) — reference R/initdb.R:216-219.
    # withColumns evaluates every expr against the ORIGINAL columns,
    # matching that single-projection semantics.
    sex = F.when(F.col("kyn") == 2, F.lit("F")).when(F.col("kyn") == 1, F.lit("M")).otherwise(F.lit(""))
    return (
        j.withColumns(
            {
                "lengd": nvl(F.col("lengd"), 0.0),
                "fjoldi": nvl(F.col("fjoldi"), 0.0),
                "kyn": sex,
                "kynthroski": maturity_recode_full(F.col("kynthroski"), F.col("tegund"), sex),
                "age": F.lit(0),
            }
        )
        .drop("r", "biom_r", "mean_wt", "tegund")
        .withColumnRenamed("kyn", "sex")
        .withColumnRenamed("kynthroski", "maturity_stage")
        .withColumnRenamed("lengd", "length")
        .withColumnRenamed("fjoldi", "count")
    )


def build_aldist(
    kvarnir: DataFrame,
    species_key: DataFrame,
    stations: DataFrame,
) -> DataFrame:
    """Age-length fact rows (reference R/initdb.R:293-312): kvarnir ⋈
    species whitelist, right-join stations, count=1, recodes, weight
    fields renamed."""
    k = kvarnir.withColumnRenamed("synis_id", "tow").join(
        F.broadcast(species_key), on="tegund", how="inner"
    )
    j = k.join(stations.drop("towlength"), on="tow", how="right")
    # single-projection mutate semantics (see build_ldist); aldist's
    # sex recode else-arm is NULL (reference R/initdb.R:310-313)
    sex = sex_recode(F.col("kyn"))
    return (
        j.withColumns(
            {
                "lengd": nvl(F.col("lengd"), 0.0),
                "count": F.lit(1),
                "kyn": sex,
                "kynthroski": maturity_recode_full(F.col("kynthroski"), F.col("tegund"), sex),
            }
        )
        .select(
            "tow",
            "latitude",
            "longitude",
            "year",
            "month",
            "areacell",
            "gear",
            "vessel",
            "sampling_type",
            "count",
            "species",
            F.col("aldur").alias("age"),
            F.col("kyn").alias("sex"),
            F.col("kynthroski").alias("maturity_stage"),
            F.col("lengd").alias("length"),
            F.col("nr").alias("no"),
            F.col("oslaegt").alias("weight"),
            F.col("slaegt").alias("gutted"),
            F.col("lifur").alias("liver"),
            F.col("kynfaeri").alias("gonad"),
        )
    )
