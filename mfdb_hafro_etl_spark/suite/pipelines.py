"""End-to-end reference pipelines (plans/) as hash-verified suite
queries: the stations spine, ldist/aldist measurement facts, and the
landings union — each mirrored column-for-column by a DuckDB oracle
over the same deterministically-derived fixtures (suite/fixtures.py).

These are the strongest parity checks in the suite: a full reference
entry point (SURVEY §3) reproduced end to end, not a single operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.plans import landings as landings_plan
from mfdb_hafro_etl_spark.plans import ldist as ldist_plan
from mfdb_hafro_etl_spark.plans import stations as stations_plan
from mfdb_hafro_etl_spark.suite import fixtures as fx
from mfdb_hafro_etl_spark.suite import register

# ---------------------------------------------------------------- SQL blocks

VESSEL_MAP_SQL = """
SELECT e.synis_id, r.saga_nr
FROM stodvar e
LEFT JOIN skipasaga r ON e.skip = r.skip_nr
WHERE (e.dags > r.i_gildi AND e.dags <= r.ur_gildi)
   OR COALESCE(e.skip, -999) = -999
   OR COALESCE(r.i_gildi, DATE '2100-01-01') = DATE '2100-01-01'
"""

_HAVERSINE = """
2 * 3437.74677078 * ASIN(SQRT(
  POW(SIN(RADIANS(s.hift_n_breidd - s.kastad_n_breidd) / 2), 2)
  + COS(RADIANS(s.kastad_n_breidd)) * COS(RADIANS(s.hift_n_breidd))
    * POW(SIN(RADIANS(s.hift_v_lengd - s.kastad_v_lengd) / 2), 2)
))
"""

# mirrors plans/stations.py::build_stations expression for expression
STATIONS_SQL = f"""
SELECT
  s.synis_id                                    AS tow,
  s.ar                                          AS year,
  CASE WHEN s.synaflokkur = 30 THEN 4
       WHEN s.synaflokkur = 35 THEN 10
       ELSE s.man END                           AS month,
  s.kastad_n_breidd                             AS latitude,
  s.kastad_v_lengd                              AS longitude,
  g.gear                                        AS gear,
  CASE WHEN s.synaflokkur IN (1, 2, 8)    THEN 'SEA'
       WHEN s.synaflokkur IN (10, 12, 20) THEN 'ADH'
       WHEN s.synaflokkur = 30            THEN 'IGFS'
       WHEN s.synaflokkur = 35            THEN 'AUT'
       WHEN s.synaflokkur = 38            THEN 'LOBS'
       ELSE 'SMN' END                           AS sampling_type,
  s.dypi_kastad                                 AS depth,
  CASE WHEN COALESCE(CAST(s.skip AS VARCHAR), '') || '-'
            || CAST(COALESCE(vm.saga_nr, 0) AS VARCHAR) = '-0' THEN NULL
       ELSE COALESCE(CAST(s.skip AS VARCHAR), '') || '-'
            || CAST(COALESCE(vm.saga_nr, 0) AS VARCHAR) END AS vessel,
  CAST(CAST(10 * s.reitur + COALESCE(s.smareitur, 1) AS INT) AS VARCHAR) AS areacell,
  ROUND({_HAVERSINE}, 6)                        AS towlength
FROM stodvar s
LEFT JOIN vessel_map vm ON s.synis_id = vm.synis_id
LEFT JOIN gear_mapping g ON s.veidarfaeri = g.veidarfaeri
JOIN reitmapping rm
  ON CAST(CAST(10 * s.reitur + COALESCE(s.smareitur, 1) AS INT) AS VARCHAR) = rm.GRIDCELL
WHERE s.synaflokkur IN (1, 2, 8, 10, 12, 20, 30, 34, 35, 38)
"""

_STATION_COLS = (
    "tow, year, month, latitude, longitude, gear, sampling_type, depth, vessel, areacell"
)


@fx.plan_memo
def _spark_fixture_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plan-memoized (fixtures.plan_memo): four arms build this exact
    # stations spine; the expression tree costs ~0.8 s of py4j round
    # trips per build and is immutable once constructed
    return stations_plan.build_stations(
        fx.stodvar(spark, sf_dir),
        fx.skipasaga(spark, sf_dir),
        fx.gear_mapping(spark, sf_dir),
        fx.reitmapping(spark, sf_dir),
    )


# -------------------------------------------------------------- p1 stations
@register(
    "p1_stations",
    fx.with_clause("stodvar", "skipasaga", "gear_mapping", "reitmapping")
    + f""",
vessel_map AS ({VESSEL_MAP_SQL}),
stations AS ({STATIONS_SQL})
SELECT {_STATION_COLS}, ROUND(towlength, 3) AS towlength FROM stations
""",
)
def p1_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full stations spine (reference R/initdb.R:100-151): SCD-2
    vessel resolution, decode, timing bump, vessel identity, areacell
    encode, haversine towlength, grid validation. One wide broadcast-
    join chain, zero shuffles until the sink. towlength re-rounded to
    3 dp so cross-engine libm ulp differences can't flip the hash."""
    st = _spark_fixture_stations(spark, sf_dir)
    return st.withColumn("towlength", F.round("towlength", 3))


# ----------------------------------------------------------------- p2 ldist

# gear_mapping has no 'stations' filter column; build_stations keeps
# only whitelisted synaflokkur (the JOIN/WHERE above). The ldist SQL
# mirrors skala_med_toldum2 (plans/ldist.py) with the weighted-sum
# stages omitted: they only feed mean_wt, which build_ldist drops.
LDIST_SQL = """
biom_mat AS (
  SELECT 41 AS tegund, 0.000628641104521994 AS a, 2.84713109335131 AS b, 0.1 AS s
),
ratio AS (
  SELECT synis_id, tegund,
    CASE WHEN fj_talid = 0 THEN 1.0
         ELSE fj_talid / (CASE WHEN fj_maelt = 0 THEN 1.0 ELSE fj_maelt END) END AS r,
    CASE WHEN afli = 0 THEN NULL
         ELSE afli / (CASE WHEN vigt_synis = 0 THEN NULL ELSE vigt_synis END) END AS biom_r
  FROM numer
),
scaled AS (
  SELECT l.synis_id AS tow, l.tegund, l.lengd, l.kyn, l.kynthroski, sk.species,
    l.fjoldi * (CASE WHEN l.tegund IN (41) THEN rt.biom_r ELSE rt.r END) AS fjoldi
  FROM lengdir l
  JOIN species_key sk ON l.tegund = sk.tegund
  LEFT JOIN ratio rt ON l.synis_id = rt.synis_id AND l.tegund = rt.tegund
),
ldist AS (
  SELECT st.tow, st.year, st.month, st.latitude, st.longitude, st.gear,
    st.sampling_type, st.depth, st.vessel, st.areacell, sc.species,
    COALESCE(sc.lengd, 0.0)  AS length,
    COALESCE(sc.fjoldi, 0.0) AS "count",
    CASE WHEN sc.kyn = 2 THEN 'F' WHEN sc.kyn = 1 THEN 'M' ELSE '' END AS sex,
    CASE WHEN sc.tegund = 9 THEN
      CASE WHEN sc.kynthroski > 2
            AND (CASE WHEN sc.kyn = 2 THEN 'F' WHEN sc.kyn = 1 THEN 'M' ELSE '' END) = 'F' THEN 2
           WHEN sc.kynthroski IN (1, 2)
            AND (CASE WHEN sc.kyn = 2 THEN 'F' WHEN sc.kyn = 1 THEN 'M' ELSE '' END) = 'F' THEN 1
           ELSE NULL END
    ELSE
      CASE WHEN sc.kynthroski > 1 THEN 2 WHEN sc.kynthroski = 1 THEN 1 ELSE NULL END
    END AS maturity_stage,
    0 AS age
  FROM scaled sc
  RIGHT JOIN stations st ON sc.tow = st.tow
)
"""


@register(
    "p2_ldist",
    fx.with_clause(
        "stodvar", "skipasaga", "gear_mapping", "reitmapping", "species_key", "lengdir", "numer"
    )
    + f""",
vessel_map AS ({VESSEL_MAP_SQL}),
stations AS ({STATIONS_SQL}),
{LDIST_SQL.lstrip()}
SELECT * FROM ldist
""",
)
def p2_ldist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full length-distribution fact pipeline (reference
    R/initdb.R:202-285 + skala_med_toldum2, R/shrimp_support_tables.R:
    2137-2212): species whitelist → count scaling with zero-divisor
    guards → right-join stations (zero-filled) → single-projection
    recodes. The big stations⋈lengdir join is the one genuine
    large-large shuffle of the reference (SURVEY §2.3)."""
    st = _spark_fixture_stations(spark, sf_dir)
    out = ldist_plan.build_ldist(
        fx.lengdir(spark, sf_dir),
        fx.species_key(spark, sf_dir),
        st,
        fx.numer(spark, sf_dir),
    )
    return out


# ---------------------------------------------------------------- p3 aldist
@register(
    "p3_aldist",
    fx.with_clause(
        "stodvar", "skipasaga", "gear_mapping", "reitmapping", "species_key", "kvarnir"
    )
    + f""",
vessel_map AS ({VESSEL_MAP_SQL}),
stations AS ({STATIONS_SQL})
SELECT st.tow, st.latitude, st.longitude, st.year, st.month, st.areacell,
  st.gear, st.vessel, st.sampling_type,
  1 AS "count",
  k.species,
  k.aldur AS age,
  CASE WHEN k.kyn = 2 THEN 'F' WHEN k.kyn = 1 THEN 'M' ELSE NULL END AS sex,
  CASE WHEN k.tegund = 9 THEN
    CASE WHEN k.kynthroski > 2
          AND (CASE WHEN k.kyn = 2 THEN 'F' WHEN k.kyn = 1 THEN 'M' ELSE NULL END) = 'F' THEN 2
         WHEN k.kynthroski IN (1, 2)
          AND (CASE WHEN k.kyn = 2 THEN 'F' WHEN k.kyn = 1 THEN 'M' ELSE NULL END) = 'F' THEN 1
         ELSE NULL END
  ELSE
    CASE WHEN k.kynthroski > 1 THEN 2 WHEN k.kynthroski = 1 THEN 1 ELSE NULL END
  END AS maturity_stage,
  COALESCE(k.lengd, 0.0) AS length,
  k.nr AS no, k.oslaegt AS weight, k.slaegt AS gutted,
  k.lifur AS liver, k.kynfaeri AS gonad
FROM (SELECT kv.*, sk.species FROM kvarnir kv JOIN species_key sk ON kv.tegund = sk.tegund) k
RIGHT JOIN stations st ON k.synis_id = st.tow
""",
)
def p3_aldist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Age-length fact pipeline (reference R/initdb.R:293-312):
    kvarnir ⋈ whitelist, right-join stations, count=1, recodes,
    weight-field renames."""
    st = _spark_fixture_stations(spark, sf_dir)
    return ldist_plan.build_aldist(
        fx.kvarnir(spark, sf_dir), fx.species_key(spark, sf_dir), st
    )


# -------------------------------------------------------------- p4 landings

BAD_VESSELS = ["5-1", "17-2"]

LANDINGS_MAP_SQL = """
SELECT DISTINCT l.skip_nr, r.saga_nr, l.komunr, l.hofn
FROM lods l
JOIN skipasaga r ON l.skip_nr = r.skip_nr
WHERE l.l_dags < r.ur_gildi AND l.l_dags > r.i_gildi
"""

_LANDED_BODY = """
cur AS (
  SELECT l.veidarfaeri, l.skip_nr, l.fteg, l.ar, l.man, l.hofn,
         l.magn_oslaegt, l.veidisvaedi, l.l_dags, lm.saga_nr
  FROM lods l
  LEFT JOIN landings_map lm
    ON l.skip_nr = lm.skip_nr AND l.komunr = lm.komunr AND l.hofn = lm.hofn
  WHERE l.ar > 1993
),
hist AS (
  SELECT veidarfaeri, skip_nr, fteg, ar, man, hofn, magn_oslaegt, veidisvaedi,
         CAST(strptime(CAST(ar AS VARCHAR) || lpad(CAST(man AS VARCHAR), 2, '0'), '%Y%m') AS DATE) AS l_dags,
         0 AS saga_nr
  FROM fiskifelag
),
unioned AS (
  SELECT * FROM cur UNION ALL BY NAME SELECT * FROM hist
),
landed AS (
  SELECT
    u.magn_oslaegt AS weight_total,
    '{sampling}'   AS sampling_type,
    p.areacell,
    CASE WHEN COALESCE(CAST(u.skip_nr AS VARCHAR), '') || '-'
              || COALESCE(CAST(u.saga_nr AS VARCHAR), '0') = '-0' THEN NULL
         ELSE COALESCE(CAST(u.skip_nr AS VARCHAR), '') || '-'
              || COALESCE(CAST(u.saga_nr AS VARCHAR), '0') END AS vessel,
    sk.species,
    u.ar AS year, u.man AS month,
    COALESCE(g.gear, 'LLN') AS gear
  FROM unioned u
  LEFT JOIN skipasaga r ON u.skip_nr = r.skip_nr AND u.saga_nr = r.saga_nr
  LEFT JOIN gear_mapping g ON u.veidarfaeri = g.veidarfaeri
  JOIN species_key sk ON u.fteg = sk.tegund
  LEFT JOIN port2sr p ON u.hofn = p.hofn
  WHERE u.veidisvaedi = 'I' AND COALESCE(r.flokkur, 0) {flokkur_pred}
)
"""

_IMPORT_FILTER = """
SELECT weight_total, sampling_type, areacell,
  CASE WHEN vessel = '-0' THEN NULL ELSE vessel END AS vessel,
  species, year, month, gear
FROM landed
WHERE COALESCE(CASE WHEN vessel = '-0' THEN NULL ELSE vessel END, '') NOT IN ({bad})
  AND weight_total > 0 AND weight_total IS NOT NULL
"""


def _landings_ctes(foreign: bool) -> str:
    """WITH-chain ending in ``filtered`` = the import-ready landings."""
    return (
        fx.with_clause(
            "lods", "fiskifelag", "skipasaga", "gear_mapping", "species_key", "port2sr"
        )
        + f""",
landings_map AS ({LANDINGS_MAP_SQL}),
{_LANDED_BODY.format(sampling="FLND" if foreign else "LND", flokkur_pred="= -4" if foreign else "<> -4").lstrip()},
filtered AS ({_IMPORT_FILTER.format(bad=", ".join(repr(v) for v in BAD_VESSELS))})"""
    )


def _landings_sql(foreign: bool) -> str:
    return _landings_ctes(foreign) + "\nSELECT * FROM filtered"


def _landings_spark(spark: SparkSession, sf_dir: str, foreign: bool) -> DataFrame:
    lods = fx.lods(spark, sf_dir)
    saga = fx.skipasaga(spark, sf_dir)
    lmap = landings_plan.build_landings_map(lods, saga)
    landed = landings_plan.build_landed_catch(
        lods,
        fx.fiskifelag(spark, sf_dir),
        lmap,
        saga,
        fx.gear_mapping(spark, sf_dir),
        fx.species_key(spark, sf_dir),
        fx.port2sr(spark, sf_dir),
        foreign=foreign,
    )
    return landings_plan.import_filter(landed, BAD_VESSELS)


@register("p4_landings", _landings_sql(foreign=False))
def p4_landings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domestic landed-catch pipeline (reference R/initdb.R:346-375,
    485-495): current ∪ historical landings, open-bound temporal
    vessel resolution, gear fallback, species whitelist, port →
    areacell, import cleanup. Union stays a metadata op; every
    dimension join is a broadcast."""
    return _landings_spark(spark, sf_dir, foreign=False)


@register("p5_landings_foreign", _landings_sql(foreign=True))
def p5_landings_foreign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-vessel split of the landings pipeline (reference
    R/initdb.R:379-397): flokkur == -4, sampling_type FLND."""
    return _landings_spark(spark, sf_dir, foreign=True)


# --------------------------------------------------------------- p6 rescale

PUBLISHED_SQL = """
SELECT sk.species, CAST(y AS INT) AS year,
       CAST((sk.tegund * 37) % 100 + y % 7 + 1 AS DOUBLE) AS iceland
FROM species_key sk, (SELECT unnest(generate_series(1995, 2001)) AS y)
"""


def published(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = fx.species_key(spark, sf_dir)
    years = spark.range(1995, 2002).select(F.col("id").cast("int").alias("year"))
    return sk.crossJoin(years).select(
        "species",
        "year",
        ((F.col("tegund") * 37) % 100 + F.col("year") % 7 + 1).cast("double").alias("iceland"),
    )


@register(
    "p6_landings_rescale",
    _landings_ctes(foreign=False)
    + f""",
published AS ({PUBLISHED_SQL}),
db AS (
  SELECT species, year, SUM(weight_total) / 1000 AS catch
  FROM filtered GROUP BY species, year
),
ratios AS (
  SELECT p.species, p.year, p.iceland / d.catch AS r
  FROM published p JOIN db d ON p.species = d.species AND p.year = d.year
  WHERE p.year BETWEEN 1993 AND 2005
),
rescaled AS (
  SELECT f.species, f.year,
         CASE WHEN rt.r IS NULL THEN f.weight_total
              ELSE rt.r * f.weight_total END AS weight_total
  FROM filtered f
  LEFT JOIN ratios rt ON f.species = rt.species AND f.year = rt.year
)
SELECT species, year,
       ROUND(SUM(weight_total) / 1000, 3) AS catch_kt,
       COUNT(*) AS n
FROM rescaled GROUP BY species, year
""",
)
def p6_landings_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ling/tusk published-landings rescale (reference
    R/initdb.R:469-483): per-(species, year) ratio r = published /
    DB catch over 1993-2005, applied multiplicatively where a ratio
    exists; verified on per-(species, year) rescaled totals. The
    scalar table is tiny → broadcast back onto the fact rows; the
    rescale costs one extra map stage, no new wide shuffle. Totals
    re-rounded to 3 dp so cross-engine sum-order ulps can't flip the
    hash."""
    landings = _landings_spark(spark, sf_dir, foreign=False)
    res = landings_plan.rescale_by_published(landings, published(spark, sf_dir))
    return res.groupBy("species", "year").agg(
        F.round(F.sum("weight_total") / 1000, 3).alias("catch_kt"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------------------- p7 shrimp overlay

# shared by p7 (overlay only) and p9 (overlay → ldist → import)
_SHRIMP_CTES = """
fixed AS (
  SELECT s.synis_id, s.ar, s.man,
         CASE WHEN s.synaflokkur = 37 THEN 14 ELSE s.synaflokkur END AS synaflokkur,
         s.skiki, s.fjardarreitur,
         CASE WHEN ct.togtimi_fx IS NOT NULL THEN ct.togtimi_fx ELSE s.togtimi END AS togtimi,
         CASE WHEN cl.toglengd_fx IS NOT NULL THEN cl.toglengd_fx ELSE s.toglengd END AS toglengd
  FROM stodvar s
  LEFT JOIN corrected_togtimi ct ON s.synis_id = ct.synis_id
  LEFT JOIN corrected_toglengd cl ON s.synis_id = cl.synis_id
  WHERE s.synis_id NOT IN (SELECT synis_id FROM bad_synis_id)
),
existing AS (SELECT o_orderkey AS synis_id FROM orders WHERE o_orderkey % 5 = 0),
shr AS (
  SELECT * FROM fixed
  WHERE synaflokkur IN (14, 37)
    AND synis_id NOT IN (SELECT synis_id FROM existing)
)"""

_P7_SQL = (
    fx.with_clause(
        "stodvar", "corrected_togtimi", "corrected_toglengd", "bad_synis_id"
    )
    + ",\n"
    + _SHRIMP_CTES.lstrip()
    + """
SELECT synis_id AS tow, ar AS year, man AS month,
       concat_ws('_', CAST(skiki AS VARCHAR), CAST(fjardarreitur AS VARCHAR)) AS areacell,
       skiki, fjardarreitur, togtimi, toglengd,
       COUNT(*) OVER (PARTITION BY ar, fjardarreitur, skiki) AS towcount
FROM shr
"""
)


# ------------------------------------------------ p9 shrimp ldist + import

_P9_SQL = (
    fx.with_clause(
        "stodvar",
        "corrected_togtimi",
        "corrected_toglengd",
        "bad_synis_id",
        "species_key",
        "lengdir",
        "numer",
    )
    + ",\n"
    + _SHRIMP_CTES.lstrip()
    + """,
stations_shr AS (
  SELECT synis_id AS tow, ar AS year, man AS month,
         concat_ws('_', CAST(skiki AS VARCHAR), CAST(fjardarreitur AS VARCHAR)) AS areacell,
         skiki, fjardarreitur, togtimi, toglengd,
         COUNT(*) OVER (PARTITION BY ar, fjardarreitur, skiki) AS towcount,
         (['INS', 'XINS', 'XS', 'SEA'])[1 + CAST(synis_id % 4 AS INT)] AS sampling_type,
         CAST(skiki * 100 + COALESCE(fjardarreitur, 0.0) AS DOUBLE) AS size
  FROM shr
),
biom_mat AS (
  SELECT 41 AS tegund, 0.000628641104521994 AS a, 2.84713109335131 AS b, 0.1 AS s
),
ratio AS (
  SELECT synis_id, tegund,
    CASE WHEN fj_talid = 0 THEN 1.0
         ELSE fj_talid / (CASE WHEN fj_maelt = 0 THEN 1.0 ELSE fj_maelt END) END AS r,
    CASE WHEN afli = 0 THEN NULL
         ELSE afli / (CASE WHEN vigt_synis = 0 THEN NULL ELSE vigt_synis END) END AS biom_r,
    vigt_synis
  FROM numer
),
base AS (
  SELECT l.synis_id, l.tegund, l.lengd, l.fjoldi, l.kyn, l.kynthroski, sk.species,
         rt.r, rt.biom_r, rt.vigt_synis,
         ROUND((CASE WHEN bm.s = 0 OR bm.s IS NULL THEN 1.0 ELSE 1.0 / bm.s END) * l.lengd, 0)
           / (CASE WHEN bm.s = 0 OR bm.s IS NULL THEN 1.0 ELSE 1.0 / bm.s END) AS lengd_interval
  FROM lengdir l
  JOIN species_key sk ON l.tegund = sk.tegund
  LEFT JOIN biom_mat bm ON l.tegund = bm.tegund
  LEFT JOIN ratio rt ON l.synis_id = rt.synis_id AND l.tegund = rt.tegund
),
iv AS (
  SELECT synis_id, tegund, lengd_interval, SUM(fjoldi) AS fjoldi_by_int
  FROM base GROUP BY 1, 2, 3
),
grp AS (
  SELECT synis_id, tegund, SUM(fjoldi) AS fjoldi_sum FROM base GROUP BY 1, 2
),
ivw AS (
  SELECT i.synis_id, i.tegund, i.lengd_interval, i.fjoldi_by_int,
         CASE WHEN g.fjoldi_sum * bm.a * ROUND(POW(i.lengd_interval, bm.b), 6) = 0 THEN NULL
              ELSE i.fjoldi_by_int / g.fjoldi_sum * bm.a * ROUND(POW(i.lengd_interval, bm.b), 6)
         END AS fpw
  FROM iv i
  JOIN grp g ON i.synis_id = g.synis_id AND i.tegund = g.tegund
  LEFT JOIN biom_mat bm ON i.tegund = bm.tegund
),
grpw AS (
  SELECT synis_id, tegund, SUM(fpw) AS fpw_sum FROM ivw GROUP BY 1, 2
),
mw AS (
  SELECT i.synis_id, i.tegund, i.lengd_interval,
         FLOOR((CASE WHEN g.fpw_sum = 0 THEN NULL ELSE i.fpw / g.fpw_sum END)
         * (CASE WHEN rt.vigt_synis = 0 THEN NULL ELSE rt.vigt_synis END
            / CASE WHEN i.fjoldi_by_int = 0 THEN NULL ELSE i.fjoldi_by_int END)
         * 1000000.0 + 0.5) / 1000000.0 AS mean_wt
  FROM ivw i
  JOIN grpw g ON i.synis_id = g.synis_id AND i.tegund = g.tegund
  LEFT JOIN ratio rt ON i.synis_id = rt.synis_id AND i.tegund = rt.tegund
),
scaled AS (
  SELECT b.synis_id AS tow, b.tegund, b.lengd, b.kyn, b.kynthroski, b.species,
         b.fjoldi * (CASE WHEN b.tegund IN (41) THEN b.biom_r ELSE b.r END) AS fjoldi,
         m.mean_wt
  FROM base b
  JOIN mw m ON b.synis_id = m.synis_id AND b.tegund = m.tegund
            AND b.lengd_interval = m.lengd_interval
),
joined AS (
  SELECT st.tow, st.year, st.month, st.areacell, st.sampling_type, st.skiki,
         st.fjardarreitur, st.togtimi, st.toglengd, st.towcount, st.size,
         l.tegund, l.lengd, l.kyn, l.kynthroski, l.species, l.fjoldi, l.mean_wt
  FROM scaled l RIGHT JOIN stations_shr st ON l.tow = st.tow
)
SELECT tow, year, month, areacell, sampling_type, skiki, fjardarreitur, togtimi, species,
  CASE WHEN COALESCE(lengd, 0.0) > 4 AND tegund = 41 THEN COALESCE(lengd, 0.0) / 10
       ELSE COALESCE(lengd, 0.0) END AS length,
  COALESCE(fjoldi, 0.0) AS "count",
  CASE WHEN kyn = 2 THEN 'F' WHEN kyn = 1 THEN 'M' ELSE '' END AS sex,
  CASE WHEN kynthroski > 1 THEN 2 WHEN kynthroski = 1 THEN 1 ELSE NULL END AS maturity_stage,
  0 AS age,
  CASE WHEN mean_wt IS NULL OR towcount IS NULL THEN NULL
       ELSE FLOOR(
         (mean_wt / COALESCE(CASE WHEN sampling_type IN ('XS', 'XINS', 'SEA')
                                  THEN 1.0 ELSE toglengd END, 1.0))
         / towcount
         * COALESCE(CASE WHEN sampling_type IN ('XS', 'XINS', 'SEA')
                         THEN 1.0 ELSE size END, 1.0) * 1000000.0 + 0.5) / 1000000.0
  END AS weight,
  'iceland-ldist-infjord' AS data_source
FROM joined
WHERE tow NOT IN (100000, 400000)
"""
)


@register("p9_shrimp_ldist", _P9_SQL)
def p9_shrimp_ldist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shrimp ldist end-to-end (reference R/initdb_add_shrimp.R:
    187-267): the p7 stations overlay → skala_med_toldum2 with the
    interval-allometric mean_wt chain → right-join onto the shrimp
    stations → mm-entered-length fix (lengd/10 for shrimp > 4),
    recodes, weight-for-index scaling ((mean_wt / towlength[=1 for
    index types]) / towcount * size[=1 for index types], nvl-guarded
    as in d6) → replace-by-source import under
    'iceland-ldist-infjord' and read-back from the partitioned fact
    store. The fact write is partitioned (data_source, year), so the
    import swaps one source's partitions and year filters prune.
    weight rounded to 6 dp on both sides (pow() ulp discipline)."""
    import os

    from mfdb_hafro_etl_spark.catalog import load_table
    from mfdb_hafro_etl_spark.plans import shrimp as shrimp_plan
    from mfdb_hafro_etl_spark.plans.ldist import (
        shrimp_weight_for_index,
        skala_med_toldum2,
    )
    from mfdb_hafro_etl_spark.sinks import read_fact, replace_by_source

    existing = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(F.col("o_orderkey").alias("synis_id"))
    )
    st = shrimp_plan.build_shrimp_stations(
        fx.stodvar(spark, sf_dir),
        fx.corrected_togtimi(spark, sf_dir),
        fx.corrected_toglengd(spark, sf_dir),
        fx.bad_synis_id(spark, sf_dir),
        existing,
    )
    # reference stations_shr carries sampling_type and area size;
    # derive both deterministically from overlay columns
    st = st.withColumn(
        "sampling_type",
        F.element_at(
            F.array(F.lit("INS"), F.lit("XINS"), F.lit("XS"), F.lit("SEA")),
            (F.col("tow") % 4 + 1).cast("int"),
        ),
    ).withColumn(
        "size",
        (F.col("skiki") * 100 + F.coalesce(F.col("fjardarreitur"), F.lit(0.0))).cast("double"),
    )
    scaled = skala_med_toldum2(
        fx.lengdir(spark, sf_dir).join(
            F.broadcast(fx.species_key(spark, sf_dir)), on="tegund", how="inner"
        ),
        fx.numer(spark, sf_dir),
    ).withColumnRenamed("synis_id", "tow")
    j = scaled.join(st, on="tow", how="right")

    lengd0 = F.coalesce(F.col("lengd"), F.lit(0.0))
    length = F.when((lengd0 > 4) & (F.col("tegund") == 41), lengd0 / 10).otherwise(lengd0)
    sex = F.when(F.col("kyn") == 2, F.lit("F")).when(F.col("kyn") == 1, F.lit("M")).otherwise(F.lit(""))
    mat = (
        F.when(F.col("kynthroski") > 1, F.lit(2))
        .when(F.col("kynthroski") == 1, F.lit(1))
        .otherwise(F.lit(None).cast("int"))
    )
    is_index = F.col("sampling_type").isin("XS", "XINS", "SEA")
    towlen_eff = F.when(is_index, F.lit(1.0)).otherwise(F.col("toglengd"))
    size_eff = F.when(is_index, F.lit(1.0)).otherwise(F.col("size"))
    # floor(x*1e6 + 0.5)/1e6, NOT F.round: Spark's round() rounds the
    # double's SHORTEST DECIMAL REPRESENTATION (BigDecimal.valueOf)
    # while DuckDB rounds the exact binary value — at an exact decimal
    # tie (mean_wt 50.87685 / towcount 100 = 0.5087685, whose nearest
    # double is just BELOW the half) the engines systematically
    # disagree (0.508769 vs 0.508768). The floor construction is the
    # same correctly-rounded IEEE multiply/add/floor/divide on both
    # engines, so ties resolve identically; the oracle mirrors it.
    weight = F.when(
        F.col("mean_wt").isNull() | F.col("towcount").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.floor(
            shrimp_weight_for_index(F.col("mean_wt"), towlen_eff, F.col("towcount"), size_eff)
            * 1000000.0
            + 0.5
        )
        / 1000000.0
    )
    out = (
        j.filter(~F.col("tow").isin(100000, 400000))
        .select(
            "tow",
            "year",
            "month",
            "areacell",
            "sampling_type",
            "skiki",
            "fjardarreitur",
            "togtimi",
            "species",
            length.alias("length"),
            F.coalesce(F.col("fjoldi"), F.lit(0.0)).alias("count"),
            sex.alias("sex"),
            mat.alias("maturity_stage"),
            F.lit(0).alias("age"),
            weight.alias("weight"),
        )
    )
    tok = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join("/tmp/mfdb_suite", f"p9_fact_{tok}")
    replace_by_source(out, path, "iceland-ldist-infjord", sub_partition_cols=["year"])
    return read_fact(spark, path).filter(F.col("data_source") == "iceland-ldist-infjord")


# --------------------------------------------------------- p10 statlant

_P10_SQL = (
    fx.with_clause("ices_landed_catch")
    + """,
f AS (
  SELECT DISTINCT species_code AS species, area, country, subarea, year, landings
  FROM ices_landed_catch
  WHERE species_code IN ('LIN', 'USK')
    AND trim(area) = '5'
    AND country <> 'Iceland'
    AND trim(subarea) LIKE 'a%'
    AND year BETWEEN 1966 AND 2013
),
spread AS (
  SELECT f.*, CAST(m AS INT) AS month, landings * 1000.0 / 12 AS weight_total
  FROM f, (SELECT unnest(generate_series(1, 12)) AS m)
)
SELECT year, month, species, weight_total, 'LLN' AS gear, '2741' AS areacell,
       'FLND' AS sampling_type, 'statlant.foreign.landings' AS data_source
FROM spread WHERE weight_total IS NOT NULL
"""
)


@register("p10_statlant", _P10_SQL)
def p10_statlant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statlant/ICES foreign-landings pipeline (reference
    R/initdb.R:552-576): species IN-list + trim/LIKE chain over
    padded area/subarea codes, country exclusion, year band, distinct
    over the surviving extract, annual → monthly month-spread
    (landings·1e3/12), constant decode columns, na.omit on the spread
    value, replace-by-source import under
    'statlant.foreign.landings'. The spread is explode(sequence) —
    narrow, no grid join, no shuffle before the import."""
    import os

    from mfdb_hafro_etl_spark.operators.grids import month_spread
    from mfdb_hafro_etl_spark.sinks import read_fact, replace_by_source

    ices = fx.ices_landed_catch(spark, sf_dir)
    f = (
        ices.filter(
            F.col("species_code").isin("LIN", "USK")
            & (F.trim(F.col("area")) == "5")
            & (F.col("country") != "Iceland")
            & F.trim(F.col("subarea")).like("a%")
            & F.col("year").between(1966, 2013)
        )
        .drop("species")
        .withColumnRenamed("species_code", "species")
        .dropDuplicates()
    )
    spread = month_spread(
        f.withColumn("landings_k", F.col("landings") * 1000.0), "landings_k", "weight_total"
    )
    out = (
        spread.filter(F.col("weight_total").isNotNull())
        .select(
            "year",
            "month",
            "species",
            "weight_total",
            F.lit("LLN").alias("gear"),
            F.lit("2741").alias("areacell"),
            F.lit("FLND").alias("sampling_type"),
        )
    )
    tok = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join("/tmp/mfdb_suite", f"p10_fact_{tok}")
    replace_by_source(out, path, "statlant.foreign.landings", sub_partition_cols=["year"])
    return read_fact(spark, path).filter(F.col("data_source") == "statlant.foreign.landings")


# ------------------------------------------------------ p11 old landings

_P11_SQL = (
    fx.with_clause(
        "lods", "skipasaga", "gear_mapping", "species_key", "port2sr", "vigtarskra"
    )
    + f""",
landings_map AS ({LANDINGS_MAP_SQL}),
base AS (
  SELECT skip_nr, vinnsluhofn AS hofn, radlykill AS komunr,
         make_date(artal, manudur, 1) AS l_dags, skipsgerd AS gerd, fteg,
         0 AS kfteg, reiknistudull * magn AS magn_oslaegt, veidarfaeri,
         artal AS ar, manudur AS man,
         CASE WHEN manudur < 9
              THEN CAST(artal - 1 AS VARCHAR) || CAST(artal AS VARCHAR)
              ELSE CAST(artal AS VARCHAR) || CAST(artal + 1 AS VARCHAR)
         END AS timabil
  FROM vigtarskra
),
j AS (
  SELECT b.*, lm.saga_nr FROM base b
  LEFT JOIN landings_map lm
    ON b.skip_nr = lm.skip_nr AND b.komunr = lm.komunr AND b.hofn = lm.hofn
),
j2 AS (SELECT j.*, g.gear FROM j LEFT JOIN gear_mapping g ON j.veidarfaeri = g.veidarfaeri),
j3 AS (SELECT j2.*, sk.species FROM j2 JOIN species_key sk ON j2.fteg = sk.tegund),
j4 AS (SELECT j3.*, p.areacell FROM j3 LEFT JOIN port2sr p ON j3.hofn = p.hofn)
SELECT magn_oslaegt AS weight_total, 'LND' AS sampling_type, areacell, species,
       ar AS year, man AS month, COALESCE(gear, 'LLN') AS gear, timabil,
       'fiskifelagid_pre82.landings' AS data_source
FROM j4
"""
)


@register("p11_old_landings", _P11_SQL)
def p11_old_landings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-1982 weighing-ledger landings (reference R/initdb.R:
    580-612 fiskifelagid.vigtarskra66_81): yyyy.mm → date synth,
    reiknistudull × magn conversion to ungutted weight, fishing-season
    label (year-1‖year before September, year‖year+1 after — kept in
    the output so the season conditional is hash-verified), landings-
    map + SCD-registry lookups, gear map with 'LLN' fallback, species
    whitelist, port → areacell, replace-by-source import under
    'fiskifelagid_pre82.landings'. The skipasaga attribute join is
    key-unique (adds no rows, all attribute columns dropped by the
    final projection — mirrored chain, Catalyst prunes it); the
    oracle omits it."""
    import os

    from mfdb_hafro_etl_spark.sinks import read_fact, replace_by_source

    v = fx.vigtarskra(spark, sf_dir)
    saga = fx.skipasaga(spark, sf_dir)
    lmap = landings_plan.build_landings_map(fx.lods(spark, sf_dir), saga)
    timabil = F.when(
        F.col("manudur") < 9,
        F.concat((F.col("artal") - 1).cast("string"), F.col("artal").cast("string")),
    ).otherwise(
        F.concat(F.col("artal").cast("string"), (F.col("artal") + 1).cast("string"))
    )
    base = v.select(
        "skip_nr",
        F.col("vinnsluhofn").alias("hofn"),
        F.col("radlykill").alias("komunr"),
        F.make_date("artal", "manudur", F.lit(1)).alias("l_dags"),
        F.col("skipsgerd").alias("gerd"),
        "fteg",
        F.lit(0).alias("kfteg"),
        (F.col("reiknistudull") * F.col("magn")).alias("magn_oslaegt"),
        "veidarfaeri",
        F.col("artal").alias("ar"),
        F.col("manudur").alias("man"),
        timabil.alias("timabil"),
    )
    # no broadcast hint on the landings map: it is fact-derived, so
    # the decision stays runtime-size-based (AQE broadcasts it at
    # test SF where it fits, sort-merges at corpus scale)
    j = base.join(lmap, on=["skip_nr", "komunr", "hofn"], how="left")
    # reference also left-joins the kvoti.skipasaga attributes by
    # (skip_nr, saga_nr); the key is unique so no fan-out, and every
    # attribute column is dropped below
    j = j.join(F.broadcast(saga), on=["skip_nr", "saga_nr"], how="left")
    j = j.join(F.broadcast(fx.gear_mapping(spark, sf_dir)), on="veidarfaeri", how="left")
    j = j.join(
        F.broadcast(fx.species_key(spark, sf_dir).withColumnRenamed("tegund", "fteg")),
        on="fteg",
        how="inner",
    )
    j = j.join(F.broadcast(fx.port2sr(spark, sf_dir)), on="hofn", how="left")
    out = j.select(
        F.col("magn_oslaegt").alias("weight_total"),
        F.lit("LND").alias("sampling_type"),
        "areacell",
        "species",
        F.col("ar").alias("year"),
        F.col("man").alias("month"),
        F.coalesce(F.col("gear"), F.lit("LLN")).alias("gear"),
        "timabil",
    )
    tok = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join("/tmp/mfdb_suite", f"p11_fact_{tok}")
    replace_by_source(out, path, "fiskifelagid_pre82.landings", sub_partition_cols=["year"])
    return read_fact(spark, path).filter(F.col("data_source") == "fiskifelagid_pre82.landings")


@register("p7_shrimp_overlay", _P7_SQL)
def p7_shrimp_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shrimp incremental overlay (reference
    R/initdb_add_shrimp.R:89-175 + shrimp_support_tables.R:2100-2132):
    broadcast correction overlays (nvl2 per column), bad-sample drop,
    37→14 reclassification, anti-join against already-imported tows,
    fjord areacell paste, towcount window. The only shuffle is the
    towcount window partitioning."""
    from mfdb_hafro_etl_spark.catalog import load_table
    from mfdb_hafro_etl_spark.plans import shrimp as shrimp_plan

    existing = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(F.col("o_orderkey").alias("synis_id"))
    )
    return shrimp_plan.build_shrimp_stations(
        fx.stodvar(spark, sf_dir),
        fx.corrected_togtimi(spark, sf_dir),
        fx.corrected_toglengd(spark, sf_dir),
        fx.bad_synis_id(spark, sf_dir),
        existing,
    )
