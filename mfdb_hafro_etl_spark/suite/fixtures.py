"""Oracle-shaped fixture tables, derived deterministically from the
driver's testdata so the reference pipelines (plans/) can be
hash-verified against DuckDB oracles end-to-end.

Every fixture is defined twice, in lockstep: a Spark builder
``(spark, sf_dir) -> DataFrame`` and a DuckDB SQL string over the
pre-registered testdata views. Expression shapes are mirrored exactly
(same arithmetic, same CASE structure) so both engines compute
bit-identical values — no float reductions in the generators (integer
sums only), so results are order-independent.

Schemas follow FIXTURES.md; the edge branches each fixture must cover
(NULL skip, NULL i_gildi sentinel, zero divisors, tegund 9 / 41,
synaflokkur 30/35, ...) come from the reference call sites cited
there.
"""

from __future__ import annotations

import functools
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from mfdb_hafro_etl_spark.localrel import local_df

from mfdb_hafro_etl_spark.catalog import load_table

# session → {(builder, sf_dir): DataFrame} — lazy-PLAN memo (r12).
# Building a fixture plan costs hundreds of py4j round-trips
# (~0.5-0.75 ms each on this harness), and the suite re-builds the
# shared fixtures for every pipeline arm that uses them — measured
# 49.9 s of pure plan construction across the 141-arm sf0.1 bench,
# a large slice of it these builders. A DataFrame is an immutable
# logical plan, so handing every caller the SAME object changes
# nothing about what executes: no data is cached (execution still
# scans parquet per action — this is NOT result caching), callers
# compose transformations on top without mutating the shared plan,
# and the weak session key keeps test sessions collectable. Same
# pattern as the long-standing _SAGA_MEMO below, minus even the
# collect.
_PLAN_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _sf_dir_signature(sf_dir: str) -> tuple:
    """Freshness key of every testdata table under ``sf_dir`` —
    (name, mtime_ns, size) per ``<table>.parquet`` entry, the same
    key load_table uses per table (catalog._TABLE_MEMO). A memoized
    fixture PLAN closes over load_table results; keying the memo on
    sf_dir alone would keep serving a plan whose underlying
    DataFrame/FileIndex references a table that was since rewritten
    IN PLACE under the same path (r12 verdict finding #2 — latent,
    now closed). os.stat of ~10 entries is microseconds per call."""
    import os

    from mfdb_hafro_etl_spark.catalog import TESTDATA_TABLES

    sig = []
    for t in TESTDATA_TABLES:
        try:
            st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
            sig.append((t, st.st_mtime_ns, st.st_size))
        except OSError:
            sig.append((t, None, None))
    return tuple(sig)


def plan_memo(fn):
    """Memoize a ``(spark, sf_dir) -> DataFrame`` plan builder per
    (session, sf_dir, testdata signature). Only for PURE builders: no
    eager actions, no dependence on mutable state — the returned plan
    must mean the same thing every time it is requested. Rewriting
    any table under ``sf_dir`` changes the signature and the fixture
    plan rebuilds (and re-reads through load_table, whose own memo
    invalidates on the same stat key)."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        per_session = _PLAN_MEMO.setdefault(spark, {})
        key = (fn.__module__, fn.__qualname__, sf_dir, _sf_dir_signature(sf_dir))
        hit = per_session.get(key)
        if hit is None:
            hit = fn(spark, sf_dir)
            per_session[key] = hit
        return hit

    return wrapped

# synaflokkur domain (reference R/initdb.R:117; R/initdb_shrimp.R:214)
SYNAFLOKKUR = [1, 2, 8, 10, 12, 14, 20, 30, 31, 34, 35, 37, 38]

# species whitelist: 1..31 minus {20,29}, plus shrimp 41 and 48
# (reference R/initdb.R:63-69 species_key; 41 = shrimp biom species,
# R/shrimp_support_tables.R:2137)
SPECIES_TEGUND = [t for t in range(1, 32) if t not in (20, 29)] + [41, 48]


# --------------------------------------------------------------- stodvar
# sampling stations from orders (reference schema R/initdb.R:104-147)

STODVAR_SQL = """
SELECT
  o_orderkey                                   AS synis_id,
  CAST(o_orderdate AS DATE)                    AS dags,
  CASE WHEN o_orderkey % 11 = 0 THEN NULL
       ELSE CAST(o_custkey % 200 AS INT) END   AS skip,
  CAST(year(o_orderdate) AS INT)               AS ar,
  CAST(month(o_orderdate) AS INT)              AS man,
  CAST(({syn})[1 + o_orderkey % 13] AS INT)    AS synaflokkur,
  CAST(o_orderkey % 100 AS INT)                AS veidarfaeri,
  63.0 + (o_orderkey % 400) * 0.01             AS kastad_n_breidd,
  -(18.0 + (o_custkey % 900) * 0.01)           AS kastad_v_lengd,
  63.0 + (o_orderkey % 400) * 0.01 + ((o_orderkey % 7) - 3) * 0.02 AS hift_n_breidd,
  -(18.0 + (o_custkey % 900) * 0.01) + ((o_orderkey % 5) - 2) * 0.02 AS hift_v_lengd,
  CAST(o_orderkey % 500 AS DOUBLE)             AS dypi_kastad,
  CAST(300 + o_orderkey % 400 AS INT)          AS reitur,
  CASE WHEN o_orderkey % 4 = 0 THEN NULL
       ELSE CAST(o_orderkey % 4 AS INT) END    AS smareitur,
  CAST(1 + o_orderkey % 8 AS INT)              AS skiki,
  CASE WHEN o_orderkey % 6 = 0 THEN NULL
       ELSE CAST(o_orderkey % 40 AS DOUBLE) END AS fjardarreitur,
  CASE WHEN o_orderkey % 9 = 0 THEN NULL
       ELSE ROUND(0.1 * (o_orderkey % 50), 1) END AS toglengd,
  CAST(10 + o_orderkey % 80 AS DOUBLE)         AS togtimi
FROM orders
""".format(syn=str(SYNAFLOKKUR))


@plan_memo
def stodvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    lat = F.lit(63.0) + (k % 400) * 0.01
    lon = -(F.lit(18.0) + (c % 900) * 0.01)
    return o.select(
        k.alias("synis_id"),
        F.col("o_orderdate").cast("date").alias("dags"),
        F.when(k % 11 == 0, F.lit(None)).otherwise((c % 200).cast("int")).alias("skip"),
        F.year("o_orderdate").alias("ar"),
        F.month("o_orderdate").alias("man"),
        F.element_at(
            F.array(*[F.lit(v) for v in SYNAFLOKKUR]), (k % 13 + 1).cast("int")
        ).alias("synaflokkur"),
        (k % 100).cast("int").alias("veidarfaeri"),
        lat.alias("kastad_n_breidd"),
        lon.alias("kastad_v_lengd"),
        (lat + ((k % 7) - 3) * 0.02).alias("hift_n_breidd"),
        (lon + ((k % 5) - 2) * 0.02).alias("hift_v_lengd"),
        (k % 500).cast("double").alias("dypi_kastad"),
        (300 + k % 400).cast("int").alias("reitur"),
        F.when(k % 4 == 0, F.lit(None)).otherwise((k % 4).cast("int")).alias("smareitur"),
        (1 + k % 8).cast("int").alias("skiki"),
        F.when(k % 6 == 0, F.lit(None)).otherwise((k % 40).cast("double")).alias("fjardarreitur"),
        F.when(k % 9 == 0, F.lit(None)).otherwise(F.round(0.1 * (k % 50), 1)).alias("toglengd"),
        (10 + k % 80).cast("double").alias("togtimi"),
    )


# ------------------------------------------------------------- skipasaga
# SCD-2 vessel registry (reference R/initdb.R:106-108,348-349): two
# validity generations per vessel; skip_nr % 17 = 3 gets a NULL
# i_gildi on generation 1 (sentinel-date branch, initdb.R:108);
# skip_nr % 10 = 0 is foreign (flokkur -4, initdb.R:368).

SKIPASAGA_SQL = """
SELECT
  s.skip_nr,
  g.saga_nr,
  CASE WHEN g.saga_nr = 1 THEN
    CASE WHEN s.skip_nr % 17 = 3 THEN NULL ELSE DATE '1990-01-01' END
  ELSE DATE '1999-12-31' END                   AS i_gildi,
  CASE WHEN g.saga_nr = 1 THEN DATE '1999-12-31'
       ELSE DATE '2100-01-01' END              AS ur_gildi,
  CASE WHEN s.skip_nr % 10 = 0 THEN -4
       ELSE CAST(s.skip_nr % 5 AS INT) END     AS flokkur,
  s.skip_nr * 10.0                             AS brl,
  'V' || CAST(s.skip_nr AS VARCHAR)            AS heiti,
  20.0 + s.skip_nr % 30                        AS lengd
FROM (SELECT DISTINCT CAST(c_custkey % 200 AS INT) AS skip_nr FROM customer) s
CROSS JOIN (SELECT CAST(unnest(generate_series(1, 2)) AS INT) AS saga_nr) g
"""


# session → {sf_dir: collected dim} — weak keys so a test session's
# local relations die with it (and a recycled id() can't alias)
_SAGA_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def skipasaga(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vessel-history dimension. Genuinely dimension-sized (≤400
    vessels × 2 generations regardless of SF — the skip_nr domain is
    c_custkey % 200), and consumed by 2+ broadcast branches in every
    landings/stations plan. Each broadcast branch would otherwise
    re-run the customer scan + distinct; collecting once per
    (session, sf) into a driver-local relation makes every broadcast
    a plan-local hash build with no upstream jobs — the S13
    dim-collect pattern (collect scalar/dim-sized only)."""
    per_session = _SAGA_MEMO.setdefault(spark, {})
    hit = per_session.get(sf_dir)
    if hit is not None:
        return hit
    built = _skipasaga_build(spark, sf_dir)
    local = local_df(spark, [tuple(r) for r in built.collect()], built.schema)
    per_session[sf_dir] = local
    return local


def _skipasaga_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    skips = c.select((F.col("c_custkey") % 200).cast("int").alias("skip_nr")).distinct()
    gens = spark.range(1, 3).select(F.col("id").cast("int").alias("saga_nr"))
    s, g = F.col("skip_nr"), F.col("saga_nr")
    return skips.crossJoin(gens).select(
        "skip_nr",
        "saga_nr",
        F.when(
            g == 1,
            F.when(s % 17 == 3, F.lit(None)).otherwise(F.lit("1990-01-01").cast("date")),
        )
        .otherwise(F.lit("1999-12-31").cast("date"))
        .alias("i_gildi"),
        F.when(g == 1, F.lit("1999-12-31").cast("date"))
        .otherwise(F.lit("2100-01-01").cast("date"))
        .alias("ur_gildi"),
        F.when(s % 10 == 0, F.lit(-4)).otherwise((s % 5).cast("int")).alias("flokkur"),
        (s * 10.0).alias("brl"),
        F.concat(F.lit("V"), s.cast("string")).alias("heiti"),
        (F.lit(20.0) + s % 30).alias("lengd"),
    )


# ---------------------------------------------------------- gear_mapping
# veidarfaeri → gear code (reference inst/mapping.txt:1-58); 10% of
# codes left unmapped to exercise the left-join NULL → 'LLN' fallback
# (reference R/initdb.R:372).

GEAR_MAPPING_SQL = """
SELECT CAST(v AS INT) AS veidarfaeri,
       'G' || CAST(v % 12 AS VARCHAR) AS gear
FROM (SELECT unnest(generate_series(0, 99)) AS v)
WHERE v % 10 <> 7
"""


@plan_memo
def gear_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("id")
    return (
        spark.range(0, 100)
        .filter(v % 10 != 7)
        .select(
            v.cast("int").alias("veidarfaeri"),
            F.concat(F.lit("G"), (v % 12).cast("string")).alias("gear"),
        )
    )


# ----------------------------------------------------------- reitmapping
# areacell validation grid (reference inst demo-data reitmapping.tsv,
# R/initdb.R:27-30): cells 10*r+s for r 300..699, s 1..3; r % 5 = 0
# dropped so the inner-join validation actually rejects rows.

REITMAPPING_SQL = """
SELECT CAST(10 * r + s AS VARCHAR)        AS GRIDCELL,
       CAST(r % 10 + 101 AS INT)          AS DIVISION,
       CAST(r % 30 AS VARCHAR)            AS SUBDIVISION,
       CAST(10 * r + s AS INT)            AS id
FROM (SELECT unnest(generate_series(300, 699)) AS r),
     (SELECT unnest(generate_series(1, 3)) AS s)
WHERE r % 5 <> 0
"""


@plan_memo
def reitmapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, s = F.col("r"), F.col("s")
    return (
        spark.range(300, 700)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(1, 4).select(F.col("id").alias("s")))
        .filter(r % 5 != 0)
        .select(
            (r * 10 + s).cast("int").cast("string").alias("GRIDCELL"),
            (r % 10 + 101).cast("int").alias("DIVISION"),
            (r % 30).cast("string").alias("SUBDIVISION"),
            (r * 10 + s).cast("int").alias("id"),
        )
    )


# ----------------------------------------------------------- species_key
# tegund → species whitelist (reference R/initdb.R:63-69).

SPECIES_KEY_SQL = """
SELECT CAST(t AS INT) AS tegund, 'SP' || CAST(t AS VARCHAR) AS species
FROM (SELECT unnest({lst}) AS t)
""".format(lst=str(SPECIES_TEGUND))


@plan_memo
def species_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return local_df(
        spark, [(t, f"SP{t}") for t in SPECIES_TEGUND], "tegund INT, species STRING"
    )


# --------------------------------------------------------------- lengdir
# length measurements from lineitem (reference R/initdb.R:203-227);
# covers kyn NULL/1/2, kynthroski NULL/1..4, tegund 9 (special
# maturity) and 41 (biom species).

LENGDIR_SQL = """
SELECT
  l_orderkey                                   AS synis_id,
  CAST(1 + l_partkey % 50 AS INT)              AS tegund,
  ROUND(l_quantity * 1.5, 1)                   AS lengd,
  CAST(l_linenumber + 1 AS DOUBLE)             AS fjoldi,
  CASE WHEN l_suppkey % 3 = 0 THEN NULL
       ELSE CAST(l_suppkey % 3 AS INT) END     AS kyn,
  CASE WHEN l_partkey % 5 = 0 THEN NULL
       ELSE CAST(l_partkey % 5 AS INT) END     AS kynthroski
FROM lineitem
"""


@plan_memo
def lengdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    return li.select(
        F.col("l_orderkey").alias("synis_id"),
        (1 + pk % 50).cast("int").alias("tegund"),
        F.round(F.col("l_quantity") * 1.5, 1).alias("lengd"),
        (F.col("l_linenumber") + 1).cast("double").alias("fjoldi"),
        F.when(sk % 3 == 0, F.lit(None)).otherwise((sk % 3).cast("int")).alias("kyn"),
        F.when(pk % 5 == 0, F.lit(None)).otherwise((pk % 5).cast("int")).alias("kynthroski"),
    )


# ----------------------------------------------------------------- numer
# counted/measured totals per (synis_id, tegund) (reference
# R/shrimp_support_tables.R:2141-2151). Aggregates use integer sums
# only (cents for money) so both engines agree bit-for-bit regardless
# of reduction order; zero branches exercise every divide guard.

NUMER_SQL = """
SELECT
  l_orderkey                                   AS synis_id,
  CAST(1 + l_partkey % 50 AS INT)              AS tegund,
  CAST(SUM(l_linenumber + 1) AS DOUBLE)        AS fj_maelt,
  CASE WHEN l_orderkey % 7 = 0 THEN 0.0
       ELSE CAST(SUM(l_linenumber + 2) AS DOUBLE) END AS fj_talid,
  CASE WHEN l_orderkey % 13 = 0 THEN 0.0
       ELSE SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 10000.0 END AS afli,
  CASE WHEN l_orderkey % 11 = 0 THEN 0.0
       ELSE SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 50000.0 END AS vigt_synis
FROM lineitem
GROUP BY 1, 2
"""


@plan_memo
def numer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sid = F.col("l_orderkey")
    cents = F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
    return (
        li.groupBy(
            sid.alias("synis_id"),
            (1 + F.col("l_partkey") % 50).cast("int").alias("tegund"),
        )
        .agg(
            F.sum(F.col("l_linenumber") + 1).cast("double").alias("fj_maelt"),
            F.sum(F.col("l_linenumber") + 2).cast("double").alias("_ft"),
            cents.alias("_cents"),
        )
        .select(
            "synis_id",
            "tegund",
            "fj_maelt",
            F.when(F.col("synis_id") % 7 == 0, F.lit(0.0)).otherwise(F.col("_ft")).alias("fj_talid"),
            F.when(F.col("synis_id") % 13 == 0, F.lit(0.0))
            .otherwise(F.col("_cents") / 10000.0)
            .alias("afli"),
            F.when(F.col("synis_id") % 11 == 0, F.lit(0.0))
            .otherwise(F.col("_cents") / 50000.0)
            .alias("vigt_synis"),
        )
    )


# --------------------------------------------------------------- kvarnir
# age/otolith measurements (reference R/initdb.R:294-312); one row per
# measured fish → restrict to l_linenumber <= 2.

KVARNIR_SQL = """
SELECT
  l_orderkey                                   AS synis_id,
  CAST(1 + l_partkey % 50 AS INT)              AS tegund,
  CAST(l_linenumber AS INT)                    AS nr,
  ROUND(l_quantity * 1.2, 1)                   AS lengd,
  CAST(1 + l_suppkey % 12 AS INT)              AS aldur,
  CASE WHEN l_suppkey % 3 = 0 THEN NULL
       ELSE CAST(l_suppkey % 3 AS INT) END     AS kyn,
  CASE WHEN l_partkey % 5 = 0 THEN NULL
       ELSE CAST(l_partkey % 5 AS INT) END     AS kynthroski,
  ROUND(l_quantity * 8.1, 2)                   AS oslaegt,
  ROUND(l_quantity * 7.3, 2)                   AS slaegt,
  CASE WHEN l_partkey % 6 = 0 THEN NULL
       ELSE ROUND(l_quantity * 0.9, 2) END     AS lifur,
  ROUND(l_quantity * 0.4, 2)                   AS kynfaeri
FROM lineitem
WHERE l_linenumber <= 2
"""


@plan_memo
def kvarnir(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    pk, sk, q = F.col("l_partkey"), F.col("l_suppkey"), F.col("l_quantity")
    return li.select(
        F.col("l_orderkey").alias("synis_id"),
        (1 + pk % 50).cast("int").alias("tegund"),
        F.col("l_linenumber").cast("int").alias("nr"),
        F.round(q * 1.2, 1).alias("lengd"),
        (1 + sk % 12).cast("int").alias("aldur"),
        F.when(sk % 3 == 0, F.lit(None)).otherwise((sk % 3).cast("int")).alias("kyn"),
        F.when(pk % 5 == 0, F.lit(None)).otherwise((pk % 5).cast("int")).alias("kynthroski"),
        F.round(q * 8.1, 2).alias("oslaegt"),
        F.round(q * 7.3, 2).alias("slaegt"),
        F.when(pk % 6 == 0, F.lit(None)).otherwise(F.round(q * 0.9, 2)).alias("lifur"),
        F.round(q * 0.4, 2).alias("kynfaeri"),
    )


# ------------------------------------------------------------------ lods
# landings (reference R/initdb.R:347-375); veidisvaedi 'I'/'U' split,
# NULL skip_nr rows, ports spanning every port2division bucket.

LODS_SQL = """
SELECT
  CASE WHEN l_suppkey % 19 = 0 THEN NULL
       ELSE CAST(l_suppkey % 200 AS INT) END   AS skip_nr,
  CAST(l_linenumber AS INT)                    AS komunr,
  CAST(l_partkey % 160 AS INT)                 AS hofn,
  CAST(l_suppkey % 100 AS INT)                 AS veidarfaeri,
  CAST(1 + l_partkey % 50 AS INT)              AS fteg,
  CAST(l_orderkey % 5 AS INT)                  AS kfteg,
  CAST(year(l_shipdate) AS INT)                AS ar,
  CAST(month(l_shipdate) AS INT)               AS man,
  CAST(ROUND(l_extendedprice * 100) AS BIGINT) / 1000.0 AS magn_oslaegt,
  CASE WHEN l_orderkey % 4 = 0 THEN 'U' ELSE 'I' END AS veidisvaedi,
  CAST(l_shipdate AS DATE)                     AS l_dags
FROM lineitem
"""


@plan_memo
def lods(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    return li.select(
        F.when(sk % 19 == 0, F.lit(None)).otherwise((sk % 200).cast("int")).alias("skip_nr"),
        F.col("l_linenumber").cast("int").alias("komunr"),
        (pk % 160).cast("int").alias("hofn"),
        (sk % 100).cast("int").alias("veidarfaeri"),
        (1 + pk % 50).cast("int").alias("fteg"),
        (ok % 5).cast("int").alias("kfteg"),
        F.year("l_shipdate").alias("ar"),
        F.month("l_shipdate").alias("man"),
        (F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") / 1000.0).alias("magn_oslaegt"),
        F.when(ok % 4 == 0, F.lit("U")).otherwise(F.lit("I")).alias("veidisvaedi"),
        F.col("l_shipdate").cast("date").alias("l_dags"),
    )


# ------------------------------------------------------------ fiskifelag
# historical (pre-1994) landings from orders (reference
# R/initdb.R:360-363): no l_dags (synthesized from yyyymm), saga_nr=0.

FISKIFELAG_SQL = """
SELECT
  CAST(o_orderkey % 100 AS INT)                AS veidarfaeri,
  CAST(o_custkey % 200 AS INT)                 AS skip_nr,
  CAST(1 + o_orderkey % 50 AS INT)             AS fteg,
  CAST(1980 + o_orderkey % 14 AS INT)          AS ar,
  CAST(month(o_orderdate) AS INT)              AS man,
  CAST(o_custkey % 160 AS INT)                 AS hofn,
  CAST(ROUND(o_totalprice * 100) AS BIGINT) / 2000.0  AS magn_oslaegt,
  CASE WHEN o_orderkey % 4 = 0 THEN 'U' ELSE 'I' END AS veidisvaedi
FROM orders
WHERE o_orderkey % 3 = 0
"""


@plan_memo
def fiskifelag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        (k % 100).cast("int").alias("veidarfaeri"),
        (c % 200).cast("int").alias("skip_nr"),
        (1 + k % 50).cast("int").alias("fteg"),
        (1980 + k % 14).cast("int").alias("ar"),
        F.month("o_orderdate").alias("man"),
        (c % 160).cast("int").alias("hofn"),
        (F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 2000.0).alias("magn_oslaegt"),
        F.when(k % 4 == 0, F.lit("U")).otherwise(F.lit("I")).alias("veidisvaedi"),
    )


# --------------------------------------------------------------- port2sr
# port → areacell lookup (reference R/initdb.R:340-343 port2sr).

PORT2SR_SQL = """
SELECT CAST(h AS INT) AS hofn,
       CAST(3001 + (h * 7) % 699 AS VARCHAR) AS areacell
FROM (SELECT unnest(generate_series(0, 159)) AS h)
"""


@plan_memo
def port2sr(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.col("id")
    return spark.range(0, 160).select(
        h.cast("int").alias("hofn"),
        (3001 + (h * 7) % 699).cast("int").cast("string").alias("areacell"),
    )


# ----------------------------------------------------- correction tables
# keyed hard-coded fixes + exclusion list (reference
# R/shrimp_support_tables.R:39-53 bad_synis_id, :375-479
# corrected_togtimi, :483-1931 corrected_toglengd) — derived
# deterministically instead of hard-coded, same shapes.

CORRECTED_TOGTIMI_SQL = """
SELECT o_orderkey AS synis_id, 60.0 AS togtimi_fx
FROM orders WHERE o_orderkey % 13 = 5
"""


@plan_memo
def corrected_togtimi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 13 == 5).select(
        F.col("o_orderkey").alias("synis_id"), F.lit(60.0).alias("togtimi_fx")
    )


CORRECTED_TOGLENGD_SQL = """
SELECT o_orderkey AS synis_id, ROUND(2.5 + o_orderkey % 3, 1) AS toglengd_fx
FROM orders WHERE o_orderkey % 17 = 2
"""


@plan_memo
def corrected_toglengd(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 17 == 2).select(
        F.col("o_orderkey").alias("synis_id"),
        F.round(2.5 + F.col("o_orderkey") % 3, 1).alias("toglengd_fx"),
    )


BAD_SYNIS_ID_SQL = """
SELECT o_orderkey AS synis_id FROM orders WHERE o_orderkey % 41 = 7
"""


# ---------------------------------------------------- ices_landed_catch
# Statlant/ICES landed-catch extract (reference R/initdb.R:552-576):
# padded area/subarea strings exercise the trim + LIKE chain, Iceland
# rows the country filter, NULL landings the na.omit, and the %3
# species split the IN-list whitelist.

ICES_LANDED_CATCH_SQL = """
SELECT
  (['LIN', 'USK', 'COD'])[1 + o_orderkey % 3]        AS species_code,
  'Name-' || (['LIN', 'USK', 'COD'])[1 + o_orderkey % 3] AS species,
  ([' 5', '5 ', '5', '27'])[1 + o_custkey % 4]       AS area,
  (['Iceland', 'Norway', 'Faroe', 'UK', 'Greenland'])[1 + o_orderkey % 5] AS country,
  (['a1', ' a2', 'a3 ', 'b1'])[1 + (o_orderkey + o_custkey) % 4] AS subarea,
  CAST(1960 + o_orderkey % 60 AS INT)                AS year,
  CASE WHEN o_orderkey % 23 = 0 THEN NULL
       ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100000.0 END AS landings
FROM orders
"""


@plan_memo
def ices_landed_catch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    spc = F.element_at(F.array(F.lit("LIN"), F.lit("USK"), F.lit("COD")), (1 + k % 3).cast("int"))
    return o.select(
        spc.alias("species_code"),
        F.concat(F.lit("Name-"), spc).alias("species"),
        F.element_at(
            F.array(F.lit(" 5"), F.lit("5 "), F.lit("5"), F.lit("27")), (1 + c % 4).cast("int")
        ).alias("area"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["Iceland", "Norway", "Faroe", "UK", "Greenland"]]),
            (1 + k % 5).cast("int"),
        ).alias("country"),
        F.element_at(
            F.array(F.lit("a1"), F.lit(" a2"), F.lit("a3 "), F.lit("b1")),
            (1 + (k + c) % 4).cast("int"),
        ).alias("subarea"),
        (1960 + k % 60).cast("int").alias("year"),
        F.when(k % 23 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100000.0)
        .alias("landings"),
    )


# ------------------------------------------------------------ vigtarskra
# Pre-1982 weighing-ledger landings (reference R/initdb.R:580-612
# fiskifelagid.vigtarskra66_81): raw (artal, manudur) date parts,
# reiknistudull conversion factors, NULL skip_nr rows, veidarfaeri
# codes spanning the gear-map fallback.

VIGTARSKRA_SQL = """
SELECT
  CASE WHEN o_orderkey % 19 = 0 THEN NULL
       ELSE CAST(o_custkey % 200 AS INT) END         AS skip_nr,
  CAST(o_custkey % 160 AS INT)                       AS vinnsluhofn,
  CAST(o_orderkey % 10 AS INT)                       AS radlykill,
  CAST(o_orderkey % 6 AS INT)                        AS skipsgerd,
  CAST(1 + o_orderkey % 50 AS INT)                   AS fteg,
  CAST(ROUND(o_totalprice * 100) AS BIGINT) / 500.0  AS magn,
  1.0 + (o_orderkey % 5) * 0.1                       AS reiknistudull,
  CAST(1966 + o_orderkey % 16 AS INT)                AS artal,
  CAST(month(o_orderdate) AS INT)                    AS manudur,
  CAST(o_orderkey % 100 AS INT)                      AS veidarfaeri
FROM orders
"""


@plan_memo
def vigtarskra(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        F.when(k % 19 == 0, F.lit(None)).otherwise((c % 200).cast("int")).alias("skip_nr"),
        (c % 160).cast("int").alias("vinnsluhofn"),
        (k % 10).cast("int").alias("radlykill"),
        (k % 6).cast("int").alias("skipsgerd"),
        (1 + k % 50).cast("int").alias("fteg"),
        (F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 500.0).alias("magn"),
        (1.0 + (k % 5) * 0.1).alias("reiknistudull"),
        (1966 + k % 16).cast("int").alias("artal"),
        F.month("o_orderdate").alias("manudur"),
        (k % 100).cast("int").alias("veidarfaeri"),
    )


@plan_memo
def bad_synis_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 41 == 7).select(
        F.col("o_orderkey").alias("synis_id")
    )


# All fixture CTEs, ready to splice into a WITH clause.
FIXTURE_CTES: dict[str, str] = {
    "stodvar": STODVAR_SQL,
    "skipasaga": SKIPASAGA_SQL,
    "gear_mapping": GEAR_MAPPING_SQL,
    "reitmapping": REITMAPPING_SQL,
    "species_key": SPECIES_KEY_SQL,
    "lengdir": LENGDIR_SQL,
    "numer": NUMER_SQL,
    "kvarnir": KVARNIR_SQL,
    "lods": LODS_SQL,
    "fiskifelag": FISKIFELAG_SQL,
    "port2sr": PORT2SR_SQL,
    "corrected_togtimi": CORRECTED_TOGTIMI_SQL,
    "corrected_toglengd": CORRECTED_TOGLENGD_SQL,
    "bad_synis_id": BAD_SYNIS_ID_SQL,
    "ices_landed_catch": ICES_LANDED_CATCH_SQL,
    "vigtarskra": VIGTARSKRA_SQL,
}


def with_clause(*names: str) -> str:
    """``WITH a AS (...), b AS (...)`` for the named fixtures (order
    preserved; list dependencies before dependents)."""
    parts = [f"{n} AS ({FIXTURE_CTES[n]})" for n in names]
    return "WITH " + ",\n".join(parts)
