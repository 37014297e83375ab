"""Mergeable-sketch suite queries (extension scope: "a novel
sketch" from the driver brief).

Each oracle re-implements the SAME sketch algorithm in DuckDB SQL —
identical md5 hashing, identical hex-window bit extraction, identical
integer harmonic sums — so the hash comparison validates the
distributed Spark build against an independent single-node build of
the same mathematical object (not merely "some approximate answer").
See operators/sketches.py for why every step is engine-exact: the
only float ops are one final division (HLL), none (CMS), and one
interpolation expression built from exactly-representable inputs
(histogram quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from mfdb_hafro_etl_spark.localrel import local_df

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import sketches as sk
from mfdb_hafro_etl_spark.suite import register

# DuckDB fragments mirroring operators/sketches.py bit extraction.
_HEX = "0123456789abcdef"


def _sql_hex2(col_expr: str, pos: int) -> str:
    return (
        f"((strpos('{_HEX}', substr({col_expr}, {pos}, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({col_expr}, {pos + 1}, 1)) - 1))"
    )


# rho of the 13-hex-char tail t: 4*(leading '0' chars) + nibble
# leading-zero bits of the first non-zero char + 1; all-zero tail = 53
_SQL_RHO = """
CASE WHEN length(regexp_extract(t, '^(0*)', 1)) = 13 THEN 53
     ELSE length(regexp_extract(t, '^(0*)', 1)) * 4
          + (CASE substr(t || 'x', length(regexp_extract(t, '^(0*)', 1)) + 1, 1)
               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
               ELSE 0 END)
          + 1
END"""

# alpha·m²·2^53 spelled as the same left-to-right product the Spark
# side prefolds (Python: ((0.7213/(1.0+1.079/256))·256)·256·2^53)
_SQL_HLL_SCALE = "(0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * 9007199254740992.0)"

_SQL_HLL_EST = f"""
CASE WHEN {_SQL_HLL_SCALE} / CAST(s_int AS DOUBLE) <= 640.0 AND n_zero > 0
     THEN round(256.0 * ln(256.0 / CAST(n_zero AS DOUBLE)), 2)
     ELSE round({_SQL_HLL_SCALE} / CAST(s_int AS DOUBLE), 2)
END AS est_distinct"""


@register(
    "x_sketch_hll",
    f"""
    WITH rv AS (
      SELECT {_sql_hex2("h", 1)} AS idx, {_SQL_RHO} AS rho
      FROM (SELECT md5(CAST(o_custkey AS VARCHAR)) AS h,
                   substr(md5(CAST(o_custkey AS VARCHAR)), 3, 13) AS t
            FROM orders)
    ), regs AS (
      SELECT r.range AS idx, COALESCE(mx.rho, 0) AS rho
      FROM range(256) r
      LEFT JOIN (SELECT idx, MAX(rho) AS rho FROM rv GROUP BY idx) mx
        ON r.range = mx.idx
    ), s AS (
      SELECT SUM(1::BIGINT << (53 - rho)) AS s_int,
             SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS n_zero
      FROM regs
    )
    SELECT 256 AS m, CAST(n_zero AS INTEGER) AS n_zero, {_SQL_HLL_EST}
    FROM s
    """,
)
def x_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-style distinct-customer estimate over orders — fixed 256
    registers regardless of data size (operators/sketches.py)."""
    o = load_table(spark, sf_dir, "orders")
    return sk.hll_estimate(o, "o_custkey").select(
        "m", "n_zero", "est_distinct"
    )


@register(
    "x_sketch_hll_by",
    f"""
    WITH rv AS (
      SELECT st, {_sql_hex2("h", 1)} AS idx, {_SQL_RHO} AS rho
      FROM (SELECT o_orderstatus AS st,
                   md5(CAST(o_custkey AS VARCHAR)) AS h,
                   substr(md5(CAST(o_custkey AS VARCHAR)), 3, 13) AS t
            FROM orders)
    ), spine AS (
      SELECT st, r.range AS idx
      FROM (SELECT DISTINCT o_orderstatus AS st FROM orders) g
      CROSS JOIN range(256) r
    ), regs AS (
      SELECT spine.st, spine.idx, COALESCE(mx.rho, 0) AS rho
      FROM spine
      LEFT JOIN (SELECT st, idx, MAX(rho) AS rho FROM rv GROUP BY st, idx) mx
        ON spine.st = mx.st AND spine.idx = mx.idx
    ), s AS (
      SELECT st,
             SUM(1::BIGINT << (53 - rho)) AS s_int,
             SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS n_zero
      FROM regs GROUP BY st
    )
    SELECT st AS o_orderstatus, CAST(n_zero AS INTEGER) AS n_zero, {_SQL_HLL_EST}
    FROM s
    """,
)
def x_sketch_hll_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group approximate distinct (distinct customers per order
    status): the groupBy(keys).countDistinct replacement whose shuffle
    is ≤ 256 rows per key per partition instead of every distinct
    (key, value) pair."""
    o = load_table(spark, sf_dir, "orders")
    return sk.hll_estimate_by(o, ["o_orderstatus"], "o_custkey").select(
        "o_orderstatus", "n_zero", "est_distinct"
    )


_CMS_PROBES = (1, 2, 5, 17, 42)


@register(
    "x_sketch_cms",
    f"""
    WITH hashed AS (
      SELECT md5(CAST(l_suppkey AS VARCHAR)) AS h FROM lineitem
    ), cells AS (
      SELECT r.range AS row,
             ((strpos('{_HEX}', substr(h, CAST(2 * r.range + 1 AS INTEGER), 1)) - 1) * 16
              + (strpos('{_HEX}', substr(h, CAST(2 * r.range + 2 AS INTEGER), 1)) - 1)) % 64 AS bucket,
             COUNT(*) AS cnt
      FROM hashed CROSS JOIN range(4) r
      GROUP BY 1, 2
    ), probe_cells AS (
      SELECT p.probe, r.range AS row,
             ((strpos('{_HEX}', substr(md5(CAST(p.probe AS VARCHAR)), CAST(2 * r.range + 1 AS INTEGER), 1)) - 1) * 16
              + (strpos('{_HEX}', substr(md5(CAST(p.probe AS VARCHAR)), CAST(2 * r.range + 2 AS INTEGER), 1)) - 1)) % 64 AS bucket
      FROM (SELECT * FROM (VALUES {", ".join(f"({k})" for k in _CMS_PROBES)}) AS t(probe)) p
      CROSS JOIN range(4) r
    ), est AS (
      SELECT probe, MIN(COALESCE(cnt, 0)) AS est_cnt
      FROM probe_cells LEFT JOIN cells USING (row, bucket)
      GROUP BY probe
    ), exact AS (
      SELECT l_suppkey AS probe, COUNT(*) AS exact_cnt
      FROM lineitem WHERE l_suppkey IN {_CMS_PROBES}
      GROUP BY l_suppkey
    )
    SELECT est.probe, est.est_cnt, COALESCE(exact.exact_cnt, 0) AS exact_cnt
    FROM est LEFT JOIN exact USING (probe)
    """,
)
def x_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch over lineitem suppliers with probed
    point estimates next to the exact counts (est ≥ exact is the CMS
    guarantee; a pytest property pins it)."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = sk.cms_sketch(li, "l_suppkey")
    probes = local_df(spark, [(k,) for k in _CMS_PROBES], "probe int")
    est = sk.cms_point_estimate(sketch, probes, "probe")
    exact = (
        li.filter(F.col("l_suppkey").isin(*_CMS_PROBES))
        .groupBy(F.col("l_suppkey").alias("probe"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        est.join(F.broadcast(exact), "probe", "left")
        .select("probe", "est_cnt", F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"))
    )


@register(
    "x_sketch_histq",
    """
    WITH hist AS (
      SELECT LEAST(24, GREATEST(0, CAST(floor((CAST(l_quantity AS DOUBLE) - 0.0) / 2.0) AS INTEGER))) AS bin,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin) AS cum,
             SUM(cnt) OVER (ORDER BY bin) - cnt AS cum_prev
      FROM hist
    ), tot AS (SELECT SUM(cnt) AS n FROM hist),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
           FROM (VALUES (0.5), (0.9), (0.99)) AS t(q))
    SELECT q,
           round(0.0 + CAST(bin AS DOUBLE) * 2.0
                 + 2.0 * (q * n - cum_prev) / CAST(cnt AS DOUBLE), 4) AS est
    FROM qs CROSS JOIN tot
    JOIN cum ON cum.cum >= q * n AND cum.cum_prev < q * n
    """,
)
def x_sketch_histq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantile estimates of lineitem quantity
    (p50/p90/p99) — the global-sort-free quantile path."""
    li = load_table(spark, sf_dir, "lineitem")
    return sk.histogram_quantiles(li, "l_quantity", 0.0, 50.0, 25, [0.5, 0.9, 0.99])


def _sql_hex52(expr: str) -> str:
    """52-bit integer value of the first 13 hex chars of ``expr`` —
    DuckDB has no conv(), so spell the positional polynomial; every
    term is exact in BIGINT (16^12 < 2^49)."""
    terms = [
        f"(strpos('{_HEX}', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (12 - i)}::BIGINT"
        for i in range(13)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "x_sketch_kmv",
    f"""
    WITH a AS (
      SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h
      FROM orders ORDER BY h LIMIT 256
    ), b AS (
      SELECT DISTINCT md5(CAST(c_custkey AS VARCHAR)) AS h
      FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY h LIMIT 256
    ), m AS (
      SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
      ORDER BY h LIMIT 256
    ), theta AS (
      SELECT MAX({_sql_hex52("h")}) AS theta_int, COUNT(*) AS k_u FROM m
    ), inter AS (
      SELECT COUNT(*) AS n_common
      FROM a JOIN b USING (h) CROSS JOIN theta
      WHERE {_sql_hex52("h")} <= theta_int
    )
    SELECT CAST(k_u AS INTEGER) AS k_u,
           CAST(n_common AS INTEGER) AS n_common,
           round(CAST(k_u - 1 AS DOUBLE) * 4503599627370496.0 / CAST(theta_int AS DOUBLE), 2) AS est_union,
           round(CAST(n_common AS DOUBLE) * 4503599627370496.0 / CAST(theta_int AS DOUBLE), 2) AS est_intersection
    FROM theta CROSS JOIN inter
    """,
)
def x_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta set-operation cardinality: distinct-customer UNION and
    INTERSECTION estimates between ordering customers and the BUILDING
    segment — the set algebra HLL registers cannot express. Each side
    is a TakeOrderedAndProject of ≤256 hashes (operators/sketches.py:
    kmv_sketch), so the estimate cost is independent of table size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = sk.kmv_sketch(o, "o_custkey")
    b = sk.kmv_sketch(c.filter(F.col("c_mktsegment") == "BUILDING"), "c_custkey")
    return sk.kmv_set_estimates(a, b)


# ---------------------------------------------------------------- layout
# Z-order locality demonstration (operators/layout.py): quantize two
# lineitem measures to 8-bit cells, Morton-interleave, and summarize
# each 256-value z-range. Tight per-bucket min/max on BOTH dimensions
# is the property that makes z-ordered parquet files prunable by
# either predicate; the file-level proof runs in tests/test_layout.py.
_Z_TERMS = " + ".join(
    f"(((qx >> {b}) & 1) << {2 * b}) + (((qp >> {b}) & 1) << {2 * b + 1})"
    for b in range(8)
)


@register(
    "x_layout_zorder",
    f"""
    WITH cells AS (
      SELECT LEAST(255, GREATEST(0, CAST(floor((CAST(l_quantity AS DOUBLE) - 0.0) / 0.1953125) AS INTEGER))) AS qx,
             LEAST(255, GREATEST(0, CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 429.6875) AS INTEGER))) AS qp
      FROM lineitem
    ), z AS (
      SELECT qx, qp, {_Z_TERMS} AS zv FROM cells
    )
    SELECT CAST(zv >> 8 AS INTEGER) AS z_hi,
           COUNT(*) AS n,
           MIN(qx) AS min_qx, MAX(qx) AS max_qx,
           MIN(qp) AS min_qp, MAX(qp) AS max_qp
    FROM z GROUP BY 1
    """,
)
def x_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order cluster-key summary over lineitem (quantity ×
    extendedprice): per 256-wide z-range, row count and per-dimension
    cell bounds (operators/layout.py: quantize + zvalue)."""
    from mfdb_hafro_etl_spark.operators import layout as lay

    li = load_table(spark, sf_dir, "lineitem")
    qx = lay.quantize(F.col("l_quantity"), 0.0, 50.0, 8)
    qp = lay.quantize(F.col("l_extendedprice"), 0.0, 110000.0, 8)
    z = lay.zvalue([F.col("qx"), F.col("qp")], 8)
    return (
        li.select(qx.alias("qx"), qp.alias("qp"))
        .withColumn("zv", z)
        .groupBy(F.shiftright(F.col("zv"), 8).cast("int").alias("z_hi"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("qx").alias("min_qx"),
            F.max("qx").alias("max_qx"),
            F.min("qp").alias("min_qp"),
            F.max("qp").alias("max_qp"),
        )
    )
