"""Suite queries for the M6 query API, the vessel-taxonomy dimension
pipeline, semi-structured props parsing, and the sliding-window
streaming variant."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark import api
from mfdb_hafro_etl_spark import streaming as st
from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.functions.conditionals import decode
from mfdb_hafro_etl_spark.functions.domain import vessel_id
from mfdb_hafro_etl_spark.suite import fixtures as fx
from mfdb_hafro_etl_spark.suite import register
from mfdb_hafro_etl_spark.suite.io_streaming import _mem

# a small measurement fact derived from lineitem (same derivation on
# both engines) so the API queries have a stable target
_FACT_SQL = """
SELECT 'SP' || CAST(1 + l_partkey % 50 AS VARCHAR) AS species,
       CAST(year(l_shipdate) AS INT)               AS year,
       ROUND(l_quantity * 1.5, 1)                  AS length,
       CAST(l_linenumber + 1 AS DOUBLE)            AS "count",
       ROUND(l_quantity * 0.2, 2)                  AS weight
FROM lineitem
"""


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("SP"), (1 + F.col("l_partkey") % 50).cast("string")).alias("species"),
        F.year("l_shipdate").alias("year"),
        F.round(F.col("l_quantity") * 1.5, 1).alias("length"),
        (F.col("l_linenumber") + 1).cast("double").alias("count"),
        F.round(F.col("l_quantity") * 0.2, 2).alias("weight"),
    )


# -------------------------------------------------------- m6 sample_count
@register(
    "m6_sample_count",
    f"""
    WITH fact AS ({_FACT_SQL})
    SELECT species, year, ROUND(SUM("count"), 2) AS total_count
    FROM fact
    WHERE year BETWEEN 1994 AND 1996 AND species IN ('SP1', 'SP2', 'SP3')
    GROUP BY 1, 2
    """,
)
def m6_sample_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query API (SURVEY §7 M6, mfdb_sample_count analog): grouped
    count totals under range + membership taxonomy filters; filters
    reach the parquet scan, the groupBy shuffles aggregated rows
    only."""
    return api.sample_count(
        _fact(spark, sf_dir),
        group_by=["species", "year"],
        filters={"year": (1994, 1996), "species": ["SP1", "SP2", "SP3"]},
    )


# ------------------------------------------------------ m6 weighted stats
@register(
    "m6_totalweight_meanlength",
    f"""
    WITH fact AS ({_FACT_SQL})
    SELECT species,
           ROUND(SUM("count" * weight), 2) AS total_weight,
           ROUND(SUM("count" * length) / SUM("count"), 4) AS mean_length
    FROM fact
    WHERE year BETWEEN 1995 AND 1997
    GROUP BY 1
    """,
)
def m6_totalweight_meanlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mfdb_sample_totalweight (count x mean weight, reference
    R/initdb_add_shrimp.R:208-214) + count-weighted mean length, one
    pass each."""
    fact = _fact(spark, sf_dir)
    tw = api.sample_totalweight(fact, ["species"], {"year": (1995, 1997)})
    ml = api.sample_meanlength(fact, ["species"], {"year": (1995, 1997)})
    return tw.join(ml, on="species")


# -------------------------------------------- m6 meanweight + stddev
@register(
    "m6_meanweight_stddev",
    f"""
    WITH fact AS ({_FACT_SQL})
    SELECT species,
           ROUND(SUM("count" * weight) / SUM("count"), 4) AS mean_weight,
           ROUND(SQRT(GREATEST(
             (SUM("count" * length * length)
              - SUM("count" * length) * SUM("count" * length) / SUM("count"))
             / (SUM("count") - 1), 0.0)), 4) AS stddev_length
    FROM fact
    WHERE year BETWEEN 1995 AND 1997
    GROUP BY 1
    """,
)
def m6_meanweight_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mfdb_sample_meanweight + mfdb_sample_meanlength_stddev analogs:
    count-weighted mean weight and one-pass closed-form weighted
    length stddev (three partial sums, single shuffle)."""
    fact = _fact(spark, sf_dir)
    mw = api.sample_meanweight(fact, ["species"], {"year": (1995, 1997)})
    sd = api.sample_meanlength_stddev(fact, ["species"], {"year": (1995, 1997)}).select(
        "species", "stddev_length"
    )
    return mw.join(sd, on="species")


# --------------------------------------------------------- m6 rawdata
@register(
    "m6_rawdata",
    f"""
    WITH fact AS ({_FACT_SQL})
    SELECT species, year, length, "count"
    FROM fact
    WHERE year BETWEEN 1996 AND 1996 AND species IN ('SP7', 'SP11')
    """,
)
def m6_rawdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mfdb_sample_rawdata analog: the filtered fact rows themselves.
    The projection + filters reach the parquet scan (column pruning,
    PushedFilters) — no shuffle at all."""
    return api.sample_rawdata(
        _fact(spark, sf_dir),
        columns=["species", "year", "length", "count"],
        filters={"year": (1996, 1996), "species": ["SP7", "SP11"]},
    )


# --------------------------------------------------- p8 vessel taxonomy
VESSEL_TYPE_DECODE = [(-4, "FGN"), (0, "UNK"), (1, "COM"), (2, "FRZ"), (3, "SMB")]


def _vessel_type_csv_sql() -> str:
    from mfdb_hafro_etl_spark.catalog import packaged_dim_path

    return (
        f"read_csv('{packaged_dim_path('vessel_type')}', header=true, "
        "columns={'vessel_type': 'VARCHAR', 'description': 'VARCHAR'})"
    )


@register(
    "p8_vessel_taxonomy",
    fx.with_clause("skipasaga")
    + f"""
    SELECT CASE WHEN COALESCE(CAST(skip_nr AS VARCHAR), '') || '-'
                     || CAST(COALESCE(saga_nr, 0) AS VARCHAR) = '-0' THEN NULL
                ELSE COALESCE(CAST(skip_nr AS VARCHAR), '') || '-'
                     || CAST(COALESCE(saga_nr, 0) AS VARCHAR) END AS vessel,
           CASE flokkur WHEN -4 THEN 'FGN' WHEN 0 THEN 'UNK' WHEN 1 THEN 'COM'
                        WHEN 2 THEN 'FRZ' WHEN 3 THEN 'SMB' ELSE 'OTH' END AS vessel_type,
           vt.description AS vessel_type_desc,
           heiti AS name, brl AS tonnage, lengd AS length_m
    FROM skipasaga
    LEFT JOIN {_vessel_type_csv_sql()} vt
      ON vt.vessel_type = CASE flokkur WHEN -4 THEN 'FGN' WHEN 0 THEN 'UNK'
                               WHEN 1 THEN 'COM' WHEN 2 THEN 'FRZ'
                               WHEN 3 THEN 'SMB' ELSE 'OTH' END
    """,
)
def p8_vessel_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vessel taxonomy dimension (SURVEY S14, reference
    R/initdb.R:163-198): registry rows → vessel identity + the
    13-branch Oracle DECODE → typed dimension attributes, decorated
    with the PACKAGED vessel-type taxonomy (reference
    inst/vessel_type.csv:1-9, shipped as
    mfdb_hafro_etl_spark/data/vessel_type.csv) — codes missing from
    the public table (UNK/SMB/OTH) keep a NULL description, which the
    oracle reads from the same CSV. Dimension-sized: built once,
    broadcast everywhere."""
    from mfdb_hafro_etl_spark.catalog import load_packaged_dim

    saga = fx.skipasaga(spark, sf_dir)
    vt = load_packaged_dim(spark, "vessel_type").withColumnRenamed(
        "description", "vessel_type_desc"
    )
    dim = saga.select(
        vessel_id(F.col("skip_nr"), F.col("saga_nr")).alias("vessel"),
        decode(F.col("flokkur"), VESSEL_TYPE_DECODE, default="OTH").alias("vessel_type"),
        F.col("heiti").alias("name"),
        F.col("brl").alias("tonnage"),
        F.col("lengd").alias("length_m"),
    )
    return dim.join(F.broadcast(vt), on="vessel_type", how="left").select(
        "vessel", "vessel_type", "vessel_type_desc", "name", "tonnage", "length_m"
    )


# ------------------------------------------------------ events props JSON
@register(
    "x_events_props_json",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def x_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON field extraction JVM-side
    (get_json_object — no Python, no schema inference pass), bucketed
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ------------------------------------------------------ sliding windows
@register(
    "x_stream_sliding",
    """
    SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR * o, '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events, unnest([0, 1]) t(o)
    GROUP BY 1, 2
    """,
)
def x_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregate (2-hour windows, 1-hour
    slide): each event lands in two overlapping windows; watermark
    bounds state exactly as in the tumbling case."""
    ev = st.read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(
            F.window(F.col("ts"), "2 hours", "1 hour").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return st.run_available_now(agg, _mem("stream_sliding"), output_mode="complete", state_partitions=st.auto_state_partitions(spark, sf_dir))


# ------------------------------------- stream-static enrichment join
@register(
    "x_stream_enrich",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           concat('C', CAST(user_id % 5 AS VARCHAR)) AS cohort,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def x_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: a broadcast dimension (user cohorts)
    joins each micro-batch with NO streaming state, then the enriched
    stream rolls up per (hour window, cohort). The oracle derives the
    cohort analytically from user_id, so a wrong join key or a
    dropped batch row fails the hash."""
    ev = st.read_events_stream(spark, sf_dir)
    dim = spark.range(0, 5).select(
        F.col("id").cast("long").alias("user_bucket"),
        F.concat(F.lit("C"), F.col("id").cast("string")).alias("cohort"),
    )
    agg = st.stream_enriched_window_agg(ev, dim)
    return st.run_available_now(agg, _mem("stream_enrich"), output_mode="complete", state_partitions=st.auto_state_partitions(spark, sf_dir))


# --------------------------------------- stream-stream interval join
@register(
    "x_stream_join",
    """
    SELECT b.event_id AS purchase_id, a.event_id AS view_id, a.user_id
    FROM events a JOIN events b
      ON a.event_type = 'view' AND b.event_type = 'purchase'
     AND a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def x_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user
    views in the preceding 30 minutes. Watermarks on both sides +
    the event-time bound in the join condition purge expired state
    (the scale contract — an unbounded stream-stream join would hold
    every row forever); inner join emits in append mode as matches
    form. Verified against the batch self-join oracle."""
    ev = st.read_events_stream(spark, sf_dir)
    joined = st.stream_interval_join(ev)
    return st.run_available_now(joined, _mem("stream_join"), state_partitions=st.auto_state_partitions(spark, sf_dir))
