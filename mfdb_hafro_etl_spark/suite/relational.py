"""Core relational operator queries (SURVEY §2.2-§2.8) over the
driver's TPC-H-ish testdata, each with a DuckDB oracle.

Naming: the key prefix is the SURVEY §2 operator id the query
demonstrates (a1 = §2.4 A1, j7 = §2.3 J7, ...). Every computed
column is aliased identically in the Spark code and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.functions.conditionals import decode, nvl
from mfdb_hafro_etl_spark.functions.domain import range_bucket, vessel_id
from mfdb_hafro_etl_spark.operators import aggregates as agg_ops
from mfdb_hafro_etl_spark.operators import corrections as corr_ops
from mfdb_hafro_etl_spark.operators import grids as grid_ops
from mfdb_hafro_etl_spark.operators import joins as join_ops
from mfdb_hafro_etl_spark.operators import windows as win_ops
from mfdb_hafro_etl_spark.suite import register


# --------------------------------------------------------------- A1/F2/P4/C4
@register(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the flagship group-by+sum
    (SURVEY A1, reference R/initdb.R:461-464 catch-by-year shape).
    Partial (map-side) aggregation + single shuffle on the 6-group
    key; whole-stage codegen end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------------------ F1/F3/P1
@register(
    "f1_in_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_linestatus NOT IN ('O')
    """,
)
def f1_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + range + negated IN filters (SURVEY F1/F2/F3,
    reference R/initdb.R:117,368,491). All three predicates push down
    to the Parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & ~F.col("l_linestatus").isin("O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ------------------------------------------------------------------ F5/F6/C2
@register(
    "f5_like_regex",
    """
    SELECT p_partkey, UPPER(TRIM(p_name)) AS name_up, p_brand
    FROM part
    WHERE p_type LIKE 'ECO%' AND regexp_matches(p_name, '^(red|blue) ')
    """,
)
def f5_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regex filters (SURVEY F5/F6, reference R/initdb.R:557
    ``%like% 'a%'``; R/initdb.R:407 grepl)."""
    pt = load_table(spark, sf_dir, "part")
    return pt.filter(
        F.col("p_type").like("ECO%") & F.col("p_name").rlike("^(red|blue) ")
    ).select("p_partkey", F.upper(F.trim(F.col("p_name"))).alias("name_up"), "p_brand")


# --------------------------------------------------------------------- F4/C1
@register(
    "f4_null_policy",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(SUM(COALESCE(NULLIF(o_totalprice, 0.0), -1.0)), 2) AS total_fixed
    FROM orders
    WHERE NULLIF(o_orderpriority, '4-NOT SPECIFIED') IS NOT NULL
    GROUP BY o_orderstatus
    """,
)
def f4_null_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL policy: NULL-generating transform + isNotNull
    filter + nvl fill (SURVEY F4/C1; reference R/initdb.R:39,504 and
    nvl at R/initdb.R:116). Mirrors the engine stance that every
    predicate states its NULL behavior (SURVEY §7 hard part (a))."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("prio_n", F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")))
        .filter(F.col("prio_n").isNotNull())
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(nvl(F.nullif(F.col("o_totalprice"), F.lit(0.0)), -1.0)), 2).alias("total_fixed"),
        )
    )


# ------------------------------------------------------------------------ J2
@register(
    "j2_left_join",
    """
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY COALESCE(c.c_mktsegment, 'UNKNOWN')
    """,
)
def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with explicit cross-named keys + coalesce fill
    (SURVEY J2, reference R/initdb.R:106-107 ``by=c('skip'='skip_nr')``).
    Customer is broadcast → no shuffle of orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = join_ops.dim_join(o, c, on=F.col("o_custkey") == F.col("c_custkey"), how="left")
    return joined.groupBy(
        nvl(F.col("c_mktsegment"), "UNKNOWN").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ------------------------------------------------------------------------ J3
@register(
    "j3_broadcast_inner",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j3_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner dim join, broadcast hash (SURVEY J3, reference
    R/initdb.R:74,140-142 species whitelist)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = join_ops.dim_join(li, p, on=F.col("l_partkey") == F.col("p_partkey"), how="inner")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ------------------------------------------------------------------------ J4
@register(
    "j4_right_join",
    """
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(SUM(COALESCE(o.o_totalprice, 0.0)), 2) AS revenue
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def j4_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping every customer even with no orders,
    NULL-filled to zero (SURVEY J4, reference R/initdb.R:211-215
    right_join(stations) + nvl fills)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, on=F.col("o_custkey") == F.col("c_custkey"), how="right")
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.sum(nvl(F.col("o_totalprice"), 0.0)), 2).alias("revenue"),
    )


# ------------------------------------------------------------------------ J5
@register(
    "j5_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust,
           COALESCE(sn.n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def j5_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer union-merge of two keyed aggregates (SURVEY J5,
    reference R/initdb_add_shrimp.R:15-24 fjord-area full_join)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count(F.lit(1)).alias("n_supp"))
    j = cn.alias("cn").join(sn.alias("sn"), on=F.col("cn.nationkey") == F.col("sn.nationkey"), how="outer")
    return j.select(
        F.coalesce(F.col("cn.nationkey"), F.col("sn.nationkey")).alias("nationkey"),
        nvl(F.col("cn.n_cust"), 0).alias("n_cust"),
        nvl(F.col("sn.n_supp"), 0).alias("n_supp"),
    )


# ------------------------------------------------------------------------ J6
@register(
    "j6_anti_join",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def j6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers never seen in orders (SURVEY J6/U3,
    reference R/initdb_add_shrimp.R:169 anti_join against
    already-imported stations)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return join_ops.anti_join(c, o, on=["c_custkey"]).select("c_custkey", "c_mktsegment")


# ----------------------------------------------------------------------- J10
@register(
    "j10_semi_join",
    """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    GROUP BY p_brand
    """,
)
def j10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join whitelist (SURVEY J10, reference R/initdb.R:204,296
    species_key inner-join idiom, expressed cleanly as left_semi)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return join_ops.semi_join(p, li, on=["p_partkey"]).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts")
    )


# ------------------------------------------------------------------------ J7
@register(
    "j7_temporal_join",
    """
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l.l_extendedprice), 2) AS sum_price
    FROM lineitem l
    LEFT JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >  o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    WHERE o.o_orderkey IS NOT NULL
    GROUP BY l.l_returnflag
    """,
)
def j7_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/interval (as-of) join — SCD-2 valid-time resolution
    (SURVEY J7, reference R/initdb.R:106-108: equi key + (from, to]
    band). Range predicate lives IN the join condition; the registry
    side is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "valid_to", F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    j = join_ops.temporal_join(
        li, o,
        key="l_orderkey", registry_key="o_orderkey",
        event_date="l_shipdate", valid_from="o_orderdate", valid_to="valid_to",
        closed="right", how="left",
        # orders is fact-sized here, not a dim registry: equi-key SMJ
        # with the band as join filter; AQE may still broadcast at
        # small sf
        broadcast_registry=False,
    )
    return (
        j.filter(F.col("r.o_orderkey").isNotNull())
        .groupBy(F.col("l.l_returnflag").alias("l_returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l.l_extendedprice"), 2).alias("sum_price"),
        )
    )


# ------------------------------------------------------------------- J8/S10b
@register(
    "j8_month_spread",
    """
    WITH yearly AS (
      SELECT CAST(year(o_orderdate) AS INT) AS year, o_orderpriority,
             SUM(o_totalprice) AS total
      FROM orders GROUP BY 1, 2
    )
    SELECT y.year, CAST(m.month AS INT) AS month, y.o_orderpriority,
           ROUND(y.total / 12, 4) AS monthly
    FROM yearly y CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS month) m
    """,
)
def j8_month_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual totals fanned into a synthetic monthly grid, value/12
    (SURVEY J8 + §2.10.8, reference R/initdb.R:499-545 foreign/old
    landings month-spread). explode(sequence) — no grid join, no
    shuffle beyond the agg."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").alias("year"), "o_orderpriority"
    ).agg(F.sum("o_totalprice").alias("total"))
    return (
        grid_ops.month_spread(yearly, "total", "monthly")
        .withColumn("monthly", F.round(F.col("monthly"), 4))
        .select("year", "month", "o_orderpriority", "monthly")
    )


# ------------------------------------------------------------------------ J9
@register(
    "j9_join_coalesce",
    """
    SELECT c.c_custkey,
           CASE WHEN f.n_name_fix IS NOT NULL THEN f.n_name_fix ELSE n.n_name END AS nation_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT n_nationkey, 'FIX_' || n_name AS n_name_fix
               FROM nation WHERE n_nationkey < 10) f
           ON c.c_nationkey = f.n_nationkey
    """,
)
def j9_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + conditional coalesce of duplicate columns — the
    correction-overlay idiom nvl2(fix, fix, orig) (SURVEY J9 +
    §2.10.9, reference R/initdb_add_shrimp.R:338-341,
    R/shrimp_support_tables.R:2112-2116), via the engine's
    apply_correction operator."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = join_ops.dim_join(
        c, n, on=F.col("c_nationkey") == F.col("n_nationkey"), how="left"
    ).select("c_custkey", "c_nationkey", "n_name")
    fixes = (
        n.filter(F.col("n_nationkey") < 10)
        .select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.concat(F.lit("FIX_"), F.col("n_name")).alias("n_name_fix"),
        )
    )
    overlaid = corr_ops.apply_correction(
        base, fixes, key=["c_nationkey"], fixes={"n_name": "n_name_fix"}
    )
    return overlaid.select("c_custkey", F.col("n_name").alias("nation_name"))


# ------------------------------------------------------------------------ A2
@register(
    "a2_proportions",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(AVG(p), 6) AS avg_share
    FROM (
      SELECT l_returnflag,
             l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey) AS p
      FROM lineitem
    )
    GROUP BY l_returnflag
    """,
)
def a2_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level re-aggregation as a single-pass window proportion
    (SURVEY A2, reference R/shrimp_support_tables.R:2176-2209
    skala_med_toldum2's sum→rejoin→proportion collapsed to one
    shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    with_p = agg_ops.proportions_within(li, ["l_orderkey"], "l_quantity", out="p")
    return with_p.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("p"), 6).alias("avg_share"),
    )


# ------------------------------------------------------------------- A3/W3
@register(
    "a3_keep_first",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) = 1
    """,
)
def a3_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedupe-by-key-keep-first (SURVEY A3/W3, reference
    R/initdb.R:351 distinct(..., .keep_all=TRUE) — made
    order-explicit per SURVEY §4 hazards)."""
    li = load_table(spark, sf_dir, "lineitem")
    return win_ops.keep_first_per_group(
        li, keys=["l_orderkey"], order_by=["l_linenumber", "l_quantity"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# ------------------------------------------------------------------- A4/F7
@register(
    "a4_window_count",
    """
    SELECT DISTINCT user_id, event_type, n
    FROM (
      SELECT user_id, event_type,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
      FROM events
    )
    WHERE n > 1
    """,
)
def a4_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count as column + duplicate filter (SURVEY A4/W2/F7,
    reference R/initdb_add_shrimp.R:150-154 towcount;
    R/shrimp_support_tables.R:467-468 duplicate detection)."""
    ev = load_table(spark, sf_dir, "events")
    counted = win_ops.with_group_count(ev, ["user_id", "event_type"], "n")
    return counted.filter(F.col("n") > 1).select("user_id", "event_type", "n").dropDuplicates()


# ------------------------------------------------------------------- A6/W4
@register(
    "a6_first_per_group",
    """
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_date
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
    """,
)
def a6_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First row per group by explicit order (SURVEY A6/O3/W4,
    reference R/initdb.R:337-339 one-areacell-per-division)."""
    o = load_table(spark, sf_dir, "orders")
    return win_ops.keep_first_per_group(
        o, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"]
    ).select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_date"),
    )


# ------------------------------------------------------------------------ A7
@register(
    "a7_group_collect",
    """
    SELECT s_nationkey, array_to_string(list_sort(list(s_name)), ',') AS suppliers
    FROM supplier GROUP BY s_nationkey
    """,
)
def a7_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-split to named lists (SURVEY A7, reference
    R/initdb.R:52 division→gridcell map). collect_list is sorted for
    determinism, then joined to a string for stable comparison."""
    s = load_table(spark, sf_dir, "supplier")
    collected = agg_ops.group_collect_sorted(s, "s_nationkey", "s_name", out="items")
    return collected.select(
        "s_nationkey", F.array_join(F.col("items"), ",").alias("suppliers")
    )


# ------------------------------------------------------------------------ W1
@register(
    "w1_sequential_id",
    """
    SELECT CAST(row_number() OVER (ORDER BY n_name) AS INT) AS id, n_name
    FROM nation
    """,
)
def w1_sequential_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequential id (SURVEY W1, reference
    R/initdb.R:32,166 ``id = 1:n()`` — order made explicit)."""
    n = load_table(spark, sf_dir, "nation")
    return win_ops.sequential_id(n, order_by=["n_name"], id_col="id").select("id", "n_name")


# ------------------------------------------------------------------------ O1
@register(
    "o1_topk",
    """
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey LIMIT 10
    """,
)
def o1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with strict tiebreak (SURVEY O1, reference
    R/initdb.R:465 arrange(desc(year))). Spark plans TakeOrderedAndProject
    — no full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_custkey"))
        .limit(10)
    )


# ------------------------------------------------------------------------ U1
@register(
    "u1_union_missing_cols",
    """
    WITH current_o AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE year(o_orderdate) >= 1998
    ),
    hist_o AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE year(o_orderdate) < 1998
    )
    SELECT COALESCE(o_orderpriority, 'NONE') AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM (SELECT * FROM current_o UNION ALL SELECT * FROM hist_o)
    GROUP BY COALESCE(o_orderpriority, 'NONE')
    """,
)
def u1_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union_all of sources with mismatched columns, NULL-filled
    (SURVEY U1/U2, reference R/initdb.R:360-363 current ∪ historical
    landings with filled columns) via unionByName(allowMissingColumns)."""
    o = load_table(spark, sf_dir, "orders")
    cur = o.filter(F.year("o_orderdate") >= 1998).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    hist = o.filter(F.year("o_orderdate") < 1998).select("o_orderkey", "o_totalprice")
    both = cur.unionByName(hist, allowMissingColumns=True)
    return both.groupBy(nvl(F.col("o_orderpriority"), "NONE").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ------------------------------------------------------------------------ C1
@register(
    "c1_decode_chain",
    """
    SELECT CASE
             WHEN NULLIF(n_nationkey % 5, 4) IS NULL THEN 'NON'
             WHEN n_nationkey % 5 = 0 THEN 'FGN'
             WHEN n_nationkey % 5 = 1 THEN 'COM'
             WHEN n_nationkey % 5 = 2 THEN 'COM'
             WHEN n_nationkey % 5 = 3 THEN 'RSH'
             ELSE 'UNK'
           END AS vessel_type,
           COUNT(*) AS n
    FROM nation GROUP BY 1
    """,
)
def c1_decode_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle DECODE as when-chain incl. NULL-matches-NULL branch
    (SURVEY C1, reference R/initdb.R:175-187 13-branch vessel-type
    decode), via the engine's decode() helper."""
    n = load_table(spark, sf_dir, "nation")
    key = F.nullif(F.col("n_nationkey") % 5, F.lit(4))
    vt = decode(
        key,
        [(None, "NON"), (0, "FGN"), (1, "COM"), (2, "COM"), (3, "RSH")],
        default="UNK",
    )
    return n.select(vt.alias("vessel_type")).groupBy("vessel_type").agg(
        F.count(F.lit(1)).alias("n")
    )


# ------------------------------------------------------------------------ C2
@register(
    "c2_string_funcs",
    """
    SELECT s_suppkey,
           CASE
             WHEN concat(COALESCE(CAST(NULLIF(s_suppkey % 50, 0) AS VARCHAR), ''), '-',
                         COALESCE(CAST(NULLIF(s_nationkey % 3, 0) AS VARCHAR), '0')) = '-0'
             THEN NULL
             ELSE concat(COALESCE(CAST(NULLIF(s_suppkey % 50, 0) AS VARCHAR), ''), '-',
                         COALESCE(CAST(NULLIF(s_nationkey % 3, 0) AS VARCHAR), '0'))
           END AS vessel,
           replace(s_name, '#', '-') AS name_fixed,
           substr(s_name, 1, 8) AS name_prefix
    FROM supplier
    """,
)
def c2_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: the vessel-identity concat with NULL sentinels
    (SURVEY C2 + §2.10.1, reference R/initdb.R:127,189,365), plus
    replace/substr."""
    s = load_table(spark, sf_dir, "supplier")
    skip = F.nullif(F.col("s_suppkey") % 50, F.lit(0))
    saga = F.nullif(F.col("s_nationkey") % 3, F.lit(0))
    return s.select(
        "s_suppkey",
        vessel_id(skip, saga).alias("vessel"),
        F.regexp_replace(F.col("s_name"), "#", "-").alias("name_fixed"),
        F.substring(F.col("s_name"), 1, 8).alias("name_prefix"),
    )


# ------------------------------------------------------------------------ C3
@register(
    "c3_date_funcs",
    """
    SELECT strftime(strptime(strftime(o_orderdate, '%Y%m'), '%Y%m'), '%Y-%m-%d') AS month_start,
           CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def c3_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: to_date(concat(yyyymm)) round-trip + year/month
    extraction (SURVEY C3, reference R/initdb.R:362
    to_date(concat(ar,man),'yyyymm'); R/initdb_add_shrimp.R:96-97)."""
    o = load_table(spark, sf_dir, "orders")
    ym = F.date_format(F.col("o_orderdate"), "yyyyMM")
    return (
        o.select(
            F.date_format(F.to_date(ym, "yyyyMM"), "yyyy-MM-dd").alias("month_start"),
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .groupBy("month_start", "year", "month")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------------ C4
@register(
    "c4_binning_allometric",
    """
    SELECT ROUND(0.1 * l_quantity) / 0.1 AS qty_bin,
           COUNT(*) AS n,
           ROUND(AVG(0.00062864 * POW(l_quantity, 2.8471)), 6) AS avg_weight
    FROM lineitem
    GROUP BY 1
    """,
)
def c4_binning_allometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic family: scaler binning round(s*x)/s + allometric
    weight a*x^b (SURVEY C4 + §2.10.5, reference
    R/shrimp_support_tables.R:2171-2172,2188: a=6.2864e-4, b=2.8471)."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.round(F.lit(0.1) * F.col("l_quantity"), 0) / F.lit(0.1)
    weight = F.lit(0.00062864) * F.pow(F.col("l_quantity"), F.lit(2.8471))
    return (
        li.select(bin_col.alias("qty_bin"), weight.alias("w"))
        .groupBy("qty_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("w"), 6).alias("avg_weight"),
        )
    )


# ------------------------------------------------------------------------ C6
@register(
    "c6_pivot",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
    FROM orders GROUP BY 1
    """,
)
def c6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (SURVEY C6, reference
    R/shrimp_support_tables.R:2155-2159 gather/spread of the biomass
    parameter matrix): groupBy().pivot() with explicit value list (no
    extra pass to discover values)."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy(F.year("o_orderdate").alias("year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pv.select(
        "year",
        F.round(nvl(F.col("F"), 0.0), 2).alias("F"),
        F.round(nvl(F.col("O"), 0.0), 2).alias("O"),
        F.round(nvl(F.col("P"), 0.0), 2).alias("P"),
    )


# ------------------------------------------------------------------------ C8
@register(
    "c8_range_bucket",
    """
    SELECT CASE
             WHEN c_custkey % 1000 BETWEEN 0 AND 99 THEN 101
             WHEN c_custkey % 1000 BETWEEN 100 AND 299 THEN 102
             WHEN c_custkey % 1000 BETWEEN 300 AND 599 THEN 103
             WHEN c_custkey % 1000 BETWEEN 600 AND 999 THEN 104
             ELSE NULL
           END AS division,
           COUNT(*) AS n
    FROM customer GROUP BY 1
    """,
)
def c8_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized range-bucket assignment — port2division (SURVEY C8,
    reference R/initdb.R:322-335): chained between() Column expr, no
    UDF."""
    c = load_table(spark, sf_dir, "customer")
    div = range_bucket(
        F.col("c_custkey") % 1000,
        [(0, 99, 101), (100, 299, 102), (300, 599, 103), (600, 999, 104)],
    )
    return c.select(div.alias("division")).groupBy("division").agg(
        F.count(F.lit(1)).alias("n")
    )


# ----------------------------------------------------------------------- S10
@register(
    "s10_grid_gen",
    """
    SELECT CAST(y.year AS INT) AS year, CAST(m.month AS INT) AS month,
           n.n_nationkey AS cell, 3.0 AS temperature
    FROM (SELECT unnest(generate_series(1995, 2000)) AS year) y
    CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS month) m
    CROSS JOIN (SELECT DISTINCT n_nationkey FROM nation) n
    """,
)
def s10_grid_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense year×month×cell grid generation (SURVEY S10, reference
    R/initdb.R:56-59 temperature grid ≈1.7M rows) — generated
    distributed, no driver-side expand.grid."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("cell"))
    return grid_ops.temperature_grid(spark, n, "cell", 1995, 2000, 3.0).select(
        "year", "month", "cell", "temperature"
    )


# ------------------------------------------------------------- §2.10.3 bump
@register(
    "d3_timing_bump",
    """
    SELECT CASE WHEN user_id % 40 = 30 THEN 4
                WHEN user_id % 40 = 35 THEN 10
                ELSE CAST(month(ts) AS INT) END AS month_adj,
           CASE WHEN CAST(day(ts) AS INT) % 12 + 1 = 12
                THEN CAST(year(ts) AS INT) + 1
                ELSE CAST(year(ts) AS INT) END AS year_adj,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def d3_timing_bump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey timing bumps (SURVEY §2.10.3, reference
    R/initdb.R:124-125 month bump; R/initdb_add_shrimp.R:170 December
    → year+1), demonstrated with synthetic codes over events."""
    from mfdb_hafro_etl_spark.functions.domain import shrimp_year_bump, survey_month_bump

    ev = load_table(spark, sf_dir, "events")
    sf = F.col("user_id") % 40
    man = F.month("ts")
    syn_man = F.dayofmonth("ts") % 12 + 1
    return (
        ev.select(
            survey_month_bump(man, sf).alias("month_adj"),
            shrimp_year_bump(F.year("ts"), syn_man).alias("year_adj"),
        )
        .groupBy("month_adj", "year_adj")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------- §2.10.5 scaling
@register(
    "d5_count_scaling",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity * CASE
             WHEN COALESCE(CASE WHEN l_linenumber = 1 THEN 0.0 ELSE l_quantity * 2 END, 0.0) = 0.0
             THEN 1.0
             ELSE (CASE WHEN l_linenumber = 1 THEN 0.0 ELSE l_quantity * 2 END) / l_quantity
           END), 2) AS scaled_count
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d5_count_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count scaling with zero-divisor guards (SURVEY §2.10.5,
    reference R/shrimp_support_tables.R:2144-2150: ratio
    fj_talid/fj_maelt guarded → 1). Synthetic fj_talid derived from
    lineitem to exercise both guard branches."""
    li = load_table(spark, sf_dir, "lineitem")
    fj_talid = F.when(F.col("l_linenumber") == 1, F.lit(0.0)).otherwise(F.col("l_quantity") * 2)
    ratio = F.when(nvl(fj_talid, 0.0) == 0.0, F.lit(1.0)).otherwise(fj_talid / F.col("l_quantity"))
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_quantity") * ratio), 2).alias("scaled_count")
    )


# ----------------------------------------------------------------------- W3
@register(
    "w3_alternating_dedupe",
    """
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM ranked WHERE rn % 2 = 1 GROUP BY 1
    """,
)
def w3_alternating_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: drop every 2nd occurrence within a key (reference
    R/shrimp_support_tables.R:464-475 drops even-ranked repeats of
    synis_id ordered by the explicit ``order`` column). The
    reference's read-order dependence is replaced by an explicit
    rank; one shuffle on the key. The order-by carries enough
    tiebreak columns to be a total order — (orderkey, linenumber) is
    NOT unique in this testdata, and an ambiguous rank is exactly the
    nondeterminism SURVEY §4 calls out as a reference hazard."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % 2 == 1)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# ----------------------------------------------------------------------- A5
@register(
    "a5_id_offset",
    """
    SELECT r_name,
           CAST((SELECT MAX(n_nationkey) FROM nation)
                + ROW_NUMBER() OVER (ORDER BY r_name) AS INT) AS id
    FROM region
    """,
)
def a5_id_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: new dimension ids offset past the existing max (reference
    R/initdb_add_shrimp.R:26 ``id = max(reitmapping$id) + 1:n()``).
    The scalar max is fetched driver-side into a literal (SURVEY §4
    constant folding); the id window is deterministic via explicit
    order."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    mx = nation.agg(F.max("n_nationkey")).first()[0]
    return agg_ops.scalar_max_offset_ids(
        region.select("r_name"), int(mx), order_by=["r_name"]
    )


# ------------------------------------------------------------- §2.10.9 D9
@register(
    "d9_correction_overlay",
    """
    WITH corr AS (
      SELECT o_orderkey, ROUND(o_totalprice * 2, 2) AS totalprice_fx
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    bad AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)
    SELECT o.o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(CASE WHEN c.totalprice_fx IS NOT NULL
                          THEN c.totalprice_fx ELSE o.o_totalprice END), 2) AS total_fixed
    FROM orders o
    LEFT JOIN corr c ON o.o_orderkey = c.o_orderkey
    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM bad)
    GROUP BY 1
    """,
)
def d9_correction_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correction overlay (SURVEY §2.10.9, reference
    R/shrimp_support_tables.R:2100-2132): broadcast left-join a keyed
    fix table, per-column nvl2(fix, fix, orig), plus the
    bad_synis_id exclusion list as a broadcast anti-join — no shuffle
    of the fact side."""
    o = load_table(spark, sf_dir, "orders")
    corr = o.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 2, 2).alias("totalprice_fx")
    )
    bad = o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    fixed = corr_ops.apply_correction(
        o.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        corr,
        key=["o_orderkey"],
        fixes={"o_totalprice": "totalprice_fx"},
    )
    fixed = corr_ops.drop_bad_keys(fixed, bad, ["o_orderkey"])
    return fixed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_fixed"),
    )


# ------------------------------------------------------------------- C5/C7
@register(
    "c5_geo_classify",
    """
    WITH pts AS (
      SELECT o_orderkey,
             CAST(300 + o_orderkey % 400 AS INT) AS sr,
             CASE WHEN o_orderkey % 53 = 0 THEN NULL
                  ELSE FLOOR((300 + o_orderkey % 400) / 100) + 60.25 END AS lat,
             -((300 + o_orderkey % 400) % 100) - 0.5 AS lon
      FROM orders
    )
    SELECT CASE WHEN lat IS NULL THEN NULL
                WHEN lat BETWEEN 64.0 AND 66.0 AND lon BETWEEN -80.0 AND -20.0
                THEN TRUE ELSE FALSE END AS inside,
           COUNT(*) AS n,
           ROUND(AVG(30.0 * 60.0 * COS(RADIANS(FLOOR(sr / 100) + 60.25))), 4) AS avg_cell_nm2,
           ROUND(AVG(2 * 3437.74677078 * ASIN(SQRT(
             POW(SIN(RADIANS(65.0 - lat) / 2), 2)
             + COS(RADIANS(lat)) * COS(RADIANS(65.0))
               * POW(SIN(RADIANS(-20.0 - lon) / 2), 2)))), 4) AS avg_dist_nm
    FROM pts GROUP BY 1
    """,
)
def c5_geo_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo kernel suite (SURVEY C5/C7): rectangle-code decode
    (geo::sr2d closed form), cell area (geo::srA), haversine distance
    (Oracle arcdist), and ray-casting point-in-polygon
    (geo::geoinside) as a vectorized pandas_udf with NULL capture
    (C7: errors → NULL, the reference's safely+otherwise=NA). The
    polygon UDF runs distributed — the reference had to collect to R
    for this (SURVEY §3 entry 2)."""
    from mfdb_hafro_etl_spark.functions import geo

    o = load_table(spark, sf_dir, "orders")
    sr = (300 + F.col("o_orderkey") % 400).cast("int")
    pts = o.select(
        sr.alias("sr"),
        F.when(F.col("o_orderkey") % 53 == 0, F.lit(None).cast("double"))
        .otherwise(geo.sr2d_lat(sr))
        .alias("lat"),
        geo.sr2d_lon(sr).alias("lon"),
    )
    inside = geo.points_in_polygon([64.0, 66.0, 66.0, 64.0], [-80.0, -80.0, -20.0, -20.0])
    return (
        pts.withColumn("inside", inside(F.col("lat"), F.col("lon")))
        .groupBy("inside")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(geo.sr_area_nm2(F.col("sr"))), 4).alias("avg_cell_nm2"),
            F.round(
                F.avg(
                    geo.haversine_nm(
                        F.col("lat"), F.col("lon"), F.lit(65.0), F.lit(-20.0)
                    )
                ),
                4,
            ).alias("avg_dist_nm"),
        )
    )


# ------------------------------------------------------------- §2.10.6 D6
@register(
    "d6_weight_for_index",
    """
    WITH syn AS (
      SELECT l_returnflag, l_quantity AS mean_wt,
             CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity * 0.5 END AS towlength,
             CAST(l_linenumber + 1 AS DOUBLE) AS towcount,
             CASE WHEN l_suppkey % 5 = 0 THEN NULL
                  ELSE CAST(l_suppkey % 5 AS DOUBLE) END AS size
      FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
             THEN (mean_wt / COALESCE(towlength, 1.0)) / towcount * COALESCE(size, 1.0)
             ELSE mean_wt END), 2) AS weight
    FROM syn GROUP BY 1
    """,
)
def d6_weight_for_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shrimp weight-for-index scaling (SURVEY §2.10.6, reference
    R/initdb_add_shrimp.R:208-214), gated by sampling type, with both
    nvl-guard branches exercised."""
    from mfdb_hafro_etl_spark.plans.ldist import shrimp_weight_for_index

    li = load_table(spark, sf_dir, "lineitem")
    towlength = F.when(F.col("l_linenumber") == 1, F.lit(None).cast("double")).otherwise(
        F.col("l_quantity") * 0.5
    )
    size = F.when(F.col("l_suppkey") % 5 == 0, F.lit(None).cast("double")).otherwise(
        (F.col("l_suppkey") % 5).cast("double")
    )
    weight = F.when(
        F.col("l_returnflag") == "R",
        shrimp_weight_for_index(
            F.col("l_quantity"), towlength, (F.col("l_linenumber") + 1).cast("double"), size
        ),
    ).otherwise(F.col("l_quantity"))
    return li.groupBy("l_returnflag").agg(F.round(F.sum(weight), 2).alias("weight"))


# ------------------------------------------------------------------ J11 skew
@register(
    "j11_salted_skew_join",
    """
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                  ELSE CAST(l_orderkey % 100 AS INT) END AS hot_key,
             l_quantity
      FROM lineitem
    ),
    dim AS (SELECT CAST(k AS INT) AS hot_key, 'L' || CAST(k % 7 AS VARCHAR) AS label
            FROM (SELECT unnest(generate_series(0, 99)) AS k))
    SELECT d.label, COUNT(*) AS n, ROUND(SUM(s.l_quantity), 2) AS sum_qty
    FROM skewed s JOIN dim d ON s.hot_key = d.hot_key
    GROUP BY 1
    """,
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed keys (SURVEY §2.3 note; 80% of rows share
    one key here): the hot key is spread over 16 salt buckets, the
    replicated side exploded to match — row-identical to the plain
    join, with the largest shuffle partition shrunk ~16x. For joins
    AQE can usually re-plan this at runtime; explicit salting is the
    tool for skewed aggregations and pre-clustered inputs."""
    from mfdb_hafro_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    skewed = li.select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(0))
        .otherwise((F.col("l_orderkey") % 100).cast("int"))
        .alias("hot_key"),
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
    )
    dim = spark.range(0, 100).select(
        F.col("id").cast("int").alias("hot_key"),
        F.concat(F.lit("L"), (F.col("id") % 7).cast("string")).alias("label"),
    )
    joined = salted_join(
        skewed,
        dim,
        on=["hot_key"],
        salt_from=["l_orderkey", "l_linenumber", "l_partkey"],
        buckets=16,
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


# ------------------------------------------------- A8/A9/A10 Catalyst extras
# The reference has no grouping sets / cube / rollup and no distinct-
# count aggregates (SURVEY §2.4: "engine can expose Spark's cube/
# rollup/approx_count_distinct for free"). Exposed here as first-class
# suite operators so the coverage claim is verified, not asserted.


@register(
    "a8_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag)  AS g_flag,
           GROUPING(l_linestatus)  AS g_status,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           COUNT(*)                       AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal rollup (SURVEY §2.4 engine extra).
    GROUPING() markers disambiguate NULL-as-data from NULL-as-total
    — the standard pitfall of rollup outputs. One shuffle: Spark
    expands the grouping sets map-side, partial-aggregates, then
    exchanges once on the expanded key."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a9_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus)   AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           ROUND(SUM(o_totalprice), 2) AS total,
           COUNT(*)                    AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a9_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-dimensional cube (SURVEY §2.4 engine extra): all
    2^d grouping sets in one pass / one shuffle — the multi-
    aggregation a dashboard layer would otherwise issue as 4
    separate groupBys."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a10_distinct_agg",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)      AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a10_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregates (SURVEY §2.4 engine extra).
    Spark plans multi-distinct via expand + two-phase aggregation;
    at 100 TB swap exact for approx_count_distinct (see
    tests/test_determinism.py::test_approx_distinct_error_bound for
    the accuracy contract) when the key cardinality is large."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.count_distinct(F.col("o_orderpriority")).alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------- J11+ scale-join extras
# The brief's "operators Spark lacks": as-of join and range join.
# J7 covers the broadcastable SCD-2 case; these are the fact-sized
# paths (union+window as-of, binned range join).


@register(
    "j12_asof_join",
    """
    WITH snaps AS (
      SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(o_orderdate AS DATE) AS snap_ts,
             MAX(ROUND(o_totalprice, 2)) AS credit_limit
      FROM orders WHERE o_orderkey % 7 = 0
      GROUP BY 1, 2
    ),
    ords AS (
      SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(o_orderdate AS DATE) AS o_orderdate
      FROM orders
    )
    SELECT l.o_custkey,
           strftime(l.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           l.o_orderkey,
           r.credit_limit AS credit_limit_asof
    FROM ords l
    ASOF LEFT JOIN snaps r
      ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.snap_ts
    """,
)
def j12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (pandas merge_asof / kdb aj semantics):
    every order picks the customer's LATEST credit snapshot at or
    before the order date. Implemented as union + last(ignorenulls)
    over one (customer)-partitioned window — one shuffle, no join
    fan-out, right side NOT broadcast (the fact-sized-registry path
    J7 can't take). Oracle: DuckDB's native ASOF JOIN."""
    o = load_table(spark, sf_dir, "orders")
    snaps = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .groupBy(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderdate").cast("date").alias("snap_ts"),
        )
        .agg(F.max(F.round("o_totalprice", 2)).alias("credit_limit"))
        .withColumnRenamed("snap_ts", "ts")
    )
    ords = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_orderdate").cast("date").alias("ts"),
    )
    out = join_ops.asof_join(
        ords, snaps, on="ts", by=["o_custkey"], value_cols=["credit_limit"]
    )
    return out.select(
        "o_custkey",
        F.date_format("ts", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderkey",
        F.col("credit_limit_asof"),
    )


@register(
    "j13_range_join_binned",
    """
    WITH bands AS (
      SELECT CAST(p_partkey AS INT) AS band_id,
             CAST(p_partkey - 50 AS DOUBLE) AS lo,
             CAST(p_partkey + 50 AS DOUBLE) AS hi
      FROM part WHERE p_partkey % 100 = 0
    )
    SELECT b.band_id, COUNT(*) AS n, ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN bands b ON l.l_partkey BETWEEN b.lo AND b.hi
    GROUP BY 1
    """,
)
def j13_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via bin bucketing: a bare BETWEEN
    join with no equi key plans as a nested loop; binning restores an
    equi key (floor(p/w) = exploded interval bins) so Catalyst plans
    a plain shuffled hash join with the exact range re-checked in the
    condition. bin_width=100 = the interval length → ≤2 bins per
    interval.

    Workload shape: bands are key-RANGES over the partkey domain
    (every 100th part owns [k-50, k+50]) probed by lineitem.l_partkey
    — a registry-lookup range join whose point domain, interval
    domain, bin cardinality, AND output all scale linearly with the
    data (each lineitem falls in ~1 band). The previous fixture
    joined l_quantity against a FIXED [0,48] value domain: both sides
    grew with data inside a constant domain, so output grew
    quadratically and ~7 distinct bins serialized the join onto ≤7
    tasks — a workload property, not an operator one (r4 verdict).
    The low-cardinality-domain case is now handled by the operator's
    salt guard (range_join_binned(salt=...)) and pinned by
    tests/test_plan_quality.py."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    bands = pt.filter(F.col("p_partkey") % 100 == 0).select(
        F.col("p_partkey").cast("int").alias("band_id"),
        (F.col("p_partkey") - 50).cast("double").alias("lo"),
        (F.col("p_partkey") + 50).cast("double").alias("hi"),
    )
    joined = join_ops.range_join_binned(
        li.select("l_partkey", "l_quantity"),
        bands,
        point_col="l_partkey",
        lo_col="lo",
        hi_col="hi",
        bin_width=100.0,
        salt=1,
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


# ------------------------------------------------------ SQL API surface
@register(
    "sql1_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def sql1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping-priority query driven through the
    ENGINE'S SQL SURFACE: catalog.register_views + spark.sql — the
    spark.sql(...) entry point of SURVEY §7's design stance,
    exercised end to end (multi-join, selective filters on both fact
    sides, top-k with deterministic tie-break). Catalyst plans it
    identically to the DataFrame formulation: pushdown into all
    three scans, broadcast for customer, TakeOrderedAndProject for
    the top-k."""
    from mfdb_hafro_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               date_format(CAST(o.o_orderdate AS DATE), 'yyyy-MM-dd') AS order_date
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
          AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
        GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


# ------------------------------------------------------------------------ C7
@register(
    "c6_unpivot",
    """
    WITH wide AS (
      SELECT CAST(year(o_orderdate) AS INT) AS year,
             ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
             ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
             ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
      FROM orders GROUP BY 1
    )
    SELECT year, 'F' AS status, F AS total FROM wide
    UNION ALL SELECT year, 'O', O FROM wide
    UNION ALL SELECT year, 'P', P FROM wide
    """,
)
def c6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of C6's spread — the
    reference's gather() direction, R/shrimp_support_tables.R
    gather/spread round trip): DataFrame.unpivot melts the pivoted
    year × status matrix back to (year, status, total) in one
    projection — no shuffle beyond the aggregation that built the
    wide frame."""
    wide = c6_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["year"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="total",
    )
