"""Mergeable-sketch properties: accuracy bounds, merge laws, the CMS
overcount guarantee, and plan shape (fixed-size shuffles, partial
aggregation). Cross-engine parity is covered by test_suite_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_hll_accuracy(orders):
    exact = orders.select("o_custkey").distinct().count()
    est = sk.hll_estimate(orders, "o_custkey").collect()[0]["est_distinct"]
    # 256 registers → σ ≈ 1.04/√256 = 6.5 %; assert a loose 3σ
    assert abs(est - exact) / exact < 0.20, (est, exact)


def test_hll_merge_equals_whole(orders):
    """Registers built on two disjoint halves and merged must equal
    registers built on the union — the distributive law that makes
    per-partition sketch parquet valid at 100 TB."""
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = sk.hll_merge(
        sk.hll_register_table(lo, "o_custkey"),
        sk.hll_register_table(hi, "o_custkey"),
    )
    whole = sk.hll_register_table(orders, "o_custkey")
    sym = merged.join(whole, "idx").filter(
        merged["rho"] != whole["rho"]
    )
    assert sym.count() == 0


def test_hll_by_group_close_to_exact(orders):
    est = {
        r["o_orderstatus"]: r["est_distinct"]
        for r in sk.hll_estimate_by(orders, ["o_orderstatus"], "o_custkey").collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.20, (k, est[k], exact[k])


def test_cms_never_undercounts(lineitem, spark):
    """est ≥ exact for every probed key — the defining CMS guarantee."""
    probes = spark.createDataFrame([(k,) for k in range(1, 11)], "probe int")
    sketch = sk.cms_sketch(lineitem, "l_suppkey")
    est = {
        r["probe"]: r["est_cnt"]
        for r in sk.cms_point_estimate(sketch, probes, "probe").collect()
    }
    exact = {
        r["l_suppkey"]: r["n"]
        for r in lineitem.filter(F.col("l_suppkey").isin(*range(1, 11)))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


def test_cms_sketch_is_fixed_size(lineitem):
    assert sk.cms_sketch(lineitem, "l_suppkey").count() <= sk.CMS_DEPTH * sk.CMS_WIDTH


def test_histogram_quantiles_bracket_exact(lineitem):
    qs = [0.5, 0.9]
    est = {
        r["q"]: r["est"]
        for r in sk.histogram_quantiles(
            lineitem, "l_quantity", 0.0, 50.0, 25, qs
        ).collect()
    }
    exact = dict(
        zip(
            qs,
            lineitem.selectExpr("CAST(l_quantity AS DOUBLE) AS x")
            .stat.approxQuantile("x", qs, 0.0),
        )
    )
    # bin width 2 → estimate within one bin of the exact quantile
    for q in qs:
        assert abs(est[q] - exact[q]) <= 2.0, (q, est[q], exact[q])


def test_hll_plan_partial_aggregation(orders):
    """The register build must partial-aggregate map-side (two
    HashAggregate nodes around one exchange) and carry no join of the
    raw data — the whole point of the sketch at scale."""
    plan = sk.hll_register_table(orders, "o_custkey")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan, plan


def test_histogram_merge_is_vector_add(lineitem):
    lo = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    hi = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    h_lo = sk.histogram_sketch(lo, "l_quantity", 0.0, 50.0, 25)
    h_hi = sk.histogram_sketch(hi, "l_quantity", 0.0, 50.0, 25)
    merged = (
        h_lo.unionByName(h_hi).groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.histogram_sketch(lineitem, "l_quantity", 0.0, 50.0, 25)
    diff = merged.join(whole, "bin").filter(merged["cnt"] != whole["cnt"])
    assert diff.count() == 0


def test_kmv_estimate_accuracy(orders):
    a = sk.kmv_sketch(orders, "o_custkey")
    est = sk.kmv_estimate(a).collect()[0]["est_distinct"]
    exact = orders.select("o_custkey").distinct().count()
    # at small SF the sketch may hold the whole universe (k rows <
    # KMV_K): then the estimate degrades to ~(k-1)/theta of an
    # unsaturated sketch; only assert the error bound when saturated
    if a.count() == sk.KMV_K:
        assert abs(est - exact) / exact < 0.25, (est, exact)


def test_kmv_intersection_bounds(orders, spark, sf_dir):
    from mfdb_hafro_etl_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING")
    a = sk.kmv_sketch(orders, "o_custkey")
    b = sk.kmv_sketch(seg, "c_custkey")
    row = sk.kmv_set_estimates(a, b).collect()[0]
    exact_inter = (
        orders.select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(seg.select(F.col("c_custkey").alias("k")).distinct(), "k")
        .count()
    )
    if exact_inter:
        assert abs(row["est_intersection"] - exact_inter) / exact_inter < 0.5, (
            row, exact_inter,
        )
    assert row["k_u"] <= sk.KMV_K


def test_kmv_plan_is_top_k_not_global_sort(orders):
    """ORDER BY h LIMIT k must plan as TakeOrderedAndProject (per-
    partition top-k), never a full Sort+Exchange of the hash stream."""
    plan = (
        sk.kmv_sketch(orders, "o_custkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
