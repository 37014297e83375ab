"""Determinism property tests (SURVEY §5: "property tests for
order-sensitive ops asserting determinism under repartition").

The reference's id assignment and duplicate-dropping depend on R
file/read order (reference R/initdb.R:32;
R/shrimp_support_tables.R:464-475). The engine's contract is
stronger: every order-sensitive operator takes explicit ordering
keys, so its output must be IDENTICAL no matter how the input is
partitioned or shuffled. These tests run each operator against
adversarial repartitionings of the same data and assert set-equality
of full rows — on a 1000-executor cluster the partitioning is
whatever the scheduler picked that day, so this is the property that
keeps results reproducible at 100 TB.

Also pins the accuracy contract a10_distinct_agg's docstring points
at: approx_count_distinct within its documented error bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import dedup as dedup_ops
from mfdb_hafro_etl_spark.operators import sessions as sess_ops
from mfdb_hafro_etl_spark.operators import windows as win_ops


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _variants(df):
    """Adversarial physical layouts of the same logical data."""
    return [
        df,
        df.repartition(1),
        df.repartition(7),
        df.repartition(13, F.col(df.columns[0])),
        df.orderBy(F.desc(df.columns[0])).repartition(5),
    ]


def test_sequential_id_deterministic_under_repartition(spark, sf_dir):
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    expected = None
    for v in _variants(base):
        got = _rows(win_ops.sequential_id(v, ["o_orderkey"], id_col="seq"))
        expected = got if expected is None else expected
        assert got == expected


def test_keep_first_per_group_deterministic_under_repartition(spark, sf_dir):
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    expected = None
    for v in _variants(base):
        # order_by must totally order rows within a group (up to
        # full-row equality) for a deterministic keep-first — the
        # testdata contains duplicate (orderkey, linenumber) pairs,
        # so the quantity column joins the sort key
        got = _rows(
            win_ops.keep_first_per_group(
                v, keys=["l_orderkey"], order_by=["l_linenumber", "l_quantity"]
            )
        )
        expected = got if expected is None else expected
        assert got == expected


def test_minhash_signatures_invariant_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = None
    for v in _variants(docs):
        got = _rows(dedup_ops.minhash_signatures(v, "doc_id", "text", n=3, k=4))
        expected = got if expected is None else expected
        assert got == expected


def test_sessionize_invariant_under_repartition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    expected = None
    for v in _variants(ev):
        got = _rows(
            sess_ops.sessionize(v).select("event_id", "user_id", "session_id")
        )
        expected = got if expected is None else expected
        assert got == expected


def test_lsh_pairs_invariant_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = None
    for v in [docs, docs.repartition(3), docs.orderBy(F.desc("doc_id"))]:
        got = _rows(dedup_ops.minhash_lsh_pairs(v, "doc_id", "text"))
        expected = got if expected is None else expected
        assert got == expected


def test_approx_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.05): HLL++ must land within ~3x
    the target rsd of the exact count on every group (generous bound
    so the test is not flaky across Spark versions; the documented
    contract is rsd=5%)."""
    o = load_table(spark, sf_dir, "orders")
    both = (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert both
    for r in both:
        if r["exact"] == 0:
            assert r["approx"] == 0
            continue
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err <= 0.15, (r["o_orderstatus"], r["exact"], r["approx"])


def test_asof_join_invariant_under_repartition(spark, sf_dir):
    from mfdb_hafro_etl_spark.operators import joins as join_ops

    o = load_table(spark, sf_dir, "orders")
    snaps = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .groupBy(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderdate").cast("date").alias("ts"),
        )
        .agg(F.max(F.round("o_totalprice", 2)).alias("v"))
    )
    ords = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_orderdate").cast("date").alias("ts"),
    )
    expected = None
    for ov, sv in [(ords, snaps), (ords.repartition(9), snaps.repartition(3)),
                   (ords.orderBy(F.desc("o_orderkey")), snaps.orderBy("ts"))]:
        got = _rows(join_ops.asof_join(ov, sv, on="ts", by=["o_custkey"], value_cols=["v"]))
        expected = got if expected is None else expected
        assert got == expected


def test_asof_join_semantics_tiny(spark):
    """Hand-checked: inclusive backward match, NULL before the first
    snapshot, group isolation."""
    from mfdb_hafro_etl_spark.operators import joins as join_ops

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 10, "d")],
        "g INT, ts INT, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)], "g INT, ts INT, v DOUBLE"
    )
    got = {
        (r.g, r.ts): r.v_asof
        for r in join_ops.asof_join(left, right, on="ts", by=["g"], value_cols=["v"]).collect()
    }
    assert got == {(1, 5): None, (1, 10): 100.0, (1, 20): 150.0, (2, 10): None}


def test_winnow_kernel_matches_column_algebra(spark, sf_dir):
    """The Arrow winnowing kernel must be byte-identical to the
    expression-level reference formulation — same md5-hex→int hash,
    same window mins, same short-doc guard."""
    from mfdb_hafro_etl_spark.operators.text import (
        winnow_fingerprint_table,
        winnow_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    via_kernel = _rows(winnow_fingerprint_table(docs, "doc_id", "text", k=5, window=4))
    via_columns = _rows(
        docs.select("doc_id", F.explode(winnow_fingerprints("text", k=5, window=4)).alias("fp"))
    )
    assert via_kernel == via_columns


def test_duplicate_clusters_semantics_and_determinism(spark):
    """Hand-checked components (chain, singleton pair, isolated) and
    partition invariance of the min-label fixpoint."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 9), (7, 8)], "id_a BIGINT, id_b BIGINT"
    )
    expect = {(1, 1), (2, 1), (3, 1), (9, 1), (7, 7), (8, 7)}
    for p in [pairs, pairs.repartition(5), pairs.orderBy(F.desc("id_a"))]:
        got = {(r.doc_id, r.cluster_id) for r in dedup_ops.duplicate_clusters(p).collect()}
        assert got == expect


def test_duplicate_clusters_deep_path_converges(spark):
    """A 50-deep path graph — the shape that would defeat plain
    min-label propagation's O(diameter) budget — converges via the
    pointer-jump (path-halving) rounds in O(log d), well inside
    max_iter. Labels are shuffled so node ids don't encode position:
    the min sits mid-path."""
    import random

    rng = random.Random(7)
    ids = list(range(100, 151))
    rng.shuffle(ids)
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])],
        "id_a BIGINT, id_b BIGINT",
    )
    got = {(r.doc_id, r.cluster_id) for r in dedup_ops.duplicate_clusters(pairs).collect()}
    assert got == {(i, 100) for i in ids}


def test_duplicate_clusters_releases_round_checkpoints(spark):
    """Every round's stale localCheckpoint blocks must be released —
    only the FINAL labels checkpoint may remain persisted (the
    returned frame depends on it), regardless of how many rounds the
    graph took. Guards the handle-vs-projection unpersist bug: the
    analyzed plan of labels.drop() is a Project, so unpersisting the
    derived frame silently no-ops and a multi-round run would leak
    one RDD per round for the life of the session."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 400)], "id_a BIGINT, id_b BIGINT"
    )
    res = dedup_ops.duplicate_clusters(pairs)
    n = res.count()
    assert n == 400
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, f"{after - before} persistent RDDs leaked"
    assert res.count() == n  # result stays readable after cleanup


def test_hash_split_stable_and_exhaustive(spark, sf_dir):
    """Split membership is a pure function of the id: identical under
    repartition, partitions exactly (every row in exactly one split),
    and deterministic_sample(salt) ⊂ the same rows on every call."""
    from mfdb_hafro_etl_spark.operators import sampling as sp

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    base = {(r.doc_id, r.split) for r in sp.hash_split(docs, "doc_id", fr).collect()}
    again = {
        (r.doc_id, r.split)
        for r in sp.hash_split(docs.repartition(7), "doc_id", fr).collect()
    }
    assert base == again
    assert len(base) == docs.count()  # exactly one split per row

    s1 = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r.doc_id for r in sp.deterministic_sample(docs.repartition(3), "doc_id", 0.2).collect()}
    assert s1 == s2
    # different salt → (overwhelmingly) different membership
    s3 = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.2, salt="other").collect()}
    assert s1 != s3


def test_tie_rounding_floor_construction_is_engine_portable(spark):
    """The double nearest 0.5087685 sits just BELOW the exact decimal
    half. Spark's round() rounds the shortest decimal representation
    (BigDecimal.valueOf -> "0.5087685" -> HALF_UP -> 0.508769);
    DuckDB rounds the exact binary value (-> 0.508768). The
    floor(x*1e6 + 0.5)/1e6 construction is pure correctly-rounded
    IEEE arithmetic and agrees everywhere — the remedy used for
    tie-prone rounded outputs (p9 weight chain). This test documents
    the divergence class so nobody 'simplifies' the floor back to
    round()."""
    import duckdb

    from pyspark.sql import functions as F

    v = 0.5087685
    floor_spark = (
        spark.range(1).select((F.floor(F.lit(v) * 1e6 + 0.5) / 1e6).alias("w")).first()["w"]
    )
    con = duckdb.connect(":memory:")
    # CAST to DOUBLE: a bare decimal literal parses as DECIMAL in
    # DuckDB and computes the product EXACTLY — the engine pipelines
    # this models carry doubles, not decimals
    floor_duck = con.sql(
        f"SELECT FLOOR(CAST({v!r} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0"
    ).fetchone()[0]
    assert floor_spark == floor_duck == 0.508768
    round_spark = spark.range(1).select(F.round(F.lit(v), 6).alias("w")).first()["w"]
    round_duck = con.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
    con.close()
    assert round_spark == 0.508769 and round_duck == 0.508768  # the trap
