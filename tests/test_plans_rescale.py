"""rescale_by_published edge semantics (ADVICE r7, plans/landings.py):
a duplicated (species, year) row in published must not fan out
landings rows or inflate the window denominator."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        (r.species, r.year, round(r.weight_total, 6)) for r in df.collect()
    )


def test_rescale_duplicate_published_key_is_inert(spark):
    from mfdb_hafro_etl_spark.plans.landings import rescale_by_published

    landings = spark.createDataFrame(
        [(1, 1999, 500.0), (1, 1999, 1500.0), (2, 1999, 800.0)],
        "species int, year int, weight_total double",
    )
    pub = spark.createDataFrame(
        [(1, 1999, 4.0)], "species int, year int, iceland double"
    )
    pub_dup = pub.unionByName(pub)  # malformed: doubled key

    want = _rows(rescale_by_published(landings, pub))
    got = _rows(rescale_by_published(landings, pub_dup))
    assert got == want
    # and the ratio itself is right: sum=2000 kg -> 2.0 t; r = 4/2 = 2
    assert (1, 1999, 1000.0) in want and (1, 1999, 3000.0) in want
    # unmatched species passes through
    assert (2, 1999, 800.0) in want


def test_rescale_conflicting_published_values_refuse(spark):
    """Conflicting iceland values for one (species, year) have no
    right answer — picking one at random would make the rescale
    nondeterministic, so it refuses loudly (self-review r8)."""
    import pytest

    from mfdb_hafro_etl_spark.plans.landings import rescale_by_published

    landings = spark.createDataFrame(
        [(1, 1999, 500.0)], "species int, year int, weight_total double"
    )
    pub = spark.createDataFrame(
        [(1, 1999, 4.0), (1, 1999, 6.0)],
        "species int, year int, iceland double",
    )
    with pytest.raises(ValueError, match="CONFLICTING"):
        rescale_by_published(landings, pub)


def test_rescale_oversized_published_refuses_before_collect(spark, monkeypatch):
    """The policy-size contract is ENFORCED: a fact-sized frame passed
    as `published` must hit a loud ValueError via the limit(N+1) cap,
    not a driver OOM (VERDICT r8 #1)."""
    import pytest

    from mfdb_hafro_etl_spark.plans import landings as L

    monkeypatch.setattr(L, "MAX_PUBLISHED_ROWS", 5)
    landings = spark.createDataFrame(
        [(1, 1999, 500.0)], "species int, year int, weight_total double"
    )
    big = spark.range(20).select(
        (F.col("id") % 3 + 1).cast("int").alias("species"),
        (F.lit(1993) + F.col("id") % 10).cast("int").alias("year"),
        (F.col("id") + 1.0).alias("iceland"),
    )
    with pytest.raises(ValueError, match="policy-size"):
        L.rescale_by_published(landings, big)
