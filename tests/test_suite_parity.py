"""Every registered suite query must hash-match its DuckDB oracle —
the same check the driver runs (CORRECTNESS gate), run here at
sf0.001 for speed (set TEST_SF_DIR=/root/testdata/sf0.01 for the
driver's exact scale)."""

from __future__ import annotations

import pytest

from mfdb_hafro_etl_spark.suite import ORACLES, QUERIES
from tests.parity import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.columns, f"{name}: no columns"
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert sdf.count() >= 0
        return
    ddf = duck.sql(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)
