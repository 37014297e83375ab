"""The driver-facing view (suite/driver_view.py) must be exactly as
trustworthy as the raw registry it folds: every view entry
hash-matches its oracle, the recorded arm schemas are fresh, and the
ordering contract (flagship surface inside the driver's ~50-slot
correctness budget) holds."""

from __future__ import annotations

import pytest

from mfdb_hafro_etl_spark.suite import ORACLES, QUERIES
from mfdb_hafro_etl_spark.suite.driver_view import (
    _ARM_COLS,
    COMBOS,
    DRIVER_ORACLES,
    DRIVER_QUERIES,
    ORDER,
)
from tests.parity import compare, duck_connect

_KIND = {"string": "s", "double": "d", "float": "d"}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


def test_every_raw_query_is_represented_once():
    arms = [a for c in COMBOS.values() for a in c]
    singles = [n for n in ORDER if n not in COMBOS]
    assert sorted(arms + singles) == sorted(QUERIES)
    assert len(set(arms)) == len(arms)


def test_oracle_slots_fit_driver_budget():
    oracle_backed = [n for n in ORDER if n in DRIVER_ORACLES]
    assert len(oracle_backed) <= 50
    # rows-only checks must not displace an oracle slot
    tail = ORDER[len(oracle_backed):]
    assert all(n not in DRIVER_ORACLES for n in tail)


def test_flagship_surface_registers_first():
    first = ORDER[:18]
    for name in [
        "p1_stations", "p2_ldist", "p3_aldist", "p4_landings",
        "p5_landings_foreign", "p6_landings_rescale", "p7_shrimp_overlay",
        "p8_vessel_taxonomy", "p9_shrimp_ldist", "p10_statlant",
        "p11_old_landings", "m6_sample_count", "m6_totalweight_meanlength",
        "m6_meanweight_stddev", "m6_rawdata", "s15_replace_by_source",
    ]:
        assert name in first, f"{name} must be in the first driver slots"


def test_view_iteration_order_matches_ORDER():
    assert list(DRIVER_QUERIES) == ORDER


@pytest.mark.parametrize("arm", sorted(_ARM_COLS))
def test_arm_schema_literal_is_fresh(arm, spark, sf_dir):
    df = QUERIES[arm](spark, sf_dir)
    live = [(c, _KIND.get(t, "i")) for c, t in df.dtypes]
    assert live == _ARM_COLS[arm], (
        f"{arm}: schema drifted; regenerate _ARM_COLS entry"
    )


@pytest.mark.parametrize("name", sorted(COMBOS))
def test_combo_matches_combined_oracle(name, spark, sf_dir, duck):
    sdf = DRIVER_QUERIES[name](spark, sf_dir)
    assert sdf.columns == ["facet", "rowstr"]
    ddf = duck.sql(DRIVER_ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_singles_pass_through_unchanged():
    for n in ORDER:
        if n in COMBOS:
            continue
        assert DRIVER_QUERIES[n] is QUERIES[n]
        if n in ORACLES:
            assert DRIVER_ORACLES[n] == ORACLES[n]
