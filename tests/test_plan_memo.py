"""plan_memo staleness (r12 verdict finding #2): a memoized fixture
PLAN closes over load_table results, so rewriting a testdata table
IN PLACE under the same sf_dir must invalidate the fixture memo —
keying on (builder, sf_dir) alone kept serving a plan whose
FileIndex referenced the replaced file."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfdb_hafro_etl_spark.suite import fixtures  # noqa: E402


def _write_orders(path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "o_custkey": pa.array([i * 7 % 100 for i in range(1, n + 1)], pa.int64()),
            "o_orderdate": pa.array(
                [datetime.date(1995, 1, 1 + (i % 27)) for i in range(1, n + 1)],
                pa.date32(),
            ),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def test_plan_memo_invalidates_on_table_rewrite(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    orders = os.path.join(sf, "orders.parquet")
    _write_orders(orders, 40)
    df1 = fixtures.stodvar(spark, sf)
    assert df1.count() == 40
    # same-builder same-sf_dir request with the table untouched: memo hit
    assert fixtures.stodvar(spark, sf) is df1
    # rewrite IN PLACE (new size and mtime): the fixture must rebuild
    # and read the new rows — a (builder, sf_dir)-keyed memo served the
    # stale 40-row plan here
    _write_orders(orders, 13)
    os.utime(orders, ns=(os.stat(orders).st_mtime_ns + 10**9,) * 2)
    df2 = fixtures.stodvar(spark, sf)
    assert df2 is not df1
    assert df2.count() == 13
