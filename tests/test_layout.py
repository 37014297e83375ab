"""Z-order layout: the pruning claim, proven on parquet footers.

Write the same rows twice — naturally ordered and Z-ordered — then
count row groups whose [min, max] statistics admit a 2-D box
predicate. Z-ordering must cut the admitted fraction sharply; that
fraction IS the fraction of a 100 TB table a selective scan reads."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import layout as lay


def _admitted_row_groups(path: str, box: dict[str, tuple[float, float]]) -> tuple[int, int]:
    admitted = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                st = meta.row_group(rg).column(names[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats → cannot prune
                if float(st.min) > hi or float(st.max) < lo:
                    ok = False
                    break
            admitted += ok
    return admitted, total


@pytest.fixture(scope="module")
def paths(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    base = tmp_path_factory.mktemp("layout")
    natural = str(base / "natural")
    zordered = str(base / "zorder")
    # natural order, same file count for a fair comparison
    li.repartition(8).write.mode("overwrite").parquet(natural)
    lay.zorder_write(
        li,
        zordered,
        {
            "qx": lay.quantize(F.col("l_quantity"), 0.0, 50.0, 8),
            "qp": lay.quantize(F.col("l_extendedprice"), 0.0, 110000.0, 8),
        },
        bits=8,
        n_files=8,
    )
    return natural, zordered


def test_zorder_prunes_box_predicates(paths):
    natural, zordered = paths
    box = {"l_quantity": (10.0, 15.0), "l_extendedprice": (20000.0, 30000.0)}
    nat_adm, nat_tot = _admitted_row_groups(natural, box)
    z_adm, z_tot = _admitted_row_groups(zordered, box)
    assert nat_tot > 0 and z_tot > 0
    # hash-shuffled files admit (essentially) everything; z-ordered
    # files must admit at most half as many row groups
    assert z_adm / z_tot <= 0.5 * max(nat_adm, 1) / nat_tot, (
        (z_adm, z_tot), (nat_adm, nat_tot),
    )


def test_zorder_preserves_rows(paths, spark):
    natural, zordered = paths
    a = spark.read.parquet(natural)
    b = spark.read.parquet(zordered)
    assert a.count() == b.count()
    assert (
        a.agg(F.sum("l_orderkey")).collect()[0][0]
        == b.agg(F.sum("l_orderkey")).collect()[0][0]
    )


def test_zvalue_is_monotone_in_locality(spark):
    """Points close in both dimensions must map to close z-values:
    the max z-distance inside one 16x16 cell block is below the min
    z-distance to the opposite corner of the space."""
    rows = [(x, y) for x in (0, 1, 254, 255) for y in (0, 1, 254, 255)]
    df = spark.createDataFrame(rows, "qx int, qy int")
    z = {
        (r["qx"], r["qy"]): r["z"]
        for r in df.select(
            "qx", "qy", lay.zvalue([F.col("qx"), F.col("qy")], 8).alias("z")
        ).collect()
    }
    assert abs(z[(0, 0)] - z[(1, 1)]) < abs(z[(0, 0)] - z[(255, 255)])
    assert z[(0, 0)] == 0
    assert z[(255, 255)] == (1 << 16) - 1
