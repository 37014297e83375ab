"""Capture .explain("formatted") for named suite arms.

Usage: python tools/capture_plans.py <suffix> <arm> [<arm> ...]

Writes plans/r12/<arm>_<suffix>.txt for each arm, using the same
session setup as bench.py (tune_session on a local[$SPARK_GRAFT_CPUS]
master reading $SPARK_GRAFT_SF_DIR). Plans only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession  # noqa: E402

from mfdb_hafro_etl_spark.session import tune_session  # noqa: E402
from mfdb_hafro_etl_spark.suite import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    arms = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(HERE, "plans", os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture_plans")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    for arm in arms:
        df = QUERIES[arm](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{arm}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
