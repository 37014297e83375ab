"""Per-arm PLAN-CONSTRUCTION census: wall time and py4j round-trip
count for each suite builder, WITHOUT materializing the result.

Builders that run eager actions at call time (cache fills, collects)
are visible as high wall with jobs>0. Round-trips are counted by
wrapping py4j's GatewayClient.send_command — the single socket hop
every JVM-object operation pays (~0.3-0.75 ms on this virtualized
host), which makes call COUNT the construction cost model.

Usage: python tools/construction_census.py [arm ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "0")

    from mfdb_hafro_etl_spark.session import get_spark, release_cached_intermediates
    from mfdb_hafro_etl_spark.suite import QUERIES

    spark = get_spark(app_name="construction_census", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # count py4j round-trips at the socket layer
    import py4j.java_gateway as jg

    counter = {"n": 0}
    orig = jg.GatewayClient.send_command

    def counting(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counting

    # job counter: builders that run eager actions show jobs > 0
    sc = spark.sparkContext

    def jobs_run() -> int:
        tracker = sc.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        return len(ids)

    arms = sys.argv[1:] or sorted(QUERIES)
    # warm: first build pays JIT/import costs
    try:
        QUERIES[arms[0]](spark, sf_dir)
    except Exception:
        pass
    release_cached_intermediates(spark)

    rows = []
    for arm in arms:
        j0 = jobs_run()
        c0 = counter["n"]
        t0 = time.perf_counter()
        try:
            QUERIES[arm](spark, sf_dir)
            err = ""
        except Exception as e:  # keep censusing
            err = f" ERR {type(e).__name__}"
        dt = time.perf_counter() - t0
        rows.append((dt, counter["n"] - c0, jobs_run() - j0, arm, err))
        release_cached_intermediates(spark)

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total construction wall: {total:.1f}s over {len(rows)} arms")
    print(f"{'sec':>7} {'py4j':>7} {'jobs':>5}  arm")
    for dt, calls, jobs, arm, err in rows:
        print(f"{dt:7.2f} {calls:7d} {jobs:5d}  {arm}{err}")
    spark.stop()


if __name__ == "__main__":
    main()
