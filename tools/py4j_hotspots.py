"""Attribute py4j round-trips to repo code sites for given arms.

Wraps GatewayClient.send_command to walk the Python stack and charge
the call to the innermost frame inside this repo (excluding pyspark/
py4j). Prints per-arm top sites by call count.

Usage: python tools/py4j_hotspots.py <arm> [...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: python tools/py4j_hotspots.py <arm> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "0")

    from mfdb_hafro_etl_spark.session import get_spark, release_cached_intermediates
    from mfdb_hafro_etl_spark.suite import QUERIES

    spark = get_spark(app_name="py4j_hotspots", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    import py4j.java_gateway as jg

    sites: Counter = Counter()
    active = {"on": False}
    orig = jg.GatewayClient.send_command

    def counting(self, *a, **kw):
        if active["on"]:
            f = sys._getframe(1)
            site = "<none>"
            while f is not None:
                fn = f.f_code.co_filename
                if "/mfdb_hafro_etl_spark/" in fn or fn.endswith("py4j_hotspots.py") or "/suite/" in fn:
                    site = f"{os.path.relpath(fn, HERE)}:{f.f_lineno}({f.f_code.co_name})"
                    break
                f = f.f_back
            sites[site] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counting

    arms = sys.argv[1:]
    # warm
    try:
        QUERIES[arms[0]](spark, sf_dir)
    except Exception:
        pass
    release_cached_intermediates(spark)

    for arm in arms:
        sites.clear()
        active["on"] = True
        try:
            QUERIES[arm](spark, sf_dir)
        finally:
            # an arm that throws mid-loop must not leave the counting
            # wrapper active for the rest of the process (r12 ADVICE
            # low; construction_census.py guards per-arm the same way)
            active["on"] = False
        total = sum(sites.values())
        print(f"\n== {arm}: {total} round-trips")
        for site, n in sites.most_common(25):
            print(f"{n:7d}  {site}")
        release_cached_intermediates(spark)
    spark.stop()


if __name__ == "__main__":
    main()
