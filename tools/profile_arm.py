"""Profile one suite arm: wall time, then per-stage breakdown from the
Spark event log (duration, tasks, shuffle/input bytes).

Usage: python tools/profile_arm.py <arm> [<arm>...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32). Runs each arm once (cold) in this JVM,
mirroring bench.py's materialize (toArrow), then prints stages sorted
by duration. The event log is written to a fresh /tmp dir per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVDIR = "/tmp/mfdb_evlog"


def main() -> None:
    arms = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "0")

    # the bench's own session factory (same confs), plus event logging
    # injected via submit args (must precede JVM launch)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.dir={EVDIR} "
        "--conf spark.eventLog.compress=false "
        "--conf spark.eventLog.rolling.enabled=false "
        "pyspark-shell"
    )
    from mfdb_hafro_etl_spark.session import get_spark
    from mfdb_hafro_etl_spark.suite import QUERIES

    spark = get_spark(app_name="profile_arm", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    marks = {}
    for arm in arms:
        sc = spark.sparkContext
        sc.setJobDescription(f"ARM:{arm}")
        t0 = time.perf_counter()
        w0 = time.time()
        df = QUERIES[arm](spark, sf_dir)
        t1 = time.perf_counter()
        try:
            df.toArrow()
        except Exception:
            df.toPandas()
        t2 = time.perf_counter()
        marks[arm] = (w0, w0 + (t2 - t0))
        print(
            f"== {arm}: build {t1 - t0:.2f}s materialize {t2 - t1:.2f}s "
            f"total {t2 - t0:.2f}s",
            flush=True,
        )
        sc.setJobDescription(None)
    spark.stop()

    # parse the event log: stage durations + job wall-clock windows
    evpath = next(
        os.path.join(EVDIR, f)
        for f in os.listdir(EVDIR)
        if not f.startswith(".")
    )
    if os.path.isdir(evpath):  # Spark 4 rolling event-log dir
        evfiles = sorted(
            os.path.join(evpath, f)
            for f in os.listdir(evpath)
            if f.startswith("events")
        )
    else:
        evfiles = [evpath]

    def _lines():
        for p in evfiles:
            with open(p) as fh:
                yield from fh

    stages = {}  # id -> dict
    jobs = []  # (t_submit_s, t_end_s, desc, [stage ids])
    if True:
        for line in _lines():
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
                stages[sid] = {
                    "dur": dur,
                    "tasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:60],
                }
            elif k == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs.append(
                    {
                        "t0": ev["Submission Time"] / 1e3,
                        "desc": desc,
                        "sids": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                        "jid": ev["Job ID"],
                    }
                )
            elif k == "SparkListenerJobEnd":
                for j in jobs:
                    if j["jid"] == ev["Job ID"]:
                        j["t1"] = ev["Completion Time"] / 1e3

    for arm in arms:
        print(f"\n### {arm}")
        w0, w1 = marks[arm]
        # all jobs whose window overlaps the arm's wall window —
        # streaming/foreachBatch jobs don't carry the ARM description
        arm_jobs = [
            j for j in jobs if j["t0"] < w1 + 1 and j.get("t1", j["t0"]) > w0
        ]
        tot = sum(j.get("t1", j["t0"]) - j["t0"] for j in arm_jobs)
        print(f"{len(arm_jobs)} jobs, sum job wall {tot:.2f}s")
        # gaps between consecutive jobs (driver-side time)
        arm_jobs.sort(key=lambda j: j["t0"])
        for a, b in zip(arm_jobs, arm_jobs[1:]):
            gap = b["t0"] - a.get("t1", a["t0"])
            if gap > 0.3:
                print(f"  driver gap {gap:.2f}s after job {a['jid']}")
        sids = [s for j in arm_jobs for s in j["sids"] if s in stages]
        top = sorted(set(sids), key=lambda s: -stages[s]["dur"])[:12]
        for s in top:
            st = stages[s]
            if st["dur"] < 0.15:
                continue
            print(
                f"  stage {s}: {st['dur']:6.2f}s  {st['tasks']:4d} tasks  {st['name']}"
            )


if __name__ == "__main__":
    main()
