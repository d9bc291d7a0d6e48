"""Job-level profile of one registry query via the Spark event log.

Usage: python tools/profile_jobs.py <query> [--sf DIR]

Runs the query once (construction + noop sink, the bench methodology)
with ``spark.eventLog.enabled`` pointed at a temp dir, then parses the
event log and prints one line per Spark job: wall, task time, peak
stage, and the job group/description — the breakdown local lifecycle
queries need (their cost is N small jobs, not one big one; guide §1
says find out WHICH N)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    name = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    evdir = tempfile.mkdtemp(prefix="spark_events_")

    from data_lake_demo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    queries = entrymod.queries()
    fn = queries[name]
    # warm like bench.py
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm = spark.range(1000).withColumnRenamed("id", "k")
    warm.join(warm, "k").groupBy((warm.k % 10)).count().write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    marker_job_floor = spark.sparkContext.getConf()  # no-op
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"# run1={warm_wall:.3f}s run2={wall:.3f}s", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling event log: eventlog_v2_<appid>/events_*_<appid>
    path = os.path.join(evdir, app_id)
    if not os.path.isfile(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        cands = sorted(
            os.path.join(d, n) for n in os.listdir(d) if n.startswith("events")
        )
        path = cands[0]
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "callsite": props.get("callSite.short", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                    "tasks": si.get("Number of Tasks", 0),
                }
    total = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        total += dur
        stages = ", ".join(
            f"s{sid}:{stage_info[sid]['ms']}ms/{stage_info[sid]['tasks']}t"
            for sid in j["stages"]
            if sid in stage_info
        )
        print(f"job {jid:3d} {dur:7.3f}s  ntasks={j['ntasks']:4d}  "
              f"{j['callsite'][:40]:40s} {stages[:120]}")
        if j["desc"]:
            print(f"         desc: {j['desc']}")
    print(f"# sum of job walls: {total:.3f}s (both runs + warmup)")
    print("# --- heaviest stages ---")
    for sid, si in sorted(
        stage_info.items(), key=lambda kv: -kv[1]["ms"]
    )[:25]:
        print(f"stage {sid:4d} {si['ms']:6d}ms {si['tasks']:4d}t  {si['name'][:110]}")
    print(f"# event log: {path}")


if __name__ == "__main__":
    main()
