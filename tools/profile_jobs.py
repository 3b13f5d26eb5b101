"""Per-Spark-job wall-clock profile of a registry query — the
measure-first tool behind iterative-query cost work (r9 verdict asks
#4/#6: close the part_louvain / embedding_kmeans cost questions with
per-stage numbers, not guesses).

Runs ONE query with the Spark event log enabled in a temp dir, then
parses SparkListenerJobStart/JobEnd events into a per-job table:
duration, call site (the repo file:line that launched the job), and
per-callsite rollups. No instrumentation in operator code — the JVM
already records everything needed.

Usage: python tools/profile_jobs.py [--sf sf0.1] query
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if len(args) != 1:
        print("usage: profile_jobs.py [--sf sfX] query", file=sys.stderr)
        return 2
    name = args[0]
    data_root = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
    sf_dir = sf if os.path.isabs(sf) else os.path.join(data_root, sf)

    from certa_spark.queries import QUERIES

    if name not in QUERIES:
        print(f"unknown query {name!r}", file=sys.stderr)
        return 2

    evdir = tempfile.mkdtemp(prefix="certa_profile_")
    try:
        from certa_spark.session import get_spark

        spark = get_spark(
            app_name=f"profile-{name}",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{evdir}",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
        # warm the session so the profile measures the plan, not
        # first-call codegen/session startup (bench.py discipline)
        QUERIES[name](spark, sf_dir).count()
        marker = time.time() * 1000.0
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        wall = time.time() - t0
        spark.stop()  # flush the event log

        jobs: dict[int, dict] = {}
        # Spark 4 writes a rolling event-log DIRECTORY per app
        # (eventlog_v2_<app>/events_*); walk everything readable
        logfiles = []
        for root, _dirs, files in os.walk(evdir):
            logfiles += [os.path.join(root, fn) for fn in files
                         if not fn.startswith("appstatus_")]
        for fn in logfiles:
            with open(fn) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except ValueError:
                        continue
                    if ev.get("Event") == "SparkListenerJobStart":
                        jid = ev["Job ID"]
                        jobs[jid] = {
                            "start": ev["Submission Time"],
                            "site": ev.get("Properties", {}).get(
                                "callSite.short", "?"
                            ),
                            "stages": len(ev.get("Stage Infos", [])),
                        }
                    elif ev.get("Event") == "SparkListenerJobEnd":
                        j = jobs.get(ev["Job ID"])
                        if j is not None:
                            j["end"] = ev["Completion Time"]

        timed = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "end" in j and j["start"] >= marker
        ]
        print(f"\n{name} @ {sf}: wall {wall:.2f}s, "
              f"{len(timed)} jobs in the warmed run")
        print(f"{'job':>5} {'sec':>7} {'stages':>6}  callsite")
        per_site: dict[str, list[float]] = {}
        for jid, j in timed:
            dur = (j["end"] - j["start"]) / 1000.0
            per_site.setdefault(j["site"], []).append(dur)
            print(f"{jid:>5} {dur:>7.3f} {j['stages']:>6}  {j['site']}")
        # non-job time = wall minus the UNION of job intervals — a
        # plain sum double-counts overlapping jobs (AQE sub-jobs,
        # concurrent actions) and can even go negative, understating
        # the driver overhead this tool exists to expose
        covered = 0.0
        last_end = None
        for s, e in sorted((j["start"], j["end"]) for _jid, j in timed):
            if last_end is None or s > last_end:
                covered += e - s
                last_end = e
            elif e > last_end:
                covered += e - last_end
                last_end = e
        gaps = wall - covered / 1000.0
        print(f"\nnon-job time (driver/python/scheduling between jobs): "
              f"{gaps:.2f}s of {wall:.2f}s")
        print("\nper-callsite rollup:")
        for site, ds in sorted(
            per_site.items(), key=lambda kv: -sum(kv[1])
        ):
            print(f"  {sum(ds):>7.3f}s  n={len(ds):>3}  {site}")
        return 0
    finally:
        shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
