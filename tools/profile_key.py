"""Per-job time breakdown for one declared key: run the key once (bench
methodology: count() under a job group), then list every Spark job it ran
with wall, task count and shuffle bytes, from the same AppStatusStore the
UI uses. Separates "Spark is busy" time from driver/Python plan time:
the gap between sum(job walls) and the key's total wall is
planning/py4j/driver work (guide §7.3).

Usage: python tools/profile_key.py [-n N] <key>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hive_nexr_spark.session import get_session  # noqa: E402
from hive_nexr_spark.queries.base import ensure_views  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    name = args[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="profile-key")
    spark.range(1).count()
    for df in ensure_views(spark, sf_dir).values():
        df.count()
    q = entry_mod.queries()
    from hive_nexr_spark.datapipe._cache import release_tracked

    for i in range(n):
        release_tracked()
        group = f"prof:{name}:{i}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = q[name](spark, sf_dir)
        df.count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup("prof:idle", "idle")
        store = spark.sparkContext._jsc.sc().statusStore()
        jobs = store.jobsList(None)
        rows = []
        for j in range(jobs.size()):
            jb = jobs.apply(j)
            jg = jb.jobGroup()
            if not (jg.isDefined() and jg.get() == group):
                continue
            sub = jb.submissionTime()
            comp = jb.completionTime()
            if not (sub.isDefined() and comp.isDefined()):
                continue
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            rows.append((dur, int(jb.jobId()), int(jb.numTasks()),
                         str(jb.name())[:100]))
        rows.sort(key=lambda r: -r[0])
        jobs_total = sum(r[0] for r in rows)
        print(f"\n=== run {i}: {name} wall={wall:.2f}s "
              f"jobs={len(rows)} jobs_total={jobs_total:.2f}s "
              f"driver_gap={wall - jobs_total:.2f}s ===", flush=True)
        for dur, jid, ntasks, jname in rows[:25]:
            print(f"  {dur:6.2f}s  job {jid:4d}  {ntasks:4d} tasks  {jname}")


if __name__ == "__main__":
    main()
