"""A/B a runtime SQL conf over a set of declared keys in ONE JVM.

Usage: python tools/ab_conf.py <conf_key> <valA> <valB> [-n N] <key> [key...]

Runs each key N times per conf value, interleaved (A B A B ...), under the
bench count() methodology, printing per-run walls + per-run task counts
from the job-group metrics so plan-shape changes are visible through
ambient load.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hive_nexr_spark.session import get_session  # noqa: E402
from hive_nexr_spark.queries.base import ensure_views  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    conf_key, val_a, val_b = sys.argv[1:4]
    rest = sys.argv[4:]
    n = 2
    if rest and rest[0] == "-n":
        n = int(rest[1])
        rest = rest[2:]
    names = rest
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="ab-conf")
    spark.range(1).count()
    for df in ensure_views(spark, sf_dir).values():
        df.count()
    q = entry_mod.queries()
    for name in names:
        res = {val_a: [], val_b: []}
        tasks = {val_a: [], val_b: []}
        from hive_nexr_spark.datapipe._cache import release_tracked

        for i in range(n):
            for val in (val_a, val_b):
                release_tracked()
                spark.conf.set(conf_key, val)
                group = f"ab:{name}:{val}:{i}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                df = q[name](spark, sf_dir)
                df.count()
                res[val].append(time.perf_counter() - t0)
                spark.sparkContext.setJobGroup("ab:idle", "idle")
                m = bench._job_group_metrics(spark, group)
                tasks[val].append(m.get("n_tasks", -1))
        for val in (val_a, val_b):
            runs = " ".join(f"{w:.2f}" for w in res[val])
            print(f"AB {name} {conf_key}={val}: min={min(res[val]):.2f} "
                  f"runs=[{runs}] tasks={tasks[val]}", flush=True)


if __name__ == "__main__":
    main()
