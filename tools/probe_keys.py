"""Paired timing probe: run the given headline keys N times each in ONE
session (bench methodology: count() materialization under a job group) and
print per-run walls + the min (steady-state) per key.

Usage: python tools/probe_keys.py [-n N] <key> [key ...]

Wall-clock on this host drifts with ambient load and JIT warm-up, so
before/after comparisons use the MIN over N runs in one JVM — the
steady-state number the cold bench approaches from above (BENCH_NOTES.md
round-8 comparison rule: fingerprints for plan changes, paired probes for
wall)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hive_nexr_spark.session import get_session  # noqa: E402
from hive_nexr_spark.queries.base import ensure_views  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe-keys")
    spark.range(1).count()
    for df in ensure_views(spark, sf_dir).values():
        df.count()
    q = entry_mod.queries()
    for name in names:
        walls = []
        for i in range(n):
            spark.sparkContext.setJobGroup(f"probe:{name}:{i}", name)
            t0 = time.perf_counter()
            df = q[name](spark, sf_dir)
            df.count()
            walls.append(time.perf_counter() - t0)
        runs = " ".join(f"{w:.2f}" for w in walls)
        print(f"PROBE {name}: min={min(walls):.2f} runs=[{runs}]",
              flush=True)


if __name__ == "__main__":
    main()
