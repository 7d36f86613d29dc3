"""Cold per-key task/stage fingerprint: run ONE declared key once in this
process (bench noop-sink methodology) and print its job-group metrics —
the load-independent numbers the driver's sidecar records. For cross-key
cache-bleed attribution (r14): compare a fresh-process run of a key
against its value inside the full bench sweep.

Usage: python tools/key_tasks.py <key> [key ...]   # keys run in order,
one shared session — pass one key for a cold probe, several to reproduce
sweep-order effects.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from hive_nexr_spark.session import get_session  # noqa: E402
from hive_nexr_spark.queries.base import ensure_views  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="key-tasks")
    spark.range(1).count()
    for df in ensure_views(spark, sf_dir).values():
        df.count()
    q = entry_mod.queries()
    from hive_nexr_spark.datapipe._cache import release_tracked

    for name in names:
        release_tracked()
        group = f"kt:{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = q[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobGroup("kt:idle", "idle")
        m = bench._job_group_metrics(spark, group)
        print(json.dumps({"key": name, "wall": wall, **m}), flush=True)


if __name__ == "__main__":
    main()
