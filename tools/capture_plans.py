"""Capture .explain('formatted') for headline queries → plans/<round>/<q>_<tag>.txt.

Round dir from $SPARK_GRAFT_PLANS_ROUND (default r14).

Usage: python tools/capture_plans.py <tag> [query ...]
Defaults to every bench.HEADLINE key. Streaming/lifecycle keys whose
DataFrame is only available AFTER side effects still explain fine — the
returned DataFrame is the query's declared result."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from hive_nexr_spark.session import get_session  # noqa: E402
from hive_nexr_spark.queries.base import ensure_views  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture-plans")
    for df in ensure_views(spark, sf_dir).values():
        df.count()
    q = entry_mod.queries()
    for name in names:
        try:
            df = q[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print("captured", name, flush=True)


if __name__ == "__main__":
    main()
