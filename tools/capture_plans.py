"""Capture .explain("formatted") output for headline queries into
plans/r12/<query>_<tag>.txt (the optimization round's evidence files).

    python tools/capture_plans.py <tag> [query ...]

With no query names, captures every bench.py HEADLINE query. Streaming
frames and side-effect gates that return createDataFrame results are
captured as whatever their final DataFrame's plan is (the catalog entry
IS the declared query).
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(_ROOT, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES
    from amazon_kinesis_analytics_streaming_etl_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
