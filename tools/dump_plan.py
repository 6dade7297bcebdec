"""Dump `.explain("formatted")` for named gates to files.

The optimization rounds' plan-evidence helper: the judge cannot run
Spark, so every claimed plan change ships as a committed
plans/r<N>/<gate>_{before,after}.txt pair produced by this tool.

Usage: python tools/dump_plan.py <out_dir> <suffix> <gate> [gate ...]
e.g.  python tools/dump_plan.py plans/r14 after q_curriculum_perplexity
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    gates = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pg_parquet_spark.operators.registry import all_queries
    from pg_parquet_spark.session import get_spark

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(include_retired=True)
    os.makedirs(out_dir, exist_ok=True)
    for g in gates:
        df = queries[g](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{g}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{path}: {len(plan.splitlines())} lines, {n_ex} Exchange refs")


if __name__ == "__main__":
    main()
