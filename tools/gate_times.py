"""Per-gate wall-time sweep (r14 optimization round): time EVERY
registered gate (incl. retired) at a given SF dir with the bench's own
methodology — untimed warm pass, N timed trials, noop sink, minimum
reported — and print one JSON object sorted by descending wall.

This is the targeting instrument for the optimization rounds: the
frozen 17-query bench covers the headline surface, but the judge's
PERF artifact and the 100 TB story care about every operator; this
sweep ranks the other ~170 gates by measured cost so optimization
effort lands where the time is.

Usage: python tools/gate_times.py [sf_dir] [trials] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gate_times.json"

    from pg_parquet_spark.operators.registry import all_queries
    from pg_parquet_spark.session import get_spark

    spark = get_spark("gate-times")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(include_retired=True)

    times: dict[str, list[float]] = {}
    errs: dict[str, str] = {}
    for name, fn in queries.items():
        spark.sparkContext.setJobDescription(f"gate_times: {name}")
        try:
            # warm (untimed): codegen + footer caches
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(trials):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            times[name] = ts
        except Exception as e:  # noqa: BLE001 - survey tool, keep going
            errs[name] = f"{type(e).__name__}: {e}"[:300]
        spark.sparkContext.setJobDescription(None)

    ranked = sorted(times.items(), key=lambda kv: -min(kv[1]))
    doc = {
        "sf_dir": sf_dir,
        "trials": trials,
        "total_min_sec": round(sum(min(v) for v in times.values()), 1),
        "ranked": [
            {"gate": n, "min": min(ts), "trials": ts} for n, ts in ranked
        ],
        "errors": errs,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    for row in doc["ranked"][:40]:
        print(f"{row['min']:8.3f}  {row['gate']}")
    print(f"total(min): {doc['total_min_sec']} s over {len(times)} gates -> {out_path}")
    if errs:
        print("ERRORS:", json.dumps(errs, indent=1))


if __name__ == "__main__":
    main()
