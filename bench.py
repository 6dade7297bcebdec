"""Benchmark harness — driver contract (BASELINE.md §2).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full computation, no
driver-side collect — the measurement reflects engine throughput, not
result serialization).

Each query runs $SPARK_GRAFT_TRIALS times (default 3) after an untimed
warm pass, and the reported per-query number is the MINIMUM across
trials (VERDICT r4 #4: minima separate JVM/harness noise — BASELINE.md
records ±20% run-to-run drift on identical code — from real
regressions). The JSON line carries "trials" so rounds are comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    # TPC-H-ish SQL surface
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_join_inner_broadcast",
    "q_join_left",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_window_rank",
    "q_window_frame",
    "q_topk",
    "q_union_all",
    "q_scalar_json",
    # LLM-pipeline operators (north-star workloads)
    "q_text_features",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_sim_cosine_topk",
    "q_asof_join",
    "q_sessionize_batch",
]


#: Version stamp for the machine probe. NEVER change the probe body
#: without bumping this — cross-round noise-floor comparisons are only
#: valid between identical probe versions.
PROBE_VERSION = 1

#: Normalization anchor (VERDICT r12 #6): probe_min measured on the
#: r12 idle same-code run (BENCH best-ever 6.86 s total). A round's
#: `value_normalized` = value × (anchor / probe_min) rescales the
#: total to that machine state. Only meaningful while PROBE_VERSION
#: stays 1 — bump the anchor together with any probe change.
PROBE_ANCHOR_SEC = 0.582


def _machine_probe(spark) -> float:
    """One timed pass of a FIXED synthetic workload (VERDICT r11 #6 —
    the automated stash-control): 20M generated rows through a hash
    projection and a grouped aggregate, no parquet, no repo operators,
    no data dependence — so its wall time moves ONLY with the machine
    (CPU contention, JVM state, thermal/noisy-neighbor effects).
    Cross-round: probe_min(rN) / probe_min(rM) estimates the machine
    delta between rounds — a headline query that moved by the same
    factor moved with the machine, not the code (r10/r11 litigated
    this manually via git-stash re-measurement; this field carries
    the evidence in every BENCH artifact)."""
    t0 = time.perf_counter()
    (
        spark.range(0, 20_000_000, 1, 32)
        .selectExpr("id % 97 AS k", "md5(cast(id AS string)) AS h")
        .groupBy("k")
        .agg({"h": "min", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pg_parquet_spark.operators.registry import all_queries
    from pg_parquet_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # include_retired: the bench set is FROZEN for BASELINE
    # comparability — gate retirement (r12: q_topk, q_union_all)
    # removes a query from the driver's certification window, never
    # its implementation, so headline members keep being measured.
    queries = all_queries(include_retired=True)
    names = [n for n in HEADLINE if n in queries]
    assert len(names) == len(HEADLINE), sorted(
        set(HEADLINE) - set(names)
    )  # frozen set must resolve completely
    # extend with any registered pipeline benchmarks
    names += [n for n in queries if n.startswith("bench_") and n not in names]

    # warm pass: JVM JIT, whole-stage-codegen compilation, parquet footer
    # caches — untimed (standard warm-run protocol; the measured pass
    # reflects steady-state engine throughput)
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))
    # per-trial numbers ship in the artifact (VERDICT r6 #4: r6's +10%
    # was uniform across unchanged queries — classic harness noise; with
    # all trials recorded, noise is quantifiable from the JSON itself)
    all_trials: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(trials):
        for name in names:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            all_trials[name].append(round(time.perf_counter() - t0, 3))
    timings = {n: min(ts) for n, ts in all_trials.items()}

    # machine noise floor: warm pass + the same trial protocol as the
    # queries; min = this machine's steady-state, spread = intra-run
    # noise. Compare probe_min across rounds before reading anything
    # into a headline delta.
    _machine_probe(spark)  # warm: codegen compile + JIT
    _machine_probe(spark)  # warm: post-suite GC settle
    probe_trials = [_machine_probe(spark) for _ in range(trials)]
    noise_floor = {
        "probe_version": PROBE_VERSION,
        "probe_sec": probe_trials,
        "probe_min": min(probe_trials),
        "probe_spread_pct": round(
            (max(probe_trials) - min(probe_trials))
            / max(min(probe_trials), 1e-9)
            * 100,
            1,
        ),
    }

    total = round(sum(timings.values()), 3)
    # probe-normalized total (VERDICT r12 #6): rescale to the anchor
    # machine state (the r12 idle run's probe_min — BASELINE.md
    # "Probe anchor") so cross-round tables stop needing prose
    # adjudication of machine drift. The RAW value stays primary; the
    # normalized one is only comparable while PROBE_VERSION matches.
    value_normalized = round(
        total * (PROBE_ANCHOR_SEC / max(noise_floor["probe_min"], 1e-9)), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "value_normalized": value_normalized,
                "probe_anchor_sec": PROBE_ANCHOR_SEC,
                "unit": "sec",
                "queries": timings,
                "query_trials": all_trials,
                "sf": sf,
                "trials": trials,
                "noise_floor": noise_floor,
            }
        )
    )


if __name__ == "__main__":
    main()
