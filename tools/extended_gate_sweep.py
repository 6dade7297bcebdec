"""Extended-tier certification sweep (VERDICT r11 "What's missing" #1).

Runs every NON-registry oracle-backed operator family
(``pg_parquet_spark.operators.extended_registry`` — the ``x_`` tier)
through the driver-identical compare at both SFs and writes
``CORRECTNESS_EXTENDED_r{N}.json`` in the driver's per-query row
format (the CORRECTNESS_LOCAL conventions: AND-fold across SFs,
largest-SF row counts, dtype-family check inside hash_match).

Together the three tiers cover the whole oracle surface each round:

- ``CORRECTNESS_r{N}.json``          — driver, 50-gate window
- ``CORRECTNESS_LOCAL_r{N}.json``    — all registered + retired gates
- ``CORRECTNESS_EXTENDED_r{N}.json`` — everything beyond the registry

Usage: python tools/extended_gate_sweep.py <round> [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES  # noqa: E402
from tools.local_gate_sweep import run_one  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sfs = sys.argv[2:] or DEFAULT_SFS

    import duckdb

    from pg_parquet_spark.operators.extended_registry import (
        EXTENDED_QUERIES,
        extended_oracles,
    )
    from pg_parquet_spark.operators.registry import all_queries
    from pg_parquet_spark.session import get_spark

    overlap = set(EXTENDED_QUERIES) & set(all_queries(include_retired=True))
    if overlap:
        print(f"ERROR: extended tier overlaps the registry: {sorted(overlap)}")
        return 2

    spark = get_spark("extended_gate_sweep")
    oracles = extended_oracles()

    out: dict[str, dict] = {}
    t_start = time.time()
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        sf_tag = os.path.basename(sf_dir.rstrip("/"))
        for name, fn in EXTENDED_QUERIES.items():
            t0 = time.time()
            row = run_one(spark, con, name, fn, oracles.get(name), sf_dir)
            prev = out.get(name)
            if prev is None:
                row["checked_sfs"] = [sf_tag]
                row["tier"] = "extended"
                out[name] = row
            else:
                prev["rows_match"] &= row["rows_match"]
                prev["schema_match"] &= row["schema_match"]
                prev["hash_match"] &= row["hash_match"]
                prev["spark_rows"] = row["spark_rows"]
                prev["oracle_rows"] = row["oracle_rows"]
                prev["err"] = prev["err"] or row["err"]
                prev["checked_sfs"].append(sf_tag)
            ok = out[name]["hash_match"] and out[name]["rows_match"]
            mark = "ok " if ok else "RED"
            print(
                f"{mark} [{sf_tag}] {name}: {row['spark_rows']} rows "
                f"({time.time() - t0:.1f}s)"
                + (f" err={row['err']}" if row["err"] else "")
            )
        con.close()

    green = sum(
        1
        for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    path = os.path.join(REPO, f"CORRECTNESS_EXTENDED_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(
        f"\nwrote {path}: {green}/{len(out)} green "
        f"({len(sfs)} SFs, {time.time() - t_start:.0f}s)"
    )
    return 0 if green == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
