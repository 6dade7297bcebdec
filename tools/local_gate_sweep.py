"""Machine-checkable LOCAL certification sweep (VERDICT r9 #3).

The driver certifies a 50-gate window per round; the registry holds ~150
gates and the repo ships ~20 new locally-verified operator families per
round — so "locally DuckDB-oracle-verified" claims used to live only in
prose. This tool makes them an artifact: it runs EVERY registered gate
(plus every RETIRED gate — retirement leaves the driver surface, never
the oracle contract) through the driver-identical compare
(tools/check_oracle.frame_digest: rows + sorted columns + order-
insensitive value hash + pandas dtype families) at BOTH sf0.001 and
sf0.01, and writes ``CORRECTNESS_LOCAL_r{N}.json`` in the driver's
per-query row format:

    {"q_x": {"rows_match": true, "schema_match": true,
             "hash_match": true, "spark_rows": 100, "oracle_rows": 100,
             "err": null, "checked_sfs": ["sf0.001", "sf0.01"],
             "retired": false}, ...}

Field semantics match the driver exactly, folded across SFs with AND
(a gate that is green at sf0.01 but red at sf0.001 is RED — the r8
half-way-rounding lesson); spark_rows/oracle_rows report the largest
checked SF. ``hash_match`` additionally requires pandas dtype-family
agreement, the condition that predicts driver hash failures. The file
name is deliberately outside the driver's ``CORRECTNESS_r*.json``
glob so rotation folding never confuses local evidence with driver
evidence.

Usage: python tools/local_gate_sweep.py <round> [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, frame_digest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _dtype_family(dt: str) -> str:
    if dt.startswith("datetime64") or dt in (
        "object[date]",
        "object[datetime]",
        "object[Timestamp]",
    ):
        return "datetime"
    if dt in ("int8", "int16", "int32", "int64", "uint32"):
        return "int"
    return dt


def run_one(spark, con, name, fn, oracle_sql, sf_dir) -> dict:
    row = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        spdf = fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        row["err"] = f"spark: {type(e).__name__}: {e}"[:300]
        return row
    row["spark_rows"] = len(spdf)
    if oracle_sql is None:
        # rows-only gate (non-SQL-expressible) — mirror the driver's
        # weaker check: ran + produced rows with a readable schema
        row.update(
            rows_match=True,
            schema_match=True,
            hash_match=True,
            oracle_rows=None,
            err="rows-only (no oracle)",
        )
        return row
    try:
        opdf = con.execute(oracle_sql).df()
    except Exception as e:  # noqa: BLE001
        row["err"] = f"duckdb: {type(e).__name__}: {e}"[:300]
        return row
    sn, sc, sh, sdt = frame_digest(spdf)
    on, oc, oh, odt = frame_digest(opdf)
    row["oracle_rows"] = on
    row["rows_match"] = sn == on
    row["schema_match"] = sc == oc
    dtype_ok = all(
        _dtype_family(sdt[c]) == _dtype_family(odt.get(c, "?")) for c in sc
    ) if sc == oc else False
    row["hash_match"] = sh == oh and dtype_ok
    if sh == oh and not dtype_ok and sc == oc:
        row["err"] = "dtype-family mismatch (values equal) — driver hash would fail"
    return row


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sfs = sys.argv[2:] or DEFAULT_SFS

    import duckdb

    from pg_parquet_spark.operators import registry
    from pg_parquet_spark.session import get_spark

    spark = get_spark("local_gate_sweep")
    queries = registry.all_queries(include_retired=True)
    oracles = registry.all_oracles(include_retired=True)
    retired = set(registry.RETIRED)

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
        for name, fn in queries.items():
            t0 = time.time()
            row = run_one(spark, con, name, fn, oracles.get(name), sf_dir)
            prev = out.get(name)
            if prev is None:
                row["checked_sfs"] = [sf_tag]
                row["retired"] = name in retired
                out[name] = row
            else:
                # AND-fold across SFs; keep the largest-SF row counts
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
    path = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(
        f"\nwrote {path}: {green}/{len(out)} green "
        f"({sum(1 for r in out.values() if r['retired'])} retired, "
        f"{len(sfs)} SFs, {time.time() - t_start:.0f}s)"
    )
    return 0 if green == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
