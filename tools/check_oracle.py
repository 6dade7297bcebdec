"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
(tables pre-registered as views over the same parquet), then compares
row count, sorted column names, and an order-insensitive value hash —
values normalized to strings per cell (floats via repr, Decimals via
str, timestamps via isoformat).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as entry_mod
    from pg_parquet_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, passes, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows-only  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sn, sc, sh = frame_digest(scols, srows)
        on, oc, oh = frame_digest(ocols, orows)
        if sn != on:
            failures.append((name, f"row count {sn} vs {on}"))
            print(f"FAIL  {name}: row count {sn} vs oracle {on}")
        elif sc != oc:
            failures.append((name, f"columns {sc} vs {oc}"))
            print(f"FAIL  {name}: columns {sc} vs {oc}")
        elif sh != oh:
            failures.append((name, "value hash mismatch"))
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            # show a few differing lines to debug
            sset = set("\x1f".join(_norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)
            oset = set("\x1f".join(_norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)
            for line in list(sset - oset)[:3]:
                print(f"      spark-only: {line[:200]}")
            for line in list(oset - sset)[:3]:
                print(f"      oracle-only: {line[:200]}")
        else:
            passes.append(name)
            print(f"ok    {name}: {sn} rows, hash {sh} ({time.time()-t0:.1f}s)")

    print(
        f"\n{len(passes)} ok, {len(failures)} failed, {len(rows_only)} rows-only "
        f"of {len(queries) if not only else len(only)} checked"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
