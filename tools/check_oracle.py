"""Local replica of the driver's t2 correctness gate — pandas-path edition.

Round-1 lesson (VERDICT.md "What's wrong"): the driver's value hash
diverges where engine output REPRESENTATIONS differ even though values
are equal. Empirically (CORRECTNESS_r01.json):

- row order does NOT matter (q_join_left / q_window_rank / q_union_all
  passed with different Spark/oracle row orders), but
- DuckDB's pandas conversion coerces DECIMAL→float64 and HUGEINT→float64
  while Spark's toPandas keeps Decimal objects → ``Decimal('38007.00')``
  vs ``38007.0`` stringify differently (all 8 round-1 hash failures had a
  scale-2 decimal, an integer SUM, or a raw timestamp in the output).

So this replica collects BOTH sides through pandas (``res.df()`` /
``sdf.toPandas()``), hashes order-insensitively, and — the part that
predicts driver failures — flags any column whose pandas dtype differs
between the two sides (decimal-vs-float, ns-vs-µs datetimes, int-vs-float
from HUGEINT). A query only counts as ok when values match AND dtypes
match.

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

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    import numpy as np

    if v is None:
        return "␀"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "␀"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        # driver evidence (r01): DATE columns compare equal to midnight
        # timestamps (q_scalar_date passed spark-date vs duck-datetime64)
        return v.isoformat() + "T00:00:00"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    try:
        # only the isna call may raise (ambiguous array-likes) — pandas
        # itself is a hard dependency, imported at module level (ADVICE r3)
        if pd.isna(v):  # pd.NA / NaT-likes that reach here (ADVICE r2)
            return "␀"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_digest(pdf) -> tuple[int, list[str], str, dict[str, str]]:
    """(n_rows, sorted col names, order-insensitive value hash, dtypes)."""
    import pandas as pd

    cols = sorted(pdf.columns)
    dtypes = {}
    for c in cols:
        dt = str(pdf[c].dtype)
        if dt == "object" and len(pdf) > 0:
            sample = pdf[c].dropna()
            if len(sample) > 0:
                dt = f"object[{type(sample.iloc[0]).__name__}]"
        dtypes[c] = dt
    lines = []
    for row in pdf[cols].itertuples(index=False, name=None):
        cells = []
        for v in row:
            if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                cells.append("␀")
            else:
                cells.append(_norm_cell(v))
        lines.append("\x1f".join(cells))
    lines.sort()
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(pdf), cols, h, dtypes


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
    failures, passes, rows_only, dtype_warns = [], [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows-only  {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sn, sc, sh, sdt = frame_digest(spdf)
        on, oc, oh, odt = frame_digest(opdf)
        if sn != on:
            failures.append((name, f"row count {sn} vs {on}"))
            print(f"FAIL  {name}: row count {sn} vs oracle {on}")
            continue
        if sc != oc:
            failures.append((name, f"columns {sc} vs {oc}"))
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            continue
        def _family(dt: str) -> str:
            if dt.startswith("datetime64") or dt in ("object[date]", "object[datetime]", "object[Timestamp]"):
                return "datetime"  # driver equates these (q_scalar_date r01)
            if dt in ("int8", "int16", "int32", "int64", "uint32"):
                return "int"  # driver equates widths (q_window_rank r01: int32 rn vs int64)
            return dt

        mismatch_dt = {
            c: (sdt[c], odt[c]) for c in sc if _family(sdt[c]) != _family(odt[c])
        }
        if sh != oh:
            failures.append((name, "value hash mismatch"))
            print(f"FAIL  {name}: value hash mismatch ({sn} rows) dtype-diff={mismatch_dt}")
            sset = set("\x1f".join(_norm_cell(v) for v in row) for row in spdf[sc].itertuples(index=False, name=None))
            oset = set("\x1f".join(_norm_cell(v) for v in row) for row in opdf[oc].itertuples(index=False, name=None))
            for line in sorted(sset - oset)[:3]:
                print(f"      spark-only: {line[:220]}")
            for line in sorted(oset - sset)[:3]:
                print(f"      oracle-only: {line[:220]}")
        elif mismatch_dt:
            dtype_warns.append((name, mismatch_dt))
            print(f"WARN  {name}: values match but pandas dtypes differ {mismatch_dt} — likely driver hash FAIL")
        else:
            passes.append(name)
            print(f"ok    {name}: {sn} rows, hash {sh} ({time.time()-t0:.1f}s)")

    print(
        f"\n{len(passes)} ok, {len(failures)} failed, {len(dtype_warns)} dtype-warn, "
        f"{len(rows_only)} rows-only of {len(queries) if not only else len(only)} checked"
    )
    return 1 if (failures or dtype_warns) else 0


if __name__ == "__main__":
    raise SystemExit(main())
