"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against ``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (all cells stringified, rows sorted).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from jsonschema_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("oracle_check", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    import time as _time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        _t0 = _time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(s_rows)} rows (no oracle)"
                  f" [{_time.monotonic() - _t0:.2f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duck={len(dr)}")
            failures += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sr)} rows match [{_time.monotonic() - _t0:.2f}s]")
    # smoke entry()
    if not only:
        n = entrymod.entry(spark).count()
        print(f"entry(): {n} rows")
        if n <= 0:
            failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
