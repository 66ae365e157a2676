#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: runs every entry in
__spark_entry__.queries() against its oracle_sql() twin on DuckDB and
compares row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
(with query names given, only those entries run)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if v == int(v) else repr(round(v, 6))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return str(v)


def table_hash(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        sn, sh = table_hash(srows, scols)
        if name not in oracles:
            print(f"{name:20s} rows={sn:<8d} (no oracle — rows-only check)")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        on, oh = table_hash(orows, ocols)
        ok_cols = sorted(scols) == sorted(ocols)
        ok = (sn == on) and (sh == oh) and ok_cols
        status = "OK " if ok else "FAIL"
        print(f"{name:20s} {status} spark={sn} oracle={on} cols_match={ok_cols} hash {sh}/{oh}")
        if not ok:
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols:  {sorted(scols)}\n   oracle cols: {sorted(ocols)}")
            else:
                sset = set("\x1f".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)
                oset = set("\x1f".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)
                only_s = list(sset - oset)[:3]
                only_o = list(oset - sset)[:3]
                print(f"   only-in-spark:  {only_s}\n   only-in-oracle: {only_o}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match", f"FAILURES: {failures}" if failures else "")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
