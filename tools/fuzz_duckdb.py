#!/usr/bin/env python3
"""DuckDB side of the differential query fuzzer (FuzzSpec): read a
JSON file of {query_name: sql}, run each statement over the parquet
tables of <sfDir>, and emit one JSON object
{query_name: {"cols": [...], "rows": [[...]]}} on stdout.

Values are JSON-normalized: Decimal -> float, date/datetime -> ISO
string, bytes -> hex. A per-query error is reported as
{"error": "..."} instead of rows, so one bad statement cannot take
down the whole batch (the Scala side fails that query with the
message).
Usage: fuzz_duckdb.py <sfDir> <queries.json>
"""
import json, sys, glob, os
from decimal import Decimal

import duckdb

sf_dir, qfile = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


queries = json.load(open(qfile))
out = {}
for name, sql in queries.items():
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = [[norm(v) for v in r] for r in cur.fetchall()]
        out[name] = {"cols": cols, "rows": rows}
    except Exception as e:
        out[name] = {"error": str(e)}
print(json.dumps(out))
