#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query
dumped by graft.Verify, run its oracle SQL in DuckDB over the same
parquet tables and compare values (columns sorted by name, rows sorted).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os, time
import duckdb
import numpy as np
import pandas as pd

# Round-14 gate-gap fix (VERDICT r13 item 2): float columns compare
# BYTE-EXACT by default (uint64 view of the float64 bits), because the
# driver hashes bytes — numeric `==` calls -0.0 and +0.0 equal and let
# s26's signed-zero divergence ship with every local gate green.
# ORACLE_NUMERIC=1 opts back into the old numeric `==` (the weaker
# comparison, kept only for exploratory/fuzz triage).
BYTE_EXACT = os.environ.get("ORACLE_NUMERIC", "") != "1"

# round-10 oracle budget: every oracle must replay in DuckDB under
# this wall at sf0.01 — a single outlier (p02 ran 808 s pre-fix)
# can blow the driver's whole correctness-gate budget and zero the
# round's hard signal (CORRECTNESS_r09.json came back `{}`)
BUDGET_S = float(os.environ.get("ORACLE_BUDGET_S", "10"))

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    # harness tables are single files; GenScale tables are directories
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# optional extra args = query-name substrings for targeted re-checks
flt = sys.argv[3:]
fails = []
slow = []
checked = 0
for name, sql in sorted(oracle.items()):
    if flt and not any(f in name for f in flt):
        continue
    checked += 1
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"MISS  {name}: no spark output")
        fails.append(name)
        continue
    sdf = pd.read_parquet(f"{out_dir}/{name}")
    t0 = time.time()
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"ORAERR {name}: {e}")
        fails.append(name)
        continue
    dt = time.time() - t0
    if dt > BUDGET_S:
        print(f"SLOW  {name}: oracle took {dt:.1f}s (budget {BUDGET_S:.0f}s)")
        slow.append((name, dt))
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    if list(sdf.columns) != list(ddf.columns):
        print(f"SCHEMA {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fails.append(name)
        continue
    if len(sdf) != len(ddf):
        print(f"ROWS  {name}: spark={len(sdf)} duck={len(ddf)}")
        fails.append(name)
        continue
    s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    d = ddf.sort_values(by=list(ddf.columns)).reset_index(drop=True)
    ok = True
    for c in s.columns:
        sc, dc = s[c], d[c].astype(s[c].dtype, errors="ignore") if hasattr(d[c], "astype") else d[c]
        is_float = sc.dtype.kind == "f" or getattr(dc, "dtype", sc.dtype).kind == "f"
        try:
            if BYTE_EXACT and is_float:
                # the driver's comparison: bit pattern, not value.
                # Sees signed zeros and NaN-payload differences.
                a = sc.to_numpy(dtype="float64").view("uint64")
                b = dc.to_numpy(dtype="float64").view("uint64")
                eqv = a == b
                eq = bool(eqv.all())
            else:
                eqv = None
                eq = (sc.fillna("§") == dc.fillna("§")).all() if sc.dtype == object else \
                     ((sc.isna() == dc.isna()) & (sc.fillna(0) == dc.fillna(0))).all()
        except Exception:
            eqv = None
            eq = False
        if not eq:
            if eqv is not None:
                idx = np.flatnonzero(~eqv)[:3]
                print(f"VAL   {name}.{c}: first BYTE diffs "
                      f"{[(int(i), sc.iloc[i], dc.iloc[i]) for i in idx]}")
            else:
                diff = (sc != dc) & ~(sc.isna() & dc.isna())
                idx = diff[diff].index[:3]
                print(f"VAL   {name}.{c}: first diffs {[(i, sc[i], dc[i]) for i in idx]}")
            ok = False
    if ok:
        print(f"OK    {name} ({len(sdf)} rows)")
    else:
        fails.append(name)
# count only queries actually checked — with a filter, the skipped
# ones must not be reported as matching
print(f"\n{checked - len(fails)}/{checked} match")
if slow:
    print("over-budget oracles: " +
          ", ".join(f"{n} {t:.1f}s" for n, t in sorted(slow, key=lambda x: -x[1])))
# exit codes: 1 = value/schema/row MISMATCH (a correctness failure);
# 2 = all values match but an oracle blew the time budget (a perf
# regression in the gate itself — on a loaded host this must stay
# distinguishable from a wrong answer, or a slow run reads as a
# correctness-gate failure)
sys.exit(1 if fails else (2 if slow else 0))
