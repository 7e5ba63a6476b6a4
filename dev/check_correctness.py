#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then execute each oracle_sql.json entry in DuckDB over the same parquet
tables and compare row/schema/values (columns sorted by name, rows sorted,
exact equality — floats bitwise after round-tripping through parquet).

Usage: python3 dev/check_correctness.py <sfDir> <outDir> [--skip-verify]
"""
import json, math, subprocess, sys

import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in ["events", "documents", "embeddings", "lineitem", "orders", "customer",
          "nation", "region", "part", "supplier"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    bad = None
    for c in g.columns:
        gc, wc = g[c], w[c]
        if str(gc.dtype).startswith("datetime") or str(wc.dtype).startswith("datetime"):
            gc = pd.to_datetime(gc).astype("datetime64[us]").astype("int64")
            wc = pd.to_datetime(wc).astype("datetime64[us]").astype("int64")
        try:
            eq = (gc.values == wc.values) | (pd.isna(gc).values & pd.isna(wc).values)
        except Exception:
            eq = gc.astype(str).values == wc.astype(str).values
        if not eq.all():
            i = int((~eq).argmax())
            bad = f"col {c} row {i}: spark={gc.iloc[i]!r} oracle={wc.iloc[i]!r}"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
for name in []:
    pass
print(f"\n{len(oracle) - fails}/{len(oracle)} oracles pass")
sys.exit(1 if fails else 0)
