#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the sf parquet tables, compare to the
Spark parquet output (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/check_correctness.py [/tmp/graft-verify] [/root/testdata/sf0.01]
"""
import duckdb, glob, json, os, sys, hashlib

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    rows = df.values.tolist()
    def key(r):
        return [("" if v is None else str(v)) for v in r]
    rows.sort(key=key)
    h = hashlib.md5()
    for r in rows:
        for v in r:
            if v is None:
                h.update(b"\x00NULL")
            elif isinstance(v, float):
                h.update(f"{v:.6g}".encode())
            else:
                h.update(str(v).encode())
            h.update(b"\x01")
    return len(rows), list(df.columns), h.hexdigest()

fails = []
queries = sorted(d for d in os.listdir(outdir)
                 if os.path.isdir(os.path.join(outdir, d)))
for q in queries:
    files = sorted(glob.glob(os.path.join(outdir, q, "*.parquet")))
    if not files:
        print(f"{q:28s} NO_PARQUET"); fails.append(q); continue
    got = con.sql(f"SELECT * FROM read_parquet({files})").df()
    if q not in oracles:
        print(f"{q:28s} no_oracle rows={len(got)}")
        continue
    try:
        want = con.sql(oracles[q]).df()
    except Exception as e:
        print(f"{q:28s} ORACLE_ERR {e}"); fails.append(q); continue
    nr_g, cols_g, h_g = canon(got)
    nr_w, cols_w, h_w = canon(want)
    rows_ok = nr_g == nr_w
    schema_ok = cols_g == cols_w
    hash_ok = h_g == h_w
    status = "OK" if (rows_ok and schema_ok and hash_ok) else \
        f"FAIL rows={rows_ok}({nr_g}/{nr_w}) schema={schema_ok} hash={hash_ok}"
    if not (rows_ok and schema_ok and hash_ok):
        fails.append(q)
        if not schema_ok:
            print(f"  spark cols: {cols_g}\n  duck  cols: {cols_w}")
    print(f"{q:28s} {status}")

print(f"\n{len(queries)-len(fails)}/{len(queries)} green; fails: {fails}")
sys.exit(1 if fails else 0)
