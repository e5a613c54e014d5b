#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate:
run each oracle SQL in DuckDB over the raw parquet tables and compare
with the Verify-dumped Spark result (columns sorted by name, rows
sorted by all columns, exact value compare).

Usage: check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make list/array cells comparable
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def eq(a, b):
    if a.shape != b.shape: return False, f"shape {a.shape} vs {b.shape}"
    if list(a.columns) != list(b.columns): return False, f"cols {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        va, vb = a[c].values, b[c].values
        for i in range(len(va)):
            x, y = va[i], vb[i]
            if x is None or (isinstance(x, float) and pd.isna(x)):
                if not (y is None or (isinstance(y, float) and pd.isna(y))):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y:
                    return False, f"col {c} row {i}: {x!r} vs {y!r} (diff {x-y:.3e})"
            elif isinstance(x, pd.Timestamp) or isinstance(y, pd.Timestamp):
                if pd.Timestamp(x) != pd.Timestamp(y):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
            else:
                if x != y:
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
    return True, ""

names = sorted(set(
    os.path.basename(p) for p in glob.glob(f"{outdir}/q*") if os.path.isdir(p)))
npass = nfail = 0
# Verify's per-query status (r17 review): a query that fails BEFORE its
# write job leaves no dump dir, so the dir glob alone would silently
# skip it — or compare a stale dump from a previous run. Any attempted
# query that didn't finish "ok" fails the gate; an ok query with no
# dump dir is likewise an error.
status_path = f"{outdir}/status.json"
if os.path.exists(status_path):
    status = json.load(open(status_path))
    for name, st in sorted(status.items()):
        if st != "ok":
            print(f"VERR  {name}: verify-side {st}"); nfail += 1
        elif name not in names:
            print(f"MISS  {name}: status ok but no dump dir"); nfail += 1
    # stale dirs from a previous, larger run must not masquerade as
    # this run's results
    names = [n for n in names if n in status and status[n] == "ok"]
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output"); nfail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracle:
        print(f"ROWS  {name}: rows={len(spark_df)} (no oracle)" +
              ("  ** EMPTY **" if len(spark_df) == 0 else ""))
        continue
    try:
        oracle_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"OERR  {name}: oracle SQL failed: {e}"); nfail += 1; continue
    a, b = canon(spark_df), canon(oracle_df)
    # normalize timestamp dtypes (ns vs us)
    ok, msg = eq(a, b)
    if ok:
        print(f"PASS  {name} ({len(a)} rows)"); npass += 1
    else:
        print(f"FAIL  {name}: {msg}")
        print(f"      spark: {a.head(3).to_dict('records')}")
        print(f"      duck : {b.head(3).to_dict('records')}")
        nfail += 1
print(f"\n{npass} pass, {nfail} fail, {len(names)} total")
sys.exit(1 if nfail else 0)
