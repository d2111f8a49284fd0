#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the Verify dump
(outDir/<name>/ parquet + oracle_sql.json), runs each oracle in DuckDB over
the sf parquet tables, and compares (columns sorted by name, rows sorted,
values hashed). Exit 0 iff all match."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# prefix match, mirroring Verify's SPARK_GRAFT_ONLY — exact match would
# silently skip everything ("0 pass, 0 fail" green gate) on a bare "q25"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> ns, ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

fails, passes = [], []
for name in sorted(oracle):
    if only and not any(name.startswith(p) for p in only):
        continue
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        fails.append((name, "no spark result dir")); continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        fails.append((name, f"cols spark={list(s.columns)} duck={list(d.columns)}")); continue
    if len(s) != len(d):
        fails.append((name, f"rows spark={len(s)} duck={len(d)}")); continue
    mismatch = None
    for c in s.columns:
        a, b = s[c], d[c]
        if pd.api.types.is_float_dtype(a):
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                diff = (a - b).abs().max()
                mismatch = f"col {c}: float mismatch (max abs diff {diff})"
                break
        else:
            eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = f"col {c}: value mismatch at row {i}: spark={a[i]!r} duck={b[i]!r}"
                break
    if mismatch:
        fails.append((name, mismatch))
    else:
        passes.append((name, len(s)))

for n, k in passes:
    print(f"PASS {n} ({k} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
