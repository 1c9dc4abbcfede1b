#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each dumped query
result under VERIFY_DIR, run the oracle SQL in DuckDB over the sf
parquet tables and compare rows/schema/values (columns sorted by name,
values compared after a canonical sort)."""
import json, sys, glob
import duckdb
import pandas as pd

verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_r5"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

oracles = json.load(open(f"{verify_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
names = sorted(oracles) if only is None else only
for name in names:
    if name not in oracles:
        print(f"{name}: NO ORACLE (rows-only)")
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              glob.glob(f"{verify_dir}/{name}/*.parquet")],
                             ignore_index=True)
    except Exception as e:
        print(f"{name}: SPARK DUMP MISSING ({e})")
        fails.append(name)
        continue
    try:
        ora = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    s, o = canon(spark_df), canon(ora)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
        fails.append(name); continue
    if len(s) != len(o):
        print(f"{name}: ROWS {len(s)} vs {len(o)}")
        fails.append(name); continue
    # value compare with dtype coercion (duckdb hugeint vs spark long etc.)
    eq = True
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            a = pd.to_numeric(a); b = pd.to_numeric(b)
            if not ((a.isna() & b.isna()) | (a == b)).all():
                eq = False; break
        except Exception:
            if not ((a.isna() & b.isna()) | (a.astype(str) == b.astype(str))).all():
                eq = False; break
    if eq:
        print(f"{name}: OK ({len(s)} rows)")
    else:
        bad = c
        print(f"{name}: VALUE MISMATCH in column '{bad}'")
        m = (pd.to_numeric(s[bad], errors='coerce') != pd.to_numeric(o[bad], errors='coerce'))
        print(pd.concat([s[m].head(3).add_suffix('_spark'),
                         o[m].head(3).add_suffix('_oracle')], axis=1))
        fails.append(name)
print("FAILS:", fails if fails else "none")
