#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver contract: for each query parquet written by
graft.Verify, run the matching oracle SQL from oracle_sql.json in DuckDB
(tables registered as views over <sfDir>/<name>.parquet), sort columns by
name, compare row counts, schemas (loosely), and values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_n, want_n = norm(got), norm(want)
        if list(got_n.columns) != list(want_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} vs oracle {list(want_n.columns)}")
            n_fail += 1
            continue
        if len(got_n) != len(want_n):
            print(f"FAIL {name}: rows {len(got_n)} vs oracle {len(want_n)}")
            n_fail += 1
            continue
        mismatch = []
        for c in got_n.columns:
            a, b = got_n[c], want_n[c]
            try:
                eq = (a.astype("object").where(a.notna(), None)
                      == b.astype("object").where(b.notna(), None))
                eq = eq | (a.isna() & b.isna())
                ok = bool(eq.all())
                if not ok and pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b):
                    ok = bool(((a - b).abs().fillna(0) < 1e-9).all()) and bool((a.isna() == b.isna()).all())
            except Exception:
                ok = False
            if not ok:
                mismatch.append(c)
                bad = (a.astype("object").where(a.notna(), None)
                       != b.astype("object").where(b.notna(), None))
                idx = list(bad[bad].index[:3])
                for i in idx:
                    print(f"   {name}.{c}[{i}]: spark={a[i]!r} ({a.dtype}) oracle={b[i]!r} ({b.dtype})")
        # dtype drift report (schema check is driver-side; warn loudly)
        dt = [(c, str(got_n[c].dtype), str(want_n[c].dtype))
              for c in got_n.columns if str(got_n[c].dtype) != str(want_n[c].dtype)]
        if mismatch:
            print(f"FAIL {name}: value mismatch in {mismatch}")
            n_fail += 1
        elif dt:
            print(f"WARN {name}: dtype drift {dt} (values match)")
        else:
            print(f"OK   {name}: {len(got_n)} rows")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
