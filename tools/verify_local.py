#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (t2).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same parquet
tables, sorts columns by name and rows by all columns, and compares values
exactly. Reports per-query PASS/FAIL with first diffs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          key=lambda s: s.map(lambda v: (v is None, str(v))))


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            bad = []
            for c in g.columns:
                gv, wv = list(g[c]), list(w[c])
                for i, (a, b) in enumerate(zip(gv, wv)):
                    import pandas as pd
                    def _null(x):
                        try:
                            return x is None or bool(pd.isna(x))
                        except (TypeError, ValueError):
                            return False
                    va = None if _null(a) else a
                    vb = None if _null(b) else b
                    try:
                        ok = (va is None and vb is None) or va == vb
                    except Exception:
                        ok = str(va) == str(vb)
                    if not ok:
                        bad.append((c, i, a, b))
                        if len(bad) >= 3:
                            break
                if len(bad) >= 3:
                    break
            if bad:
                print(f"FAIL {name}: value diffs {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
