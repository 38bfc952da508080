#!/usr/bin/env python3
"""Dev-only harness: emulate the driver's correctness gate locally.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<query> parquet (Spark result) and runs the matching SQL from
<out>/oracle_sql.json in DuckDB over the sfDir parquet tables; compares
rowcount / columns / values (exact, after sorting columns by name).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            results[name] = f"rows_only ({len(got)} rows)"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            results[name] = f"COLS got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        diffs = []
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                if g.dtype != e.dtype:
                    # normalize (e.g. int32 vs int64, us vs ns timestamps)
                    if str(g.dtype).startswith("datetime") or str(e.dtype).startswith("datetime"):
                        g = pd.to_datetime(g); e = pd.to_datetime(e)
                        diffs.append(f"{c}: dtype {got[c].dtype} vs {exp[c].dtype}")
                    else:
                        diffs.append(f"{c}: dtype {got[c].dtype} vs {exp[c].dtype}")
                ok = g.reset_index(drop=True).equals(e.reset_index(drop=True))
                if not ok:
                    # arrays/objects: elementwise
                    if g.dtype == object:
                        neq = sum(1 for a, b in zip(g, e) if not np.array_equal(a, b))
                        if neq: diffs.append(f"{c}: {neq} object mismatches")
                    else:
                        ga, ea = g.to_numpy(), e.to_numpy()
                        if np.issubdtype(ga.dtype, np.floating):
                            neq = int((~((ga == ea) | (np.isnan(ga) & np.isnan(ea)))).sum())
                            if neq:
                                mx = np.nanmax(np.abs(ga - ea))
                                diffs.append(f"{c}: {neq} float mismatches, maxdiff={mx:.3e}")
                        else:
                            neq = int((ga != ea).sum())
                            if neq: diffs.append(f"{c}: {neq} mismatches")
            except Exception as ex:
                diffs.append(f"{c}: compare error {ex}")
        results[name] = "OK" if not diffs else "DIFF " + "; ".join(diffs)
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows_only"))
    for n, v in sorted(results.items()):
        print(f"{n:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} OK-or-rows_only")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
