#!/usr/bin/env python3
"""All-surface sf0.1 oracle sweep: every oracleSql key's DuckDB result
compared against the Spark dumps from `graft.Verify /root/testdata/sf0.1
<out>` -> CORRECTNESS_SF01_r{N}.json ({key: {rows_spark, rows_oracle,
match, duckdb_sec}}).

usage: python3 sf01_oracle_sweep.py <sf01_dir> <spark_out_dir> <result_json>
Resumable: existing matching entries are kept; RERUN=q1,q2 forces keys.
"""
import duckdb, json, sys, time, os
import pandas as pd
import numpy as np

sf, out, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

oracles = json.load(open(f"{out}/oracle_sql.json"))
results = {}
if os.path.exists(result_path):
    results = json.load(open(result_path))
rerun = set(os.environ.get("RERUN", "").split(",")) - {""}
for name in sorted(oracles):
    if name in results and name not in rerun \
            and results[name].get("match") is True:
        continue
    t0 = time.time()
    row = {}
    try:
        d = canon(con.execute(oracles[name]).fetchdf())
        row["duckdb_sec"] = round(time.time() - t0, 1)
        s = canon(pd.read_parquet(f"{out}/{name}"))
        ok = list(s.columns) == list(d.columns) and len(s) == len(d)
        if ok:
            for c in s.columns:
                a, b = s[c], d[c]
                eq = (np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
                      if (a.dtype.kind == "f" or b.dtype.kind == "f") else
                      ((a.astype(object).where(pd.notna(a), None)
                        == b.astype(object).where(pd.notna(b), None))
                       | (pd.isna(a) & pd.isna(b))))
                if not eq.all():
                    ok = False
                    break
        row.update(rows_spark=int(len(s)), rows_oracle=int(len(d)),
                   match=bool(ok))
    except Exception as e:
        row.update(match=False, error=str(e)[:300],
                   duckdb_sec=round(time.time() - t0, 1))
    results[name] = row
    print(f"[sf01] {name}: {row}", flush=True)
    json.dump(results, open(result_path, "w"), indent=1)
n_ok = sum(1 for v in results.values() if v.get("match") is True)
print(f"[sf01] sweep complete: {n_ok}/{len(results)} match", flush=True)
