#!/usr/bin/env python3
"""sf1.0 oracle spot-sweep (round-11 verdict item #7): the first
REAL-growth check at 10x the sf0.1 driver data.

Runs the selected ORACLE queries' DuckDB SQL against the generated
sf1.0 tables (graft.tools.GenData mult=10 over /root/testdata/sf0.1 —
real key growth, not replication), compares against the Spark dumps
from `graft.Verify <sf10> <out> <keys>`, and writes
CORRECTNESS_SF10_r{N}.json with per-query match + both engines' wall
seconds. The deliberately-naive all-pairs oracles are SKIPPED at this
SF (q_entity_resolution read 5269 DuckDB-seconds at sf0.5;
q_jaccard_prefix 1739; q_triangle_count 730; q_edit_join 449 — the
verdict's "skip the multi-hundred-second naive oracles"); everything
else from the sf0.5 list runs, plus the TPC-H heavies and the suffix
family (q_suffix_spans + q_span_clip since r12 item #5, plus the new
q_span_classes / q_span_clip_inc index faces). Queries run
cheapest-expected-first so a wall-clock cutoff loses only the tail.

usage: python3 sf10_oracle_sweep.py <sf10_dir> <spark_out_dir> <result_json>
"""
import duckdb, json, sys, time, glob, os
import pandas as pd
import numpy as np

sf, out, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
ORDER = [
    # cheap linear oracles first
    "q_ab_lift", "q_federated_topk", "q_phrase_search", "q_phrase_native",
    "q_retention", "q_churn_labels", "q_power_users", "q_stickiness",
    "q_growth_accounting", "q_quality_tiers", "q_bm25",
    "q_funnel_windowed", "q_ltv_cohort", "q_rfm_segments",
    "q_hybrid_rrf", "q_interval_coalesce", "q_key_profile",
    "q_order_gaps", "q_federated_quantiles", "q_markov_transitions",
    "q_ind_audit", "q_dup_spans", "q_suffix_spans", "q_span_clip",
    "q_span_classes", "q_span_clip_inc", "q_dsir_select",
    "q_gopher_rules", "q_session_paths", "q_fd_audit",
    "q_pagerank_panel", "q_degree_hist", "q_attribution",
    "q_peak_concurrency", "q_basket_rules",
    # TPC-H heavies (linear oracles, big scans)
    "q1_pricing_agg", "q3_join_agg", "q5_multijoin", "q_window_rank",
    "q_topk_group", "q_sessionize",
    # heavier-but-bounded oracles last
    "q_winnow_candidates", "q_containment_join", "q_split_leakage",
    "q_blast_radius", "q_clustering_coeff", "q_ann_bruteforce",
]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    pat = p if os.path.isfile(p) else f"{p}/*.parquet"
    if glob.glob(pat) or os.path.isfile(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

oracles = json.load(open(f"{out}/oracle_sql.json"))
results = {}
if os.path.exists(result_path):
    results = json.load(open(result_path)).get("results", {})
rerun = set(os.environ.get("RERUN", "").split(",")) - {""}
for name in ORDER:
    if name in results and name not in rerun \
            and results[name].get("match") is True:
        print(f"[sf10] {name}: kept from prior run", flush=True)
        continue
    t0 = time.time()
    row = {"status": "ran"}
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
        row.update(status="error", error=str(e)[:300],
                   duckdb_sec=round(time.time() - t0, 1))
    results[name] = row
    print(f"[sf10] {name}: {row}", flush=True)
    json.dump({"sf_dir": sf, "mult_vs_sf01": 10, "results": results},
              open(result_path, "w"), indent=1)
print("[sf10] sweep complete", flush=True)
