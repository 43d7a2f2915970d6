#!/usr/bin/env python3
"""sf0.5 oracle spot-sweep (round-9 verdict item #5, widened to ~40
keys in round 10 per verdict item #7).

Runs the selected ORACLE queries' DuckDB SQL against the generated
sf0.5 tables (graft.tools.GenData — real key growth, not replication),
compares against the Spark dumps from `graft.Verify <sf05> <out> <keys>`,
and writes CORRECTNESS_SF05_r{N}.json with per-query match + both
engines' wall seconds. Queries run cheapest-expected-first so the
all-pairs naive oracles (jaccard/edit/ER) overlap the rest of the round
and a wall-clock cutoff loses only them.

usage: python3 sf05_oracle_sweep.py <sf05_dir> <spark_out_dir> <result_json>
"""
import duckdb, json, sys, time, glob, os
import pandas as pd
import numpy as np

sf, out, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
# cheap/linear oracles first; the deliberately-naive all-pairs oracles
# (quadratic BY DESIGN — the engine's prefix-filter/deletion-variant
# plans are the point) run last so a wall-clock cutoff loses only them
ORDER = [
    # r10 widening: behavioral / profiling / temporal / search /
    # federation families that had never seen a real SF bump
    "q_rfm_segments", "q_attribution", "q_ltv_cohort", "q_order_gaps",
    "q_growth_accounting", "q_stickiness", "q_power_users",
    "q_churn_labels", "q_retention", "q_funnel_windowed",
    "q_markov_transitions", "q_ab_lift",
    "q_fd_audit", "q_ind_audit", "q_key_profile",
    "q_interval_coalesce", "q_peak_concurrency", "q_session_paths",
    "q_bm25", "q_phrase_search", "q_phrase_native",
    "q_quality_tiers", "q_gopher_rules", "q_hybrid_rrf",
    "q_federated_quantiles", "q_federated_topk",
    # the r9 set
    # r11 widening: the suffix-ranking dedup family
    "q_suffix_spans", "q_span_clip", "q_span_classes", "q_span_clip_inc",
    "q_dsir_select", "q_dup_spans", "q_winnow_candidates",
    "q_containment_join", "q_split_leakage", "q_basket_rules",
    "q_degree_hist", "q_clustering_coeff", "q_triangle_count",
    "q_pagerank_panel", "q_ann_bruteforce", "q_blast_radius",
    "q_entity_resolution", "q_edit_join", "q_jaccard_prefix",
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
# resumable: completed matching entries from a prior run are kept
# (pass RERUN=q1,q2 to force specific keys)
results = {}
if os.path.exists(result_path):
    results = json.load(open(result_path)).get("results", {})
rerun = set(os.environ.get("RERUN", "").split(",")) - {""}
for name in ORDER:
    if name in results and name not in rerun \
            and results[name].get("match") is True:
        print(f"[sf05] {name}: kept from prior run", flush=True)
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
    print(f"[sf05] {name}: {row}", flush=True)
    json.dump({"sf_dir": sf, "mult_vs_sf01": 5, "results": results},
              open(result_path, "w"), indent=1)
print("[sf05] sweep complete", flush=True)
