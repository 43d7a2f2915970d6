#!/usr/bin/env python3
"""Compare a bench artifact against the frozen quiet-machine baseline
(round-11 verdict item #8): per-key medians vs BENCH_BASELINE.json
with a noise band, so round-over-round adjudication stops depending on
same-day host conditions.

usage: python3 bench_vs_baseline.py <bench.json> [baseline.json] [band]
  band defaults to 0.30 (+-30% — the measured swing of this host's
  wall-times with background load; see SURVEY gates r9/r10).

Prints keys outside the band (slower AND faster), keys present in only
one artifact, and the common-key median-sum ratio. Exit code 0 always —
this is an adjudication aid, not a gate by itself: a key outside the
band still needs a quiet solo replay before being believed (the r9/r10
lesson), and the load_avg fields of both artifacts are printed first
for exactly that judgment.
"""
import json, sys

bench_path = sys.argv[1]
base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30

cur = json.load(open(bench_path))
base = json.load(open(base_path))
print(f"baseline: load {base.get('load_avg_start')}->{base.get('load_avg_end')}"
      f" reps={base.get('reps')} n={base.get('n_queries')}")
print(f"current : load {cur.get('load_avg_start')}->{cur.get('load_avg_end')}"
      f" reps={cur.get('reps')} n={cur.get('n_queries')}")
b, c = base["queries"], cur["queries"]
common = sorted(set(b) & set(c))
only_base, only_cur = sorted(set(b) - set(c)), sorted(set(c) - set(b))
slower, faster = [], []
for k in common:
    if b[k] <= 0 or c[k] <= 0:
        print(f"  FAILED-REP sentinel: {k} base={b[k]} cur={c[k]}")
        continue
    r = c[k] / b[k]
    if r > 1 + band:
        slower.append((r, k))
    elif r < 1 - band:
        faster.append((r, k))
# the sum ratio compares the SAME key set on both sides: a key with a
# failed-rep sentinel (<= 0) on EITHER side drops from both sums, so a
# crash in one artifact cannot deflate/inflate the headline ratio
ok = [k for k in common if b[k] > 0 and c[k] > 0]
print(f"\ncommon keys: {len(common)} ({len(ok)} timed on both sides)  "
      f"sum ratio: {sum(c[k] for k in ok) / sum(b[k] for k in ok):.3f}")
for r, k in sorted(slower, reverse=True):
    print(f"  SLOWER {r:5.2f}x  {k}  base={b[k]:.2f}s cur={c[k]:.2f}s")
for r, k in sorted(faster):
    print(f"  faster {r:5.2f}x  {k}  base={b[k]:.2f}s cur={c[k]:.2f}s")
if only_base:
    print("only in baseline:", ", ".join(only_base))
if only_cur:
    print("new keys (not in baseline):", ", ".join(only_cur))
