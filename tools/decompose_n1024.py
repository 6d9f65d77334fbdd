"""Decompose the N=1024 step cost + probe chain-count scaling.

Same affine-in-m protocol as decompose_n512.py, plus a num_chains sweep at
m=50: if the step is latency-bound (not throughput-bound) at N=1024, more
vmapped chains per chip raise steps/s/chip nearly for free — the honest
lever for the BENCH curve's large-N points (north-star metric is
steps/s/chip; chains-per-chip is the design thesis, CLAUDE.md).
One process, JSON lines.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

out = []
for m in (50, 25, 12):
    r = measure(n_train=1024, num_trees=m)
    ms = 1000.0 / (r["value"] / 64.0)
    rec = {"num_trees": m, "num_chains": 64, "steps_per_s": r["value"],
           "ms_per_vmapped_step": round(ms, 2)}
    print(json.dumps(rec), flush=True)
    out.append(rec)

pts = [(r["num_trees"], r["ms_per_vmapped_step"]) for r in out]
n = len(pts)
sm = sum(p[0] for p in pts); st = sum(p[1] for p in pts)
smm = sum(p[0]*p[0] for p in pts); smt = sum(p[0]*p[1] for p in pts)
per_move = (n*smt - sm*st) / (n*smm - sm*sm)
fixed = st/n - per_move*sm/n
print(json.dumps({"fixed_ms": round(fixed, 2), "per_move_ms": round(per_move, 3),
                  "fixed_frac_at_m50": round(fixed/(fixed+50*per_move), 3)}), flush=True)

for chains in (128, 256):
    r = measure(n_train=1024, num_chains=chains)
    rec = {"num_trees": 50, "num_chains": chains, "steps_per_s": r["value"]}
    print(json.dumps(rec), flush=True)
    out.append(rec)

with open("/tmp/decompose_n1024.json", "w") as fh:
    json.dump(out, fh)
