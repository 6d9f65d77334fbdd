"""Decompose the N=512 step cost: per-move scan cost vs fixed residue.

Sweeps m (num_trees) at N=512 with the default (auto->lowrank) lowering.
Step time is affine in m: t(m) = fixed + m * per_move, where `fixed` is the
once-per-step exact refresh + noise/scale move + merge, and `per_move`
covers the proposal batch + the move scan. The fit tells round 3 where the
next N=512 win lives. One process, prints JSON lines.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

points = []
for m in (50, 25, 12):
    r = measure(n_train=512, num_trees=m)
    ms_per_step = 1000.0 / (r["value"] / 64.0)  # 64 vmapped chains
    rec = {"num_trees": m, "steps_per_s": r["value"],
           "ms_per_vmapped_step": round(ms_per_step, 2)}
    print(json.dumps(rec), flush=True)
    points.append((m, ms_per_step))

# least-squares affine fit t = fixed + m * per_move
n = len(points)
sm = sum(p[0] for p in points)
st = sum(p[1] for p in points)
smm = sum(p[0] * p[0] for p in points)
smt = sum(p[0] * p[1] for p in points)
per_move = (n * smt - sm * st) / (n * smm - sm * sm)
fixed = (st - per_move * sm) / n
print(json.dumps({"fixed_ms": round(fixed, 2),
                  "per_move_ms": round(per_move, 3),
                  "fixed_frac_at_m50": round(fixed / (fixed + 50 * per_move), 3)}))
