"""Full-bench A/B: blocked vs XLA Cholesky in the once-per-step refresh.

One process, back-to-back (CLAUDE.md measurement discipline: only the full
bench decides). chol_block=0 is the round-2 behavior; >0 routes the refresh
factorization through ops/linalg.blocked_cholesky.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

# NOTE (r4): refresh_style pinned to "pair" for the chol rows — the
# "auto" default now resolves to the leaf refresh at N >= 512, which
# never calls the chol path these A/Bs exercise.
CONFIGS = [
    # N=1024: the point below target (863 @ r3 baseline). Default scan
    # (auto->lowrank, refresh pair) vs blocked refresh, both scan styles.
    (1024, {"refresh_style": "pair", "chol_block": 0}),
    (1024, {"refresh_style": "pair", "chol_block": 256}),
    (1024, {"refresh_style": "pair", "chol_block": 128}),
    (1024, {"scan_style": "coeff", "refresh_style": "factor",
            "chol_block": 0}),
    (1024, {"scan_style": "coeff", "refresh_style": "factor",
            "chol_block": 256}),
    # N=512: current 1936 (lowrank); does the blocked refresh lift it too?
    (512, {"refresh_style": "pair", "chol_block": 0}),
    (512, {"refresh_style": "pair", "chol_block": 256}),
    (512, {"scan_style": "coeff", "refresh_style": "factor",
           "chol_block": 256}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    r["n_train"] = n_train
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_cholblock.json", "w") as fh:
    json.dump(results, fh)
