"""Full-bench A/B: rank1 move-scan ``unroll`` factor (VERDICT r3 #2).

One process, back-to-back (CLAUDE.md measurement discipline). Sweeps
unroll at N=512 (the margin point) and N=50 (guard the small-N headline),
plus an N=1024 probe at the winner-agnostic default for curve extension.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

CONFIGS = [
    (512, {"scan_unroll": 1}),
    (512, {"scan_unroll": 2}),
    (512, {"scan_unroll": 5}),
    (512, {"scan_unroll": 10}),
    (50, {"scan_unroll": 1}),
    (50, {"scan_unroll": 5}),
    (50, {"scan_unroll": 10}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    r["n_train"] = n_train
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_unroll.json", "w") as fh:
    json.dump(results, fh)
