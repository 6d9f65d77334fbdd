"""Full-bench A/B: Pallas blocked refresh Cholesky (ops/pallas_chol.py).

One process, back-to-back (CLAUDE.md measurement discipline). Baselines
from /tmp/ab_cholblock.log (same day, same harness): N=1024 default 839,
coeff+factor 854; N=512 default 1935.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

# NOTE (r4): refresh_style pinned to "pair" for the chol rows — the
# "auto" default now resolves to the leaf refresh at N >= 512, which
# never calls the chol path these A/Bs exercise.
CONFIGS = [
    (1024, {"refresh_style": "pair"}),  # auto: lowrank scan + pair refresh + pallas blk=64
    (1024, {"refresh_style": "pair", "chol_block": 128}),
    (1024, {"scan_style": "coeff", "refresh_style": "factor"}),
    (1024, {"scan_style": "coeff", "refresh_style": "factor",
            "chol_block": 128}),
    (512, {"refresh_style": "pair"}),
    (512, {"scan_style": "coeff", "refresh_style": "factor"}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    r["n_train"] = n_train
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_pallaschol.json", "w") as fh:
    json.dump(results, fh)
