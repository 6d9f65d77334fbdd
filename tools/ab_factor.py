"""Full-bench A/B: factor refresh + route_forest_select init + de-nested
run_chain (round-3 scan-structure findings).

One process, back-to-back. The route/DCE fixes are unconditional, so every
config here reflects them; the factor-vs-batched refresh and coeff-vs-
lowrank scan remain parameterized.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

CONFIGS = [
    (1024, {"scan_style": "coeff", "refresh_style": "factor"}),
    (1024, {"scan_style": "coeff"}),
    (512, {"scan_style": "coeff", "refresh_style": "factor"}),
    (512, {"scan_style": "lowrank"}),
    (200, {"scan_style": "coeff", "refresh_style": "factor"}),
    (200, {"scan_style": "lowrank"}),
    (50, {"scan_style": "coeff", "refresh_style": "factor"}),
    (50, {"scan_style": "plain"}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    r["n_train"] = n_train
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_factor.json", "w") as fh:
    json.dump(results, fh)
