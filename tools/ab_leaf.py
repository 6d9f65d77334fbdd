"""Full-bench A/B: leaf-space (N-free) refresh vs the dense refresh.

CLAUDE.md rule: only back-to-back A/B of the full bench in ONE process
decides. Sweeps the leaf_budget R at N=1024/512 against the measured-best
dense configurations (coeff+chol_block=0 and the default auto path).
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

CONFIGS = [
    # N=1024: dense baselines (recorded r3: default 839, coeff 863).
    # refresh_style pinned: since r4, "auto" resolves to the leaf refresh
    # at N >= 512 — un-pinned rows would measure leaf against itself.
    (1024, {"refresh_style": "pair"}),
    (1024, {"scan_style": "coeff", "refresh_style": "pair"}),
    # leaf refresh, budget sweep (auto = 384 at m=50)
    (1024, {"scan_style": "coeff", "refresh_style": "leaf"}),
    (1024, {"scan_style": "coeff", "refresh_style": "leaf",
            "leaf_budget": 256}),
    (1024, {"scan_style": "coeff", "refresh_style": "leaf",
            "leaf_budget": 512}),
    # N=512: dense baseline (recorded r3: 1935)
    (512, {"refresh_style": "pair"}),
    (512, {"scan_style": "coeff", "refresh_style": "leaf"}),
    (512, {"scan_style": "coeff", "refresh_style": "leaf",
           "leaf_budget": 256}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_leaf.json", "w") as fh:
    json.dump(results, fh)
