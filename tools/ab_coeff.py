"""Full-bench A/B: coefficient-space move scan + bf16 gram (round 3).

One process, back-to-back (CLAUDE.md discipline). Controls re-measured
in-process. Isolated variables: scan_style (lowrank vs coeff) and
gram_dtype (f32 vs bf16), at N in {1024, 512, 200, 50}.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

CONFIGS = [
    (1024, {"scan_style": "lowrank"}),
    (1024, {"scan_style": "coeff"}),
    (1024, {"scan_style": "coeff", "gram_dtype": "bf16"}),
    (1024, {"scan_style": "coeff", "gram_dtype": "bf16", "scan_unroll": 5}),
    (512, {"scan_style": "lowrank"}),
    (512, {"scan_style": "coeff"}),
    (512, {"scan_style": "coeff", "gram_dtype": "bf16"}),
    (512, {"scan_style": "coeff", "gram_dtype": "bf16", "scan_unroll": 5}),
    (200, {"scan_style": "lowrank"}),
    (200, {"scan_style": "coeff"}),
    (50, {"scan_style": "plain"}),
    (50, {"scan_style": "coeff"}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    r["n_train"] = n_train
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_coeff.json", "w") as fh:
    json.dump(results, fh)
