"""Full-bench A/B: scan_style "plain" vs hoisted-V0 "lowrank".

CLAUDE.md rule: only back-to-back A/B of the full bench in ONE process
decides (XLA fuses differently in the full program; isolated timings lie).
Runs both scan styles at each N in the bench curve and prints a JSON array.
"""

import json
import sys

sys.path.insert(0, ".")
from bench import measure  # noqa: E402

CONFIGS = [
    (512, {"scan_style": "plain"}),
    (512, {"scan_style": "lowrank"}),
    (512, {"scan_style": "lowrank", "refresh_style": "onesolve"}),
    (200, {"scan_style": "plain"}),
    (200, {"scan_style": "lowrank"}),
    (50, {"scan_style": "plain"}),
    (50, {"scan_style": "lowrank"}),
]

results = []
for n_train, kw in CONFIGS:
    r = measure(n_train=n_train, **kw)
    r.update(kw)
    print(json.dumps(r), flush=True)
    results.append(r)

with open("/tmp/ab_lowrank.json", "w") as fh:
    json.dump(results, fh)
