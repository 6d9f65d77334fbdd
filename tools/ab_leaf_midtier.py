"""Full-bench A/B: can the leaf refresh take the 256-511 tier?

VERDICT r5 context: the 256-511 lowrank tier's move scan seeds its carry
from an explicit K^-1 (refresh_style="onesolve" builds it), which on TPU
loses cond^2-scaled accuracy at low noise (results/ab_r4/leaf_numerics.md
finding 1 measured 58 nats at N=512, nu=0.011). The leaf refresh + coeff
scan never build an inverse at any point. If leaf also WINS (or ties) the
full bench at N=256/384, the auto threshold moves down to 256 and the
dense lowrank tier's low-noise exposure disappears along with it.

CLAUDE.md rule: back-to-back full-bench A/B in ONE process on a QUIET
host decides. Writes results/ab_r5/ab_leaf_midtier.jsonl.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import measure  # noqa: E402

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "results" / "ab_r5" / "ab_leaf_midtier.jsonl"
)
OUT.parent.mkdir(parents=True, exist_ok=True)

CONFIGS = [
    # N=256: shipped tier (auto -> onesolve + lowrank) vs leaf
    (256, {}),
    (256, {"scan_style": "coeff", "refresh_style": "leaf"}),
    # N=384: shipped tier vs leaf
    (384, {}),
    (384, {"scan_style": "coeff", "refresh_style": "leaf"}),
    # repeat the winners' shapes once to expose run-to-run noise
    (256, {"run": 2}),
    (256, {"scan_style": "coeff", "refresh_style": "leaf", "run": 2}),
    (384, {"run": 2}),
    (384, {"scan_style": "coeff", "refresh_style": "leaf", "run": 2}),
]

with open(OUT, "w") as fh:
    for n_train, kw in CONFIGS:
        tag = {k: v for k, v in kw.items() if k != "run"}
        r = measure(n_train=n_train, **tag)
        r.update(kw)
        print(json.dumps(r), flush=True)
        fh.write(json.dumps(r) + "\n")
        fh.flush()
