"""Full-bench cost of the round-5 precision gates (post-fix defaults).

The r5 precision fix (results/ab_r5/precision_bug.md) runs the move
scan's hoisted quadratic forms and the refresh algebra at
matmul-precision "highest" on TPU. The gated products are hoisted/small
by construction (the big MXU ops — gram, indicator projection, routing
one-hots — stay at default precision, where they are bf16-exact), so
the expected cost is small; this records it against the r4/r5 curve
values measured pre-fix. Writes results/ab_r5/ab_precision.jsonl.
Run on a QUIET host.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import measure  # noqa: E402

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "results" / "ab_r5" / "ab_precision.jsonl"
)
OUT.parent.mkdir(parents=True, exist_ok=True)

# pre-fix comparison points (same configs, measured this round / r4):
#   N=50 7177-7217 (r4 headline/curve), N=256 3329, N=384 3152 (r5
#   mid-tier A/B), N=512 2981, N=1024 2457, N=4096 1017 (r4 curve)
CONFIGS = [50, 256, 384, 512, 1024, 4096]

with open(OUT, "w") as fh:
    for n in CONFIGS:
        r = measure(n_train=n)
        print(json.dumps(r), flush=True)
        fh.write(json.dumps(r) + "\n")
        fh.flush()
