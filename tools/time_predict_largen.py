"""Time large-N posterior prediction on the TPU: dense vs CG vs leaf.

The r2 CG numbers (4 samples x 64 candidates): 0.59 / 2.6 / 11.4 s at
N = 2048 / 8192 / 32768. The r4 exact leaf-space path should beat them
at identical scaling (one (r, r) Cholesky per sample, no iterations).
Writes results/acq_lr/predict_latency.json. Warm timings (second call).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.benchmarks.tree_function import TreeFunction
from bark_tpu.fitting.prior import sample_forest_prior
from bark_tpu.models.gp import (
    forest_predict,
    forest_predict_cg,
    forest_predict_leaf,
)

OUT = pathlib.Path(__file__).resolve().parent.parent / "results" / "acq_lr"


def main():
    bench = TreeFunction(dim=5, m=50, function_seed=1)
    dom = bench.domain
    ft = jnp.asarray(dom.feature_types())
    bounds = jnp.asarray(dom.bounds("bitmask"))
    forest = sample_forest_prior(
        jax.random.key(0), 50, bounds, ft, num_samples=4
    )
    noise = jnp.full((4,), 0.1)
    scale = jnp.ones((4,))
    rng = np.random.default_rng(0)
    C = jnp.asarray(dom.sample(64, rng))

    fns = {"dense": forest_predict, "cg": forest_predict_cg,
           "leaf": forest_predict_leaf}
    rows = []
    for n in (2048, 8192, 32768):
        X = jnp.asarray(dom.sample(n, rng))
        y = jnp.asarray(bench.f(np.asarray(X)))
        for name, fn in fns.items():
            if name == "dense" and n > 2048:
                continue  # S x N x N memory wall
            out = fn(forest, noise, scale, X, y, C, ft)
            jax.block_until_ready(out)  # compile + warm
            t0 = time.perf_counter()
            out = fn(forest, noise, scale, X, y, C, ft)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            rows.append({"n": n, "backend": name, "warm_s": round(dt, 3)})
            print(json.dumps(rows[-1]), flush=True)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "predict_latency.json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
