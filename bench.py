"""Headline benchmark: forest-MCMC steps/s/chip on TreeFunction.

The north-star metric from BASELINE.json: full BARK MCMC steps (m=50 tree
moves + 1 noise/scale move per step, N=50 training points) per second per
chip, chains vmapped on-chip. Target: >= 1000 steps/s/chip.

Prints ONE JSON line:
  {"metric": "forest_mcmc_steps_per_s_per_chip", "value": N, "unit":
   "steps/s/chip", "vs_baseline": N}

``vs_baseline`` is the ratio against the 1000 steps/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own; its Numba
sampler runs chains serially on CPU).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bark_tpu.benchmarks.tree_function import TreeFunction
    from bark_tpu.fitting.params import SamplerParams
    from bark_tpu.fitting.sampler import BARKModel, run_bark_sampler
    from bark_tpu.forest import create_empty_forest

    # BASELINE.json config #1 scale: TreeFunction, ~50 points, m=50 trees
    n_train = 50
    num_chains = 64
    steps_per_call = 50  # warmup 0, 10 samples x 5 steps

    bench = TreeFunction(dim=5, m=50, function_seed=1)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(n_train, rng)
    y = bench.f(X)
    y_std = (y - y.mean()) / y.std()

    params = SamplerParams(
        warmup_steps=0,
        num_samples=10,
        steps_per_sample=5,
        num_chains=num_chains,
        num_trees=50,
    )
    bounds = jnp.asarray(bench.domain.bounds("bitmask"))
    ft = jnp.asarray(bench.domain.feature_types())
    forest = create_empty_forest(
        params.num_trees, params.node_limit, batch_shape=(num_chains,)
    )
    model = BARKModel(
        forest,
        jnp.full((num_chains,), 0.1, jnp.float32),
        jnp.ones((num_chains,), jnp.float32),
    )
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y_std, jnp.float32)

    def run(key):
        return run_bark_sampler(key, model, Xj, yj, bounds, ft, params)

    # compile + warm the trees (so the timed region is steady-state mixing)
    samples = jax.block_until_ready(run(jax.random.key(0)))
    warm_model = BARKModel(
        forest=jax.tree.map(lambda a: a[:, -1], samples.forest),
        noise=samples.noise[:, -1],
        scale=samples.scale[:, -1],
    )

    def run_warm(key):
        return run_bark_sampler(key, warm_model, Xj, yj, bounds, ft, params)

    jax.block_until_ready(run_warm(jax.random.key(1)))

    n_calls = 5
    t0 = time.perf_counter()
    for i in range(n_calls):
        out = run_warm(jax.random.key(2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_steps = n_calls * num_chains * steps_per_call
    steps_per_s = total_steps / dt

    target = 1000.0  # north-star steps/s/chip (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "forest_mcmc_steps_per_s_per_chip",
                "value": round(steps_per_s, 2),
                "unit": "steps/s/chip",
                "vs_baseline": round(steps_per_s / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
