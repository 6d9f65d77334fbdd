"""Headline benchmark: forest-MCMC steps/s/chip on TreeFunction.

The north-star metric from BASELINE.json: full BARK MCMC steps (m=50 tree
moves + 1 noise/scale move per step, N=50 training points) per second per
chip, chains vmapped on-chip. Target: >= 1000 steps/s/chip.

Default mode prints ONE JSON line:
  {"metric": "forest_mcmc_steps_per_s_per_chip", "value": N, "unit":
   "steps/s/chip", "vs_baseline": N}

``vs_baseline`` is the ratio against the 1000 steps/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own; its Numba
sampler runs chains serially on CPU).

``--curve`` mode (VERDICT r1 #10, extended to N=1024 per VERDICT r2 #2)
sweeps N in {50, 200, 512, 1024} plus a mixed-categorical variant (2 of 5
features categorical with 5 levels, matching BASELINE config #4's flavor)
and prints one JSON array — so perf judging sees where the O(N^2) kernel
refresh starts to bite, not a single point. Use ``--out FILE`` to also
write the array to disk (BENCH_CURVE_r{N}.json artifacts).
"""

from __future__ import annotations

import argparse
import json
import time


def measure(n_train: int, cat_dim: int = 0, num_chains: int = 64,
            steps_per_call: int = 50, n_calls: int = 5,
            **sampler_overrides) -> dict:
    """Steady-state full-MCMC steps/s/chip at one (N, domain) configuration.

    Two untimed calls first: one to compile + mix the trees from the empty
    forest, one on the warm state to compile the steady-state shapes; the
    timed region then measures ``n_calls`` async-dispatched sampler calls
    with a single trailing block_until_ready (CLAUDE.md: standalone jit
    timings on TPU are floored by ~0.4 ms dispatch latency).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bark_tpu.benchmarks.tree_function import TreeFunction
    from bark_tpu.fitting.params import SamplerParams
    from bark_tpu.fitting.sampler import BARKModel, run_bark_sampler
    from bark_tpu.forest import create_empty_forest

    cont_dim = 5 - cat_dim
    bench = TreeFunction(dim=cont_dim, cat_dim=cat_dim, num_cat=5, m=50,
                         function_seed=1)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(n_train, rng)
    y = bench.f(X)
    y_std = (y - y.mean()) / y.std()

    sampler_overrides.setdefault("num_trees", 50)
    params = SamplerParams(
        warmup_steps=0,
        num_samples=10,
        steps_per_sample=steps_per_call // 10,
        num_chains=num_chains,
        **sampler_overrides,
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

    def run(m, key):
        return run_bark_sampler(key, m, Xj, yj, bounds, ft, params)

    # compile + warm the trees (so the timed region is steady-state mixing)
    samples = jax.block_until_ready(run(model, jax.random.key(0)))
    warm_model = BARKModel(
        forest=jax.tree.map(lambda a: a[:, -1], samples.forest),
        noise=samples.noise[:, -1],
        scale=samples.scale[:, -1],
    )
    jax.block_until_ready(run(warm_model, jax.random.key(1)))

    t0 = time.perf_counter()
    for i in range(n_calls):
        out = run(warm_model, jax.random.key(2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_steps = n_calls * num_chains * steps_per_call
    steps_per_s = total_steps / dt

    target = 1000.0  # north-star steps/s/chip (BASELINE.md)
    return {
        "metric": "forest_mcmc_steps_per_s_per_chip",
        "value": round(steps_per_s, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_s / target, 3),
        "n_train": n_train,
        "cat_dim": cat_dim,
        "num_chains": num_chains,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--curve", action="store_true",
                        help="sweep N in {50,200,512,1024} + mixed-cat")
    parser.add_argument("--curve-xl", action="store_true",
                        help="also sweep N in {2048,4096} (leaf refresh)")
    parser.add_argument("--out", default=None,
                        help="also write the result JSON to this file")
    args = parser.parse_args()

    if args.curve or args.curve_xl:
        configs = [
            {"n_train": 50, "cat_dim": 0},
            {"n_train": 200, "cat_dim": 0},
            {"n_train": 512, "cat_dim": 0},
            {"n_train": 1024, "cat_dim": 0},
            {"n_train": 50, "cat_dim": 2},  # mixed-categorical variant
        ]
        if args.curve_xl:
            # past the former dense wall — served by the leaf-space
            # refresh (r4: 1530 / 1017 steps/s/chip measured; r5 extends
            # the measured frontier to 8192, VERDICT r4 weak #6)
            configs += [
                {"n_train": 2048, "cat_dim": 0},
                {"n_train": 4096, "cat_dim": 0},
                {"n_train": 8192, "cat_dim": 0},
            ]
        results = [measure(**c) for c in configs]
        payload = json.dumps(results)
    else:
        res = measure(n_train=50)
        # driver contract: ONE JSON line with exactly these keys
        payload = json.dumps(
            {k: res[k] for k in ("metric", "value", "unit", "vs_baseline")}
        )
    print(payload)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(payload + "\n")


if __name__ == "__main__":
    main()
