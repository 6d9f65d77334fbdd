"""Chain-scaling efficiency report over a device mesh.

Measures sampler throughput (full MCMC steps/s) at 1, 2, 4, ... devices with
a fixed per-device chain count (weak scaling) and reports efficiency vs the
single-device rate — the BASELINE.md >=80% multi-host scaling-efficiency
metric, runnable on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) or a real TPU slice.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/scaling_report.py --platform cpu
"""

from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import jax


def main(platform: str | None, chains_per_device: int, num_steps: int):
    if platform:
        jax.config.update("jax_platforms", platform)

    import jax.numpy as jnp
    import numpy as np

    from bark_tpu.benchmarks import map_benchmark
    from bark_tpu.fitting.params import SamplerParams
    from bark_tpu.fitting.sampler import BARKModel
    from bark_tpu.forest import create_empty_forest
    from bark_tpu.parallel.sharding import chain_mesh, shard_model, sharded_run_sampler

    bench = map_benchmark("TreeFunction", dim=5, m=50, function_seed=1)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(50, rng)
    y = bench.f(X)
    y = (y - y.mean()) / y.std()
    Xj, yj = jnp.asarray(X), jnp.asarray(y, jnp.float32)
    bounds = jnp.asarray(bench.domain.bounds("bitmask"))
    ft = jnp.asarray(bench.domain.feature_types())

    n_avail = len(jax.devices())
    device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    params = SamplerParams(
        warmup_steps=0,
        num_samples=num_steps,
        steps_per_sample=1,
        num_trees=50,
    )

    results = []
    base_rate = None
    for n_dev in device_counts:
        num_chains = chains_per_device * n_dev
        mesh = chain_mesh(n_dev)
        forest = create_empty_forest(
            params.num_trees, params.node_limit, batch_shape=(num_chains,)
        )
        model = shard_model(
            BARKModel(
                forest,
                jnp.full((num_chains,), 0.1, jnp.float32),
                jnp.ones((num_chains,), jnp.float32),
            ),
            mesh,
        )
        # compile + warm
        out = sharded_run_sampler(
            jax.random.key(0), model, Xj, yj, bounds, ft, params, mesh
        )
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = sharded_run_sampler(
            jax.random.key(1), model, Xj, yj, bounds, ft, params, mesh
        )
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = num_chains * num_steps / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results.append(
            {
                "devices": n_dev,
                "chains": num_chains,
                "steps_per_s": round(rate, 1),
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None)
    parser.add_argument("--chains-per-device", type=int, default=8)
    parser.add_argument("--num-steps", type=int, default=20)
    parser.add_argument("--out", default=None, help="write results JSON here")
    parser.add_argument(
        "--note", default="", help="free-text provenance note stored in --out"
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="initialize jax.distributed from env (multi-host runs)",
    )
    args = parser.parse_args()
    if args.distributed:
        from bark_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()
    results = main(args.platform, args.chains_per_device, args.num_steps)
    if args.out:
        payload = {
            "note": args.note,
            "platform": args.platform or "default",
            "chains_per_device": args.chains_per_device,
            "num_steps": args.num_steps,
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
