"""Standalone A/B of batched Cholesky implementations at refresh shapes.

The sampler's once-per-step exact refresh is one batched (2*chains, N, N)
Cholesky; at N=1024 it is ~55 ms of the ~71 ms step (results/ab_r3/
scanstruct.txt).  Measures IN-GRAPH (a lax.scan of chained factorizations
with a scalar carry) so per-call dispatch and output materialization don't
pollute the numbers.  Directional only: the full-bench A/B decides
(CLAUDE.md measurement discipline).
"""

import json
import time

import jax
import jax.numpy as jnp

from bark_tpu.ops.linalg import blocked_cholesky

STEPS = 20


def make_scan(chol, K):
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)

    @jax.jit
    def run(K0):
        # K0 is a traced argument (not a closed-over constant) and each
        # iteration's input depends on the previous carry, so XLA cannot
        # constant-fold or hoist any factorization out of the chain.
        def body(carry, i):
            L = chol(K0 + (carry * 0.0 + 1e-7 * i) * eye)
            s = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
            return s, ()

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS, dtype=K0.dtype))
        return s

    return run


def timeit(run, K):
    jax.block_until_ready(run(K))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(K))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for batch, n in [(128, 1024), (128, 512), (128, 256)]:
        a = jax.random.normal(key, (batch, n, 24), jnp.float32)
        K = a @ a.mT / 24.0 + 0.5 * jnp.eye(n, dtype=jnp.float32)

        impls = {"xla": jnp.linalg.cholesky}
        for block in (128, 256):
            if n > block:
                impls[f"blocked{block}"] = (
                    lambda x, b=block: blocked_cholesky(x, block=b)
                )
        for name, chol in impls.items():
            t = timeit(make_scan(chol, K), K)
            print(
                json.dumps(
                    {"impl": name, "batch": batch, "n": n,
                     "ms_per_chol": round(t, 3)}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
