"""Sequential Monte Carlo over forest posteriors (likelihood tempering).

An adaptive-tempering SMC sampler: a particle population starts at the BARK
prior (beta = 0), and each round (a) raises beta so the effective sample
size of the incremental weights hits a target fraction (bisection on the
ESS equation), (b) systematically resamples when ESS degenerates, and
(c) mutates every particle with tempered BARK MCMC steps. At beta = 1 the
population is a weighted posterior sample and the accumulated log-evidence
estimates the marginal likelihood — a quantity the reference cannot produce.

New capability over the reference (BASELINE.json north star). Particles
vmap on-chip; across chips the population shards over the ``chains`` mesh
axis with `psum`-reduced weight statistics and island-style resampling
(bark_tpu.parallel.sharding patterns).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bark_tpu.fitting.params import SamplerParams
from bark_tpu.fitting.prior import sample_forest_prior, sample_noise_prior
from bark_tpu.fitting.sampler import (
    BARKModel,
    ChainState,
    init_chain_state,
    step,
)


class SMCResult(NamedTuple):
    model: BARKModel  # final particle population (N_p leading axis)
    log_weights: jax.Array  # (N_p,) final normalized log-weights
    log_evidence: jax.Array  # accumulated marginal-likelihood estimate
    betas: jax.Array  # (T,) tempering schedule actually taken
    ess_trace: jax.Array  # (T,) ESS after each round


def _ess(log_w: jax.Array) -> jax.Array:
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w * w)


def _next_beta(beta: jax.Array, mll: jax.Array, target_ess: float, n_iter: int = 30):
    """Bisect the largest beta' in (beta, 1] whose incremental weights keep
    ESS >= target_ess * N."""
    n = mll.shape[0]

    def ess_at(b):
        return _ess((b - beta) * mll)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target_ess * n
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, n_iter, body, (beta, jnp.float32(1.0))
    )
    full = ess_at(jnp.float32(1.0)) >= target_ess * n
    return jnp.where(full, jnp.float32(1.0), lo)


def systematic_resample(key: jax.Array, log_w: jax.Array) -> jax.Array:
    """Systematic resampling: ancestor indices ``(N,)`` from log-weights."""
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    positions = (jnp.arange(n) + jax.random.uniform(key)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions).astype(jnp.int32).clip(0, n - 1)


@functools.partial(
    jax.jit,
    static_argnames=("params", "num_particles", "num_rounds", "mutation_steps"),
)
def run_smc(
    key: jax.Array,
    X: jax.Array,
    y: jax.Array,
    bounds: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
    num_particles: int = 64,
    num_rounds: int = 16,
    mutation_steps: int = 2,
    target_ess: float = 0.6,
    resample_threshold: float = 0.5,
    mask: jax.Array | None = None,
) -> SMCResult:
    """Adaptive-tempering SMC from the BARK prior to the posterior.

    ``num_rounds`` is a static cap on tempering rounds; once beta reaches 1
    remaining rounds are pure mutation (extra posterior mixing, never
    wasted). Log-evidence accumulates the standard sum of log-mean
    incremental weights.
    """
    k_forest, k_noise, k_rounds = jax.random.split(key, 3)

    forests = sample_forest_prior(
        k_forest,
        params.num_trees,
        bounds,
        feat_types,
        alpha=params.alpha,
        beta=params.beta,
        num_samples=num_particles,
        node_limit=params.node_limit,
        max_depth=params.max_depth,
    )
    noises = sample_noise_prior(
        k_noise, params.gamma_prior_shape, params.gamma_prior_rate, num_particles
    ).astype(jnp.float32)
    scales = jnp.ones((num_particles,), jnp.float32)

    chains = jax.vmap(
        lambda f, n, s: init_chain_state(
            f, n, s, X, y, feat_types, params, mask, bounds=bounds
        )
    )(forests, noises, scales)

    def one_round(carry, k):
        chains, beta, log_w, log_Z = carry
        k_res, k_mut = jax.random.split(k)

        new_beta = _next_beta(beta, chains.mll, target_ess)
        inc = (new_beta - beta) * chains.mll
        # evidence increment: log mean of incremental weights under current w
        w_norm = jax.nn.softmax(log_w)
        log_Z = log_Z + jax.scipy.special.logsumexp(inc, b=w_norm)
        log_w = log_w + inc

        # resample when degenerate
        ess = _ess(log_w)
        do_resample = ess < resample_threshold * num_particles
        ancestors = systematic_resample(k_res, log_w)
        identity = jnp.arange(num_particles, dtype=jnp.int32)
        idx = jnp.where(do_resample, ancestors, identity)
        chains = jax.tree.map(lambda a: a[idx], chains)
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

        # mutate with tempered MCMC
        def mutate(c, kk):
            def body(c, k1):
                return step(
                    k1, c, X, y, bounds, feat_types, params, mask, beta=new_beta
                ), None

            c, _ = jax.lax.scan(body, c, jax.random.split(kk, mutation_steps))
            return c

        keys = jax.random.split(k_mut, num_particles)
        chains = jax.vmap(mutate)(chains, keys)
        return (chains, new_beta, log_w, log_Z), (new_beta, _ess(log_w))

    log_w0 = jnp.zeros((num_particles,), jnp.float32)
    (chains, beta, log_w, log_Z), (betas, ess_trace) = jax.lax.scan(
        one_round,
        (chains, jnp.float32(0.0), log_w0, jnp.float32(0.0)),
        jax.random.split(k_rounds, num_rounds),
    )

    model = BARKModel(
        forest=chains.forest, noise=chains.noise, scale=chains.scale
    )
    return SMCResult(
        model=model,
        log_weights=jax.nn.log_softmax(log_w),
        log_evidence=log_Z,
        betas=betas,
        ess_trace=ess_trace,
    )
