"""Parallel tempering over forest posteriors.

A replica ladder runs the BARK transition kernel at inverse temperatures
1 = beta_0 > beta_1 > ... > beta_{R-1} (likelihood tempering), with
even-odd adjacent swap moves between rounds. Temperatures are exchanged
rather than states (the standard trick: states stay resident, the beta
*labels* move), so a swap is O(1) regardless of forest size. Samples are
emitted from whichever replica currently holds beta = 1.

This is a new capability over the reference (BASELINE.json north star) —
the reference has only plain MH chains. Replicas vmap on-chip; across chips
a ``replicas`` mesh axis exchanges (beta, mll) scalars with `ppermute`
(see ``sharded_pt_swap``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bark_tpu.fitting.params import SamplerParams
from bark_tpu.fitting.sampler import (
    BARKModel,
    ChainState,
    init_chain_state,
    step,
)
from bark_tpu.forest import Forest


class PTState(NamedTuple):
    chains: ChainState  # fields with leading (R,) replica axis
    betas: jax.Array  # (R,) inverse temperatures (a permutation of ladder)


def geometric_ladder(num_replicas: int, beta_min: float = 0.05) -> jax.Array:
    """Geometric inverse-temperature ladder from 1 down to beta_min."""
    if num_replicas == 1:
        return jnp.ones((1,), jnp.float32)
    return jnp.asarray(
        beta_min ** (jnp.arange(num_replicas) / (num_replicas - 1)), jnp.float32
    )


def swap_move(key: jax.Array, betas: jax.Array, mlls: jax.Array, parity: jax.Array):
    """Even-odd adjacent swap of temperatures (by ladder rank).

    Replicas are ranked by beta (descending); pairs (0,1),(2,3),... on even
    parity, (1,2),(3,4),... on odd. Accept a swap with probability
    min(1, exp((beta_i - beta_j) * (mll_j - mll_i))).
    """
    r = betas.shape[0]
    order = jnp.argsort(-betas)  # replica ids ranked hot->cold by beta rank
    ranked_betas = betas[order]
    ranked_mlls = mlls[order]

    idx = jnp.arange(r)
    is_left = (idx % 2) == (parity % 2)
    partner = jnp.where(is_left, idx + 1, idx - 1)
    valid = (partner >= 0) & (partner < r)
    partner = jnp.clip(partner, 0, r - 1)

    delta = (ranked_betas - ranked_betas[partner]) * (
        ranked_mlls[partner] - ranked_mlls
    )
    u = jax.random.uniform(key, (r,))
    # one draw per pair: the left member's uniform decides for both
    pair_u = jnp.where(is_left, u, u[partner])
    pair_delta = jnp.where(is_left, delta, delta[partner])
    accept = valid & (jnp.log(pair_u) <= jnp.minimum(pair_delta, 0.0))

    new_ranked_betas = jnp.where(accept, ranked_betas[partner], ranked_betas)
    # scatter back to replica ids
    return betas.at[order].set(new_ranked_betas)


@functools.partial(jax.jit, static_argnames=("params", "num_replicas", "num_steps"))
def run_parallel_tempering(
    key: jax.Array,
    forest: Forest,
    noise: jax.Array,
    scale: jax.Array,
    X: jax.Array,
    y: jax.Array,
    bounds: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
    num_replicas: int = 8,
    num_steps: int = 100,
    beta_min: float = 0.05,
    mask: jax.Array | None = None,
) -> tuple[BARKModel, jax.Array, jax.Array]:
    """Run one PT ladder; returns cold-chain samples + swap diagnostics.

    ``forest``/``noise``/``scale`` carry a leading (num_replicas,) axis.
    Returns (cold samples over steps, beta trace (T, R), mean swap rate).
    """
    chains = jax.vmap(
        lambda f, n, s: init_chain_state(
            f, n, s, X, y, feat_types, params, mask, bounds=bounds
        )
    )(forest, noise, scale)
    betas = geometric_ladder(num_replicas, beta_min)
    state = PTState(chains=chains, betas=betas)

    def one_round(carry, inputs):
        state, parity = carry
        k = inputs
        k_steps, k_swap = jax.random.split(k)
        keys = jax.random.split(k_steps, num_replicas)
        chains = jax.vmap(
            lambda kk, c, b: step(
                kk, c, X, y, bounds, feat_types, params, mask, beta=b
            )
        )(keys, state.chains, state.betas)

        old_betas = state.betas
        betas = swap_move(k_swap, state.betas, chains.mll, parity)
        swapped_frac = jnp.mean((betas != old_betas).astype(jnp.float32))

        # cold-chain sample: the replica currently holding beta == 1
        cold = jnp.argmax(betas)
        cold_sample = (
            jax.tree.map(lambda a: a[cold], chains.forest),
            chains.noise[cold],
            chains.scale[cold],
            chains.mll[cold],
        )
        return (PTState(chains, betas), parity + 1), (
            cold_sample,
            betas,
            swapped_frac,
        )

    keys = jax.random.split(key, num_steps)
    (state, _), (cold_samples, beta_trace, swap_frac) = jax.lax.scan(
        one_round, (state, jnp.int32(0)), keys
    )
    cold_forest, cold_noise, cold_scale, cold_mll = cold_samples
    samples = BARKModel(forest=cold_forest, noise=cold_noise, scale=cold_scale)
    return samples, beta_trace, jnp.mean(swap_frac)
