"""The BARK forest-MCMC transition kernel and multi-chain sampler.

Parity target: src/bark/fitting/bark_sampler.py:95-284. The reference's
Numba loop nest (chains -> steps -> m tree moves + one noise/scale move)
becomes one pure, fixed-shape function:

  ``step: (key, ChainState) -> ChainState``

scanned over steps and vmapped over chains. Each tree move proposes a
grow/prune/change edit, updates the maintained kernel inverse/logdet with two
rank-L Woodbury updates (remove the old tree's leaf vectors, add the new
ones; bark_sampler.py:233-264), and MH-accepts on the marginal-likelihood
ratio. The per-step noise/scale move rebuilds K from scratch — via Cholesky
here instead of ``np.linalg.inv`` (bark_sampler.py:266-282).

TPU-first design choices:
  - training-point leaf assignments ``(N, m)`` are carried in the chain state
    and updated incrementally, so only the *proposed* tree is ever re-routed;
  - leaf one-hot matrices are compacted to ``node_limit // 2`` columns (the
    maximum possible leaf count), halving the Woodbury small-matrix work;
  - all accept/reject logic is masked arithmetic — no host synchronization
    anywhere inside the scan;
  - chains vmap within a chip and shard over a mesh axis across chips (see
    bark_tpu.parallel), where the reference ran chains serially
    (``parallel=False``, bark_sampler.py:120).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bark_tpu.fitting.noise_scale import get_noise_scale_proposal
from bark_tpu.fitting.params import SamplerParams
from bark_tpu.fitting.proposals import propose_tree
from bark_tpu.fitting.traversal import terminal_mask
from bark_tpu.forest import Forest, gram_from_leaves, route_forest, route_tree
from bark_tpu.ops.linalg import (
    chol_inv_logdet,
    kernel_matrix,
    low_rank_det_update,
    low_rank_inv_update,
    mll,
)


class ChainState(NamedTuple):
    forest: Forest  # fields (m, node_limit)
    leaves: jax.Array  # (N, m) int32 — train-point leaf per tree
    noise: jax.Array  # f32 scalar
    scale: jax.Array  # f32 scalar
    K_inv: jax.Array  # (N, N)
    K_logdet: jax.Array  # f32 scalar
    mll: jax.Array  # f32 scalar


class BARKModel(NamedTuple):
    """Posterior (or state) triple; batch dims lead each field.

    Parity: ModelT = (forest, noise, scale), src/bark/fitting/bark_sampler.py:13
    and src/bark/tree_kernels/tree_gps.py:14-17.
    """

    forest: Forest
    noise: jax.Array
    scale: jax.Array


def _compact_leaf_onehot(
    leaves_j: jax.Array, leaf_mask: jax.Array, num_cols: int
) -> jax.Array:
    """One-hot of leaf assignments, compacted to the active-leaf ranks.

    ``leaves_j`` is (N,) node indices; ``leaf_mask`` the tree's active-leaf
    mask (node_limit,). Any injective leaf->column map leaves U @ U.T (all
    that Woodbury consumes) unchanged; ranking among active leaves needs only
    ``num_cols = node_limit // 2`` columns (a tree of k leaves has 2k-1
    active nodes).
    """
    ranks = jnp.cumsum(leaf_mask.astype(jnp.int32)) - 1
    cols = ranks[leaves_j]
    return jax.nn.one_hot(cols, num_cols, dtype=jnp.float32)


def init_chain_state(
    forest: Forest,
    noise: jax.Array,
    scale: jax.Array,
    X: jax.Array,
    y: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
) -> ChainState:
    """Route data and factorize the initial kernel.

    Parity: src/bark/fitting/bark_sampler.py:153-162 (dense init), with the
    inverse/logdet obtained via Cholesky.
    """
    leaves = route_forest(forest, X, feat_types, params.max_depth)
    gram = gram_from_leaves(leaves, leaves, params.node_limit)
    K = kernel_matrix(gram, noise, scale)
    K_inv, K_logdet = chol_inv_logdet(K)
    return ChainState(
        forest=forest,
        leaves=leaves,
        noise=jnp.asarray(noise, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        K_inv=K_inv,
        K_logdet=K_logdet,
        mll=mll(K_inv, K_logdet, y),
    )


def step(
    key: jax.Array,
    state: ChainState,
    X: jax.Array,
    y: jax.Array,
    bounds: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
) -> ChainState:
    """One full MCMC step: m tree moves + one noise/scale move.

    Parity: src/bark/fitting/bark_sampler.py:216-284.
    """
    m = params.num_trees
    num_cols = params.node_limit // 2
    k_trees, k_hyper, k_hyper_accept = jax.random.split(key, 3)
    tree_keys = jax.random.split(k_trees, m)

    s_sqrtm = jnp.sqrt(state.scale / m)

    def tree_move(carry, inputs):
        forest, leaves, K_inv, K_logdet, cur_mll = carry
        tree_idx, k = inputs
        k_prop, k_accept = jax.random.split(k)

        tree = jax.tree.map(lambda a: a[tree_idx], forest)
        new_tree, log_q_prior = propose_tree(
            k_prop, tree, bounds, feat_types, params
        )

        cur_leaves_j = leaves[:, tree_idx]
        new_leaves_j = route_tree(new_tree, X, feat_types, params.max_depth)

        U_cur = s_sqrtm * _compact_leaf_onehot(
            cur_leaves_j, terminal_mask(tree), num_cols
        )
        U_new = s_sqrtm * _compact_leaf_onehot(
            new_leaves_j, terminal_mask(new_tree), num_cols
        )

        # remove the old tree's contribution, add the new one
        # (bark_sampler.py:243-254)
        K_inv1 = low_rank_inv_update(K_inv, U_cur, subtract=True)
        K_logdet1 = low_rank_det_update(K_inv, U_cur, K_logdet, subtract=True)
        K_inv2 = low_rank_inv_update(K_inv1, U_new)
        K_logdet2 = low_rank_det_update(K_inv1, U_new, K_logdet1)

        new_mll = mll(K_inv2, K_logdet2, y)
        log_alpha = log_q_prior + new_mll - cur_mll
        u = jax.random.uniform(k_accept, dtype=jnp.float32)
        accept = jnp.log(u) <= jnp.minimum(log_alpha, 0.0)

        sel_tree = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_tree, tree
        )
        forest = jax.tree.map(
            lambda fa, ta: fa.at[tree_idx].set(ta), forest, sel_tree
        )
        leaves = leaves.at[:, tree_idx].set(
            jnp.where(accept, new_leaves_j, cur_leaves_j)
        )
        K_inv = jnp.where(accept, K_inv2, K_inv)
        K_logdet = jnp.where(accept, K_logdet2, K_logdet)
        cur_mll = jnp.where(accept, new_mll, cur_mll)
        return (forest, leaves, K_inv, K_logdet, cur_mll), None

    carry = (state.forest, state.leaves, state.K_inv, state.K_logdet, state.mll)
    (forest, leaves, K_inv, K_logdet, cur_mll), _ = jax.lax.scan(
        tree_move, carry, (jnp.arange(m, dtype=jnp.int32), tree_keys)
    )

    # --- joint noise/scale move with full K rebuild (bark_sampler.py:266-282)
    (new_noise, new_scale), log_q_prior = get_noise_scale_proposal(
        k_hyper, state.noise, state.scale, params
    )
    gram = gram_from_leaves(leaves, leaves, params.node_limit)
    K = kernel_matrix(gram, new_noise, new_scale)
    new_K_inv, new_K_logdet = chol_inv_logdet(K)
    new_mll = mll(new_K_inv, new_K_logdet, y)

    log_alpha = log_q_prior + new_mll - cur_mll
    u = jax.random.uniform(k_hyper_accept, dtype=jnp.float32)
    accept = jnp.log(u) <= jnp.minimum(log_alpha, 0.0)

    return ChainState(
        forest=forest,
        leaves=leaves,
        noise=jnp.where(accept, new_noise, state.noise),
        scale=jnp.where(accept, new_scale, state.scale),
        K_inv=jnp.where(accept, new_K_inv, K_inv),
        K_logdet=jnp.where(accept, new_K_logdet, K_logdet),
        mll=jnp.where(accept, new_mll, cur_mll),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def run_chain(
    key: jax.Array,
    forest: Forest,
    noise: jax.Array,
    scale: jax.Array,
    X: jax.Array,
    y: jax.Array,
    bounds: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
) -> tuple[BARKModel, ChainState]:
    """Run one chain: warmup then ``num_samples`` thinned samples.

    Parity: the per-chain body of ``_run_bark_sampler_multichain``
    (src/bark/fitting/bark_sampler.py:147-211).
    """
    state = init_chain_state(forest, noise, scale, X, y, feat_types, params)

    def one_step(state, k):
        return step(k, state, X, y, bounds, feat_types, params), None

    if params.warmup_steps > 0:
        key, k_warm = jax.random.split(key)
        warm_keys = jax.random.split(k_warm, params.warmup_steps)
        state, _ = jax.lax.scan(one_step, state, warm_keys)

    def one_sample(state, k):
        keys = jax.random.split(k, params.steps_per_sample)
        state, _ = jax.lax.scan(one_step, state, keys)
        return state, (state.forest, state.noise, state.scale)

    sample_keys = jax.random.split(key, params.num_samples)
    state, (forests, noises, scales) = jax.lax.scan(one_sample, state, sample_keys)
    return BARKModel(forest=forests, noise=noises, scale=scales), state


@functools.partial(jax.jit, static_argnames=("params",))
def run_bark_sampler(
    key: jax.Array,
    model: BARKModel,
    X: jax.Array,
    y: jax.Array,
    bounds: jax.Array,
    feat_types: jax.Array,
    params: SamplerParams,
) -> BARKModel:
    """Multi-chain driver: vmap chains on-chip.

    Parity: src/bark/fitting/bark_sampler.py:95-213 — model fields carry a
    leading ``(num_chains,)`` axis; returns samples with leading
    ``(num_chains, num_samples)`` axes. For multi-chip sharding see
    bark_tpu.parallel.sharded_sampler.
    """
    num_chains = model.noise.shape[0]
    keys = jax.random.split(key, num_chains)
    samples, _ = jax.vmap(
        lambda k, f, n, s: run_chain(k, f, n, s, X, y, bounds, feat_types, params)
    )(keys, model.forest, model.noise, model.scale)
    return samples
