"""Acquisition function over the sampled BARK posterior.

Parity target: the objective encoded in the reference's MIP
(src/bark/optimizer/opt_model.py:19-117): minimize over x the sample-average
LCB

    (1/S) * sum_s [ mu_s(x) - kappa * sigma_s(x) ]

where, per posterior sample s (with the *null-tree-free* agreement kernel,
opt_model.py:54-59 / gbm_model.py:46-50):

    mu_s(x)     = scale_s * k_s(x)ᵀ K_s⁻¹ y
    sigma_s²(x) = scale_s - scale_s² * k_s(x)ᵀ K_s⁻¹ k_s(x)

``k_s(x)`` is the per-sample agreement vector between x and the training
points, K_s = scale_s * gram + (jitter + noise_s) I. The reference encodes
this as Gurobi quadratic constraints over leaf-indicator variables; here it
is evaluated exactly, in batch, for thousands of candidates at once — one
one-hot matmul per posterior sample, fused by XLA onto the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bark_tpu.fitting.sampler import BARKModel
from bark_tpu.forest import (
    Forest,
    gram_from_leaves,
    num_null_trees,
    route_forest,
    route_forest_select,
)
from bark_tpu.ops.linalg import JITTER, robust_chol_inv_logdet

DEFAULT_KAPPA = 1.96  # parity: strategies/tree_kernel.py:45


class AcquisitionState(NamedTuple):
    """Precomputed per-sample quantities reused across candidate batches."""

    forest: Forest  # (S, m, node_limit)
    noise: jax.Array  # (S,)
    scale: jax.Array  # (S,)
    train_leaves: jax.Array  # (S, N, m)
    K_inv: jax.Array  # (S, N, N)
    K_inv_y: jax.Array  # (S, N)
    n_null: jax.Array  # (S,)
    train_mask: jax.Array  # (N,)


@functools.partial(jax.jit, static_argnames=("max_depth",))
def build_acquisition(
    model: BARKModel,
    train_x: jax.Array,
    train_y: jax.Array,
    feat_types: jax.Array,
    max_depth: int = 16,
    train_mask: jax.Array | None = None,
) -> AcquisitionState:
    """Flatten posterior samples and factorize their kernels once.

    Parity: the K⁻¹-per-sample precomputation in opt_model.py:54-59, using
    the no-null-rescaled gram exactly as the reference does.
    """
    m, node_limit = model.forest.num_trees, model.forest.node_limit
    forest = jax.tree.map(lambda a: a.reshape(-1, m, node_limit), model.forest)
    noise = model.noise.reshape(-1).astype(jnp.float32)
    scale = model.scale.reshape(-1).astype(jnp.float32)
    if train_mask is None:
        train_mask = jnp.ones((train_x.shape[0],), jnp.float32)
    y = train_y.reshape(-1)

    n_null = num_null_trees(forest).astype(jnp.float32)

    def per_sample(tree_sample: Forest, noise_s, scale_s, n_null_s):
        leaves = route_forest(tree_sample, train_x, feat_types, max_depth)
        gram = gram_from_leaves(
            leaves, leaves, node_limit, train_mask, train_mask
        )
        # no-null rescaling (forest.py:101-111); keep masked rows at zero
        denom = jnp.maximum(m - n_null_s, 1.0)
        outer = train_mask[:, None] * train_mask[None, :]
        gram = (gram - (n_null_s / m) * outer) * (m / denom)
        K = scale_s * gram + (JITTER + noise_s) * jnp.eye(
            train_x.shape[0], dtype=gram.dtype
        )
        K_inv, _ = robust_chol_inv_logdet(K)  # jitter escalation
        return leaves, K_inv, K_inv @ y

    train_leaves, K_inv, K_inv_y = jax.vmap(per_sample)(
        forest, noise, scale, n_null
    )
    return AcquisitionState(
        forest=forest,
        noise=noise,
        scale=scale,
        train_leaves=train_leaves,
        K_inv=K_inv,
        K_inv_y=K_inv_y,
        n_null=n_null,
        train_mask=train_mask,
    )


@functools.partial(jax.jit, static_argnames=("max_depth", "kappa"))
def evaluate_acquisition(
    acq: AcquisitionState,
    candidates: jax.Array,
    feat_types: jax.Array,
    max_depth: int = 16,
    kappa: float = DEFAULT_KAPPA,
) -> jax.Array:
    """Sample-average LCB for a ``(B, D)`` candidate batch; lower is better.

    Parity: the MIP objective and variance constraint,
    opt_model.py:75-111.
    """
    node_limit = acq.forest.node_limit
    m = acq.forest.num_trees

    # routing lowering by backend (bit-identical results, tested): on TPU
    # the gather-loop walk costs ~1.16 s of a 1.56 s scoring call at B=4096
    # (gathers carry a large fixed cost) and the one-hot transition-matmul
    # form is 4x faster on the MXU; on CPU the matmuls' O(B*m*L^2) FLOPs
    # lose badly to cheap gathers — measured both ways, as always.
    route = (
        route_forest_select
        if jax.default_backend() == "tpu"
        else route_forest
    )

    def per_sample(tree_sample, noise_s, scale_s, n_null_s, leaves_s, K_inv_s, w_s):
        cand_leaves = route(tree_sample, candidates, feat_types, max_depth)
        k_vec = gram_from_leaves(
            cand_leaves, leaves_s, node_limit, None, acq.train_mask
        )  # (B, N)
        denom = jnp.maximum(m - n_null_s, 1.0)
        k_vec = (k_vec - (n_null_s / m) * acq.train_mask[None, :]) * (m / denom)
        mu = scale_s * (k_vec @ w_s)
        quad = jnp.sum((k_vec @ K_inv_s) * k_vec, axis=-1)
        var = jnp.maximum(scale_s - scale_s**2 * quad, 1e-12)
        return mu - kappa * jnp.sqrt(var)

    per_sample_lcb = jax.vmap(per_sample)(
        acq.forest,
        acq.noise,
        acq.scale,
        acq.n_null,
        acq.train_leaves,
        acq.K_inv,
        acq.K_inv_y,
    )  # (S, B)
    return jnp.mean(per_sample_lcb, axis=0)


def evaluate_acquisition_sharded(
    acq: AcquisitionState,
    candidates: jax.Array,
    feat_types: jax.Array,
    mesh: jax.sharding.Mesh,
    max_depth: int = 16,
    kappa: float = DEFAULT_KAPPA,
    axis_name: str = "candidates",
) -> jax.Array:
    """``evaluate_acquisition`` with the candidate batch sharded over a mesh.

    At production scale (S = chains x samples posterior states, N past the
    32-bucket) scoring dominates the BO iteration; candidates are
    embarrassingly parallel, so each device scores its block against the
    replicated acquisition state — no collectives in the hot path, a single
    device-sharded result out. Scores are identical to the single-device
    evaluation (tested on the 8-device virtual mesh).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis_name]
    assert candidates.shape[0] % n_dev == 0, "candidate batch must divide mesh"

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    def score_block(cands_block, ft):
        return evaluate_acquisition(acq, cands_block, ft, max_depth, kappa)

    return score_block(candidates, feat_types)
