"""Massively parallel acquisition search — the Gurobi-MIP replacement.

The reference solves a mixed-integer program for the global LCB optimum over
the piecewise-constant acquisition, then returns the *center of the active
leaf box* (src/bark/optimizer/proposals.py:43-147). Key structural fact: the
acquisition depends on x only through the leaves x lands in, so it is
constant within the intersection box of those leaves. This search exploits
the same structure TPU-style:

  1. score a large uniform candidate batch (one fused batched kernel eval),
  2. evolutionary refinement rounds: mutate the top-k candidates with
     per-feature-type moves (Gaussian for continuous, jitter for integer,
     resample for categorical) at a decaying scale,
  3. compute the active leaf box of the winner across every sampled tree
     (exact subspace intersection, vmapped) and return the box center —
     matching the reference's ``_get_leaf_center`` semantics
     (proposals.py:131-147: categorical -> random allowed category, integer
     -> stochastic rounding, continuous -> midpoint).

Because the acquisition is constant on the box, step 3 never degrades the
score; it re-centers the proposal away from arbitrary box edges exactly as
the reference does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.domain import CategoricalInput, Domain, IntegerInput
from bark_tpu.fitting.traversal import node_subspace
from bark_tpu.forest import FEAT_CAT, FEAT_INT, Forest, route_forest
from bark_tpu.optimizer.acquisition import (
    DEFAULT_KAPPA,
    AcquisitionState,
    evaluate_acquisition,
)


@functools.partial(jax.jit, static_argnames=("n",))
def _uniform_candidates(
    key: jax.Array, bounds_ord: jax.Array, feat_types: jax.Array, n: int
) -> jax.Array:
    """Uniform batch in ordinal data space (cats/ints uniform over values)."""
    d = bounds_ord.shape[0]
    k_cont, k_disc = jax.random.split(key)
    lb, ub = bounds_ord[:, 0], bounds_ord[:, 1]
    cont = jax.random.uniform(k_cont, (n, d)) * (ub - lb) + lb
    disc = jnp.floor(
        jax.random.uniform(k_disc, (n, d)) * (ub - lb + 1.0) + lb
    )
    disc = jnp.clip(disc, lb, ub)
    is_disc = (feat_types == FEAT_CAT) | (feat_types == FEAT_INT)
    return jnp.where(is_disc[None, :], disc, cont).astype(jnp.float32)


def _mutate(
    key: jax.Array,
    parents: jax.Array,
    bounds_ord: jax.Array,
    feat_types: jax.Array,
    n_children: int,
    sigma: float,
) -> jax.Array:
    """Per-feature-type mutations of top candidates."""
    k_pick, k_mask, k_cont, k_int, k_cat = jax.random.split(key, 5)
    d = parents.shape[1]
    lb, ub = bounds_ord[:, 0], bounds_ord[:, 1]
    span = ub - lb

    idx = jax.random.randint(k_pick, (n_children,), 0, parents.shape[0])
    base = parents[idx]

    mutate_mask = jax.random.uniform(k_mask, (n_children, d)) < 0.3
    cont_step = base + sigma * span * jax.random.normal(k_cont, (n_children, d))
    int_step = base + jnp.round(
        sigma * jnp.maximum(span, 1.0) * jax.random.normal(k_int, (n_children, d))
    )
    cat_step = jnp.floor(
        jax.random.uniform(k_cat, (n_children, d)) * (span + 1.0) + lb
    )

    ft = feat_types[None, :]
    stepped = jnp.where(
        ft == FEAT_CAT, cat_step, jnp.where(ft == FEAT_INT, int_step, cont_step)
    )
    stepped = jnp.clip(stepped, lb, ub)
    return jnp.where(mutate_mask, stepped, base).astype(jnp.float32)


def _leaf_box(
    acq: AcquisitionState,
    x: jax.Array,
    bounds_bitmask: jax.Array,
    feat_types: jax.Array,
    max_depth: int,
) -> jax.Array:
    """Intersection of the subspaces of every leaf x lands in: ``(D, 2)``.

    Parity: the active-area computation in proposals.py:95-117 +
    gbm_model.update_var_bounds — here exact, via the same ``node_subspace``
    walk the sampler uses, vmapped over (samples x trees).
    """

    def per_sample(tree_sample: Forest):
        leaves = route_forest(tree_sample, x[None, :], feat_types, max_depth)[0]

        def per_tree(tree: Forest, leaf_idx):
            return node_subspace(tree, leaf_idx, bounds_bitmask, feat_types, max_depth)

        return jax.vmap(per_tree)(tree_sample, leaves)  # (m, D, 2)

    boxes = jax.vmap(per_sample)(acq.forest)  # (S, m, D, 2)
    boxes = boxes.reshape(-1, *boxes.shape[-2:])

    lo = jnp.max(boxes[:, :, 0], axis=0)
    hi = jnp.min(boxes[:, :, 1], axis=0)
    # categorical: intersect masks with bitwise AND instead
    masks = boxes[:, :, 1].astype(jnp.int32)

    def and_reduce(col):
        return jax.lax.reduce(
            col, jnp.int32(-1), jax.lax.bitwise_and, dimensions=(0,)
        )

    cat_mask = jax.vmap(and_reduce, in_axes=1)(masks).astype(jnp.float32)
    is_cat = feat_types == FEAT_CAT
    lo = jnp.where(is_cat, 0.0, lo)
    hi = jnp.where(is_cat, cat_mask, hi)
    return jnp.stack([lo, hi], axis=1)


def _box_center(
    box: np.ndarray, domain: Domain, rng: np.random.Generator
) -> np.ndarray:
    """Center point of an active-leaf box in ordinal data space.

    Parity: proposals.py:131-147 — categorical: uniform choice among allowed
    categories; integer: midpoint with stochastic rounding; continuous:
    midpoint.
    """
    out = np.zeros((len(domain.inputs),), np.float32)
    for i, feat in enumerate(domain.inputs):
        lb, ub = float(box[i, 0]), float(box[i, 1])
        if isinstance(feat, CategoricalInput):
            mask = int(ub)
            allowed = [c for c in range(len(feat.categories)) if mask & (1 << c)]
            if not allowed:
                allowed = list(range(len(feat.categories)))
            out[i] = rng.choice(allowed)
        elif isinstance(feat, IntegerInput):
            mid = lb + (ub - lb) / 2
            floor = np.floor(mid)
            out[i] = floor + rng.binomial(1, mid - floor)
        else:
            out[i] = lb + (ub - lb) / 2
    return out


def propose(
    key: jax.Array,
    acq: AcquisitionState,
    domain: Domain,
    feat_types: jax.Array,
    kappa: float = DEFAULT_KAPPA,
    num_candidates: int = 4096,
    num_rounds: int = 4,
    top_k: int = 64,
    max_depth: int = 16,
    return_center: bool = True,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, float]:
    """Optimize the acquisition; returns (proposal ordinal point, acq value).

    Parity: src/bark/optimizer/proposals.py:43-70 (propose -> global solution
    -> leaf center), with the MIP replaced by batched sampled search.
    """
    rng = rng or np.random.default_rng()
    bounds_ord = jnp.asarray(domain.bounds("ordinal"))
    bounds_bitmask = jnp.asarray(domain.bounds("bitmask"))

    key, k0 = jax.random.split(key)
    cands = _uniform_candidates(k0, bounds_ord, feat_types, num_candidates)
    scores = evaluate_acquisition(acq, cands, feat_types, max_depth, kappa)

    best_idx = jnp.argsort(scores)[:top_k]
    elites, elite_scores = cands[best_idx], scores[best_idx]

    sigma = 0.2
    for _ in range(num_rounds):
        key, k_mut = jax.random.split(key)
        children = _mutate(
            k_mut, elites, bounds_ord, feat_types, num_candidates, sigma
        )
        child_scores = evaluate_acquisition(
            acq, children, feat_types, max_depth, kappa
        )
        pool = jnp.concatenate([elites, children])
        pool_scores = jnp.concatenate([elite_scores, child_scores])
        best_idx = jnp.argsort(pool_scores)[:top_k]
        elites, elite_scores = pool[best_idx], pool_scores[best_idx]
        sigma *= 0.5

    x_best = elites[0]
    best_val = float(elite_scores[0])

    if return_center:
        box = np.asarray(
            _leaf_box(acq, x_best, bounds_bitmask, feat_types, max_depth)
        )
        center = _box_center(box, domain, rng)
        return center, best_val
    return np.asarray(x_best), best_val
