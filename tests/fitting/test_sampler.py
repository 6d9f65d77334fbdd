"""Transition-kernel integration tests.

The central oracle: the Woodbury-maintained kernel inverse / logdet carried
through a full MCMC step must match a fresh dense rebuild from the final
forest state — the reference validates its incremental updates the same way
(tests/bark_fitting/test_quick_inverse.py:55-101, on a real forest edit).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.domain import CategoricalInput, ContinuousInput, Domain, IntegerInput
from bark_tpu.fitting.params import SamplerParams
from bark_tpu.fitting.sampler import (
    BARKModel,
    init_chain_state,
    run_bark_sampler,
    step,
)
from bark_tpu.forest import create_empty_forest, gram_from_leaves, route_forest
from bark_tpu.ops.linalg import chol_inv_logdet, kernel_matrix, mll


def make_problem(n=25, seed=0):
    dom = Domain(
        [
            ContinuousInput("x_0", (0.0, 1.0)),
            ContinuousInput("x_1", (0.0, 1.0)),
            IntegerInput("i_0", (0, 5)),
            CategoricalInput("c_0", ("a", "b", "c", "d")),
        ]
    )
    rng = np.random.default_rng(seed)
    X = dom.sample(n, rng)
    y = rng.standard_normal((n,)).astype(np.float32)
    return dom, jnp.asarray(X), jnp.asarray(y)


def test_maintained_state_consistent_with_rebuild():
    dom, X, y = make_problem()
    params = SamplerParams(num_trees=8, num_chains=1)
    bounds = jnp.asarray(dom.bounds("bitmask"))
    ft = jnp.asarray(dom.feature_types())

    forest = create_empty_forest(params.num_trees, params.node_limit)
    state = init_chain_state(
        forest, jnp.float32(0.1), jnp.float32(1.0), X, y, ft, params
    )

    key = jax.random.key(0)
    for i in range(10):
        key, k = jax.random.split(key)
        state = step(k, state, X, y, bounds, ft, params)

    # rebuild from scratch
    leaves = route_forest(state.forest, X, ft, params.max_depth)
    np.testing.assert_array_equal(np.asarray(leaves), np.asarray(state.leaves))

    gram = gram_from_leaves(leaves, leaves, params.node_limit)
    K = kernel_matrix(gram, state.noise, state.scale)
    K_inv, K_logdet = chol_inv_logdet(K)

    np.testing.assert_allclose(
        np.asarray(state.K_inv), np.asarray(K_inv), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        float(state.K_logdet), float(K_logdet), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        float(state.mll), float(mll(K_inv, K_logdet, y)), rtol=1e-3, atol=2e-3
    )


def test_sampler_moves_and_shapes():
    dom, X, y = make_problem(n=30, seed=1)
    params = SamplerParams(
        warmup_steps=10, num_samples=4, steps_per_sample=3, num_chains=3, num_trees=10
    )
    bounds = jnp.asarray(dom.bounds("bitmask"))
    ft = jnp.asarray(dom.feature_types())

    forest = create_empty_forest(params.num_trees, params.node_limit, batch_shape=(3,))
    model = BARKModel(forest, jnp.full((3,), 0.1), jnp.ones((3,)))
    samples = run_bark_sampler(jax.random.key(0), model, X, y, bounds, ft, params)

    assert samples.noise.shape == (3, 4)
    assert samples.scale.shape == (3, 4)
    assert samples.forest.is_leaf.shape == (3, 4, 10, params.node_limit)

    # the chains must actually move: trees grow and noise updates
    n_internal = np.asarray(
        (~samples.forest.is_leaf & samples.forest.active).sum(axis=(-1, -2))
    )
    assert (n_internal > 0).any()
    assert len(np.unique(np.asarray(samples.noise))) > 1

    # all sampled forests remain structurally valid
    active = np.asarray(samples.forest.active)
    is_leaf = np.asarray(samples.forest.is_leaf)
    n_active = active.sum(axis=-1)
    n_leaves = (active & is_leaf).sum(axis=-1)
    np.testing.assert_array_equal(n_active, 2 * n_leaves - 1)


def test_fixed_forest_chain_is_noise_only():
    """With grow/prune/change all disabled by zero MH acceptance paths the
    hyperparameter move still mixes; sanity-check acceptance behavior by
    checking noise stays positive and finite over a run."""
    dom, X, y = make_problem(n=15, seed=2)
    params = SamplerParams(
        warmup_steps=0, num_samples=20, steps_per_sample=1, num_chains=1, num_trees=4
    )
    bounds = jnp.asarray(dom.bounds("bitmask"))
    ft = jnp.asarray(dom.feature_types())
    forest = create_empty_forest(params.num_trees, params.node_limit, batch_shape=(1,))
    model = BARKModel(forest, jnp.full((1,), 0.1), jnp.ones((1,)))
    samples = run_bark_sampler(jax.random.key(1), model, X, y, bounds, ft, params)
    noise = np.asarray(samples.noise)
    assert np.isfinite(noise).all() and (noise > 0).all()


def test_deterministic_given_key():
    dom, X, y = make_problem(n=12, seed=3)
    params = SamplerParams(
        warmup_steps=2, num_samples=2, steps_per_sample=2, num_chains=1, num_trees=5
    )
    bounds = jnp.asarray(dom.bounds("bitmask"))
    ft = jnp.asarray(dom.feature_types())
    forest = create_empty_forest(params.num_trees, params.node_limit, batch_shape=(1,))
    model = BARKModel(forest, jnp.full((1,), 0.1), jnp.ones((1,)))
    s1 = run_bark_sampler(jax.random.key(7), model, X, y, bounds, ft, params)
    s2 = run_bark_sampler(jax.random.key(7), model, X, y, bounds, ft, params)
    np.testing.assert_array_equal(np.asarray(s1.noise), np.asarray(s2.noise))
    np.testing.assert_array_equal(
        np.asarray(s1.forest.threshold), np.asarray(s2.forest.threshold)
    )
