"""Multi-task GP, posterior sampling, fidelity selection, LeafGP tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.benchmarks import map_benchmark
from bark_tpu.fitting.params import SamplerParams
from bark_tpu.models.leafgp import LeafGPSurrogate
from bark_tpu.models.mogp import LeafMOGPSurrogate, task_covariance
from bark_tpu.models.sampling import (
    construct_nystrom_features,
    generate_fstar_samples,
    nystrom_samples,
)
from bark_tpu.models.surrogate import BARKSurrogate
from bark_tpu.optimizer.fidelity import propose_fidelity_information_based
from bark_tpu.utils.metrics import mse


def test_leafgp_beats_mean_predictor():
    bench = map_benchmark("TreeFunction", dim=3, m=20, function_seed=1)
    rng = np.random.default_rng(0)
    Xtr = bench.domain.sample(60, rng)
    ytr = bench.f(Xtr)
    Xte = bench.domain.sample(80, rng)
    yte = bench.f(Xte)
    sur = LeafGPSurrogate(bench.domain).fit(Xtr, ytr)
    mu, std = sur.predict(Xte)
    assert mse(yte, mu) < 0.5 * mse(yte, np.full_like(yte, ytr.mean()))
    assert (std > 0).all() and np.isfinite(std).all()


def test_mogp_learns_correlated_fidelities():
    bench = map_benchmark("CurrinExp2D")
    rng = np.random.default_rng(0)
    X0 = bench.domain.sample(15, rng)
    X1 = bench.domain.sample(30, rng)
    X = np.vstack([X0, X1])
    tasks = np.array([0] * 15 + [1] * 30)
    y = bench.f_fidelity(X, tasks)
    mogp = LeafMOGPSurrogate(bench.domain, num_tasks=2).fit(X, tasks, y)

    B = np.asarray(task_covariance(mogp.params))
    corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
    assert corr > 0.8, "fidelities are strongly correlated by construction"

    Xte = bench.domain.sample(40, rng)
    yte = bench.f_fidelity(Xte, np.zeros(40))
    mu, std = mogp.predict(Xte, np.zeros(40, int))
    assert np.sqrt(np.mean((mu - yte) ** 2)) < yte.std()


def _fitted_bark(seed=0):
    bench = map_benchmark("TreeFunction", dim=2, m=8, function_seed=1)
    rng = np.random.default_rng(seed)
    Xtr = bench.domain.sample(20, rng)
    ytr = bench.f(Xtr)
    params = SamplerParams(
        warmup_steps=10, num_samples=3, steps_per_sample=2, num_trees=8
    )
    sur = BARKSurrogate(bench.domain, params, seed=seed).fit(Xtr, ytr)
    return bench, sur


def test_fstar_samples_below_posterior_mean_min():
    bench, sur = _fitted_bark()
    tx, ty = sur.train_data
    ft = jnp.asarray(bench.domain.feature_types())
    fstar = np.asarray(
        generate_fstar_samples(
            jax.random.key(0), sur.model, tx, ty, ft, num_fstar=32
        )
    )
    assert fstar.shape == (3, 32)
    assert np.isfinite(fstar).all()
    # f* = min over sites of latent draws: on average below the y mean (0)
    assert fstar.mean() < 0


def test_nystrom_features_approximate_kernel():
    bench, sur = _fitted_bark()
    tx, _ = sur.train_data
    ft = jnp.asarray(bench.domain.feature_types())
    Z = tx[:15]
    feats = construct_nystrom_features(sur.model, Z, Z, ft)
    # phi(Z) phi(Z)^T must reproduce K_ZZ (exact on the inducing set)
    from bark_tpu.forest import gram_from_leaves, route_forest

    forest0 = jax.tree.map(lambda a: a.reshape(-1, 8, 64)[0], sur.model.forest)
    leaves = route_forest(forest0, Z, ft)
    K = float(sur.model.scale.reshape(-1)[0]) * np.asarray(
        gram_from_leaves(leaves, leaves, 64)
    )
    approx = np.asarray(feats[0] @ feats[0].T)
    np.testing.assert_allclose(approx, K, atol=5e-3)

    draws = nystrom_samples(jax.random.key(1), feats, 6)
    assert draws.shape == (3, 6, 15)


def test_fidelity_chooser_returns_valid_index():
    bench = map_benchmark("CurrinExp2D")
    rng = np.random.default_rng(1)
    X = np.vstack([bench.domain.sample(10, rng), bench.domain.sample(20, rng)])
    tasks = np.array([0] * 10 + [1] * 20)
    y = bench.f_fidelity(X, tasks)
    mogp = LeafMOGPSurrogate(bench.domain, num_tasks=2).fit(X, tasks, y)
    f_star = np.asarray([-1.0, -1.1, -0.9])
    fid = propose_fidelity_information_based(
        mogp, bench.domain.sample(1, rng), bench.fidelity_costs, f_star
    )
    assert fid in (0, 1)
