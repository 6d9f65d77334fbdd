"""Grid-UCB (BARTGrid analogue) strategy + Sobol sampling + function draws.

Parity targets: strategies/bart_grid.py:41-58 (grid reparam-UCB),
surrogates/bart.py:54-66 (function_samples), BoFire SOBOL fallback sampling.
"""

import numpy as np

from bark_tpu.benchmarks.tree_function import TreeFunction
from bark_tpu.domain import (
    CategoricalInput,
    ContinuousInput,
    Domain,
    IntegerInput,
)
from bark_tpu.fitting.params import SamplerParams
from bark_tpu.models.surrogate import BARKPriorSurrogate, BARKSurrogate
from bark_tpu.strategies.tree_kernel import make_strategy


def mixed_domain():
    return Domain(
        [
            ContinuousInput(key="c0", bounds=(-1.0, 2.0)),
            IntegerInput(key="i0", bounds=(0, 4)),
            CategoricalInput(key="k0", categories=("a", "b", "c")),
        ]
    )


def test_sobol_points_are_in_domain_and_stratified():
    domain = mixed_domain()
    X = domain.sample_sobol(256, seed=3)
    assert X.shape == (256, 3)
    assert (X[:, 0] >= -1.0).all() and (X[:, 0] <= 2.0).all()
    assert set(np.unique(X[:, 1])) <= {0.0, 1.0, 2.0, 3.0, 4.0}
    assert set(np.unique(X[:, 2])) == {0.0, 1.0, 2.0}
    # stratified flooring: each category level gets ~equal measure
    counts = np.bincount(X[:, 2].astype(int), minlength=3)
    assert counts.min() > 256 / 3 * 0.7
    # round-trips through the domain projection unchanged
    np.testing.assert_allclose(domain.round(X), X)


def test_function_samples_shape_and_spread():
    bench = TreeFunction(dim=3, m=10, function_seed=1)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(30, rng)
    y = bench.f(X)
    params = SamplerParams(
        warmup_steps=5, num_samples=4, steps_per_sample=2, num_chains=2,
        num_trees=10,
    )
    sur = BARKSurrogate(bench.domain, params, seed=0).fit(X, y)
    Xq = bench.domain.sample(9, rng)
    draws = sur.function_samples(Xq, num_draws=3)
    assert draws.shape == (2 * 4 * 3, 9)
    # draws vary across posterior samples and noise draws
    assert draws.std(axis=0).min() > 0.0
    # and are centred near the predictive mean
    mu, _ = sur.predict(Xq)
    assert np.abs(draws.mean(axis=0) - mu[:, 0]).max() < 5.0


def test_grid_ucb_strategy_end_to_end():
    bench = TreeFunction(dim=2, m=10, function_seed=2)
    rng = np.random.default_rng(1)
    X = bench.domain.sample(20, rng)
    y = bench.f(X)

    # BARKPrior surrogate keeps the test cheap (no MCMC)
    strategy = make_strategy(
        "BARTGrid",
        bench.domain,
        seed=0,
        surrogate=BARKPriorSurrogate(bench.domain, num_samples=8, seed=0),
        max_grid=256,
    )
    strategy.tell(X, y)
    assert strategy.has_sufficient_experiments()
    cand = strategy.ask(1)
    assert cand.shape == (1, 2)
    np.testing.assert_allclose(bench.domain.round(cand), cand)
    # the chosen grid point's acquisition beats a random candidate's mean
    strategy.add(cand, bench.f(cand))
    cand2 = strategy.ask(1)
    assert cand2.shape == (1, 2)


def test_grid_ucb_prefers_low_posterior_mean_region():
    """With a near-deterministic surrogate the reparam-LCB argmax must sit
    in the low-mean region (minimization)."""
    domain = Domain([ContinuousInput(key="x", bounds=(0.0, 1.0))])
    X = np.linspace(0, 1, 40).reshape(-1, 1).astype(np.float32)
    y = (X[:, 0] - 0.25) ** 2  # minimum at 0.25

    params = SamplerParams(
        warmup_steps=30, num_samples=5, steps_per_sample=4, num_chains=2,
        num_trees=15,
    )
    strategy = make_strategy(
        "GridUCB", domain, seed=0,
        surrogate=BARKSurrogate(domain, params, seed=0), max_grid=512,
    )
    strategy.tell(X, y)
    cand = strategy.ask(1)
    assert abs(float(cand[0, 0]) - 0.25) < 0.2
