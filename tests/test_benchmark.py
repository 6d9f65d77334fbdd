"""Benchmark self-consistency.

Parity: the reference's tests/test_benchmark.py:11-23 — every registered
benchmark's declared optimum must satisfy its own constraints and reproduce
its declared f value (skipped where no optimum is implemented).
"""

import numpy as np
import pytest

from bark_tpu.benchmarks import BENCHMARK_MAP, map_benchmark
from bark_tpu.constraints import total_violation

UNAVAILABLE = {"SVRBench", "CCOBench", "DatasetBenchmark"}
SLOW = {"XGBoostMNIST"}  # trains a real model per evaluation


@pytest.mark.parametrize(
    "name", sorted(set(BENCHMARK_MAP) - UNAVAILABLE - SLOW)
)
def test_benchmark_constructs_and_evaluates(name):
    bench = map_benchmark(name)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(4, rng)
    y = bench.f(X)
    assert y.shape == (4,)
    assert np.isfinite(y).all()


@pytest.mark.parametrize(
    "name", sorted(set(BENCHMARK_MAP) - UNAVAILABLE - SLOW)
)
def test_benchmark_optima_consistent(name):
    bench = map_benchmark(name)
    try:
        optima = bench.get_optima()
    except NotImplementedError:
        pytest.skip("no optimum declared")
    if optima is None:
        pytest.skip("no optimum declared")
    x_opt, f_opt = optima

    # declared optimum satisfies the benchmark's own constraints
    viol = total_violation(
        bench.domain.constraints, x_opt[None, :].astype(np.float64),
        bench.domain.input_keys,
    )
    assert viol[0] < 1e-2

    # and reproduces the declared objective value
    y = bench.f(x_opt[None, :])
    np.testing.assert_allclose(y[0], f_opt, rtol=2e-3, atol=1e-3)


def test_unavailable_benchmarks_raise_informatively():
    for name in UNAVAILABLE:
        with pytest.raises(RuntimeError, match="unavailable"):
            map_benchmark(name)


def test_max_bandit_candidates():
    bench = map_benchmark("MAXBandit")
    X, idx = bench.sample_candidates(10, np.random.default_rng(0))
    assert X.shape == (10, 28)
    y = bench.f_by_idx(idx)
    assert np.isfinite(y).all()
