"""Benchmark self-consistency.

Parity: the reference's tests/test_benchmark.py:11-23 — every registered
benchmark's declared optimum must satisfy its own constraints and reproduce
its declared f value (skipped where no optimum is implemented).
"""

import numpy as np
import pytest

from bark_tpu.benchmarks import BENCHMARK_MAP, map_benchmark
from bark_tpu.constraints import total_violation

UNAVAILABLE = {"CCOBench"}
NEEDS_DATA = {"DatasetBenchmark"}
# train a real model per evaluation; SVRBench has its own sized-down test
SLOW = {"XGBoostMNIST", "SVRBench"}


@pytest.mark.parametrize(
    "name", sorted(set(BENCHMARK_MAP) - UNAVAILABLE - NEEDS_DATA - SLOW)
)
def test_benchmark_constructs_and_evaluates(name):
    bench = map_benchmark(name)
    rng = np.random.default_rng(0)
    X = bench.domain.sample(4, rng)
    y = bench.f(X)
    assert y.shape == (4,)
    assert np.isfinite(y).all()


@pytest.mark.parametrize(
    "name", sorted(set(BENCHMARK_MAP) - UNAVAILABLE - NEEDS_DATA - SLOW)
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


def test_dataset_benchmark_roundtrip():
    # reference parity: sequential sampling + row-lookup f
    # (src/bofire_mixed/benchmarks/dataset.py:131-157)
    pd = pytest.importorskip("pandas")
    from bark_tpu.benchmarks.dataset import dataset_domain

    rng = np.random.default_rng(0)
    dom = dataset_domain("Abalone")
    n = 32
    raw = {}
    for f in dom.inputs:
        if hasattr(f, "categories"):
            raw[f.key] = rng.choice(f.categories, size=n)
        else:
            lo, hi = f.bounds
            raw[f.key] = rng.uniform(lo, hi, size=n)
    raw[dom.output_keys[0]] = rng.normal(size=n)
    bench = map_benchmark("DatasetBenchmark", dataset_name="Abalone",
                          data=pd.DataFrame(raw))

    X1 = bench.sample(8, seed=3)
    X2 = bench.sample(8, seed=3)
    assert X1.shape == (8, dom.dim)
    # sequential without replacement: disjoint rows from the same permutation
    assert not any(np.all(np.isclose(X1, r), axis=1).any() for r in X2)
    y = bench.f(X1)
    assert y.shape == (8,) and np.isfinite(y).all()
    # standardized target with sample std (ddof=1), matching the
    # reference's pandas .std() (dataset.py:140-144)
    assert abs(bench.y_data.mean()) < 1e-9
    assert abs(bench.y_data.std(ddof=1) - 1) < 1e-9
    with pytest.raises(KeyError):
        bench.f(np.full((1, dom.dim), -123.0, np.float32))


def test_max_bandit_candidates():
    bench = map_benchmark("MAXBandit")
    X, idx = bench.sample_candidates(10, np.random.default_rng(0))
    assert X.shape == (10, 28)
    y = bench.f_by_idx(idx)
    assert np.isfinite(y).all()


def test_svr_bench_synthetic_fallback():
    """SVRBench (svr_bench.py:28-155) runs end-to-end on the synthetic
    substitute: full pipeline (constant filter, importance ranking, 5
    splits) + SVR scoring, feature mask genuinely changes the objective."""
    bench = map_benchmark(
        "SVRBench",
        num_features_to_optimize=10,
        num_features_to_keep=10,
        num_samples=400,
    )
    assert bench.data_source == "synthetic"
    dom = bench.domain
    assert dom.dim == 13  # 3 continuous hypers + 10 binary mask dims

    rng = np.random.default_rng(0)
    X = dom.sample(3, rng)
    y = bench.f(X)
    assert y.shape == (3,) and np.isfinite(y).all() and (y > 0).all()

    # all-zeros mask -> constant predictor; all-ones mask should beat it
    base = np.array([[-1.0, 0.0, 0.0] + [0.0] * 10])
    full = np.array([[-1.0, 0.0, 0.0] + [1.0] * 10])
    y0, y1 = bench.f(base)[0], bench.f(full)[0]
    assert y1 < y0
