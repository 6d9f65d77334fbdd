"""bark-tpu: a TPU-native framework for fully-Bayesian tree-kernel GPs.

Built from scratch in JAX/XLA (with Pallas for hot kernels) with the
capabilities of TobyBoyne/bark: BARK forest-MCMC surrogates, tree-agreement
GP regression, and Bayesian optimization over mixed
continuous/integer/categorical domains — plus SMC and parallel-tempering
samplers, mesh-sharded chains, and a massively parallel acquisition search.

Public entry points:
    from bark_tpu import (
        Domain, ContinuousInput, IntegerInput, CategoricalInput,
        SamplerParams, BARKSurrogate, BARKPriorSurrogate, LeafGPSurrogate,
        TreeKernelStrategy, make_strategy, map_benchmark,
    )
"""

from bark_tpu.domain import (
    CategoricalInput,
    ContinuousInput,
    ContinuousOutput,
    Domain,
    IntegerInput,
    Standardize,
    build_integer_input,
)
from bark_tpu.fitting.params import SamplerParams
from bark_tpu.fitting.sampler import (
    BARKModel,
    run_bark_sampler,
    run_bark_sampler_with_trace,
)
from bark_tpu.forest import Forest, create_empty_forest

__all__ = [
    "BARKModel",
    "CategoricalInput",
    "ContinuousInput",
    "ContinuousOutput",
    "Domain",
    "Forest",
    "IntegerInput",
    "SamplerParams",
    "Standardize",
    "build_integer_input",
    "create_empty_forest",
    "run_bark_sampler",
    "run_bark_sampler_with_trace",
]


def __getattr__(name):
    # heavier layers load lazily to keep `import bark_tpu` light
    if name in ("BARKSurrogate", "BARKPriorSurrogate"):
        from bark_tpu.models import surrogate

        return getattr(surrogate, name)
    if name == "LeafGPSurrogate":
        from bark_tpu.models.leafgp import LeafGPSurrogate

        return LeafGPSurrogate
    if name == "LeafMOGPSurrogate":
        from bark_tpu.models.mogp import LeafMOGPSurrogate

        return LeafMOGPSurrogate
    if name == "BARTSurrogate":
        from bark_tpu.models.bart import BARTSurrogate

        return BARTSurrogate
    if name == "BARTParams":
        from bark_tpu.fitting.bart import BARTParams

        return BARTParams
    if name in ("TreeKernelStrategy", "make_strategy", "RandomStrategy"):
        from bark_tpu.strategies import tree_kernel

        return getattr(tree_kernel, name)
    if name in ("BENCHMARK_MAP", "map_benchmark"):
        from bark_tpu import benchmarks

        return getattr(benchmarks, name)
    raise AttributeError(name)
