"""CI-runnable statistical-parity check against the actual reference sampler.

Runs a small-budget version of tools/parity/run_parity.py: the reference's
`_run_bark_sampler_multichain` (bark_sampler.py:120-213, executed pure-Python
via the numba shim) vs bark_tpu, on identical TreeFunction data, asserting
chain-mean posterior moments agree within combined MC error and predictive
NLPD/MSE within tolerance. The full-budget evidence lives in
PARITY_RESULTS.md.
"""

from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def test_reference_parity_small_budget():
    from tools.parity.run_parity import DEFAULT_PARAMS, run_workload

    params = {
        **DEFAULT_PARAMS,
        "warmup_steps": 20,
        "num_samples": 10,
        "steps_per_sample": 3,
        "num_chains": 4,
        "num_trees": 10,
    }
    rows = run_workload("tree_function", 30, 15, params, seed=1)
    failures = [r for r in rows if not r["pass"]]
    assert not failures, f"parity failures: {failures}"
