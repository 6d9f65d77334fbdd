"""Parity tests for the Pallas leaf-agreement Gram kernel.

Runs in interpreter mode on CPU (the suite's virtual-device platform);
the compiled path is exercised on real TPU hardware by the perf harness.
Oracle: the XLA one-hot-matmul path (bark_tpu.forest.gram_from_leaves).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bark_tpu.forest import gram_from_leaves
from bark_tpu.ops.pallas_gram import gram_from_leaves_pallas


@pytest.mark.parametrize("n,mm", [(10, 7), (100, 70), (128, 128), (200, 300)])
def test_pallas_gram_matches_onehot(n, mm):
    rng = np.random.default_rng(0)
    m, nl = 20, 32
    l1 = jnp.asarray(rng.integers(0, nl, (n, m)), jnp.int32)
    l2 = jnp.asarray(rng.integers(0, nl, (mm, m)), jnp.int32)
    ref = gram_from_leaves(l1, l2, nl)
    got = gram_from_leaves_pallas(l1, l2, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_pallas_gram_mask_contract():
    rng = np.random.default_rng(1)
    n, mm, m, nl = 50, 40, 10, 16
    l1 = jnp.asarray(rng.integers(0, nl, (n, m)), jnp.int32)
    l2 = jnp.asarray(rng.integers(0, nl, (mm, m)), jnp.int32)
    mask1 = jnp.asarray((rng.uniform(size=n) > 0.3).astype(np.float32))
    mask2 = jnp.asarray((rng.uniform(size=mm) > 0.3).astype(np.float32))
    ref = gram_from_leaves(l1, l2, nl, mask1, mask2)
    got = gram_from_leaves_pallas(l1, l2, mask1, mask2, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)
