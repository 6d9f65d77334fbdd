"""Pallas batched diagonal-block Cholesky + inverse (ops/pallas_chol.py).

Runs in interpreter mode on CPU (the suite's virtual-device platform);
the real-TPU Mosaic path is exercised by the bench and was verified
numerically on TPU v5e (L and L^-1 within ~6e-7 of exact on
well-conditioned blocks; results/ab_r3/pallas_chol_tpu.log).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.ops.linalg import blocked_cholesky
from bark_tpu.ops.pallas_chol import chol_inv_blocks


def _spd(rng, g, bk):
    a = jnp.asarray(rng.normal(size=(g, bk, 16)), jnp.float32)
    return a @ jnp.swapaxes(a, -1, -2) / 16.0 + 0.5 * jnp.eye(
        bk, dtype=jnp.float32
    )


@pytest.mark.parametrize("g,bk", [(6, 64), (8, 128), (3, 64)])
def test_chol_inv_blocks_matches_dense(g, bk):
    rng = np.random.default_rng(0)
    d = _spd(rng, g, bk)
    L, E = chol_inv_blocks(d, interpret=True)
    L_ref = np.asarray(jnp.linalg.cholesky(d))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=5e-5)
    # E is the exact inverse of the emitted factor
    resid = np.asarray(E @ L) - np.eye(bk, dtype=np.float32)
    assert np.abs(resid).max() < 5e-4
    # strictly lower-triangular structure
    assert np.allclose(np.tril(np.asarray(L)), np.asarray(L))


def test_blocked_cholesky_pallas_impl_matches_xla():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(4, 512, 24)), jnp.float32)
    K = a @ jnp.swapaxes(a, -1, -2) / 24.0 + 0.5 * jnp.eye(
        512, dtype=jnp.float32
    )
    for blk in (64, 128):
        L = blocked_cholesky(K, block=blk, impl="pallas", interpret=True)
        L_ref = np.asarray(jnp.linalg.cholesky(K))
        np.testing.assert_allclose(np.asarray(L), L_ref, atol=2e-4)


def test_chol_inv_blocks_pads_ragged_batch():
    rng = np.random.default_rng(2)
    d = _spd(rng, 5, 64)  # 5 % chunk(8) != 0 -> identity padding path
    L, E = chol_inv_blocks(d, interpret=True)
    assert L.shape == d.shape and E.shape == d.shape
    assert np.isfinite(np.asarray(L)).all()
