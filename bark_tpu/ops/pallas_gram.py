"""Pallas TPU kernel for the forest leaf-agreement Gram matrix.

The XLA path (bark_tpu.forest.gram_from_leaves) computes co-occurrence
counts as a one-hot x one-hot matmul with inner dimension ``m * node_limit``
— MXU-friendly but doing ``node_limit`` times more multiply-accumulates than
information requires. This kernel computes the counts directly on the VPU:

    counts[i, j] = sum_t [leaves1[i, t] == leaves2[j, t]]

tiled over (128, 128) output blocks with a statically unrolled loop over
trees; each step is one broadcast compare-accumulate. For m=50,
node_limit=64 this is ~128x less arithmetic than the one-hot contraction,
and the leaf-id operands are ``node_limit``x smaller in VMEM.

Measured on TPU v5e (2026-08-17): exact parity with the XLA path at all
sizes, but the MXU one-hot matmul is *faster* at production shapes
(1.3 ms vs 3.2 ms at 8192x1024, m=50) — the compare formulation pays for
lane-broadcasts of column slices, while the MXU eats the redundant one-hot
arithmetic for free. The XLA path therefore stays the default; this kernel
is kept as the memory-lean alternative (no ``(N, m*node_limit)`` one-hot
materialization — relevant when N grows past ~10^5) and as the template
for future fused kernels.

Semantics match src/bark/forest.py:78-89 (fraction of trees sharing a
leaf), with the same row/column masking contract as ``gram_from_leaves``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128


def _gram_kernel(l1_ref, l2_ref, out_ref):
    """One (128, 128) output tile: accumulate equality counts over trees.

    The per-tree loop is unrolled statically (m is a static shape; Mosaic
    has no dynamic_slice on values), so each step is one broadcast
    compare-accumulate on the VPU.
    """
    m = l1_ref.shape[-1]
    l1 = l1_ref[:]  # (BN, m) int32
    l2 = l2_ref[:]  # (BM, m) int32
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(m):
        eq = l1[:, t][:, None] == l2[:, t][None, :]
        acc = acc + eq.astype(jnp.float32)
    out_ref[:] = acc


def _pad_rows(a: jax.Array, multiple: int) -> jax.Array:
    n = a.shape[0]
    pad = (-n) % multiple
    if pad:
        # pad with -1: never equal to a valid leaf id in the other operand
        a = jnp.pad(a, ((0, pad), (0, 0)), constant_values=-1)
    return a


@functools.partial(jax.jit, static_argnames=("interpret",))
def counts_from_leaves_pallas(
    leaves1: jax.Array, leaves2: jax.Array, interpret: bool = False
) -> jax.Array:
    """Leaf co-occurrence counts ``(N, M)`` via the Pallas tile kernel.

    ``leaves1`` is ``(N, m)``, ``leaves2`` is ``(M, m)`` int32. Padding rows
    use leaf id -1 in one operand and -2 in the other so cross terms between
    pads never count.
    """
    n, m = leaves1.shape
    mm = leaves2.shape[0]
    l1 = _pad_rows(leaves1.astype(jnp.int32), _BLOCK)
    l2 = jnp.where(
        jnp.arange(((mm + _BLOCK - 1) // _BLOCK) * _BLOCK)[:, None] < mm,
        _pad_rows(leaves2.astype(jnp.int32), _BLOCK),
        -2,
    )
    np_, mp = l1.shape[0], l2.shape[0]
    counts = pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // _BLOCK, mp // _BLOCK),
        in_specs=[
            pl.BlockSpec((_BLOCK, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK, _BLOCK), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(l1, l2)
    return counts[:n, :mm]


def gram_from_leaves_pallas(
    leaves1: jax.Array,
    leaves2: jax.Array,
    mask1: jax.Array | None = None,
    mask2: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Agreement Gram matrix (fraction of trees sharing a leaf), Pallas path.

    Drop-in for :func:`bark_tpu.forest.gram_from_leaves` (which takes the
    same mask contract); ``node_limit`` is not needed because no one-hot is
    materialized.
    """
    m = leaves1.shape[-1]
    counts = counts_from_leaves_pallas(leaves1, leaves2, interpret=interpret)
    sim = counts / m
    if mask1 is not None:
        sim = sim * mask1[:, None].astype(sim.dtype)
    if mask2 is not None:
        sim = sim * mask2[None, :].astype(sim.dtype)
    return sim
