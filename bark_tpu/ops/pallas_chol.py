"""Pallas TPU kernel for batched diagonal-block Cholesky + inverse.

Why this exists: the sampler's once-per-step exact refresh is one batched
``(2*chains, N, N)`` Cholesky (``fitting/sampler.py step()``); XLA's TPU
CholeskyExpander runs its column recursion as an in-graph while loop whose
per-iteration latency is fixed regardless of width — at N=1024, batch 128
that is ~55 ms, 78% of the whole MCMC step (results/ab_r3/scanstruct.txt),
and an XLA-level re-blocking doesn't help because every panel still pays
the same loop latency (results/ab_r4/ab_cholblock.jsonl). The reference
has no analogue (its Numba sampler factors one small matrix at a time on
the CPU, src/bark/fitting/bark_sampler.py:153-162); this is a TPU-native
cost and needs a TPU-native fix.

STATUS — measured LOSER as the sampler-refresh default (kept opt-in).
The full-bench A/B on TPU v5e (results/ab_r4/ab_cholblock.jsonl) has this
kernel at 1158.7/516.9 steps/s (N=512/1024) vs 1934.9/839.3 for XLA's
plain expander: the in-scan refresh shape is (2, N, N) per chain under
vmap, and at batch 128 the expander's column loop is already amortized
across the batch, while this kernel's small panels force extra
HBM<->VMEM round-trips per panel. Correctness is fully tested
(tests/ops/test_pallas_chol.py); do NOT route the sampler through it by
default without a full-bench A/B win recorded under results/.

The fix splits the factorization the way the hardware wants:

  - ``ops/linalg.blocked_cholesky(impl="pallas")`` keeps the O(N^3) panel
    solves and trailing SYRK updates in XLA as big MXU matmuls;
  - the only inherently sequential piece — the BK x BK diagonal-block
    factorization — runs HERE, as one Pallas kernel whose column loop is
    real machine code over VMEM-resident tiles (no per-iteration dispatch).

The kernel produces BOTH the block factor L (as L^T — sublane-dynamic row
stores; the wrapper transposes) and its inverse L^-1 in the same column
loop (forward Gauss elimination of [A | I] restricted to the lower
triangle), so the XLA-level panel solve is a plain matmul ``A21 @ L^-T``
instead of a latency-bound TriangularSolve.

The working matrix stays symmetric under rank-1 Schur updates, so "column
j" is read as row j (a cheap sublane slice); all per-column updates are
full-tile VPU ops with iota masks — fixed shapes, no scatter, no gather.
Mosaic note: state lives in VMEM refs (scratch + outputs), not in
fori_loop carries — dynamic row slicing is only supported on refs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(d_ref, lt_ref, e_ref, a_ref):
    """Factor a (CB, BK, BK) batch of SPD blocks: L^T and L^-1 together.

    Invariants at iteration j (per batch element):
      - ``a_ref`` holds the Schur complement in rows/cols > j-1
        (symmetric); rows/cols < j are stale and masked out of every read.
      - ``lt_ref`` rows 0..j-1 hold L^T (row i = column i of L).
      - ``e_ref`` rows 0..j-1 hold L^-1; rows >= j hold I minus the
        eliminations applied so far (forward-substitution state).
    """
    cb, bk, _ = a_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)  # (1, BK)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
    a_ref[:] = d_ref[:]
    e_ref[:] = jnp.broadcast_to(
        jnp.where(rows2 == cols2, 1.0, 0.0).astype(d_ref.dtype)[None],
        (cb, bk, bk),
    )

    def body(j, _):
        # column j of the (symmetric) working matrix == its row j
        aj = a_ref[:, pl.ds(j, 1), :][:, 0, :]  # (CB, BK)
        djj = jnp.sum(jnp.where(lane == j, aj, 0.0), axis=-1)  # (CB,)
        inv_d = 1.0 / jnp.sqrt(djj)
        lcol = jnp.where(lane >= j, aj, 0.0) * inv_d[:, None]  # (CB, BK)
        lstrict = jnp.where(lane > j, lcol, 0.0)
        lt_ref[:, pl.ds(j, 1), :] = lcol[:, None, :]  # L^T row j
        # rank-1 Schur update of the trailing block (rows masked by
        # lstrict's zeros, cols by the lane mask)
        lsub = lstrict[:, :, None]  # sublane-oriented copy (relayout)
        a_ref[:] = a_ref[:] - jnp.where(
            lane[None] > j, lsub * lstrict[:, None, :], 0.0
        )
        # forward elimination of [ . | I ] -> L^-1, same column's work;
        # lsub is zero in rows <= j, so row j survives the subtraction
        # and is then overwritten with its scaled value.
        erow = e_ref[:, pl.ds(j, 1), :] * inv_d[:, None, None]  # (CB,1,BK)
        e_ref[:] = e_ref[:] - lsub * erow
        e_ref[:, pl.ds(j, 1), :] = erow
        return 0

    jax.lax.fori_loop(0, bk, body, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def chol_inv_blocks(
    d: jax.Array, chunk: int = 8, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Batched Cholesky of SPD blocks, returning ``(L, L^-1)``.

    ``d`` is ``(G, BK, BK)`` float32; the grid runs over G in chunks of
    ``chunk`` (padded with identity blocks so no NaN leaks in). BK should
    be a multiple of the sublane tile (8) — in practice 64 or 128.
    """
    g, bk, _ = d.shape
    pad = (-g) % chunk
    if pad:
        eye = jnp.broadcast_to(jnp.eye(bk, dtype=d.dtype), (pad, bk, bk))
        d = jnp.concatenate([d, eye], axis=0)
    gp = d.shape[0]
    spec = pl.BlockSpec((chunk, bk, bk), lambda i: (i, 0, 0))
    lt, e = pl.pallas_call(
        _chol_inv_kernel,
        grid=(gp // chunk,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((gp, bk, bk), d.dtype),
            jax.ShapeDtypeStruct((gp, bk, bk), d.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((chunk, bk, bk), d.dtype)],
        interpret=interpret,
    )(d)
    return jnp.swapaxes(lt[:g], -1, -2), e[:g]
