"""Pallas TPU kernel for exact block nanmedians.

``sky.block_nanmedian`` in XLA costs ~14 ms in-core at 4096^2 with
N=8: the (N, ky, N, kx) view splits the lane dimension at 511-element
boundaries, forcing layout transforms on every one of the 32 bisection
rounds.  This kernel loads one row of blocks into VMEM per grid step
and runs the whole 32-round bit-bisection there: the frame streams
from HBM exactly once (plus one host-side layout pass to the
(by, bx, ky, kxp) block order, instead of 32 in-loop transforms).

Same math as ``sky.block_nanmedian`` (bit-identical): the two middle
order statistics of each block's float total order are found one bit
at a time and averaged, NaNs excluded (all-NaN blocks -> NaN).

Mosaic notes: intermediates are kept >= 2-D (no 1-D vectors), bit
shifts are trace-time literals, and block slicing happens outside the
kernel (non-128-aligned in-kernel lane slices abort the compiler).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sky import _float_order_key, _key_to_float


def _blockmed_kernel(x_ref, out_ref, *, N):
    blocks = x_ref[0]  # (N, ky, kxp) f32 — one row of blocks
    keys = _float_order_key(blocks)

    valid = (~jnp.isnan(blocks)).astype(jnp.int32)
    cnt = jnp.sum(jnp.sum(valid, axis=2), axis=1, keepdims=True)  # (N, 1)
    cntT = cnt.T  # (1, N)
    k_lo = jnp.maximum((cntT - 1) // 2, 0)
    k_hi = cntT // 2
    k_targets = jnp.concatenate([k_lo, k_hi], axis=0)  # (2, N)

    m = jnp.zeros((2, N), jnp.uint32)
    for i in range(32):
        cand = m | jnp.uint32(1 << (31 - i))
        ind = (keys[None] < cand[:, :, None, None]).astype(jnp.int32)
        count = jnp.sum(jnp.sum(ind, axis=3), axis=2)  # (2, N)
        m = jnp.where(count <= k_targets, cand, m)

    vals = _key_to_float(m)  # (2, N)
    med = 0.5 * (vals[0:1] + vals[1:2])  # (1, N)
    med = jnp.where(cntT > 0, med, jnp.nan)
    out_ref[...] = jnp.pad(med, ((0, 7), (0, 128 - N)))[None]


@functools.partial(jax.jit, static_argnames=("N", "interpret", "vmem_mb"))
def block_nanmedian_fused(arr, N, interpret=False, vmem_mb=96):
    """Drop-in for ``sky.block_nanmedian`` (TPU Pallas path).

    Lane-pads each block to a 128 multiple with NaN (excluded from the
    counts) so any block WIDTH works; the block-count-per-side N is
    capped at 128 by the (8, 128) output tile — finer sky grids must
    use the dense ``sky.block_nanmedian`` (``pallas=False``).
    """
    if N > 128:
        raise ValueError(
            f"block_nanmedian_fused supports at most 128 blocks per "
            f"side (got N={N}); use sky.block_nanmedian (pallas=False)"
        )
    ny, nx = arr.shape
    ky, kx = ny // N, nx // N
    py, px = (ny % N) // 2, (nx % N) // 2
    a = arr[py : py + N * ky, px : px + N * kx].astype(jnp.float32)

    kxp = ((kx + 127) // 128) * 128
    if kxp != kx:
        a = jnp.concatenate(
            [
                jnp.pad(a[:, b * kx : (b + 1) * kx],
                        [(0, 0), (0, kxp - kx)],
                        constant_values=jnp.nan)
                for b in range(N)
            ],
            axis=1,
        )
    # one host-side layout pass to (by, bx, ky, kxp) block order
    a4 = a.reshape(N, ky, N, kxp).swapaxes(1, 2)

    out = pl.pallas_call(
        functools.partial(_blockmed_kernel, N=N),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, N, ky, kxp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.float32),
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(a4)
    return out[:, 0, :N]
