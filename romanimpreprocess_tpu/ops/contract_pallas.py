"""Read-axis contraction of a per-read cube as one fused Pallas pass.

``out[j] = sum_r T[j, r] * x[r]`` — the cumulative-membership
contraction that turns per-read Poisson increments into MultiAccum
resultants (sim accumulator, ``pipeline/sim_to_l1.py``; 'P' noise
layer, ``pipeline/noise.py``; reference semantics
``from_sim/sim_to_isim.py:233-242`` and ``gen_noise_image.py:291-322``).

Why a kernel: the XLA ``dot_general`` form pads the tiny (ngrp, nreads)
operand onto MXU tiles and was measured at ~10 ms for a
(14, 4088, 4088) operand on v5e — ~130 GB/s effective, 6x off HBM
speed-of-light for what is a pure streaming op (read 14 planes, write
ngrp).  Here each grid step holds one (nreads, th, na) row-band in
VMEM and forms the ngrp outputs as unrolled scalar-times-plane FMAs
(VPU cost ~0.3 ms at full frame, bandwidth-bound by design).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _contract_kernel(t_ref, x_ref, o_ref, *, ngrp, nreads):
    x = x_ref[...]  # (nreads, th, na)
    for j in range(ngrp):
        acc = t_ref[j, 0] * x[0]
        for r in range(1, nreads):
            acc = acc + t_ref[j, r] * x[r]
        o_ref[j] = acc


@functools.partial(jax.jit, static_argnames=("th", "interpret", "vmem_mb"))
def contract_reads(T, x, th=32, interpret=False, vmem_mb=100):
    """``einsum('jr,ryx->jyx', T, x)`` as one streaming Pallas pass.

    T : (ngrp, nreads) f32 — static-shaped small matrix.
    x : (nreads, ny, nx) f32 — per-read planes.
    Rows are processed in ``th``-row bands; ``ny`` may be any size
    (the tail band is masked by Pallas' implicit bounds handling via
    padding the row count up).
    """
    ngrp, nreads = T.shape
    nr, ny, nx = x.shape
    assert nr == nreads
    ny_pad = -(-ny // th) * th
    if ny_pad != ny:
        x = jnp.zeros((nreads, ny_pad, nx), x.dtype).at[:, :ny].set(x)
    out = pl.pallas_call(
        functools.partial(_contract_kernel, ngrp=ngrp, nreads=nreads),
        grid=(ny_pad // th,),
        in_specs=[
            pl.BlockSpec((ngrp, nreads), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nreads, th, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ngrp, th, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ngrp, ny_pad, nx), jnp.float32),
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(T.astype(jnp.float32), x.astype(jnp.float32))
    return out[:, :ny]
