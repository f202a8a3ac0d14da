"""Fused Pallas TPU kernel for the cube linearity correction.

``apply_linearity_cube`` (ops.linearity) is HBM-bound: the XLA
elementwise fusion evaluates each output pixel independently, so the
(order+1)-plane coefficient stack is re-read for every group
(~4.4 GB of traffic at 4096^2 x 6 groups, ~10 ms on v5e).  This kernel
tiles rows and keeps the whole group axis in VMEM, so the coefficient
stack (and the smin/smax/sref/dq planes) stream from HBM exactly once
(~1.6 GB).

Semantics are identical to ``linearity.apply_linearity_cube``
(reference ``ipc_linearity.py:276-344``): group-0 clip, linear
extrapolation flagging gated by ``attempt``, the sequential
dq-feedback fallback (an early group's extrapolation flag switches
later groups to S - Sref), and the accumulated NO_LIN_CORR plane.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dqflags import pixel
from .legendre import legendre_eval

_NLC = int(pixel.NO_LIN_CORR)
_FALLBACK = int(pixel.NO_LIN_CORR | pixel.REFERENCE_PIXEL)


def _lin_kernel(s_ref, coef_ref, smin_ref, smax_ref, sref_ref, dq_ref,
                att_ref, phi_ref, dqo_ref, *, do_not_flag_first):
    S = s_ref[...]            # (G, th, W) f32
    smin = smin_ref[...]      # (th, W)
    smax = smax_ref[...]
    dq = dq_ref[...]          # (th, W) uint32

    z = -1.0 + 2.0 * (S - smin[None]) / (smax - smin)[None]
    if do_not_flag_first:
        z = jnp.concatenate([jnp.clip(z[0:1], -1.0, 1.0), z[1:]], axis=0)
    phi, exflag = legendre_eval(z, coef_ref[...][:, None])
    new = exflag & (att_ref[...] != 0)
    if do_not_flag_first:
        new = jnp.concatenate(
            [jnp.zeros_like(new[0:1]), new[1:]], axis=0
        )

    fallback = S - sref_ref[...][None]
    acc = jnp.zeros(dq.shape, bool)
    outs = []
    for g in range(S.shape[0]):
        # dq as seen by group g: calibration dq + flags raised by
        # earlier groups (the reference's sequential feedback)
        dq_g = dq | jnp.where(acc, jnp.uint32(_NLC), jnp.uint32(0))
        outs.append(
            jnp.where(
                (dq_g & jnp.uint32(_FALLBACK)) == 0, phi[g], fallback[g]
            ).astype(jnp.float32)
        )
        acc = acc | new[g]
    phi_ref[...] = jnp.stack(outs)
    dqo_ref[...] = dq | jnp.where(acc, jnp.uint32(_NLC), jnp.uint32(0))


@functools.partial(
    jax.jit,
    static_argnames=("do_not_flag_first", "th", "interpret", "vmem_mb"),
)
def apply_linearity_cube_fused(S, lin, attempt, do_not_flag_first=True,
                               th=8, interpret=False, vmem_mb=64):
    """Fused drop-in for ``linearity.apply_linearity_cube``.

    ``lin`` is a ``linearity.LinearityData``; ``attempt`` is the
    (ngrp, ny, nx) boolean attempt-correction gate.  Returns
    (Slin cube f32, accumulated dq plane uint32).
    """
    ngrp, ny, nx = S.shape
    nc = lin.coefs.shape[0]

    rows = ((ny + th - 1) // th) * th
    cols = ((nx + 127) // 128) * 128
    if rows != ny or cols != nx:
        pad = [(0, rows - ny), (0, cols - nx)]
        S = jnp.pad(S, [(0, 0)] + pad)
        coefs = jnp.pad(lin.coefs, [(0, 0)] + pad)
        smin = jnp.pad(lin.smin, pad)
        smax = jnp.pad(lin.smax, pad, constant_values=1.0)
        sref = jnp.pad(lin.sref, pad)
        dq = jnp.pad(lin.dq, pad)
        attempt = jnp.pad(attempt, [(0, 0)] + pad)
        nx_k = cols
    else:
        coefs, smin, smax, sref, dq = (
            lin.coefs, lin.smin, lin.smax, lin.sref, lin.dq
        )
        nx_k = nx

    g3 = lambda i: (0, i, 0)  # noqa: E731
    g2 = lambda i: (i, 0)  # noqa: E731
    cube = lambda n: pl.BlockSpec((n, th, nx_k), g3, memory_space=pltpu.VMEM)  # noqa: E731
    plane = pl.BlockSpec((th, nx_k), g2, memory_space=pltpu.VMEM)

    phi, dqo = pl.pallas_call(
        functools.partial(_lin_kernel, do_not_flag_first=do_not_flag_first),
        grid=(rows // th,),
        in_specs=[cube(ngrp), cube(nc), plane, plane, plane, plane,
                  cube(ngrp)],
        out_specs=[cube(ngrp), plane],
        out_shape=[
            jax.ShapeDtypeStruct((ngrp, rows, nx_k), jnp.float32),
            jax.ShapeDtypeStruct((rows, nx_k), jnp.uint32),
        ],
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(S.astype(jnp.float32), coefs, smin, smax, sref, dq,
      attempt.astype(jnp.int8))
    return phi[:, :ny, :nx], dqo[:ny, :nx]
