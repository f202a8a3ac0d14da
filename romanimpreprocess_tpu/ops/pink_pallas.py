"""Fused Pallas TPU kernel for the MXU Cooley-Tukey pink-noise FFT.

``ops.pink.pink_frames``' XLA path runs the two matmul stages, the
twiddle, the output transpose and the mean subtraction as separate HBM
round trips (~31 ms of the 53 ms fill core at 4096^2 on v5e, measured
Aug 19 — the fill runs once for the base L1 and once more inside every
'R' noise layer, so this is the largest single contributor to the
noise-layer budget).  This kernel runs ONE whole transform per grid
step entirely in VMEM: per step it reads a 4 MB white-spectrum block
and writes a 4 MB frame pair; the Cooley-Tukey matmuls, the twiddle,
the stage-2-side transpose and the per-frame mean subtraction never
touch HBM.

Math is identical to ``pink._fft_ct(half=True, both=True)`` plus the
amplitude shaping and mean subtraction of ``pink.pink_frames`` (same
bf16 cast points, f32 accumulation, f32 twiddle); the two paths agree
to MXU accumulation order (gated by ``tests/test_pink_pallas.py``).
Reference behavior: ``noise_1f_frame``, ``from_sim/sim_to_isim.py:265``.

Mosaic notes: all constants enter as arguments with constant index
maps (fetched once, revisited blocks are not re-read); the stage-2
contraction puts the twiddle-factor matrix on the LHS so the output
lands directly in time order (m2, m1) with no in-VMEM transpose.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pink_kernel(w_ref, amp_ref, e1c_ref, e1s_ref, wc_ref, ws_ref,
                 e2c_ref, e2s_ref, out_ref):
    # spectrum shaping (bf16, as in pink.pink_frames)
    cr = w_ref[0, 0] * amp_ref[...]   # (k1=n1, k2=n2) bf16
    ci = w_ref[0, 1] * amp_ref[...]

    def dg(x, e):
        # contract k1: (k1, k2) x (k1, m1) -> (k2, m1), f32 accumulation
        return jax.lax.dot_general(
            x, e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    e1c, e1s = e1c_ref[...], e1s_ref[...]
    ar = dg(cr, e1c) + dg(ci, e1s)    # (k2, m1) f32
    ai = dg(ci, e1c) - dg(cr, e1s)

    wc, ws = wc_ref[...], ws_ref[...]  # (k2, m1) f32 twiddle
    br = (ar * wc + ai * ws).astype(jnp.bfloat16)
    bi = (ai * wc - ar * ws).astype(jnp.bfloat16)

    def dg2(e, x):
        # contract k2 with the small matrix on the LHS:
        # (k2, m2) x (k2, m1) -> (m2, m1) — output already in time order
        return jax.lax.dot_general(
            e, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    e2c, e2s = e2c_ref[...], e2s_ref[...]
    xr = dg2(e2c, br) + dg2(e2s, bi)  # (m2, m1) f32
    xi = dg2(e2c, bi) - dg2(e2s, br)
    out_ref[0, 0] = xr - jnp.mean(xr)
    out_ref[1, 0] = xi - jnp.mean(xi)


@functools.partial(
    jax.jit, static_argnames=("nframes", "nside", "channelwidth",
                              "interpret", "vmem_mb"))
def pink_frames_fused(key, nframes, nside, channelwidth, interpret=False,
                      vmem_mb=100):
    """Drop-in for ``pink.pink_frames`` on its MXU Cooley-Tukey path.

    Requires ``length = 2 * nside * channelwidth`` to be a power of two
    >= ``pink.MXU_MIN_LENGTH`` (the caller gates on the same condition
    the XLA path uses).  Draws the same white spectra from ``key`` as
    the XLA path, so the two backends produce the same frames up to
    matmul accumulation order.
    """
    length = 2 * nside * channelwidth
    n1 = 1 << ((length.bit_length() - 1) // 2)
    n2 = length // n1
    m2 = n2 // 2
    ntr = (nframes + 1) // 2
    bf = jnp.bfloat16

    white = jax.random.normal(key, (ntr, 2, length), dtype=bf)
    white = white.reshape(ntr, 2, n1, n2)

    k_idx = jnp.arange(length, dtype=jnp.float32)
    k_fold = jnp.minimum(k_idx, length - k_idx)
    amp = (1.0e-99 + k_fold) ** (-0.5) / jnp.sqrt(2.0)
    amp = amp.at[0].set(0.0).astype(bf).reshape(n1, n2)

    a1 = jnp.arange(n1, dtype=jnp.float32)
    a2 = jnp.arange(n2, dtype=jnp.float32)
    th1 = (2.0 * jnp.pi / n1) * jnp.outer(a1, a1)
    e1c, e1s = jnp.cos(th1).astype(bf), jnp.sin(th1).astype(bf)
    th2 = (2.0 * jnp.pi / n2) * jnp.outer(a2, a2[:m2])
    e2c, e2s = jnp.cos(th2).astype(bf), jnp.sin(th2).astype(bf)
    thw = (2.0 * jnp.pi / (n1 * n2)) * jnp.outer(a2, a1)
    wc, ws = jnp.cos(thw), jnp.sin(thw)

    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pink_kernel,
        grid=(ntr,),
        in_specs=[
            pl.BlockSpec((1, 2, n1, n2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(n1, n2),           # amp
            const(n1, n1),           # e1c
            const(n1, n1),           # e1s
            const(n2, n1),           # wc
            const(n2, n1),           # ws
            const(n2, m2),           # e2c
            const(n2, m2),           # e2s
        ],
        out_specs=pl.BlockSpec((2, 1, m2, n1), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ntr, m2, n1), jnp.float32),
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(white, amp, e1c, e1s, wc, ws, e2c, e2s)

    # (2, ntr, m2, n1) -> (2*ntr, m2*n1): Re frames then Im frames, the
    # same harvest order as pink.pink_frames' concat
    block = out.reshape(2 * ntr, m2 * n1)[:nframes]
    return block.reshape(nframes, nside, channelwidth)
