"""Linearity correction and its fixed-iteration inverse.

Re-implements the reference's ``linearity`` / ``multilin`` /
``invlinearity`` (``src/romanimpreprocess/utils/ipc_linearity.py:234-392``).

The calibration model: raw signal S (DN_raw) maps to linearized signal
(DN_lin) through a per-pixel Legendre expansion on the rescaled variable

    z = -1 + 2 (S - Smin) / (Smax - Smin).

The inverse (used in L1 synthesis) is a *fixed 24-iteration bisection*
on z in (-1, 1) — the reference's author-flagged slowest step
(``ipc_linearity.py:369-371``).  Here the 24 iterations are a
deliberately UNROLLED Python loop (see ``invert_linearity``: a
``fori_loop`` body would re-read the coefficient stack from HBM every
iteration): fully branch-free, vectorized over all pixels at once, and
fused by XLA.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dqflags import pixel
from .legendre import legendre_eval


class LinearityData(NamedTuple):
    """Device-resident linearity calibration arrays (full frame)."""

    coefs: jnp.ndarray  # (order+1, ny, nx) Legendre coefficients
    smin: jnp.ndarray  # (ny, nx) DN at z=-1
    smax: jnp.ndarray  # (ny, nx) DN at z=+1
    sref: jnp.ndarray  # (ny, nx) DN corresponding to 0 e in well
    dq: jnp.ndarray  # (ny, nx) uint32


def rescale(S, lin):
    """S (DN_raw) -> z in the Legendre domain."""
    return -1.0 + 2.0 * (S - lin.smin) / (lin.smax - lin.smin)


def apply_linearity(S, lin):
    """Linearize a single 2-D frame.  Returns (Slin, dq).

    Mirrors reference ``linearity`` (``ipc_linearity.py:234-273``):
    evaluates the expansion with linear extrapolation and ORs
    NO_LIN_CORR into the calibration dq where extrapolating.
    """
    phi, exflag = legendre_eval(rescale(S, lin), lin.coefs)
    dq = lin.dq | jnp.where(exflag, jnp.uint32(pixel.NO_LIN_CORR), jnp.uint32(0))
    return phi, dq


def apply_linearity_cube(S, lin, do_not_flag_first=True, attempt_corr=None):
    """Linearize a (ngrp, ny, nx) cube.  Returns (Slin cube, dq 2-D).

    Semantics follow reference ``multilin``
    (``ipc_linearity.py:276-344``):

    - group 0's z is clipped to [-1, 1] when ``do_not_flag_first`` (the
      reset read is out of range by construction and unused),
    - pixels whose calibration dq carries NO_LIN_CORR or
      REFERENCE_PIXEL fall back to ``S - Sref``,
    - extrapolation flags NO_LIN_CORR, gated by ``attempt_corr`` (e.g.
      "don't flag saturated pixels") and skipping group 0 when
      ``do_not_flag_first``.

    The accumulated dq is computed alongside the per-group evaluation;
    the fallback uses the *calibration* dq (as in the reference, where
    flags accumulate into the same array across the group loop — but
    NO_LIN_CORR from extrapolation in an early group then triggers the
    fallback for later groups; we reproduce that with a scan).
    """
    ngrp = S.shape[0]
    if attempt_corr is None:
        attempt_corr = jnp.ones(S.shape, dtype=bool)

    fallback_bits = jnp.uint32(pixel.NO_LIN_CORR | pixel.REFERENCE_PIXEL)

    # All groups evaluate in one batched pass; the reference's
    # sequential dq feedback (an extrapolation flag raised in an early
    # group triggers the fallback for later groups) is an exclusive
    # prefix-OR of the new flags over the group axis — no scan needed.
    z = rescale(S, lin)
    if do_not_flag_first:
        z = z.at[0].set(jnp.clip(z[0], -1.0, 1.0))
    phi, exflag = legendre_eval(z, lin.coefs[:, None])
    newflag = exflag & attempt_corr
    if do_not_flag_first:
        newflag = newflag.at[0].set(False)
    # exclusive prefix OR: has an earlier group flagged this pixel?
    prefix = jnp.cumsum(newflag.astype(jnp.int32), axis=0) - newflag
    dq_j = lin.dq[None] | jnp.where(
        prefix > 0, jnp.uint32(pixel.NO_LIN_CORR), jnp.uint32(0)
    )
    phi = jnp.where(
        (dq_j & fallback_bits) == 0, phi, S - lin.sref
    ).astype(jnp.float32)
    dq = lin.dq | jnp.where(
        jnp.any(newflag, axis=0), jnp.uint32(pixel.NO_LIN_CORR), jnp.uint32(0)
    )
    return phi, dq


def invert_linearity(Slin, lin, niter=24):
    """DN_lin -> DN_raw by bisection on z in (-1, 1).

    Same contraction as the reference (``ipc_linearity.py:380-391``):
    after iteration j the step is 1/2**j, j = 1..niter, so z lands within
    2**-niter of the monotone root (and saturates at the domain edge
    automatically).  Extrapolation is disabled inside the search.

    Returns (S_raw, exflag) with exflag True where the final evaluation
    was out of range (mirrors the reference's last-iteration flag).

    The iteration count is static, so the loop unrolls at trace time:
    a ``fori_loop`` body is one full HBM pass per iteration (the
    coefficient stack alone is re-read 24 times, ~27 GB at 4096^2 x 6
    groups), while the unrolled chain is a single fused elementwise
    program that streams every array once.
    """
    z = jnp.zeros_like(Slin)
    exflag = jnp.zeros(Slin.shape, dtype=bool)
    for j in range(1, niter + 1):
        phi, exflag = legendre_eval(z, lin.coefs, linextrap=False)
        step = jnp.float32(0.5 ** j)
        z = z + jnp.where(phi < Slin, step, -step)
    S = lin.smin + 0.5 * (lin.smax - lin.smin) * (1.0 + z)
    return S, exflag
