"""Spatially-varying 3x3 inter-pixel-capacitance (IPC) kernels.

Re-implements the reference's ``ipc_fwd`` / ``ipc_rev`` / ``correct_cube``
(``src/romanimpreprocess/utils/ipc_linearity.py:37-187``) as fused JAX
stencils.  The forward operator is

    out[y, x] = sum_{dy,dx in {-1,0,1}} in[y-dy, x-dx] * K[1+dy, 1+dx, y-dy, x-dx]

i.e. each source pixel scatters charge to its neighbors with its *own*
kernel.  The nine shifted multiply-adds are expressed with static pads
and slices, which XLA fuses into a single VPU pass over the image.  The
inverse is the same Neumann series as the reference
(``out <- out + in - K*out``, ``order`` times), exact to
O(alpha^(order+1)).
"""

import jax
import jax.numpy as jnp

_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _shift_zero(arr, dy, dx):
    """shifted[y, x] = arr[y-dy, x-dx], zero outside."""
    ny, nx = arr.shape[-2:]
    pad = [(0, 0)] * (arr.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(arr, pad)
    return p[..., 1 - dy : 1 - dy + ny, 1 - dx : 1 - dx + nx]


def ipc_fwd(image, kernel, gain=None):
    """Apply the IPC kernel to a 2-D image (electrons, or DN if gain given).

    Parameters
    ----------
    image : (ny, nx)
    kernel : (3, 3, ny, nx) with kernel[1+dy, 1+dx, y, x] the fraction of
        pixel (y, x)'s charge appearing at (y+dy, x+dx).
    gain : optional (ny, nx); if given, operates as g^-1 K g (DN space).
    """
    im = image if gain is None else image * gain
    out = im * kernel[1, 1]
    for dy, dx in _SHIFTS:
        out = out + _shift_zero(im * kernel[1 + dy, 1 + dx], dy, dx)
    if gain is not None:
        out = out / gain
    return out


def ipc_rev(image, kernel, order=2, gain=None):
    """Invert the IPC operator by Neumann series to the given order."""
    im = image if gain is None else image * gain
    out = im
    for _ in range(order):
        out = out + im - ipc_fwd(out, kernel)
    if gain is not None:
        out = out / gain
    return out


def correct_cube(data, kernel, gain=None, order=2, nborder=None):
    """IPC-deconvolve every group of a (ngrp, ny, nx) cube.

    The kernel covers only the active region (reference:
    ``correct_cube`` border auto-detect, ``ipc_linearity.py:177``); the
    border columns/rows pass through unchanged.

    Parameters
    ----------
    data : (ngrp, ny, nx) cube (DN if ``gain`` given, else electrons).
    kernel : (3, 3, na, na) active-region IPC kernel.
    gain : optional (na, na) active-region gain (e/DN).
    nborder : border width; inferred from shapes if None.

    Returns the corrected cube (functional; input not mutated).
    """
    ny = data.shape[-2]
    na = kernel.shape[-1]
    nb = (ny - na) // 2 if nborder is None else nborder
    active = data[:, nb : ny - nb, nb : ny - nb]
    # the group axis rides along as a leading batch dim of the stencil:
    # each of the 9 kernel planes is read once per Neumann application
    # for ALL groups (a vmap per group would re-read the 4088^2 kernel
    # planes per group — 6x the HBM traffic of this formulation)
    corr = ipc_rev(active, kernel, order=order, gain=gain)
    if nb == 0:
        return corr
    return data.at[:, nb : ny - nb, nb : ny - nb].set(corr)
