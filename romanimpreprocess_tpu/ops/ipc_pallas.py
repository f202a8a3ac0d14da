"""Fused Pallas TPU kernel for the order-2 IPC inverse.

The L1->L2 hot spot after the ramp fit is IPC deconvolution: the
Neumann-series inverse ``out = 3y - 3Ky + K^2 y`` applied to every
group, where K is the spatially-varying 3x3 kernel (9 full-frame
planes).  The XLA stencil formulation (ops.ipc) materializes an
intermediate per shifted tap, so the cube and kernel stream through HBM
~10x more than necessary.

The kernel works on row slabs in the cube's natural
(groups, rows, columns) layout with the 2-row halo supplied by three
shifted BlockSpec windows; both K applications happen in VMEM per grid
step.  Row shifts are middle-dim slices, column shifts are lane
shifts, and the halos live in the padded HBM arrays so edge behavior
matches the zero-fill stencil exactly (zero kernel entries kill
out-of-range taps).  An earlier manual-DMA variant (single HBM read of
cube+kernel) faulted when compiled on v5e and was removed — the
standard pipelined block machinery is the supported path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import hostcache

#: tap order: index t corresponds to (dy, dx) = TAPS[t]
TAPS = [
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1),
    (1, -1), (1, 0), (1, 1),
]


def _pad_geom(na, th):
    """(rows_out, width, n_tiles, rows_in) of the padded slab layout."""
    rows_out = ((na + th - 1) // th) * th
    width = ((na + 4 + 127) // 128) * 128
    n_tiles = rows_out // th
    rows_in = (n_tiles + 2) * th
    return rows_out, width, n_tiles, rows_in


# each 4096^2 padded slab is ~0.6 GB host RAM — hold at most two
_PAD_CACHE = hostcache.BoundedCache(2)


def kernel_planes_padded(kernel, th=32):
    """Host-side pre-padded (9, rows_in, width) kernel-plane buffer.

    The IPC kernel is calibration data — constant across exposures — but
    the blocked Pallas kernels need it in the padded slab layout, and
    building that inside the jitted calibration core costs a ~0.6 GB
    materialization per dispatch.  Padding once per cal pack here (id-
    keyed cache) and passing the result as the ``kernel`` argument of
    :func:`ipc_rev2_cube_blocked` / :func:`ipc_fwd_cube_blocked` (both
    accept the 3-D padded form when built with the same ``th``) removes
    that per-exposure work.
    """
    na = kernel.shape[-1]
    ck = (id(kernel), th)
    hit = _PAD_CACHE.get(ck)
    if hit is not None:
        return hit[0]
    _, width, _, rows_in = _pad_geom(na, th)
    kp = np.zeros((9, rows_in, width), np.float32)
    kp[:, th : th + na, 2 : 2 + na] = np.asarray(
        kernel, np.float32
    ).reshape(9, na, na)
    # strong ref to `kernel` guards the id key (hostcache holds the
    # value; see utils.hostcache for the concurrency contract)
    return _PAD_CACHE.put(ck, (kp, kernel))[0]


def _kernel_padded_or_pad(kernel, na, th, width, rows_in):
    """Accept either the raw (3, 3, na, na) kernel (padded here, inside
    the jit) or a pre-padded (9, rows_in, width) buffer from
    :func:`kernel_planes_padded` (validated against this call's slab
    geometry, i.e. the same ``th``)."""
    if kernel.ndim == 3:
        if kernel.shape != (9, rows_in, width):
            raise ValueError(
                f"pre-padded kernel shape {kernel.shape} does not match "
                f"slab geometry {(9, rows_in, width)} (built with a "
                f"different th?)"
            )
        return kernel
    kp = jnp.zeros((9, rows_in, width), dtype=jnp.float32)
    return kp.at[:, th : th + na, 2 : 2 + na].set(kernel.reshape(9, na, na))


def _shift_cols(arr, dx):
    """shifted[..., x] = arr[..., x - dx] (circular).

    The wrap-around only pollutes the first/last padded halo column,
    which is outside the valid output region, so a cheap lane roll
    replaces a zero-fill pad+slice.
    """
    if dx == 0:
        return arr
    return jnp.roll(arr, dx, axis=-1)


def _apply_k_gslab(y, k, rows_out):
    """One K application on a natural-layout slab.

    y: (G, R, W), k: (9, R, W).  Output rows [1, 1+rows_out) of the
    slab are valid: out[:, r] = sum_t shift(y[:, r-dy] * k[t, r-dy], dx).
    Returns (G, rows_out, W) starting at slab row 1.
    """
    out = None
    for t, (dy, dx) in enumerate(TAPS):
        src = slice(1 - dy, 1 - dy + rows_out)
        prod = y[:, src] * k[t : t + 1, src]
        term = _shift_cols(prod, dx)
        out = term if out is None else out + term
    return out


def _ipc_kernel_blocked(ya, yc, yb, ka, kc, kb, out_ref, *, th):
    """Blocked variant in the cube's natural (G, rows, W) layout: the
    row halo comes from three shifted BlockSpec windows on the middle
    axis (above/center/below) instead of manual DMA, so the caller
    never transposes the cube or the kernel stack."""
    y = jnp.concatenate([ya[...], yc[...], yb[...]], axis=1)  # (G, 3th, W)
    k = jnp.concatenate([ka[...], kc[...], kb[...]], axis=1)  # (9, 3th, W)
    # output science rows = slab rows [th, 2th); slab offset th-2
    # (a needs rows [th-1, 2th+1))
    y2 = y[:, th - 2 : 2 * th + 2]
    k2 = k[:, th - 2 : 2 * th + 2]
    a = _apply_k_gslab(y2, k2, th + 2)
    b = _apply_k_gslab(a, k2[:, 1 : th + 3], th)
    out_ref[...] = 3.0 * y2[:, 2 : th + 2] - 3.0 * a[:, 1 : th + 1] + b


@functools.partial(jax.jit, static_argnames=("th", "interpret", "vmem_mb"))
def ipc_rev2_cube_blocked(cube, kernel, gain=None, th=16, interpret=False,
                          vmem_mb=96):
    """Order-2 IPC inverse via shifted-BlockSpec halos (no manual DMA).

    Reads the cube and kernel three times each (the halo windows) but
    uses only the standard pipelined block machinery and the cube's
    natural (G, rows, W) layout — no transposes on the hot path.
    ``gain`` conjugation (DN space) is fused into the pad-embed and
    the un-pad, so the caller needs no extra full-cube passes.
    """
    ngrp, na, _ = cube.shape
    y = cube if gain is None else cube * gain

    rows_out, width, n_tiles, rows_in = _pad_geom(na, th)

    # th leading pad rows, science at [th, th+na), pad to (n_tiles+2)*th
    yp = jnp.zeros((ngrp, rows_in, width), dtype=jnp.float32)
    yp = yp.at[:, th : th + na, 2 : 2 + na].set(y)
    kp = _kernel_padded_or_pad(kernel, na, th, width, rows_in)

    yspec = [
        pl.BlockSpec((ngrp, th, width), (lambda i, d=d: (0, i + d, 0)),
                     memory_space=pltpu.VMEM)
        for d in (0, 1, 2)
    ]
    kspec = [
        pl.BlockSpec((9, th, width), (lambda i, d=d: (0, i + d, 0)),
                     memory_space=pltpu.VMEM)
        for d in (0, 1, 2)
    ]
    out = pl.pallas_call(
        functools.partial(_ipc_kernel_blocked, th=th),
        grid=(n_tiles,),
        in_specs=yspec + kspec,
        out_specs=pl.BlockSpec(
            (ngrp, th, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ngrp, rows_out, width), jnp.float32),
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(yp, yp, yp, kp, kp, kp)

    res = out[:, :na, 2 : 2 + na]
    if gain is not None:
        res = res / gain
    return res


def _ipc_kernel_stream(y_ref, k_ref, out_ref, y_ring, k_ring, *, th,
                       n_tiles):
    """Single-read streaming variant: each grid step loads ONE tile of
    the cube and kernel (vs the blocked kernel's three shifted halo
    windows = 3x HBM traffic, ~2.3 GB extra per call at 4096^2) into a
    3-slot VMEM ring; the output for tile i-2 is computed once its
    bottom halo (tile i) has arrived.  Identical math to
    :func:`_ipc_kernel_blocked`."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 3)
    y_ring[slot] = y_ref[...]
    k_ring[slot] = k_ref[...]

    @pl.when(i >= 2)
    def _():
        s0 = jax.lax.rem(i + 1, 3)  # (i-2) mod 3
        s1 = jax.lax.rem(i + 2, 3)  # (i-1) mod 3
        y = jnp.concatenate([y_ring[s0], y_ring[s1], y_ring[slot]],
                            axis=1)  # (G, 3th, W)
        k = jnp.concatenate([k_ring[s0], k_ring[s1], k_ring[slot]],
                            axis=1)
        y2 = y[:, th - 2 : 2 * th + 2]
        k2 = k[:, th - 2 : 2 * th + 2]
        a = _apply_k_gslab(y2, k2, th + 2)
        b = _apply_k_gslab(a, k2[:, 1 : th + 3], th)
        out_ref[...] = 3.0 * y2[:, 2 : th + 2] - 3.0 * a[:, 1 : th + 1] + b


@functools.partial(jax.jit, static_argnames=("th", "interpret", "vmem_mb"))
def ipc_rev2_cube_stream(cube, kernel, gain=None, th=16, interpret=False,
                         vmem_mb=96):
    """Order-2 IPC inverse, single-read streaming form.

    Same contract and math as :func:`ipc_rev2_cube_blocked` (bit-
    identical output) but the cube and the 9 kernel planes stream from
    HBM exactly once: the row halo is carried in a VMEM ring buffer
    across sequential grid steps instead of three overlapping
    BlockSpec windows.  The output block index is clamped while the
    ring warms up (steps 0-1 compute nothing; their out block is
    overwritten by step 2 before the first flush)."""
    ngrp, na, _ = cube.shape
    y = cube if gain is None else cube * gain

    rows_out, width, n_tiles, rows_in = _pad_geom(na, th)

    yp = jnp.zeros((ngrp, rows_in, width), dtype=jnp.float32)
    yp = yp.at[:, th : th + na, 2 : 2 + na].set(y)
    kp = _kernel_padded_or_pad(kernel, na, th, width, rows_in)

    out = pl.pallas_call(
        functools.partial(_ipc_kernel_stream, th=th, n_tiles=n_tiles),
        grid=(n_tiles + 2,),
        in_specs=[
            pl.BlockSpec((ngrp, th, width), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, th, width), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ngrp, th, width),
            lambda i: (0, jnp.maximum(i - 2, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ngrp, rows_out, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ngrp, th, width), jnp.float32),
            pltpu.VMEM((3, 9, th, width), jnp.float32),
        ],
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(yp, kp)

    res = out[:, :na, 2 : 2 + na]
    if gain is not None:
        res = res / gain
    return res


def _ipc_fwd_kernel_blocked(ya, yc, yb, ka, kc, kb, out_ref, *, th):
    """Single forward K application (same slab/halo layout as the
    order-2 inverse kernel)."""
    y = jnp.concatenate([ya[...], yc[...], yb[...]], axis=1)
    k = jnp.concatenate([ka[...], kc[...], kb[...]], axis=1)
    y2 = y[:, th - 2 : 2 * th + 2]
    k2 = k[:, th - 2 : 2 * th + 2]
    a = _apply_k_gslab(y2, k2, th + 2)
    out_ref[...] = a[:, 1 : th + 1]


@functools.partial(jax.jit, static_argnames=("th", "interpret", "vmem_mb"))
def ipc_fwd_cube_blocked(cube, kernel, gain=None, th=32, interpret=False,
                         vmem_mb=128):
    """Forward IPC (``ops.ipc.ipc_fwd``) as one fused Pallas pass.

    The XLA stencil materializes an intermediate per shifted tap
    (9 full-cube HBM round trips, ~19 ms for a 6-group 4088^2 batch on
    v5e); this kernel streams the cube and the 9 kernel planes once
    per halo window.  Used by the sim's IL forward model
    (reference ``ipc_linearity.IL.apply:481-483``).
    """
    ngrp, na, _ = cube.shape
    y = cube if gain is None else cube * gain

    rows_out, width, n_tiles, rows_in = _pad_geom(na, th)

    yp = jnp.zeros((ngrp, rows_in, width), dtype=jnp.float32)
    yp = yp.at[:, th : th + na, 2 : 2 + na].set(y)
    kp = _kernel_padded_or_pad(kernel, na, th, width, rows_in)

    yspec = [
        pl.BlockSpec((ngrp, th, width), (lambda i, d=d: (0, i + d, 0)),
                     memory_space=pltpu.VMEM)
        for d in (0, 1, 2)
    ]
    kspec = [
        pl.BlockSpec((9, th, width), (lambda i, d=d: (0, i + d, 0)),
                     memory_space=pltpu.VMEM)
        for d in (0, 1, 2)
    ]
    out = pl.pallas_call(
        functools.partial(_ipc_fwd_kernel_blocked, th=th),
        grid=(n_tiles,),
        in_specs=yspec + kspec,
        out_specs=pl.BlockSpec(
            (ngrp, th, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ngrp, rows_out, width), jnp.float32),
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(yp, yp, yp, kp, kp, kp)

    res = out[:, :na, 2 : 2 + na]
    if gain is not None:
        res = res / gain
    return res


def correct_cube_fused(data, kernel, gain=None, nborder=None, th=8,
                       interpret=False):
    """Drop-in fused replacement for ``ops.ipc.correct_cube`` (order 2).

    Uses the blocked (shifted-BlockSpec) kernel — the variant validated
    on hardware (1.5x the XLA stencil at full frame on v5e).
    """
    ny = data.shape[-2]
    na = kernel.shape[-1]
    nb = (ny - na) // 2 if nborder is None else nborder
    active = data[:, nb : ny - nb, nb : ny - nb]
    corr = ipc_rev2_cube_blocked(active, kernel, gain=gain, th=th,
                                 interpret=interpret)
    if nb == 0:
        return corr
    return data.at[:, nb : ny - nb, nb : ny - nb].set(corr)


# --------------------------------------------------------------------------
# Frame-resident streaming variant (opt-in: IPC_BACKEND 'pallas-frame')
# --------------------------------------------------------------------------

def kernel_planes_frame(kernel, nside, nborder=4):
    """Host-side (9, nside, nside) kernel planes, border ZERO.

    The zero border IS the zero-fill edge semantics of the reference
    stencil (``utils/ipc_linearity.py:102-148``): any tap sourcing a
    border pixel — including the lane-roll wrap-around at the frame
    edge — multiplies a zero weight, so the frame kernel can read the
    raw full-frame cube with no pad-embed/unpad passes.  Cached per cal
    pack (id-keyed, same contract as :func:`kernel_planes_padded`).
    """
    na = kernel.shape[-1]
    ck = (id(kernel), nside, nborder, "frame")
    hit = _PAD_CACHE.get(ck)
    if hit is not None:
        return hit[0]
    kp = np.zeros((9, nside, nside), np.float32)
    kp[:, nborder : nborder + na, nborder : nborder + na] = np.asarray(
        kernel, np.float32
    ).reshape(9, na, na)
    return _PAD_CACHE.put(ck, (kp, kernel))[0]


def _ipc_kernel_frame(d_ref, k_ref, g_ref, out_ref, d_ring, k_ring,
                      g_ring, *, th, nb, nside):
    """Streaming order-2 inverse over the RAW full frame.

    Step i loads frame tile i into a 3-slot ring; output tile i-1 is
    computed once its bottom halo (tile i) has arrived.  Gain
    conjugation (DN space) happens in VMEM: y = d * g on the slab,
    result / g on the center tile.  Border rows/cols pass the input
    through untouched (the reference applies IPC to the active region
    only); the where() mask also discards the only outputs that can
    touch the warm-up ring garbage or the clamped duplicate bottom
    halo (all of them land in border rows — see the call site note).
    """
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 3)
    d_ring[slot] = d_ref[...]
    k_ring[slot] = k_ref[...]
    g_ring[slot] = g_ref[...]

    @pl.when(i >= 1)
    def _():
        s0 = jax.lax.rem(i + 1, 3)  # tile i-2 (top halo; garbage at i=1)
        s1 = jax.lax.rem(i + 2, 3)  # tile i-1 (center = output tile)
        d = jnp.concatenate([d_ring[s0], d_ring[s1], d_ring[slot]],
                            axis=1)  # (G, 3th, W)
        k = jnp.concatenate([k_ring[s0], k_ring[s1], k_ring[slot]],
                            axis=1)  # (9, 3th, W)
        g = jnp.concatenate([g_ring[s0], g_ring[s1], g_ring[slot]],
                            axis=1)  # (1, 3th, W)
        y2 = d[:, th - 2 : 2 * th + 2] * g[:, th - 2 : 2 * th + 2]
        k2 = k[:, th - 2 : 2 * th + 2]
        a = _apply_k_gslab(y2, k2, th + 2)
        b = _apply_k_gslab(a, k2[:, 1 : th + 3], th)
        res = 3.0 * y2[:, 2 : th + 2] - 3.0 * a[:, 1 : th + 1] + b
        g_c = g_ring[s1][0]  # (th, W)
        d_c = d_ring[s1]
        row0 = (i - 1) * th
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, nside), 1)
        act = ((rows >= nb) & (rows < nside - nb)
               & (cols >= nb) & (cols < nside - nb))  # (th, W)
        out_ref[...] = jnp.where(act[None], res / g_c[None], d_c)


@functools.partial(jax.jit, static_argnames=("th", "interpret", "vmem_mb",
                                             "nborder"))
def ipc_rev2_frame_stream(data, kernel, gain, nborder=4, th=32,
                          interpret=False, vmem_mb=128):
    """Order-2 IPC inverse on the raw full frame, border passthrough.

    Equivalent to the chain glue around :func:`ipc_rev2_cube_stream`
    (active slice * gain -> pad-embed -> kernel -> unpad -> / gain ->
    merge into the frame) collapsed into ONE Pallas pass: reads the
    (ngrp, nside, nside) cube, the (9, nside, nside) border-zeroed
    kernel planes (:func:`kernel_planes_frame`) and the gain ONCE, and
    writes the new full frame directly — no pad-embed, no unpad, no
    border merge (~4 full-cube HBM passes saved per call at 4096^2).

    Warm-up / clamped-halo safety: ring garbage (step 1's missing top
    halo) and the duplicated bottom halo (clamped index map) only ever
    reach output rows 0-1 and nside-2..nside-1 — inside the >= 4-row
    border, where the where() mask selects the passthrough input.
    Requires ``nside % th == 0`` and ``nborder >= 2``.
    """
    ngrp, nside, _ = data.shape
    if nside % th != 0:
        raise ValueError(f"nside {nside} not divisible by th {th}")
    if nborder < 2:
        raise ValueError("frame variant needs nborder >= 2")
    n_tiles = nside // th
    if kernel.ndim != 3 or kernel.shape != (9, nside, nside):
        # raw (3, 3, na, na) kernel: embed inside the jit (slow path;
        # production passes the cached kernel_planes_frame buffer)
        na = kernel.shape[-1]
        kp = jnp.zeros((9, nside, nside), jnp.float32)
        kp = kp.at[:, nborder : nborder + na,
                   nborder : nborder + na].set(kernel.reshape(9, na, na))
        kernel = kp
    data = data.astype(jnp.float32)
    gain3 = gain.astype(jnp.float32)[None]  # (1, nside, nside)

    clamp = n_tiles - 1
    out = pl.pallas_call(
        functools.partial(_ipc_kernel_frame, th=th, nb=nborder,
                          nside=nside),
        grid=(n_tiles + 1,),
        in_specs=[
            pl.BlockSpec((ngrp, th, nside),
                         lambda i: (0, jnp.minimum(i, clamp), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, th, nside),
                         lambda i: (0, jnp.minimum(i, clamp), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, nside),
                         lambda i: (0, jnp.minimum(i, clamp), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ngrp, th, nside),
            lambda i: (0, jnp.clip(i - 1, 0, clamp), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ngrp, nside, nside), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ngrp, th, nside), jnp.float32),
            pltpu.VMEM((3, 9, th, nside), jnp.float32),
            pltpu.VMEM((3, 1, th, nside), jnp.float32),
        ],
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        ),
        interpret=interpret,
    )(data, kernel, gain3)
    return out
