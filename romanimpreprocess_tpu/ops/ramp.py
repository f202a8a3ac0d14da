"""Up-the-ramp slope fitting with jump detection — TPU-native design.

Re-implements the algorithms of the reference's ``utils/fitting.py``
(``construct_weights:20``, ``jump_detect:89``, ``ramp_fit:258``;
Casertano et al. 2022 optimal weights, Sharma & Casertano 2024 jump
flagging) with a fundamentally different execution shape:

*Reference*: Python double loop over (i, di) resultant pairs building a
full-frame variance map term by term, re-run sequentially once per
saturation-truncation layer (``fitting.py:225-253, 326-337``).

*Here*: everything data-independent is precomputed on the host in
float64 — the per-variant weight matrix ``W[v, t]``, and for every
(variant, pair) the *scalar* Poisson/read variance coefficients

    var(delta_slope) = A[v, p] * dvardt + B[v, p] * sig2read

(the per-pixel maps ``dvardt`` and ``sig2read`` factor out of the
reference's accumulation loops).  On device, all candidate slopes come
from one einsum (an MXU matmul over the pixel axis), the per-pixel
truncation variant is *selected* by the first-saturated-group index, and
each pair's significance map is two fused element-wise ops.  The
sequential per-layer refit disappears: saturated and unsaturated pixels
are handled in a single branch-free pass with identical results.

All host-side math is float64; device maps are float32; DQ stays uint32.
"""

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..dqflags import group as gdq
from ..dqflags import pixel


# --------------------------------------------------------------------------
# Host-side metadata (static per MA table)
# --------------------------------------------------------------------------

def ma_table_meta(read_pattern, frame_time):
    """Casertano et al. 2022 resultant statistics for an MA table.

    Returns dict with ``ngrp``, and per-group ``N`` (reads averaged),
    ``tbar`` (mean time), ``tau`` (variance-weighted time) — the same
    definitions as reference ``initializationstep``
    (``gen_cal_image.py:129-141``).
    """
    ngrp = len(read_pattern)
    N = np.zeros(ngrp, dtype=np.int64)
    tbar = np.zeros(ngrp)
    tau = np.zeros(ngrp)
    for i, grp in enumerate(read_pattern):
        n = len(grp)
        t0 = grp[0]
        N[i] = n
        tbar[i] = (t0 + (n - 1) / 2.0) * frame_time
        tau[i] = (t0 + (n - 1) * (2 * n - 1) / (6.0 * n)) * frame_time
    return {
        "ngrp": ngrp,
        "N": N,
        "tbar": tbar,
        "tau": tau,
        "frame_time": frame_time,
        "read_pattern": [list(g) for g in read_pattern],
    }


def casertano_weights(u, meta, exclude_first=True):
    """Optimal zero-sum slope weights K (length ngrp, float32).

    ``u = flux / (gain * sigma_read^2)`` in 1/(e s).  Covariance of the
    resultants (relative units): ``C[i,i] = 1/N_i + u tau_i``,
    ``C[i,j] = u tbar_min(i,j)``; the returned K solves the GLS slope
    normal equations and sums to zero (insensitive to the reset level).
    Reference: ``fitting.py:20-86``.
    """
    start = 1 if exclude_first else 0
    ngrp = meta["ngrp"] - start
    tbar = meta["tbar"][start:].astype(np.float64)
    tau = meta["tau"][start:].astype(np.float64)
    N = meta["N"][start:]
    C = np.empty((ngrp, ngrp))
    for i in range(ngrp):
        C[i, i] = 1.0 / N[i] + u * tau[i]
        for j in range(i):
            C[i, j] = C[j, i] = u * tbar[j]
    W = np.linalg.inv(C)
    Ws = W.sum(axis=0)
    Wt = W @ tbar
    F0 = W.sum()
    F1 = Wt.sum()
    F2 = tbar @ Wt
    D = F0 * F2 - F1 * F1
    K = np.zeros(meta["ngrp"])
    K[start:] = (F0 * Wt - F1 * Ws) / D
    return K.astype(np.float32)


def truncated_weights(meta, iend, exclude_first=True):
    """Two-point slope weights for a ramp truncated at group ``iend``.

    For bright (saturating) sources the fit uses the first and last
    usable resultants only (reference ``fitting.py:165-169``).
    """
    start = 1 if exclude_first else 0
    K = np.zeros(meta["ngrp"], dtype=np.float64)
    K[iend - 1] = 1.0 / (meta["tbar"][iend - 1] - meta["tbar"][start])
    K[start] = -K[iend - 1]
    return K.astype(np.float32)


def _pairs(m, start):
    """(i, di) double-difference pairs for a ramp of m usable groups.

    di in {1, 2}; i + di <= m-1; the (start, 2) pair is dropped for
    3-sample ramps where it is degenerate with the slope (this encodes
    the reference's ``dimax`` logic, ``fitting.py:226-228``).
    """
    out = []
    for i in range(start, m - 1):
        for di in (1, 2):
            if i + di > m - 1:
                continue
            if di == 2 and m - start == 3:
                continue
            out.append((i, di))
    return out


def _var_coeffs(w, meta):
    """Scalar variance coefficients (A_poisson, B_read) of sum_t w_t R_t.

    var = A * dvardt + B * sig2read with the per-pixel maps factored
    out; A and B are the reference's accumulation loops
    (``fitting.py:237-241``) evaluated once in float64.
    """
    tau = meta["tau"].astype(np.float64)
    tbar = meta["tbar"].astype(np.float64)
    N = meta["N"].astype(np.float64)
    w = w.astype(np.float64)
    A = np.sum(w * w * tau)
    for a in range(len(w)):
        for b in range(a):
            A += 2.0 * w[a] * w[b] * tbar[b]
    B = np.sum(w * w / N)
    return A, B


class RampFitPlan(NamedTuple):
    """All data-independent precomputation for one MA table + config.

    Variant v covers truncation lengths m in [3+start, ngrp-1] plus the
    full-ramp Casertano fit at v = nvar-1 (m = ngrp).
    """

    start: int  # 1 if exclude_first
    ngrp: int
    m_of_variant: tuple  # length nvar, usable-group count per variant
    W: np.ndarray  # (nvar, ngrp) slope weights, f32
    coef_poisson: np.ndarray  # (nvar,) slope Poisson variance coefficient
    rd_coef: np.ndarray  # (nvar,) sqrt(sum K^2 / N) read-noise coefficient
    pairs: tuple  # ((i, di), ...) base pair list
    inv_dtbar: np.ndarray  # (npairs,) 1 / (tbar[i+di] - tbar[i])
    pair_active: np.ndarray  # (nvar, npairs) bool
    A: np.ndarray  # (nvar, npairs) Poisson var coefficient
    B: np.ndarray  # (nvar, npairs) read var coefficient
    sthresh_a: float
    sthresh_b: float
    ithresh_a: float
    ithresh_b: float


def build_plan(meta, u, exclude_first=True, jump_pars=None):
    """Precompute the ramp-fit/jump-detection plan on the host."""
    jp = dict(SthreshA=5.5, SthreshB=4.5, IthreshA=1.0, IthreshB=1000.0)
    if jump_pars:
        jp.update({k: float(v) for k, v in jump_pars.items()})
    start = 1 if exclude_first else 0
    ngrp = meta["ngrp"]

    ms = list(range(3 + start, ngrp)) + [ngrp]
    nvar = len(ms)
    W = np.zeros((nvar, ngrp), dtype=np.float32)
    coef_p = np.zeros(nvar)
    rd = np.zeros(nvar)
    for v, m in enumerate(ms):
        K = (
            casertano_weights(u, meta, exclude_first)
            if m == ngrp
            else truncated_weights(meta, m, exclude_first)
        )
        W[v] = K
        A, B = _var_coeffs(K, meta)
        coef_p[v] = A
        rd[v] = np.sqrt(B)

    base_pairs = _pairs(ngrp, start)
    npairs = len(base_pairs)
    inv_dtbar = np.array(
        [1.0 / (meta["tbar"][i + di] - meta["tbar"][i]) for i, di in base_pairs]
    )
    pair_active = np.zeros((nvar, npairs), dtype=bool)
    Ap = np.zeros((nvar, npairs))
    Bp = np.zeros((nvar, npairs))
    for v, m in enumerate(ms):
        active = set(_pairs(m, start))
        for p, (i, di) in enumerate(base_pairs):
            if (i, di) not in active:
                continue
            pair_active[v, p] = True
            w = np.zeros(ngrp)
            w[i + di] = inv_dtbar[p]
            w[i] = -inv_dtbar[p]
            w -= W[v].astype(np.float64)
            Ap[v, p], Bp[v, p] = _var_coeffs(w, meta)

    return RampFitPlan(
        start=start,
        ngrp=ngrp,
        m_of_variant=tuple(ms),
        W=W,
        coef_poisson=coef_p.astype(np.float32),
        rd_coef=rd.astype(np.float32),
        pairs=tuple(base_pairs),
        inv_dtbar=inv_dtbar.astype(np.float32),
        pair_active=pair_active,
        A=Ap.astype(np.float32),
        B=Bp.astype(np.float32),
        sthresh_a=jp["SthreshA"],
        sthresh_b=jp["SthreshB"],
        ithresh_a=jp["IthreshA"],
        ithresh_b=jp["IthreshB"],
    )


# --------------------------------------------------------------------------
# Device-side fit
# --------------------------------------------------------------------------

def first_saturated_group(rdq):
    """Per-pixel index of the first SATURATED group (ngrp if none)."""
    ngrp = rdq.shape[0]
    sat = (rdq & jnp.uint32(gdq.SATURATED)) != 0
    idx = jnp.argmax(sat, axis=0)  # 0 if none
    any_sat = jnp.any(sat, axis=0)
    return jnp.where(any_sat, idx, ngrp).astype(jnp.int32)


def interior_mask(ny, nx, nb):
    """Boolean (ny, nx) mask of the non-border interior.  Handles
    ``nb == 0`` (an ``at[0:-0, 0:-0]`` slice would be EMPTY and silently
    disable jump detection everywhere)."""
    mask = jnp.zeros((ny, nx), dtype=bool)
    return mask.at[nb : ny - nb, nb : nx - nb].set(True)


def propagate_pdq(rdq_out, pdq, start):
    """Group-DQ -> pixel-DQ propagation (reference ``fitting.py:339-353``):
    OR of unsaturated groups' flags; DO_NOT_USE only if ALL groups carry
    it or the first used group is already saturated; SATURATED always
    propagates; reference pixels keep their DQ untouched.  Shared by
    both ramp fitters so the bit-exact rules cannot drift apart."""
    dnu = jnp.uint32(pixel.DO_NOT_USE)
    sat = jnp.uint32(pixel.SATURATED)
    not_sat_grp = (rdq_out & sat) == 0
    pdq2 = jnp.bitwise_or.reduce(
        jnp.where(not_sat_grp, rdq_out, jnp.uint32(0)), axis=0
    ) & ~dnu
    all_dnu = jnp.bitwise_and.reduce((rdq_out & dnu) != 0, axis=0)
    pdq2 = pdq2 | jnp.where(all_dnu, dnu, jnp.uint32(0))
    pdq2 = pdq2 | jnp.where(
        (rdq_out[1 + start] & sat) != 0, dnu, jnp.uint32(0)
    )
    pdq2 = pdq2 | jnp.bitwise_or.reduce(rdq_out & sat, axis=0)
    not_ref = (pdq & jnp.uint32(pixel.REFERENCE_PIXEL)) == 0
    return pdq | jnp.where(not_ref, pdq2, jnp.uint32(0))


def ramp_fit(data, rdq, pdq, plan, gain, read_sigma, nborder=4):
    """Fit slopes, detect jumps, and propagate flags — one fused pass.

    Parameters
    ----------
    data : (ngrp, ny, nx) float32, linearized + IPC-corrected DN.
    rdq : (ngrp, ny, nx) uint32 group DQ (SATURATED, DO_NOT_USE...).
    pdq : (ny, nx) uint32 pixel DQ.
    plan : RampFitPlan (host-precomputed).
    gain : (ny, nx) e/DN.
    read_sigma : (ny, nx) single-read noise std, DN.
    nborder : border width excluded from jump flagging.

    Returns
    -------
    slope, slope_err_read, slope_err_poisson : (ny, nx) float32 (DN/s)
    rdq_out : rdq with JUMP_DET bits
    pdq_out : pdq with propagated flags (reference ``fitting.py:339-353``)

    Matches the reference semantics exactly:

    - unsaturated pixels: full Casertano fit + jump flags,
    - pixels first saturated at group m in [3+start, ngrp-1]: two-point
      truncated fit + jump flags from the truncated pair set,
    - earlier saturation: base-fit values kept, no jump flags,
      DO_NOT_USE when saturated by group 1+start.
    """
    ngrp, ny, nx = data.shape
    start = plan.start
    nvar = len(plan.m_of_variant)
    nb = nborder

    firstsat = first_saturated_group(rdq)
    in_layer = (firstsat >= 3 + start) & (firstsat <= ngrp - 1)
    eligible = in_layer | (firstsat == ngrp)  # pixels that get jump flags
    # variant row per pixel: truncation m = firstsat -> v = m - (3+start);
    # base fit is the last row.
    v_idx = jnp.where(in_layer, firstsat - (3 + start), nvar - 1)

    # Per-pixel lookups from tiny per-variant tables are expressed as
    # where-chains (nvar is small): TPU lowers these to fused selects,
    # whereas real gathers with 16M indices run on the scalar core.
    def sel(table):
        out = jnp.full((ny, nx), float(table[0]), jnp.float32)
        for v in range(1, len(table)):
            out = jnp.where(v_idx == v, float(table[v]), out)
        return out

    # --- all candidate slopes: one matmul over the pixel axis (MXU) ---
    Wd = jnp.asarray(plan.W)  # (nvar, ngrp)
    diffs = (data - data[1][None]).reshape(ngrp, ny * nx)
    # precision='highest': with the default TPU matmul precision the
    # MXU rounds BOTH operands to bfloat16 (preferred_element_type
    # only widens the accumulator), costing ~0.2% on science slopes —
    # 1000x the parity budget.  The contraction depth is ngrp (~6),
    # so the extra passes are free.
    slopes_all = jnp.dot(Wd, diffs, preferred_element_type=jnp.float32,
                         precision="highest")
    slopes_all = slopes_all.reshape(nvar, ny, nx)
    slope = slopes_all[nvar - 1]
    for v in range(nvar - 1):
        slope = jnp.where(v_idx == v, slopes_all[v], slope)

    # --- per-pixel scalar coefficients for the selected variant ---
    coef_sel = sel(plan.coef_poisson)
    rd_sel = sel(plan.rd_coef)

    gain_c = jnp.clip(gain, 1e-4, 1e4)
    dvardt = jnp.clip(slope / gain_c, 0.0, None)  # Poisson var (DN^2) per s
    sig2read = read_sigma * read_sigma

    slope_err_poisson = jnp.sqrt(jnp.clip(coef_sel * dvardt, 0.0, None))
    slope_err_read = read_sigma * rd_sel

    # --- flux-dependent jump threshold (log-interpolated) ---
    x = jnp.clip(slope, plan.ithresh_a, plan.ithresh_b)
    x = jnp.log(x / plan.ithresh_a) / np.log(plan.ithresh_b / plan.ithresh_a)
    sthresh = plan.sthresh_a + (plan.sthresh_b - plan.sthresh_a) * x

    # --- per-pair significance + flagging, fused elementwise ---
    flag_ok = eligible & interior_mask(ny, nx, nb)

    group_hits = [None] * ngrp  # per-group boolean hit maps (no cube copies)
    for p, (i, di) in enumerate(plan.pairs):
        # per-pair scalar coefficients selected through the variant index
        A_p = sel(plan.A[:, p])
        B_p = sel(plan.B[:, p])
        act_p = sel(plan.pair_active[:, p].astype(np.float32)) > 0.5
        ds = (data[i + di] - data[i]) * plan.inv_dtbar[p] - slope
        var = A_p * dvardt + B_p * sig2read
        s = ds * jax.lax.rsqrt(var)
        hit = (s > sthresh) & act_p & flag_ok
        group_hits[i] = hit if group_hits[i] is None else (group_hits[i] | hit)

    jump_bits = jnp.stack(
        [
            jnp.where(h, jnp.uint32(pixel.JUMP_DET), jnp.uint32(0))
            if h is not None
            else jnp.zeros((ny, nx), jnp.uint32)
            for h in group_hits
        ]
    )
    rdq_out = rdq | jump_bits

    pdq_out = propagate_pdq(rdq_out, pdq, start)

    return slope, slope_err_read, slope_err_poisson, rdq_out, pdq_out
