"""Adaptive maximum-likelihood-style ramp fitting (the ``romancal_ramp_fit``
branch).

The reference's second fitter is romancal's likelihood ramp fit
(``ramp_fit_step.likely``, used via ``gen_cal_image.py:415-432``): a
GLS fit whose weights adapt to each pixel's own flux, with jump
rejection at a flat significance threshold, and ``dumo``/``chisq``
diagnostics.  Re-derived here TPU-first:

- the per-pixel optimal weights are the Casertano et al. (2022) GLS
  solution evaluated on a **log-spaced grid of flux-to-noise ratios
  u** (the weights vary slowly in u, so a few bins per decade lose
  <1% statistical efficiency); per-pixel weights are *selected*, never
  gathered;
- variance quadratic forms are factored as
  ``var = K^T C K`` with ``C_P[a,b] = tau_a (a=b) | tbar_min(a,b)`` and
  ``C_R = diag(1/N)``, so per-pixel variances come from host-precomputed
  scalars plus one dot with the selected weight vector;
- jump rejection reuses the pair-difference significances, **two-sided**
  (the likelihood jump statistic is a chi^2 improvement, quadratic in
  the difference — Brandt 2024, arXiv:2404.01326 — unlike the classic
  weighted fitter's one-sided ``smap > sthresh`` cut, reference
  ``utils/fitting.py:249-251``); pixels with a jump are refit on the
  clean prefix (truncated GLS weights);
- diagnostics follow the semantics the reference packages at
  ``gen_cal_image.py:423-429`` (``ramp_fit_step.likely`` returns an
  image model carrying ``dumo``/``chisq``) and ``:669-673``:
  ``chisq`` is the goodness-of-fit of the ramp (here: mean squared
  active pair significance, ~1 for a clean ramp), stored float16;
  ``dumo`` is the "dumb" slope — the simple two-point
  (last clean resultant − first) / Δtbar estimate, slope-like in DN/s,
  so the driver flat-fields it before writing
  (``gen_cal_image.py:669-671``), also stored float16.

All data-dependent adaptivity is masked dense compute — one fused
program, no per-pixel iteration.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dqflags import pixel
from .ramp import (
    _pairs,
    casertano_weights,
    first_saturated_group,
    interior_mask,
    propagate_pdq,
)


def _cov_mats(meta):
    """C_P (Poisson) and C_R (read) covariance templates, float64."""
    ngrp = meta["ngrp"]
    tbar = meta["tbar"].astype(np.float64)
    tau = meta["tau"].astype(np.float64)
    C_P = np.empty((ngrp, ngrp))
    for a in range(ngrp):
        C_P[a, a] = tau[a]
        for b in range(a):
            C_P[a, b] = C_P[b, a] = tbar[b]
    C_R = np.diag(1.0 / meta["N"].astype(np.float64))
    return C_P, C_R


class LikelyPlan(NamedTuple):
    start: int
    ngrp: int
    nu: int  # u bins
    log_u0: float
    dlog_u: float
    m_of_variant: tuple  # truncation lengths (3+start .. ngrp)
    W: np.ndarray  # (nu, nvar, ngrp) GLS weights
    qP: np.ndarray  # (nu, nvar) K^T C_P K
    qR: np.ndarray  # (nu, nvar) K^T C_R K
    pairs: tuple
    inv_dtbar: np.ndarray  # (npairs,)
    pair_active: np.ndarray  # (nvar, npairs)
    c1P: np.ndarray  # (npairs,) d^T C_P d
    c1R: np.ndarray  # (npairs,) d^T C_R d
    vP: np.ndarray  # (npairs, ngrp) C_P d
    vR: np.ndarray  # (npairs, ngrp) C_R d
    tbar: np.ndarray  # (ngrp,)
    rejection_threshold: float


def build_likely_plan(meta, exclude_first=True, rejection_threshold=4.5,
                      nu=12, u_min=1e-4, u_max=30.0):
    """Host precomputation for the adaptive fitter."""
    start = 1 if exclude_first else 0
    ngrp = meta["ngrp"]
    ms = list(range(3 + start, ngrp)) + [ngrp]
    nvar = len(ms)
    log_u0 = np.log(u_min)
    dlog_u = (np.log(u_max) - np.log(u_min)) / (nu - 1)
    ubins = np.exp(log_u0 + dlog_u * np.arange(nu))

    C_P, C_R = _cov_mats(meta)

    W = np.zeros((nu, nvar, ngrp), np.float64)
    for b, u in enumerate(ubins):
        for v, m in enumerate(ms):
            # GLS weights on the first m groups at flux ratio u
            sub = {
                "ngrp": m,
                "N": meta["N"][:m],
                "tbar": meta["tbar"][:m],
                "tau": meta["tau"][:m],
            }
            W[b, v, :m] = casertano_weights(u, sub, exclude_first)

    qP = np.einsum("bvt,ts,bvs->bv", W, C_P, W)
    qR = np.einsum("bvt,ts,bvs->bv", W, C_R, W)

    base_pairs = _pairs(ngrp, start)
    npairs = len(base_pairs)
    inv_dtbar = np.array(
        [1.0 / (meta["tbar"][i + di] - meta["tbar"][i]) for i, di in base_pairs]
    )
    pair_active = np.zeros((nvar, npairs), bool)
    for v, m in enumerate(ms):
        act = set(_pairs(m, start))
        for p, pr in enumerate(base_pairs):
            pair_active[v, p] = pr in act

    d = np.zeros((npairs, ngrp))
    for p, (i, di) in enumerate(base_pairs):
        d[p, i + di] = inv_dtbar[p]
        d[p, i] = -inv_dtbar[p]
    c1P = np.einsum("pt,ts,ps->p", d, C_P, d)
    c1R = np.einsum("pt,ts,ps->p", d, C_R, d)
    vP = d @ C_P
    vR = d @ C_R

    return LikelyPlan(
        start=start, ngrp=ngrp, nu=nu, log_u0=float(log_u0),
        dlog_u=float(dlog_u), m_of_variant=tuple(ms),
        W=W.astype(np.float32),
        qP=qP.astype(np.float32), qR=qR.astype(np.float32),
        pairs=tuple(base_pairs), inv_dtbar=inv_dtbar.astype(np.float32),
        pair_active=pair_active,
        c1P=c1P.astype(np.float32), c1R=c1R.astype(np.float32),
        vP=vP.astype(np.float32), vR=vR.astype(np.float32),
        tbar=meta["tbar"].astype(np.float32),
        rejection_threshold=float(rejection_threshold),
    )


def _flat_sel(table_flat, flat_idx, shape):
    """Select-chain lookup table_flat[flat_idx] (no TPU gathers)."""
    out = jnp.full(shape, float(table_flat[0]), jnp.float32)
    for r in range(1, len(table_flat)):
        out = jnp.where(flat_idx == r, float(table_flat[r]), out)
    return out


def _select_K(plan, flat_idx, shape):
    """K_sel[t] per pixel via select-chains: (ngrp, ny, nx)."""
    nu, nvar, ngrp = plan.W.shape
    Wf = plan.W.reshape(nu * nvar, ngrp)
    return jnp.stack(
        [_flat_sel(Wf[:, t], flat_idx, shape) for t in range(ngrp)]
    )


def ramp_fit_likely(data, rdq, pdq, plan, gain, read_sigma, nborder=4):
    """Adaptive-weight ramp fit with jump rejection and diagnostics.

    Same I/O contract as ``ramp.ramp_fit`` plus ``dumo`` and ``chisq``
    maps: returns (slope, err_read, err_poisson, rdq, pdq, dumo, chisq).
    """
    ngrp, ny, nx = data.shape
    start = plan.start
    nvar = len(plan.m_of_variant)
    nu = plan.nu
    nb = nborder
    shape = (ny, nx)

    gain_c = jnp.clip(gain, 1e-4, 1e4)
    sig2read = read_sigma * read_sigma
    diffs = data - data[1][None]

    firstsat = first_saturated_group(rdq)
    in_layer = (firstsat >= 3 + start) & (firstsat <= ngrp - 1)
    eligible = in_layer | (firstsat == ngrp)
    v_idx0 = jnp.where(in_layer, firstsat - (3 + start), nvar - 1)

    # --- initial slope: central-u full-ramp weights ---
    K0 = jnp.asarray(plan.W[nu // 2])  # (nvar, ngrp)
    # precision='highest': default TPU matmul precision rounds the
    # operands to bfloat16 on the MXU (see ramp.ramp_fit)
    slope_v = jnp.einsum(
        "vt,tyx->vyx", K0, diffs, preferred_element_type=jnp.float32,
        precision="highest",
    )
    # variant selection via a where-chain (a take_along_axis here is a
    # 16M-lane gather on TPU — the codebase-wide rule is select-chains
    # for small-table per-pixel lookups, cf. _flat_sel / ramp.py)
    slope = slope_v[nvar - 1]
    for v in range(nvar - 1):
        slope = jnp.where(v_idx0 == v, slope_v[v], slope)

    def u_bin_of(s):
        u = jnp.clip(s, 1e-6, None) / (gain_c * sig2read)
        b = (jnp.log(u) - plan.log_u0) / plan.dlog_u
        return jnp.clip(jnp.round(b), 0, nu - 1).astype(jnp.int32)

    def fit(v_idx, slope_for_u):
        flat_idx = u_bin_of(slope_for_u) * nvar + v_idx
        K_sel = _select_K(plan, flat_idx, shape)  # (ngrp, ny, nx)
        s = jnp.einsum(
            "tyx,tyx->yx", K_sel, diffs,
            preferred_element_type=jnp.float32, precision="highest",
        )
        qP = _flat_sel(plan.qP.ravel(), flat_idx, shape)
        qR = _flat_sel(plan.qR.ravel(), flat_idx, shape)
        return s, K_sel, qP, qR, flat_idx

    # refine the u estimate once (weights vary slowly in u)
    slope, *_ = fit(v_idx0, slope)
    slope, K_sel, qP, qR, flat_idx = fit(v_idx0, slope)

    dvardt = jnp.clip(slope / gain_c, 0.0, None)

    # --- jump detection: pair significances with factored variances ---
    flag_ok = eligible & interior_mask(ny, nx, nb)
    thresh = plan.rejection_threshold

    group_hits = [None] * ngrp
    best_s2 = jnp.zeros(shape, jnp.float32)
    best_boundary = jnp.full(shape, ngrp, jnp.int32)
    for p, (i, di) in enumerate(plan.pairs):
        ds = (data[i + di] - data[i]) * plan.inv_dtbar[p] - slope
        dotP = jnp.einsum("tyx,t->yx", K_sel, jnp.asarray(plan.vP[p]))
        dotR = jnp.einsum("tyx,t->yx", K_sel, jnp.asarray(plan.vR[p]))
        varP = plan.c1P[p] - 2.0 * dotP + qP
        varR = plan.c1R[p] - 2.0 * dotR + qR
        var = jnp.clip(varP * dvardt + varR * sig2read, 1e-30, None)
        s2 = (ds * ds) / var
        act_p = _flat_sel(
            np.tile(plan.pair_active[:, p].astype(np.float32), nu),
            flat_idx, shape,
        ) > 0.5
        # Two-sided rejection: the likelihood fitter's jump statistic is
        # the chi^2 improvement from masking a pair difference (Brandt
        # 2024, arXiv:2404.01326), which is quadratic in ds and so flags
        # negative outliers too.  (The classic weighted fitter is
        # deliberately one-sided, reference utils/fitting.py:249-251 —
        # ``smap > sthresh`` — since CR hits are positive; the two
        # fitters differ here by design.)
        hit = (s2 > thresh * thresh) & act_p & flag_ok
        group_hits[i] = hit if group_hits[i] is None else group_hits[i] | hit
        if di == 1:
            # jump localization: the most significant ADJACENT pair
            # brackets the jump (a large jump contaminates the global
            # slope, so every pair can exceed threshold; the spanning
            # pair dominates).  Analog of romancal-likely's
            # "mask the largest delta-chi^2 difference" iteration.
            take = hit & (s2 > best_s2)
            best_boundary = jnp.where(take, i, best_boundary)
            best_s2 = jnp.where(take, s2, best_s2)

    jump_bits = jnp.stack(
        [
            jnp.where(h, jnp.uint32(pixel.JUMP_DET), jnp.uint32(0))
            if h is not None else jnp.zeros(shape, jnp.uint32)
            for h in group_hits
        ]
    )
    rdq_out = rdq | jump_bits

    # --- refit jump-affected pixels on the clean prefix ---
    # Prefer the argmax adjacent-pair boundary; if only wider (di=2)
    # pairs tripped, fall back to the earliest hit group.
    first_hit = jnp.full(shape, ngrp, jnp.int32)
    for i in reversed(range(ngrp)):
        if group_hits[i] is not None:
            first_hit = jnp.where(group_hits[i], i, first_hit)
    jump_grp = jnp.where(best_boundary < ngrp, best_boundary, first_hit)
    m_eff = jnp.minimum(firstsat, jump_grp + 1)
    refit_layer = (m_eff >= 3 + start) & (m_eff <= ngrp - 1)
    v_idx1 = jnp.where(refit_layer, m_eff - (3 + start), nvar - 1)
    slope1, K1, qP1, qR1, flat1 = fit(v_idx1, slope)
    use_refit = refit_layer & (jump_grp < ngrp)
    slope = jnp.where(use_refit, slope1, slope)
    K_sel = jnp.where(use_refit[None], K1, K_sel)
    qP = jnp.where(use_refit, qP1, qP)
    qR = jnp.where(use_refit, qR1, qR)
    flat_idx = jnp.where(use_refit, flat1, flat_idx)
    dvardt = jnp.clip(slope / gain_c, 0.0, None)
    # a jump too early for ANY truncation variant (m_eff < 3+start)
    # leaves no clean prefix: the full-ramp slope stays contaminated.
    # The reference likelihood fitter masks the jump and refits the
    # remaining segment; a prefix fitter cannot, so the honest output
    # is DO_NOT_USE (analog of the classic fitter's fast-saturation
    # DNU, reference fitting.py:349).
    unusable_jump = (jump_grp < ngrp) & ~refit_layer

    slope_err_poisson = jnp.sqrt(jnp.clip(qP * dvardt, 0.0, None))
    slope_err_read = read_sigma * jnp.sqrt(qR)

    # --- chisq of the FINAL fit (post-refit slope/weights/active set;
    # the truncated variant's pair set excludes the jump pair, so refit
    # pixels report the clean prefix's goodness-of-fit, consistent with
    # dumo — romancal-likely's chisq also describes the final fit) ---
    chisq = jnp.zeros(shape, jnp.float32)
    npair_active = jnp.zeros(shape, jnp.float32)
    for p, (i, di) in enumerate(plan.pairs):
        ds = (data[i + di] - data[i]) * plan.inv_dtbar[p] - slope
        dotP = jnp.einsum("tyx,t->yx", K_sel, jnp.asarray(plan.vP[p]))
        dotR = jnp.einsum("tyx,t->yx", K_sel, jnp.asarray(plan.vR[p]))
        varP = plan.c1P[p] - 2.0 * dotP + qP
        varR = plan.c1R[p] - 2.0 * dotR + qR
        var = jnp.clip(varP * dvardt + varR * sig2read, 1e-30, None)
        s2 = (ds * ds) / var
        act_p = _flat_sel(
            np.tile(plan.pair_active[:, p].astype(np.float32), nu),
            flat_idx, shape,
        ) > 0.5
        chisq = chisq + jnp.where(act_p, s2, 0.0)
        npair_active = npair_active + act_p

    # --- diagnostics ---
    # dumo: "dumb" two-point slope (last clean resultant - first) over
    # the usable ramp, slope-like so downstream flat-fields it
    # (cf. gen_cal_image.py:671-672)
    end_idx = jnp.clip(jnp.minimum(firstsat, jump_grp + 1) - 1,
                       start + 1, ngrp - 1)
    # select-chain instead of a 16M-index gather over the group axis
    last = data[start + 1]
    for e in range(start + 2, ngrp):
        last = jnp.where(end_idx == e, data[e], last)
    inv_dt = np.zeros(ngrp, np.float32)
    for e in range(start + 1, ngrp):
        inv_dt[e] = 1.0 / (plan.tbar[e] - plan.tbar[start])
    dumo = (last - data[start]) * _flat_sel(inv_dt, end_idx, shape)
    chisq = chisq / jnp.maximum(npair_active, 1.0)

    # --- pixel DQ propagation (shared rules, ramp.propagate_pdq) ---
    pdq_out = propagate_pdq(rdq_out, pdq, start)
    not_ref = (pdq & jnp.uint32(pixel.REFERENCE_PIXEL)) == 0
    pdq_out = pdq_out | jnp.where(
        unusable_jump & not_ref, jnp.uint32(pixel.DO_NOT_USE),
        jnp.uint32(0),
    )

    return slope, slope_err_read, slope_err_poisson, rdq_out, pdq_out, dumo, chisq
