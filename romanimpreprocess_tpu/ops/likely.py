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
  image model carrying ``dumo``/``chisq``) and ``:669-673``, pinned to
  the published likelihood-fitter definitions (Brandt 2024,
  arXiv:2404.01326):
  ``chisq`` is the GLS chi-square of the adjacent resultant
  differences against the one-parameter ramp with the tridiagonal
  difference covariance, per degree of freedom (clean ramp => ~1);
  see :func:`gls_chisq` (gated against a dense numpy GLS oracle);
  ``dumo`` is the "dumb" slope — stcal ``likely_fit``'s initial
  count-rate estimate, the two-point
  (last clean resultant − first) / Δtbar, slope-like in DN/s, so the
  driver flat-fields it before writing (``gen_cal_image.py:669-671``);
  both stored float16.

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
    # tridiagonal covariance templates of ADJACENT resultant
    # differences delta_i = R_{i+1} - R_i (Brandt 2024 chi^2; see
    # gls_chisq): Cov = dvardt * (aP, bP) + sig2read * (aR, bR)
    dt_diff: np.ndarray  # (ndiff,) tbar_{i+1} - tbar_i
    aP: np.ndarray  # (ndiff,) tau_i + tau_{i+1} - 2 tbar_i
    aR: np.ndarray  # (ndiff,) 1/N_i + 1/N_{i+1}
    bP: np.ndarray  # (ndiff-1,) tbar_{i+1} - tau_{i+1}
    bR: np.ndarray  # (ndiff-1,) -1/N_{i+1}


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

    # adjacent-difference covariance templates (delta_i = R_{i+1}-R_i,
    # i = 0..ngrp-2): from Cov(R_a,R_b) = a*C_P[a,b] + sig^2*C_R[a,b],
    #   Var(delta_i)          = a (tau_i + tau_{i+1} - 2 tbar_i)
    #                           + sig^2 (1/N_i + 1/N_{i+1})
    #   Cov(delta_i, delta_{i+1}) = a (tbar_{i+1} - tau_{i+1})
    #                           - sig^2 / N_{i+1}
    tbar64 = meta["tbar"].astype(np.float64)
    tau64 = meta["tau"].astype(np.float64)
    N64 = meta["N"].astype(np.float64)
    dt_diff = tbar64[1:] - tbar64[:-1]
    aP = tau64[:-1] + tau64[1:] - 2.0 * tbar64[:-1]
    aR = 1.0 / N64[:-1] + 1.0 / N64[1:]
    bP = tbar64[1:-1] - tau64[1:-1]
    bR = -1.0 / N64[1:-1]

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
        dt_diff=dt_diff.astype(np.float32),
        aP=aP.astype(np.float32), aR=aR.astype(np.float32),
        bP=bP.astype(np.float32), bR=bR.astype(np.float32),
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


def gls_chisq(data, plan, m_eff, dvardt, sig2read):
    """Per-dof GLS chi-square of the ramp, pinned to the likelihood
    fitter's published formulation (Brandt 2024, arXiv:2404.01326,
    eqs. 11-14; stcal ``likely_fit``): with adjacent resultant
    differences delta_i = R_{i+1} - R_i, tridiagonal covariance C
    (templates in the plan, evaluated at the fitted rate), and the
    one-parameter model E[delta] = a * dt,

        chi^2 = delta^T C^-1 delta
                - (dt^T C^-1 delta)^2 / (dt^T C^-1 dt),

    i.e. the GLS residual after profiling out the rate — NOT a sum of
    independent pair significances (differences sharing a resultant
    are correlated; the reference packages this statistic per pixel at
    ``gen_cal_image.py:671-673``).  Returned per degree of freedom
    (n_active_diffs - 1) so a clean ramp reads ~1.

    Masked dense compute: differences outside [start, m_eff-2] are
    deactivated by rewriting their tridiagonal row to the identity with
    zero rhs (a fixed ``ngrp-1``-step Thomas solve, no data-dependent
    shapes).  ``m_eff``: per-pixel one-past-the-last clean resultant.
    """
    ngrp = data.shape[0]
    start = plan.start
    nd = ngrp - 1  # template length; rows < start are always inactive
    ii = jnp.arange(nd)[:, None, None]
    act = (ii >= start) & (ii <= (m_eff - 2)[None])  # (nd, ny, nx)

    delta = data[1:] - data[:-1]  # (nd, ny, nx)
    dta = jnp.asarray(plan.dt_diff)[:, None, None]
    alpha = (
        jnp.asarray(plan.aP)[:, None, None] * dvardt[None]
        + jnp.asarray(plan.aR)[:, None, None] * sig2read[None]
    )
    beta = (
        jnp.asarray(plan.bP)[:, None, None] * dvardt[None]
        + jnp.asarray(plan.bR)[:, None, None] * sig2read[None]
    )
    # masked rows: identity diagonal, zero coupling, zero rhs
    alpha = jnp.where(act, jnp.clip(alpha, 1e-30, None), 1.0)
    both = act[:-1] & act[1:]
    beta = jnp.where(both, beta, 0.0)
    r1 = jnp.where(act, delta, 0.0)
    r2 = jnp.where(act, dta * jnp.ones_like(delta), 0.0)

    # Thomas factorization shared by both right-hand sides (unrolled:
    # nd is a small static count, each step one fused elementwise op)
    cp = [None] * nd
    d1 = [None] * nd
    d2 = [None] * nd
    denom = alpha[0]
    cp[0] = beta[0] / denom if nd > 1 else None
    d1[0] = r1[0] / denom
    d2[0] = r2[0] / denom
    for i in range(1, nd):
        denom = alpha[i] - beta[i - 1] * cp[i - 1]
        if i < nd - 1:
            cp[i] = beta[i] / denom
        d1[i] = (r1[i] - beta[i - 1] * d1[i - 1]) / denom
        d2[i] = (r2[i] - beta[i - 1] * d2[i - 1]) / denom
    x1 = [None] * nd
    x2 = [None] * nd
    x1[nd - 1] = d1[nd - 1]
    x2[nd - 1] = d2[nd - 1]
    for i in range(nd - 2, -1, -1):
        x1[i] = d1[i] - cp[i] * x1[i + 1]
        x2[i] = d2[i] - cp[i] * x2[i + 1]
    x1 = jnp.stack(x1)
    x2 = jnp.stack(x2)

    q_dd = (r1 * x1).sum(axis=0)  # delta^T C^-1 delta
    q_td = (r2 * x1).sum(axis=0)  # dt^T C^-1 delta
    q_tt = (r2 * x2).sum(axis=0)  # dt^T C^-1 dt
    chi2 = q_dd - q_td * q_td / jnp.clip(q_tt, 1e-30, None)
    dof = act.sum(axis=0).astype(jnp.float32) - 1.0
    return jnp.where(dof >= 1.0, chi2 / jnp.maximum(dof, 1.0), 0.0)


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
    # ALL pair projections in one contraction: per-pair einsums each
    # re-read the (ngrp, ny, nx) K_sel cube from HBM (2 x npairs x
    # 400 MB at 4096^2 = ~5.6 GB); batching reads it once and writes
    # the (2 npairs) projection maps once (~1 GB total)
    npairs = len(plan.pairs)
    vPR = jnp.asarray(np.stack([*plan.vP, *plan.vR]))  # (2 npairs, ngrp)
    dots = jnp.einsum(
        "tyx,ct->cyx", K_sel, vPR,
        preferred_element_type=jnp.float32, precision="highest",
    )
    for p, (i, di) in enumerate(plan.pairs):
        ds = (data[i + di] - data[i]) * plan.inv_dtbar[p] - slope
        dotP = dots[p]
        dotR = dots[npairs + p]
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

    # --- chisq of the FINAL fit (post-refit active set: refit pixels
    # report the clean prefix's goodness-of-fit, consistent with dumo).
    # Exact GLS quadratic form with the tridiagonal difference
    # covariance (Brandt 2024) — see gls_chisq; the covariance is
    # evaluated at the final fitted rate. ---
    chisq = gls_chisq(data, plan, jnp.minimum(firstsat, jump_grp + 1),
                      dvardt, jnp.broadcast_to(sig2read, shape))

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

    # --- pixel DQ propagation (shared rules, ramp.propagate_pdq) ---
    pdq_out = propagate_pdq(rdq_out, pdq, start)
    not_ref = (pdq & jnp.uint32(pixel.REFERENCE_PIXEL)) == 0
    pdq_out = pdq_out | jnp.where(
        unusable_jump & not_ref, jnp.uint32(pixel.DO_NOT_USE),
        jnp.uint32(0),
    )

    return slope, slope_err_read, slope_err_poisson, rdq_out, pdq_out, dumo, chisq
